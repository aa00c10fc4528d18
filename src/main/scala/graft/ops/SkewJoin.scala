package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for hot-key skew that neither broadcast nor AQE can
  * absorb.
  *
  * The escalation ladder for a skewed join at 100 TB: (1) broadcast the
  * small side — no shuffle at all; (2) let AQE's skew-join split
  * oversized sort-merge partitions — handles moderate skew with zero
  * code; (3) SALT, when one key's rows alone exceed an executor
  * (AQE can only split a partition into contiguous ranges of the SAME
  * key on the fact side, but every split still joins against the full
  * matching dim partition, and a downstream groupBy on the join key
  * re-concentrates the key anyway). Salting splits the hot key's rows
  * across `nSalt` genuinely independent reducers: the fact side tags
  * each row with a deterministic pseudo-random salt, the dim side
  * replicates each row `nSalt` times (a dim-side ×nSalt blowup — which
  * is why this is for big-fact × medium-dim, with nSalt sized to the
  * hot key's row count, not the cluster), and the join key becomes
  * (key, salt). Result set is IDENTICAL to the plain join — every fact
  * row still meets every matching dim row exactly once, under exactly
  * one salt.
  */
object SkewJoin {

  /** Inner equi-join `fact ⋈ dim` on `keyCol` (the dim must expose the
    * SAME column name), salted `nSalt` ways. `saltBy` are fact columns
    * whose xxhash64 spreads the hot key's rows across salts — pass
    * something row-distinguishing (a line number, an id); the salt only
    * routes rows, so its quality affects balance, never correctness.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCol: String,
                 saltBy: Seq[Column], nSalt: Int): DataFrame = {
    require(nSalt >= 1, s"nSalt $nSalt must be >= 1")
    val fs = fact.withColumn("__salt",
      pmod(xxhash64(saltBy: _*), lit(nSalt.toLong)).cast("int"))
    val ds = dim.withColumn("__salt",
      explode(array((0 until nSalt).map(i => lit(i)): _*)))
    fs.join(ds, Seq(keyCol, "__salt")).drop("__salt")
  }
}
