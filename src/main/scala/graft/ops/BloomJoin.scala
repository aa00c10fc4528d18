package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction — the classic distributed "bloom join":
  * when a join's dim side is too big to broadcast as ROWS but its KEY
  * SET compresses into a few megabits, build a Bloom filter over the
  * (already filtered) dim keys and apply it to the fact SCAN before the
  * shuffle — only probable matches pay shuffle bytes. With a selective
  * dim predicate the fact-side shuffle shrinks by ~the join selectivity
  * (false positives only cost bytes, never rows: the exact equi-join
  * still runs behind the filter).
  *
  * This is the manual, tunable form of Spark's runtime bloom-filter
  * injection (`spark.sql.optimizer.runtime.bloomFilter.*`) — explicit
  * geometry (numBits/numHashes sized to the dim key count), explicit
  * placement, and usable where the optimizer declines to inject. The
  * filter is built with the same `bloom_agg` byte-OR aggregate the
  * incremental-dedup gate uses (map-side partials OR together; one
  * m-bit buffer reaches the driver, never keys) and lands in the fact
  * scan as a plan literal — the same shape as a broadcast variable.
  */
object BloomJoin {

  /** Inner equi-join `fact ⋈ dim` on `factKey == dimKey`, with the fact
    * scan pre-filtered by a Bloom filter over dim's key set.
    */
  def reducedJoin(fact: DataFrame, dim: DataFrame,
                  factKey: String, dimKey: String,
                  numBits: Long = 1L << 22, numHashes: Int = 5): DataFrame = {
    val bloom = dim
      .agg(graft.functions.FunctionDefs.callAgg("bloom_agg",
        coalesce(xxhash64(col(dimKey)), lit(0L)),
        lit(numBits), lit(numHashes)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    fact
      .filter(graft.functions.FunctionDefs.call("bloom_contains",
        lit(bloom), coalesce(xxhash64(col(factKey)), lit(0L)), lit(numHashes)))
      .join(dim, col(factKey) === col(dimKey))
  }
}
