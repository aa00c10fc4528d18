package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Equi-join size estimation from KMV sketches — the planner-grade
  * "how big is this join" probe: estimate |A ⋈ B| from ONE
  * bounded-memory pass over each side (the [[graft.functions.KmvAgg]]
  * bottom-k distinct-hash aggregate — k longs per side cross the wire)
  * instead of running the join. The workhorse for 100 TB pipeline
  * planning: choosing broadcast vs shuffle, sizing shuffle partitions,
  * or refusing a query whose join would explode.
  *
  * Estimator (Beyer et al. SIGMOD'07 composition):
  * d̂(A∪B) from the merged bottom-k, d̂(A∩B) = Ĵ·d̂(A∪B), and
  * |A ⋈ B| ≈ d̂(A∩B) · (n_A/d̂_A) · (n_B/d̂_B) — per-key
  * multiplicities assumed independent of intersection membership (the
  * uniform-frequency assumption every sketch-based optimizer makes;
  * key skew biases it, which is why the CORRECTNESS entry carries the
  * EXACT join size alongside, making the error visible rather than
  * hidden). The estimator itself is DETERMINISTIC — md5-prefix hashes,
  * fixed arithmetic — so the oracle replays sketches AND estimate bit
  * for bit; only its error vs truth is probabilistic.
  */
object JoinEstimate {

  /** 16^13 — the md5-13-hex-prefix hash domain (exact in a double). */
  private val Domain: Double = 4503599627370496.0 // 2^52

  /** One row: n_a, n_b, d_est_a, d_est_b, d_est_shared, est_rows —
    * plus exact_rows when `exact = true`. The default is the
    * PRODUCTION path: two bounded-memory sketch passes, the real join
    * is never executed and each input is scanned exactly once
    * (JoinEstimateSpec pins the plan). `exact = true` additionally
    * runs the true join and carries its row count alongside — the
    * verification regime the CORRECTNESS entry runs, making the
    * estimator's error visible rather than hidden.
    */
  def estimate(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
               k: Int = 256, exact: Boolean = false): DataFrame = {
    import graft.functions.FunctionDefs.callAgg
    def side(df: DataFrame, key: String, nName: String, skName: String) = {
      val h = conv(substring(md5(col(key).cast("string")), 1, 13), 16, 10)
        .cast("long")
      df.filter(col(key).isNotNull).agg(
        count(lit(1)).as(nName),
        callAgg("kmv_agg", h, lit(k)).as(skName))
    }
    def dEst(sk: Column): Column =
      when(size(sk) < k, size(sk).cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(Domain) /
          element_at(sk, k).cast("double"))
    val sa = side(a, aKey, "n_a", "ska")
    val sb = side(b, bKey, "n_b", "skb")
    val sketches = sa.crossJoin(sb)
    val withExact =
      if (!exact) sketches
      else sketches.crossJoin(
        a.select(col(aKey).as("__k")).filter(col("__k").isNotNull)
          .join(b.select(col(bKey).as("__k")).filter(col("__k").isNotNull), Seq("__k"))
          .agg(count(lit(1)).as("exact_rows")))
    val outCols = Seq(col("n_a"), col("n_b"),
      (round(col("__dA"), 4) + lit(0.0)).as("d_est_a"),
      (round(col("__dB"), 4) + lit(0.0)).as("d_est_b"),
      (round(col("__dI"), 4) + lit(0.0)).as("d_est_shared"),
      (round(col("__dI") * (col("n_a") / col("__dA")) * (col("n_b") / col("__dB")), 2)
        + lit(0.0)).as("est_rows")) ++
      (if (exact) Seq(col("exact_rows")) else Nil)
    withExact
      .withColumn("__mg", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .withColumn("__ku", size(col("__mg")).cast("double"))
      .withColumn("__shared", size(filter(col("__mg"), v =>
        array_contains(col("ska"), v) && array_contains(col("skb"), v)))
        .cast("double"))
      .withColumn("__dA", dEst(col("ska")))
      .withColumn("__dB", dEst(col("skb")))
      .withColumn("__dI", col("__shared") / col("__ku") * dEst(col("__mg")))
      .select(outCols: _*)
  }
}
