package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear probe (OLS via sufficient statistics) — the
  * training-data-pipeline "fit a tiny linear model over a corpus-scale
  * feature table" primitive (quality probes, scaling-law fits,
  * feature-importance screens).
  *
  * Spark-first shape: ONE partial-aggregated scan collects the normal-
  * equation sufficient statistics (the Gram matrix XᵀX and XᵀY — ten
  * numbers for two features), and the solve is plain column arithmetic
  * ON THE 1-ROW AGGREGATE — no driver collect, no iteration, no second
  * pass. At 100 TB the cost is exactly one map-side-combined scan; the
  * shuffle carries one stats row per partition.
  *
  * Determinism contract: features and target are INTEGER-valued, so
  * every sufficient statistic is an exact long (order-independent —
  * float summation order never enters); the doubles appear only in the
  * final Cramer solve, a fixed expression tree over those exact stats
  * that an oracle replays bit-for-bit.
  */
object Probe {

  /** Fit y ≈ b0 + b1·x1 + b2·x2 by OLS. `x1`/`x2`/`y` must be integer-
    * valued expressions (cast to long internally). Returns one row:
    * n_docs, b0, b1, b2, r2, rmse (coefficients rounded to 6 dp).
    */
  def ols2(df: DataFrame, x1: Column, x2: Column, y: Column): DataFrame = {
    val f = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .filter(col("x1").isNotNull && col("x2").isNotNull && col("y").isNotNull)
    val st = f.agg(
      count(lit(1)).as("n"),
      sum(col("x1")).as("s1"), sum(col("x2")).as("s2"), sum(col("y")).as("sy"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y"),
      sum(col("y") * col("y")).as("syy"))
    // everything below is double arithmetic over exact integer stats —
    // the expression trees are mirrored verbatim in the SQL oracle
    val d = st.select(st.columns.map(c => col(c).cast("double").as(c)): _*)
    val withDets = d.select(col("*"),
      (col("n") * (col("s11") * col("s22") - col("s12") * col("s12"))
        - col("s1") * (col("s1") * col("s22") - col("s12") * col("s2"))
        + col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))).as("det"),
      (col("sy") * (col("s11") * col("s22") - col("s12") * col("s12"))
        - col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
        + col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))).as("det0"),
      (col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
        - col("sy") * (col("s1") * col("s22") - col("s12") * col("s2"))
        + col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))).as("det1"),
      (col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12"))
        - col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
        + col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))).as("det2"))
    val withB = withDets.select(col("*"),
      (col("det0") / col("det")).as("b0"),
      (col("det1") / col("det")).as("b1"),
      (col("det2") / col("det")).as("b2"))
    val withFit = withB.select(col("*"),
      (col("syy") - (col("b0") * col("sy") + col("b1") * col("s1y")
        + col("b2") * col("s2y"))).as("sse"),
      (col("syy") - col("sy") * col("sy") / col("n")).as("sst"))
    withFit.select(
      col("n").cast("long").as("n_docs"),
      (round(col("b0"), 6) + lit(0.0)).as("b0"),
      (round(col("b1"), 6) + lit(0.0)).as("b1"),
      (round(col("b2"), 6) + lit(0.0)).as("b2"),
      (round(lit(1.0) - col("sse") / col("sst"), 6) + lit(0.0)).as("r2"),
      (round(sqrt(greatest(col("sse"), lit(0.0)) / col("n")), 6) + lit(0.0)).as("rmse"))
  }
}
