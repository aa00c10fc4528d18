package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ProbeSpec extends AnyFunSuite with SparkTestSession with Matchers {

  test("recovers an exact linear relationship: coefficients, r2=1, rmse=0") {
    import spark.implicits._
    // y = 7 + 3·x1 + 5·x2 exactly, over a non-degenerate grid
    val df = (for (a <- 0 to 9; b <- 0 to 9)
      yield (a.toLong, b.toLong, 7L + 3L * a + 5L * b)).toDF("x1", "x2", "y")
    val r = Probe.ols2(df, col("x1"), col("x2"), col("y")).head()
    r.getAs[Long]("n_docs") shouldBe 100L
    r.getAs[Double]("b0") shouldBe 7.0 +- 1e-6
    r.getAs[Double]("b1") shouldBe 3.0 +- 1e-6
    r.getAs[Double]("b2") shouldBe 5.0 +- 1e-6
    r.getAs[Double]("r2") shouldBe 1.0 +- 1e-6
    r.getAs[Double]("rmse") shouldBe 0.0 +- 1e-6
  }

  test("null feature rows are excluded from the fit") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some(1L), Some(9L)),
      (Some(2L), Some(0L), Some(10L)),
      (Some(0L), Some(2L), Some(12L)),
      (Some(3L), Some(3L), Some(25L)),
      (None, Some(1L), Some(99L)), // dropped
      (Some(1L), None, Some(99L)), // dropped
      (Some(1L), Some(1L), None)   // dropped
    ).toDF("x1", "x2", "y")
    Probe.ols2(df, col("x1"), col("x2"), col("y"))
      .head().getAs[Long]("n_docs") shouldBe 4L
  }

  test("the stats scan is one partial-aggregated pass (no second exchange beyond the agg)") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, (i * 7 % 13).toLong, (i * 3 % 11).toLong))
      .toDF("x1", "x2", "y").repartition(4)
    val out = Probe.ols2(df, col("x1"), col("x2"), col("y"))
    out.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // shuffles in the FINAL plan only
    val plan = out.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    plan should include("HashAggregate") // partial → final
    // fixture repartition + the agg's single-partition exchange, no joins
    plan.linesIterator.count(_.contains("Exchange")) should be <= 2
    plan should not include "Join"
  }
}
