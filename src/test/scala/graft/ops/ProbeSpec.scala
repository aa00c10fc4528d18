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

  test("second-order stats survive long-overflow magnitudes (DECIMAL accumulation)") {
    import spark.implicits._
    // y = x1 exactly with x1 up to 5.6e9: Σx1² ≈ 1.1e21 wraps a long
    // sum (silently, non-ANSI) — the DECIMAL(38,0) path keeps the stats
    // exact and recovers the planted slope
    val df = (0 to 9).flatMap(a => (0 to 9).map(b =>
      (a * 620000000L, b.toLong, a * 620000000L))).toDF("x1", "x2", "y")
    val r = Probe.ols2(df, col("x1"), col("x2"), col("y")).head()
    r.getAs[Double]("b1") shouldBe 1.0 +- 1e-6
    r.getAs[Double]("b2") shouldBe 0.0 +- 1e-3
    r.getAs[Double]("r2") shouldBe 1.0 +- 1e-6
  }

  test("sufficient-statistic overflow past DECIMAL(38,0) fails loudly, not wrongly") {
    import spark.implicits._
    // two rows of y = Long.MaxValue: Σy² ≈ 1.7e38 > 38 digits
    val df = Seq((1L, 1L, Long.MaxValue), (2L, 3L, Long.MaxValue),
      (3L, 2L, Long.MaxValue)).toDF("x1", "x2", "y")
    // loud either way: ANSI mode raises NUMERIC_VALUE_OUT_OF_RANGE at
    // the sum itself; non-ANSI nulls the sum and trips the guard
    val msg = intercept[Exception] {
      Probe.ols2(df, col("x1"), col("x2"), col("y")).collect()
    }.getMessage
    assert(msg.contains("overflow") || msg.contains("Decimal(38, 0)"),
      s"unexpected failure message: $msg")
  }

  test("constant target (sst = 0) fails loudly — r² is undefined, not null") {
    import spark.implicits._
    val df = Seq((1L, 5L, 7L), (2L, 3L, 7L), (3L, 1L, 7L),
      (4L, 4L, 7L)).toDF("x1", "x2", "y")
    intercept[Exception] {
      Probe.ols2(df, col("x1"), col("x2"), col("y")).collect()
    }.getMessage should include("sst")
  }

  test("ridgeFit recovers a planted linear relation at tiny lambda; optimality holds") {
    import spark.implicits._
    // y = 2 + 1·v0 − 3·v1 + 0.5·v2 over a deterministic 3-d grid
    val rows = for (a <- 0 until 5; b <- 0 until 5; c <- 0 until 5)
      yield (Array(a.toFloat, b.toFloat, c.toFloat),
        2.0 + 1.0 * a - 3.0 * b + 0.5 * c)
    val df = rows.toDF("v", "y")
    val m = Probe.ridgeFit(df, "v", col("y"), lambda = 1e-9)
    m.n shouldBe 125L
    m.optResidual should be < 1e-6
    m.b0 shouldBe 2.0 +- 1e-5
    m.w(0) shouldBe 1.0 +- 1e-5
    m.w(1) shouldBe -3.0 +- 1e-5
    m.w(2) shouldBe 0.5 +- 1e-5
    // scan-side scoring reproduces y
    val maxErr = df.select(max(abs(
      Probe.score(m, col("v")) - col("y")))).head.getDouble(0)
    maxErr should be < 1e-4
  }

  test("larger lambda shrinks the weight norm, never the optimality") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (Array((i % 7).toFloat, (i % 11).toFloat), ((i % 7) * 2 - (i % 11) * 0.5))
    }
    val df = rows.toDF("v", "y")
    val m0 = Probe.ridgeFit(df, "v", col("y"), lambda = 0.01)
    val m1 = Probe.ridgeFit(df, "v", col("y"), lambda = 100.0)
    def norm(w: Array[Double]) = math.sqrt(w.map(x => x * x).sum)
    norm(m1.w) should be < norm(m0.w)
    m0.optResidual should be < 1e-6
    m1.optResidual should be < 1e-6
  }

  test("lambda→0 ridge agrees with the sufficient-statistics OLS solve (two independent paths)") {
    import spark.implicits._
    // integer features so ols2's exact-long path applies
    val data = (0 until 100).map { i =>
      val x1 = (i * 13) % 17; val x2 = (i * 7) % 23
      (x1.toLong, x2.toLong, (3 * x1 - 2 * x2 + 11 + (i % 5)).toLong)
    }
    val df = data.toDF("x1", "x2", "y")
    val ols = Probe.ols2(df, col("x1"), col("x2"), col("y")).head()
    val ridge = Probe.ridgeFit(
      df.select(array(col("x1").cast("double"), col("x2").cast("double")).as("v"),
        col("y").cast("double").as("y")),
      "v", col("y"), lambda = 1e-10)
    ridge.b0 shouldBe ols.getAs[Double]("b0") +- 1e-4
    ridge.w(0) shouldBe ols.getAs[Double]("b1") +- 1e-4
    ridge.w(1) shouldBe ols.getAs[Double]("b2") +- 1e-4
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

  test("logit2: the distributed IRLS fit matches a local Newton reference; scoring separates the classes") {
    import spark.implicits._
    // noisy threshold label on x1 with an uninformative x2 mixed in
    val rows = (0 until 400).map { i =>
      val x1 = (i % 40) / 10.0
      val x2 = (i % 7) / 3.0
      val y = if (x1 + 0.3 * ((i % 13) - 6) / 6.0 > 2.0) 1.0 else 0.0
      (y, x1, x2)
    }
    val b = Probe.logit2(rows.toDF("y", "x1", "x2"),
      col("y"), col("x1"), col("x2"), iters = 8)
    // local reference: identical fixed-iteration Newton over the rows
    var ref = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until 8) {
      val g = Array(0.0, 0.0, 0.0)
      val h = Array.ofDim[Double](3, 3)
      rows.foreach { case (y, x1, x2) =>
        val x = Array(1.0, x1, x2)
        val p = 1.0 / (1.0 + math.exp(-(ref(0) + ref(1) * x1 + ref(2) * x2)))
        val w = p * (1 - p)
        for (i <- 0 until 3) {
          g(i) += (y - p) * x(i)
          for (j <- 0 until 3) h(i)(j) += w * x(i) * x(j)
        }
      }
      val (h00, h01, h02, h11, h12, h22) =
        (h(0)(0), h(0)(1), h(0)(2), h(1)(1), h(1)(2), h(2)(2))
      val a00 = h11 * h22 - h12 * h12; val a01 = h02 * h12 - h01 * h22
      val a02 = h01 * h12 - h11 * h02; val a11 = h00 * h22 - h02 * h02
      val a12 = h01 * h02 - h00 * h12; val a22 = h00 * h11 - h01 * h01
      val det = h00 * a00 + h01 * a01 + h02 * a02
      ref = Array(ref(0) + (a00 * g(0) + a01 * g(1) + a02 * g(2)) / det,
        ref(1) + (a01 * g(0) + a11 * g(1) + a12 * g(2)) / det,
        ref(2) + (a02 * g(0) + a12 * g(1) + a22 * g(2)) / det)
    }
    for (i <- 0 until 3) b(i) shouldBe ref(i) +- 1e-8
    // the fit is a real classifier: x1 carries the signal
    b(1) should be > 1.0
    val scored = rows.toDF("y", "x1", "x2")
      .select(col("y"), Probe.logitScore(b.toIndexedSeq, col("x1"), col("x2")).as("s"))
    val acc = scored.filter((col("s") > 0.5) === (col("y") === 1.0)).count()
    acc.toDouble / 400 should be > 0.85
  }

  test("logit2: empty input and degenerate (collinear) features fail loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Probe.logit2(Seq.empty[(Double, Double, Double)].toDF("y", "x1", "x2"),
        col("y"), col("x1"), col("x2"))
    }
    // x2 = 2·x1 exactly: the Hessian is singular — loud, not NaN betas
    val lin = (0 until 50).map(i => ((i % 2).toDouble, i / 10.0, i / 5.0))
    intercept[IllegalArgumentException] {
      Probe.logit2(lin.toDF("y", "x1", "x2"), col("y"), col("x1"), col("x2"))
    }
  }
}
