package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class QdigestSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import spark.implicits._

  private def quantileOf(df: DataFrame, vCol: String, k: Int, q: Double): Long =
    df.agg(FunctionDefs.callAgg("qdigest_agg", col(vCol), lit(k)).as("sk"))
      .select(expr(s"qdigest_quantile(sk, ${q}d)").as("v"))
      .head().getLong(0)

  /** True rank bound: the worst-case q-digest guarantee is
    * |rank(answer) − q·n| ≤ (64/k)·n with rank = #values ≤ answer
    * (upper rank) vs #values < answer (lower) bracketing the target.
    */
  private def rankBoundHolds(values: Array[Long], answer: Long, q: Double, k: Int): Boolean = {
    val n = values.length.toLong
    val target = math.max(1L, math.ceil(q * n).toLong)
    val bound = 64.0 * n / k
    val le = values.count(_ <= answer).toLong // highest rank answer can claim
    val lt = values.count(_ < answer).toLong // lowest rank - 1
    // some rank in (lt, le] must be within bound of the target
    (target - le) <= bound && (target - (lt + 1)) >= -bound
  }

  test("no compression regime (k >= distinct values): exact order statistics") {
    val df = Seq(5L, 1L, 9L, 3L, 7L, -4L, 0L, 11L, 2L, 6L).toDF("v")
    quantileOf(df, "v", 1024, 0.0) shouldBe -4L
    quantileOf(df, "v", 1024, 0.5) shouldBe 3L // rank ceil(0.5*10)=5 of sorted(-4,0,1,2,3,...)
    quantileOf(df, "v", 1024, 1.0) shouldBe 11L
  }

  test("worst-case rank bound holds across quantiles, including negatives and duplicates") {
    val k = 512
    val vals = spark.range(0, 50000)
      .select(((xxhash64(col("id")) % 100000L) - 50000L).as("v"))
      .repartition(16) // force map-side partials + merges
      .localCheckpoint()
    val arr = vals.collect().map(_.getLong(0))
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = quantileOf(vals, "v", k, q)
      withClue(s"q=$q est=$est") { rankBoundHolds(arr, est, q, k) shouldBe true }
    }
  }

  test("merge-order robustness: the bound holds at every partitioning (sketch bytes may differ)") {
    val base = spark.range(0, 20000).select((col("id") * col("id") % 999983L).as("v"))
    val arr = base.collect().map(_.getLong(0))
    for (parts <- Seq(1, 7, 32)) {
      val est = quantileOf(base.repartition(parts), "v", 256, 0.5)
      withClue(s"parts=$parts") { rankBoundHolds(arr, est, 0.5, 256) shouldBe true }
    }
  }

  test("state is k-bounded: sketch nodes never exceed 6k even at 200k distinct values") {
    val k = 128
    val sk = spark.range(0, 200000)
      .select(xxhash64(col("id")).as("v")).repartition(8)
      .agg(FunctionDefs.callAgg("qdigest_agg", col("v"), lit(k)).as("sk"))
      .head().getSeq[Long](0)
    sk(0) shouldBe 200000L
    ((sk.length - 2) / 3) should be <= 6 * k
  }

  test("nulls ignored; empty input reads back null") {
    val df = Seq[java.lang.Long](1L, null, 3L).toDF("v")
    quantileOf(df, "v", 64, 1.0) shouldBe 3L
    val empty = Seq.empty[Long].toDF("v")
    empty.agg(FunctionDefs.callAgg("qdigest_agg", col("v"), lit(64)).as("sk"))
      .select(expr("qdigest_quantile(sk, 0.5d)").as("v"))
      .head().isNullAt(0) shouldBe true
  }

  test("resolves from SQL and plans a partial aggregate") {
    spark.range(0, 1000).select(col("id").as("v")).createOrReplaceTempView("qd_in")
    val df = spark.sql(
      "SELECT qdigest_quantile(qdigest_agg(v, 256), 0.5d) AS med FROM qd_in")
    val med = df.head().getLong(0)
    math.abs(med - 500L).toDouble should be <= 64.0 * 1000 / 256 + 1
    df.queryExecution.executedPlan.toString should include("partial_qdigest_agg")
  }

  test("streaming complete-mode aggregate: bound holds after every micro-batch") {
    val input = MemoryStream[Long](spark)
    val agg = input.toDF().select(col("value").as("v"))
      .agg(FunctionDefs.callAgg("qdigest_agg", col("v"), lit(256)).as("sk"))
      .select(expr("qdigest_quantile(sk, 0.5d)").as("med"))
    val q = agg.writeStream.format("memory").queryName("qd_stream")
      .outputMode("complete").start()
    try {
      val all = scala.collection.mutable.ArrayBuffer.empty[Long]
      for (batch <- (0 until 3).map(b => (0 until 5000).map(i => (b * 5000 + i) * 37L % 100000L))) {
        input.addData(batch: _*)
        q.processAllAvailable()
        all ++= batch
        val med = spark.table("qd_stream").head().getLong(0)
        rankBoundHolds(all.toArray, med, 0.5, 256) shouldBe true
      }
    } finally q.stop()
  }
}
