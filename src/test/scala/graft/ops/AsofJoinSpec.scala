package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class AsofJoinSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private def frame(schema: StructType, rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

  private val tradeSchema = StructType(Seq(
    StructField("sym", StringType), StructField("t", LongType),
    StructField("qty", LongType)))
  private val quoteSchema = StructType(Seq(
    StructField("sym", StringType), StructField("qt", LongType),
    StructField("px", DoubleType)))

  private lazy val trades = frame(tradeSchema,
    Row("A", 2L, 10L), Row("A", 3L, 20L), Row("A", 6L, 30L),
    Row("B", 1L, 40L), // before any B quote → null match
    Row("B", 9L, 50L))
  private lazy val quotes = frame(quoteSchema,
    Row("A", 1L, 1.0), Row("A", 3L, 3.0), Row("A", 5L, 5.0),
    Row("B", 2L, 2.0), Row("B", 7L, 7.0))

  test("latest quote at-or-before each trade; inclusive ties; null when none") {
    val out = AsofJoin.asof(trades, "t", quotes, "qt", Seq("sym"))
      .select("sym", "t", "qty", "qt", "px").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (if (r.isNullAt(4)) None else Some((r.getLong(3), r.getDouble(4))))).toMap
    out(("A", 2L)) shouldBe Some((1L, 1.0))
    out(("A", 3L)) shouldBe Some((3L, 3.0)) // equal timestamps match (inclusive)
    out(("A", 6L)) shouldBe Some((5L, 5.0))
    out(("B", 1L)) shouldBe None            // left join: no earlier quote
    out(("B", 9L)) shouldBe Some((7L, 7.0))
  }

  test("plan is one window over a union — no cartesian or range-join explosion") {
    val plan = AsofJoin.asof(trades, "t", quotes, "qt", Seq("sym"))
      .queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("randomized: equals per-key brute force on seeded data (unique right ts per key)") {
    val r = new scala.util.Random(0xA50F)
    val keys = Seq("k0", "k1", "k2", "k3", "k4")
    val lefts = (1 to 150).map(i => Row(keys(r.nextInt(5)), r.nextInt(1000).toLong, i.toLong))
    // distinct (key, ts) on the right so the brute-force expectation is
    // single-valued (ties are documented as unspecified)
    val rights = r.shuffle((0 until 1000).toList).take(120).zipWithIndex.map {
      case (ts, i) => Row(keys(i % 5), ts.toLong, i.toDouble)
    }
    val ldf = frame(tradeSchema, lefts: _*)
    val rdf = frame(quoteSchema, rights: _*)
    val byKey = rights.groupBy(_.getString(0))
      .view.mapValues(_.map(q => (q.getLong(1), q.getDouble(2))).sortBy(_._1)).toMap
    val got = AsofJoin.asof(ldf, "t", rdf, "qt", Seq("sym")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    lefts.foreach { l =>
      val (k, t, q) = (l.getString(0), l.getLong(1), l.getLong(2))
      val expected = byKey.getOrElse(k, Nil).filter(_._1 <= t).lastOption.map(_._2)
      withClue(s"key=$k t=$t") { got((k, t, q)) shouldBe expected }
    }
  }

  test("asofBucketed == asof at every bucket width, including one hot key") {
    val r = new scala.util.Random(0xB0C4)
    val tsSchema = StructType(Seq(
      StructField("sym", StringType), StructField("t", TimestampType),
      StructField("qty", LongType)))
    val qsSchema = StructType(Seq(
      StructField("sym", StringType), StructField("qt", TimestampType),
      StructField("px", DoubleType)))
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    // hot key: 80% of rows land on k0; right ts unique per key
    val keys = Seq("k0", "k0", "k0", "k0", "k1")
    val lefts = (1 to 200).map(i => Row(keys(r.nextInt(5)), ts(r.nextInt(5000).toLong), i.toLong))
    val rights = r.shuffle((0 until 5000).toList).take(150).zipWithIndex.map {
      case (s, i) => Row(keys(i % 5), ts(s.toLong), i.toDouble)
    }
    val ldf = frame(tsSchema, lefts: _*)
    val rdf = frame(qsSchema, rights: _*)
    val reference = AsofJoin.asof(ldf, "t", rdf, "qt", Seq("sym"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    // widths spanning one-epoch-per-event up to everything-in-one-epoch
    for (width <- Seq(1L, 60L, 3600L, 1000000L)) {
      val got = AsofJoin.asofBucketed(ldf, "t", rdf, "qt", Seq("sym"), width)
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)) ->
          (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
      withClue(s"bucketSeconds=$width") { got shouldBe reference }
    }
  }

  test("asofBucketed window partitions by (key, epoch) — hot key splits across tasks") {
    val tsSchema = StructType(Seq(
      StructField("sym", StringType), StructField("t", TimestampType),
      StructField("qty", LongType)))
    val qsSchema = StructType(Seq(
      StructField("sym", StringType), StructField("qt", TimestampType),
      StructField("px", DoubleType)))
    def ts(s: Long) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val ldf = frame(tsSchema, (1 to 50).map(i => Row("hot", ts(i * 60L), i.toLong)): _*)
    val rdf = frame(qsSchema, (1 to 10).map(i => Row("hot", ts(i * 300L), i.toDouble)): _*)
    val plan = AsofJoin.asofBucketed(ldf, "t", rdf, "qt", Seq("sym"), 600L)
      .queryExecution.executedPlan.toString
    // the event window's partition spec must include the epoch column
    plan.linesIterator.filter(_.contains("Window"))
      .exists(l => l.contains("__bk")) shouldBe true
    plan should not include "CartesianProduct"
  }

  test("column collisions and reserved names fail loudly") {
    intercept[IllegalArgumentException] {
      // right's payload column "qty" collides with left
      AsofJoin.asof(trades, "t",
        quotes.withColumnRenamed("px", "qty"), "qt", Seq("sym"))
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(trades.withColumn("__ts", col("t")), "t", quotes, "qt", Seq("sym"))
    }
  }

  test("int8 quantization: exact arithmetic, bounded reconstruction error") {
    import graft.functions.Vectors
    val df = frame(
      StructType(Seq(StructField("id", LongType),
        StructField("v", ArrayType(DoubleType)))),
      Row(1L, Seq(0.5, -1.0, 0.25)),
      Row(2L, Seq(0.0, 0.0, 0.0)))
    val q = df
      .withColumn("scale", Vectors.int8Scale(col("v")))
      .withColumn("q", Vectors.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", Vectors.dequantizeInt8(col("q"), col("scale")))
      .collect().map(r => r.getLong(0) -> r).toMap
    q(1L).getDouble(2) shouldBe 127.0 // scale = 127/max|x| = 127/1.0
    q(1L).getSeq[Int](3) shouldBe Seq(64, -127, 32) // round(63.5)=64 half-up
    val deq = q(1L).getSeq[Double](4)
    deq.zip(Seq(0.5, -1.0, 0.25)).foreach { case (d, orig) =>
      math.abs(d - orig) should be <= (0.5 / 127.0 + 1e-12)
    }
    q(2L).getDouble(2) shouldBe 1.0 // zero vector: scale 1, q = zeros
    q(2L).getSeq[Int](3) shouldBe Seq(0, 0, 0)
  }
}
