package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** MERGE/CDC-apply and incremental aggregate maintenance: hand-checked
  * semantics plus the invisibility contracts (merge == relational
  * replay, refresh == full recompute).
  */
class MergeIncrementalSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import scala.jdk.CollectionConverters._

  private def table(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType))))

  private def changes(rows: (String, Long, String, Long)*) =
    spark.createDataFrame(
      rows.map { case (op, k, v, seq) => org.apache.spark.sql.Row(op, k, v, seq) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType))))

  test("applyChanges: delete drops, latest update wins, insert lands, upsert replaces") {
    val base = table(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e")
    val ch = changes(
      ("D", 1L, "ignored", 1L),
      ("U", 2L, "stale", 1L), ("U", 2L, "b2", 2L), // latest-wins
      ("I", 9L, "new", 1L),
      ("I", 3L, "c2", 1L), // upsert on existing key replaces
      ("U", 4L, "d2", 1L), ("D", 4L, "gone", 2L)) // update then delete → gone
    for (bc <- Seq(true, false)) {
      val out = MergeInto.applyChanges(base, ch, "k", "op", "seq", broadcastChanges = bc)
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted
      out shouldBe Array(2L -> "b2", 3L -> "c2", 5L -> "e", 9L -> "new")
    }
  }

  test("applyChanges: schema contract violations fail fast") {
    val base = table(1L -> "a")
    val missingPayload = changes(("U", 1L, "x", 1L)).drop("v")
    an[IllegalArgumentException] should be thrownBy
      MergeInto.applyChanges(base, missingPayload, "k", "op", "seq")
  }

  test("refreshSums: folded aggregate == full recompute; delta-only groups appear") {
    val rows = (1L to 100L).map(i => (s"g${i % 7}", i))
    val hist = rows.take(70) ++ Seq(("onlyOld", 5L))
    val delta = rows.drop(70) ++ Seq(("onlyNew", 9L))
    def mk(rs: Seq[(String, Long)]) = spark.createDataFrame(
      rs.map { case (g, x) => org.apache.spark.sql.Row(g, x) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("x", org.apache.spark.sql.types.LongType))))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val folded = Incremental.refreshSums(agg(mk(hist)), agg(mk(delta)), Seq("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val full = agg(mk(hist ++ delta))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    folded shouldBe full
    folded.map(_._1) should contain allOf ("onlyOld", "onlyNew")
  }

  test("refreshJoin: a delta past maxBroadcastRows falls back to a shuffle join with identical rows") {
    import spark.implicits._
    val aOld = Seq((1L, "a1"), (2L, "a2")).toDF("k", "av")
    val bOld = Seq((1L, "b1"), (3L, "b3")).toDF("k", "bv")
    val dA = Seq((3L, "a3"), (4L, "a4")).toDF("k", "av")
    val dB = Seq((2L, "b2"), (4L, "b4")).toDF("k", "bv")
    val viewOld = aOld.join(bOld, Seq("k"))
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    // broadcast path (deltas under the cap) and fallback path (cap = 1
    // forces the shuffle join) must produce the same view, row for row
    for (cap <- Seq(Long.MaxValue, 1L)) {
      val got = Incremental.refreshJoin(viewOld, aOld, dA, bOld, dB,
          Seq("k"), maxBroadcastRows = cap)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
      got shouldBe full
    }
  }
}
