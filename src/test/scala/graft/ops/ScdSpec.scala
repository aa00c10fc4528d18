package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class ScdSpec extends AnyFunSuite with SparkTestSession with Matchers {
  import java.sql.Timestamp

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val obs = {
    import spark.implicits._
    Seq(
      // key 1: a→a→b→b→a  ⇒ versions a, b, a
      (1L, ts("2024-01-01 00:00:00"), 10L, "a"),
      (1L, ts("2024-01-02 00:00:00"), 11L, "a"),
      (1L, ts("2024-01-03 00:00:00"), 12L, "b"),
      (1L, ts("2024-01-04 00:00:00"), 13L, "b"),
      (1L, ts("2024-01-05 00:00:00"), 14L, "a"),
      // key 2: single observation ⇒ one open-ended version
      (2L, ts("2024-01-02 12:00:00"), 20L, "x")
    ).toDF("k", "t", "id", "attr")
  }

  private lazy val dim = Scd.buildType2(obs, "k", "t", Seq("attr"), "id")

  test("change-collapse keeps exactly the rows where the attribute changes") {
    val rows = dim.orderBy("k", "version")
      .select("k", "attr", "version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    rows shouldBe Array((1L, "a", 1), (1L, "b", 2), (1L, "a", 3), (2L, "x", 1))
  }

  test("intervals are contiguous and the last version is open-ended") {
    val k1 = dim.filter(col("k") === 1L).orderBy("version")
      .select("valid_from", "valid_to", "is_current").collect()
    k1.map(_.getTimestamp(0)) shouldBe Array(
      ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"), ts("2024-01-05 00:00:00"))
    // each valid_to IS the next valid_from
    k1.init.map(_.getTimestamp(1)) shouldBe k1.tail.map(_.getTimestamp(0))
    k1.last.isNullAt(1) shouldBe true
    k1.map(_.getBoolean(2)) shouldBe Array(false, false, true)
  }

  test("point-in-time resolves the version current at each fact ts (inclusive), null before v1") {
    import spark.implicits._
    val facts = Seq(
      (100L, 1L, ts("2023-12-31 00:00:00")), // before first version → null
      (101L, 1L, ts("2024-01-01 00:00:00")), // exactly v1 start → inclusive
      (102L, 1L, ts("2024-01-03 12:00:00")), // inside v2
      (103L, 1L, ts("2024-06-01 00:00:00")), // in the open-ended v3
      (104L, 3L, ts("2024-01-01 00:00:00"))  // unknown key → null
    ).toDF("fid", "k", "t")
    val out = Scd.pointInTime(facts, "t", dim, "k", Seq("attr"))
      .orderBy("fid").select("fid", "attr").collect()
      .map(r => (r.getLong(0), Option(r.getString(1))))
    out shouldBe Array(
      (100L, None), (101L, Some("a")), (102L, Some("b")),
      (103L, Some("a")), (104L, None))
  }

  test("the build plans ONE exchange: both window passes share the key shuffle") {
    val plan = dim.queryExecution.executedPlan.toString
    // one Exchange for the key partitioning (plus none for the filter
    // between the two windows) — a second shuffle would double the
    // dominant cost at scale
    plan.linesIterator.count(_.trim.startsWith("+- Exchange")) +
      plan.linesIterator.count(_.trim.startsWith("Exchange")) should be <= 1
  }

  test("applyIncrement == full rebuild, bit for bit (continuation, change, new key, no-op)") {
    import spark.implicits._
    val batch = Seq(
      (1L, ts("2024-02-01 00:00:00"), 30L, "a"), // same attr → NO new version
      (1L, ts("2024-02-02 00:00:00"), 31L, "c"), // change → v4
      (2L, ts("2024-02-03 00:00:00"), 32L, "y"), // change → v2
      (5L, ts("2024-02-04 00:00:00"), 33L, "q")  // brand-new key → v1
    ).toDF("k", "t", "id", "attr")
    val inc = Scd.applyIncrement(dim, batch, "k", "t", Seq("attr"), "id")
    val full = Scd.buildType2(obs.unionByName(batch), "k", "t", Seq("attr"), "id")
    val key = Seq("k", "version")
    inc.orderBy(key.map(col): _*).collect() shouldBe
      full.orderBy(key.map(col): _*).collect()
    // and the interesting rows are what they should be
    val m = inc.collect().map(r =>
      (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getBoolean(5))).toMap
    m((1L, 4)) shouldBe ("c", true)
    m((1L, 3))._2 shouldBe false // old current got closed
    m((2L, 2)) shouldBe ("y", true)
    m((5L, 1)) shouldBe ("q", true)
    inc.filter(col("k") === 1L).count() shouldBe 4 // the no-op row opened nothing
  }

  test("applyIncrement never rewrites untouched keys or closed versions") {
    import spark.implicits._
    val batch = Seq((1L, ts("2024-02-02 00:00:00"), 31L, "c")).toDF("k", "t", "id", "attr")
    val inc = Scd.applyIncrement(dim, batch, "k", "t", Seq("attr"), "id")
    // key 2 (untouched) passes through identical
    inc.filter(col("k") === 2L).collect() shouldBe
      dim.filter(col("k") === 2L).collect()
    // key 1's closed versions (1, 2) are identical; only v3 closed + v4 opened
    inc.filter(col("k") === 1L && col("version") <= 2).orderBy("version").collect() shouldBe
      dim.filter(col("k") === 1L && col("version") <= 2).orderBy("version").collect()
  }

  test("applyIncrement: a batch observation at or before the current valid_from fails LOUDLY") {
    import spark.implicits._
    // key 1's current version opened 2024-01-05; a late row AT that
    // instant violates the documented strictly-greater precondition —
    // the guard must raise, not silently build a divergent dimension
    val late = Seq((1L, ts("2024-01-05 00:00:00"), 40L, "z")).toDF("k", "t", "id", "attr")
    val e = intercept[Exception] {
      Scd.applyIncrement(dim, late, "k", "t", Seq("attr"), "id").collect()
    }
    e.getMessage should include("applyIncrement")
    val before = Seq((1L, ts("2024-01-04 12:00:00"), 41L, "z")).toDF("k", "t", "id", "attr")
    intercept[Exception] {
      Scd.applyIncrement(dim, before, "k", "t", Seq("attr"), "id").collect()
    }.getMessage should include("full rebuild")
  }

  test("applyIncrement: non-numeric (string) tiebreaker orders within-batch ties like buildType2") {
    import spark.implicits._
    // two same-timestamp batch rows for one key, STRING event ids whose
    // lexicographic order decides which attr wins — the earlier long
    // cast nulled these and made the outcome nondeterministic
    val obs0 = Seq((1L, ts("2024-01-01 00:00:00"), "e01", "a")).toDF("k", "t", "eid", "attr")
    val d0 = Scd.buildType2(obs0, "k", "t", Seq("attr"), "eid")
    val batch = Seq(
      (1L, ts("2024-02-01 00:00:00"), "e10", "b"),
      (1L, ts("2024-02-01 00:00:00"), "e05", "c") // e05 sorts first
    ).toDF("k", "t", "eid", "attr")
    val inc = Scd.applyIncrement(d0, batch, "k", "t", Seq("attr"), "eid")
    val full = Scd.buildType2(obs0.unionByName(batch), "k", "t", Seq("attr"), "eid")
    inc.orderBy("k", "version").collect() shouldBe
      full.orderBy("k", "version").collect()
    // c (e05) opens v2 and is closed by b (e10) opening v3 at the same ts
    val cur = inc.filter(col("is_current")).collect()
    cur.map(_.getAs[String]("attr")).toSeq shouldBe Seq("b")
    inc.count() shouldBe 3
  }

  test("same-instant versions: point-in-time resolves to the SURVIVING (highest) version") {
    import spark.implicits._
    // two different attrs at the same microsecond: v1 is a zero-length
    // interval [T, T), v2 is current from T — a fact at/after T must
    // see v2 deterministically, never the superseded v1
    val sameTs = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "old"),
      (1L, ts("2024-01-01 00:00:00"), 2L, "new")
    ).toDF("k", "t", "id", "attr")
    val d = Scd.buildType2(sameTs, "k", "t", Seq("attr"), "id")
    d.count() shouldBe 2 // both versions exist, v1 zero-length
    val facts = Seq((10L, 1L, ts("2024-01-01 00:00:00")),
      (11L, 1L, ts("2024-06-01 00:00:00"))).toDF("fid", "k", "t")
    val got = Scd.pointInTime(facts, "t", d, "k", Seq("attr"))
      .orderBy("fid").collect().map(_.getAs[String]("attr"))
    got shouldBe Array("new", "new")
  }

  test("null-safe collapse: a null attribute run collapses like a value run") {
    import spark.implicits._
    val withNulls = Seq(
      (9L, ts("2024-01-01 00:00:00"), 1L, null.asInstanceOf[String]),
      (9L, ts("2024-01-02 00:00:00"), 2L, null.asInstanceOf[String]),
      (9L, ts("2024-01-03 00:00:00"), 3L, "v")
    ).toDF("k", "t", "id", "attr")
    val d = Scd.buildType2(withNulls, "k", "t", Seq("attr"), "id")
      .orderBy("version").select("attr", "version").collect()
    d.map(r => (Option(r.getString(0)), r.getInt(1))) shouldBe
      Array((None, 1), (Some("v"), 2))
  }
}
