package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class RangeJoinSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private lazy val points = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(1L, 0.5), Row(2L, 3.0), Row(3L, 7.25), Row(4L, -2.0), Row(5L, 100.0)),
    StructType(Seq(StructField("pid", LongType), StructField("v", DoubleType))))
  private lazy val intervals = spark.createDataFrame(
    java.util.Arrays.asList(
      Row(10L, 0.0, 3.0),     // catches 0.5 and 3.0 (closed bounds)
      Row(11L, 2.5, 8.0),     // catches 3.0 and 7.25
      Row(12L, -5.0, -1.0),   // catches -2.0 (negative cells)
      Row(13L, 50.0, 60.0)),  // catches nothing
    StructType(Seq(StructField("iid", LongType),
      StructField("lo", DoubleType), StructField("hi", DoubleType))))

  test("matches the brute-force BETWEEN join exactly, incl. closed bounds and negatives") {
    val expected = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    expected should not be empty
    for (w <- Seq(0.5, 2.0, 10.0)) { // cell width is perf-only, never semantics
      val got = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      withClue(s"cellWidth=$w") {
        got.toSet shouldBe expected
        got.length shouldBe expected.size // one row per pair, no dups
      }
    }
  }

  test("plan is a cell equi-join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 2.0)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("randomized: equals brute force on 200×60 seeded data, several cell widths") {
    val r = new scala.util.Random(0xBEEF)
    val pts = (1 to 200).map(i => Row(i.toLong, r.nextDouble() * 200 - 100))
    val ivs = (1 to 60).map { i =>
      val lo = r.nextDouble() * 200 - 110
      Row(1000L + i, lo, lo + r.nextDouble() * 30)
    }
    val pdf = spark.createDataFrame(java.util.Arrays.asList(pts: _*),
      StructType(Seq(StructField("pid", LongType), StructField("v", DoubleType))))
    val idf = spark.createDataFrame(java.util.Arrays.asList(ivs: _*),
      StructType(Seq(StructField("iid", LongType),
        StructField("lo", DoubleType), StructField("hi", DoubleType))))
    val expected = (for {
      Row(pid: Long, v: Double) <- pts
      Row(iid: Long, lo: Double, hi: Double) <- ivs
      if v >= lo && v <= hi
    } yield (pid, iid)).toSet
    expected.size should be > 50
    for (w <- Seq(1.0, 7.3, 64.0)) {
      val got = RangeJoin.pointInInterval(pdf, "v", idf, "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      withClue(s"cellWidth=$w") {
        got.toSet shouldBe expected
        got.length shouldBe expected.size
      }
    }
  }

  test("reserved/colliding column names fail loudly") {
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("__cell", lit(1)), "v",
        intervals, "lo", "hi", 1.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v",
        intervals.withColumnRenamed("iid", "pid"), "lo", "hi", 1.0)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, "v", intervals, "lo", "hi", 0.0)
    }
  }
}
