package graft.ops

import graft.SparkTestSession
import graft.functions.st
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Grid-cell cover join vs brute-force cross join: identical pairs, no
  * duplicates, including the box×box case where both sides span several
  * cells (exercises the reference-point dedup).
  */
class SpatialJoinSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private lazy val boxesA = SparkTestSession.session.range(60).select(
    col("id").as("aid"),
    st.makeBBOX(
      col("id").cast("double") * 3 % 120 - 60,
      (col("id") * 7).cast("double") % 100 - 50,
      col("id").cast("double") * 3 % 120 - 60 + 8.0,
      (col("id") * 7).cast("double") % 100 - 50 + 6.0).as("abox"))

  private lazy val boxesB = SparkTestSession.session.range(60).select(
    col("id").as("bid"),
    st.makeBBOX(
      (col("id") * 11).cast("double") % 120 - 58,
      (col("id") * 13).cast("double") % 100 - 49,
      (col("id") * 11).cast("double") % 120 - 58 + 7.0,
      (col("id") * 13).cast("double") % 100 - 49 + 5.0).as("bbox_"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("box×box join matches brute force exactly, with no duplicate pairs") {
    val brute = pairsOf(
      boxesA.crossJoin(boxesB).filter(st.intersects(col("abox"), col("bbox_"))))
    // boxes are 8°×6° — at level 5 (11.25°×5.6° cells) both sides multi-cell
    val grid = pairsOf(SpatialJoin.intersects(boxesA, "abox", boxesB, "bbox_", level = 5))
    grid.size shouldBe grid.distinct.size
    grid.sorted shouldBe brute.sorted
  }

  test("same result at a different grid level (level choice is perf-only)") {
    val l4 = pairsOf(SpatialJoin.intersects(boxesA, "abox", boxesB, "bbox_", level = 4)).sorted
    val l7 = pairsOf(SpatialJoin.intersects(boxesA, "abox", boxesB, "bbox_", level = 7)).sorted
    l4 shouldBe l7
  }

  test("point×box join (points cover exactly one cell)") {
    val pts = SparkTestSession.session.range(200).select(
      col("id").as("bid"),
      st.makePoint(col("id").cast("double") % 100 - 50, (col("id") * 3).cast("double") % 80 - 40).as("bbox_"))
    val brute = pairsOf(boxesA.crossJoin(pts).filter(st.intersects(col("abox"), col("bbox_"))))
    val grid = pairsOf(SpatialJoin.intersects(boxesA, "abox", pts, "bbox_", level = 6))
    grid.sorted shouldBe brute.sorted
  }

  test("join plan is an equi-join on the cell key, not a cartesian product") {
    val plan = SpatialJoin.intersects(boxesA, "abox", boxesB, "bbox_", level = 5)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }

  test("reserved working-column collisions fail loudly instead of clobbering") {
    val withCell = boxesA.withColumn("__cell", col("aid"))
    val e1 = intercept[IllegalArgumentException] {
      SpatialJoin.intersects(withCell, "abox", boxesB, "bbox_")
    }
    e1.getMessage should include("__cell")
    // identical geometry column names on both sides would make the exact
    // post-join predicate ambiguous
    val sameName = boxesB.withColumnRenamed("bbox_", "abox")
    intercept[IllegalArgumentException] {
      SpatialJoin.intersects(boxesA, "abox", sameName, "abox")
    }
  }
}
