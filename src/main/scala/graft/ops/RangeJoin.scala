package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested loop: Spark plans a raw
  * `v BETWEEN lo AND hi` join as BroadcastNestedLoopJoin — O(points ×
  * intervals) comparisons. Here both sides bucket to fixed-width cells
  * (the 1-D version of graft.ops.SpatialJoin's Z2 grid): each interval
  * explodes to the cells it covers, each point lands in exactly ONE
  * cell, the join is a plain equi-join on the cell key (hash shuffle,
  * AQE-skew-splittable) and the exact BETWEEN filter verifies
  * candidates. Because a point has one cell, every (point, interval)
  * pair is emitted at most once — no dedup pass.
  *
  * Pick `cellWidth` near the typical interval length: fan-out per
  * interval is len/cellWidth + 1 cells, and candidate density per cell
  * stays O(intervals overlapping the cell).
  */
object RangeJoin {

  /** Inner-join `points` rows to the `intervals` rows whose
    * [loCol, hiCol] (closed) contains vCol. Output: all point columns,
    * then all interval columns.
    */
  def pointInInterval(
      points: DataFrame, vCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      cellWidth: Double): DataFrame = {
    require(cellWidth > 0, "cellWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__cell"),
      "RangeJoin reserves the working column __cell")
    val clash = intervals.columns.filter(points.columns.contains)
    require(clash.isEmpty,
      s"RangeJoin: column(s) ${clash.mkString(", ")} exist on both sides — rename before joining")
    val p = points.withColumn("__cell", floor(col(vCol) / cellWidth).cast("long"))
    val i = intervals.withColumn("__cell",
      explode(sequence(
        floor(col(loCol) / cellWidth).cast("long"),
        floor(col(hiCol) / cellWidth).cast("long"))))
    p.join(i, "__cell")
      .filter(col(vCol) >= col(loCol) && col(vCol) <= col(hiCol))
      .drop("__cell")
  }
}
