package graft.ops

import graft.functions.st
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed spatial join without a cross product: the Z2 grid-cell
  * cover join.
  *
  * Both sides explode their geometries into the Morton cells (at a caller
  * chosen `level`) covering their envelopes; the join runs as a plain
  * equi-join on the cell key (hash shuffle, AQE-skew-splittable), the
  * exact JTS predicate verifies candidates inside each cell, and
  * duplicate pairs (geometries sharing several cells) are eliminated with
  * the reference-point technique — a pair is emitted only from the single
  * cell containing the min-corner of the envelope intersection — so no
  * global distinct pass is needed.
  *
  * At 100 TB this is one shuffle on the cell key with per-cell fan-out
  * bounded by `level`; hot cells split via AQE skew-join handling. This
  * replaces the reference's Z2-range indexing strategy
  * (spatial-index/.../spatial/index/ST_Z2LatLon.scala:35) with a
  * join-shaped formulation; broadcast the smaller side's exploded frame
  * upstream when it fits.
  */
object SpatialJoin {

  /** Join rows whose geometries intersect. Output columns: all of left's,
    * then all of right's (like an inner join); callers project/aggregate
    * on top.
    *
    * @param level Z2 grid level (bits/dimension). Pick so typical
    *              geometries cover O(1) cells: cell width = 360/2^level
    *              degrees lon, 180/2^level lat.
    */
  /** Working-column names appended to both sides during the cell-cover
    * join; caller frames must not already use them (checked, not silently
    * clobbered).
    */
  private val Reserved = Seq("__cell", "__lext", "__rext")

  private def requireFree(df: DataFrame, side: String): Unit = {
    val clash = df.columns.filter(Reserved.contains)
    require(clash.isEmpty,
      s"SpatialJoin: $side input already has reserved working column(s) ${clash.mkString(", ")} — rename them before joining")
  }

  def intersects(
      left: DataFrame, leftGeom: String,
      right: DataFrame, rightGeom: String,
      level: Int = 8): DataFrame = {
    requireFree(left, "left")
    requireFree(right, "right")
    require(leftGeom != rightGeom,
      s"SpatialJoin.intersects: left and right geometry columns are both named '$leftGeom' — the post-join exact predicate would be ambiguous; alias one side first")
    val lev = lit(level)
    val l = left
      .withColumn("__lext", st.extentFromGeom(col(leftGeom)))
      .withColumn("__cell", explode(st.z2CellCover(col(leftGeom), lev)))
    val r = right
      .withColumn("__rext", st.extentFromGeom(col(rightGeom)))
      .withColumn("__cell", explode(st.z2CellCover(col(rightGeom), lev)))
    val refCell: Column = st.z2CellXY(
      greatest(col("__lext.xmin"), col("__rext.xmin")),
      greatest(col("__lext.ymin"), col("__rext.ymin")),
      lev)
    l.join(r, "__cell")
      .filter(col("__cell") === refCell)
      .filter(st.intersects(col(leftGeom), col(rightGeom)))
      .drop("__cell", "__lext", "__rext")
  }

  /** k nearest corpus POINTS for each query geometry, searched within
    * `radius` (planar degrees). Candidates come from the Z2 cells
    * covering the query's radius-expanded envelope (equi-join on cell —
    * each corpus point lives in exactly one cell, so no pair dedup is
    * needed); exact distances then rank through the bounded-heap
    * aggregate, so each partition reduces to ≤k candidates per query
    * before the shuffle.
    *
    * Neighbors beyond `radius` are not considered — the caller bounds the
    * search (an unbounded exact KNN needs expanding-ring search; at
    * corpus scale a radius bound is almost always what's wanted). Pick
    * `level` so a cell is at least radius wide (360/2^level ≥ radius):
    * the cover then spans O(1) cells per query.
    * Output: (qid, rank, id, dist), rank 1 = nearest, ties broken by id.
    */
  def knnPoints(
      queries: DataFrame, qidCol: String, qGeom: String,
      corpus: DataFrame, idCol: String, cGeom: String,
      k: Int, radius: Double, level: Int = 6): DataFrame = {
    // no reserved-name guard needed here: both sides are projected to
    // fixed names (qid/__qg, id/__cg) before any working column is added,
    // so caller column names cannot collide with the working set
    val lev = lit(level)
    val q = queries.select(col(qidCol).as("qid"), col(qGeom).as("__qg"))
      .withColumn("__e", st.extentFromGeom(col("__qg")))
      .withColumn("__box", st.makeBBOX(
        col("__e.xmin") - radius, col("__e.ymin") - radius,
        col("__e.xmax") + radius, col("__e.ymax") + radius))
      .withColumn("__cell", explode(st.z2CellCover(col("__box"), lev)))
      .select("qid", "__qg", "__cell")
    val c = corpus.select(col(idCol).as("id"), col(cGeom).as("__cg"))
      .withColumn("__cell", st.z2Cell(col("__cg"), lev))
    c.join(q, "__cell")
      .withColumn("__dist", st.distance(col("__qg"), col("__cg")))
      .filter(col("__dist") <= radius)
      .groupBy("qid")
      .agg(graft.functions.FunctionDefs.callAgg("topk_by_score",
        col("id"), -col("__dist"), lit(k)).as("__top"))
      .select(col("qid"), posexplode(col("__top")).as(Seq("__r", "__t")))
      .select(col("qid"), (col("__r") + 1).cast("int").as("rank"),
        col("__t.id").as("id"), (-col("__t.score")).as("dist"))
  }
}
