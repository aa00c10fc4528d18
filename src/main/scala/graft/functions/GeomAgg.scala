package graft.functions

import graft.geom.{GeomIO, GeometryUDT}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.DataType
import org.locationtech.jts.geom.Geometry

/** Aggregate convex hull: the hull of every geometry in the group.
  *
  * The reference exposes this as a Hive UDAF under the SQL name
  * st_convexHull (spatial/src/main/scala/com/azavea/hiveless/spatial/
  * ST_ConvexHull.scala:24 — resolver + HGenericUDAFEvaluator); here it is
  * a native Catalyst TypedImperativeAggregate registered as
  * st_convexHullAggr (the scalar per-geometry st_convexHull keeps the
  * name GeoMesa users expect). Same accumulation scheme as the reference:
  * fold each input's hull into the running hull so the buffer stays a
  * small convex polygon, never a growing collection. Buffers travel as
  * WKB. Partial aggregation applies — each partition reduces to one small
  * hull before the shuffle.
  */
case class ConvexHullAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Geometry] with UnaryLike[Expression] {

  override def prettyName: String = "st_convexhullaggr"
  override def dataType: DataType = new GeometryUDT
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (!child.resolved || GeomFn.compatible(child.dataType, new GeometryUDT))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"st_convexHullAggr expects a geometry column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Geometry = null

  // hull(A ∪ B) = hull(coords(A) ++ coords(B)): a GeometryCollection hull
  // only gathers coordinates — no JTS overlay/noding per row, which would
  // otherwise dominate a full scan.
  private def foldHull(a: Geometry, b: Geometry): Geometry =
    a.getFactory.createGeometryCollection(Array(a, b)).convexHull()

  override def update(buffer: Geometry, input: InternalRow): Geometry = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val g = GeomIO.fromWKB(v.asInstanceOf[Array[Byte]])
      if (buffer == null) g.convexHull() else foldHull(buffer, g)
    }
  }

  override def merge(a: Geometry, b: Geometry): Geometry =
    if (a == null) b
    else if (b == null) a
    else foldHull(a, b)

  override def eval(buffer: Geometry): Any =
    if (buffer == null) null else GeomIO.toWKB(buffer)

  override def serialize(buffer: Geometry): Array[Byte] =
    if (buffer == null) Array.emptyByteArray else GeomIO.toWKB(buffer)

  override def deserialize(bytes: Array[Byte]): Geometry =
    if (bytes.isEmpty) null else GeomIO.fromWKB(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): ConvexHullAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ConvexHullAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ConvexHullAgg =
    copy(child = newChild)
}
