package graft.geom

import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Envelope

/** Extent = plain struct<xmin,ymin,xmax,ymax: double> — deliberately NOT
  * a UDT so parquet column statistics exist per field and range
  * predicates on the fields push down to the scan. This is the key to
  * spatial pruning at 100 TB (same design as the reference's Extent
  * struct: spatial-index/src/main/scala/com/azavea/hiveless/spatial/index/package.scala:1
  * and its pushdown rules).
  */
object Extent {
  val schema: StructType = StructType(Seq(
    StructField("xmin", DoubleType, nullable = false),
    StructField("ymin", DoubleType, nullable = false),
    StructField("xmax", DoubleType, nullable = false),
    StructField("ymax", DoubleType, nullable = false)))

  /** Z2Index-shaped struct: Morton keys of the envelope min/max corners
    * (reference: spatial-index/.../spark/geotrellis/Z2Index.scala:18).
    */
  val z2IndexSchema: StructType = StructType(Seq(
    StructField("min", LongType, nullable = false),
    StructField("max", LongType, nullable = false)))

  def isExtentType(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.length == 4 &&
        s.fieldNames.sameElements(Array("xmin", "ymin", "xmax", "ymax")) &&
        s.fields.forall(_.dataType == DoubleType)
    case _ => false
  }

  def toEnvelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Envelope =
    new Envelope(xmin, xmax, ymin, ymax)
}
