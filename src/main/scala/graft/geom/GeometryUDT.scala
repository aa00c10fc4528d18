package graft.geom

import org.apache.spark.sql.types._
import org.locationtech.jts.geom.Geometry

/** Spark SQL user-defined type for JTS geometries, stored as WKB bytes.
  *
  * sqlType is plain BinaryType so geometry columns write to parquet
  * without custom converters; all ST_* expressions operate directly on
  * the serialized form.
  */
class GeometryUDT extends UserDefinedType[Geometry] {
  override def sqlType: DataType = BinaryType
  override def serialize(obj: Geometry): Array[Byte] = GeomIO.toWKB(obj)
  override def deserialize(datum: Any): Geometry = datum match {
    case b: Array[Byte] => GeomIO.fromWKB(b)
    case g: Geometry    => g
  }
  override def userClass: Class[Geometry] = classOf[Geometry]
  override def typeName: String = "geometry"
  override def equals(o: Any): Boolean = o.isInstanceOf[GeometryUDT]
  override def hashCode(): Int = classOf[GeometryUDT].getName.hashCode
  override def catalogString: String = "geometry"
}

case object GeometryUDT extends GeometryUDT {
  /** Register the UDT so `Dataset[Geometry]`/case-class encoders resolve. */
  def init(): Unit = GeometryUDT.synchronized {
    if (!org.apache.spark.sql.types.UDTRegistration.exists(classOf[Geometry].getName)) {
      org.apache.spark.sql.types.UDTRegistration.register(
        classOf[Geometry].getName, classOf[GeometryUDT].getName)
    }
  }

  def isGeometry(dt: DataType): Boolean = dt match {
    case _: GeometryUDT => true
    case _              => false
  }
}
