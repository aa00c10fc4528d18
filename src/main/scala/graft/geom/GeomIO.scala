package graft.geom

import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** Thread-local JTS codecs. JTS readers/writers are stateful and not
  * thread-safe; Spark evaluates expressions on many task threads in one
  * JVM, so every (de)serialization goes through these.
  *
  * Geometry travels between operators as WKB (the engine wire format,
  * mirroring the reference's geometry-as-binary decision in
  * jts/src/main/scala/com/azavea/hiveless/spatial/util/TWKBUtils.scala:1,
  * but lossless; TWKB is offered as an explicit compact export).
  *
  * Writers are selected by the geometry's coordinate dimension, so Z and
  * M ordinates survive the UDT/WKB boundary: XY → 2D writer, XYZ → 3D,
  * XYZM → 4D (an XYM point created by st_makePointM is stored as XYZM
  * with NaN Z, which WKB round-trips losslessly).
  */
object GeomIO extends Serializable {

  val factory: GeometryFactory = new GeometryFactory(new PrecisionModel(), 4326)

  private val wkbReader  = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter2 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val wkbWriter3 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(3))
  private val wkbWriter4 = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(4))
  private val wktReader  = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter2 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))
  private val wktWriter3 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(3))
  private val wktWriter4 = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(4))

  /** Output dimension of a geometry: 2 (XY), 3 (XYZ) or 4 (XYZM).
    * Detected from the first coordinate (JTS geometries are
    * dimension-homogeneous in practice).
    */
  def outputDimension(g: Geometry): Int = {
    if (g.isEmpty) return 2
    val c = g.getCoordinate
    c match {
      case _: CoordinateXYZM => 4
      case _: CoordinateXYM  => 4 // stored as XYZM with NaN Z
      case _: CoordinateXY   => 2
      case _                 => if (java.lang.Double.isNaN(c.getZ)) 2 else 3
    }
  }

  def fromWKB(bytes: Array[Byte]): Geometry = wkbReader.get.read(bytes)

  def toWKB(g: Geometry): Array[Byte] = (outputDimension(g) match {
    case 4 => wkbWriter4
    case 3 => wkbWriter3
    case _ => wkbWriter2
  }).get.write(g)

  def fromWKT(wkt: String): Geometry = wktReader.get.read(wkt)

  def toWKT(g: Geometry): String = (outputDimension(g) match {
    case 4 => wktWriter4
    case 3 => wktWriter3
    case _ => wktWriter2
  }).get.write(g)

  /** Null-safe accessors used by expression eval (values arrive as the
    * UDT's sqlType, i.e. Array[Byte]).
    */
  def geom(v: Any): Geometry = fromWKB(v.asInstanceOf[Array[Byte]])
  def bytes(g: Geometry): Array[Byte] = toWKB(g)

  def point(x: Double, y: Double): Point = factory.createPoint(new Coordinate(x, y))

  def pointM(x: Double, y: Double, m: Double): Point = {
    val c = new CoordinateXYZM(x, y, java.lang.Double.NaN, m)
    factory.createPoint(c)
  }

  def bbox(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Geometry =
    factory.toGeometry(new Envelope(xmin, xmax, ymin, ymax))
}
