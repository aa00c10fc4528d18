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
  */
object GeomIO extends Serializable {

  val factory: GeometryFactory = new GeometryFactory(new PrecisionModel(), 4326)

  private val wkbReader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(factory))
  private val wkbWriter = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  private val wktReader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(factory))
  private val wktWriter = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))

  def fromWKB(bytes: Array[Byte]): Geometry = wkbReader.get.read(bytes)
  def toWKB(g: Geometry): Array[Byte]       = wkbWriter.get.write(g)
  def fromWKT(wkt: String): Geometry        = wktReader.get.read(wkt)
  def toWKT(g: Geometry): String            = wktWriter.get.write(g)

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
