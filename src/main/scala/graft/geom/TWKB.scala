package graft.geom

import org.locationtech.jts.geom._

/** TWKB (Tiny WKB) geometry codec, implemented from the public TWKB
  * specification (github.com/TWKB/Specification): type-and-precision
  * header byte, metadata byte, zigzag-varint delta-encoded coordinates.
  * Covers Point / LineString / Polygon / MultiPoint / MultiLineString /
  * MultiPolygon / GeometryCollection, XY, no bbox/size/id lists — the
  * same surface the reference exercises
  * (jts/src/main/scala/com/azavea/hiveless/spatial/util/TWKBUtils.scala:1).
  */
object TWKB {

  val DefaultPrecision: Int = 7

  // --- varint primitives (protobuf-style, public encoding) ---

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private final class Buf(var arr: Array[Byte] = new Array[Byte](64), var len: Int = 0) {
    def ensure(n: Int): Unit =
      if (len + n > arr.length) {
        val next = new Array[Byte](math.max(arr.length * 2, len + n))
        System.arraycopy(arr, 0, next, 0, len)
        arr = next
      }
    def byte(b: Int): Unit = { ensure(1); arr(len) = b.toByte; len += 1 }
    def varint(v0: Long): Unit = {
      var v = v0
      ensure(10)
      while ((v & ~0x7fL) != 0) { arr(len) = ((v & 0x7f) | 0x80).toByte; len += 1; v >>>= 7 }
      arr(len) = (v & 0x7f).toByte; len += 1
    }
    def svarint(v: Long): Unit = varint(zigzag(v))
    def result(): Array[Byte] = java.util.Arrays.copyOf(arr, len)
  }

  private final class Cursor(val arr: Array[Byte], var pos: Int = 0) {
    def byte(): Int = { val b = arr(pos) & 0xff; pos += 1; b }
    def varint(): Long = {
      var shift = 0; var out = 0L; var b = 0
      do { b = byte(); out |= (b & 0x7fL) << shift; shift += 7 } while ((b & 0x80) != 0)
      out
    }
    def svarint(): Long = unzigzag(varint())
  }

  // --- write ---

  def write(g: Geometry, precision: Int = DefaultPrecision): Array[Byte] = {
    val buf = new Buf()
    writeGeom(g, precision, buf)
    buf.result()
  }

  private def typeCode(g: Geometry): Int = g match {
    case _: Point              => 1
    case _: LineString         => 2
    case _: Polygon            => 3
    case _: MultiPoint         => 4
    case _: MultiLineString    => 5
    case _: MultiPolygon       => 6
    case _: GeometryCollection => 7
  }

  private def writeGeom(g: Geometry, precision: Int, buf: Buf): Unit = {
    // type-and-precision byte: low nibble type, high nibble zigzag precision
    buf.byte((zigzag(precision.toLong).toInt << 4) | typeCode(g))
    // metadata byte: only the empty-geometry flag (0x10) may be set here
    buf.byte(if (g.isEmpty) 0x10 else 0x00)
    if (g.isEmpty) return
    val scale = math.pow(10, precision)
    val last = Array(0L, 0L)
    g match {
      case p: Point           => writeCoords(p.getCoordinates, scale, last, buf, header = false)
      case l: LineString      => writeCoords(l.getCoordinates, scale, last, buf, header = true)
      case p: Polygon         => writePolygon(p, scale, last, buf)
      case m: MultiPoint      =>
        buf.varint(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach(i => writeCoords(m.getGeometryN(i).getCoordinates, scale, last, buf, header = false))
      case m: MultiLineString =>
        buf.varint(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach(i => writeCoords(m.getGeometryN(i).getCoordinates, scale, last, buf, header = true))
      case m: MultiPolygon    =>
        buf.varint(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach(i => writePolygon(m.getGeometryN(i).asInstanceOf[Polygon], scale, last, buf))
      case gc: GeometryCollection =>
        buf.varint(gc.getNumGeometries)
        (0 until gc.getNumGeometries).foreach(i => writeGeom(gc.getGeometryN(i), precision, buf))
    }
  }

  private def writePolygon(p: Polygon, scale: Double, last: Array[Long], buf: Buf): Unit = {
    buf.varint(1 + p.getNumInteriorRing)
    writeCoords(p.getExteriorRing.getCoordinates, scale, last, buf, header = true)
    (0 until p.getNumInteriorRing).foreach(i => writeCoords(p.getInteriorRingN(i).getCoordinates, scale, last, buf, header = true))
  }

  private def writeCoords(cs: Array[Coordinate], scale: Double, last: Array[Long],
                          buf: Buf, header: Boolean): Unit = {
    if (header) buf.varint(cs.length)
    var i = 0
    while (i < cs.length) {
      val x = math.round(cs(i).x * scale)
      val y = math.round(cs(i).y * scale)
      buf.svarint(x - last(0)); last(0) = x
      buf.svarint(y - last(1)); last(1) = y
      i += 1
    }
  }

  // --- read ---

  def read(bytes: Array[Byte]): Geometry = readGeom(new Cursor(bytes))

  private def readGeom(cur: Cursor): Geometry = {
    val f = GeomIO.factory
    val tp = cur.byte()
    val geomType = tp & 0x0f
    val precision = unzigzag((tp >> 4).toLong).toInt
    val meta = cur.byte()
    // 0x01 bbox / 0x02 size / 0x04 idlist change the byte layout, and
    // 0x08 (extended dims: a PostGIS Z/M TWKB) adds a dimensions byte plus
    // extra per-vertex ordinates — silently parsing any of them would
    // yield corrupt coordinates, so all four fail loudly.
    require((meta & 0x0f) == 0,
      "TWKB bbox/size/idlist/extended-dims metadata not supported by this reader " +
        f"(metadata byte 0x$meta%02x)")
    val empty = (meta & 0x10) != 0
    val scale = math.pow(10, precision)
    val last = Array(0L, 0L)
    def coords(n: Int): Array[Coordinate] = {
      val out = new Array[Coordinate](n)
      var i = 0
      while (i < n) {
        last(0) += cur.svarint(); last(1) += cur.svarint()
        out(i) = new Coordinate(last(0) / scale, last(1) / scale)
        i += 1
      }
      out
    }
    def ring(): LinearRing = {
      val cs = coords(cur.varint().toInt)
      // TWKB permits dropping the closing point; restore it for JTS
      val closed = if (cs.length > 0 && cs.head != cs.last) cs :+ cs.head.copy() else cs
      f.createLinearRing(closed)
    }
    def polygon(): Polygon = {
      val nRings = cur.varint().toInt
      if (nRings == 0) f.createPolygon()
      else {
        val shell = ring()
        val holes = Array.fill(nRings - 1)(ring())
        f.createPolygon(shell, holes)
      }
    }
    geomType match {
      case 1 => if (empty) f.createPoint() else f.createPoint(coords(1)(0))
      case 2 => if (empty) f.createLineString() else f.createLineString(coords(cur.varint().toInt))
      case 3 => if (empty) f.createPolygon() else polygon()
      case 4 => if (empty) f.createMultiPoint() else
        f.createMultiPoint(Array.fill(cur.varint().toInt)(coords(1)(0)).map(f.createPoint))
      case 5 => if (empty) f.createMultiLineString(Array.empty[LineString]) else
        f.createMultiLineString(Array.fill(cur.varint().toInt)(f.createLineString(coords(cur.varint().toInt))))
      case 6 => if (empty) f.createMultiPolygon(Array.empty[Polygon]) else
        f.createMultiPolygon(Array.fill(cur.varint().toInt)(polygon()))
      case 7 => if (empty) f.createGeometryCollection() else
        f.createGeometryCollection(Array.fill(cur.varint().toInt)(readGeom(cur)))
      case other => throw new IllegalArgumentException(s"bad TWKB type $other")
    }
  }
}
