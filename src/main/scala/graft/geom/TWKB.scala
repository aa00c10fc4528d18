package graft.geom

import org.locationtech.jts.geom._

/** TWKB (Tiny WKB) geometry codec, implemented from the public TWKB
  * specification (github.com/TWKB/Specification): type-and-precision
  * header byte, metadata byte, zigzag-varint delta-encoded coordinates.
  * Covers Point / LineString / Polygon / MultiPoint / MultiLineString /
  * MultiPolygon / GeometryCollection — the same class surface the
  * reference exercises
  * (jts/src/main/scala/com/azavea/hiveless/spatial/util/TWKBUtils.scala:1) —
  * plus extended-precision Z/M ordinates (metadata flag 0x08 + the
  * dimensions byte, matching the reference's vendored reader,
  * jts/src/main/java/.../hiveless/serializers/TWKBReader.java:93-126), so
  * PostGIS-written Z/M TWKB ingests instead of erroring. The optional
  * bbox / size / idlist metadata (0x01/0x02/0x04) parse on read (size is
  * length-validated, bbox and per-member ids are skipped — they are
  * redundant with the body / have no JTS slot), and the writer can emit
  * bbox/size on request, matching the reference reader's full metadata
  * surface (TWKBReader.java:93-105).
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

  /** Per-geometry dimension plan: which extra ordinates travel, at what
    * precision, with the running delta state for all four lanes.
    */
  private final class Dims(val hasZ: Boolean, val hasM: Boolean,
                           val zScale: Double, val mScale: Double) {
    val last = new Array[Long](4)
  }

  /** Z is present iff the first coordinate carries a real (non-NaN) Z; M
    * likewise (JTS geometries are dimension-homogeneous in practice; an
    * XYM point is stored as XYZM with NaN Z, so it maps to M-only).
    */
  private def zmOf(g: Geometry): (Boolean, Boolean) = {
    if (g.isEmpty) return (false, false)
    val c = g.getCoordinate
    (!java.lang.Double.isNaN(c.getZ), !java.lang.Double.isNaN(c.getM))
  }

  // --- write ---

  /** Z/M ordinates are emitted at `precision` clamped to the extended
    * byte's unsigned 3-bit range [0, 7] (XY precision itself is zigzag
    * and may be negative).
    *
    * `withBBox` / `withSize` emit the optional bounding-box (0x01) and
    * byte-size (0x02) metadata on the top-level geometry, matching the
    * canonical writer's options (reference TWKBWriter.java) — per the
    * spec the size varint counts everything after itself (bbox + body),
    * and the bbox is one (min, extent-delta) svarint pair per dimension
    * in scaled integers. Collection members stay plain.
    */
  def write(g: Geometry, precision: Int = DefaultPrecision,
            withBBox: Boolean = false, withSize: Boolean = false): Array[Byte] = {
    if (!withBBox && !withSize) {
      val buf = new Buf()
      writeGeom(g, precision, buf)
      buf.result()
    } else {
      val head = new Buf()
      val metaExtra = (if (withBBox && !g.isEmpty) 0x01 else 0) | (if (withSize) 0x02 else 0)
      writeHeaderAndMeta(g, precision, head, metaExtra)
      val rest = new Buf()
      if (withBBox && !g.isEmpty) writeBBox(g, precision, rest)
      if (!g.isEmpty) writeBody(g, precision, rest)
      if (withSize) head.varint(rest.len)
      val out = new Array[Byte](head.len + rest.len)
      System.arraycopy(head.arr, 0, out, 0, head.len)
      System.arraycopy(rest.arr, 0, out, head.len, rest.len)
      out
    }
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
    writeHeaderAndMeta(g, precision, buf, 0)
    if (g.isEmpty) return
    writeBody(g, precision, buf)
  }

  private def writeHeaderAndMeta(g: Geometry, precision: Int, buf: Buf, metaExtra: Int): Unit = {
    // type-and-precision byte: low nibble type, high nibble zigzag precision
    buf.byte((zigzag(precision.toLong).toInt << 4) | typeCode(g))
    val (hasZ, hasM) = zmOf(g)
    val extPrec = math.max(0, math.min(7, precision))
    // metadata byte: empty-geometry flag (0x10), extended-dims (0x08),
    // plus any caller-requested bbox/size bits
    var meta = metaExtra
    if (g.isEmpty) meta |= 0x10
    if (hasZ || hasM) meta |= 0x08
    buf.byte(meta)
    if (hasZ || hasM)
      buf.byte((if (hasZ) 0x01 else 0) | (if (hasM) 0x02 else 0) |
        ((if (hasZ) extPrec else 0) << 2) | ((if (hasM) extPrec else 0) << 5))
  }

  /** Bounding box in scaled integers, one (min, max−min) svarint pair
    * per dimension, over the same rounded values the coordinates emit.
    */
  private def writeBBox(g: Geometry, precision: Int, buf: Buf): Unit = {
    val (hasZ, hasM) = zmOf(g)
    val extPrec = math.max(0, math.min(7, precision))
    val scale = math.pow(10, precision)
    val extScale = math.pow(10, extPrec)
    val nDims = 2 + (if (hasZ) 1 else 0) + (if (hasM) 1 else 0)
    val mins = Array.fill(nDims)(Long.MaxValue)
    val maxs = Array.fill(nDims)(Long.MinValue)
    g.apply(new CoordinateFilterBBox(scale, extScale, hasZ, hasM, mins, maxs))
    var d = 0
    while (d < nDims) {
      buf.svarint(mins(d))
      buf.svarint(maxs(d) - mins(d))
      d += 1
    }
  }

  private final class CoordinateFilterBBox(scale: Double, extScale: Double,
                                           hasZ: Boolean, hasM: Boolean,
                                           mins: Array[Long], maxs: Array[Long])
      extends org.locationtech.jts.geom.CoordinateFilter {
    def filter(c: Coordinate): Unit = {
      def upd(d: Int, v: Long): Unit = {
        if (v < mins(d)) mins(d) = v
        if (v > maxs(d)) maxs(d) = v
      }
      upd(0, math.round(c.x * scale))
      upd(1, math.round(c.y * scale))
      if (hasZ) upd(2, math.round(c.getZ * extScale))
      if (hasM) upd(2 + (if (hasZ) 1 else 0), math.round(c.getM * extScale))
    }
  }

  private def writeBody(g: Geometry, precision: Int, buf: Buf): Unit = {
    val (hasZ, hasM) = zmOf(g)
    val extPrec = math.max(0, math.min(7, precision))
    val scale = math.pow(10, precision)
    val extScale = math.pow(10, extPrec)
    val dims = new Dims(hasZ, hasM, extScale, extScale)
    g match {
      case p: Point           => writeCoords(p.getCoordinates, scale, dims, buf, header = false)
      case l: LineString      => writeCoords(l.getCoordinates, scale, dims, buf, header = true)
      case p: Polygon         => writePolygon(p, scale, dims, buf)
      case m: MultiPoint      =>
        buf.varint(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach(i => writeCoords(m.getGeometryN(i).getCoordinates, scale, dims, buf, header = false))
      case m: MultiLineString =>
        buf.varint(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach(i => writeCoords(m.getGeometryN(i).getCoordinates, scale, dims, buf, header = true))
      case m: MultiPolygon    =>
        buf.varint(m.getNumGeometries)
        (0 until m.getNumGeometries).foreach(i => writePolygon(m.getGeometryN(i).asInstanceOf[Polygon], scale, dims, buf))
      case gc: GeometryCollection =>
        buf.varint(gc.getNumGeometries)
        (0 until gc.getNumGeometries).foreach(i => writeGeom(gc.getGeometryN(i), precision, buf))
    }
  }

  private def writePolygon(p: Polygon, scale: Double, dims: Dims, buf: Buf): Unit = {
    buf.varint(1 + p.getNumInteriorRing)
    writeCoords(p.getExteriorRing.getCoordinates, scale, dims, buf, header = true)
    (0 until p.getNumInteriorRing).foreach(i => writeCoords(p.getInteriorRingN(i).getCoordinates, scale, dims, buf, header = true))
  }

  private def writeCoords(cs: Array[Coordinate], scale: Double, dims: Dims,
                          buf: Buf, header: Boolean): Unit = {
    if (header) buf.varint(cs.length)
    val last = dims.last
    var i = 0
    while (i < cs.length) {
      val x = math.round(cs(i).x * scale)
      val y = math.round(cs(i).y * scale)
      buf.svarint(x - last(0)); last(0) = x
      buf.svarint(y - last(1)); last(1) = y
      if (dims.hasZ) {
        val z = math.round(cs(i).getZ * dims.zScale)
        buf.svarint(z - last(2)); last(2) = z
      }
      if (dims.hasM) {
        val m = math.round(cs(i).getM * dims.mScale)
        buf.svarint(m - last(3)); last(3) = m
      }
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
    val dims =
      if ((meta & 0x08) != 0) {
        val ext = cur.byte()
        new Dims((ext & 0x01) != 0, (ext & 0x02) != 0,
          math.pow(10, (ext >> 2) & 0x07), math.pow(10, (ext >> 5) & 0x07))
      } else new Dims(false, false, 1.0, 1.0)
    val empty = (meta & 0x10) != 0
    // optional metadata (spec order: size, then bbox, then the body).
    // size is validated against the remaining bytes; bbox min/extent
    // pairs are redundant with the coordinates and skipped; per-member
    // ids (0x04, multi/collection only) have no JTS slot and are
    // skipped inside the body readers.
    if ((meta & 0x02) != 0) {
      val size = cur.varint()
      require(cur.pos + size <= cur.arr.length,
        s"TWKB size metadata claims $size bytes but only ${cur.arr.length - cur.pos} remain")
    }
    if ((meta & 0x01) != 0) {
      require(!empty, "TWKB bbox metadata on an empty geometry")
      val nDims = 2 + (if (dims.hasZ) 1 else 0) + (if (dims.hasM) 1 else 0)
      var d = 0
      while (d < 2 * nDims) { cur.svarint(); d += 1 }
    }
    val idlist = (meta & 0x04) != 0
    require(!idlist || geomType >= 4,
      f"TWKB idlist metadata on non-multi geometry type $geomType (metadata byte 0x$meta%02x)")
    def skipIds(n: Int): Unit = if (idlist) { var i = 0; while (i < n) { cur.svarint(); i += 1 } }
    val scale = math.pow(10, precision)
    val last = dims.last
    def coords(n: Int): Array[Coordinate] = {
      val out = new Array[Coordinate](n)
      var i = 0
      while (i < n) {
        last(0) += cur.svarint(); last(1) += cur.svarint()
        val x = last(0) / scale
        val y = last(1) / scale
        out(i) =
          if (dims.hasM) {
            val z = if (dims.hasZ) { last(2) += cur.svarint(); last(2) / dims.zScale }
                    else java.lang.Double.NaN
            last(3) += cur.svarint()
            new CoordinateXYZM(x, y, z, last(3) / dims.mScale)
          } else if (dims.hasZ) {
            last(2) += cur.svarint()
            new Coordinate(x, y, last(2) / dims.zScale)
          } else new Coordinate(x, y)
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
      case 4 => if (empty) f.createMultiPoint() else {
        val n = cur.varint().toInt; skipIds(n)
        f.createMultiPoint(Array.fill(n)(coords(1)(0)).map(f.createPoint))
      }
      case 5 => if (empty) f.createMultiLineString(Array.empty[LineString]) else {
        val n = cur.varint().toInt; skipIds(n)
        f.createMultiLineString(Array.fill(n)(f.createLineString(coords(cur.varint().toInt))))
      }
      case 6 => if (empty) f.createMultiPolygon(Array.empty[Polygon]) else {
        val n = cur.varint().toInt; skipIds(n)
        f.createMultiPolygon(Array.fill(n)(polygon()))
      }
      case 7 => if (empty) f.createGeometryCollection() else {
        val n = cur.varint().toInt; skipIds(n)
        f.createGeometryCollection(Array.fill(n)(readGeom(cur)))
      }
      case other => throw new IllegalArgumentException(s"bad TWKB type $other")
    }
  }
}
