package graft.functions

import graft.geom._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.AffineTransformation
import org.locationtech.jts.operation.distance.DistanceOp

/** Static implementations of every graft SQL function, with JVM
  * signatures that match Catalyst's internal representations (geometry =
  * WKB `byte[]`, strings = UTF8String, structs = InternalRow, arrays =
  * ArrayData) so generated code calls them directly — each method is both
  * the interpreted-eval body and the codegen target of a [[GeomFn]].
  *
  * Semantics follow the reference surface
  * (spatial/sql/createUDFs.sql:1 and one file per function under
  * spatial/src/main/scala/com/azavea/hiveless/spatial/), re-expressed
  * over JTS 1.20 directly.
  */
object GeomImpl {

  // Small per-thread identity memo so repeated byte[] instances (literal
  // children evaluate to the same object every row) parse once, not per row.
  // 8 slots: the widest query rows (sp_predicates: box + 3 translates +
  // line + points) juggle ~6 distinct geometries — 4 slots thrashed.
  private final val MemoSlots = 8
  private val memoKeys = ThreadLocal.withInitial[Array[AnyRef]](() => new Array[AnyRef](MemoSlots))
  private val memoVals = ThreadLocal.withInitial[Array[Geometry]](() => new Array[Geometry](MemoSlots))
  private val memoIdx  = ThreadLocal.withInitial[Array[Int]](() => new Array[Int](1))

  def parse(b: Array[Byte]): Geometry = {
    val keys = memoKeys.get()
    var i = 0
    while (i < MemoSlots) {
      if (keys(i) eq b) return memoVals.get()(i)
      i += 1
    }
    val g = GeomIO.fromWKB(b)
    val idx = memoIdx.get()
    val slot = idx(0)
    keys(slot) = b
    memoVals.get()(slot) = g
    idx(0) = (slot + 1) % MemoSlots
    g
  }

  private def out(g: Geometry): Array[Byte] = GeomIO.toWKB(g)
  private def str(s: String): UTF8String = UTF8String.fromString(s)

  // ---------------------------------------------------------------- parse

  def geomFromWKT(s: UTF8String): Array[Byte] = out(GeomIO.fromWKT(s.toString))

  private def typedFromText(s: UTF8String, cls: Class[_ <: Geometry]): Array[Byte] = {
    val g = GeomIO.fromWKT(s.toString)
    if (cls.isInstance(g)) out(g) else null
  }
  def pointFromText(s: UTF8String): Array[Byte]   = typedFromText(s, classOf[Point])
  def lineFromText(s: UTF8String): Array[Byte]    = typedFromText(s, classOf[LineString])
  def polygonFromText(s: UTF8String): Array[Byte] = typedFromText(s, classOf[Polygon])
  def mPointFromText(s: UTF8String): Array[Byte]  = typedFromText(s, classOf[MultiPoint])
  def mLineFromText(s: UTF8String): Array[Byte]   = typedFromText(s, classOf[MultiLineString])
  def mPolyFromText(s: UTF8String): Array[Byte]   = typedFromText(s, classOf[MultiPolygon])

  def geomFromWKB(b: Array[Byte]): Array[Byte] = out(GeomIO.fromWKB(b))
  def pointFromWKB(b: Array[Byte]): Array[Byte] = {
    val g = GeomIO.fromWKB(b)
    if (g.isInstanceOf[Point]) out(g) else null
  }

  def geomFromGeoJson(s: UTF8String): Array[Byte] = out(GeoJson.read(s.toString))
  def asGeoJson(b: Array[Byte]): UTF8String = str(GeoJson.write(parse(b)))

  def geomFromGeoHash(s: UTF8String): Array[Byte] =
    out(GeoHash.decodeGeometry(s.toString))
  def geomFromGeoHashPrec(s: UTF8String, prec: Int): Array[Byte] =
    out(GeoHash.decodeGeometry(s.toString, prec))
  def pointFromGeoHash(s: UTF8String): Array[Byte] =
    out(GeoHash.decodePoint(s.toString))
  def pointFromGeoHashPrec(s: UTF8String, prec: Int): Array[Byte] =
    out(GeoHash.decodePoint(s.toString, prec))
  def geoHash(b: Array[Byte], precBits: Int): UTF8String =
    str(GeoHash.encode(parse(b), precBits))

  private def castTo(b: Array[Byte], cls: Class[_ <: Geometry]): Array[Byte] = {
    val g = parse(b)
    if (cls.isInstance(g)) b else null
  }
  def castToPoint(b: Array[Byte]): Array[Byte]      = castTo(b, classOf[Point])
  def castToLineString(b: Array[Byte]): Array[Byte] = castTo(b, classOf[LineString])
  def castToPolygon(b: Array[Byte]): Array[Byte]    = castTo(b, classOf[Polygon])
  def castToGeometry(b: Array[Byte]): Array[Byte]   = b

  def byteArray(s: UTF8String): Array[Byte] = s.getBytes

  // ---------------------------------------------------------------- output

  def asText(b: Array[Byte]): UTF8String = str(GeomIO.toWKT(parse(b)))
  def asBinary(b: Array[Byte]): Array[Byte] = b
  def asTWKB(b: Array[Byte]): Array[Byte] = TWKB.write(parse(b))
  def asTWKBPrec(b: Array[Byte], prec: Int): Array[Byte] = TWKB.write(parse(b), prec)
  def geomFromTWKB(b: Array[Byte]): Array[Byte] = out(TWKB.read(b))

  /** Deflate/inflate for compact cold-storage export (TWKB + deflate is
    * the reference's wire pairing — jts/.../DeflateCompressor.scala:22).
    */
  def deflate(b: Array[Byte]): Array[Byte] = Deflate.compress(b)
  def inflate(b: Array[Byte]): Array[Byte] = Deflate.decompress(b)

  /** Bloom-filter membership probe, the scalar pair of
    * [[BloomAgg]]: same Kirsch–Mitzenmacher double-hashed bit positions
    * (bit_i = (h1 + i·h2) mod m, h2 odd), with the effective m implied by
    * the filter's byte length so build and probe share geometry by
    * construction. A false return is definitive (no false negatives).
    */
  def bloomContains(bloom: Array[Byte], hash: Long, k: Int): Boolean = {
    val m = bloom.length.toLong * 8L
    if (m == 0L) return false
    val h2 = (hash >>> 32) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(hash + i.toLong * h2, m)
      if ((bloom((pos >>> 3).toInt) & (1 << (pos & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }

  /** Point → "35°21'07.128"N 97°40'12.000"W"-style DMS text (lat lon). */
  def asLatLonText(b: Array[Byte]): UTF8String = parse(b) match {
    case p: Point =>
      def dms(v: Double, pos: String, neg: String): String = {
        val hemi = if (v < 0) neg else pos
        val a = math.abs(v)
        val d = a.toInt
        val mFull = (a - d) * 60.0
        val m = mFull.toInt
        val s = (mFull - m) * 60.0
        f"""$d%d°$m%02d'$s%06.3f"$hemi"""
      }
      str(dms(p.getY, "N", "S") + " " + dms(p.getX, "E", "W"))
    case _ => null
  }

  // ---------------------------------------------------------- constructors

  def makePoint(x: Double, y: Double): Array[Byte] = out(GeomIO.point(x, y))
  def makePointM(x: Double, y: Double, m: Double): Array[Byte] = out(GeomIO.pointM(x, y, m))

  def makeLine(points: ArrayData): Array[Byte] = {
    val n = points.numElements()
    val cs = new Array[Coordinate](n)
    var i = 0
    while (i < n) {
      cs(i) = GeomIO.fromWKB(points.getBinary(i)).getCoordinate
      i += 1
    }
    out(GeomIO.factory.createLineString(cs))
  }

  def makePolygon(shell: Array[Byte]): Array[Byte] = {
    val ring = parse(shell) match {
      case l: LineString => GeomIO.factory.createLinearRing(l.getCoordinateSequence)
      case other => throw new IllegalArgumentException(
        s"st_makePolygon expects a closed LineString, got ${other.getGeometryType}")
    }
    out(GeomIO.factory.createPolygon(ring))
  }

  def makeBBOX(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Array[Byte] =
    out(GeomIO.bbox(xmin, ymin, xmax, ymax))

  def makeBox2D(ll: Array[Byte], ur: Array[Byte]): Array[Byte] = {
    val p1 = parse(ll).asInstanceOf[Point]
    val p2 = parse(ur).asInstanceOf[Point]
    out(GeomIO.bbox(p1.getX, p1.getY, p2.getX, p2.getY))
  }

  // ------------------------------------------------------------- accessors

  def x(b: Array[Byte]): java.lang.Double = parse(b) match {
    case p: Point => p.getX
    case _        => null
  }
  def y(b: Array[Byte]): java.lang.Double = parse(b) match {
    case p: Point => p.getY
    case _        => null
  }

  /** Z ordinate of a point; null for non-points or XY(M)-only data. */
  def zCoord(b: Array[Byte]): java.lang.Double = parse(b) match {
    case p: Point =>
      val z = p.getCoordinate.getZ
      if (java.lang.Double.isNaN(z)) null else z
    case _ => null
  }

  /** M ordinate of a point; null for non-points or data without measures. */
  def mCoord(b: Array[Byte]): java.lang.Double = parse(b) match {
    case p: Point =>
      val m = p.getCoordinate.getM
      if (java.lang.Double.isNaN(m)) null else m
    case _ => null
  }

  def area(b: Array[Byte]): Double   = parse(b).getArea
  def length(b: Array[Byte]): Double = parse(b).getLength

  def distance(a: Array[Byte], b: Array[Byte]): Double = parse(a).distance(parse(b))
  def distanceSphere(a: Array[Byte], b: Array[Byte]): Double = Sphere.distance(parse(a), parse(b))
  def lengthSphere(b: Array[Byte]): Double = Sphere.length(parse(b))

  def centroid(b: Array[Byte]): Array[Byte] = out(parse(b).getCentroid)
  def envelope(b: Array[Byte]): Array[Byte] = out(parse(b).getEnvelope)
  def boundary(b: Array[Byte]): Array[Byte] = out(parse(b).getBoundary)

  def dimension(b: Array[Byte]): Int = parse(b).getDimension
  def coordDim(b: Array[Byte]): Int = {
    val g = parse(b)
    if (g.isEmpty) 2 else GeomIO.outputDimension(g)
  }
  def numPoints(b: Array[Byte]): Int = parse(b).getNumPoints
  def numGeometries(b: Array[Byte]): Int = parse(b).getNumGeometries

  /** 1-based, like PostGIS; null out of range or wrong type. */
  def pointN(b: Array[Byte], n: Int): Array[Byte] = parse(b) match {
    case l: LineString if n >= 1 && n <= l.getNumPoints => out(l.getPointN(n - 1))
    case _ => null
  }

  /** 1-based, like PostGIS; null out of range. */
  def geometryN(b: Array[Byte], n: Int): Array[Byte] = {
    val g = parse(b)
    if (n >= 1 && n <= g.getNumGeometries) out(g.getGeometryN(n - 1)) else null
  }

  def exteriorRing(b: Array[Byte]): Array[Byte] = parse(b) match {
    case p: Polygon => out(p.getExteriorRing)
    case _          => null
  }

  /** 1-based, like PostGIS; null out of range or wrong type. */
  def interiorRingN(b: Array[Byte], n: Int): Array[Byte] = parse(b) match {
    case p: Polygon if n >= 1 && n <= p.getNumInteriorRing => out(p.getInteriorRingN(n - 1))
    case _ => null
  }

  def isValid(b: Array[Byte]): Boolean  = parse(b).isValid
  def isSimple(b: Array[Byte]): Boolean = parse(b).isSimple
  def isEmptyGeom(b: Array[Byte]): Boolean = parse(b).isEmpty
  def isClosed(b: Array[Byte]): Boolean = parse(b) match {
    case l: LineString      => l.isClosed
    case m: MultiLineString => m.isClosed
    case _                  => true
  }
  def isRing(b: Array[Byte]): Boolean = parse(b) match {
    case l: LineString => l.isRing
    case _             => false
  }
  def isCollection(b: Array[Byte]): Boolean = parse(b).isInstanceOf[GeometryCollection]

  /** True when the value parses as a geometry (WKB bytes here; the WKT
    * variant is exposed for string columns).
    */
  def isGeomFieldText(s: UTF8String): Boolean =
    try { GeomIO.fromWKT(s.toString); true } catch { case _: Exception => false }

  def isGeomFieldBin(b: Array[Byte]): Boolean =
    try { GeomIO.fromWKB(b); true } catch { case _: Exception => false }

  // ------------------------------------------------------------ predicates

  def intersects(a: Array[Byte], b: Array[Byte]): Boolean = parse(a).intersects(parse(b))
  def contains(a: Array[Byte], b: Array[Byte]): Boolean   = parse(a).contains(parse(b))
  def within(a: Array[Byte], b: Array[Byte]): Boolean     = parse(a).within(parse(b))
  def covers(a: Array[Byte], b: Array[Byte]): Boolean     = parse(a).covers(parse(b))
  def crosses(a: Array[Byte], b: Array[Byte]): Boolean    = parse(a).crosses(parse(b))
  def disjoint(a: Array[Byte], b: Array[Byte]): Boolean   = parse(a).disjoint(parse(b))
  def equalsGeom(a: Array[Byte], b: Array[Byte]): Boolean = parse(a).equals(parse(b))
  def overlaps(a: Array[Byte], b: Array[Byte]): Boolean   = parse(a).overlaps(parse(b))
  def touches(a: Array[Byte], b: Array[Byte]): Boolean    = parse(a).touches(parse(b))

  def relate(a: Array[Byte], b: Array[Byte]): UTF8String =
    str(parse(a).relate(parse(b)).toString)
  def relateBool(a: Array[Byte], b: Array[Byte], pattern: UTF8String): Boolean =
    parse(a).relate(parse(b), pattern.toString)

  // ------------------------------------------------------------ processing

  def intersection(a: Array[Byte], b: Array[Byte]): Array[Byte] = out(parse(a).intersection(parse(b)))
  def difference(a: Array[Byte], b: Array[Byte]): Array[Byte]   = out(parse(a).difference(parse(b)))
  def convexHull(b: Array[Byte]): Array[Byte] = out(parse(b).convexHull())

  def simplify(b: Array[Byte], tol: Double): Array[Byte] =
    out(org.locationtech.jts.simplify.DouglasPeuckerSimplifier.simplify(parse(b), tol))
  def simplifyPreserveTopology(b: Array[Byte], tol: Double): Array[Byte] =
    out(org.locationtech.jts.simplify.TopologyPreservingSimplifier.simplify(parse(b), tol))

  def bufferPoint(b: Array[Byte], meters: Double): Array[Byte] = parse(b) match {
    case p: Point => out(Sphere.bufferPoint(p, meters))
    case other => throw new IllegalArgumentException(
      s"st_bufferPoint expects a Point, got ${other.getGeometryType}")
  }

  /** Point on geometry `a` closest to geometry `b`. */
  def closestPoint(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val pts = DistanceOp.nearestPoints(parse(a), parse(b))
    out(GeomIO.factory.createPoint(pts(0)))
  }

  def translate(b: Array[Byte], dx: Double, dy: Double): Array[Byte] =
    out(AffineTransformation.translationInstance(dx, dy).transform(parse(b)))

  /** Split a geometry whose coordinates run past ±180° into parts wrapped
    * into [-180, 180] (the reference's st_antimeridianSafeGeom /
    * st_idlSafeGeom behavior: geometries spanning the IDL come back as
    * multi-part geometries that query correctly on either side).
    */
  def antimeridianSafeGeom(b: Array[Byte]): Array[Byte] = {
    val g = parse(b)
    val env = g.getEnvelopeInternal
    if (env.getMinX >= -180.0 && env.getMaxX <= 180.0) return b
    val f = GeomIO.factory
    val world = GeomIO.bbox(-180, -90, 180, 90)
    val eastOut = GeomIO.bbox(180, -90, env.getMaxX + 1, 90)
    val westOut = GeomIO.bbox(env.getMinX - 1, -90, -180, 90)
    val inWorld = g.intersection(world)
    val shiftW = AffineTransformation.translationInstance(-360, 0).transform(g.intersection(eastOut))
    val shiftE = AffineTransformation.translationInstance(360, 0).transform(g.intersection(westOut))
    val parts = Seq(inWorld, shiftW, shiftE).filter(!_.isEmpty)
    val result =
      if (parts.isEmpty) f.createGeometryCollection()
      else parts.reduce(_.union(_))
    out(result)
  }

  // ----------------------------------------------------- extent & indexing

  def makeExtent(xmin: Double, ymin: Double, xmax: Double, ymax: Double): InternalRow =
    new GenericInternalRow(Array[Any](xmin, ymin, xmax, ymax))

  def extentFromGeom(b: Array[Byte]): InternalRow = {
    val env = parse(b).getEnvelopeInternal
    new GenericInternalRow(Array[Any](env.getMinX, env.getMinY, env.getMaxX, env.getMaxY))
  }

  def extentToGeom(r: InternalRow): Array[Byte] =
    out(GeomIO.bbox(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))

  def intersectsExtentExtent(a: InternalRow, b: InternalRow): Boolean =
    a.getDouble(0) <= b.getDouble(2) && a.getDouble(2) >= b.getDouble(0) &&
      a.getDouble(1) <= b.getDouble(3) && a.getDouble(3) >= b.getDouble(1)

  def intersectsExtentGeom(a: InternalRow, b: Array[Byte]): Boolean =
    GeomIO.bbox(a.getDouble(0), a.getDouble(1), a.getDouble(2), a.getDouble(3))
      .intersects(parse(b))

  def intersectsGeomExtent(a: Array[Byte], b: InternalRow): Boolean =
    intersectsExtentGeom(b, a)

  def containsExtentExtent(a: InternalRow, b: InternalRow): Boolean =
    a.getDouble(0) <= b.getDouble(0) && a.getDouble(2) >= b.getDouble(2) &&
      a.getDouble(1) <= b.getDouble(1) && a.getDouble(3) >= b.getDouble(3)

  def containsExtentGeom(a: InternalRow, b: Array[Byte]): Boolean =
    GeomIO.bbox(a.getDouble(0), a.getDouble(1), a.getDouble(2), a.getDouble(3))
      .contains(parse(b))

  def containsGeomExtent(a: Array[Byte], b: InternalRow): Boolean =
    parse(a).contains(GeomIO.bbox(b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3)))

  /** Z2 Morton keys of the envelope's (min, max) corners — the same
    * struct shape as the reference's Z2Index
    * (spatial-index/.../spark/geotrellis/Z2Index.scala:18).
    */
  def z2LatLon(b: Array[Byte]): InternalRow = {
    val (lo, hi) = Z2.indexRange(parse(b))
    new GenericInternalRow(Array[Any](lo, hi))
  }

  /** Morton cell key of the centroid at a grid `level` (bits/dimension). */
  def z2Cell(b: Array[Byte], level: Int): Long = {
    val c = parse(b).getCentroid
    Z2.cell(c.getX, c.getY, level)
  }

  /** All Z2 cell keys at `level` covering the geometry's envelope. */
  def z2CellCover(b: Array[Byte], level: Int): ArrayData = {
    val env = parse(b).getEnvelopeInternal
    new GenericArrayData(
      Z2.coverEnvelope(env.getMinX, env.getMinY, env.getMaxX, env.getMaxY, level))
  }

  /** Morton cell key of a raw lon/lat pair at `level` (join helper). */
  def z2CellXY(lon: Double, lat: Double, level: Int): Long = Z2.cell(lon, lat, level)

  /** Grid partition key of the centroid: slippy-map web-mercator tile
    * (x, y) at `zoom`, Morton-interleaved, shifted right by `bits`
    * (default 8) — same key semantics as the reference's
    * st_partitionCentroid
    * (spatial-index/.../spatial/index/ST_PartitionCentroid.scala:33),
    * re-derived from the public slippy tiling formulas instead of a
    * GeoTrellis layout (key values may differ; partitioning behavior —
    * deterministic, spatially-local buckets — is the same).
    */
  def partitionCentroid(b: Array[Byte], zoom: Int): Long =
    partitionCentroidBits(b, zoom, 8)

  def partitionCentroidBits(b: Array[Byte], zoom: Int, bits: Int): Long = {
    val c = parse(b).getCentroid
    val n = 1 << zoom
    val lat = math.max(-Projections.MaxLat, math.min(Projections.MaxLat, c.getY))
    val xt0 = ((c.getX + 180.0) / 360.0 * n).toInt
    val phi = math.toRadians(lat)
    val yt0 = ((1.0 - math.log(math.tan(phi) + 1.0 / math.cos(phi)) / math.Pi) / 2.0 * n).toInt
    val xt = math.max(0, math.min(n - 1, xt0))
    val yt = math.max(0, math.min(n - 1, yt0))
    Z2.index(xt, yt) >> bits
  }

  def crsFromText(s: UTF8String): UTF8String = str(Projections.normalize(s.toString))

  def geomReproject(b: Array[Byte], from: UTF8String, to: UTF8String): Array[Byte] =
    out(Projections.reproject(parse(b), from.toString, to.toString))

  // ----------------------------------------------- vector & signature math
  //
  // Native (codegen-called) twins of the pipeline hot paths. Spark's
  // higher-order functions are CodegenFallback — interpreted lambdas with
  // per-element boxing — which made the O(n²)/O(n·perm) pipeline stages
  // (pairwise cosine, minhash signatures, winnowing) the benchmark
  // bottleneck. These loops keep identical semantics (same fold order for
  // bitwise-stable doubles, same xxhash64 values as the built-in) at
  // primitive-loop speed.

  private val XxSeed = 42L // the builtin xxhash64's fixed seed

  private def xx(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes, XxSeed)
  private def xx(l: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(l, XxSeed)

  /** In-order dot product (left fold — matches aggregate/zip_with and the
    * DuckDB oracle's list_dot_product bit for bit).
    */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def vecNorm(a: ArrayData): Double = math.sqrt(vecDot(a, a))

  def vecCosine(a: ArrayData, b: ArrayData): Double =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  def vecL2(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    math.sqrt(acc)
  }

  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Long), Array[Long]]()
  private def saltsFor(numPerm: Int, seed: Long): Array[Long] =
    saltCache.computeIfAbsent((numPerm, seed), { case (n, s) =>
      val rnd = new scala.util.Random(s)
      Array.fill(n)(rnd.nextLong())
    })

  /** MinHash signature: sig(i) = min over shingles of
    * xxhash64(xxhash64(shingle) XOR salt_i) — same values the
    * higher-order-function formulation produces, one primitive loop.
    */
  def minhashSig(shingles: ArrayData, numPerm: Int, seed: Long): ArrayData = {
    val salts = saltsFor(numPerm, seed)
    val n = shingles.numElements()
    val sig = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val h = xx(shingles.getUTF8String(j))
      var i = 0
      while (i < numPerm) {
        val v = xx(h ^ salts(i))
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Unicode NFC normalization (java.text.Normalizer, the JDK's public
    * UAX #15 implementation): canonical composition, so visually
    * identical strings (precomposed é vs e + COMBINING ACUTE) produce
    * identical dedup keys and hashes. Run BEFORE exact/normalized dedup
    * — byte-level digests treat the two encodings as different
    * documents. DuckDB's `nfc_normalize` implements the same standard,
    * which is what makes the cross-engine oracle possible.
    */
  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** Unicode NFKC normalization (UAX #15 compatibility composition) —
    * the form tokenizer pipelines actually run before BPE: beyond
    * NFC's canonical composition it FOLDS compatibility variants
    * (fullwidth Ａ→A, ligatures ﬁ→fi, superscripts ²→2, №→No, circled
    * digits ①→1), so visually-equivalent crawl text produces one token
    * sequence. DuckDB has no nfkc_normalize, so the oracle pins
    * hand-derived mappings of planted compatibility characters instead
    * of delegating to a twin implementation (tx_nfkc).
    */
  def nfkcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFKC))

  /** Mojibake repair (the ftfy `fix_encoding` core): reverses the
    * classic crawl corruption where UTF-8 bytes were misdecoded as
    * cp1252/latin-1 — "Ã©" → "é", "â€™" → "'", and the double-encoded
    * "ÃƒÂ©" → "é" (iterated to a fixpoint, ≤ 3 passes). The repair is
    * attempted PER WHITESPACE-DELIMITED TOKEN (ASCII separators ≤ 0x20
    * cannot occur inside a UTF-8 multi-byte sequence), so a document
    * that mixes singly- and doubly-corrupted fragments heals fragment
    * by fragment — a whole-string pass would deadlock on the mixture,
    * because the already-repaired half no longer survives a strict
    * re-decode. A token is rewritten ONLY when the full reversal
    * succeeds: every char re-encodes to one cp1252 byte (latin-1
    * passthrough for the five bytes cp1252 leaves undefined) AND the
    * byte string strict-decodes as valid UTF-8 (overlongs, lone leads,
    * bare continuations, surrogates and > U+10FFFF all reject). Plain
    * ASCII, genuine non-Latin text (unmappable chars) and lone
    * cp1252-range chars ("Ã" by itself is not valid UTF-8) pass
    * through untouched; like ftfy, a text that was MEANT to spell a
    * valid-UTF-8 byte sequence such as "Ã©" is indistinguishable from
    * corruption and repairs — the accepted false-positive class.
    */
  def fixMojibake(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: nothing above ASCII, nothing to repair
    var hasHigh = false
    var i = 0
    while (i < str.length && !hasHigh) {
      if (str.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return s
    val out = new java.lang.StringBuilder(str.length)
    i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c <= ' ') { out.append(c); i += 1 }
      else {
        var j = i
        while (j < str.length && str.charAt(j) > ' ') j += 1
        out.append(fixToken(str.substring(i, j)))
        i = j
      }
    }
    val fixed = out.toString
    if (fixed == str) s else UTF8String.fromString(fixed)
  }

  private def fixToken(tok: String): String = {
    var cur = tok
    var pass = 0
    while (pass < 3) {
      val dec = mojibakeReverse(cur)
      if (dec == null || dec == cur) return cur
      cur = dec
      pass += 1
    }
    cur
  }

  /** One reversal pass: cp1252-encode (null if any char unmappable or
    * the token is pure ASCII) then strict UTF-8 decode (null if
    * invalid). */
  private def mojibakeReverse(tok: String): String = {
    val n = tok.length
    val bytes = new Array[Byte](n)
    var high = false
    var i = 0
    while (i < n) {
      val b = cp1252Byte(tok.charAt(i))
      if (b < 0) return null
      if (b >= 0x80) high = true
      bytes(i) = b.toByte
      i += 1
    }
    if (!high) return null
    strictUtf8(bytes)
  }

  /** char → cp1252 byte, latin-1 passthrough for 0x81/8D/8F/90/9D
    * (cp1252-undefined, decoded by lenient decoders as C1 controls);
    * -1 = unmappable. */
  private def cp1252Byte(c: Char): Int =
    if (c <= 0xFF) c.toInt
    else c match {
      case '€' => 0x80; case '‚' => 0x82; case 'ƒ' => 0x83
      case '„' => 0x84; case '…' => 0x85; case '†' => 0x86
      case '‡' => 0x87; case 'ˆ' => 0x88; case '‰' => 0x89
      case 'Š' => 0x8A; case '‹' => 0x8B; case 'Œ' => 0x8C
      case 'Ž' => 0x8E; case '‘' => 0x91; case '’' => 0x92
      case '“' => 0x93; case '”' => 0x94; case '•' => 0x95
      case '–' => 0x96; case '—' => 0x97; case '˜' => 0x98
      case '™' => 0x99; case 'š' => 0x9A; case '›' => 0x9B
      case 'œ' => 0x9C; case 'ž' => 0x9E; case 'Ÿ' => 0x9F
      case _ => -1
    }

  /** Strict UTF-8 decode: null on ANY malformation — lone lead, bare
    * continuation, truncation, overlong encoding, surrogate code
    * point, or > U+10FFFF. Strictness is the false-positive guard:
    * only byte strings a real UTF-8 encoder could have produced are
    * accepted as evidence of misdecoding. */
  private def strictUtf8(b: Array[Byte]): String = {
    val n = b.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b0 = b(i) & 0xFF
      if (b0 < 0x80) { sb.append(b0.toChar); i += 1 }
      else if (b0 < 0xC2) return null // bare continuation or overlong lead C0/C1
      else if (b0 < 0xE0) { // 2-byte
        if (i + 1 >= n) return null
        val b1 = b(i + 1) & 0xFF
        if (b1 < 0x80 || b1 > 0xBF) return null
        sb.append((((b0 & 0x1F) << 6) | (b1 & 0x3F)).toChar)
        i += 2
      } else if (b0 < 0xF0) { // 3-byte
        if (i + 2 >= n) return null
        val b1 = b(i + 1) & 0xFF; val b2 = b(i + 2) & 0xFF
        if (b1 < 0x80 || b1 > 0xBF || b2 < 0x80 || b2 > 0xBF) return null
        val cp = ((b0 & 0x0F) << 12) | ((b1 & 0x3F) << 6) | (b2 & 0x3F)
        if (cp < 0x800) return null // overlong
        if (cp >= 0xD800 && cp <= 0xDFFF) return null // surrogate
        sb.append(cp.toChar)
        i += 3
      } else if (b0 < 0xF5) { // 4-byte
        if (i + 3 >= n) return null
        val b1 = b(i + 1) & 0xFF; val b2 = b(i + 2) & 0xFF; val b3 = b(i + 3) & 0xFF
        if (b1 < 0x80 || b1 > 0xBF || b2 < 0x80 || b2 > 0xBF ||
            b3 < 0x80 || b3 > 0xBF) return null
        val cp = ((b0 & 0x07) << 18) | ((b1 & 0x3F) << 12) |
          ((b2 & 0x3F) << 6) | (b3 & 0x3F)
        if (cp < 0x10000 || cp > 0x10FFFF) return null // overlong / out of range
        sb.appendCodePoint(cp)
        i += 4
      } else return null // F5-FF: out of Unicode range
    }
    sb.toString
  }

  /** Readability counters in ONE byte pass — the inputs of the
    * Flesch/Flesch-Kincaid battery, each with a deterministic,
    * externally-replayable definition (no dictionary, no silent-e
    * heuristics): returns [words, no_vowel_words, vowel_runs,
    * sentence_enders] where words = runs of non-whitespace bytes
    * (whitespace = space/tab/LF/CR), vowel_runs = maximal runs of
    * ASCII [aeiouyAEIOUY] (the standard syllable proxy; a run cannot
    * span whitespace, so the text-level count equals the sum of
    * per-word counts), no_vowel_words = words containing no vowel byte
    * (their syllable floor of 1 is added back by the caller:
    * syllables = vowel_runs + no_vowel_words), and sentence_enders =
    * occurrences of `.` `!` `?`. Bytes ≥ 0x80 (UTF-8 continuations and
    * leads) are word bytes and never vowels — non-ASCII words take the
    * one-syllable floor, keeping the definition total and replayable.
    */
  def readabilityCounts(t: UTF8String): ArrayData = {
    val n = t.numBytes
    var i = 0
    var words = 0L; var noVowel = 0L; var runs = 0L; var enders = 0L
    var inWord = false; var inVowel = false; var wordHasVowel = false
    while (i < n) {
      val b = t.getByte(i)
      val ws = b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte || b == '\r'.toByte
      if (ws) {
        if (inWord && !wordHasVowel) noVowel += 1
        inWord = false; inVowel = false; wordHasVowel = false
      } else {
        if (!inWord) { words += 1; inWord = true }
        val lo = (b | 0x20).toByte // ASCII lowercase fold; bytes >= 0x80 unaffected for the vowel test below
        val vowel = lo == 'a'.toByte || lo == 'e'.toByte || lo == 'i'.toByte ||
          lo == 'o'.toByte || lo == 'u'.toByte || lo == 'y'.toByte
        if (vowel) {
          if (!inVowel) { runs += 1; inVowel = true }
          wordHasVowel = true
        } else inVowel = false
        if (b == '.'.toByte || b == '!'.toByte || b == '?'.toByte) enders += 1
      }
      i += 1
    }
    if (inWord && !wordHasVowel) noVowel += 1
    new GenericArrayData(Array(words, noVowel, runs, enders))
  }

  /** Count of [A-Za-z0-9 ] characters — the codegen'd one-byte-pass twin
    * of `length(regexp_replace(t, "[^A-Za-z0-9 ]", ""))`: the class is
    * pure ASCII so every matching character is exactly one UTF-8 byte,
    * and non-matching multi-byte characters contribute no matching
    * bytes — the byte count IS the character count, with no regex
    * engine and no 2 KB replacement-string allocation per row. The
    * quality-score hot path over 100 TB of text is this loop.
    */
  def alnumSpaceCount(t: UTF8String): Int = {
    val n = t.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      val b = t.getByte(i)
      if ((b >= '0'.toByte && b <= '9'.toByte) ||
          (b >= 'A'.toByte && b <= 'Z'.toByte) ||
          (b >= 'a'.toByte && b <= 'z'.toByte) || b == ' '.toByte) c += 1
      i += 1
    }
    c
  }

  /** `size(split(t, " "))` without materializing the array: Spark's
    * split with the default -1 limit keeps trailing empties, so the
    * size is exactly (number of single-space separators) + 1 — a byte
    * scan (the space byte cannot occur inside a UTF-8 multi-byte
    * sequence).
    */
  def spaceTokenCount(t: UTF8String): Int = {
    val n = t.numBytes
    var i = 0
    var c = 1
    while (i < n) {
      if (t.getByte(i) == ' '.toByte) c += 1
      i += 1
    }
    c
  }

  /** `length(regexp_replace(t, "[^A-Za-z]", ""))` as one byte scan —
    * ASCII letters are single bytes and UTF-8 continuation/lead bytes
    * never fall in the letter ranges (the [[alnumSpaceCount]]
    * argument), so the byte count IS the regex's character count.
    */
  def letterCount(t: UTF8String): Int = {
    val n = t.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      val b = t.getByte(i)
      if ((b >= 'A'.toByte && b <= 'Z'.toByte) ||
          (b >= 'a'.toByte && b <= 'z'.toByte)) c += 1
      i += 1
    }
    c
  }

  /** `length(regexp_replace(t, "[^A-Z]", ""))` as one byte scan. */
  def upperCount(t: UTF8String): Int = {
    val n = t.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      val b = t.getByte(i)
      if (b >= 'A'.toByte && b <= 'Z'.toByte) c += 1
      i += 1
    }
    c
  }

  /** `size(split(trim(t), " +"))` as one byte scan: after trimming
    * spaces the token count is the number of non-space RUNS, except
    * the empty/all-space string where Spark's split returns [""] —
    * count 1. (trim removes only the space character, matching
    * Spark's trim; the space byte cannot occur inside a UTF-8
    * multi-byte sequence.)
    */
  def runTokenCount(t: UTF8String): Int = {
    val n = t.numBytes
    var i = 0
    var runs = 0
    var inRun = false
    while (i < n) {
      val sp = t.getByte(i) == ' '.toByte
      if (!sp && !inRun) { runs += 1; inRun = true }
      else if (sp) inRun = false
      i += 1
    }
    if (runs == 0) 1 else runs
  }

  /** `size(filter(split(trim(t), " +"), w -> w RLIKE '[A-Za-z0-9]'))`
    * as one byte scan — non-space runs carrying at least one ASCII
    * alphanumeric byte. The WORD count boilerplate rules want:
    * separator tokens (`|`, `-`, `»`) must not inflate a nav crumb
    * into a "sentence". Returns 0 for empty/all-space/all-separator
    * input (unlike [[runTokenCount]] there is no [""]-token quirk:
    * the filtered empty token carries no alnum byte).
    */
  def alnumTokenCount(t: UTF8String): Int = {
    val n = t.numBytes
    var i = 0
    var runs = 0
    var inRun = false
    var runHasAlnum = false
    while (i < n) {
      val b = t.getByte(i)
      val sp = b == ' '.toByte
      if (!sp) {
        if (!inRun) { inRun = true; runHasAlnum = false }
        if ((b >= '0'.toByte && b <= '9'.toByte) ||
            (b >= 'A'.toByte && b <= 'Z'.toByte) ||
            (b >= 'a'.toByte && b <= 'z'.toByte)) {
          if (!runHasAlnum) { runs += 1; runHasAlnum = true }
        }
      } else inRun = false
      i += 1
    }
    runs
  }

  /** 64-bit signatures of every ≤k-character-deletion variant of `t` —
    * the SymSpell/symmetric-delete neighborhood (public technique): if
    * ed(a,b) ≤ k then deleting the edited positions yields a COMMON
    * variant, so two strings within distance k always share a
    * signature. Variants are never materialized: a polynomial rolling
    * hash over the char sequence with precomputed prefix hashes and
    * base powers gives each spliced variant's signature in O(1) after
    * O(n) prep — O(n²) per string for k=2, no allocation beyond the
    * tables. Signature collisions only ADD candidates (the exact
    * verify removes them); equal variants always collide, so the
    * no-false-negative guarantee survives hashing. Char-level (UTF-16
    * units), matching `levenshtein`'s unit for BMP text.
    */
  def deleteVariantHashes(t: UTF8String, k: Int): ArrayData = {
    val s = t.toString
    val n = s.length
    // the neighborhood is O(n²) signatures per row: a raw document
    // would emit millions of longs (and n²/2 overflows Int past 64k
    // chars). The operator contract is BOUNDED keys — fail loudly with
    // the remedy instead of OOMing the executor.
    require(n <= 1024,
      s"delete_variant_hashes: key length $n exceeds 1024 chars — " +
        "edit-distance joins run on bounded keys (titles, normalized " +
        "prefixes); substring/normalize the column first")
    val B = 1000003L
    // p(i) = hash of prefix s[0,i); pow(i) = B^i (mod 2^64)
    val p = new Array[Long](n + 1)
    val pw = new Array[Long](n + 1)
    pw(0) = 1L
    var i = 0
    while (i < n) {
      p(i + 1) = p(i) * B + s.charAt(i).toLong + 1L
      pw(i + 1) = pw(i) * B
      i += 1
    }
    def seg(a: Int, b: Int): Long = p(b) - p(a) * pw(b - a) // hash of s[a,b)
    val nOut = 1 + (if (k >= 1) n else 0) + (if (k >= 2) n * (n - 1) / 2 else 0)
    val out = new Array[Long](nOut)
    var o = 0
    out(o) = p(n); o += 1
    if (k >= 1) {
      i = 0
      while (i < n) { // delete position i
        out(o) = seg(0, i) * pw(n - i - 1) + seg(i + 1, n); o += 1
        i += 1
      }
    }
    if (k >= 2) {
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { // delete positions i < j
          val mid = seg(i + 1, j)
          val len2 = (j - i - 1) + (n - j - 1)
          out(o) = seg(0, i) * pw(len2) + mid * pw(n - j - 1) + seg(j + 1, n)
          o += 1
          j += 1
        }
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** Occurrences of the ASCII byte `b` (0..127) in `t`'s UTF-8 bytes —
    * the allocation-free twin of `length(t) - length(replace(t, chr(b),
    * ''))` for ASCII targets (UTF-8 continuation/lead bytes are ≥ 0x80,
    * so they can never collide with an ASCII value): one byte pass, no
    * copy of the document.
    */
  def byteOccurrences(t: UTF8String, b: Int): Int = {
    val target = b.toByte
    val n = t.numBytes
    var i = 0
    var c = 0
    while (i < n) {
      if (t.getByte(i) == target) c += 1
      i += 1
    }
    c
  }

  /** Shannon entropy (bits/byte) of the byte distribution — the
    * low-entropy/repetitive-document curation signal, one 256-bucket
    * histogram pass, no allocation beyond the histogram. Terms are
    * summed in ASCENDING byte order and converted to bits by a single
    * final /ln(2), so an external engine replays the identical IEEE
    * sequence by summing its per-character terms in character order (on
    * ASCII text, bytes ≡ characters; the spec pins non-ASCII behavior
    * natively). Empty input → 0.0.
    */
  def byteEntropy(t: UTF8String): Double = {
    val n = t.numBytes
    if (n == 0) return 0.0
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(t.getByte(i) & 0xff) += 1; i += 1 }
    var sum = 0.0
    var b = 0
    while (b < 256) {
      val c = hist(b)
      if (c > 0) {
        val p = c.toDouble / n
        sum += -(p * math.log(p))
      }
      b += 1
    }
    sum / math.log(2.0)
  }

  /** Number of distinct bytes (alphabet size — tiny for degenerate
    * machine-generated text).
    */
  def distinctByteCount(t: UTF8String): Int = {
    val n = t.numBytes
    val hist = new Array[Boolean](256)
    var i = 0
    while (i < n) { hist(t.getByte(i) & 0xff) = true; i += 1 }
    var c = 0
    var b = 0
    while (b < 256) { if (hist(b)) c += 1; b += 1 }
    c
  }

  /** Count of the most frequent byte (top-char dominance — near n for
    * padding/filler documents).
    */
  def topByteCount(t: UTF8String): Int = {
    val n = t.numBytes
    val hist = new Array[Int](256)
    var i = 0
    while (i < n) { hist(t.getByte(i) & 0xff) += 1; i += 1 }
    var m = 0
    var b = 0
    while (b < 256) { if (hist(b) > m) m = hist(b); b += 1 }
    m
  }

  /** 64-bit SimHash: per-bit ±1 votes from each token's xxhash64, packed
    * MSB-first (bit 0's vote ends in the top bit — same packing as the
    * (packed << 1) | vote fold).
    */
  def simhashNative(tokens: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      val h = xx(tokens.getUTF8String(j))
      var b = 0
      while (b < 64) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      j += 1
    }
    var packed = 0L
    var b = 0
    while (b < 64) { packed = (packed << 1) | (if (votes(b) > 0) 1L else 0L); b += 1 }
    packed
  }

  /** Distinct word k-shingles, first-seen order (native twin of the
    * transform/slice/concat_ws formulation).
    */
  def wordShingles(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (k <= 1) {
      var i = 0
      while (i < n) { seen.add(words.getUTF8String(i)); i += 1 }
    } else {
      val nShingles = math.max(n - k, 0) + 1
      var i = 0
      while (i < nShingles) {
        val end = math.min(i + k, n)
        var len = 0
        var j = i
        while (j < end) { len += words.getUTF8String(j).numBytes + 1; j += 1 }
        val sb = new java.lang.StringBuilder(len)
        j = i
        while (j < end) {
          if (j > i) sb.append(' ')
          sb.append(words.getUTF8String(j).toString)
          j += 1
        }
        seen.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Winnowing fingerprints: sliding-window minima of shingle hashes,
    * distinct in first-seen order.
    */
  def winnowFingerprints(shingles: ArrayData, window: Int): ArrayData = {
    val n = shingles.numElements()
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) { hashes(i) = xx(shingles.getUTF8String(i)); i += 1 }
    val nWin = math.max(n - window, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var m = Long.MaxValue
      var k = j
      val end = math.min(j + window, n)
      while (k < end) { if (hashes(k) < m) m = hashes(k); k += 1 }
      if (n > 0) seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH bucket: bit i = sign of Σ_d ±v(d), with the
    * Rademacher sign from xxhash64(i*dim + d + seed) — identical values
    * to the higher-order-function formulation.
    */
  def lshBucketNative(v: ArrayData, nBits: Int, seed: Long): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var d = 0
      while (d < dim) {
        val x = v.getDouble(d)
        acc += (if ((xx(i.toLong * dim + d + seed) & 1L) == 1L) x else -x)
        d += 1
      }
      bucket = bucket * 2 + (if (acc > 0.0) 1L else 0L)
      i += 1
    }
    bucket
  }

  /** Cosine-nearest centroid indices for v, best-first. `centroids` is a
    * small broadcast/literal array<array<double>>; nc is tiny so repeated
    * linear selection beats building a heap.
    */
  private def ivfNearest(v: ArrayData, centroids: ArrayData, nprobe: Int): Array[Int] = {
    val dim = v.numElements()
    val nc = centroids.numElements()
    val sims = new Array[Double](nc)
    var c = 0
    while (c < nc) {
      val cent = centroids.getArray(c)
      val cd = math.min(dim, cent.numElements())
      var dot = 0.0; var nv = 0.0; var ncn = 0.0
      var d = 0
      while (d < cd) {
        val x = v.getDouble(d); val y = cent.getDouble(d)
        dot += x * y; nv += x * x; ncn += y * y
        d += 1
      }
      sims(c) = if (nv == 0.0 || ncn == 0.0) -2.0 else dot / math.sqrt(nv * ncn)
      c += 1
    }
    val n = math.max(math.min(nprobe, nc), 0)
    val out = new Array[Int](n)
    val used = new Array[Boolean](nc)
    var i = 0
    while (i < n) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var c2 = 0
      while (c2 < nc) {
        if (!used(c2) && sims(c2) > bestSim) { best = c2; bestSim = sims(c2) }
        c2 += 1
      }
      used(best) = true; out(i) = best
      i += 1
    }
    out
  }

  /** Membership count: how many of `words` appear in the (tiny, literal)
    * `stops` list. Native twin of filter+array_contains.
    */
  def stopwordCountNative(words: ArrayData, stops: ArrayData): Int = {
    val nw = words.numElements()
    val ns = stops.numElements()
    var count = 0
    var i = 0
    while (i < nw) {
      val w = words.getUTF8String(i)
      var s = 0
      var found = false
      while (s < ns && !found) {
        if (stops.getUTF8String(s) == w) found = true
        s += 1
      }
      if (found) count += 1
      i += 1
    }
    count
  }

  /** Asymmetric-distance computation for product quantization: the
    * approximate dot product of query `qv` with a PQ-coded vector is the
    * sum over subspaces of qv_subspace · centroid(code). `flat` is the
    * codebook flattened as [m][ksub][subdim]; one multiply-add per query
    * dimension, no decode of the corpus vector.
    */
  def pqAdc(qv: ArrayData, codes: ArrayData, flat: ArrayData, m: Int): Double = {
    val dim = qv.numElements()
    val subdim = dim / m
    val ksub = flat.numElements() / (m * subdim)
    var sum = 0.0
    var j = 0
    while (j < m) {
      val base = (j * ksub + codes.getInt(j)) * subdim
      var d = 0
      while (d < subdim) {
        sum += qv.getDouble(j * subdim + d) * flat.getDouble(base + d)
        d += 1
      }
      j += 1
    }
    sum
  }

  /** Single-pass repetition statistics for Gopher-style quality
    * filtering (Rae et al. 2021, "Scaling Language Models: Methods,
    * Analysis & Insights from Training Gopher", appendix A — public):
    * returns [top word count, distinct words, total words, word-gram
    * positions whose n-gram occurs more than once, total n-grams]. One
    * hash-count pass over the words and one over the n-grams, per row at
    * the scan — no explode, no per-document shuffle.
    */
  def repetitionStats(words: ArrayData, n: Int): ArrayData = {
    val nw = words.numElements()
    val wc = new java.util.HashMap[UTF8String, Integer]()
    var i = 0
    while (i < nw) {
      val w = words.getUTF8String(i)
      val prev = wc.get(w)
      wc.put(w, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var top = 0
    val vit = wc.values().iterator()
    while (vit.hasNext) { val c = vit.next(); if (c > top) top = c }
    val ng = math.max(nw - n + 1, 0)
    val gramAt = new Array[String](ng)
    val gc = new java.util.HashMap[String, Integer]()
    i = 0
    while (i < ng) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words.getUTF8String(i + k))
        k += 1
      }
      val g = sb.toString
      gramAt(i) = g
      val prev = gc.get(g)
      gc.put(g, if (prev == null) 1 else prev + 1)
      i += 1
    }
    var dup = 0L
    i = 0
    while (i < ng) { if (gc.get(gramAt(i)) > 1) dup += 1; i += 1 }
    new GenericArrayData(Array[Long](top.toLong, wc.size().toLong, nw.toLong, dup, ng.toLong))
  }

  /** Argmax language by stopword hits: one pass over `words`, counting
    * membership in each profile (profiles are tiny literals — linear
    * probing beats per-row set building). First max wins; zero hits →
    * "und". Native twin of the filter/array_contains/when formulation.
    */
  def langIdNative(words: ArrayData, langs: ArrayData, profiles: ArrayData): UTF8String = {
    val nl = langs.numElements()
    val counts = new Array[Int](nl)
    val nw = words.numElements()
    var i = 0
    while (i < nw) {
      val w = words.getUTF8String(i)
      var l = 0
      while (l < nl) {
        val prof = profiles.getArray(l)
        val np = prof.numElements()
        var p = 0
        var found = false
        while (p < np && !found) {
          if (prof.getUTF8String(p) == w) found = true
          p += 1
        }
        if (found) counts(l) += 1
        l += 1
      }
      i += 1
    }
    var best = -1; var bestC = 0
    var l = 0
    while (l < nl) {
      if (counts(l) > bestC) { best = l; bestC = counts(l) }
      l += 1
    }
    if (best < 0) UTF8String.fromString("und") else langs.getUTF8String(best)
  }

  /** All word n-gram hashes of a token array in ONE O(len) pass — the
    * rolling twin of `transform(sequence(0, len−n), i →
    * xxhash64(slice(ws, i+1, n)))`, which does O(n) slice+hash work
    * PER POSITION (O(len·n) per doc — at the Lee-et-al. n = 50 that is
    * 50× the hash work the content requires). Per-word FNV-1a hashes
    * are avalanched through the splitmix64 finalizer (so algebraic
    * relations between similar tokens' FNV values don't survive into
    * the combiner), then combine under a degree-(n−1) polynomial in
    * the FNV prime over Z/2⁶⁴ (the base is odd so multiplication is
    * invertible — sliding subtracts the outgoing word's term exactly);
    * each emitted gram hash gets a second finalizer pass for output
    * dispersion. Hashing whole tokens first makes concatenation
    * unambiguous ("ab c" vs "a bc" cannot collide structurally).
    *
    * Collision contract, honestly stated: this is a ROLLING-hash
    * trade, not the iid-2⁻⁶⁴ contract of xxhash64 over the joined
    * slice — a fixed-base polynomial mod 2⁶⁴ has structured collision
    * classes (word sequences whose mixed-hash polynomial difference
    * vanishes), and the output finalizer disperses bits without
    * removing state collisions. The mixed per-word inputs make such
    * classes data-blind (constructing one requires solving for the
    * finalizer preimages), random collisions stay ~2⁻⁶⁴, and the
    * blast radius of any collision is bounded: it can only over-merge
    * two grams' doc sets — one spurious ≥ n span excised — never
    * corrupt unrelated rows; the string-keyed oracles re-derive every
    * span from gram STRINGS and stay hash-green at every verify sf.
    * Callers needing the full iid contract at O(len·n) cost keep the
    * xxhash64(slice) spelling. Empty output for docs shorter than n.
    */
  def wordGramHashes(words: ArrayData, n: Int): ArrayData = {
    val len = words.numElements()
    if (n <= 0 || len < n) return new GenericArrayData(Array.empty[Long])
    val B = 0x100000001b3L
    val wh = new Array[Long](len)
    var i = 0
    while (i < len) {
      val w = words.getUTF8String(i)
      wh(i) = if (w == null) 0x9e3779b97f4a7c15L else mix64(fnv64(w))
      i += 1
    }
    var bn = 1L
    var k = 0
    while (k < n - 1) { bn *= B; k += 1 } // B^(n−1), wrapping
    val out = new Array[Long](len - n + 1)
    var h = 0L
    i = 0
    while (i < n) { h = h * B + wh(i); i += 1 }
    out(0) = mix64(h)
    i = 1
    while (i <= len - n) {
      h = (h - wh(i - 1) * bn) * B + wh(i + n - 1)
      out(i) = mix64(h)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** splitmix64's finalizer (Steele et al., public domain) — full
    * avalanche in three multiply/xor-shift rounds.
    */
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def fnv64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val nb = s.numBytes
    var i = 0
    while (i < nb) { h ^= (s.getByte(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Unicode script classes for the language-ID router, in the
    * histogram's index order. Each class is a list of inclusive
    * codepoint ranges — the SINGLE constant [[scriptCounts]] classifies
    * by and the tx_langid oracle generator spells as `[\x{..}-\x{..}]`
    * RE2 classes, so the two sides cannot drift (the langTokenClass
    * discipline applied to scripts). Coverage is the block cores that
    * carry running text; rare historic extensions fall to "other"
    * identically on both sides.
    */
  val scriptRanges: Seq[(String, Seq[(Int, Int)])] = Seq(
    "latin" -> Seq((0x41, 0x5A), (0x61, 0x7A), (0xC0, 0xD6), (0xD8, 0xF6),
      (0xF8, 0x24F)),
    "cyrillic" -> Seq((0x400, 0x4FF)),
    "greek" -> Seq((0x370, 0x3FF), (0x1F00, 0x1FFF)),
    "arabic" -> Seq((0x600, 0x6FF), (0x750, 0x77F)),
    "devanagari" -> Seq((0x900, 0x97F)),
    "han" -> Seq((0x4E00, 0x9FFF), (0x3400, 0x4DBF)),
    "hiragana" -> Seq((0x3040, 0x309F)),
    "katakana" -> Seq((0x30A0, 0x30FF)),
    "hangul" -> Seq((0xAC00, 0xD7A3), (0x1100, 0x11FF), (0x3130, 0x318F)),
    // r14b breadth: script ≈ language families (the Greek treatment) —
    // appended so the 0–8 indices above stay stable
    "thai" -> Seq((0x0E00, 0x0E7F)),
    "hebrew" -> Seq((0x0590, 0x05FF)),
    "bengali" -> Seq((0x0980, 0x09FF)),
    "tamil" -> Seq((0x0B80, 0x0BFF)))

  private val scriptRangeArr: Array[Array[Int]] =
    scriptRanges.map(_._2.flatMap(r => Seq(r._1, r._2)).toArray).toArray

  /** Per-script letter counts (scriptRanges order), one codepoint pass —
    * the router that takes [[langIdNative]] past Latin: the dominant
    * script picks the profile family (or the script-level label for
    * CJK/Greek), stopwords decide within it.
    */
  def scriptCounts(t: UTF8String): ArrayData = {
    val s = t.toString
    val counts = new Array[Long](scriptRangeArr.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      var k = 0
      var hit = false
      while (k < scriptRangeArr.length && !hit) {
        val rs = scriptRangeArr(k)
        var j = 0
        while (j < rs.length && !hit) {
          if (cp >= rs(j) && cp <= rs(j + 1)) { counts(k) += 1; hit = true }
          j += 2
        }
        k += 1
      }
    }
    new GenericArrayData(counts)
  }

  /** IVF list assignment: index of the cosine-nearest centroid;
    * -1 when the centroid set is empty (empty corpus) so callers get an
    * empty join instead of a crash.
    */
  def ivfAssign(v: ArrayData, centroids: ArrayData): Int = {
    val nearest = ivfNearest(v, centroids, 1)
    if (nearest.isEmpty) -1 else nearest(0)
  }

  /** The `nprobe` nearest centroid indices, best-first (query-side probe set). */
  def ivfProbes(v: ArrayData, centroids: ArrayData, nprobe: Int): ArrayData =
    new GenericArrayData(ivfNearest(v, centroids, nprobe))
}
