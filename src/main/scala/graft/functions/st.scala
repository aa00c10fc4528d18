package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions.lit

/** Typed DataFrame DSL over the graft function catalog — the
  * Spark-native face of the reference's SQL-registered UDF surface. Every
  * function here is also callable from SQL by the same name (registered
  * through [[FunctionRegistration]]).
  */
object st {

  private def fn(name: String, cols: Column*): Column = FunctionDefs.call(name, cols: _*)

  // ---- constructors
  def makePoint(x: Column, y: Column): Column = fn("st_makePoint", x, y)
  def point(x: Column, y: Column): Column = makePoint(x, y)
  def makePointM(x: Column, y: Column, m: Column): Column = fn("st_makePointM", x, y, m)
  def makeLine(points: Column): Column = fn("st_makeLine", points)
  def makePolygon(shell: Column): Column = fn("st_makePolygon", shell)
  def makeBBOX(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    fn("st_makeBBOX", xmin, ymin, xmax, ymax)
  def makeBBOX(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Column =
    makeBBOX(lit(xmin), lit(ymin), lit(xmax), lit(ymax))
  def makeBox2D(ll: Column, ur: Column): Column = fn("st_makeBox2D", ll, ur)

  // ---- parse
  def geomFromWKT(wkt: Column): Column = fn("st_geomFromWKT", wkt)
  def pointFromText(wkt: Column): Column = fn("st_pointFromText", wkt)
  def lineFromText(wkt: Column): Column = fn("st_lineFromText", wkt)
  def polygonFromText(wkt: Column): Column = fn("st_polygonFromText", wkt)
  def mPointFromText(wkt: Column): Column = fn("st_mPointFromText", wkt)
  def mLineFromText(wkt: Column): Column = fn("st_mLineFromText", wkt)
  def mPolyFromText(wkt: Column): Column = fn("st_mPolyFromText", wkt)
  def geomFromWKB(wkb: Column): Column = fn("st_geomFromWKB", wkb)
  def pointFromWKB(wkb: Column): Column = fn("st_pointFromWKB", wkb)
  def geomFromGeoJson(json: Column): Column = fn("st_geomFromGeoJson", json)
  def geomFromGeoHash(hash: Column): Column = fn("st_geomFromGeoHash", hash)
  def geomFromGeoHash(hash: Column, precBits: Column): Column = fn("st_geomFromGeoHash", hash, precBits)
  def pointFromGeoHash(hash: Column): Column = fn("st_pointFromGeoHash", hash)
  def pointFromGeoHash(hash: Column, precBits: Column): Column = fn("st_pointFromGeoHash", hash, precBits)
  def geomFromTWKB(twkb: Column): Column = fn("st_geomFromTWKB", twkb)
  def castToPoint(g: Column): Column = fn("st_castToPoint", g)
  def castToLineString(g: Column): Column = fn("st_castToLineString", g)
  def castToPolygon(g: Column): Column = fn("st_castToPolygon", g)
  def castToGeometry(g: Column): Column = fn("st_castToGeometry", g)
  def byteArray(s: Column): Column = fn("st_byteArray", s)

  // ---- output
  def asText(g: Column): Column = fn("st_asText", g)
  def asBinary(g: Column): Column = fn("st_asBinary", g)
  def asTWKB(g: Column): Column = fn("st_asTWKB", g)
  def asTWKB(g: Column, prec: Column): Column = fn("st_asTWKB", g, prec)
  def deflate(b: Column): Column = fn("st_deflate", b)
  def inflate(b: Column): Column = fn("st_inflate", b)
  def asGeoJson(g: Column): Column = fn("st_asGeoJson", g)
  def geoHash(g: Column, precBits: Column): Column = fn("st_geoHash", g, precBits)
  def asLatLonText(g: Column): Column = fn("st_asLatLonText", g)

  // ---- accessors & measures
  def x(g: Column): Column = fn("st_x", g)
  def y(g: Column): Column = fn("st_y", g)
  def z(g: Column): Column = fn("st_z", g)
  def m(g: Column): Column = fn("st_m", g)
  def area(g: Column): Column = fn("st_area", g)
  def length(g: Column): Column = fn("st_length", g)
  def distance(a: Column, b: Column): Column = fn("st_distance", a, b)
  def distanceSphere(a: Column, b: Column): Column = fn("st_distanceSphere", a, b)
  def lengthSphere(g: Column): Column = fn("st_lengthSphere", g)
  def centroid(g: Column): Column = fn("st_centroid", g)
  def envelope(g: Column): Column = fn("st_envelope", g)
  def boundary(g: Column): Column = fn("st_boundary", g)
  def dimension(g: Column): Column = fn("st_dimension", g)
  def coordDim(g: Column): Column = fn("st_coordDim", g)
  def numPoints(g: Column): Column = fn("st_numPoints", g)
  def numGeometries(g: Column): Column = fn("st_numGeometries", g)
  def pointN(g: Column, n: Column): Column = fn("st_pointN", g, n)
  def geometryN(g: Column, n: Column): Column = fn("st_geometryN", g, n)
  def exteriorRing(g: Column): Column = fn("st_exteriorRing", g)
  def interiorRingN(g: Column, n: Column): Column = fn("st_interiorRingN", g, n)
  def isValid(g: Column): Column = fn("st_isValid", g)
  def isSimple(g: Column): Column = fn("st_isSimple", g)
  def isEmpty(g: Column): Column = fn("st_isEmpty", g)
  def isClosed(g: Column): Column = fn("st_isClosed", g)
  def isRing(g: Column): Column = fn("st_isRing", g)
  def isCollection(g: Column): Column = fn("st_isCollection", g)
  def isGeomField(v: Column): Column = fn("st_isGeomField", v)

  // ---- predicates
  def intersects(a: Column, b: Column): Column = fn("st_intersects", a, b)
  def contains(a: Column, b: Column): Column = fn("st_contains", a, b)
  def within(a: Column, b: Column): Column = fn("st_within", a, b)
  def covers(a: Column, b: Column): Column = fn("st_covers", a, b)
  def crosses(a: Column, b: Column): Column = fn("st_crosses", a, b)
  def disjoint(a: Column, b: Column): Column = fn("st_disjoint", a, b)
  def equalsGeom(a: Column, b: Column): Column = fn("st_equals", a, b)
  def overlaps(a: Column, b: Column): Column = fn("st_overlaps", a, b)
  def touches(a: Column, b: Column): Column = fn("st_touches", a, b)
  def relate(a: Column, b: Column): Column = fn("st_relate", a, b)
  def relateBool(a: Column, b: Column, pattern: Column): Column = fn("st_relateBool", a, b, pattern)

  // ---- processing
  def intersection(a: Column, b: Column): Column = fn("st_intersection", a, b)
  def difference(a: Column, b: Column): Column = fn("st_difference", a, b)
  def convexHull(g: Column): Column = fn("st_convexHull", g)
  def convexHullAggr(g: Column): Column =
    GraftBridge.column(ConvexHullAgg(GraftBridge.expression(g))
      .toAggregateExpression(isDistinct = false))
  def simplify(g: Column, tol: Column): Column = fn("st_simplify", g, tol)
  def simplifyPreserveTopology(g: Column, tol: Column): Column = fn("st_simplifyPreserveTopology", g, tol)
  def bufferPoint(p: Column, meters: Column): Column = fn("st_bufferPoint", p, meters)
  def closestPoint(a: Column, b: Column): Column = fn("st_closestPoint", a, b)
  def translate(g: Column, dx: Column, dy: Column): Column = fn("st_translate", g, dx, dy)
  def antimeridianSafeGeom(g: Column): Column = fn("st_antimeridianSafeGeom", g)

  // ---- extent & indexing
  def makeExtent(xmin: Column, ymin: Column, xmax: Column, ymax: Column): Column =
    fn("st_makeExtent", xmin, ymin, xmax, ymax)
  def extentFromGeom(g: Column): Column = fn("st_extentFromGeom", g)
  def extentToGeom(e: Column): Column = fn("st_extentToGeom", e)
  def z2LatLon(g: Column): Column = fn("st_z2LatLon", g)
  def z2Cell(g: Column, level: Column): Column = fn("st_z2Cell", g, level)
  def z2CellXY(lon: Column, lat: Column, level: Column): Column = fn("st_z2CellXY", lon, lat, level)
  def z2CellCover(g: Column, level: Column): Column = fn("st_z2CellCover", g, level)
  def partitionCentroid(g: Column, zoom: Column): Column = fn("st_partitionCentroid", g, zoom)
  def partitionCentroid(g: Column, zoom: Column, bits: Column): Column =
    fn("st_partitionCentroid", g, zoom, bits)
  def crsFromText(s: Column): Column = fn("st_crsFromText", s)
  def geomReproject(g: Column, from: Column, to: Column): Column = fn("st_geomReproject", g, from, to)
}
