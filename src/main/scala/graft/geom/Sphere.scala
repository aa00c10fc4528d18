package graft.geom

import org.locationtech.jts.geom.{Coordinate, Geometry, Point, Polygon}

/** Spherical-earth geodesy from public formulas (haversine great-circle
  * distance, destination point along a bearing). Used by
  * st_distanceSphere / st_lengthSphere / st_bufferPoint
  * (reference surface: spatial/src/main/scala/com/azavea/hiveless/spatial/ST_DistanceSphere.scala:1,
  * ST_LengthSphere.scala:1, ST_BufferPoint.scala:1 — which delegate to
  * GeoMesa's spherical helpers; the math here is re-derived, not ported).
  */
object Sphere {

  /** Mean earth radius in meters (IUGG). */
  val EarthRadius: Double = 6371008.8

  /** Great-circle (haversine) distance in meters between two lon/lat points. */
  def haversine(lon1: Double, lat1: Double, lon2: Double, lat2: Double): Double = {
    val phi1 = math.toRadians(lat1)
    val phi2 = math.toRadians(lat2)
    val dPhi = math.toRadians(lat2 - lat1)
    val dLam = math.toRadians(lon2 - lon1)
    val a = math.sin(dPhi / 2) * math.sin(dPhi / 2) +
      math.cos(phi1) * math.cos(phi2) * math.sin(dLam / 2) * math.sin(dLam / 2)
    2.0 * EarthRadius * math.asin(math.min(1.0, math.sqrt(a)))
  }

  /** Distance in meters between the closest representative points of two
    * geometries: exact haversine for point/point; for other types the
    * centroid is used as the representative (documented approximation).
    */
  def distance(g1: Geometry, g2: Geometry): Double = {
    val c1 = representative(g1)
    val c2 = representative(g2)
    haversine(c1.x, c1.y, c2.x, c2.y)
  }

  private def representative(g: Geometry): Coordinate = g match {
    case p: Point => p.getCoordinate
    case other    => other.getCentroid.getCoordinate
  }

  /** Sum of haversine segment lengths along all line segments, meters. */
  def length(g: Geometry): Double = {
    var total = 0.0
    var i = 0
    val n = g.getNumGeometries
    while (i < n) {
      val part = g.getGeometryN(i)
      val cs = part.getCoordinates
      var j = 1
      while (j < cs.length) {
        total += haversine(cs(j - 1).x, cs(j - 1).y, cs(j).x, cs(j).y)
        j += 1
      }
      i += 1
    }
    total
  }

  /** Destination point from (lon, lat) along initial bearing θ (radians,
    * clockwise from north) at distance meters, on the sphere.
    */
  def destination(lon: Double, lat: Double, bearingRad: Double, meters: Double): (Double, Double) = {
    val delta = meters / EarthRadius
    val phi1 = math.toRadians(lat)
    val lam1 = math.toRadians(lon)
    val sinPhi2 = math.sin(phi1) * math.cos(delta) +
      math.cos(phi1) * math.sin(delta) * math.cos(bearingRad)
    val phi2 = math.asin(math.max(-1.0, math.min(1.0, sinPhi2)))
    val lam2 = lam1 + math.atan2(
      math.sin(bearingRad) * math.sin(delta) * math.cos(phi1),
      math.cos(delta) - math.sin(phi1) * sinPhi2)
    (math.toDegrees(lam2), math.toDegrees(phi2))
  }

  /** Geodesic point buffer: a `segments`-gon whose vertices are the
    * spherical destination points at the given radius — the Spark-native
    * equivalent of the reference's st_bufferPoint (meters buffer around a
    * lon/lat point).
    */
  def bufferPoint(p: Point, meters: Double, segments: Int = 64): Polygon = {
    val lon = p.getX
    val lat = p.getY
    val coords = new Array[Coordinate](segments + 1)
    var i = 0
    while (i < segments) {
      val theta = 2.0 * math.Pi * i / segments
      val (dLon, dLat) = destination(lon, lat, theta, meters)
      coords(i) = new Coordinate(dLon, dLat)
      i += 1
    }
    coords(segments) = coords(0)
    GeomIO.factory.createPolygon(coords)
  }
}
