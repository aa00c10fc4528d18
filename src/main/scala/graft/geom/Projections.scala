package graft.geom

import org.locationtech.jts.geom.{Coordinate, CoordinateFilter, Geometry}

/** CRS handling without a projection library on the classpath: the two
  * CRSs the test surface needs (EPSG:4326 lon/lat and EPSG:3857 web
  * mercator) are implemented from the public spherical-mercator formulas.
  * Mirrors the reference's st_crsFromText / st_geomReproject surface
  * (spatial-index/src/main/scala/com/azavea/hiveless/spatial/index/ST_GeomReproject.scala:1)
  * with an explicitly-supported CRS set instead of a proj4 dependency.
  */
object Projections {

  /** Web-mercator sphere radius (meters), per the EPSG:3857 definition. */
  val R: Double = 6378137.0
  val MaxLat: Double = 85.05112877980659

  def normalize(crs: String): String = crs.trim.toUpperCase match {
    case "EPSG:4326" | "4326" | "WGS84" | "LATLNG" | "LATLON" => "EPSG:4326"
    case "EPSG:3857" | "3857" | "WEBMERCATOR" | "EPSG:900913" => "EPSG:3857"
    case other => throw new IllegalArgumentException(
      s"Unsupported CRS '$other' (supported: EPSG:4326, EPSG:3857)")
  }

  def toMercator(lon: Double, lat: Double): (Double, Double) = {
    val clampedLat = math.max(-MaxLat, math.min(MaxLat, lat))
    val x = R * math.toRadians(lon)
    val y = R * math.log(math.tan(math.Pi / 4.0 + math.toRadians(clampedLat) / 2.0))
    (x, y)
  }

  def fromMercator(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / R)
    val lat = math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0)
    (lon, lat)
  }

  /** Reproject a geometry between the supported CRSs (copy, then mutate
    * coordinates in place via JTS's CoordinateFilter).
    */
  def reproject(g: Geometry, fromCrs: String, toCrs: String): Geometry = {
    val from = normalize(fromCrs)
    val to = normalize(toCrs)
    if (from == to) return g
    val out = g.copy()
    val filter: CoordinateFilter = (c: Coordinate) => {
      val (nx, ny) = (from, to) match {
        case ("EPSG:4326", "EPSG:3857") => toMercator(c.x, c.y)
        case ("EPSG:3857", "EPSG:4326") => fromMercator(c.x, c.y)
        case _ => (c.x, c.y)
      }
      c.setX(nx); c.setY(ny)
    }
    out.apply(filter)
    out.geometryChanged()
    out
  }
}
