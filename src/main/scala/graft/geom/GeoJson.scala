package graft.geom

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.locationtech.jts.geom._

import scala.jdk.CollectionConverters._

/** Minimal RFC 7946 GeoJSON geometry codec over JTS.
  * (reference behavior: spatial/src/main/scala/com/azavea/hiveless/spatial/ST_GeomFromGeoJson.scala:1)
  */
object GeoJson {
  private val mapper = new ObjectMapper()
  private def f = GeomIO.factory

  def read(json: String): Geometry = fromNode(mapper.readTree(json))

  private def fromNode(n: JsonNode): Geometry = {
    val typ = n.get("type").asText()
    typ match {
      case "Point"           => f.createPoint(coord(n.get("coordinates")))
      case "LineString"      => f.createLineString(coords(n.get("coordinates")))
      case "Polygon"         => polygon(n.get("coordinates"))
      case "MultiPoint"      => f.createMultiPoint(coords(n.get("coordinates")).map(f.createPoint))
      case "MultiLineString" =>
        f.createMultiLineString(n.get("coordinates").elements().asScala
          .map(e => f.createLineString(coords(e))).toArray)
      case "MultiPolygon" =>
        f.createMultiPolygon(n.get("coordinates").elements().asScala.map(polygon).toArray)
      case "GeometryCollection" =>
        f.createGeometryCollection(n.get("geometries").elements().asScala.map(fromNode).toArray)
      case "Feature"           => fromNode(n.get("geometry"))
      case "FeatureCollection" =>
        f.createGeometryCollection(
          n.get("features").elements().asScala.map(fromNode).toArray)
      case other => throw new IllegalArgumentException(s"Unsupported GeoJSON type: $other")
    }
  }

  private def coord(n: JsonNode): Coordinate =
    if (n.size() > 2) new Coordinate(n.get(0).asDouble(), n.get(1).asDouble(), n.get(2).asDouble())
    else new Coordinate(n.get(0).asDouble(), n.get(1).asDouble())

  private def coords(n: JsonNode): Array[Coordinate] =
    n.elements().asScala.map(coord).toArray

  private def polygon(n: JsonNode): Polygon = {
    val rings = n.elements().asScala.map(e => f.createLinearRing(coords(e))).toArray
    if (rings.isEmpty) f.createPolygon()
    else f.createPolygon(rings.head, rings.tail)
  }

  def write(g: Geometry): String = {
    val sb = new StringBuilder
    writeGeom(g, sb)
    sb.toString()
  }

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString

  private def writeCoord(c: Coordinate, sb: StringBuilder): Unit = {
    sb.append('[').append(num(c.x)).append(',').append(num(c.y))
    if (!c.getZ.isNaN) sb.append(',').append(num(c.getZ))
    sb.append(']')
  }

  private def writeSeq(cs: Array[Coordinate], sb: StringBuilder): Unit = {
    sb.append('[')
    var i = 0
    while (i < cs.length) {
      if (i > 0) sb.append(',')
      writeCoord(cs(i), sb)
      i += 1
    }
    sb.append(']')
  }

  private def writePolyCoords(p: Polygon, sb: StringBuilder): Unit = {
    sb.append('[')
    writeSeq(p.getExteriorRing.getCoordinates, sb)
    (0 until p.getNumInteriorRing).foreach { i =>
      sb.append(',')
      writeSeq(p.getInteriorRingN(i).getCoordinates, sb)
    }
    sb.append(']')
  }

  private def writeGeom(g: Geometry, sb: StringBuilder): Unit = g match {
    case p: Point =>
      sb.append("""{"type":"Point","coordinates":""")
      writeCoord(p.getCoordinate, sb)
      sb.append('}')
    case l: LineString =>
      sb.append("""{"type":"LineString","coordinates":""")
      writeSeq(l.getCoordinates, sb)
      sb.append('}')
    case p: Polygon =>
      sb.append("""{"type":"Polygon","coordinates":""")
      writePolyCoords(p, sb)
      sb.append('}')
    case m: MultiPoint =>
      sb.append("""{"type":"MultiPoint","coordinates":""")
      writeSeq(m.getCoordinates, sb)
      sb.append('}')
    case m: MultiLineString =>
      sb.append("""{"type":"MultiLineString","coordinates":[""")
      (0 until m.getNumGeometries).foreach { i =>
        if (i > 0) sb.append(',')
        writeSeq(m.getGeometryN(i).getCoordinates, sb)
      }
      sb.append("]}")
    case m: MultiPolygon =>
      sb.append("""{"type":"MultiPolygon","coordinates":[""")
      (0 until m.getNumGeometries).foreach { i =>
        if (i > 0) sb.append(',')
        writePolyCoords(m.getGeometryN(i).asInstanceOf[Polygon], sb)
      }
      sb.append("]}")
    case gc: GeometryCollection =>
      sb.append("""{"type":"GeometryCollection","geometries":[""")
      (0 until gc.getNumGeometries).foreach { i =>
        if (i > 0) sb.append(',')
        writeGeom(gc.getGeometryN(i), sb)
      }
      sb.append("]}")
  }
}
