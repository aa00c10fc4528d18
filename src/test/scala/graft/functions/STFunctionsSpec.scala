package graft.functions

import graft.SparkTestSession
import graft.geom.{GeomIO, Sphere, TWKB}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Per-function behavior for the ST_* surface not expressible as a
  * DuckDB-oracle query (casts, DE-9IM predicates, processing ops,
  * geohash/TWKB codecs, geodesy, CRS).
  */
class STFunctionsSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private def sql1(q: String): Row = spark.sql(q).head()

  test("makePointM: M ordinate survives WKB (Z/M-aware writers)") {
    val r = sql1("SELECT st_asText(st_makePointM(1.5, 2.5, 99.0)) AS t, st_coordDim(st_makePointM(1, 2, 3)) AS d")
    r.getString(0) should include("1.5 2.5")
    r.getInt(1) shouldBe 4 // XYZM storage (NaN Z), per GeomIO docs
    // direct codec roundtrip
    val p = GeomIO.pointM(1.5, 2.5, 99.0)
    val back = GeomIO.fromWKB(GeomIO.toWKB(p))
    back.getCoordinate.getM shouldBe 99.0
  }

  test("3D points keep Z through WKB and WKT") {
    val r = sql1("SELECT st_asText(st_geomFromWKT('POINT Z (1 2 3)')) AS t")
    r.getString(0) shouldBe "POINT Z(1 2 3)"
  }

  test("typed casts: matching type passes through, mismatch → null") {
    val r = sql1(
      """SELECT st_castToPoint(st_makePoint(1, 2)) AS p,
        |       st_castToPoint(st_makeBBOX(0, 0, 1, 1)) AS notp,
        |       st_castToPolygon(st_makeBBOX(0, 0, 1, 1)) AS poly,
        |       st_castToLineString(st_geomFromWKT('LINESTRING (0 0, 1 1)')) AS l
        |""".stripMargin)
    r.isNullAt(0) shouldBe false
    r.isNullAt(1) shouldBe true
    r.isNullAt(2) shouldBe false
    r.isNullAt(3) shouldBe false
  }

  test("typed FromText parsers: wrong geometry type → null") {
    sql1("SELECT st_pointFromText('LINESTRING (0 0, 1 1)') AS p").isNullAt(0) shouldBe true
    sql1("SELECT st_mPolyFromText('MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))') AS p").isNullAt(0) shouldBe false
  }

  test("accessors: boundary, dimension, pointN, geometryN, rings") {
    val r = sql1(
      """SELECT st_dimension(st_makePoint(1,2)) AS d0,
        |       st_dimension(st_geomFromWKT('LINESTRING (0 0, 1 1)')) AS d1,
        |       st_dimension(st_makeBBOX(0,0,1,1)) AS d2,
        |       st_asText(st_pointN(st_geomFromWKT('LINESTRING (0 0, 5 5, 9 9)'), 2)) AS p2,
        |       st_pointN(st_geomFromWKT('LINESTRING (0 0, 5 5)'), 7) AS oob,
        |       st_asText(st_geometryN(st_geomFromWKT('MULTIPOINT ((1 1), (2 2))'), 2)) AS g2,
        |       st_asText(st_exteriorRing(st_makeBBOX(0,0,1,1))) AS ring,
        |       st_interiorRingN(st_makeBBOX(0,0,1,1), 1) AS nohole,
        |       st_asText(st_boundary(st_geomFromWKT('LINESTRING (0 0, 5 5)'))) AS bnd
        |""".stripMargin)
    r.getInt(0) shouldBe 0
    r.getInt(1) shouldBe 1
    r.getInt(2) shouldBe 2
    r.getString(3) shouldBe "POINT (5 5)"
    r.isNullAt(4) shouldBe true
    r.getString(5) shouldBe "POINT (2 2)"
    // WKB has no LinearRing type, so the ring reads back as a LineString
    r.getString(6) should startWith("LINESTRING")
    r.isNullAt(7) shouldBe true
    r.getString(8) shouldBe "MULTIPOINT ((0 0), (5 5))"
  }

  test("is-predicates") {
    val r = sql1(
      """SELECT st_isValid(st_makeBBOX(0,0,1,1)) AS v,
        |       st_isValid(st_geomFromWKT('POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))')) AS bowtie,
        |       st_isSimple(st_geomFromWKT('LINESTRING (0 0, 1 1, 1 0, 0 1)')) AS selfx,
        |       st_isEmpty(st_geomFromWKT('POINT EMPTY')) AS emp,
        |       st_isClosed(st_geomFromWKT('LINESTRING (0 0, 1 0, 1 1, 0 0)')) AS closed,
        |       st_isClosed(st_geomFromWKT('LINESTRING (0 0, 1 0)')) AS open,
        |       st_isRing(st_geomFromWKT('LINESTRING (0 0, 1 0, 1 1, 0 0)')) AS ring,
        |       st_isCollection(st_geomFromWKT('MULTIPOINT ((1 1))')) AS coll,
        |       st_isCollection(st_makePoint(1, 1)) AS notcoll,
        |       st_isGeomField('POINT (1 2)') AS gf,
        |       st_isGeomField('not a geometry') AS notgf
        |""".stripMargin)
    r.getBoolean(0) shouldBe true
    r.getBoolean(1) shouldBe false
    r.getBoolean(2) shouldBe false
    r.getBoolean(3) shouldBe true
    r.getBoolean(4) shouldBe true
    r.getBoolean(5) shouldBe false
    r.getBoolean(6) shouldBe true
    r.getBoolean(7) shouldBe true
    r.getBoolean(8) shouldBe false
    r.getBoolean(9) shouldBe true
    r.getBoolean(10) shouldBe false
  }

  test("DE-9IM predicates: covers/crosses/disjoint/equals/overlaps/touches/relate") {
    val r = sql1(
      """SELECT st_covers(st_makeBBOX(0,0,2,2), st_makeBBOX(0,0,1,1)) AS covers,
        |       st_crosses(st_geomFromWKT('LINESTRING (0 0, 2 2)'),
        |                  st_geomFromWKT('LINESTRING (0 2, 2 0)')) AS crosses,
        |       st_disjoint(st_makePoint(9, 9), st_makeBBOX(0,0,1,1)) AS disj,
        |       st_equals(st_makeBBOX(0,0,1,1),
        |                 st_geomFromWKT('POLYGON ((1 0, 1 1, 0 1, 0 0, 1 0))')) AS eq,
        |       st_overlaps(st_makeBBOX(0,0,2,2), st_makeBBOX(1,1,3,3)) AS ovl,
        |       st_touches(st_makeBBOX(0,0,1,1), st_makeBBOX(1,0,2,1)) AS tch,
        |       st_relate(st_makeBBOX(0,0,1,1), st_makeBBOX(1,0,2,1)) AS dim,
        |       st_relateBool(st_makeBBOX(0,0,1,1), st_makeBBOX(1,0,2,1), 'FF2F11212') AS relb
        |""".stripMargin)
    r.getBoolean(0) shouldBe true
    r.getBoolean(1) shouldBe true
    r.getBoolean(2) shouldBe true
    r.getBoolean(3) shouldBe true // same box, different vertex order
    r.getBoolean(4) shouldBe true
    r.getBoolean(5) shouldBe true
    r.getString(6) shouldBe "FF2F11212"
    r.getBoolean(7) shouldBe true
  }

  test("processing: convexHull, simplify, closestPoint") {
    val r = sql1(
      """SELECT st_asText(st_convexHull(st_geomFromWKT('MULTIPOINT ((0 0), (1 0), (0 1), (0.2 0.2))'))) AS hull,
        |       st_numPoints(st_simplify(st_geomFromWKT('LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)'), 0.5)) AS simp,
        |       st_numPoints(st_simplifyPreserveTopology(
        |         st_geomFromWKT('LINESTRING (0 0, 1 0.01, 2 0, 3 0.01, 4 0)'), 0.5)) AS simpt,
        |       st_asText(st_closestPoint(st_geomFromWKT('LINESTRING (0 0, 10 0)'), st_makePoint(3, 5))) AS cp
        |""".stripMargin)
    r.getString(0) shouldBe "POLYGON ((0 0, 0 1, 1 0, 0 0))"
    r.getInt(1) shouldBe 2
    r.getInt(2) shouldBe 2
    r.getString(3) shouldBe "POINT (3 0)"
  }

  test("bufferPoint: geodesic polygon around the point at radius meters") {
    import org.apache.spark.sql.functions._
    val df = spark.sql(
      """SELECT st_bufferPoint(st_makePoint(10.0, 45.0), 50000.0) AS buf,
        |       st_makePoint(10.0, 45.0) AS ctr""".stripMargin)
    val row = df.select(
      st.contains(col("buf"), col("ctr")).as("c"),
      st.numPoints(col("buf")).as("n"),
      st.isValid(col("buf")).as("v")).head()
    row.getBoolean(0) shouldBe true
    row.getInt(1) shouldBe 65 // 64-gon + closing point
    row.getBoolean(2) shouldBe true
    // vertices sit ~50km from the center (haversine), within 1%
    val buf = GeomIO.fromWKB(
      df.select(st.asBinary(col("buf"))).head().getAs[Array[Byte]](0))
    buf.getCoordinates.dropRight(1).foreach { c =>
      Sphere.haversine(10.0, 45.0, c.x, c.y) shouldBe 50000.0 +- 500.0
    }
  }

  test("antimeridianSafeGeom splits IDL-crossing polygons") {
    val r = sql1(
      """SELECT st_numGeometries(st_antimeridianSafeGeom(st_makeBBOX(170, 10, 190, 20))) AS n,
        |       round(st_area(st_antimeridianSafeGeom(st_makeBBOX(170, 10, 190, 20))), 6) AS a,
        |       st_numGeometries(st_idlSafeGeom(st_makeBBOX(0, 0, 10, 10))) AS unchanged
        |""".stripMargin)
    r.getInt(0) shouldBe 2 // [170,180] and [-180,-170]
    r.getDouble(1) shouldBe 200.0 // area preserved
    r.getInt(2) shouldBe 1
  }

  test("asLatLonText formats DMS with hemispheres") {
    sql1("SELECT st_asLatLonText(st_makePoint(-97.5, 35.25))").getString(0) shouldBe
      """35°15'00.000"N 97°30'00.000"W"""
    sql1("SELECT st_asLatLonText(st_makePoint(10.0, -45.5))").getString(0) shouldBe
      """45°30'00.000"S 10°00'00.000"E"""
  }

  test("TWKB: SQL roundtrip and precision quantization") {
    val r = sql1(
      """SELECT st_asText(st_geomFromTWKB(st_asTWKB(st_geomFromWKT('LINESTRING (1.25 2.5, 3.75 4.125)')))) AS rt,
        |       st_asText(st_geomFromTWKB(st_asTWKB(st_makePoint(1.23456789, 2.3456789), 2))) AS quant,
        |       length(st_asTWKB(st_makePoint(1.5, 2.5))) < length(st_asBinary(st_makePoint(1.5, 2.5))) AS smaller
        |""".stripMargin)
    r.getString(0) shouldBe "LINESTRING (1.25 2.5, 3.75 4.125)"
    r.getString(1) shouldBe "POINT (1.23 2.35)"
    r.getBoolean(2) shouldBe true
  }

  test("TWKB codec: all geometry types roundtrip (direct)") {
    val wkts = Seq(
      "POINT (1.5 -2.5)",
      "LINESTRING (0 0, 1.25 1.25, -3 4)",
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))",
      "MULTIPOINT ((1 1), (2 2))",
      "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
      "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
      "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 2 2))",
      "POINT EMPTY",
      "POLYGON EMPTY")
    wkts.foreach { wkt =>
      val g = GeomIO.fromWKT(wkt)
      val back = TWKB.read(TWKB.write(g, 7))
      withClue(wkt) { back.equalsExact(g, 1e-7) shouldBe true }
    }
  }

  test("TWKB optional metadata: constant size/bbox vectors, idlist skip, loud failures") {
    def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString
    val p = GeomIO.fromWKT("POINT (1 2)")
    // constant byte vectors at precision 0 (hand-derivable from the spec)
    hex(TWKB.write(p, 0)) shouldBe "01000204"
    hex(TWKB.write(p, 0, withSize = true)) shouldBe "0102020204"
    hex(TWKB.write(p, 0, withBBox = true)) shouldBe "0101020004000204"
    hex(TWKB.write(p, 0, withBBox = true, withSize = true)) shouldBe "010306020004000204"
    for (flags <- Seq((true, false), (false, true), (true, true)))
      TWKB.read(TWKB.write(p, 0, withBBox = flags._1, withSize = flags._2))
        .equalsExact(p) shouldBe true
    // PostGIS-style per-member idlist (0x04) on a multipoint, hand-built:
    // MULTIPOINT ((3 1), (5 2)) with ids [7, 9] — ids are skipped
    val mp = Array(0x04, 0x04, 0x02, 0x0e, 0x12, 0x06, 0x02, 0x04, 0x02).map(_.toByte)
    TWKB.read(mp).equalsExact(GeomIO.fromWKT("MULTIPOINT ((3 1), (5 2))")) shouldBe true
    // idlist on a non-multi type is a layout violation and fails loudly
    val bad = TWKB.write(p, 0).clone()
    bad(1) = (bad(1) | 0x04).toByte
    intercept[IllegalArgumentException](TWKB.read(bad))
    // a size claim that overruns the buffer fails loudly
    intercept[Exception](TWKB.read(TWKB.write(p, 0, withSize = true).dropRight(1)))
    // extended dims widen the bbox to one (min, delta) pair per dimension
    val pz = GeomIO.factory.createPoint(new org.locationtech.jts.geom.Coordinate(1.0, 2.0, 3.0))
    TWKB.read(TWKB.write(pz, 0, withBBox = true, withSize = true)).getCoordinate.getZ shouldBe 3.0
    // bbox+size roundtrip across geometry classes
    for (wkt <- Seq("LINESTRING (0 0, 1 1, 2 0)", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
                    "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))", "GEOMETRYCOLLECTION (POINT (1 1))")) {
      val g = GeomIO.fromWKT(wkt)
      withClue(wkt) {
        TWKB.read(TWKB.write(g, 3, withBBox = true, withSize = true)).equalsExact(g, 1e-3) shouldBe true
      }
    }
    // the empty-geometry flag (0x10) stays legal
    TWKB.read(TWKB.write(GeomIO.fromWKT("POINT EMPTY"), 0)).isEmpty shouldBe true
  }

  test("TWKB extended dims: Z and M ordinates roundtrip (PostGIS-style 0x08 metadata)") {
    import org.locationtech.jts.geom.{Coordinate, CoordinateXYZM}
    // Z-only: POINT Z (1.25 2.5 3.75)
    val pz = GeomIO.factory.createPoint(new Coordinate(1.25, 2.5, 3.75))
    val zBack = TWKB.read(TWKB.write(pz, 2))
    zBack.getCoordinate.x shouldBe 1.25
    zBack.getCoordinate.getZ shouldBe 3.75
    // XYZM point
    val pzm = GeomIO.factory.createPoint(new CoordinateXYZM(1.0, 2.0, 3.0, 4.0))
    val zmBack = TWKB.read(TWKB.write(pzm, 0))
    zmBack.getCoordinate.getZ shouldBe 3.0
    zmBack.getCoordinate.getM shouldBe 4.0
    // XYM (NaN Z, as st_makePointM builds): M survives, Z stays absent
    val pm = GeomIO.fromWKB(graft.functions.GeomImpl.makePointM(-5.5, 6.25, 7.125))
    val mBytes = TWKB.write(pm, 3)
    // metadata byte carries 0x08, dimensions byte M-only at precision 3
    (mBytes(1) & 0x08) should not be 0
    (mBytes(2) & 0xff) shouldBe (0x02 | (3 << 5))
    val mBack = TWKB.read(mBytes)
    mBack.getCoordinate.getM shouldBe 7.125
    java.lang.Double.isNaN(mBack.getCoordinate.getZ) shouldBe true
    // hand-derived spec vector: POINT Z (1 2 3), precision 0, zprec 0
    val const = TWKB.read(Array[Byte](0x01, 0x08, 0x01, 0x02, 0x04, 0x06))
    const.getCoordinate.x shouldBe 1.0
    const.getCoordinate.getZ shouldBe 3.0
    // Z linestring: deltas per vertex on all three lanes
    val ls = GeomIO.factory.createLineString(
      Array(new Coordinate(0, 0, 10), new Coordinate(1.5, -2.5, 9.25)))
    val lsBack = TWKB.read(TWKB.write(ls, 2))
    lsBack.getCoordinates()(1).getZ shouldBe 9.25
    lsBack.getCoordinates()(1).y shouldBe -2.5
  }

  test("deflate/inflate SQL functions: roundtrip + zlib default header") {
    val r = sql1(
      """SELECT st_asText(st_geomFromTWKB(st_inflate(st_deflate(st_asTWKB(st_makePoint(1.25, 2.5), 2))))) AS rt,
        |       hex(substring(st_deflate(st_asTWKB(st_makePoint(1.25, 2.5), 2)), 1, 2)) AS hdr
        |""".stripMargin)
    r.getString(0) shouldBe "POINT (1.25 2.5)"
    r.getString(1) shouldBe "789C"
  }

  test("geohash: non-multiple-of-5 precisions roundtrip (cell contains point)") {
    import graft.geom.GeoHash
    for (bits <- Seq(7, 12, 23, 40, 63); (lon, lat) <- Seq((-122.42, 37.77), (151.21, -33.87))) {
      val h = GeoHash.encode(lon, lat, bits)
      h.length shouldBe (bits + 4) / 5
      val cell = GeoHash.decodeEnvelope(h, bits)
      withClue(s"bits=$bits") {
        cell.contains(lon, lat) shouldBe true
        // cell dims halve alternately: lon span = 360/2^ceil(bits/2), lat span = 180/2^floor(bits/2)
        cell.getWidth shouldBe (360.0 / math.pow(2, (bits + 1) / 2)) +- 1e-9
        cell.getHeight shouldBe (180.0 / math.pow(2, bits / 2)) +- 1e-9
      }
    }
    // known vector (public geohash test value)
    GeoHash.encode(-5.6, 42.6, 25) shouldBe "ezs42"
  }

  test("geohash polygon input uses centroid (documented semantics)") {
    import graft.geom.GeoHash
    val poly = GeomIO.bbox(10, 20, 11, 21)
    GeoHash.encode(poly, 40) shouldBe GeoHash.encode(10.5, 20.5, 40)
  }

  test("CRS: crsFromText normalizes, rejects unsupported; reproject roundtrips") {
    sql1("SELECT st_crsFromText('epsg:4326')").getString(0) shouldBe "EPSG:4326"
    sql1("SELECT st_crsFromText('WebMercator')").getString(0) shouldBe "EPSG:3857"
    // EPSG:27700 resolves through the registry onto the tmerc family
    sql1("SELECT st_crsFromText('EPSG:27700')").getString(0) should include("+proj=tmerc")
    // r11: the ftUS State Plane twins resolve (unit-scaled LCC)
    sql1("SELECT st_crsFromText('EPSG:2263')").getString(0) should
      include("+to_meter=")
    // a code outside the registry still rejects
    an[Exception] should be thrownBy sql1("SELECT st_crsFromText('EPSG:2230')")
    val r = sql1(
      """SELECT round(st_x(st_geomReproject(st_geomReproject(st_makePoint(12.5, 41.9),
        |  'EPSG:4326', 'EPSG:3857'), 'EPSG:3857', 'EPSG:4326')), 9) AS x""".stripMargin)
    r.getDouble(0) shouldBe 12.5 +- 1e-9
  }

  test("CRS: UTM zones — known anchors, hemisphere symmetry, roundtrip, zone parsing") {
    import graft.geom.Projections
    // crsFromText accepts EPSG codes and "UTM zone NN{N,S}" spellings
    sql1("SELECT st_crsFromText('EPSG:32633')").getString(0) shouldBe "EPSG:32633"
    sql1("SELECT st_crsFromText('utm zone 33n')").getString(0) shouldBe "EPSG:32633"
    sql1("SELECT st_crsFromText('UTM zone 10S')").getString(0) shouldBe "EPSG:32710"
    an[Exception] should be thrownBy Projections.parseCrs("EPSG:32661") // zone 61
    // the central meridian of zone 33 (15°E) maps to the false easting,
    // and the equator to northing 0 (north) / 10 000 000 (south)
    val (cx, cy) = Projections.Utm(33, north = true).fromGeo(15.0, 0.0)
    cx shouldBe 500000.0 +- 1e-6
    cy shouldBe 0.0 +- 1e-6
    // hemisphere symmetry: y_south(−φ) = 10 000 000 − y_north(φ)
    val (_, yn) = Projections.Utm(33, north = true).fromGeo(16.2, 47.1)
    val (_, ys) = Projections.Utm(33, north = false).fromGeo(16.2, -47.1)
    ys shouldBe (10000000.0 - yn) +- 1e-6
    // scale on the central meridian is k0: 1° of latitude ≈ 110 575 m of
    // meridian arc at the equator → easting constant, northing ≈ k0·arc
    val (x1, y1) = Projections.Utm(33, north = true).fromGeo(15.0, 1.0)
    x1 shouldBe 500000.0 +- 1e-6
    y1 / 110574.4 shouldBe 0.9996 +- 1e-3
    // forward∘inverse identity across the zone and both hemispheres
    for (lon <- Seq(12.1, 15.0, 17.9); lat <- Seq(-79.5, -12.3, 0.7, 45.0, 83.9)) {
      val utm = Projections.Utm(33, north = lat >= 0)
      val (x, y) = utm.fromGeo(lon, lat)
      val (lonB, latB) = utm.toGeo(x, y)
      withClue(s"($lon, $lat)") {
        lonB shouldBe lon +- 1e-8
        latB shouldBe lat +- 1e-8
      }
    }
    // end-to-end through the SQL surface, web-mercator → UTM chains via geo
    val r = sql1(
      """SELECT round(st_x(st_geomReproject(st_geomReproject(st_makePoint(14.5, 46.1),
        |  'EPSG:4326', 'EPSG:32633'), 'EPSG:32633', 'EPSG:3857')), 6) AS x""".stripMargin)
    r.getDouble(0) shouldBe (6378137.0 * math.toRadians(14.5)) +- 1e-4
  }

  test("CRS: polar stereographic — EPSG worked example, pole geometry, roundtrip") {
    import graft.geom.Projections
    // EPSG guidance note 7-2, Polar Stereographic variant B worked example
    // (WGS84, lat_ts=-71, lon0=70, FE=FN=6000000): phi=-75, lam=120 must
    // project to E 7255380.79, N 7053389.56
    val ex = Projections.PolarStereo(north = false, latTs = -71.0, lon0 = 70.0, name = "EPSG:3032",
      fe = 6000000.0, fn = 6000000.0)
    val (x, y) = ex.fromGeo(120.0, -75.0)
    x shouldBe 7255380.79 +- 0.01
    y shouldBe 7053389.56 +- 0.01
    // center meridians: x = 0 exactly, northing sign per aspect
    val s31 = Projections.parseCrs("EPSG:3031")
    val (x31, y31) = s31.fromGeo(0.0, -71.0)
    math.abs(x31) shouldBe 0.0 +- 1e-9
    y31 should be > 0.0 // grid north points toward lon 180 in the south aspect
    val n13 = Projections.parseCrs("EPSG:3413")
    val (x13, y13) = n13.fromGeo(-45.0, 70.0)
    math.abs(x13) shouldBe 0.0 +- 1e-9
    y13 should be < 0.0
    // roundtrip across both aspects
    for ((lon, lat) <- Seq((13.0, -77.85), (-150.0, -60.0), (100.0, 82.5), (-45.0, 60.0), (179.9, -89.9))) {
      val crs = if (lat < 0) s31 else n13
      val (px, py) = crs.fromGeo(lon, lat)
      val (bl, bp) = crs.toGeo(px, py)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-9
      }
    }
    // SQL surface
    sql1("SELECT st_crsFromText('3031')").getString(0) shouldBe "EPSG:3031"
    val p = sql1("SELECT st_y(st_geomReproject(st_makePoint(0.0, -71.0), 'EPSG:4326', 'EPSG:3031'))")
    p.getDouble(0) shouldBe y31 +- 1e-6
  }

  test("CRS: LAEA (EPSG:3035) — EPSG worked example, center exactness, roundtrip") {
    import graft.geom.Projections
    // EPSG guidance note 7-2 LAEA worked example (ETRS89-LAEA): phi=50,
    // lam=5 must project to E 3962799.45, N 2999718.85
    val laea = Projections.parseCrs("EPSG:3035")
    val (x, y) = laea.fromGeo(5.0, 50.0)
    x shouldBe 3962799.45 +- 0.01
    y shouldBe 2999718.85 +- 0.01
    // projection center maps to the false origin exactly
    laea.fromGeo(10.0, 52.0) shouldBe ((4321000.0, 3210000.0))
    for ((lon, lat) <- Seq((-10.0, 35.0), (30.0, 70.0), (45.0, 28.0), (10.0, -40.0))) {
      val (px, py) = laea.fromGeo(lon, lat)
      val (bl, bp) = laea.toGeo(px, py)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-7
        bp shouldBe lat +- 1e-7
      }
    }
    sql1("SELECT st_crsFromText('3035')").getString(0) shouldBe "EPSG:3035"
    val p = sql1("SELECT st_x(st_geomReproject(st_makePoint(5.0, 50.0), 'EPSG:4326', 'EPSG:3035'))")
    p.getDouble(0) shouldBe x +- 1e-6
  }

  test("CRS: Lambert-93 (EPSG:2154) — secant-cone invariants, conformality, roundtrip") {
    import graft.geom.Projections
    val lcc = Projections.parseCrs("EPSG:2154")
    // local east-west scale factor via a small finite difference
    def parallelScale(lat: Double, lon: Double): Double = {
      val d = 0.01
      val (x1, y1) = lcc.fromGeo(lon, lat)
      val (x2, y2) = lcc.fromGeo(lon + d, lat)
      val chord = math.hypot(x2 - x1, y2 - y1)
      val s = math.sin(math.toRadians(lat))
      val parallelRadius = 6378137.0 * math.cos(math.toRadians(lat)) /
        math.sqrt(1.0 - 0.00669437999014133 * s * s)
      chord / (math.toRadians(d) * parallelRadius)
    }
    // scale is exactly 1 on both standard parallels, < 1 between, > 1 outside
    parallelScale(49.0, 3.0) shouldBe 1.0 +- 1e-6
    parallelScale(44.0, 7.0) shouldBe 1.0 +- 1e-6
    parallelScale(46.5, 3.0) should be < 1.0
    parallelScale(51.5, 3.0) should be > 1.0
    parallelScale(41.0, 3.0) should be > 1.0
    // conformality: north-south scale equals east-west scale
    def meridianScale(lat: Double, lon: Double): Double = {
      val d = 0.01
      val (x1, y1) = lcc.fromGeo(lon, lat)
      val (x2, y2) = lcc.fromGeo(lon, lat + d)
      val chord = math.hypot(x2 - x1, y2 - y1)
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - 0.00669437999014133 * s * s
      val meridianRadius = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w))
      chord / (math.toRadians(d) * meridianRadius)
    }
    for ((lon, lat) <- Seq((2.35, 48.85), (-1.55, 47.22), (7.75, 48.57), (5.37, 43.30)))
      meridianScale(lat, lon) / parallelScale(lat, lon) shouldBe 1.0 +- 1e-4
    // the projection center maps to the false origin's easting, and Paris
    // lands in the published Lambert-93 ballpark
    val (cx, _) = lcc.fromGeo(3.0, 46.5)
    cx shouldBe 700000.0 +- 1e-6
    val (px, py) = lcc.fromGeo(2.3522, 48.8566)
    px shouldBe 652000.0 +- 20000.0
    py shouldBe 6862000.0 +- 20000.0
    // roundtrip
    for ((lon, lat) <- Seq((2.35, 48.85), (-4.5, 48.4), (9.5, 42.0), (3.0, 46.5), (20.0, 60.0))) {
      val (x, y) = lcc.fromGeo(lon, lat)
      val (bl, bp) = lcc.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-8
        bp shouldBe lat +- 1e-8
      }
    }
    sql1("SELECT st_crsFromText('2154')").getString(0) shouldBe "EPSG:2154"
  }

  test("CRS: Conus Albers (EPSG:5070) — standard parallels, equal-area invariant, roundtrip") {
    import graft.geom.Projections
    val aea = Projections.parseCrs("EPSG:5070")
    def scales(lat: Double, lon: Double): (Double, Double) = {
      val d = 0.01
      val (x1, y1) = aea.fromGeo(lon, lat)
      val (x2, y2) = aea.fromGeo(lon + d, lat)
      val (x3, y3) = aea.fromGeo(lon, lat + d)
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - 0.00669437999014133 * s * s
      val parallelRadius = 6378137.0 * math.cos(math.toRadians(lat)) / math.sqrt(w)
      val meridianRadius = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w))
      (math.hypot(x2 - x1, y2 - y1) / (math.toRadians(d) * parallelRadius),
        math.hypot(x3 - x1, y3 - y1) / (math.toRadians(d) * meridianRadius))
    }
    // cone scale k = 1 exactly on both standard parallels
    scales(29.5, -96.0)._1 shouldBe 1.0 +- 1e-6
    scales(45.5, -80.0)._1 shouldBe 1.0 +- 1e-6
    // the defining property: area scale h·k = 1 EVERYWHERE
    for ((lon, lat) <- Seq((-96.0, 23.0), (-120.0, 40.0), (-75.0, 42.0), (-96.0, 37.5), (-85.0, 30.0))) {
      val (k, h) = scales(lat, lon)
      withClue(s"($lon,$lat)") { k * h shouldBe 1.0 +- 1e-4 }
    }
    // projection origin maps to (0, 0) — EPSG:5070 has no false origin
    val (ox, oy) = aea.fromGeo(-96.0, 23.0)
    ox shouldBe 0.0 +- 1e-6
    oy shouldBe 0.0 +- 1e-6
    // roundtrip across CONUS
    // 1e-7°: the inverse goes through the truncated authalic series 3-18
    for ((lon, lat) <- Seq((-122.4, 37.8), (-74.0, 40.7), (-87.6, 41.9), (-96.0, 23.0), (-105.0, 48.0))) {
      val (x, y) = aea.fromGeo(lon, lat)
      val (bl, bp) = aea.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-7
        bp shouldBe lat +- 1e-7
      }
    }
    sql1("SELECT st_crsFromText('5070')").getString(0) shouldBe "EPSG:5070"
  }

  test("CRS: Hotine oblique Mercator — conformality, center geometry, rectification, roundtrip") {
    import graft.geom.Projections
    val om = Projections.parseCrs(
      "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 +gamma=53 +k_0=0.99984 +x_0=0 +y_0=0 +ellps=WGS84")
    // variant B: the projection CENTER maps to the false origin —
    // independently validates the u_c (9-39) constant
    val (cx, cy) = om.fromGeo(115.0, 4.0)
    cx shouldBe 0.0 +- 1e-6
    cy shouldBe 0.0 +- 1e-6
    // conformality: the defining property — local scale is ISOTROPIC
    // (east-step scale == north-step scale) everywhere; most formula
    // errors (wrong constant, wrong sign, series slip) break this
    def scales(lon: Double, lat: Double): (Double, Double) = {
      val d = 0.001
      val (x1, y1) = om.fromGeo(lon, lat)
      val (x2, y2) = om.fromGeo(lon + d, lat)
      val (x3, y3) = om.fromGeo(lon, lat + d)
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - 0.00669437999014133 * s * s
      val parallelRadius = 6378137.0 * math.cos(math.toRadians(lat)) / math.sqrt(w)
      val meridianRadius = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w))
      (math.hypot(x2 - x1, y2 - y1) / (math.toRadians(d) * parallelRadius),
        math.hypot(x3 - x1, y3 - y1) / (math.toRadians(d) * meridianRadius))
    }
    for ((lon, lat) <- Seq((115.0, 4.0), (110.0, 1.0), (120.0, 7.0), (100.0, -10.0), (135.0, 20.0))) {
      val (k, h) = scales(lon, lat)
      withClue(s"($lon,$lat)") { k / h shouldBe 1.0 +- 1e-6 }
    }
    // scale on the initial line at the center is k0, and grows off-line
    scales(115.0, 4.0)._1 shouldBe 0.99984 +- 1e-6
    scales(100.0, -10.0)._1 should be > 0.99984
    // rectification: a small step from the center must map to the grid
    // direction equal to its TRUE initial bearing (the flat lat/lon step
    // below has ellipsoidal bearing atan2(N·cosφ·Δλ, M·Δφ) ≈ 53.18°,
    // not 53° — N/M ≈ 1.0067 tilts it); conformal maps preserve angles,
    // so grid angle minus bearing must vanish as the step shrinks
    val d = 0.002
    val (dlam, dphi) = (math.toRadians(d * math.sin(math.toRadians(53.0)) / math.cos(math.toRadians(4.0))),
      math.toRadians(d * math.cos(math.toRadians(53.0))))
    val s4 = math.sin(math.toRadians(4.0))
    val w4 = 1.0 - 0.00669437999014133 * s4 * s4
    val n4 = 6378137.0 / math.sqrt(w4)
    val m4 = 6378137.0 * (1.0 - 0.00669437999014133) / (w4 * math.sqrt(w4))
    val trueBearing = math.toDegrees(math.atan2(n4 * math.cos(math.toRadians(4.0)) * dlam, m4 * dphi))
    val (sx, sy) = om.fromGeo(115.0 + d * math.sin(math.toRadians(53.0)) / math.cos(math.toRadians(4.0)),
      4.0 + d * math.cos(math.toRadians(53.0)))
    math.toDegrees(math.atan2(sx - cx, sy - cy)) shouldBe trueBearing +- 0.01
    // roundtrip across the window (chi-series inverse)
    for ((lon, lat) <- Seq((115.0, 4.0), (109.5, 1.5), (118.0, 6.0), (95.0, -15.0), (140.0, 25.0))) {
      val (x, y) = om.fromGeo(lon, lat)
      val (bl, bp) = om.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-7
        bp shouldBe lat +- 1e-7
      }
    }
    // variant A (+no_off) differs from variant B by exactly the constant
    // (u_c sin gamma, u_c cos gamma) rectified offset — i.e. the same
    // transform anchored at the natural origin
    val omA = Projections.parseCrs(
      "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 +gamma=53 +k_0=0.99984 +no_off +ellps=WGS84")
    val (ax, ay) = omA.fromGeo(115.0, 4.0)
    val (bx, by) = omA.fromGeo(118.0, 6.0)
    val (vx, vy) = om.fromGeo(118.0, 6.0)
    bx - ax shouldBe vx +- 1e-6
    by - ay shouldBe vy +- 1e-6
    // southern-hemisphere centerline roundtrips too (copySign branches)
    val omS = Projections.parseCrs(
      "+proj=omerc +lat_0=-20 +lonc=45 +alpha=-35 +gamma=-35 +k_0=1 +ellps=WGS84")
    for ((lon, lat) <- Seq((45.0, -20.0), (40.0, -25.0), (50.0, -12.0))) {
      val (x, y) = omS.fromGeo(lon, lat)
      val (bl, bp) = omS.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-7
        bp shouldBe lat +- 1e-7
      }
    }
  }

  test("CRS: sinusoidal — equal-area invariant, equator/meridian exactness, roundtrip") {
    import graft.geom.Projections
    val sinu = Projections.parseCrs("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
    // central meridian: x = 0 exactly; equator: y = 0 exactly and
    // x = a·λ (the sqrt term is exactly 1 at sinφ = 0)
    sinu.fromGeo(0.0, 47.3)._1 shouldBe 0.0 +- 1e-9
    val (xe, ye) = sinu.fromGeo(90.0, 0.0)
    ye shouldBe 0.0 +- 1e-9
    xe shouldBe 6378137.0 * math.Pi / 2.0 +- 1e-6
    // the defining property: area scale = 1 everywhere (Jacobian of the
    // map equals the ellipsoidal surface element M·N·cosφ)
    def areaScale(lon: Double, lat: Double): Double = {
      val d = 0.01
      val (x1, y1) = sinu.fromGeo(lon, lat)
      val (x2, y2) = sinu.fromGeo(lon + d, lat)
      val (x3, y3) = sinu.fromGeo(lon, lat + d)
      val jac = math.abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) /
        (math.toRadians(d) * math.toRadians(d))
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - 0.00669437999014133 * s * s
      val n = 6378137.0 / math.sqrt(w)
      val m = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w))
      jac / (m * n * math.cos(math.toRadians(lat)))
    }
    for ((lon, lat) <- Seq((0.0, 0.0), (77.0, 28.6), (-100.0, 45.0), (140.0, -33.9), (10.0, 78.0)))
      withClue(s"($lon,$lat)") { areaScale(lon, lat) shouldBe 1.0 +- 1e-4 }
    // roundtrip through the rectifying-latitude inverse (1e-7°: the
    // truncated 3-26 series, same tolerance as the UTM/Albers inverses)
    for ((lon, lat) <- Seq((-122.4, 37.8), (151.2, -33.9), (0.0, 80.0), (-179.5, -85.0), (45.0, 0.0))) {
      val (x, y) = sinu.fromGeo(lon, lat)
      val (bl, bp) = sinu.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-7
        bp shouldBe lat +- 1e-7
      }
    }
    // SQL surface + a legacy-datum sinu grid (datumWrap applies generically)
    val p = sql1("SELECT st_x(st_geomReproject(st_makePoint(90.0, 0.0), 'EPSG:4326', " +
      "'+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84'))")
    p.getDouble(0) shouldBe xe +- 1e-6
    val shifted = Projections.parseCrs("+proj=sinu +lon_0=0 +ellps=clrk66 +towgs84=-8,160,176")
    val (sx, sy) = shifted.fromGeo(-100.0, 40.0)
    val (bl2, bp2) = shifted.toGeo(sx, sy)
    bl2 shouldBe -100.0 +- 1e-6
    bp2 shouldBe 40.0 +- 1e-6
    // the ACTUAL MODIS grid: +R authalic sphere (nadgrids=@null practice:
    // no datum wrap, e = 0 collapses the ellipsoidal form to x = RΔλcosφ,
    // y = Rφ exactly)
    val modis = Projections.parseCrs("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181 +nadgrids=@null +wktext")
    val rM = 6371007.181
    val (mx, my) = modis.fromGeo(-93.0, 45.0)
    mx shouldBe rM * math.toRadians(-93.0) * math.cos(math.toRadians(45.0)) +- 1e-6
    my shouldBe rM * math.toRadians(45.0) +- 1e-6
    val (mbl, mbp) = modis.toGeo(mx, my)
    mbl shouldBe -93.0 +- 1e-9
    mbp shouldBe 45.0 +- 1e-9
    // sphere + towgs84 is ambiguous and must fail loudly
    an[IllegalArgumentException] should be thrownBy
      Projections.parseCrs("+proj=sinu +R=6371007.181 +towgs84=1,2,3")
  }

  test("CRS: Mollweide — Newton residual, pole/edge geometry, equal-area, roundtrip") {
    import graft.geom.Projections
    val moll = Projections.Mollweide(0.0, 0.0, 0.0, "moll", Projections.Ellipsoid.Wgs84)
    val R = 6378137.0
    // the fixed 8-step schedule actually solves 2θ + sin 2θ = π sin φ
    for (lat <- (-85 to 85 by 5).map(_.toDouble)) {
      val th = moll.theta(math.toRadians(lat))
      val resid = 2.0 * th + math.sin(2.0 * th) - math.Pi * math.sin(math.toRadians(lat))
      withClue(s"lat=$lat") { math.abs(resid) should be < 1e-12 }
    }
    // origin exact; pole at y = √2·R with x = 0; equator edge at x = 2√2·R
    moll.fromGeo(0.0, 0.0) shouldBe ((0.0, 0.0))
    val (px, py) = moll.fromGeo(0.0, 90.0)
    px shouldBe 0.0 +- 1e-9
    py shouldBe math.sqrt(2.0) * R +- 1e-6
    moll.fromGeo(180.0, 0.0)._1 shouldBe 2.0 * math.sqrt(2.0) * R +- 1e-6
    // equal-area on the sphere: Jacobian = R²·cosφ (d = 0.001°: the
    // finite-difference truncation error grows with dθ/dφ near the pole
    // and at 0.01° already exceeds 1e-4 by lat 75)
    def areaScale(lon: Double, lat: Double): Double = {
      val d = 0.001
      val (x1, y1) = moll.fromGeo(lon, lat)
      val (x2, y2) = moll.fromGeo(lon + d, lat)
      val (x3, y3) = moll.fromGeo(lon, lat + d)
      val jac = math.abs((x2 - x1) * (y3 - y1) - (x3 - x1) * (y2 - y1)) /
        (math.toRadians(d) * math.toRadians(d))
      jac / (R * R * math.cos(math.toRadians(lat)))
    }
    for ((lon, lat) <- Seq((0.0, 0.0), (120.0, 50.0), (-60.0, -35.0), (20.0, 75.0)))
      withClue(s"($lon,$lat)") { areaScale(lon, lat) shouldBe 1.0 +- 1e-4 }
    // roundtrip incl. far-from-center points
    for ((lon, lat) <- Seq((-122.4, 37.8), (151.2, -33.9), (179.0, 60.0), (-179.0, -80.0), (0.0, 85.0))) {
      val (x, y) = moll.fromGeo(lon, lat)
      val (bl, bp) = moll.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-9
      }
    }
    // SQL surface
    val q = sql1("SELECT st_y(st_geomReproject(st_makePoint(0.0, 50.0), 'EPSG:4326', " +
      "'+proj=moll +lon_0=0'))")
    q.getDouble(0) shouldBe moll.fromGeo(0.0, 50.0)._2 +- 1e-6
  }

  test("CRS: ellipsoidal Mercator (EPSG:3395) — conformality, lat_ts scale, sphere collapse, roundtrip") {
    import graft.geom.Projections
    val merc = Projections.parseCrs("+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m")
    // equator exactness: x = a·λ, y = 0 (k0 = 1 exactly at lat_ts = 0)
    val (xe, ye) = merc.fromGeo(90.0, 0.0)
    xe shouldBe 6378137.0 * math.Pi / 2.0 +- 1e-6
    ye shouldBe 0.0 +- 1e-9
    // the defining property set: conformality (meridian scale == parallel
    // scale) AND the point scale equals the closed form
    // k(φ) = k0·√(1−e²sin²φ)/cosφ (Snyder 7-8)
    def pointScales(crs: Projections.Crs, lon: Double, lat: Double): (Double, Double) = {
      // central differences: the forward-difference truncation error
      // (Δφ/2)·k′/k ≈ 5e-6 at mid-latitudes would swamp a 1e-6 bound
      val d = 1e-3
      val (x1, y1) = crs.fromGeo(lon - d / 2, lat)
      val (x2, y2) = crs.fromGeo(lon + d / 2, lat)
      val (x3, y3) = crs.fromGeo(lon, lat + d / 2)
      val (x4, y4) = crs.fromGeo(lon, lat - d / 2)
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - 0.00669437999014133 * s * s
      val n = 6378137.0 / math.sqrt(w)                              // prime-vertical radius
      val m = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w)) // meridian radius
      (math.hypot(x2 - x1, y2 - y1) / (math.toRadians(d) * n * math.cos(math.toRadians(lat))),
        math.hypot(x3 - x4, y3 - y4) / (math.toRadians(d) * m))
    }
    for ((lon, lat) <- Seq((0.0, 0.0), (77.0, 28.6), (-100.0, 45.0), (140.0, -33.9), (10.0, 70.0))) {
      val (kPar, kMer) = pointScales(merc, lon, lat)
      val s = math.sin(math.toRadians(lat))
      val kClosed = math.sqrt(1.0 - 0.00669437999014133 * s * s) / math.cos(math.toRadians(lat))
      withClue(s"($lon,$lat)") {
        kPar shouldBe kClosed +- 1e-6 * kClosed
        kMer shouldBe kClosed +- 1e-6 * kClosed   // conformal: isotropic scale
      }
    }
    // lat_ts = 45 (2SP form): the standard parallel is true to scale
    val merc45 = Projections.parseCrs("+proj=merc +lat_ts=45 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
    val (kp45, km45) = pointScales(merc45, 20.0, 45.0)
    kp45 shouldBe 1.0 +- 1e-6
    km45 shouldBe 1.0 +- 1e-6
    // conformal-latitude inverse roundtrips (1e-7° — same series as the
    // polar-stereo inverse), including near the grid's 85° edge
    for ((lon, lat) <- Seq((-122.4, 37.8), (151.2, -33.9), (0.0, 84.9), (-179.5, -84.9), (45.0, 0.0))) {
      val (x, y) = merc.fromGeo(lon, lat)
      val (bl, bp) = merc.toGeo(x, y)
      withClue(s"($lon,$lat)") { bl shouldBe lon +- 1e-7; bp shouldBe lat +- 1e-7 }
    }
    // +R sphere: e = 0 collapses y to the exact spherical R·ln tan(π/4+φ/2)
    val sphMerc = Projections.parseCrs("+proj=merc +R=6371000 +lon_0=0")
    val (sx, sy) = sphMerc.fromGeo(30.0, 50.0)
    sx shouldBe 6371000.0 * math.toRadians(30.0) +- 1e-6
    sy shouldBe 6371000.0 * math.log(math.tan(math.Pi / 4.0 + math.toRadians(50.0) / 2.0)) +- 1e-6
    // legacy datum rides the generic wrap: ED50-class Mercator roundtrips
    val ed50 = Projections.parseCrs("+proj=merc +lon_0=0 +ellps=intl +towgs84=-87,-98,-121")
    val (dx, dy) = ed50.fromGeo(12.0, 45.0)
    val (dl, dp) = ed50.toGeo(dx, dy)
    dl shouldBe 12.0 +- 1e-6
    dp shouldBe 45.0 +- 1e-6
    // the EPSG:3857 sphere spelling still resolves to the named fast path,
    // and non-3857 parameters on the +a=+b sphere still fail loudly
    Projections.parseCrs("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m")
      .fromGeo(12.5, 47.3) shouldBe Projections.parseCrs("EPSG:3857").fromGeo(12.5, 47.3)
    an[Exception] should be thrownBy
      Projections.parseCrs("+proj=merc +a=6378137 +b=6378137 +lat_ts=30")
    // poles are outside the domain
    an[Exception] should be thrownBy merc.fromGeo(0.0, 90.0)
    // SQL surface
    sql1("SELECT st_y(st_geomReproject(st_makePoint(90.0, 0.0), 'EPSG:4326', " +
      "'+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84'))")
      .getDouble(0) shouldBe 0.0 +- 1e-9
  }

  test("CRS: cylindrical equal-area (EASE-Grid 2.0) and eqc — equal-area invariant, lat_ts, roundtrip") {
    import graft.geom.Projections
    val cea = Projections.parseCrs("+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m")
    // equal-area: the map Jacobian equals the ellipsoidal surface element
    // M·N·cosφ everywhere (same invariant as the sinusoidal test)
    def areaScale(crs: Projections.Crs, lon: Double, lat: Double): Double = {
      // central differences: y′ ∝ cosφ makes the forward-difference error
      // (Δφ/2)·tanφ ≈ 4e-4 at 78°, past the 1e-4 bound
      val d = 0.01
      val (x1, y1) = crs.fromGeo(lon - d / 2, lat)
      val (x2, y2) = crs.fromGeo(lon + d / 2, lat)
      val (x3, y3) = crs.fromGeo(lon, lat + d / 2)
      val (x4, y4) = crs.fromGeo(lon, lat - d / 2)
      val jac = math.abs((x2 - x1) * (y3 - y4) - (x3 - x4) * (y2 - y1)) /
        (math.toRadians(d) * math.toRadians(d))
      val s = math.sin(math.toRadians(lat))
      val w = 1.0 - 0.00669437999014133 * s * s
      val n = 6378137.0 / math.sqrt(w)
      val m = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w))
      jac / (m * n * math.cos(math.toRadians(lat)))
    }
    for ((lon, lat) <- Seq((0.0, 0.0), (77.0, 28.6), (-100.0, 45.0), (140.0, -33.9), (10.0, 78.0)))
      withClue(s"($lon,$lat)") { areaScale(cea, lon, lat) shouldBe 1.0 +- 1e-4 }
    // the standard parallel is true to scale: dx/dλ = N·cos(30°) at φ = 30
    val d = 1e-3
    val (p1, _) = cea.fromGeo(20.0, 30.0)
    val (p2, _) = cea.fromGeo(20.0 + d, 30.0)
    val s30 = math.sin(math.toRadians(30.0))
    val n30 = 6378137.0 / math.sqrt(1.0 - 0.00669437999014133 * s30 * s30)
    (p2 - p1) / (math.toRadians(d) * n30 * math.cos(math.toRadians(30.0))) shouldBe 1.0 +- 1e-9
    // hemispheric symmetry and the EASE-Grid half-height y(90°) = a·qP/(2k0)
    val (_, yN) = cea.fromGeo(0.0, 50.0)
    val (_, yS) = cea.fromGeo(0.0, -50.0)
    yN shouldBe -yS +- 1e-6   // q's log terms don't negate bit-exactly
    // authalic-latitude inverse roundtrips (1e-7°, same series as LAEA/Albers)
    for ((lon, lat) <- Seq((-122.4, 37.8), (151.2, -33.9), (0.0, 84.9), (-179.5, -84.9), (45.0, 0.0))) {
      val (x, y) = cea.fromGeo(lon, lat)
      val (bl, bp) = cea.toGeo(x, y)
      withClue(s"($lon,$lat)") { bl shouldBe lon +- 1e-7; bp shouldBe lat +- 1e-7 }
    }
    // eqc (EPSG:4087): PROJ's spherical semantics on R = a, exact both ways
    val eqc = Projections.parseCrs("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
    val (qx, qy) = eqc.fromGeo(-93.0, 45.0)
    qx shouldBe 6378137.0 * math.toRadians(-93.0) +- 1e-6
    qy shouldBe 6378137.0 * math.toRadians(45.0) +- 1e-6
    val (ql, qp) = eqc.toGeo(qx, qy)
    ql shouldBe -93.0 +- 1e-12
    qp shouldBe 45.0 +- 1e-12
    // a lat_ts-compressed eqc: x shrinks by cos(φts), y unchanged
    val eqc60 = Projections.parseCrs("+proj=eqc +lat_ts=60 +lon_0=0 +ellps=WGS84")
    val (cx, cy) = eqc60.fromGeo(-93.0, 45.0)
    cx shouldBe qx * math.cos(math.toRadians(60.0)) +- 1e-6
    cy shouldBe qy +- 1e-9
    // explicit-scale cea is rejected (parameterize via lat_ts)
    an[Exception] should be thrownBy Projections.parseCrs("+proj=cea +k_0=0.9")
    // SQL surface
    sql1("SELECT st_x(st_geomReproject(st_makePoint(-93.0, 45.0), 'EPSG:4326', " +
      "'+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84'))")
      .getDouble(0) shouldBe qx +- 1e-6
  }

  test("CRS: proj4 strings — EPSG-equivalent params, generic tmerc, rejection") {
    import graft.geom.Projections
    // proj4 spellings of the supported EPSG systems must produce the
    // exact same transform (same class, same params → bit-equal doubles)
    val pairs = Seq(
      "+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs" -> "EPSG:32633",
      "+proj=utm +zone=19 +south +ellps=WGS84" -> "EPSG:32719",
      "+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs" -> "EPSG:2154",
      "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 +ellps=GRS80 +units=m" -> "EPSG:3035",
      "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0,0,0,0,0 +units=m +no_defs" -> "EPSG:5070",
      "+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 +x_0=0 +y_0=0 +datum=WGS84 +units=m" -> "EPSG:3031",
      "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +x_0=0 +y_0=0 +datum=WGS84" -> "EPSG:3413",
      "+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 +x_0=0 +y_0=0 +k=1 +units=m" -> "EPSG:3857",
      "+proj=webmerc +datum=WGS84 +units=m +no_defs" -> "EPSG:3857",
      "+proj=longlat +datum=WGS84 +no_defs" -> "EPSG:4326")
    for ((p4, epsg) <- pairs; (lon, lat) <- Seq((12.5, 47.3), (-63.2, -33.7))) {
      withClue(s"$p4 vs $epsg @($lon,$lat)") {
        Projections.parseCrs(p4).fromGeo(lon, lat) shouldBe
          Projections.parseCrs(epsg).fromGeo(lon, lat)
      }
    }
    // utm proj4 canonicalizes to its EPSG name through SQL
    sql1("SELECT st_crsFromText('+proj=utm +zone=33 +datum=WGS84')")
      .getString(0) shouldBe "EPSG:32633"
    // a generic tmerc — national-grid parameters (OSGB-style k_0/false
    // origin, on WGS84): origin maps to the false origin, central-meridian
    // scale equals k_0, and the inverse series roundtrips
    val k0 = 0.9996012717
    val grid = Projections.parseCrs(
      s"+proj=tmerc +lat_0=49 +lon_0=-2 +k=$k0 +x_0=400000 +y_0=-100000 +ellps=WGS84")
    val (ox, oy) = grid.fromGeo(-2.0, 49.0)
    ox shouldBe 400000.0 +- 1e-6
    oy shouldBe -100000.0 +- 1e-6
    val d = 0.01
    val (x1, y1) = grid.fromGeo(-2.0, 52.0)
    val (x2, y2) = grid.fromGeo(-2.0, 52.0 + d)
    val s52 = math.sin(math.toRadians(52.0))
    val w = 1.0 - 0.00669437999014133 * s52 * s52
    val meridianRadius = 6378137.0 * (1.0 - 0.00669437999014133) / (w * math.sqrt(w))
    math.hypot(x2 - x1, y2 - y1) / (math.toRadians(d) * meridianRadius) shouldBe k0 +- 1e-6
    // 1e-7° ≈ 1 cm: the 6th-order series truncation reaches ~2 mm at
    // Cornwall's 3.7° offset from the central meridian (UTM's own spec
    // is ±3°), so the roundtrip bound is looser than the UTM tests'
    for ((lon, lat) <- Seq((-5.7, 50.07), (1.29, 52.63), (-2.0, 49.0), (-3.18, 55.95))) {
      val (x, y) = grid.fromGeo(lon, lat)
      val (bl, bp) = grid.toGeo(x, y)
      withClue(s"($lon,$lat)") { bl shouldBe lon +- 1e-7; bp shouldBe lat +- 1e-7 }
    }
    // end-to-end SQL reproject with a proj4 target equals the EPSG target
    val viaProj4 = sql1(
      """SELECT round(st_x(st_geomReproject(st_makePoint(2.3522, 48.8566), 'EPSG:4326',
        |  '+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 +x_0=700000 +y_0=6600000 +ellps=GRS80')), 3) AS x""".stripMargin).getDouble(0)
    val viaEpsg = sql1(
      """SELECT round(st_x(st_geomReproject(st_makePoint(2.3522, 48.8566), 'EPSG:4326',
        |  'EPSG:2154')), 3) AS x""".stripMargin).getDouble(0)
    viaProj4 shouldBe viaEpsg
    // loud rejection: unsupported projection, ellipsoid, prime meridian,
    // 1SP lcc, oblique stere, unknown parameter keys
    an[Exception] should be thrownBy Projections.parseCrs("+proj=igh +lon_0=0")
    an[Exception] should be thrownBy Projections.parseCrs("+proj=aea +lat_1=29.5") // aea needs both parallels
    an[Exception] should be thrownBy Projections.parseCrs("+proj=tmerc +ellps=airy")
    an[Exception] should be thrownBy Projections.parseCrs("+proj=utm +zone=33 +pm=paris")
    an[Exception] should be thrownBy Projections.parseCrs("+proj=lcc +lat_1=40 +lat_0=40")
    an[Exception] should be thrownBy Projections.parseCrs("+proj=stere +lat_0=45 +lat_ts=45")
    an[Exception] should be thrownBy Projections.parseCrs("+proj=tmerc +azi=20")
  }

  test("CRS: oblique stereographic (sterea) — EPSG RD New worked example, roundtrip, full 28992 chain") {
    import graft.geom.Projections
    import graft.geom.Projections.{Ellipsoid, Sterea}
    // EPSG guidance note 7-2 §oblique-stereographic worked example
    // (Amersfoort / RD New, Bessel): phi=53N, lam=6E (Amersfoort
    // geographic) must project to E 196105.283, N 557057.739
    val rd = Sterea(lat0 = 52.15616055555555, lon0 = 5.38763888888889,
      k0 = 0.9999079, fe = 155000.0, fn = 463000.0, name = "RD",
      ell = Ellipsoid.ByProj4Id("BESSEL"))
    val (x, y) = rd.fromGeo(6.0, 53.0)
    x shouldBe 196105.283 +- 0.01
    y shouldBe 557057.739 +- 0.01
    // projection origin maps to the false origin
    val (x0, y0) = rd.fromGeo(5.38763888888889, 52.15616055555555)
    x0 shouldBe 155000.0 +- 1e-6
    y0 shouldBe 463000.0 +- 1e-6
    // inverse closes over the Dutch window
    for ((lon, lat) <- Seq((3.3, 50.75), (7.2, 53.55), (5.4, 52.16), (6.0, 53.0))) {
      val (px, py) = rd.fromGeo(lon, lat)
      val (bl, bp) = rd.toGeo(px, py)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-9
      }
    }
    // the full named CRS (Bessel + 7-param towgs84) roundtrips WGS84 input
    val full = Projections.parseCrs("EPSG:28992")
    val (fx, fy) = full.fromGeo(5.387639, 52.156161)
    // WGS84 coordinates of the Amersfoort origin land within ~120 m of the
    // false origin (the datum shift), not on it
    math.hypot(fx - 155000.0, fy - 463000.0) should be < 200.0
    val (bl, bp) = full.toGeo(fx, fy)
    bl shouldBe 5.387639 +- 1e-6
    bp shouldBe 52.156161 +- 1e-6
    // proj4 spelling resolves to the same transform
    val p4 = Projections.parseCrs(
      "+proj=sterea +lat_0=52.15616055555555 +lon_0=5.38763888888889 " +
        "+k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel " +
        "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725")
    val (px, py) = p4.fromGeo(5.387639, 52.156161)
    px shouldBe fx +- 1e-6
    py shouldBe fy +- 1e-6
  }

  test("CRS: Krovak — EPSG worked example, axis convention, roundtrip, 5514 chain") {
    import graft.geom.Projections
    import graft.geom.Projections.{Ellipsoid, Krovak}
    // EPSG guidance note 7-2 / IOGP 373-7-2 §krovak worked example
    // (S-JTSK, Bessel): phi=50°12'32.4416"N, lam=16°50'59.1790"E of
    // Greenwich → southing X=1050538.63, westing Y=568991.00 → East-North
    // axes E=−568991.00, N=−1050538.63. (The note's final figures carry
    // ~2 cm of print-rounding: recomputing Y from its OWN published
    // intermediates r=1194731.014, θ=0.496385389 gives 568990.997, which
    // this implementation matches to 0.1 mm — every intermediate
    // A/B/γ0/t0/n/r0/U/V/T/D agrees with the note at its printed
    // precision.)
    val kr = Krovak(latC = 49.5, lonO = 24.833333333333332,
      alphaC = 30.28813972222222, latP = 78.5, kP = 0.9999,
      fe = 0.0, fn = 0.0, name = "KR", ell = Ellipsoid.ByProj4Id("BESSEL"))
    val lat = 50.0 + 12.0 / 60.0 + 32.4416 / 3600.0
    val lon = 16.0 + 50.0 / 60.0 + 59.1790 / 3600.0
    val (x, y) = kr.fromGeo(lon, lat)
    x shouldBe -568991.00 +- 0.03
    y shouldBe -1050538.63 +- 0.03
    // the intermediates-consistent figures, at implementation precision
    x shouldBe -568990.9967 +- 0.001
    y shouldBe -1050538.6465 +- 0.001
    // inverse closes over the Czech/Slovak window
    for ((lo, la) <- Seq((12.1, 50.1), (18.9, 49.2), (14.42, 50.09), (17.1, 48.15))) {
      val (px, py) = kr.fromGeo(lo, la)
      val (bl, bp) = kr.toGeo(px, py)
      withClue(s"($lo,$la)") {
        bl shouldBe lo +- 1e-9
        bp shouldBe la +- 1e-9
      }
    }
    // full 5514 chain (3-param tie) roundtrips WGS84 input; Prague lands
    // in the plausible S-JTSK quadrant (negative E/N, |E| < |N|)
    val full = Projections.parseCrs("EPSG:5514")
    val (fx, fy) = full.fromGeo(14.4208, 50.0875)
    fx should be < 0.0
    fy should be < 0.0
    fx shouldBe -743100.0 +- 500.0 // Prague city center, CUZK published grid
    fy shouldBe -1043100.0 +- 500.0
    val (bl, bp) = full.toGeo(fx, fy)
    bl shouldBe 14.4208 +- 1e-6
    bp shouldBe 50.0875 +- 1e-6
    // bare krovak without an ellipsoid is rejected (PROJ would default bessel)
    an[Exception] should be thrownBy Projections.parseCrs("+proj=krovak")
  }

  test("CRS: Helmert datum shift — EPSG worked example, exact inverse, OSGB36/NAD27 grids") {
    import graft.geom.Projections
    import graft.geom.Projections.{Ellipsoid, Helmert}
    // EPSG Guidance Note 7-2, coordinate-frame/position-vector method
    // 9606 worked example: WGS 72 → WGS 84 (EPSG transformation 1238),
    // tz = +4.5 m, rz = +0.554″, ds = +0.219 ppm
    val wgs72 = Helmert(0.0, 0.0, 4.5, 0.0, 0.0, 0.554, 0.219)
    val (xt, yt, zt) = wgs72.toWgs(3657660.66, 255768.55, 5201382.11)
    xt shouldBe 3657660.78 +- 0.015
    yt shouldBe 255778.43 +- 0.015
    zt shouldBe 5201387.75 +- 0.015
    // the inverse is the exact matrix inverse, not the negated-parameter
    // approximation: roundtrip closes to FP rounding, not to O(r·ds)
    val osgbH = Helmert(446.448, -125.157, 542.06, 0.1502, 0.247, 0.8421, -20.4894)
    val (ix, iy, iz) = osgbH.fromWgs _ tupled osgbH.toWgs(3874938.849, 116218.624, 5047168.208)
    ix shouldBe 3874938.849 +- 1e-8
    iy shouldBe 116218.624 +- 1e-8
    iz shouldBe 5047168.208 +- 1e-8
    // geodetic ↔ geocentric on a legacy ellipsoid closes to FP rounding
    val clrk66 = Ellipsoid.ByProj4Id("CLRK66")
    for ((lon, lat) <- Seq((-99.5, 31.2), (-70.1, 44.9), (179.9, -45.0), (0.0, 0.0))) {
      val (gx, gy, gz) = Projections.geodToGeoc(clrk66, lon, lat)
      val (bl, bp) = Projections.geocToGeod(clrk66, gx, gy, gz)
      withClue(s"($lon,$lat)") { bl shouldBe lon +- 1e-11; bp shouldBe lat +- 1e-11 }
    }
    // the projection leg on the legacy ellipsoid, anchored to a published
    // pair: OS "A guide to coordinate systems in Great Britain" worked
    // example (Caister water tower) — OSGB36 geodetic 52°39'27.2531"N
    // 1°43'4.5177"E → National Grid E 651409.903 N 313177.270. This is a
    // pure Airy-1830 transverse-mercator computation (no datum step), so
    // it pins Tmerc-on-a-legacy-ellipsoid at the millimeter level.
    val airy = Ellipsoid.ByProj4Id("AIRY")
    val ngAiry = Projections.Tmerc(49.0, -2.0, 0.9996012717, 400000.0, -100000.0, "osgb36ng", airy)
    val (lonC, latC) = (1.0 + 43.0 / 60 + 4.5177 / 3600, 52.0 + 39.0 / 60 + 27.2531 / 3600)
    val (e36, n36) = ngAiry.fromGeo(lonC, latC)
    e36 shouldBe 651409.903 +- 0.005
    n36 shouldBe 313177.270 +- 0.005
    // the full datum chain, anchored to the best-known public OSGB36 vs
    // WGS84 fact: the WGS84/ETRS89 longitude of the Greenwich prime
    // meridian (Airy transit circle, OSGB36 λ = 0 by definition) is
    // 0°00'05.31"W — so shifting that WGS84 point into OSGB36 must land
    // near λ = 0. Held at 1": the single national Helmert is ~0.2"-class
    // and OSGB36's realized (vs nominal) Greenwich longitude adds a few
    // tenths more — while a convention/direction error would miss by
    // 5"–10", which is what this anchor exists to catch.
    val osgb = Projections.parseCrs(
      "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 +y_0=-100000 " +
        "+ellps=airy +towgs84=446.448,-125.157,542.06,0.1502,0.247,0.8421,-20.4894")
    val (gx0, gy0) = osgb.fromGeo(-5.31 / 3600.0, 51.4779)
    val (lamOsgb, _) = ngAiry.toGeo(gx0, gy0) // grid → OSGB36 geodetic, datum-free
    (lamOsgb * 3600.0) shouldBe 0.0 +- 1.0
    // and the full-chain grid offset at Caister is the famous ~120 m
    // OSGB36-vs-GPS shift (east-positive, north-negative in East Anglia)
    val (eC, nC) = osgb.fromGeo(lonC, latC)
    (eC - e36) should (be > 80.0 and be < 180.0)
    (n36 - nC) should (be > 10.0 and be < 110.0)
    // 2D roundtrip: exact Helmert inverse + drop-h ⇒ centimeter-class
    // closure (the documented 2D-Helmert caveat), well inside 1e-5°
    for ((lon, lat) <- Seq((-5.7, 50.07), (1.29, 52.63), (-2.0, 54.0))) {
      val (x, y) = osgb.fromGeo(lon, lat)
      val (bl, bp) = osgb.toGeo(x, y)
      withClue(s"($lon,$lat)") { bl shouldBe lon +- 1e-6; bp shouldBe lat +- 1e-6 }
    }
    // NAD27 CONUS Lambert (clrk66 + the classic 3-param −8,160,176):
    // parses, shifts by a plausible datum offset, roundtrips
    val nad27 = Projections.parseCrs(
      "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 " +
        "+ellps=clrk66 +towgs84=-8,160,176")
    val wgsLcc = Projections.parseCrs(
      "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=WGS84")
    val (nx, ny) = nad27.fromGeo(-99.5, 31.2)
    val (wx, wy) = wgsLcc.fromGeo(-99.5, 31.2)
    val shift = math.hypot(nx - wx, ny - wy)
    shift should (be > 20.0 and be < 400.0)
    val (rl, rp) = nad27.toGeo(nx, ny)
    rl shouldBe -99.5 +- 1e-6
    rp shouldBe 31.2 +- 1e-6
    // ED50 UTM (intl ellipsoid, 3-param) — the shifted-UTM spelling
    val ed50 = Projections.parseCrs("+proj=utm +zone=32 +ellps=intl +towgs84=-87,-98,-121")
    val wgsUtm = Projections.parseCrs("EPSG:32632")
    val (ex, ey) = ed50.fromGeo(9.0, 48.0)
    val (ux, uy) = wgsUtm.fromGeo(9.0, 48.0)
    math.hypot(ex - ux, ey - uy) should (be > 50.0 and be < 300.0)
    // canonical names reparse to the same transform (Helmert included)
    Projections.parseCrs(nad27.name).fromGeo(-99.5, 31.2) shouldBe nad27.fromGeo(-99.5, 31.2)
    // identity tie on WGS84 stays the unwrapped base (existing behavior)
    Projections.parseCrs("+proj=utm +zone=33 +ellps=WGS84 +towgs84=0,0,0") shouldBe
      Projections.parseCrs("EPSG:32633")
    // SQL end-to-end with a legacy-datum target CRS
    val sqlShift = sql1(
      """SELECT round(st_x(st_geomReproject(st_makePoint(-99.5, 31.2), 'EPSG:4326',
        |  '+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=clrk66 +towgs84=-8,160,176')), 3) AS x""".stripMargin).getDouble(0)
    sqlShift shouldBe BigDecimal(nx).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble +- 1e-9
    // loud rejection: a legacy ellipsoid with no datum tie, bad towgs84 arity
    an[Exception] should be thrownBy Projections.parseCrs("+proj=lcc +lat_1=33 +lat_2=45 +ellps=clrk66")
    an[Exception] should be thrownBy
      Projections.parseCrs("+proj=utm +zone=10 +ellps=clrk66 +towgs84=-8,160")
  }

  test("lengthSphere sums haversine segment lengths") {
    val df = spark.sql("SELECT st_lengthSphere(st_geomFromWKT('LINESTRING (0 0, 1 0, 1 1)')) AS l")
    val expected = Sphere.haversine(0, 0, 1, 0) + Sphere.haversine(1, 0, 1, 1)
    df.head().getDouble(0) shouldBe expected +- 1e-6
  }

  test("byteArray and makeBox2D") {
    val r = sql1(
      """SELECT st_byteArray('ab') AS b,
        |       st_asText(st_makeBox2D(st_makePoint(0, 0), st_makePoint(2, 3))) AS box""".stripMargin)
    r.getAs[Array[Byte]](0) shouldBe Array[Byte](97, 98)
    r.getString(1) shouldBe "POLYGON ((0 0, 0 3, 2 3, 2 0, 0 0))"
  }

  test("st_convexHullAggr: grouped hull equals JTS hull of all members (SQL + DSL)") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val pts = Seq((0, 0.0, 0.0), (0, 4.0, 0.0), (0, 0.0, 3.0), (0, 1.0, 1.0),
                  (1, 10.0, 10.0), (1, 12.0, 10.0), (1, 10.0, 12.0))
      .toDF("grp", "x", "y")
      .withColumn("geom", graft.functions.st.makePoint(col("x"), col("y")))
    pts.createOrReplaceTempView("hull_pts")
    val bySql = spark.sql(
      "SELECT grp, st_asText(st_convexHullAggr(geom)) AS h FROM hull_pts GROUP BY grp ORDER BY grp")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    // group 0: interior point (1,1) must be absorbed into the triangle
    bySql(0) should startWith("POLYGON")
    bySql(0).contains("1 1") shouldBe false
    bySql(1) should startWith("POLYGON")
    // DSL agrees with SQL
    val byDsl = pts.groupBy("grp")
      .agg(graft.functions.st.asText(graft.functions.st.convexHullAggr(col("geom"))).as("h"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    byDsl shouldBe bySql
    // equals a local JTS hull over the same coordinates
    val gf = new org.locationtech.jts.geom.GeometryFactory()
    val local = gf.createMultiPointFromCoords(
      Array((0.0,0.0),(4.0,0.0),(0.0,3.0),(1.0,1.0)).map { case (a,b) =>
        new org.locationtech.jts.geom.Coordinate(a,b) }).convexHull()
    GeomIO.fromWKT(bySql(0)).norm().equalsExact(local.norm(), 1e-9) shouldBe true
  }

  test("deflate: TWKB roundtrip survives compression; corrupt stream rejected") {
    import graft.geom.{Deflate, TWKB}
    val g = GeomIO.fromWKT("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    val twkb = TWKB.write(g)
    val packed = Deflate.compress(twkb)
    Deflate.decompress(packed).toSeq shouldBe twkb.toSeq
    TWKB.read(Deflate.decompress(packed)).equalsExact(TWKB.read(twkb)) shouldBe true
    // compression actually helps on repetitive coordinate streams
    val many = TWKB.write(GeomIO.fromWKT(
      "LINESTRING (" + (0 to 200).map(i => s"$i 0").mkString(", ") + ")"))
    Deflate.compress(many).length should be < many.length
    an[Exception] should be thrownBy Deflate.decompress(Array[Byte](1, 2, 3))
  }

  test("partitionCentroid: deterministic, spatially local, bit-shift coarsening") {
    val r = sql1(
      """SELECT st_partitionCentroid(st_makePoint(10.0, 45.0), 8) AS a,
        |       st_partitionCentroid(st_makePoint(10.05, 45.05), 8) AS near,
        |       st_partitionCentroid(st_makePoint(-120.0, -30.0), 8) AS far,
        |       st_partitionCentroid(st_makePoint(10.0, 45.0), 8, 0) AS fine,
        |       st_partitionCentroid(st_makePoint(10.0, 45.0), 8, 4) AS coarse
        |""".stripMargin)
    val (a, near, far) = (r.getLong(0), r.getLong(1), r.getLong(2))
    a shouldBe near // ~5km apart → same zoom-8 tile bucket
    a should not be far
    // bits parameter coarsens by right shift of the interleaved tile key
    r.getLong(4) shouldBe (r.getLong(3) >> 4)
    a shouldBe (r.getLong(3) >> 8)
    // deterministic across calls
    sql1("SELECT st_partitionCentroid(st_makePoint(10.0, 45.0), 8) AS a").getLong(0) shouldBe a
  }

  test("CRS: azimuthal equidistant — true distance/azimuth from center, polar arc anchor, roundtrip") {
    import graft.geom.Projections
    val R = 6371008.8
    val aeqd = Projections.parseCrs(s"+proj=aeqd +lat_0=40 +lon_0=-100 +x_0=0 +y_0=0 +R=$R")
    // center maps to the origin
    aeqd.fromGeo(-100.0, 40.0) shouldBe ((0.0, 0.0))
    // the DEFINING property: planar distance from the center equals
    // R × the great-circle central angle, for every point and aspect
    def centralAngle(lo1: Double, la1: Double, lo2: Double, la2: Double): Double = {
      val (p1, p2) = (math.toRadians(la1), math.toRadians(la2))
      val dl = math.toRadians(lo2 - lo1)
      math.acos(math.max(-1.0, math.min(1.0,
        math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(dl))))
    }
    for ((lon, lat) <- Seq((-122.4, 37.8), (2.35, 48.85), (151.2, -33.9), (18.4, -33.9), (-100.0, -40.0), (79.9, 6.9))) {
      val (x, y) = aeqd.fromGeo(lon, lat)
      withClue(s"($lon,$lat)") {
        math.hypot(x, y) shouldBe R * centralAngle(-100.0, 40.0, lon, lat) +- 1e-6
        // roundtrip
        val (bl, bp) = aeqd.toGeo(x, y)
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-9
      }
    }
    // due-north point lands on +y, due-east on +x
    val (xn, yn) = aeqd.fromGeo(-100.0, 60.0)
    xn shouldBe 0.0 +- 1e-6
    yn shouldBe R * math.toRadians(20.0) +- 1e-6
    // the antipode is undefined and must fail loudly
    an[IllegalArgumentException] should be thrownBy aeqd.fromGeo(80.0, -40.0)
    // ellipsoidal polar aspect: distance from the pole = meridian arc;
    // pole→equator is the WGS84 quarter meridian, 10 001 965.729 m
    val polar = Projections.parseCrs("+proj=aeqd +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
    val (px, py) = polar.fromGeo(0.0, 0.0)
    px shouldBe 0.0 +- 1e-6
    -py shouldBe 1.0001965729e7 +- 1.0 // published quarter-meridian, ±1 m
    for ((lon, lat) <- Seq((45.0, 80.0), (-120.0, 55.0), (179.0, 30.0))) {
      val (x, y) = polar.fromGeo(lon, lat)
      val (bl, bp) = polar.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-7 // arc series inverse: ~mm-level
      }
    }
    // oblique ellipsoidal aspect is rejected with guidance, not guessed
    val err = intercept[IllegalArgumentException](
      Projections.parseCrs("+proj=aeqd +lat_0=40 +lon_0=-100 +ellps=WGS84"))
    err.getMessage should include("polar aspect")
    // SQL surface
    val q = sql1("SELECT st_x(st_geomReproject(st_makePoint(-100.0, 60.0), 'EPSG:4326', " +
      s"'+proj=aeqd +lat_0=40 +lon_0=-100 +R=$R'))")
    q.getDouble(0) shouldBe 0.0 +- 1e-6
  }

  test("CRS: Robinson — knot exactness, world-frame anchors, monotone interpolant, roundtrip") {
    import graft.geom.Projections
    import Projections.RobinsonTable
    val robin = Projections.parseCrs("+proj=robin +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
    val R = 6378137.0
    // at every 5° knot the projection reproduces the published Robinson
    // table EXACTLY (the interpolant passes through the knots)
    for (i <- 0 to 18) {
      val lat = 5.0 * i
      val (x, y) = robin.fromGeo(100.0, lat)
      withClue(s"lat=$lat") {
        x shouldBe RobinsonTable.Fxc * R * RobinsonTable.X(i) * math.toRadians(100.0) +- 1e-6
        y shouldBe RobinsonTable.Fyc * R * RobinsonTable.Y(i) +- 1e-6
      }
    }
    // world-frame anchors: the map is ~0.8487·π·R wide at the equator
    // and ±1.3523·R·1.0 tall at the poles; south is the mirror of north
    robin.fromGeo(180.0, 0.0)._1 shouldBe RobinsonTable.Fxc * R * math.Pi +- 1e-6
    robin.fromGeo(0.0, 90.0)._2 shouldBe RobinsonTable.Fyc * R +- 1e-6
    robin.fromGeo(30.0, -47.3)._2 shouldBe -robin.fromGeo(30.0, 47.3)._2 +- 1e-9
    // y is strictly monotone in latitude (no spline overshoot)
    val ys = (0 to 900).map(i => robin.fromGeo(0.0, i / 10.0)._2)
    ys.zip(ys.tail).foreach { case (a, b) => a should be < b }
    // parallels stay straight horizontal lines (y independent of λ)
    robin.fromGeo(-160.0, 37.3)._2 shouldBe robin.fromGeo(85.0, 37.3)._2 +- 1e-9
    // roundtrip on off-knot latitudes
    for ((lon, lat) <- Seq((-122.4, 37.8), (151.2, -33.9), (179.0, 88.6), (-179.0, -2.1), (13.4, 52.52))) {
      val (x, y) = robin.fromGeo(lon, lat)
      val (bl, bp) = robin.toGeo(x, y)
      withClue(s"($lon,$lat)") {
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-9
      }
    }
    // SQL surface
    val q = sql1("SELECT st_y(st_geomReproject(st_makePoint(0.0, 45.0), 'EPSG:4326', " +
      "'+proj=robin +lon_0=0'))")
    q.getDouble(0) shouldBe robin.fromGeo(0.0, 45.0)._2 +- 1e-6
  }

  test("CRS: geostationary (geos) — ECEF scan-angle cross-check, sweep axes, limb, roundtrip") {
    import graft.geom.Projections
    val h = 35785831.0
    val msg = Projections.parseCrs(s"+proj=geos +h=$h +lon_0=0 +sweep=y +ellps=WGS84") // Meteosat
    val goes = Projections.parseCrs(s"+proj=geos +h=$h +lon_0=0 +sweep=x +ellps=WGS84")
    // sub-satellite point is the origin
    msg.fromGeo(0.0, 0.0) shouldBe ((0.0, 0.0))
    // independent cross-check: compute the ground point's ECEF via the
    // prime-vertical radius N(φ) (a DIFFERENT parametrization than the
    // implementation's geocentric-radius form) and re-derive the scan
    // angles from the satellite→point vector directly
    val a = 6378137.0
    val e2 = {
      val f = 1.0 / 298.257223563; f * (2.0 - f)
    }
    def ecef(lon: Double, lat: Double): (Double, Double, Double) = {
      val (la, lo) = (math.toRadians(lat), math.toRadians(lon))
      val n = a / math.sqrt(1.0 - e2 * math.sin(la) * math.sin(la))
      (n * math.cos(la) * math.cos(lo), n * math.cos(la) * math.sin(lo),
        n * (1.0 - e2) * math.sin(la))
    }
    for ((lon, lat) <- Seq((10.0, 0.0), (0.0, 35.0), (-40.0, 20.0), (45.0, -50.0), (55.0, 55.0))) {
      val (px, py, pz) = ecef(lon, lat)
      val along = (a + h) - px // satellite at (a+h, 0, 0), lon_0 = 0
      val expSweepY = (h * math.atan(py / along), h * math.atan(pz / math.hypot(py, along)))
      val expSweepX = (h * math.atan(py / math.hypot(pz, along)), h * math.atan(pz / along))
      val (mx, my) = msg.fromGeo(lon, lat)
      val (gx, gy) = goes.fromGeo(lon, lat)
      withClue(s"($lon,$lat)") {
        mx shouldBe expSweepY._1 +- 1e-4 // 0.1 mm: two ellipsoid parametrizations
        my shouldBe expSweepY._2 +- 1e-4
        gx shouldBe expSweepX._1 +- 1e-4
        gy shouldBe expSweepX._2 +- 1e-4
        // roundtrip both sweeps
        val (bl, bp) = msg.toGeo(mx, my)
        bl shouldBe lon +- 1e-9
        bp shouldBe lat +- 1e-9
        val (cl, cp) = goes.toGeo(gx, gy)
        cl shouldBe lon +- 1e-9
        cp shouldBe lat +- 1e-9
      }
    }
    // on the axes the two sweep conventions agree
    msg.fromGeo(12.0, 0.0) shouldBe goes.fromGeo(12.0, 0.0)
    msg.fromGeo(0.0, 33.0)._2 shouldBe goes.fromGeo(0.0, 33.0)._2 +- 1e-9
    // behind the limb → loud failure (90° away is never visible)
    an[IllegalArgumentException] should be thrownBy msg.fromGeo(90.0, 0.0)
    // scan angles that miss the disk → loud failure on the inverse
    an[IllegalArgumentException] should be thrownBy msg.toGeo(h, h)
    // +h is required
    an[IllegalArgumentException] should be thrownBy
      Projections.parseCrs("+proj=geos +lon_0=0 +ellps=WGS84")
    // SQL surface
    val q = sql1("SELECT st_x(st_geomReproject(st_makePoint(10.0, 0.0), 'EPSG:4326', " +
      s"'+proj=geos +h=$h +lon_0=0 +sweep=y +ellps=WGS84'))")
    q.getDouble(0) shouldBe msg.fromGeo(10.0, 0.0)._1 +- 1e-6
  }
}
