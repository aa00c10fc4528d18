package graft.geom

import graft.functions.TopNRowsBuffer
import org.locationtech.jts.geom.{Coordinate, GeometryFactory}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import scala.util.Random

/** Randomized invariants over the codec and index primitives —
  * deterministic seeds, a few hundred cases per property, checking the
  * algebraic laws the engine relies on rather than single examples.
  */
class PropertiesSpec extends AnyFunSuite with Matchers {

  private val gf = new GeometryFactory()
  private def rng = new Random(0xC0FFEE)

  test("Z2: split/combine are inverse; index decomposes into its inputs") {
    val r = rng
    (1 to 500).foreach { _ =>
      val x = r.nextInt(1 << 30)
      val y = r.nextInt(1 << 30)
      Z2.combine(Z2.split(x.toLong)) shouldBe x
      val z = Z2.index(x, y)
      Z2.xOf(z) shouldBe x
      Z2.yOf(z) shouldBe y
    }
  }

  test("Z2: key ranges of nested envelopes nest") {
    val r = rng
    (1 to 200).foreach { _ =>
      val lon = r.nextDouble() * 340 - 170
      val lat = r.nextDouble() * 160 - 80
      val (wLo, wHi) = Z2.indexRange(gf.toGeometry(
        new org.locationtech.jts.geom.Envelope(lon - 1, lon + 1, lat - 1, lat + 1)))
      val (nLo, nHi) = Z2.indexRange(gf.toGeometry(
        new org.locationtech.jts.geom.Envelope(lon - 0.1, lon + 0.1, lat - 0.1, lat + 0.1)))
      nLo should be >= wLo
      nHi should be <= wHi
    }
  }

  test("GeoHash: cell of encode(p) contains p at every precision 5..40") {
    val r = rng
    (1 to 100).foreach { _ =>
      val lon = r.nextDouble() * 360 - 180
      val lat = r.nextDouble() * 180 - 90
      (5 to 40 by 5).foreach { bits =>
        val h = GeoHash.encode(lon, lat, bits)
        val env = GeoHash.decodeEnvelope(h, bits)
        withClue(s"($lon,$lat)@$bits→$h env=$env") {
          env.getMinX should be <= lon
          env.getMaxX should be >= lon
          env.getMinY should be <= lat
          env.getMaxY should be >= lat
        }
      }
    }
  }

  test("TWKB: random linestrings roundtrip within the quantization step") {
    val r = rng
    (1 to 100).foreach { _ =>
      val n = 2 + r.nextInt(20)
      val coords = Array.fill(n)(new Coordinate(
        math.rint((r.nextDouble() * 360 - 180) * 1e6) / 1e6,
        math.rint((r.nextDouble() * 180 - 90) * 1e6) / 1e6))
      val g = gf.createLineString(coords)
      val back = TWKB.read(TWKB.write(g, 6))
      back.getNumPoints shouldBe n
      back.getCoordinates.zip(coords).foreach { case (a, b) =>
        a.x shouldBe b.x +- 5e-7
        a.y shouldBe b.y +- 5e-7
      }
    }
  }

  test("WKB: exact roundtrip for random multipoints") {
    val r = rng
    (1 to 100).foreach { _ =>
      val n = 1 + r.nextInt(10)
      val g = gf.createMultiPointFromCoords(Array.fill(n)(
        new Coordinate(r.nextDouble() * 360 - 180, r.nextDouble() * 180 - 90)))
      GeomIO.fromWKB(GeomIO.toWKB(g)).equalsExact(g) shouldBe true
    }
  }

  test("Deflate: roundtrip arbitrary byte blobs of any size") {
    val r = rng
    (0 to 50).foreach { i =>
      val bytes = new Array[Byte](i * 37 % 2048)
      r.nextBytes(bytes)
      Deflate.decompress(Deflate.compress(bytes)).toSeq shouldBe bytes.toSeq
    }
  }

  test("projections: randomized roundtrip within each family's domain") {
    val r = rng
    val families: Seq[(String, Projections.Crs, () => (Double, Double), Double)] = Seq(
      // (name, crs, point generator inside the domain, tolerance in degrees)
      ("aeqd-sphere",
        Projections.parseCrs("+proj=aeqd +lat_0=40 +lon_0=-100 +R=6371008.8"),
        // anywhere except a 5° antipode margin
        () => {
          var p = (r.nextDouble() * 360 - 180, r.nextDouble() * 170 - 85)
          while (math.abs(p._1 - 80.0) < 5 && math.abs(p._2 + 40.0) < 5)
            p = (r.nextDouble() * 360 - 180, r.nextDouble() * 170 - 85)
          p
        }, 1e-9),
      ("aeqd-polar",
        Projections.parseCrs("+proj=aeqd +lat_0=90 +lon_0=0 +ellps=WGS84"),
        () => (r.nextDouble() * 360 - 180, r.nextDouble() * 80 + 5), 1e-6),
      ("robinson",
        Projections.parseCrs("+proj=robin +lon_0=0 +ellps=WGS84"),
        () => (r.nextDouble() * 360 - 180, r.nextDouble() * 178 - 89), 1e-9),
      ("geos-sweep-y",
        Projections.parseCrs("+proj=geos +h=35785831 +lon_0=0 +sweep=y +ellps=WGS84"),
        () => (r.nextDouble() * 110 - 55, r.nextDouble() * 110 - 55), 1e-9),
      ("geos-sweep-x",
        Projections.parseCrs("+proj=geos +h=35785831 +lon_0=0 +sweep=x +ellps=WGS84"),
        () => (r.nextDouble() * 110 - 55, r.nextDouble() * 110 - 55), 1e-9))
    for ((name, crs, gen, tol) <- families; _ <- 1 to 300) {
      val (lon, lat) = gen()
      val (x, y) = crs.fromGeo(lon, lat)
      val (bl, bp) = crs.toGeo(x, y)
      withClue(s"$name ($lon,$lat)→($x,$y)→($bl,$bp)") {
        bl shouldBe lon +- tol
        bp shouldBe lat +- tol
      }
    }
  }

  test("EPSG registry: codes resolve BY CODE onto the same transform as their proj4 spelling") {
    // every registered code must (a) parse, (b) equal its proj4-string
    // parse, (c) roundtrip a point in its rough service area
    val anchors = Map( // code → (lon, lat) inside the grid's domain
      25832 -> (9.5, 50.0), 26910 -> (-122.0, 45.0), 26717 -> (-79.0, 43.0),
      23032 -> (8.0, 45.0), 28355 -> (147.0, -37.0), 7855 -> (147.0, -37.0),
      31467 -> (9.0, 50.0), 27700 -> (-1.5, 52.0), 2157 -> (-7.5, 53.2),
      2180 -> (19.5, 52.0), 2193 -> (174.0, -41.0), 6677 -> (139.7, 35.7),
      3067 -> (25.0, 62.0), 3034 -> (10.0, 50.0), 3347 -> (-95.0, 55.0),
      5243 -> (10.0, 51.0), 31370 -> (4.5, 50.8), 3575 -> (20.0, 70.0),
      6931 -> (0.0, 75.0), 6932 -> (0.0, -75.0), 6933 -> (10.0, 40.0),
      3976 -> (0.0, -75.0), 3995 -> (30.0, 75.0), 3577 -> (134.0, -25.0),
      3310 -> (-120.5, 37.0), 3978 -> (-95.5, 55.0), 6622 -> (-70.0, 50.0),
      32198 -> (-70.0, 50.0),
      3573 -> (-100.0, 70.0), 3574 -> (-40.0, 70.0),
      3395 -> (10.0, 40.0), 4087 -> (10.0, 40.0), 4258 -> (10.0, 50.0),
      4269 -> (-95.0, 45.0), 4267 -> (-95.0, 45.0), 4277 -> (-1.5, 52.0),
      2229 -> (-118.5, 34.5), 2263 -> (-73.5, 40.8), 2277 -> (-98.0, 30.5),
      2248 -> (-77.2, 39.0), 2249 -> (-71.1, 42.3), 3435 -> (-88.2, 40.0),
      32181 -> (-53.5, 47.5), 32188 -> (-73.6, 45.5), 32190 -> (-79.4, 43.7),
      32197 -> (-95.0, 49.8),
      2257 -> (-104.0, 33.0), 2260 -> (-74.3, 42.0), 3006 -> (15.5, 60.0),
      3765 -> (16.3, 45.5), 31287 -> (13.3, 47.5),
      // r13: NAD27 State Plane (Clarke 1866 + 3-param tie + ftUS)
      26745 -> (-118.5, 34.5), 32039 -> (-98.0, 30.5),
      26771 -> (-88.2, 40.0), 26786 -> (-71.1, 42.3), 32012 -> (-104.0, 33.0),
      // r12b: Japan zones I/V/X/XV/XIX, Korea, SIRGAS UTM, SVY21, ISN93
      6669 -> (129.8, 33.2), 6673 -> (134.2, 35.5), 6678 -> (141.0, 40.5),
      6683 -> (127.7, 26.2), 6687 -> (154.1, 26.1),
      // r15: the JGD2000 twins of the JGD2011 zones above
      2443 -> (129.8, 33.2), 2447 -> (134.2, 35.5), 2452 -> (141.0, 40.5),
      2457 -> (127.7, 26.2), 2461 -> (154.1, 26.1),
      5179 -> (127.0, 37.5), 5186 -> (127.2, 37.5), 5188 -> (130.9, 37.5),
      31965 -> (-117.0, 33.0), 31983 -> (-46.6, -23.5), 31985 -> (-33.5, -5.0),
      3414 -> (103.85, 1.3), 3057 -> (-19.0, 64.9),
      // r15: CGCS2000 Gauss-Krüger — 6° zones 13/19/23, 3° zones
      // 25/40/45, and the geographic CRS
      4491 -> (75.5, 40.0), 4497 -> (111.5, 35.0), 4501 -> (133.0, 46.0),
      4513 -> (75.3, 39.0), 4528 -> (120.3, 31.0), 4533 -> (134.5, 46.0),
      4490 -> (110.0, 35.0),
      // r15b: CGCS2000 CM (no-prefix) twins; Pulkovo 1942 GK zones
      // 7 (Moscow), 18 (Irkutsk), 30 (Chukotka — the last belt before
      // the antimeridian wrap)
      4507 -> (105.5, 35.0), 4544 -> (105.3, 35.0),
      28407 -> (37.6, 55.75), 28418 -> (104.5, 52.3), 28430 -> (176.5, 64.0))
    for (code <- Projections.registeredEpsgCodes) {
      val byCode = Projections.parseCrs(s"EPSG:$code")
      val bare = Projections.parseCrs(code.toString)
      bare shouldBe byCode
      anchors.get(code).foreach { case (lon, lat) =>
        val (x, y) = byCode.fromGeo(lon, lat)
        val (bl, bp) = byCode.toGeo(x, y)
        withClue(s"EPSG:$code roundtrip ($lon,$lat)→($x,$y)") {
          bl shouldBe lon +- 1e-6
          bp shouldBe lat +- 1e-6
        }
      }
    }
    // known projected anchors: central-meridian/origin identities that
    // hold exactly in the published grid definitions
    val (e32, n32) = Projections.parseCrs("EPSG:25832").fromGeo(9.0, 0.0)
    e32 shouldBe 500000.0 +- 1e-4 // UTM 32N false easting at its meridian
    n32 shouldBe 0.0 +- 1e-4
    // r15: CGCS2000 Gauss-Krüger — the ZONE-PREFIXED false easting is
    // the family's signature, so pin it at the central meridian for
    // one zone of each family (6° zone 20, CM 117; 3° zone 39, CM 117):
    // a pure roundtrip is self-consistent under any prefix and could
    // not catch a wrong one (the r12 Quebec lesson)
    val (eGk6, nGk6) = Projections.parseCrs("EPSG:4498").fromGeo(117.0, 0.0)
    eGk6 shouldBe 20500000.0 +- 1e-4 // zone 20 prefix + 500 km
    nGk6 shouldBe 0.0 +- 1e-4
    val (eGk3, _) = Projections.parseCrs("EPSG:4527").fromGeo(117.0, 0.0)
    eGk3 shouldBe 39500000.0 +- 1e-4 // 3° zone 39 prefix + 500 km
    // r15b: the CM (no-prefix) twin of zone 18 is the same projection
    // at FE 500 km — same point, eastings exactly 18·10⁶ apart
    val (eCm, nCm) = Projections.parseCrs("EPSG:4507").fromGeo(105.0, 0.0)
    eCm shouldBe 500000.0 +- 1e-4
    nCm shouldBe 0.0 +- 1e-4
    val (eZp, _) = Projections.parseCrs("EPSG:4496").fromGeo(105.0, 0.0)
    eZp - eCm shouldBe 18000000.0 +- 1e-4
    // Pulkovo 1942 GK zone 7: FE pinned on the identity-tie spelling
    // (longitude survives a zero-translation ellipsoid swap; the real
    // 7-param tie moves the meridian, so the registered code itself is
    // pinned by roundtrip + the anchors above, not by FE)
    val pk7 = Projections.parseCrs(
      "+proj=tmerc +lat_0=0 +lon_0=39 +k=1 +x_0=7500000 +y_0=0 " +
        "+ellps=krass +towgs84=0,0,0")
    val (ePk, _) = pk7.fromGeo(39.0, 55.0)
    ePk shouldBe 7500000.0 +- 1e-4
    val (eNz, nNz) = Projections.parseCrs("EPSG:2193").fromGeo(173.0, 0.0)
    eNz shouldBe 1600000.0 +- 1e-4 // NZTM origin
    nNz shouldBe 10000000.0 +- 1e-4
    val (eAr, nAr) = Projections.parseCrs("EPSG:3995").fromGeo(0.0, 90.0)
    eAr shouldBe 0.0 +- 1e-6 // the pole maps to the origin
    nAr shouldBe 0.0 +- 1e-6
    // r11 additions: grid-origin identities from the published defs
    val (eCal, nCal) = Projections.parseCrs("EPSG:3310").fromGeo(-120.0, 0.0)
    eCal shouldBe 0.0 +- 1e-4 // CA Albers: λ₀ at φ₀ = (0, FN)
    nCal shouldBe -4000000.0 +- 1e-4
    val (eCan, nCan) = Projections.parseCrs("EPSG:3978").fromGeo(-95.0, 49.0)
    eCan shouldBe 0.0 +- 1e-4 // Canada Atlas Lambert origin
    nCan shouldBe 0.0 +- 1e-4
    // Quebec Lambert (r12 fix): the published definition (conversion
    // 19944, shared by 32198 and 6622) has FE = 800,000 m — a
    // PINNED-coordinate check, because a pure round-trip is
    // self-consistent under ANY false easting and cannot catch it
    val (eQc, nQc) = Projections.parseCrs("EPSG:6622").fromGeo(-68.5, 44.0)
    eQc shouldBe 800000.0 +- 1e-4 // grid origin maps to (FE, FN)
    nQc shouldBe 0.0 +- 1e-4
    // r13 NAD27 zones, FE pinned at the central meridian: longitude is
    // invariant under a zero-translation ellipsoid swap (geocentric
    // atan2(y,x) ignores the ellipsoid), so easting at lon_0 is exactly
    // the false easting even though the identity-tie WGS84->clrk66 hop
    // moves LATITUDE ~200 m (same geocentric point, different
    // ellipsoid) — which is why only the easting is pinned; a pure
    // round-trip could not catch a wrong FE (the r12 Quebec lesson). Eastings are in ftUS — the published round values.
    val ca27 = Projections.parseCrs(
      "+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 " +
        "+lat_0=33.5 +lon_0=-118 +x_0=609601.2192024384 +y_0=0 " +
        "+ellps=clrk66 +towgs84=0,0,0 +units=us-ft")
    val (eCa27, _) = ca27.fromGeo(-118.0, 33.5)
    eCa27 shouldBe 2000000.0 +- 1e-3 // NAD27 CA5 FE in ftUS
    val il27 = Projections.parseCrs(
      "+proj=tmerc +lat_0=36.66666666666666 +lon_0=-88.33333333333333 " +
        "+k=0.999975 +x_0=152400.3048006096 +y_0=0 " +
        "+ellps=clrk66 +towgs84=0,0,0 +units=us-ft")
    val (eIl27, _) = il27.fromGeo(-88.33333333333333, 40.0)
    eIl27 shouldBe 500000.0 +- 1e-3 // NAD27 IL East FE in ftUS
    Projections.parseCrs("EPSG:32198").fromGeo(-70.0, 50.0) shouldBe
      Projections.parseCrs("EPSG:6622").fromGeo(-70.0, 50.0)
    // JGD2000 zone IX must equal its JGD2011 twin exactly (both null
    // ties on GRS80 — the sp_jprcs twin-range pin, spot-checked here)
    Projections.parseCrs("EPSG:2451").fromGeo(139.7, 35.7) shouldBe
      Projections.parseCrs("EPSG:6677").fromGeo(139.7, 35.7)
    val (eLaea, nLaea) = Projections.parseCrs("EPSG:3573").fromGeo(-100.0, 90.0)
    eLaea shouldBe 0.0 +- 1e-6 // Arctic LAEA Canada: the pole is the origin
    nLaea shouldBe 0.0 +- 1e-6
    // ftUS zones (r11): the grid origin maps to the false origin
    // expressed in US survey feet — meter false origin / (1200/3937)
    val usFt = 1200.0 / 3937.0
    val (eCa, nCa) = Projections.parseCrs("EPSG:2229").fromGeo(-118.0, 33.5)
    eCa shouldBe 2000000.0001016 / usFt +- 1e-3
    nCa shouldBe 500000.0001016002 / usFt +- 1e-3
    // and the ftUS twin is exactly the meter zone scaled by the foot
    val (eM, nM) = Projections.parseCrs("EPSG:26945").fromGeo(-119.3, 34.6)
    val (eF, nF) = Projections.parseCrs("EPSG:2229").fromGeo(-119.3, 34.6)
    eF shouldBe (eM - 2000000.0 + 2000000.0001016) / usFt +- 1e-6
    nF shouldBe (nM - 500000.0 + 500000.0001016002) / usFt +- 1e-6
    // r11 twins: Maryland 2248 vs 26985, Illinois East 3435 vs 26971
    // (IL's published 984,250 ftUS FE is EXACTLY 300,000 m, so its twin
    // is the pure scaling with no false-origin residual)
    val (eMd, nMd) = Projections.parseCrs("EPSG:26985").fromGeo(-77.2, 39.0)
    val (eMdF, nMdF) = Projections.parseCrs("EPSG:2248").fromGeo(-77.2, 39.0)
    eMdF shouldBe (eMd - 400000.0 + 399999.9998983998) / usFt +- 1e-6
    nMdF shouldBe nMd / usFt +- 1e-6
    val (eIl, nIl) = Projections.parseCrs("EPSG:26971").fromGeo(-88.2, 40.0)
    val (eIlF, nIlF) = Projections.parseCrs("EPSG:3435").fromGeo(-88.2, 40.0)
    eIlF shouldBe eIl / usFt +- 1e-6
    nIlF shouldBe nIl / usFt +- 1e-6
    // r12 additions: pinned grid-origin identities (the 6622 lesson —
    // round-trips are FE/FN-blind, origins are not)
    val (eSw, nSw) = Projections.parseCrs("EPSG:3006").fromGeo(15.0, 0.0)
    eSw shouldBe 500000.0 +- 1e-4 // SWEREF99 TM ≡ UTM 33N grid on GRS80
    nSw shouldBe 0.0 +- 1e-4
    val (eHr, nHr) = Projections.parseCrs("EPSG:3765").fromGeo(16.5, 0.0)
    eHr shouldBe 500000.0 +- 1e-4 // Croatia TM origin
    nHr shouldBe 0.0 +- 1e-4
    // Austria Lambert: the grid-origin identity (λ₀,φ₀) → (FE, FN)
    // holds for ANY ellipsoid, so pin the LCC false-origin arithmetic
    // datum-free on GRS80 — the registered 31287 adds the Bessel
    // ellipsoid + published 7-param MGI shift on top (WGS84 input at
    // the origin lands ~60 m off BY DESIGN; the roundtrip anchor above
    // exercises that full path)
    val (eAt, nAt) = Projections.parseCrs(
      "+proj=lcc +lat_1=49 +lat_2=46 +lat_0=47.5 " +
        "+lon_0=13.33333333333333 +x_0=400000 +y_0=400000 " +
        "+ellps=GRS80 +towgs84=0,0,0")
      .fromGeo(13.33333333333333, 47.5)
    eAt shouldBe 400000.0 +- 1e-3 // Austria Lambert false origin
    nAt shouldBe 400000.0 +- 1e-3
    // the r12 ftUS twins are EXACT unit scalings of their meter zones
    // (published FEs are exact meter values — see the registry note)
    val (eNm, nNm) = Projections.parseCrs("EPSG:32112").fromGeo(-104.0, 33.0)
    val (eNmF, nNmF) = Projections.parseCrs("EPSG:2257").fromGeo(-104.0, 33.0)
    eNmF shouldBe eNm / usFt +- 1e-6
    nNmF shouldBe nNm / usFt +- 1e-6
    val (eNy, nNy) = Projections.parseCrs("EPSG:32115").fromGeo(-74.3, 42.0)
    val (eNyF, nNyF) = Projections.parseCrs("EPSG:2260").fromGeo(-74.3, 42.0)
    eNyF shouldBe eNy / usFt +- 1e-6
    nNyF shouldBe nNy / usFt +- 1e-6
    // Canadian MTM (r11): the central meridian maps to the exact
    // 1,000,000-ft false easting, and zone 8 == its proj4 spelling on
    // a Montreal-area point (the family case vs the string parser)
    val (eMtm, nMtm) = Projections.parseCrs("EPSG:32188").fromGeo(-73.5, 0.0)
    eMtm shouldBe 304800.0 +- 1e-4
    nMtm shouldBe 0.0 +- 1e-4
    Projections.parseCrs("EPSG:32188").fromGeo(-73.6, 45.5) shouldBe
      Projections.parseCrs("+proj=tmerc +lat_0=0 +lon_0=-73.5 +k=0.9999 " +
        "+x_0=304800 +y_0=0 +ellps=GRS80 +towgs84=0,0,0").fromGeo(-73.6, 45.5)
    // r12b additions — pinned grid-origin identities (FE/FN-sighted):
    // Japan Plane Rectangular CS: zero false origin at each zone origin
    val (eJp, nJp) = Projections.parseCrs("EPSG:6683").fromGeo(127.5, 26.0)
    eJp shouldBe 0.0 +- 1e-4 // zone XV (Okinawa) origin
    nJp shouldBe 0.0 +- 1e-4
    // and zone IX resolves identically to its published proj4 spelling
    Projections.parseCrs("EPSG:6677").fromGeo(139.7, 35.7) shouldBe
      Projections.parseCrs("+proj=tmerc +lat_0=36 +lon_0=139.8333333333333 " +
        "+k=0.9999 +x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0").fromGeo(139.7, 35.7)
    // Korea 2000 Unified CS: (127.5, 38) → (FE 1,000,000, FN 2,000,000)
    val (eKr, nKr) = Projections.parseCrs("EPSG:5179").fromGeo(127.5, 38.0)
    eKr shouldBe 1000000.0 +- 1e-4
    nKr shouldBe 2000000.0 +- 1e-4
    // Korea 2010 belts: each belt origin → (200,000, 600,000)
    val (eKc, nKc) = Projections.parseCrs("EPSG:5186").fromGeo(127.0, 38.0)
    eKc shouldBe 200000.0 +- 1e-4
    nKc shouldBe 600000.0 +- 1e-4
    val (eKe, nKe) = Projections.parseCrs("EPSG:5188").fromGeo(131.0, 38.0)
    eKe shouldBe 200000.0 +- 1e-4
    nKe shouldBe 600000.0 +- 1e-4
    // SIRGAS 2000 UTM: the zone mapping is the published series
    // (31965 = 11N, 31977 = 17S, 31983 = 23S — São Paulo's grid)
    Projections.parseCrs("EPSG:31965") shouldBe
      Projections.parseCrs("+proj=utm +zone=11 +ellps=GRS80 +towgs84=0,0,0")
    Projections.parseCrs("EPSG:31977") shouldBe
      Projections.parseCrs("+proj=utm +zone=17 +south +ellps=GRS80 +towgs84=0,0,0")
    val (eBr, nBr) = Projections.parseCrs("EPSG:31983").fromGeo(-45.0, 0.0)
    eBr shouldBe 500000.0 +- 1e-4 // UTM 23S: CM at the equator
    nBr shouldBe 10000000.0 +- 1e-4
    // SVY21: the published non-round false origin at the Singapore base
    val (eSg, nSg) = Projections.parseCrs("EPSG:3414")
      .fromGeo(103.8333333333333, 1.366666666666667)
    eSg shouldBe 28001.642 +- 1e-3
    nSg shouldBe 38744.572 +- 1e-3
    // ISN93 Lambert: (−19, 65) → (500,000, 500,000)
    val (eIs, nIs) = Projections.parseCrs("EPSG:3057").fromGeo(-19.0, 65.0)
    eIs shouldBe 500000.0 +- 1e-4
    nIs shouldBe 500000.0 +- 1e-4
    // unknown codes keep the loud unsupported-CRS error
    intercept[IllegalArgumentException] {
      Projections.parseCrs("EPSG:2230") // CA zone 6 (ftUS) — not registered
    }.getMessage should include("Unsupported CRS")
  }

  test("aeqd sphere: planar distance from center IS great-circle distance, everywhere") {
    val r = rng
    val R = 6371008.8
    val crs = Projections.parseCrs(s"+proj=aeqd +lat_0=23 +lon_0=57 +R=$R")
    (1 to 300).foreach { _ =>
      val lon = r.nextDouble() * 360 - 180
      val lat = r.nextDouble() * 178 - 89
      val (x, y) = crs.fromGeo(lon, lat)
      val (p1, p2) = (math.toRadians(23.0), math.toRadians(lat))
      val c = math.acos(math.max(-1.0, math.min(1.0,
        math.sin(p1) * math.sin(p2) +
          math.cos(p1) * math.cos(p2) * math.cos(math.toRadians(lon - 57.0)))))
      withClue(s"($lon,$lat)") { math.hypot(x, y) shouldBe R * c +- 1e-5 }
    }
  }

  test("TopKBuffer: equals reference sort under random inserts, merges and NaN-free input") {
    val r = rng
    (1 to 100).foreach { _ =>
      val k = 1 + r.nextInt(8)
      val n = r.nextInt(60)
      val items = Seq.fill(n)((r.nextLong() % 1000, math.rint(r.nextDouble() * 10) / 10))
      val expected = items.distinct
        .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)).take(k)
      // two partial buffers merged, mimicking map-side partials
      val none = TopNRowsBuffer.NoPayload
      val (left, right) = items.distinct.splitAt(items.distinct.size / 2)
      val bufA = new TopNRowsBuffer(k); left.foreach { case (id, s) => bufA.add(id, s, none) }
      val bufB = new TopNRowsBuffer(k); right.foreach { case (id, s) => bufB.add(id, s, none) }
      var i = 0
      while (i < bufB.size) { bufA.add(bufB.idAt(i), bufB.scoreAt(i), none); i += 1 }
      bufA.sorted.map(t => (t._1, t._2)).toSeq shouldBe expected.map { case (id, s) => (id, s) }
    }
  }
}
