package graft.geom

import org.locationtech.jts.geom.{Coordinate, CoordinateFilter, Geometry}

/** CRS handling without a projection library on the classpath: the CRSs
  * the surface needs — EPSG:4326 lon/lat, EPSG:3857 web mercator, the
  * 120 WGS84 UTM zones (EPSG:32601–32660 north, 32701–32760 south), and
  * the two polar stereographic systems that cover the latitudes UTM
  * leaves (EPSG:3031 Antarctic, EPSG:3413 NSIDC Arctic) — are
  * implemented from public formulas (spherical web-mercator; the
  * transverse-mercator series from Snyder, "Map Projections: A Working
  * Manual", USGS Professional Paper 1395, 1987, pp. 61–63; the
  * ellipsoidal polar stereographic from Snyder pp. 160–162, eqs. 21-33..36
  * and the 3-5 inverse series).
  * Mirrors the reference's st_crsFromText / st_geomReproject surface
  * (spatial-index/src/main/scala/com/azavea/hiveless/spatial/index/ST_GeomReproject.scala:1)
  * with an explicitly-supported CRS set instead of a proj4 dependency;
  * proj4 parameter strings for the implemented families (longlat, merc
  * sphere, utm, tmerc, lcc 2SP, laea, aea 2SP, polar stere — see
  * [[parseProj4]])
  * are parsed onto the same transforms, so arbitrary national grids in
  * those families work without their EPSG code being listed — including
  * legacy-datum grids (NAD27/OSGB36/ED50-class) via `+ellps=` +
  * `+towgs84=` 7-parameter Helmert ties ([[Helmert]], [[DatumShifted]]);
  * anything else fails loudly with the supported list.
  */
object Projections {

  /** Web-mercator sphere radius (meters), per the EPSG:3857 definition. */
  val R: Double = 6378137.0
  val MaxLat: Double = 85.05112877980659

  // WGS84 ellipsoid + transverse-mercator constants (public values)
  private val A = 6378137.0                  // semi-major axis
  private val F = 1.0 / 298.257223563        // flattening
  private val E2 = F * (2.0 - F)             // first eccentricity²
  private val Ep2 = E2 / (1.0 - E2)          // second eccentricity²
  private val K0 = 0.9996                    // UTM scale factor
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  /** Reference ellipsoid (semi-major axis + flattening). The projection
    * classes below are parameterized by one (default WGS84, whose
    * constants are the exact module-level doubles, so default instances
    * compute bit-identical results to the pre-datum-shift code — the
    * sp_utm/sp_lcc SQL oracles depend on that).
    */
  final case class Ellipsoid(a: Double, f: Double, id: String) {
    val e2: Double = f * (2.0 - f)
    val ep2: Double = e2 / (1.0 - e2)
    val b: Double = a * (1.0 - f)
  }

  object Ellipsoid {
    val Wgs84: Ellipsoid = Ellipsoid(A, F, "WGS84")
    // proj4 +ellps ids for the ellipsoids legacy datums are built on
    // (public defining parameters; NAD27 = clrk66, OSGB36 = airy,
    // ED50 = intl, Tokyo = bessel, Pulkovo = krass)
    val ByProj4Id: Map[String, Ellipsoid] = Map(
      "WGS84"  -> Wgs84,
      "GRS80"  -> Wgs84, // sub-0.1 mm from WGS84 — same policy as the EPSG entries
      "CLRK66" -> Ellipsoid(6378206.4, 1.0 - 6356583.8 / 6378206.4, "clrk66"),
      "AIRY"   -> Ellipsoid(6377563.396, 1.0 / 299.3249646, "airy"),
      "INTL"   -> Ellipsoid(6378388.0, 1.0 / 297.0, "intl"),
      "BESSEL" -> Ellipsoid(6377397.155, 1.0 / 299.1528128, "bessel"),
      "KRASS"  -> Ellipsoid(6378245.0, 1.0 / 298.3, "krass"))
  }

  /** 7-parameter Helmert datum transformation in geocentric coordinates,
    * position-vector rotation convention (EPSG method 9606 — the
    * convention proj4 `+towgs84=dx,dy,dz,rx,ry,rz,ds` uses): translations
    * in meters, rotations in arc-seconds, scale in ppm.
    *
    * [[toWgs]] is the published direction (local datum → WGS84):
    * v' = d + (1+ds·1e−6)·R·v with R the linearized position-vector
    * rotation matrix. [[fromWgs]] inverts it EXACTLY via the adjugate
    * inverse of the actual 3×3 matrix (not the usual negated-parameter
    * approximation, which drops O(r·ds) cross terms), so
    * fromWgs∘toWgs is identity to FP rounding.
    */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
                           rxSec: Double, rySec: Double, rzSec: Double,
                           dsPpm: Double) {
    val isIdentity: Boolean =
      dx == 0.0 && dy == 0.0 && dz == 0.0 &&
        rxSec == 0.0 && rySec == 0.0 && rzSec == 0.0 && dsPpm == 0.0

    private val s = 1.0 + dsPpm * 1e-6
    private val rx = math.toRadians(rxSec / 3600.0)
    private val ry = math.toRadians(rySec / 3600.0)
    private val rz = math.toRadians(rzSec / 3600.0)
    // M = s · [[1, −rz, ry], [rz, 1, −rx], [−ry, rx, 1]]
    private val m11 = s; private val m12 = -s * rz; private val m13 = s * ry
    private val m21 = s * rz; private val m22 = s; private val m23 = -s * rx
    private val m31 = -s * ry; private val m32 = s * rx; private val m33 = s
    // exact inverse (adjugate / determinant)
    private val det = m11 * (m22 * m33 - m23 * m32) -
      m12 * (m21 * m33 - m23 * m31) + m13 * (m21 * m32 - m22 * m31)
    private val i11 = (m22 * m33 - m23 * m32) / det
    private val i12 = (m13 * m32 - m12 * m33) / det
    private val i13 = (m12 * m23 - m13 * m22) / det
    private val i21 = (m23 * m31 - m21 * m33) / det
    private val i22 = (m11 * m33 - m13 * m31) / det
    private val i23 = (m13 * m21 - m11 * m23) / det
    private val i31 = (m21 * m32 - m22 * m31) / det
    private val i32 = (m12 * m31 - m11 * m32) / det
    private val i33 = (m11 * m22 - m12 * m21) / det

    def toWgs(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (dx + m11 * x + m12 * y + m13 * z,
       dy + m21 * x + m22 * y + m23 * z,
       dz + m31 * x + m32 * y + m33 * z)

    def fromWgs(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val u = x - dx; val v = y - dy; val w = z - dz
      (i11 * u + i12 * v + i13 * w,
       i21 * u + i22 * v + i23 * w,
       i31 * u + i32 * v + i33 * w)
    }
  }

  /** Geodetic (lon/lat degrees, h = 0) → geocentric XYZ meters on `ell`. */
  def geodToGeoc(ell: Ellipsoid, lonDeg: Double, latDeg: Double): (Double, Double, Double) = {
    val lam = math.toRadians(lonDeg)
    val phi = math.toRadians(latDeg)
    val sinPhi = math.sin(phi)
    val n = ell.a / math.sqrt(1.0 - ell.e2 * sinPhi * sinPhi)
    (n * math.cos(phi) * math.cos(lam),
     n * math.cos(phi) * math.sin(lam),
     n * (1.0 - ell.e2) * sinPhi)
  }

  /** Geocentric XYZ → geodetic lon/lat degrees on `ell` (height
    * discarded — the 2D CRS surface carries no h). Bowring's method with
    * a FIXED 3-iteration schedule rather than a convergence loop:
    * deterministic and exactly replayable operation-for-operation in a
    * SQL oracle (sp_datum), and already ~1e−12 rad past the first
    * refinement for terrestrial |h| < 10 km.
    */
  def geocToGeod(ell: Ellipsoid, x: Double, y: Double, z: Double): (Double, Double) = {
    val lam = math.atan2(y, x)
    val p = math.sqrt(x * x + y * y)
    var u = math.atan2(z * ell.a, p * ell.b)
    var phi = 0.0
    var i = 0
    while (i < 3) {
      val su = math.sin(u); val cu = math.cos(u)
      phi = math.atan2(z + ell.ep2 * ell.b * su * su * su,
                       p - ell.e2 * ell.a * cu * cu * cu)
      u = math.atan2(ell.b * math.sin(phi), ell.a * math.cos(phi))
      i += 1
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** A supported coordinate reference system: transforms to/from
    * geographic lon/lat degrees.
    */
  sealed trait Crs {
    def name: String
    def fromGeo(lon: Double, lat: Double): (Double, Double)
    def toGeo(x: Double, y: Double): (Double, Double)
  }

  /** A CRS whose datum is tied to WGS84 by a Helmert transform: `base`
    * is the projection built ON the source ellipsoid, and the
    * geographic side of the [[Crs]] contract stays WGS84 lon/lat —
    * fromGeo runs WGS84 geodetic → geocentric → inverse Helmert →
    * source-datum geodetic → projection, toGeo the reverse. Mirrors the
    * reference's proj4j datum handling for `+towgs84` CRSs
    * (spatial-index/.../index/ST_CrsFromText.scala:1). Heights are
    * dropped at the geodetic step (2D surface), which makes the full
    * roundtrip approximate at the centimeter–decimeter level (h′·Δnormal
    * — the standard 2D-Helmert caveat), while [[Helmert]] itself inverts
    * exactly.
    */
  final case class DatumShifted(base: Crs, ell: Ellipsoid, helmert: Helmert,
                                name: String) extends Crs {
    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val (x, y, z) = geodToGeoc(Ellipsoid.Wgs84, lon, lat)
      val (xs, ys, zs) = helmert.fromWgs(x, y, z)
      val (l, p) = geocToGeod(ell, xs, ys, zs)
      base.fromGeo(l, p)
    }
    def toGeo(x: Double, y: Double): (Double, Double) = {
      val (l, p) = base.toGeo(x, y)
      val (gx, gy, gz) = geodToGeoc(ell, l, p)
      val (wx, wy, wz) = helmert.toWgs(gx, gy, gz)
      geocToGeod(Ellipsoid.Wgs84, wx, wy, wz)
    }
  }

  /** A CRS whose datum is tied to WGS84 by an NTv2 grid-shift file
    * (`+nadgrids=…`): the projection runs on the source ellipsoid and
    * the geographic side stays WGS84 — fromGeo runs WGS84 lon/lat →
    * iterative inverse grid shift → source-datum lon/lat → projection,
    * toGeo the reverse with the direct (forward) interpolation. This is
    * the distortion-modelling half of the reference's proj4j datum
    * machinery (ST_GeomReproject.scala:1, `+nadgrids` NTv2 registry);
    * unlike [[DatumShifted]] there is no geocentric leg — the grid IS
    * the geographic-domain mapping, per the NTv2 spec.
    */
  final case class GridShifted(base: Crs, grid: NTv2.Grid,
                               name: String) extends Crs {
    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val (l, p) = grid.inverse(lon, lat)
      base.fromGeo(l, p)
    }
    def toGeo(x: Double, y: Double): (Double, Double) = {
      val (l, p) = base.toGeo(x, y)
      grid.forward(l, p)
    }
  }

  /** A CRS published in a non-meter linear unit (`+units=us-ft` /
    * `+to_meter=`): the base projection computes meters and the output
    * coordinates are meters / toMeter — the PROJ convention, where
    * `+x_0`/`+y_0` remain meter-valued and the unit scales the result.
    * The surface the US State Plane ftUS zones need (EPSG 2229-class;
    * the reference inherits it from geotrellis-proj4's unit registry,
    * ST_CrsFromText.scala:1).
    */
  final case class UnitScaled(base: Crs, toMeter: Double,
                              name: String) extends Crs {
    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val (x, y) = base.fromGeo(lon, lat)
      (x / toMeter, y / toMeter)
    }
    def toGeo(x: Double, y: Double): (Double, Double) =
      base.toGeo(x * toMeter, y * toMeter)
  }

  case object LonLat extends Crs {
    val name = "EPSG:4326"
    def fromGeo(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def toGeo(x: Double, y: Double): (Double, Double) = (x, y)
  }

  case object WebMercator extends Crs {
    val name = "EPSG:3857"
    def fromGeo(lon: Double, lat: Double): (Double, Double) = toMercator(lon, lat)
    def toGeo(x: Double, y: Double): (Double, Double) = fromMercator(x, y)
  }

  /** Generic ellipsoidal transverse mercator (Snyder pp. 61–63, eqs.
    * 8-9..8-17) with arbitrary origin latitude, scale factor and false
    * origin — a UTM zone is the instance (lat0 = 0, k0 = 0.9996,
    * fe = 500 km); national grids differ only in these parameters. For
    * lat0 = 0 the meridian-arc offset m0 is exactly 0, so [[Utm]]
    * instances compute bit-identical doubles to a hard-coded UTM series
    * (the sp_utm SQL oracle depends on that). Exact to well under a
    * millimeter within ±3° of the central meridian.
    */
  final case class Tmerc(lat0: Double, lon0: Double, k0: Double,
                         fe: Double, fn: Double, name: String,
                         ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    // shadow the module-level WGS84 constants with this instance's
    // ellipsoid (identical doubles for the default, so default
    // instances stay bit-identical to the pre-parameterized code)
    private val A = ell.a
    private val E2 = ell.e2
    private val Ep2 = ell.ep2
    private val lam0 = math.toRadians(lon0)
    private val m0 = if (lat0 == 0.0) 0.0 else meridianArc(math.toRadians(lat0))

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val sinPhi = math.sin(phi)
      val cosPhi = math.cos(phi)
      val tanPhi = math.tan(phi)
      val n = A / math.sqrt(1.0 - E2 * sinPhi * sinPhi)
      val t = tanPhi * tanPhi
      val c = Ep2 * cosPhi * cosPhi
      val a = cosPhi * (math.toRadians(lon) - lam0)
      val m = meridianArc(phi)
      val a2 = a * a; val a3 = a2 * a; val a4 = a3 * a; val a5 = a4 * a; val a6 = a5 * a
      val x = k0 * n * (a + (1.0 - t + c) * a3 / 6.0 +
        (5.0 - 18.0 * t + t * t + 72.0 * c - 58.0 * Ep2) * a5 / 120.0) + fe
      val y = k0 * (m - m0 + n * tanPhi * (a2 / 2.0 +
        (5.0 - t + 9.0 * c + 4.0 * c * c) * a4 / 24.0 +
        (61.0 - 58.0 * t + t * t + 600.0 * c - 330.0 * Ep2) * a6 / 720.0)) + fn
      (x, y)
    }

    def toGeo(x: Double, y: Double): (Double, Double) = {
      val m = (y - fn) / k0 + m0
      val mu = m / (A * (1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0))
      val e1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
      val phi1 = mu +
        (3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0) * math.sin(2.0 * mu) +
        (21.0 * e1 * e1 / 16.0 - 55.0 * math.pow(e1, 4) / 32.0) * math.sin(4.0 * mu) +
        (151.0 * e1 * e1 * e1 / 96.0) * math.sin(6.0 * mu) +
        (1097.0 * math.pow(e1, 4) / 512.0) * math.sin(8.0 * mu)
      val sinPhi1 = math.sin(phi1)
      val cosPhi1 = math.cos(phi1)
      val tanPhi1 = math.tan(phi1)
      val c1 = Ep2 * cosPhi1 * cosPhi1
      val t1 = tanPhi1 * tanPhi1
      val oneMinus = 1.0 - E2 * sinPhi1 * sinPhi1
      val n1 = A / math.sqrt(oneMinus)
      val r1 = A * (1.0 - E2) / (oneMinus * math.sqrt(oneMinus))
      val d = (x - fe) / (n1 * k0)
      val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
      val phi = phi1 - (n1 * tanPhi1 / r1) * (d2 / 2.0 -
        (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1 - 9.0 * Ep2) * d4 / 24.0 +
        (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1 - 252.0 * Ep2 - 3.0 * c1 * c1) * d6 / 720.0)
      val lam = lam0 + (d - (1.0 + 2.0 * t1 + c1) * d3 / 6.0 +
        (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1 + 8.0 * Ep2 + 24.0 * t1 * t1) * d5 / 120.0) / cosPhi1
      (math.toDegrees(lam), math.toDegrees(phi))
    }

    /** Meridian arc length from the equator to latitude φ (Snyder 3-21). */
    private def meridianArc(phi: Double): Double =
      A * ((1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0) * phi -
        (3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * E2 * E2 * E2 / 1024.0) * math.sin(2.0 * phi) +
        (15.0 * E2 * E2 / 256.0 + 45.0 * E2 * E2 * E2 / 1024.0) * math.sin(4.0 * phi) -
        (35.0 * E2 * E2 * E2 / 3072.0) * math.sin(6.0 * phi))
  }

  /** One WGS84 UTM zone as its [[Tmerc]] instance. */
  def Utm(zone: Int, north: Boolean): Tmerc = {
    require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range 1–60")
    Tmerc(lat0 = 0.0, lon0 = -183.0 + 6.0 * zone, k0 = K0,
      fe = FalseEasting, fn = if (north) 0.0 else FalseNorthingSouth,
      name = s"EPSG:${(if (north) 32600 else 32700) + zone}")
  }

  /** Ellipsoidal polar stereographic with a standard parallel (Snyder
    * "variant B", pp. 160–162): EPSG:3031 (Antarctic Polar Stereographic,
    * lat_ts = −71°, lon0 = 0) and EPSG:3413 (NSIDC Sea Ice Polar
    * Stereographic North, lat_ts = 70°, lon0 = −45°), both FE = FN = 0.
    * The south aspect uses the north equations with the signs of φ, λ,
    * λ0, x and y reversed (Snyder p. 161).
    */
  final case class PolarStereo(north: Boolean, latTs: Double, lon0: Double, name: String,
                               fe: Double = 0.0, fn: Double = 0.0,
                               ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)
    // t and m at the standard parallel, in north-aspect terms (φc = |lat_ts|)
    private val phiC = math.toRadians(math.abs(latTs))
    private val tC = tOf(phiC)
    private val mC = math.cos(phiC) / math.sqrt(1.0 - E2 * math.sin(phiC) * math.sin(phiC))
    // inverse series coefficients (Snyder 3-5)
    private val c2 = E2 / 2.0 + 5.0 * E2 * E2 / 24.0 + E2 * E2 * E2 / 12.0 + 13.0 * E2 * E2 * E2 * E2 / 360.0
    private val c4 = 7.0 * E2 * E2 / 48.0 + 29.0 * E2 * E2 * E2 / 240.0 + 811.0 * E2 * E2 * E2 * E2 / 11520.0
    private val c6 = 7.0 * E2 * E2 * E2 / 120.0 + 81.0 * E2 * E2 * E2 * E2 / 1120.0
    private val c8 = 4279.0 * E2 * E2 * E2 * E2 / 161280.0

    /** Snyder 15-9: t = tan(π/4 − φ/2) / [(1 − e sinφ)/(1 + e sinφ)]^(e/2). */
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2.0)

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      // south aspect: run the north equations on (−φ, −λ, −λ0), negate x,y
      val phi = math.toRadians(if (north) lat else -lat)
      val dlam = if (north) math.toRadians(lon) - math.toRadians(lon0)
                 else math.toRadians(-lon) - math.toRadians(-lon0)
      val rho = A * mC * tOf(phi) / tC                 // Snyder 21-34
      val x = rho * math.sin(dlam)                     // Snyder 21-30
      val y = -rho * math.cos(dlam)                    // Snyder 21-31
      if (north) (x + fe, y + fn) else (-x + fe, -y + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val (x, y) = if (north) (x0 - fe, y0 - fn) else (-(x0 - fe), -(y0 - fn))
      val rho = math.sqrt(x * x + y * y)
      val t = rho * tC / (A * mC)                      // Snyder 21-39
      val chi = math.Pi / 2.0 - 2.0 * math.atan(t)     // Snyder 7-13
      val phi = chi + c2 * math.sin(2.0 * chi) + c4 * math.sin(4.0 * chi) +
        c6 * math.sin(6.0 * chi) + c8 * math.sin(8.0 * chi) // Snyder 3-5
      val lam = (if (north) math.toRadians(lon0) else math.toRadians(-lon0)) +
        (if (rho == 0.0) 0.0 else math.atan2(x, -y))   // Snyder 20-16
      val lonOut = math.toDegrees(lam)
      val lonSigned = if (north) lonOut else -lonOut
      // atan2 + lon0 can land outside (-180, 180] when the point sits
      // across the antimeridian from the central meridian — wrap it back
      val lonNorm = lonSigned - 360.0 * math.floor((lonSigned + 180.0) / 360.0)
      if (north) (lonNorm, math.toDegrees(phi)) else (lonNorm, -math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Lambert azimuthal equal-area (Snyder pp. 187–190, eqs.
    * 3-12, 24-27..29 forward; 24-16..19 + 3-18 inverse): EPSG:3035
    * (ETRS89-extended / LAEA Europe, lat0 = 52°, lon0 = 10°,
    * FE = 4321000, FN = 3210000). The ETRS89 (GRS80) and WGS84
    * ellipsoids differ by ~0.1 mm in semi-minor axis — WGS84 constants
    * are used throughout, consistent with the rest of this object.
    */
  final case class Laea(lat0: Double, lon0: Double, fe: Double, fn: Double, name: String,
                        ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)

    /** Snyder 3-12: q(φ) = (1−e²)[sinφ/(1−e²sin²φ) − (1/2e)·ln((1−e sinφ)/(1+e sinφ))]. */
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - E2) * (s / (1.0 - E2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }

    private val qP = qOf(math.Pi / 2.0)
    private val q1 = qOf(math.toRadians(lat0))
    private val beta1 = math.asin(q1 / qP)
    private val rq = A * math.sqrt(qP / 2.0)
    private val sinB1 = math.sin(beta1)
    private val cosB1 = math.cos(beta1)
    private val m1 = {
      val s = math.sin(math.toRadians(lat0))
      math.cos(math.toRadians(lat0)) / math.sqrt(1.0 - E2 * s * s)
    }
    private val d = A * m1 / (rq * cosB1)
    // inverse authalic-latitude series coefficients (Snyder 3-18)
    private val a2 = E2 / 3.0 + 31.0 * E2 * E2 / 180.0 + 517.0 * E2 * E2 * E2 / 5040.0
    private val a4 = 23.0 * E2 * E2 / 360.0 + 251.0 * E2 * E2 * E2 / 3780.0
    private val a6 = 761.0 * E2 * E2 * E2 / 45360.0

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val beta = math.asin(qOf(math.toRadians(lat)) / qP)
      val dlam = math.toRadians(lon) - math.toRadians(lon0)
      val sinB = math.sin(beta)
      val cosB = math.cos(beta)
      val b = rq * math.sqrt(2.0 / (1.0 + sinB1 * sinB + cosB1 * cosB * math.cos(dlam)))
      val x = b * d * (cosB * math.sin(dlam))
      val y = (b / d) * (cosB1 * sinB - sinB1 * cosB * math.cos(dlam))
      (x + fe, y + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe
      val y = y0 - fn
      val rho = math.sqrt((x / d) * (x / d) + (d * y) * (d * y))
      if (rho == 0.0) return (lon0, lat0)
      val ce = 2.0 * math.asin(rho / (2.0 * rq))
      val sinCe = math.sin(ce)
      val cosCe = math.cos(ce)
      val betaP = math.asin(cosCe * sinB1 + (d * y * sinCe * cosB1) / rho)
      val lam = math.toRadians(lon0) +
        math.atan2(x * sinCe, d * rho * cosB1 * cosCe - d * d * y * sinB1 * sinCe)
      val phi = betaP + a2 * math.sin(2.0 * betaP) + a4 * math.sin(4.0 * betaP) +
        a6 * math.sin(6.0 * betaP)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Lambert conformal conic, 2 standard parallels (Snyder
    * pp. 104–110, eqs. 14-15, 15-1..15-11 forward; 15-9..15-11 + 7-13 +
    * 3-5 inverse): EPSG:2154 (RGF93 / Lambert-93, φ1 = 49°, φ2 = 44°,
    * φ0 = 46.5°, λ0 = 3°, FE = 700000, FN = 6600000). RGF93 (GRS80) vs
    * WGS84 ellipsoid constants differ by ~0.1 mm; WGS84 is used
    * throughout, consistent with the rest of this object. Verified by
    * projection invariants in STFunctionsSpec: scale = 1 on both
    * standard parallels, conformality (isotropic local scale), and
    * inverse roundtrip.
    */
  final case class Lcc2sp(lat1: Double, lat2: Double, lat0: Double, lon0: Double,
                          fe: Double, fn: Double, name: String,
                          ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)

    /** Snyder 15-9: t = tan(π/4 − φ/2) / [(1 − e sinφ)/(1 + e sinφ)]^(e/2). */
    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2.0)

    /** Snyder 14-15: m = cosφ / sqrt(1 − e² sin²φ). */
    private def mOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - E2 * s * s)
    }

    private val phi1 = math.toRadians(lat1)
    private val phi2 = math.toRadians(lat2)
    private val m1 = mOf(phi1)
    private val m2 = mOf(phi2)
    private val t1 = tOf(phi1)
    private val t2 = tOf(phi2)
    private val n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2)) // 15-8
    private val bigF = m1 / (n * math.pow(t1, n))                                 // 15-10
    private val rho0 = A * bigF * math.pow(tOf(math.toRadians(lat0)), n)          // 15-7a
    // inverse conformal-latitude series coefficients (Snyder 3-5)
    private val c2 = E2 / 2.0 + 5.0 * E2 * E2 / 24.0 + E2 * E2 * E2 / 12.0 + 13.0 * E2 * E2 * E2 * E2 / 360.0
    private val c4 = 7.0 * E2 * E2 / 48.0 + 29.0 * E2 * E2 * E2 / 240.0 + 811.0 * E2 * E2 * E2 * E2 / 11520.0
    private val c6 = 7.0 * E2 * E2 * E2 / 120.0 + 81.0 * E2 * E2 * E2 * E2 / 1120.0
    private val c8 = 4279.0 * E2 * E2 * E2 * E2 / 161280.0

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val rho = A * bigF * math.pow(tOf(math.toRadians(lat)), n)  // 15-7
      val theta = n * (math.toRadians(lon) - math.toRadians(lon0)) // 14-4
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta)) // 14-1/14-2
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe
      val y = rho0 - (y0 - fn)
      val rhoSigned = math.sqrt(x * x + y * y)
      val rho = if (n < 0) -rhoSigned else rhoSigned                // 14-10
      val t = math.pow(rho / (A * bigF), 1.0 / n)                   // 15-11
      val theta = math.atan2(x, y)                                  // 14-11
      val lam = math.toRadians(lon0) + theta / n
      val chi = math.Pi / 2.0 - 2.0 * math.atan(t)                  // 7-13
      val phi = chi + c2 * math.sin(2.0 * chi) + c4 * math.sin(4.0 * chi) +
        c6 * math.sin(6.0 * chi) + c8 * math.sin(8.0 * chi)         // 3-5
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Albers equal-area conic, 2 standard parallels (Snyder
    * pp. 98–102, eqs. 14-3/14-4 + 15-19..15-26 forward; 15-26 + the
    * authalic-latitude series 3-18 inverse): EPSG:5070 (NAD83 / Conus
    * Albers, φ1 = 29.5°, φ2 = 45.5°, φ0 = 23°, λ0 = −96°). NAD83
    * (GRS80) vs WGS84 ellipsoid constants differ by ~0.1 mm; WGS84 is
    * used throughout, consistent with the rest of this object.
    */
  final case class Aea(lat1: Double, lat2: Double, lat0: Double, lon0: Double,
                       fe: Double, fn: Double, name: String,
                       ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)

    /** Snyder 3-12 (same q as [[Laea]]). */
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - E2) * (s / (1.0 - E2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }

    /** Snyder 14-15: m = cosφ / sqrt(1 − e² sin²φ). */
    private def mOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - E2 * s * s)
    }

    private val m1 = mOf(math.toRadians(lat1))
    private val m2 = mOf(math.toRadians(lat2))
    private val q1 = qOf(math.toRadians(lat1))
    private val q2 = qOf(math.toRadians(lat2))
    private val q0 = qOf(math.toRadians(lat0))
    private val n = (m1 * m1 - m2 * m2) / (q2 - q1)       // 15-22
    private val bigC = m1 * m1 + n * q1                   // 15-23
    private val rho0 = A * math.sqrt(bigC - n * q0) / n   // 15-21a
    private val qP = qOf(math.Pi / 2.0)
    // inverse authalic-latitude series coefficients (Snyder 3-18)
    private val a2 = E2 / 3.0 + 31.0 * E2 * E2 / 180.0 + 517.0 * E2 * E2 * E2 / 5040.0
    private val a4 = 23.0 * E2 * E2 / 360.0 + 251.0 * E2 * E2 * E2 / 3780.0
    private val a6 = 761.0 * E2 * E2 * E2 / 45360.0

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val rho = A * math.sqrt(bigC - n * qOf(math.toRadians(lat))) / n // 15-21
      val theta = n * (math.toRadians(lon) - math.toRadians(lon0))     // 14-4
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))  // 14-1/14-2
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe
      val y = rho0 - (y0 - fn)
      val rhoSigned = math.sqrt(x * x + y * y)
      val rho = if (n < 0) -rhoSigned else rhoSigned                   // 14-10
      val q = (bigC - rho * rho * n * n / (A * A)) / n                 // 15-26
      val ratio = math.max(-1.0, math.min(1.0, q / qP))
      val beta = math.asin(ratio)                                      // authalic lat
      // 14-11: for southern standard parallels (n < 0) the signs of
      // both atan2 arguments reverse — ρ is negative there, so the
      // grid vector points away from the apex, not toward it
      val theta = if (n < 0) math.atan2(-x, -y) else math.atan2(x, y)
      val lam = math.toRadians(lon0) + theta / n
      val phi = beta + a2 * math.sin(2.0 * beta) + a4 * math.sin(4.0 * beta) +
        a6 * math.sin(6.0 * beta)                                      // 3-18
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Hotine oblique Mercator (`+proj=omerc`, azimuth form — the
    * Swiss/Malaysia/Alaska-zone-1 family), Snyder PP 1395 ch. 9,
    * eqs. 9-11..9-19 constants, 9-25..9-34 forward, 9-42..9-48 inverse
    * (EPSG method 9815 variant B: grid coordinates are relative to the
    * PROJECTION CENTER, i.e. the natural-origin u is reduced by u_c;
    * `noOff = true` gives variant A / Hotine's original natural-origin
    * coordinates, PROJ's `+no_off`). Conformal along the initial line
    * (azimuth `alphaC` through (lat0, lonC)) with scale `k0` there; the
    * rectification angle `gammaC` defaults to the azimuth. The inverse
    * recovers φ through the same Snyder 3-5 chi series the polar
    * stereographic inverse uses.
    *
    * Quadrants: u uses atan2(S·cosγ0 + V·sinγ0, cos(B·Δλ)) so points
    * beyond 90° of arc from the center stay on the correct branch —
    * the printed Snyder form divides and loses the quadrant.
    */
  final case class Omerc(lat0: Double, lonC: Double, alphaC: Double,
                         gammaC: Double, k0: Double, fe: Double, fn: Double,
                         noOff: Boolean, name: String,
                         ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A0 = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)
    private val phi0 = math.toRadians(lat0)
    private val alc = math.toRadians(alphaC)
    private val gc = math.toRadians(gammaC)
    require(math.abs(lat0) > 1e-9 && math.abs(math.abs(lat0) - 90.0) > 1e-9,
      "omerc needs 0 < |lat_0| < 90 (the equatorial/polar limits degenerate)")

    private def tOf(phi: Double): Double =
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - e * math.sin(phi)) / (1.0 + e * math.sin(phi)), e / 2.0)

    private val sin0 = math.sin(phi0)
    private val cos0 = math.cos(phi0)
    private val B = math.sqrt(1.0 + E2 * cos0 * cos0 * cos0 * cos0 / (1.0 - E2)) // 9-11
    private val Ap = A0 * B * k0 * math.sqrt(1.0 - E2) / (1.0 - E2 * sin0 * sin0) // 9-12
    private val t0 = tOf(phi0)                                                    // 9-13
    private val D = B * math.sqrt(1.0 - E2) / (cos0 * math.sqrt(1.0 - E2 * sin0 * sin0)) // 9-14
    private val D2 = math.max(D * D, 1.0) // D can dip below 1 by rounding near the equator
    private val F = D + math.copySign(math.sqrt(D2 - 1.0), phi0)                  // 9-15
    private val Ecst = F * math.pow(t0, B)                                        // 9-16
    private val G = (F - 1.0 / F) / 2.0                                           // 9-17
    private val gamma0 = math.asin(math.sin(alc) / D)                             // 9-18
    private val lam0 = math.toRadians(lonC) -
      math.asin(G * math.tan(gamma0)) / B                                         // 9-19
    private val sinG0 = math.sin(gamma0)
    private val cosG0 = math.cos(gamma0)
    // u of the projection center measured from the natural origin (9-39)
    private val uC =
      if (math.abs(alphaC) == 90.0) Ap * (math.toRadians(lonC) - lam0)
      else math.copySign(Ap / B * math.atan2(math.sqrt(D2 - 1.0), math.cos(alc)), phi0)
    private val uOff = if (noOff) 0.0 else uC
    // chi series coefficients (Snyder 3-5), same as PolarStereo's
    private val c2 = E2 / 2.0 + 5.0 * E2 * E2 / 24.0 + E2 * E2 * E2 / 12.0 + 13.0 * E2 * E2 * E2 * E2 / 360.0
    private val c4 = 7.0 * E2 * E2 / 48.0 + 29.0 * E2 * E2 * E2 / 240.0 + 811.0 * E2 * E2 * E2 * E2 / 11520.0
    private val c6 = 7.0 * E2 * E2 * E2 / 120.0 + 81.0 * E2 * E2 * E2 * E2 / 1120.0
    private val c8 = 4279.0 * E2 * E2 * E2 * E2 / 161280.0

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dlamRaw = math.toRadians(lon) - lam0
      // wrap Δλ to (−π, π] so grids straddling the antimeridian work
      val dlam = dlamRaw - 2.0 * math.Pi * math.floor((dlamRaw + math.Pi) / (2.0 * math.Pi))
      val t = tOf(phi)
      val q = Ecst / math.pow(t, B)                                               // 9-25
      val sS = (q - 1.0 / q) / 2.0                                                // 9-26
      val tT = (q + 1.0 / q) / 2.0                                                // 9-27
      val vV = math.sin(B * dlam)                                                 // 9-28
      val uU = (-vV * cosG0 + sS * sinG0) / tT                                    // 9-29
      val v = Ap * math.log((1.0 - uU) / (1.0 + uU)) / (2.0 * B)                  // 9-30
      val u = Ap * math.atan2(sS * cosG0 + vV * sinG0, math.cos(B * dlam)) / B -
        uOff                                                                      // 9-34 (atan2 quadrant form)
      (v * math.cos(gc) + u * math.sin(gc) + fe,                                  // 9-35
        u * math.cos(gc) - v * math.sin(gc) + fn)                                 // 9-36
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val xp = x0 - fe
      val yp = y0 - fn
      val v = xp * math.cos(gc) - yp * math.sin(gc)                               // 9-42
      val u = xp * math.sin(gc) + yp * math.cos(gc) + uOff                        // 9-43
      val qp = math.exp(-B * v / Ap)                                              // 9-44
      val sp = (qp - 1.0 / qp) / 2.0                                              // 9-45
      val vp = math.sin(B * u / Ap)
      val up = (vp * cosG0 + sp * sinG0) / ((qp + 1.0 / qp) / 2.0)                // 9-46
      val clamped = math.max(-1.0, math.min(1.0, up))
      val t = math.pow(Ecst / math.sqrt((1.0 + clamped) / (1.0 - clamped)), 1.0 / B) // 9-47
      val chi = math.Pi / 2.0 - 2.0 * math.atan(t)
      val phi = chi + c2 * math.sin(2.0 * chi) + c4 * math.sin(4.0 * chi) +
        c6 * math.sin(6.0 * chi) + c8 * math.sin(8.0 * chi)                       // 3-5
      val lam = lam0 - math.atan2(sp * cosG0 - vp * sinG0, math.cos(B * u / Ap)) / B // 9-48
      val lonOut = math.toDegrees(lam)
      val lonNorm = lonOut - 360.0 * math.floor((lonOut + 180.0) / 360.0)
      (lonNorm, math.toDegrees(phi))
    }
  }

  /** Sinusoidal (Sanson–Flamsteed), ellipsoidal form — the equal-area
    * pseudocylindrical the MODIS/land-product grids use (`+proj=sinu`).
    * Snyder PP 1395 eq. 30-8/30-9 forward: y is the meridian arc M(φ)
    * (the same 3-21 series Tmerc uses), x = a·Δλ·cosφ/√(1−e²sin²φ).
    * Inverse 30-10/30-11 recovers φ from M via the rectifying-latitude
    * series (3-26) and λ in closed form. With e = 0 the formulas
    * degrade exactly to the textbook sphere (x = RΔλcosφ, y = Rφ).
    */
  final case class Sinusoidal(lon0: Double, fe: Double, fn: Double, name: String,
                              ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val lam0 = math.toRadians(lon0)

    private def meridianArc(phi: Double): Double =                     // 3-21
      A * ((1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0) * phi -
        (3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * E2 * E2 * E2 / 1024.0) * math.sin(2.0 * phi) +
        (15.0 * E2 * E2 / 256.0 + 45.0 * E2 * E2 * E2 / 1024.0) * math.sin(4.0 * phi) -
        (35.0 * E2 * E2 * E2 / 3072.0) * math.sin(6.0 * phi))

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val sinPhi = math.sin(phi)
      val x = A * (math.toRadians(lon) - lam0) * math.cos(phi) /
        math.sqrt(1.0 - E2 * sinPhi * sinPhi)                          // 30-8
      (x + fe, meridianArc(phi) + fn)                                  // 30-9
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val m = y0 - fn
      val mu = m / (A * (1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0))
      val e1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
      val phi = mu +                                                   // 3-26
        (3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0) * math.sin(2.0 * mu) +
        (21.0 * e1 * e1 / 16.0 - 55.0 * math.pow(e1, 4) / 32.0) * math.sin(4.0 * mu) +
        (151.0 * e1 * e1 * e1 / 96.0) * math.sin(6.0 * mu) +
        (1097.0 * math.pow(e1, 4) / 512.0) * math.sin(8.0 * mu)
      val sinPhi = math.sin(phi)
      val cosPhi = math.cos(phi)
      // at the pole every x maps to λ0 (the parallel has zero length)
      val lam =
        if (math.abs(cosPhi) < 1e-12) lam0
        else lam0 + (x0 - fe) * math.sqrt(1.0 - E2 * sinPhi * sinPhi) / (A * cosPhi) // 30-11
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Mollweide, spherical with R = a — PROJ's `+proj=moll` semantics
    * (the projection is defined on the sphere; PROJ substitutes the
    * semi-major axis). Snyder PP 1395 eq. 31-1..31-7: θ solves
    * 2θ + sin 2θ = π sin φ by a FIXED 8-step Newton schedule from
    * θ₀ = φ — fixed, like DatumShifted's Bowring schedule, so an oracle
    * can replay the identical float sequence; quadratic convergence puts
    * the fixed-schedule residual far below double rounding for
    * |φ| ≤ 85° (the poles short-circuit to θ = ±π/2, where the Newton
    * denominator 4cos²θ vanishes).
    */
  final case class Mollweide(lon0: Double, fe: Double, fn: Double, name: String,
                             ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val R = ell.a
    private val lam0 = math.toRadians(lon0)
    private val Cx = math.sqrt(8.0) / math.Pi * R                      // 2√2·R/π
    private val Cy = math.sqrt(2.0) * R

    private[graft] def theta(phi: Double): Double =
      if (math.abs(phi) >= math.Pi / 2.0 - 1e-9) math.copySign(math.Pi / 2.0, phi)
      else {
        val c = math.Pi * math.sin(phi)
        var t = phi
        var i = 0
        while (i < 8) {
          t -= (2.0 * t + math.sin(2.0 * t) - c) / (2.0 + 2.0 * math.cos(2.0 * t))
          i += 1
        }
        t
      }

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val th = theta(math.toRadians(lat))
      (Cx * (math.toRadians(lon) - lam0) * math.cos(th) + fe,          // 31-1
        Cy * math.sin(th) + fn)                                        // 31-2
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val s = math.max(-1.0, math.min(1.0, (y0 - fn) / Cy))
      val th = math.asin(s)                                            // 31-6
      val phiArg = math.max(-1.0, math.min(1.0, (2.0 * th + math.sin(2.0 * th)) / math.Pi))
      val phi = math.asin(phiArg)                                      // 31-7
      val cosTh = math.cos(th)
      val lam = if (cosTh < 1e-12) lam0 else lam0 + (x0 - fe) / (Cx * cosTh)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal Mercator (Snyder pp. 41–44, eqs. 7-6..7-10; EPSG
    * methods 9804 "1SP" via k₀ and 9805 "2SP" via lat_ts): EPSG:3395
    * (WGS 84 / World Mercator) and the navigation-chart grids. The
    * standard parallel composes with the explicit scale exactly as PROJ
    * does — k₀ = k·cosφₜₛ/√(1−e²sin²φₜₛ), so lat_ts = 0 reduces to the
    * plain 1SP form. y uses the isometric latitude
    * ψ = ln tan(π/4+φ/2) + (e/2)·ln((1−e sinφ)/(1+e sinφ)) (7-7);
    * with e = 0 (a +R sphere) ψ collapses to the spherical
    * ln tan(π/4+φ/2), so spherical Mercator grids ride the same code.
    * Inverse via the conformal-latitude series (7-13 + 3-5), the same
    * machinery as [[PolarStereo]].
    */
  final case class Mercator(latTs: Double, k: Double, lon0: Double,
                            fe: Double, fn: Double, name: String,
                            ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)
    private val k0 = {
      val phiTs = math.toRadians(latTs)
      val s = math.sin(phiTs)
      k * math.cos(phiTs) / math.sqrt(1.0 - E2 * s * s)   // Snyder 14-15 at φts
    }
    // inverse conformal-latitude series coefficients (Snyder 3-5)
    private val c2 = E2 / 2.0 + 5.0 * E2 * E2 / 24.0 + E2 * E2 * E2 / 12.0 + 13.0 * E2 * E2 * E2 * E2 / 360.0
    private val c4 = 7.0 * E2 * E2 / 48.0 + 29.0 * E2 * E2 * E2 / 240.0 + 811.0 * E2 * E2 * E2 * E2 / 11520.0
    private val c6 = 7.0 * E2 * E2 * E2 / 120.0 + 81.0 * E2 * E2 * E2 * E2 / 1120.0
    private val c8 = 4279.0 * E2 * E2 * E2 * E2 / 161280.0

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      require(math.abs(lat) < 90.0 - 1e-9, s"Mercator is undefined at the poles (lat=$lat)")
      val phi = math.toRadians(lat)
      val s = math.sin(phi)
      val psi = math.log(math.tan(math.Pi / 4.0 + phi / 2.0)) +
        (if (e == 0.0) 0.0
         else (e / 2.0) * math.log((1.0 - e * s) / (1.0 + e * s)))      // 7-7
      (A * k0 * (math.toRadians(lon) - math.toRadians(lon0)) + fe,      // 7-6
        A * k0 * psi + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val t = math.exp(-(y0 - fn) / (A * k0))                           // 7-10
      val chi = math.Pi / 2.0 - 2.0 * math.atan(t)                      // 7-13
      val phi = chi + c2 * math.sin(2.0 * chi) + c4 * math.sin(4.0 * chi) +
        c6 * math.sin(6.0 * chi) + c8 * math.sin(8.0 * chi)             // 3-5
      (math.toDegrees(math.toRadians(lon0) + (x0 - fe) / (A * k0)), math.toDegrees(phi))
    }
  }

  /** Ellipsoidal cylindrical equal-area (Snyder pp. 76–79, eqs. 10-1,
    * 10-2; EPSG method 9835): the EASE-Grid 2.0 family — EPSG:6933
    * (global, lat_ts = 30°) and the polar/land variants — plus Gall–
    * Peters-class grids. x = a·k₀·Δλ, y = a·q(φ)/(2k₀) with the same
    * authalic q as [[Laea]]/[[Aea]] (3-12) and
    * k₀ = cosφₜₛ/√(1−e²sin²φₜₛ); inverse through the authalic-latitude
    * series (3-18).
    */
  final case class Cea(latTs: Double, lon0: Double, fe: Double, fn: Double,
                       name: String, ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val e = math.sqrt(E2)

    /** Snyder 3-12 — identical expression to Laea.qOf (e = 0 collapses to 2 sinφ). */
    private def qOf(phi: Double): Double = {
      val s = math.sin(phi)
      if (e == 0.0) 2.0 * s
      else (1.0 - E2) * (s / (1.0 - E2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }

    private val qP = qOf(math.Pi / 2.0)
    private val k0 = {
      val phiTs = math.toRadians(latTs)
      val s = math.sin(phiTs)
      math.cos(phiTs) / math.sqrt(1.0 - E2 * s * s)                     // 10-13
    }
    // inverse authalic-latitude series coefficients (Snyder 3-18)
    private val a2 = E2 / 3.0 + 31.0 * E2 * E2 / 180.0 + 517.0 * E2 * E2 * E2 / 5040.0
    private val a4 = 23.0 * E2 * E2 / 360.0 + 251.0 * E2 * E2 * E2 / 3780.0
    private val a6 = 761.0 * E2 * E2 * E2 / 45360.0

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val x = A * k0 * (math.toRadians(lon) - math.toRadians(lon0))     // 10-1
      val y = A * qOf(math.toRadians(lat)) / (2.0 * k0)                 // 10-2
      (x + fe, y + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val sinB = math.max(-1.0, math.min(1.0, 2.0 * (y0 - fn) * k0 / (A * qP))) // 10-26
      val beta = math.asin(sinB)
      val phi = beta + a2 * math.sin(2.0 * beta) + a4 * math.sin(4.0 * beta) +
        a6 * math.sin(6.0 * beta)                                       // 3-18
      (math.toDegrees(math.toRadians(lon0) + (x0 - fe) / (A * k0)), math.toDegrees(phi))
    }
  }

  /** Equidistant cylindrical / equirectangular (`+proj=eqc`), PROJ
    * semantics: the projection is spherical — x = a·cosφₜₛ·Δλ,
    * y = a·(φ − φ₀) — and PROJ substitutes the semi-major axis on an
    * ellipsoid rather than using the EPSG-1028 meridian arc (same
    * sphere-substitution policy as [[Mollweide]]). Covers EPSG:4087
    * (WGS 84 / World Equidistant Cylindrical) and EPSG:32662 (Plate
    * Carrée) as PROJ computes them.
    */
  final case class Eqc(latTs: Double, lat0: Double, lon0: Double,
                       fe: Double, fn: Double, name: String,
                       ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val R = ell.a
    private val k0 = math.cos(math.toRadians(latTs))

    def fromGeo(lon: Double, lat: Double): (Double, Double) =
      (R * k0 * (math.toRadians(lon) - math.toRadians(lon0)) + fe,
        R * (math.toRadians(lat) - math.toRadians(lat0)) + fn)

    def toGeo(x0: Double, y0: Double): (Double, Double) =
      (math.toDegrees(math.toRadians(lon0) + (x0 - fe) / (R * k0)),
        math.toDegrees(math.toRadians(lat0) + (y0 - fn) / R))
  }

  /** Oblique Stereographic, double-projection form (EPSG method 9809;
    * proj4 `+proj=sterea`): ellipsoid → conformal sphere → spherical
    * oblique stereographic. The Netherlands RD New grid (EPSG:28992,
    * Bessel) is the canonical user; also Ireland, some Scandinavian
    * legacy grids. Derivation follows the EPSG Guidance Note 7-2 §3.2.5
    * worked formulas (public). Mirrors reference behavior of
    * ST_GeomReproject/ST_CrsFromText (spatial-index/src/main/scala/com/
    * azavea/hiveless/spatial/index/ST_CrsFromText.scala:1 delegating to
    * proj4j's ObliqueStereographicAzimuthalProjection).
    *
    * Inverse: closed spherical inverse, then isometric-latitude Newton
    * iteration with a FIXED 4-step schedule — deterministic, oracle-
    * replayable, and sub-nanoradian for |φ| < 89°.
    */
  final case class Sterea(lat0: Double, lon0: Double, k0: Double,
                          fe: Double, fn: Double, name: String,
                          ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val e2 = ell.e2
    private val e = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0)
    private val lam0 = math.toRadians(lon0)
    private val s0 = math.sin(phi0)
    private val c0 = math.cos(phi0)
    // conformal-sphere radius and exponent
    private val bigR = ell.a * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
    private val n = math.sqrt(1.0 + e2 * c0 * c0 * c0 * c0 / (1.0 - e2))
    private val s1 = (1.0 + s0) / (1.0 - s0)
    private val s2 = (1.0 - e * s0) / (1.0 + e * s0)
    private val w1 = math.pow(s1 * math.pow(s2, e), n)
    private val sinChi00 = (w1 - 1.0) / (w1 + 1.0)
    private val c = (n + s0) * (1.0 - sinChi00) / ((n - s0) * (1.0 + sinChi00))
    private val w2 = c * w1
    private val chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    private val sinChi0 = math.sin(chi0)
    private val cosChi0 = math.cos(chi0)

    /** Conformal latitude χ and sphere longitude Λ of (φ, λ). */
    private def conformal(phi: Double, lam: Double): (Double, Double) = {
      val sp = math.sin(phi)
      val sa = (1.0 + sp) / (1.0 - sp)
      val sb = (1.0 - e * sp) / (1.0 + e * sp)
      val w = c * math.pow(sa * math.pow(sb, e), n)
      (math.asin((w - 1.0) / (w + 1.0)), n * (lam - lam0) + lam0)
    }

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val (chi, bigLam) = conformal(math.toRadians(lat), math.toRadians(lon))
      val dl = bigLam - lam0
      val b = 1.0 + math.sin(chi) * sinChi0 + math.cos(chi) * cosChi0 * math.cos(dl)
      (fe + 2.0 * bigR * k0 * math.cos(chi) * math.sin(dl) / b,
        fn + 2.0 * bigR * k0 * (math.sin(chi) * cosChi0 -
          math.cos(chi) * sinChi0 * math.cos(dl)) / b)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val de = x0 - fe
      val dn = y0 - fn
      val g = 2.0 * bigR * k0 * math.tan(math.Pi / 4.0 - chi0 / 2.0)
      val h = 4.0 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan2(de, h + dn)
      val j = math.atan2(de, g - dn) - i
      val chi = chi0 + 2.0 * math.atan((dn - de * math.tan(j / 2.0)) / (2.0 * bigR * k0))
      val bigLam = j + 2.0 * i + lam0
      val lam = (bigLam - lam0) / n + lam0
      // isometric latitude of the conformal sphere point, then the fixed
      // 4-iteration Newton recovery of the ellipsoidal φ
      val psi = 0.5 * math.log((1.0 + math.sin(chi)) / (c * (1.0 - math.sin(chi)))) / n
      var phi = 2.0 * math.atan(math.exp(psi)) - math.Pi / 2.0
      var it = 0
      while (it < 4) {
        val sp = math.sin(phi)
        val psiI = math.log(math.tan(phi / 2.0 + math.Pi / 4.0) *
          math.pow((1.0 - e * sp) / (1.0 + e * sp), e / 2.0))
        phi = phi - (psiI - psi) * math.cos(phi) * (1.0 - e2 * sp * sp) / (1.0 - e2)
        it += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** Krovak oblique conformal conic (EPSG method 9819; proj4
    * `+proj=krovak`): the S-JTSK grid of the Czech and Slovak republics,
    * EPSG:5514 (Krovak East North — easting = −westing Y, northing =
    * −southing X, matching PROJ's axis convention for the code). Bessel
    * ellipsoid; formulas from EPSG Guidance Note 7-2 §3.2.9 (public):
    * Gaussian sphere latitude U, rotation to the oblique pole (T, D),
    * conformal cone of pseudo-standard parallel φP with n = sin φP.
    *
    * Inverse: closed except the Gaussian-to-geodetic latitude step,
    * which uses a FIXED 4-iteration schedule (deterministic, oracle-
    * replayable).
    */
  final case class Krovak(latC: Double, lonO: Double, alphaC: Double,
                          latP: Double, kP: Double, fe: Double, fn: Double,
                          name: String,
                          ell: Ellipsoid = Ellipsoid.ByProj4Id("BESSEL")) extends Crs {
    private val e2 = ell.e2
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latC)
    private val lam0 = math.toRadians(lonO)
    private val aC = math.toRadians(alphaC)
    private val phiP = math.toRadians(latP)
    private val sC = math.sin(phiC)
    private val cC = math.cos(phiC)
    private val bigA = ell.a * math.sqrt(1.0 - e2) / (1.0 - e2 * sC * sC)
    private val bigB = math.sqrt(1.0 + e2 * cC * cC * cC * cC / (1.0 - e2))
    private val gamma0 = math.asin(sC / bigB)
    private val t0 = math.tan(math.Pi / 4.0 + gamma0 / 2.0) *
      math.pow((1.0 + e * sC) / (1.0 - e * sC), e * bigB / 2.0) /
      math.pow(math.tan(math.Pi / 4.0 + phiC / 2.0), bigB)
    private val nK = math.sin(phiP)
    private val r0 = kP * bigA / math.tan(phiP)
    private val tanPhalf = math.tan(phiP / 2.0 + math.Pi / 4.0)
    private val tanP = math.pow(tanPhalf, nK)

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lon)
      val sp = math.sin(phi)
      val u = 2.0 * (math.atan(t0 * math.pow(math.tan(phi / 2.0 + math.Pi / 4.0), bigB) /
        math.pow((1.0 + e * sp) / (1.0 - e * sp), e * bigB / 2.0)) - math.Pi / 4.0)
      val v = bigB * (lam0 - lam)
      val t = math.asin(math.cos(aC) * math.sin(u) + math.sin(aC) * math.cos(u) * math.cos(v))
      // full-range rotated longitude (atan2, not the EPSG asin spelling):
      // identical in the S-JTSK service area, but also correct for
      // far-field points whose azimuth from the oblique pole exceeds 90°
      // (the asin form folds there and the projection stops being
      // invertible)
      val d = math.atan2(math.cos(u) * math.sin(v),
        math.cos(aC) * math.cos(u) * math.cos(v) - math.sin(aC) * math.sin(u))
      val theta = nK * d
      val r = r0 * tanP / math.pow(math.tan(t / 2.0 + math.Pi / 4.0), nK)
      val xp = r * math.cos(theta) // southing
      val yp = r * math.sin(theta) // westing
      (-yp + fe, -xp + fn) // Krovak East North (EPSG:5514): E = −Y, N = −X
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val yp = -(x0 - fe) // westing
      val xp = -(y0 - fn) // southing
      val r = math.sqrt(xp * xp + yp * yp)
      val theta = math.atan2(yp, xp)
      val d = theta / nK
      val t = 2.0 * (math.atan(math.pow(r0 / r, 1.0 / nK) * tanPhalf) - math.Pi / 4.0)
      val u = math.asin(math.cos(aC) * math.sin(t) - math.sin(aC) * math.cos(t) * math.cos(d))
      val v = math.atan2(math.cos(t) * math.sin(d),
        math.cos(aC) * math.cos(t) * math.cos(d) + math.sin(aC) * math.sin(t))
      // Gaussian U → geodetic φ, fixed 4-iteration schedule
      var phi = u
      var it = 0
      while (it < 4) {
        val sp = math.sin(phi)
        phi = 2.0 * (math.atan(math.pow(1.0 / t0, 1.0 / bigB) *
          math.pow(math.tan(u / 2.0 + math.Pi / 4.0), 1.0 / bigB) *
          math.pow((1.0 + e * sp) / (1.0 - e * sp), e / 2.0)) - math.Pi / 4.0)
        it += 1
      }
      (math.toDegrees(lam0 - v / bigB), math.toDegrees(phi))
    }
  }

  /** Azimuthal equidistant on the sphere (Snyder pp. 195–197, eqs.
    * 25-1..25-4 forward, 25-15..25-18 inverse) — the range-ring /
    * "distances from here are true" projection, any aspect. PROJ's
    * ellipsoidal oblique aeqd needs full geodesics (Karney), so this
    * family is supported where closed forms exist: a sphere (`+R=…`,
    * this class) for any center, or an ellipsoid in the polar aspect
    * ([[AeqdPolar]]); the ellipsoidal-oblique spelling is rejected
    * with that guidance rather than silently run on a sphere. The
    * antipode (c = π, where every direction is correct and none is
    * unique) and its 1e-6 rad (~6 m) neighborhood throw — the guard
    * must sit above acos's resolution near −1 (acos(−1+ulp) ≈ π−1.5e-8)
    * or the exact antipode would slip through as a numerically huge
    * c/sin c.
    */
  final case class AeqdSphere(lat0: Double, lon0: Double, fe: Double, fn: Double,
                              name: String, r: Double) extends Crs {
    private val phi1 = math.toRadians(lat0)
    private val lam0 = math.toRadians(lon0)
    private val s1 = math.sin(phi1)
    private val c1 = math.cos(phi1)

    private def wrap(l: Double): Double =
      if (l > math.Pi) l - 2.0 * math.Pi else if (l < -math.Pi) l + 2.0 * math.Pi else l

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dl = wrap(math.toRadians(lon) - lam0)
      val cosC = math.max(-1.0, math.min(1.0,
        s1 * math.sin(phi) + c1 * math.cos(phi) * math.cos(dl)))      // 5-3
      val c = math.acos(cosC)
      require(c < math.Pi - 1e-6,
        s"aeqd: point ($lon, $lat) is the antipode of the projection center")
      val k = if (c < 1e-12) 1.0 else c / math.sin(c)                 // 25-2
      (r * k * math.cos(phi) * math.sin(dl) + fe,                     // 22-4
        r * k * (c1 * math.sin(phi) - s1 * math.cos(phi) * math.cos(dl)) + fn) // 22-5
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe
      val y = y0 - fn
      val rho = math.hypot(x, y)                                      // 20-18
      if (rho < 1e-9) (lon0, lat0)
      else {
        val c = rho / r                                               // 25-15
        val sinC = math.sin(c)
        val cosC = math.cos(c)
        val phi = math.asin(math.max(-1.0, math.min(1.0,
          cosC * s1 + y * sinC * c1 / rho)))                          // 20-14
        val lam = lam0 + math.atan2(x * sinC,
          rho * c1 * cosC - y * s1 * sinC)                            // 20-15
        (math.toDegrees(wrap(lam)), math.toDegrees(phi))
      }
    }
  }

  /** Azimuthal equidistant, ellipsoidal POLAR aspect (Snyder p. 197,
    * eq. 25-16: ρ = Mp ∓ M(φ) with the 3-21 meridian-arc series, the
    * same machinery [[Sinusoidal]] proves out) — the EPSG
    * "North/South Pole Azimuthal Equidistant" grids. Inverse recovers
    * φ from the arc by the standard rectifying-latitude series (3-26).
    */
  final case class AeqdPolar(north: Boolean, lon0: Double, fe: Double, fn: Double,
                             name: String, ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val lam0 = math.toRadians(lon0)

    private def meridianArc(phi: Double): Double =                     // 3-21
      A * ((1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0) * phi -
        (3.0 * E2 / 8.0 + 3.0 * E2 * E2 / 32.0 + 45.0 * E2 * E2 * E2 / 1024.0) * math.sin(2.0 * phi) +
        (15.0 * E2 * E2 / 256.0 + 45.0 * E2 * E2 * E2 / 1024.0) * math.sin(4.0 * phi) -
        (35.0 * E2 * E2 * E2 / 3072.0) * math.sin(6.0 * phi))
    private val mp = meridianArc(math.Pi / 2.0)

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val dl = math.toRadians(lon) - lam0
      val rho =
        if (north) mp - meridianArc(math.toRadians(lat))               // 25-16
        else mp + meridianArc(math.toRadians(lat))
      if (north) (rho * math.sin(dl) + fe, -rho * math.cos(dl) + fn)   // 21-30/31
      else (rho * math.sin(dl) + fe, rho * math.cos(dl) + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val x = x0 - fe
      val y = y0 - fn
      val rho = math.hypot(x, y)
      val m = if (north) mp - rho else rho - mp
      val mu = m / (A * (1.0 - E2 / 4.0 - 3.0 * E2 * E2 / 64.0 - 5.0 * E2 * E2 * E2 / 256.0))
      val e1 = (1.0 - math.sqrt(1.0 - E2)) / (1.0 + math.sqrt(1.0 - E2))
      val phi = mu +                                                   // 3-26
        (3.0 * e1 / 2.0 - 27.0 * e1 * e1 * e1 / 32.0) * math.sin(2.0 * mu) +
        (21.0 * e1 * e1 / 16.0 - 55.0 * math.pow(e1, 4) / 32.0) * math.sin(4.0 * mu) +
        (151.0 * e1 * e1 * e1 / 96.0) * math.sin(6.0 * mu) +
        (1097.0 * math.pow(e1, 4) / 512.0) * math.sin(8.0 * mu)
      val lam =
        if (rho < 1e-9) lam0
        else if (north) lam0 + math.atan2(x, -y)                       // 20-16
        else lam0 + math.atan2(x, y)                                   // 20-17
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** The Robinson projection's defining table (Robinson 1974; reproduced
    * in Snyder & Voxland, "An Album of Map Projections", USGS PP 1453):
    * per 5° of latitude, X = length of the parallel relative to the
    * equator, Y = distance of the parallel from the equator normalized
    * so Y(90°) = 1. The projection is DEFINED by this table plus an
    * interpolation rule — graft interpolates with a Catmull-Rom cubic
    * Hermite (central-difference knot slopes, one-sided at the ends),
    * which passes through every knot exactly and is C¹ and monotone on
    * this data; coefficients are closed-form functions of the knots, so
    * a SQL oracle can replay the identical arithmetic from a VALUES
    * list. (PROJ fits its own spline to the same table; the two
    * interpolants agree at every knot and differ by < 3×10⁻⁵ between
    * knots — far below cartographic relevance for a compromise
    * projection.)
    */
  object RobinsonTable {
    val X: Array[Double] = Array(
      1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600, 0.9427,
      0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597, 0.7186, 0.6732,
      0.6213, 0.5722, 0.5322)
    val Y: Array[Double] = Array(
      0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720, 0.4340,
      0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903, 0.8435, 0.8936,
      0.9394, 0.9761, 1.0000)
    val Fxc = 0.8487 // x scale: x = Fxc · R · X(φ) · λ
    val Fyc = 1.3523 // y scale: y = Fyc · R · Y(φ) · sign(φ)

    /** Knot slope d(value)/d(degree) at knot i (central differences,
      * one-sided at the ends).
      */
    def slope(t: Array[Double], i: Int): Double =
      if (i == 0) (t(1) - t(0)) / 5.0
      else if (i == 18) (t(18) - t(17)) / 5.0
      else (t(i + 1) - t(i - 1)) / 10.0

    /** Hermite cubic value at absolute latitude `ad` ∈ [0, 90] degrees. */
    def interp(t: Array[Double], ad: Double): Double = {
      val i = math.min((ad / 5.0).toInt, 17)
      val u = (ad - 5.0 * i) / 5.0
      val u2 = u * u
      val u3 = u2 * u
      (2.0 * u3 - 3.0 * u2 + 1.0) * t(i) +
        (u3 - 2.0 * u2 + u) * (5.0 * slope(t, i)) +
        (-2.0 * u3 + 3.0 * u2) * t(i + 1) +
        (u3 - u2) * (5.0 * slope(t, i + 1))
    }
  }

  /** Robinson (`+proj=robin`) — the compromise world-map projection,
    * spherical with R = a per PROJ semantics (the table is defined on a
    * sphere; PROJ substitutes the semi-major axis). Forward is the
    * table interpolation above; the inverse recovers |φ| from the
    * monotone Y interpolant by 60 bisection steps (deterministic,
    * resolves |φ| to 90/2⁶⁰ ≈ 8×10⁻¹⁷ degrees — below double rounding),
    * then λ from the X interpolant at that latitude.
    */
  final case class Robinson(lon0: Double, fe: Double, fn: Double, name: String,
                            ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    import RobinsonTable._
    private val R = ell.a
    private val lam0 = math.toRadians(lon0)

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val ad = math.min(math.abs(lat), 90.0)
      (Fxc * R * interp(X, ad) * (math.toRadians(lon) - lam0) + fe,
        Fyc * R * interp(Y, ad) * math.signum(lat) + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val yf = (y0 - fn) / (Fyc * R)
      val ayf = math.min(math.abs(yf), 1.0)
      // bisection on the strictly-increasing Y interpolant
      var lo = 0.0
      var hi = 90.0
      var it = 0
      while (it < 60) {
        val mid = (lo + hi) / 2.0
        if (interp(Y, mid) < ayf) lo = mid else hi = mid
        it += 1
      }
      val ad = (lo + hi) / 2.0
      val lam = lam0 + (x0 - fe) / (Fxc * R * interp(X, ad))
      (math.toDegrees(lam), math.copySign(ad, yf))
    }
  }

  /** Geostationary satellite view (`+proj=geos`) — the native grid of
    * GOES/Meteosat/Himawari level-1 imagery, from the public CGMS
    * LRIT/HRIT normalized-geostationary-projection spec: coordinates
    * are satellite scan angles × satellite height. Geometry is derived
    * from first principles (no series): the ground point's geocentric
    * position (geodetic→geocentric latitude, geocentric radius of the
    * ellipsoid), viewed from the satellite at (1 + h/a, 0, 0) in
    * a-normalized units; `+sweep=x` (GOES-R) vs `+sweep=y` (Meteosat,
    * PROJ default) selects which scan axis rotates first, i.e. which
    * angle gets the hypot-compensated denominator. Points behind the
    * limb (satellite→point ray not clearing the ellipsoid horizon)
    * throw; the inverse solves the quadratic ray–ellipsoid
    * intersection and takes the near root.
    */
  final case class Geos(h: Double, sweepX: Boolean, lon0: Double,
                        fe: Double, fn: Double, name: String,
                        ell: Ellipsoid = Ellipsoid.Wgs84) extends Crs {
    private val A = ell.a
    private val E2 = ell.e2
    private val radiusP = math.sqrt(1.0 - E2)     // polar radius, a-normalized
    private val radiusP2 = 1.0 - E2
    private val radiusPInv2 = 1.0 / radiusP2
    private val radiusG1 = h / A                  // satellite height, a-normalized
    private val radiusG = 1.0 + radiusG1          // satellite geocentric distance
    private val cBig = radiusG * radiusG - 1.0    // |sat|² − 1 (horizon constant)
    private val lam0 = math.toRadians(lon0)

    private def wrap(l: Double): Double =
      if (l > math.Pi) l - 2.0 * math.Pi else if (l < -math.Pi) l + 2.0 * math.Pi else l

    def fromGeo(lon: Double, lat: Double): (Double, Double) = {
      val lam = wrap(math.toRadians(lon) - lam0)
      val phiC = math.atan(radiusP2 * math.tan(math.toRadians(lat))) // geocentric lat
      // geocentric radius of the ellipsoid at φc (a-normalized)
      val r = radiusP / math.hypot(radiusP * math.cos(phiC), math.sin(phiC))
      val vx = r * math.cos(lam) * math.cos(phiC)
      val vy = r * math.sin(lam) * math.cos(phiC)
      val vz = r * math.sin(phiC)
      // visibility: the satellite→point ray must hit the near side —
      // (sat−P)·n̂(P) ≥ 0 with the ellipsoid normal ∝ (vx, vy, vz/(1−e²))
      require((radiusG - vx) * vx - vy * vy - vz * vz * radiusPInv2 >= 0.0,
        s"geos: point ($lon, $lat) is behind the limb as seen from the satellite")
      val tmp = radiusG - vx
      val (sx, sy) =
        if (sweepX) (math.atan(vy / math.hypot(vz, tmp)), math.atan(vz / tmp))
        else (math.atan(vy / tmp), math.atan(vz / math.hypot(vy, tmp)))
      (h * sx + fe, h * sy + fn)
    }

    def toGeo(x0: Double, y0: Double): (Double, Double) = {
      val xa = (x0 - fe) / h
      val ya = (y0 - fn) / h
      val vx = -1.0
      val (vy, vz) =
        if (sweepX) {
          val z = math.tan(ya)
          (math.tan(xa) * math.hypot(1.0, z), z)
        } else {
          val y = math.tan(xa)
          (y, math.tan(ya) * math.hypot(1.0, y))
        }
      // ray–ellipsoid intersection: |(radius_g + t·vx, t·vy, t·vz/p)| = 1
      val zp = vz / radiusP
      val aa = vy * vy + zp * zp + vx * vx
      val bb = 2.0 * radiusG * vx
      val det = bb * bb - 4.0 * aa * cBig
      require(det >= 0.0, s"geos: scan angle ($x0, $y0) misses the earth disk")
      val k = (-bb - math.sqrt(det)) / (2.0 * aa)
      val px = radiusG + k * vx
      val py = k * vy
      val pz = k * vz
      val lam = math.atan2(py, px)
      val phiC = math.atan(pz * math.cos(lam) / px)
      val phi = math.atan(radiusPInv2 * math.tan(phiC))
      (math.toDegrees(wrap(lam + lam0)), math.toDegrees(phi))
    }
  }

  private val UtmPattern = "EPSG:32([67])([0-9]{2})".r

  // proj4 keys that select/parameterize a projection this object can build
  private val Proj4ParamKeys = Set(
    "proj", "zone", "south", "lat_0", "lat_1", "lat_2", "lat_ts", "lon_0",
    "lonc", "alpha", "gamma", "no_off", "no_uoff",
    "k", "k_0", "x_0", "y_0", "h", "sweep")
  // keys that pin the datum/ellipsoid/units — validated, not stored
  private val Proj4GuardKeys = Set(
    "a", "b", "rf", "r", "ellps", "datum", "towgs84", "nadgrids",
    "units", "to_meter", "pm")
  // decorative flags with no numeric effect
  private val Proj4NoiseKeys = Set("no_defs", "wktext", "type")

  /** Parse a proj4 parameter string (`+proj=… +lat_0=… …`) into one of
    * the native transforms — the projection families this object already
    * implements cover the proj4 surface a warehouse actually meets:
    * longlat, merc (ellipsoidal 1SP/2SP — EPSG:3395-class — plus the
    * 3857 sphere spelling), webmerc, utm, tmerc, lcc (2SP), laea,
    * aea (2SP), polar stere, sterea, krovak, omerc (azimuth form),
    * sinu (the MODIS/land-product family), moll, cea (the EASE-Grid
    * 2.0 family), eqc, aeqd (sphere any-aspect / ellipsoid polar),
    * robin (Robinson world maps) and geos (geostationary satellite
    * imagery grids).
    * The reference hands any proj4 string to proj4j
    * (ST_CrsFromText.scala:1); without that dependency, a supported
    * subset is rebuilt on the same Snyder machinery and everything else
    * — unknown keys included — fails loudly rather than silently
    * misprojecting.
    *
    * Datums: WGS84/GRS80 work as before (no shift). Legacy datums are
    * supported through `+ellps=` (clrk66/airy/intl/bessel/krass, or a
    * custom `+a=`/`+rf=`/`+b=` pair) combined with an explicit 3- or
    * 7-parameter `+towgs84=` Helmert tie ([[Helmert]], position-vector
    * convention) — the projection then runs on the source ellipsoid and
    * the geographic side of the CRS stays WGS84, matching the
    * reference's proj4j behavior for NAD27-class grids. A non-WGS84
    * ellipsoid WITHOUT `+towgs84` is rejected (the datum tie would be a
    * silent guess); non-meter units and non-Greenwich prime meridians
    * are rejected as before.
    */
  private def parseProj4(raw: String): Crs = {
    val kv = scala.collection.mutable.LinkedHashMap.empty[String, String]
    raw.trim.split("\\s+").foreach { tok =>
      require(tok.startsWith("+"), s"proj4 token '$tok' must start with '+'")
      tok.drop(1).split("=", 2) match {
        case Array(k, v) => kv(k.toLowerCase) = v
        case Array(k)    => kv(k.toLowerCase) = ""
      }
    }
    val unknown = kv.keySet.diff(Proj4ParamKeys ++ Proj4GuardKeys ++ Proj4NoiseKeys)
    require(unknown.isEmpty,
      s"Unsupported proj4 parameter(s) ${unknown.mkString("+", " +", "")} in '$raw'")
    def num(k: String, dflt: Double): Double =
      kv.get(k).map(_.toDouble).getOrElse(dflt)
    val proj = kv.getOrElse("proj", throw new IllegalArgumentException(
      s"proj4 string '$raw' has no +proj"))

    // ellipsoid: named +ellps/+datum, custom +a with +rf/+b, or a +R
    // sphere (MODIS-class authalic grids, e.g. +proj=sinu +R=6371007.181:
    // per PROJ practice — usually spelled with +nadgrids=@null — sphere
    // geographic coordinates pass through as WGS84 lon/lat with NO datum
    // transformation, so +R composes with the projection math at e = 0
    // and never wraps in a Helmert chain)
    val sphere = kv.contains("a") && kv.get("a") == kv.get("b")
    val rSphere = kv.contains("r")
    require(!(rSphere && kv.contains("towgs84")),
      "+R (sphere) and +towgs84 cannot combine — a sphere radius carries no datum tie")
    // +nadgrids: '@null' alone is the identity tie (sphere grids, see
    // above). Anything else is a comma list of NTv2 .gsb paths — the
    // grids are concatenated and the densest sub-grid containing a
    // point wins (PROJ's parent/child refinement semantics). An '@'
    // prefix marks a grid optional (silently skipped when unreadable,
    // per PROJ); a missing non-optional file throws with a ship-the-
    // file hint.
    val nadGrid: Option[NTv2.Grid] = kv.get("nadgrids").filterNot(_ == "@null").map { v =>
      require(!kv.contains("towgs84"),
        "+nadgrids and +towgs84 cannot combine (two competing datum ties)")
      val loaded = v.split(",").toVector.flatMap { g0 =>
        val optional = g0.startsWith("@")
        val path = if (optional) g0.drop(1) else g0
        if (path == "null") Vector.empty
        else if (optional &&
          !java.nio.file.Files.isReadable(java.nio.file.Paths.get(path))) Vector.empty
        else Vector(NTv2.load(path))
      }
      require(loaded.nonEmpty, s"+nadgrids=$v resolved to no usable grid")
      if (loaded.size == 1) loaded.head else NTv2.Grid(loaded.flatMap(_.subs))
    }
    val ell: Ellipsoid = {
      val named = kv.get("ellps").orElse(kv.get("datum")).map(_.toUpperCase)
      named match {
        case Some(id) =>
          Ellipsoid.ByProj4Id.getOrElse(id, throw new IllegalArgumentException(
            s"Unsupported ellipsoid/datum '$id' (supported: ${Ellipsoid.ByProj4Id.keys.toSeq.sorted.mkString(", ")}, or explicit +a= with +rf=/+b=)"))
        case None if rSphere =>
          val r = num("r", A)
          require(r > 6e6 && r < 7e6, s"Implausible sphere radius +R=$r")
          Ellipsoid(r, 0.0, s"R=${kv("r")}")
        case None if kv.contains("a") && !sphere =>
          val a = num("a", A)
          val f =
            if (kv.contains("rf")) 1.0 / num("rf", 1.0 / F)
            else if (kv.contains("b")) 1.0 - num("b", A * (1.0 - F)) / a
            else F
          require(a > 6e6 && a < 7e6 && f >= 0.0 && f < 0.01,
            s"Implausible ellipsoid +a=$a 1/f=${if (f == 0.0) "inf" else (1.0 / f).toString}")
          // near-WGS84 spellings (+a/+b/+rf within rounding, incl. GRS80's
          // 1.6e-11 flattening difference) collapse to the exact WGS84
          // instance, preserving the pre-datum-shift acceptance of those
          if (math.abs(a - A) < 1e-3 && math.abs(f - F) < 1e-9) Ellipsoid.Wgs84
          else Ellipsoid(a, f, s"a=${kv("a")},1/f=${1.0 / f}")
        case None => Ellipsoid.Wgs84
      }
    }
    if (sphere)
      require(num("a", A) == A, s"Unsupported sphere radius ${kv("a")} (EPSG:3857 R=$A only)")

    // datum tie: +towgs84 (3 or 7 comma-separated values)
    val helmert: Helmert = kv.get("towgs84") match {
      case Some(v) =>
        val ps = v.split(",").map(_.trim.toDouble)
        require(ps.length == 3 || ps.length == 7,
          s"+towgs84=$v must have 3 or 7 parameters")
        val p = ps.padTo(7, 0.0)
        Helmert(p(0), p(1), p(2), p(3), p(4), p(5), p(6))
      case None =>
        require((ell eq Ellipsoid.Wgs84) || rSphere || nadGrid.nonEmpty,
          s"+ellps=${ell.id} requires an explicit datum tie to WGS84 — +towgs84 " +
            "or +nadgrids — (a legacy-ellipsoid CRS without one would silently guess the datum)")
        Helmert(0, 0, 0, 0, 0, 0, 0)
    }
    // linear unit of the PROJECTED coordinates (r11 — the US State
    // Plane ftUS zones' surface): +to_meter wins over +units when both
    // are spelled (the PROJ precedence); +x_0/+y_0 stay meter-valued
    // and the unit scales the output (also PROJ's convention)
    val toMeter: Double = kv.get("to_meter").map(_.toDouble).getOrElse(
      kv.get("units") match {
        case None | Some("m") => 1.0
        case Some("us-ft")    => 1200.0 / 3937.0 // exact US survey foot
        case Some("ft")       => 0.3048          // exact international foot
        case Some(u) => throw new IllegalArgumentException(
          s"Unsupported +units=$u (m, ft, us-ft, or an explicit +to_meter)")
      })
    require(toMeter > 0.0 && toMeter.isFinite, s"Implausible +to_meter=$toMeter")
    kv.get("pm").foreach(v => require(v == "0" || v.equalsIgnoreCase("greenwich"),
      s"Unsupported prime meridian +pm=$v"))
    // a shifted datum wraps the base projection (built on the source
    // ellipsoid); identity shift on WGS84 keeps the unwrapped transform;
    // +R spheres are identity-tied by definition (see above); a grid
    // tie supersedes the Helmert wrap entirely (the grid is the whole
    // geographic-domain mapping — no geocentric leg)
    val shifted = nadGrid.isEmpty &&
      (!helmert.isIdentity || (!(ell eq Ellipsoid.Wgs84) && !rSphere))

    // canonical name: the parameters that define the transform, fixed order
    def fmt(d: Double): String =
      if (d == d.toLong && math.abs(d) < 1e15) d.toLong.toString else d.toString
    def mkName(params: (String, Double)*): String =
      s"+proj=$proj " + params.map { case (k, v) => s"+$k=${fmt(v)}" }.mkString(" ") +
        (if (nadGrid.nonEmpty)
           s" +ellps=${ell.id} +nadgrids=${kv("nadgrids")}"
         else if (shifted)
           s" +ellps=${ell.id} +towgs84=${Seq(helmert.dx, helmert.dy, helmert.dz,
             helmert.rxSec, helmert.rySec, helmert.rzSec, helmert.dsPpm).map(fmt).mkString(",")}"
         else if (rSphere) s" +R=${fmt(ell.a)}"
         else " +ellps=WGS84")
    def datumWrap(base: Crs): Crs = nadGrid match {
      case Some(g) => GridShifted(base, g, base.name)
      case None    => if (shifted) DatumShifted(base, ell, helmert, base.name) else base
    }

    val built: Crs = proj match {
      case "longlat" | "latlong" =>
        require(toMeter == 1.0, "+proj=longlat is angular — +units/+to_meter do not apply")
        require(num("lon_0", 0.0) == 0.0, "+proj=longlat with a shifted +lon_0 is not supported")
        nadGrid match {
          case Some(g) => GridShifted(LonLat, g, mkName())
          case None =>
            if (shifted) DatumShifted(LonLat, ell, helmert, mkName()) else LonLat
        }
      case "merc" =>
        val latTs = num("lat_ts", 0.0)
        val k0 = num("k", num("k_0", 1.0))
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        if (sphere) {
          // the legacy +a=+b spelling of the web-mercator sphere keeps the
          // named EPSG:3857 fast path (radius pinned to A above)
          require(!shifted && nadGrid.isEmpty && k0 == 1.0 && latTs == 0.0 &&
            lon0 == 0.0 && fe == 0.0 && fn == 0.0,
            "+proj=merc on the +a=+b sphere is supported only with EPSG:3857 parameters")
          WebMercator
        } else {
          // ellipsoidal Mercator (EPSG:3395-class) — or spherical via +R (e = 0)
          datumWrap(Mercator(latTs, k0, lon0, fe, fn,
            mkName("lat_ts" -> latTs, "k_0" -> k0, "lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn),
            ell))
        }
      case "webmerc" =>
        // PROJ 6+ canonical spelling of EPSG:3857 (+proj=webmerc +datum=WGS84)
        require(!shifted && nadGrid.isEmpty && num("lon_0", 0.0) == 0.0 &&
          num("x_0", 0.0) == 0.0 && num("y_0", 0.0) == 0.0,
          "+proj=webmerc is supported only with EPSG:3857 parameters")
        WebMercator
      case "utm" =>
        val zone = kv.getOrElse("zone", throw new IllegalArgumentException(
          "+proj=utm requires +zone")).toInt
        require(num("x_0", FalseEasting) == FalseEasting && num("k", K0) == K0,
          "+proj=utm with non-UTM +x_0/+k is not supported (use +proj=tmerc)")
        val north = !kv.contains("south")
        if (!shifted && nadGrid.isEmpty) Utm(zone, north)
        else { // e.g. ED50 / NAD27 UTM: the same zone grid on the legacy ellipsoid
          require(zone >= 1 && zone <= 60, s"UTM zone $zone out of range 1–60")
          val nm = mkName("zone" -> zone.toDouble) + (if (north) "" else " +south")
          val base = Tmerc(0.0, -183.0 + 6.0 * zone, K0, FalseEasting,
            if (north) 0.0 else FalseNorthingSouth, nm, ell)
          nadGrid match {
            case Some(g) => GridShifted(base, g, nm)
            case None    => DatumShifted(base, ell, helmert, nm)
          }
        }
      case "tmerc" =>
        val (lat0, lon0, k0) = (num("lat_0", 0.0), num("lon_0", 0.0), num("k", num("k_0", 1.0)))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Tmerc(lat0, lon0, k0, fe, fn,
          mkName("lat_0" -> lat0, "lon_0" -> lon0, "k_0" -> k0, "x_0" -> fe, "y_0" -> fn),
          ell))
      case "lcc" =>
        require(kv.contains("lat_1") && kv.contains("lat_2"),
          "+proj=lcc is supported in the 2-standard-parallel form (+lat_1 and +lat_2)")
        val (lat1, lat2) = (num("lat_1", 0.0), num("lat_2", 0.0))
        val (lat0, lon0) = (num("lat_0", lat1), num("lon_0", 0.0))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Lcc2sp(lat1, lat2, lat0, lon0, fe, fn,
          mkName("lat_1" -> lat1, "lat_2" -> lat2, "lat_0" -> lat0, "lon_0" -> lon0,
            "x_0" -> fe, "y_0" -> fn),
          ell))
      case "laea" =>
        val (lat0, lon0) = (num("lat_0", 0.0), num("lon_0", 0.0))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Laea(lat0, lon0, fe, fn,
          mkName("lat_0" -> lat0, "lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn),
          ell))
      case "aea" =>
        require(kv.contains("lat_1") && kv.contains("lat_2"),
          "+proj=aea requires both standard parallels (+lat_1 and +lat_2)")
        val (lat1, lat2) = (num("lat_1", 0.0), num("lat_2", 0.0))
        val (lat0, lon0) = (num("lat_0", 0.0), num("lon_0", 0.0))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Aea(lat1, lat2, lat0, lon0, fe, fn,
          mkName("lat_1" -> lat1, "lat_2" -> lat2, "lat_0" -> lat0, "lon_0" -> lon0,
            "x_0" -> fe, "y_0" -> fn),
          ell))
      case "omerc" =>
        require(kv.contains("alpha"),
          "+proj=omerc is supported in the azimuth form (+lat_0 +lonc +alpha " +
            "[+gamma] [+no_off]); the two-point form (+lat_1/+lon_1/+lat_2/+lon_2) is not")
        val lat0 = num("lat_0", 0.0)
        val lonc = num("lonc", 0.0)
        val alpha = num("alpha", 0.0)
        val gamma = num("gamma", alpha)
        val k0 = num("k", num("k_0", 1.0))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        val noOff = kv.contains("no_off") || kv.contains("no_uoff")
        datumWrap(Omerc(lat0, lonc, alpha, gamma, k0, fe, fn, noOff,
          mkName("lat_0" -> lat0, "lonc" -> lonc, "alpha" -> alpha,
            "gamma" -> gamma, "k_0" -> k0, "x_0" -> fe, "y_0" -> fn) +
            (if (noOff) " +no_off" else ""),
          ell))
      case "sterea" =>
        val (lat0, lon0) = (num("lat_0", 0.0), num("lon_0", 0.0))
        val k0 = num("k", num("k_0", 1.0))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Sterea(lat0, lon0, k0, fe, fn,
          mkName("lat_0" -> lat0, "lon_0" -> lon0, "k_0" -> k0,
            "x_0" -> fe, "y_0" -> fn),
          ell))
      case "krovak" =>
        // PROJ defaults krovak to the Bessel ellipsoid; silently building
        // it on WGS84 here would misproject by ~100 m, so the ellipsoid
        // must be spelled out (with its datum tie, per the usual guard)
        require(kv.contains("ellps") || kv.contains("datum") || kv.contains("a"),
          "+proj=krovak requires an explicit ellipsoid (PROJ defaults it to " +
            "bessel — spell +ellps=bessel +towgs84=...)")
        val latC = num("lat_0", 49.5)
        val lonO = num("lon_0", 24.833333333333332)
        val alphaC = num("alpha", 30.28813972222222)
        val k0 = num("k", num("k_0", 0.9999))
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        // the pseudo-standard parallel is a fixed 78.5° in PROJ (not a
        // parameter); EPSG method 9819 lists it explicitly
        datumWrap(Krovak(latC, lonO, alphaC, 78.5, k0, fe, fn,
          mkName("lat_0" -> latC, "lon_0" -> lonO, "alpha" -> alphaC,
            "k_0" -> k0, "x_0" -> fe, "y_0" -> fn),
          ell))
      case "sinu" =>
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Sinusoidal(lon0, fe, fn,
          mkName("lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn), ell))
      case "moll" =>
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Mollweide(lon0, fe, fn,
          mkName("lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn), ell))
      case "cea" =>
        require(!kv.contains("k") && !kv.contains("k_0"),
          "+proj=cea with an explicit scale is not supported (parameterize via +lat_ts)")
        val latTs = num("lat_ts", 0.0)
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Cea(latTs, lon0, fe, fn,
          mkName("lat_ts" -> latTs, "lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn), ell))
      case "eqc" =>
        val latTs = num("lat_ts", 0.0)
        val lat0 = num("lat_0", 0.0)
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Eqc(latTs, lat0, lon0, fe, fn,
          mkName("lat_ts" -> latTs, "lat_0" -> lat0, "lon_0" -> lon0,
            "x_0" -> fe, "y_0" -> fn), ell))
      case "stere" =>
        val lat0 = num("lat_0", 90.0)
        require(math.abs(lat0) == 90.0,
          "+proj=stere is supported in the polar aspect only (+lat_0=90 or -90)")
        val latTs = num("lat_ts", lat0)
        require(math.abs(latTs) < 90.0,
          "+proj=stere requires a standard parallel +lat_ts strictly between the poles " +
            "(variant B; the +k_0 variant A form is not supported)")
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(PolarStereo(north = lat0 > 0, latTs = latTs, lon0 = lon0,
          name = mkName("lat_0" -> lat0, "lat_ts" -> latTs, "lon_0" -> lon0,
            "x_0" -> fe, "y_0" -> fn),
          fe = fe, fn = fn, ell = ell))
      case "aeqd" =>
        val lat0 = num("lat_0", 0.0)
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        if (ell.e2 == 0.0) // a +R sphere: any aspect, closed form
          datumWrap(AeqdSphere(lat0, lon0, fe, fn,
            mkName("lat_0" -> lat0, "lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn),
            ell.a))
        else if (math.abs(lat0) == 90.0) // ellipsoidal polar: meridian-arc form
          datumWrap(AeqdPolar(north = lat0 > 0, lon0, fe, fn,
            mkName("lat_0" -> lat0, "lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn),
            ell))
        else throw new IllegalArgumentException(
          "+proj=aeqd on an ellipsoid is supported in the polar aspect only " +
            "(+lat_0=90 or -90); the oblique ellipsoidal form needs full geodesics — " +
            "spell a sphere (+R=6371008.8) for range-ring use-cases")
      case "robin" =>
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Robinson(lon0, fe, fn,
          mkName("lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn), ell))
      case "geos" =>
        val hSat = kv.getOrElse("h", throw new IllegalArgumentException(
          "+proj=geos requires the satellite height +h (e.g. +h=35785831)")).toDouble
        require(hSat > 1e6, s"Implausible satellite height +h=$hSat")
        val sweep = kv.getOrElse("sweep", "y")
        require(sweep == "x" || sweep == "y", s"+sweep=$sweep must be x or y")
        val lon0 = num("lon_0", 0.0)
        val (fe, fn) = (num("x_0", 0.0), num("y_0", 0.0))
        datumWrap(Geos(hSat, sweepX = sweep == "x", lon0, fe, fn,
          mkName("h" -> hSat, "lon_0" -> lon0, "x_0" -> fe, "y_0" -> fn) +
            s" +sweep=$sweep",
          ell))
      case other => throw new IllegalArgumentException(
        s"Unsupported +proj=$other (supported: longlat, merc, webmerc, utm, tmerc, lcc, laea, aea, stere, sterea, krovak, omerc, sinu, moll, cea, eqc, aeqd, robin, geos)")
    }
    if (toMeter == 1.0) built
    else UnitScaled(built, toMeter, s"${built.name} +to_meter=$toMeter")
  }

  /** EPSG code → proj4 parameters for the IMPLEMENTED families — the
    * registry that closes the last practical gap vs the reference's
    * geotrellis-proj4 full EPSG database (ST_CrsFromText.scala:1): a
    * user can name a common national grid BY CODE and have it resolve
    * onto the existing transforms through [[parseProj4]], instead of
    * spelling the proj4 string out. Parameter values follow the public
    * EPSG registry / PROJ database spellings. Codes outside the table
    * (or whose family is not implemented) keep the loud
    * unsupported-CRS error — never a silent guess.
    */
  private def epsgProj4(code: Int): Option[String] = code match {
    // ETRS89 / UTM zones 28–38N (the European grid family)
    case c if c >= 25828 && c <= 25838 =>
      Some(s"+proj=utm +zone=${c - 25800} +ellps=GRS80 +towgs84=0,0,0")
    // NAD83 / UTM zones 3–23N (North America)
    case c if c >= 26903 && c <= 26923 =>
      Some(s"+proj=utm +zone=${c - 26900} +ellps=GRS80 +towgs84=0,0,0")
    // NAD27 / UTM zones 3–22N (legacy North America, Clarke 1866)
    case c if c >= 26703 && c <= 26722 =>
      Some(s"+proj=utm +zone=${c - 26700} +ellps=clrk66 +towgs84=-8,160,176")
    // ED50 / UTM zones 28–38N (legacy Europe, International 1924)
    case c if c >= 23028 && c <= 23038 =>
      Some(s"+proj=utm +zone=${c - 23000} +ellps=intl +towgs84=-87,-98,-121")
    // GDA94 / MGA zones 49–56 (Australia, southern hemisphere)
    case c if c >= 28349 && c <= 28356 =>
      Some(s"+proj=utm +zone=${c - 28300} +south +ellps=GRS80 +towgs84=0,0,0")
    // GDA2020 / MGA zones 46–59
    case c if c >= 7846 && c <= 7859 =>
      Some(s"+proj=utm +zone=${c - 7800} +south +ellps=GRS80 +towgs84=0,0,0")
    // DHDN / Gauss-Krüger zones 2–5 (legacy Germany, Bessel 1841)
    case c if c >= 31466 && c <= 31469 =>
      val z = c - 31464
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${3 * z} +k=1 " +
        s"+x_0=${z * 1000000 + 500000} +y_0=0 +ellps=bessel " +
        "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7")
    // JGD2011 / Japan Plane Rectangular CS zones I–XIX (r12): the
    // statutory tmerc series (k₀ = 0.9999, zero false origin, GRS80);
    // zone origins are the published Survey-Act table — irregular by
    // design (islands get their own origins), so a lookup, not a
    // formula. JGD2011 is ITRF-aligned: +towgs84=0,0,0
    // JGD2000 / Japan Plane Rectangular CS zones I–XIX (r15,
    // 2443–2461) share the SAME case: JGD2000 (ITRF94) and JGD2011
    // (ITRF2008) differ only by the post-Tōhoku crustal adjustment,
    // zero at this registry's parameter precision, so both are null
    // ties on GRS80 — ONE proj string by construction (sp_jprcs pins
    // the twin ranges equal; keeping a single spelling makes that
    // equality structural instead of copy-maintained)
    case c if (c >= 6669 && c <= 6687) || (c >= 2443 && c <= 2461) =>
      val i = if (c >= 6669) c - 6669 else c - 2443
      Some(s"+proj=tmerc +lat_0=${JprcsLat0(i)} +lon_0=${JprcsLon0(i)} " +
        "+k=0.9999 +x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0")
    // CGCS2000 / Gauss-Krüger (r15): China's national TM series on the
    // CGCS2000 ellipsoid (a = 6378137, 1/f = 298.257222101 — GRS80 at
    // this registry's parameter precision; ITRF-aligned, so a null
    // tie). Both families carry the ZONE-PREFIXED false easting
    // zone·10⁶ + 500000 at k₀ = 1, lat₀ = 0 — the Gauss-Krüger
    // signature that distinguishes them from UTM. 4491–4501 are the
    // 6° zones 13–23 (CM 75°E…135°E = 6n−3); 4513–4533 the 3° zones
    // 25–45 (CM 75°E…135°E = 3m).
    case c if c >= 4491 && c <= 4501 =>
      val n = c - 4491 + 13
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${6 * n - 3} +k=1 " +
        s"+x_0=${n * 1000000 + 500000} +y_0=0 +ellps=GRS80 +towgs84=0,0,0")
    case c if c >= 4513 && c <= 4533 =>
      val m = c - 4513 + 25
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${3 * m} +k=1 " +
        s"+x_0=${m * 1000000 + 500000} +y_0=0 +ellps=GRS80 +towgs84=0,0,0")
    // ...and their "CM" (no-zone-prefix) twins — EPSG registers both
    // spellings of every belt; the CM rows are the plain FE = 500 km
    // grids GIS exports usually carry. 4502–4512 = 6° CM 75°E…135°E,
    // 4534–4554 = 3° CM 75°E…135°E
    case c if c >= 4502 && c <= 4512 =>
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${6 * (c - 4502 + 13) - 3} +k=1 " +
        "+x_0=500000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0")
    case c if c >= 4534 && c <= 4554 =>
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${3 * (c - 4534 + 25)} +k=1 " +
        "+x_0=500000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0")
    // Pulkovo 1942 / Gauss-Krüger zones 2–32 (r15b): the legacy
    // Krassowsky-1940 national series the ex-USSR archives are keyed
    // in — CM 6n−3, zone-prefixed FE n·10⁶ + 500000, k₀ = 1, with the
    // published Russia-wide 7-parameter Helmert (EPSG transformation
    // 1254: Pulkovo 1942 → WGS 84 (16)). Zones 31–32 have central
    // meridians past 180° (183°/189°) — resolvable BY CODE like the
    // rest, but service-area longitudes there sit across the
    // antimeridian, so callers feed lon in the zone's own frame
    case c if c >= 28402 && c <= 28432 =>
      val n = c - 28400
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${6 * n - 3} +k=1 " +
        s"+x_0=${n * 1000000 + 500000} +y_0=0 +ellps=krass " +
        "+towgs84=23.92,-141.27,-80.9,0,0.35,0.82,-0.12")
    // SIRGAS 2000 / UTM (r12): the South-American national series —
    // 31965–31976 are zones 11N–22N, 31977–31985 zones 17S–25S
    // (Brazil's workhorses 31982/31983 = 22S/23S); GRS80, ITRF-aligned
    case c if c >= 31965 && c <= 31976 =>
      Some(s"+proj=utm +zone=${c - 31954} +ellps=GRS80 +towgs84=0,0,0")
    case c if c >= 31977 && c <= 31985 =>
      Some(s"+proj=utm +zone=${c - 31960} +south +ellps=GRS80 +towgs84=0,0,0")
    // Korea 2000 / 2010 belts (r12): lat₀ = 38, k₀ = 1, FE 200 km,
    // FN 600 km, lon₀ = 125/127/129/131 (West/Central/East/East Sea)
    case c if c >= 5185 && c <= 5188 =>
      Some(s"+proj=tmerc +lat_0=38 +lon_0=${125 + 2 * (c - 5185)} +k=1 " +
        "+x_0=200000 +y_0=600000 +ellps=GRS80 +towgs84=0,0,0")
    // NAD83 / MTM zones 1–17 (Canadian Modified Transverse Mercator:
    // 3°-wide belts at k₀ = 0.9999 with FE 304800 m = 1,000,000 ft
    // exactly; the published central-meridian series is irregular at
    // the Newfoundland (1–3) and Ontario re-cover (12–17) ends, so it
    // is a lookup, not an affine zone formula)
    case c if c >= 32181 && c <= 32197 =>
      Some(s"+proj=tmerc +lat_0=0 +lon_0=${MtmLon0(c - 32181)} +k=0.9999 " +
        "+x_0=304800 +y_0=0 +ellps=GRS80 +towgs84=0,0,0")
    case other => EpsgSingles.get(other)
  }

  private val MtmLon0: Vector[Double] = Vector(
    -53.0, -56.0, -58.5, -61.5, -64.5, -67.5, -70.5, -73.5, -76.5,
    -79.5, -82.5, -81.0, -84.0, -87.0, -90.0, -93.0, -96.0)

  // Japan Plane Rectangular CS I–XIX origins (Survey Act appendix;
  // minutes as exact repeating decimals: 10′ = .1666…7, 20′ = .333…,
  // 50′ = .8333…). Index 0 = zone I = EPSG:6669.
  private val JprcsLat0: Vector[Double] = Vector(
    33.0, 33.0, 36.0, 33.0, 36.0, 36.0, 36.0, 36.0, 36.0,
    40.0, 44.0, 44.0, 44.0, 26.0, 26.0, 26.0, 26.0, 20.0, 26.0)
  private val JprcsLon0: Vector[Double] = Vector(
    129.5, 131.0, 132.16666666666666, 133.5, 134.33333333333334,
    136.0, 137.16666666666666, 138.5, 139.8333333333333,
    140.83333333333334, 140.25, 142.25, 144.25, 142.0, 127.5,
    124.0, 131.0, 136.0, 154.0)

  private val EpsgSingles: Map[Int, String] = Map(
    // geographic CRSs on non-WGS84 datums
    4258 -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",  // ETRS89
    4490 -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",  // CGCS2000
    4269 -> "+proj=longlat +ellps=GRS80 +towgs84=0,0,0",  // NAD83
    4267 -> "+proj=longlat +ellps=clrk66 +towgs84=-8,160,176", // NAD27
    4277 -> ("+proj=longlat +ellps=airy " +
      "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489"), // OSGB36
    // national transverse-mercator grids
    27700 -> ("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.06,0.15,0.247,0.842,-20.489"), // British National Grid
    2157 -> ("+proj=tmerc +lat_0=53.5 +lon_0=-8 +k=0.99982 " +
      "+x_0=600000 +y_0=750000 +ellps=GRS80 +towgs84=0,0,0"), // Irish TM
    2180 -> ("+proj=tmerc +lat_0=0 +lon_0=19 +k=0.9993 " +
      "+x_0=500000 +y_0=-5300000 +ellps=GRS80 +towgs84=0,0,0"), // Poland CS92
    2193 -> ("+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 " +
      "+x_0=1600000 +y_0=10000000 +ellps=GRS80 +towgs84=0,0,0"), // NZTM2000
    // (JGD2011 zone IX / EPSG:6677 moved into the 6669–6687 family)
    5179 -> ("+proj=tmerc +lat_0=38 +lon_0=127.5 +k=0.9996 " +
      "+x_0=1000000 +y_0=2000000 +ellps=GRS80 +towgs84=0,0,0"), // Korea 2000 / Unified CS
    3414 -> ("+proj=tmerc +lat_0=1.366666666666667 +lon_0=103.8333333333333 " +
      "+k=1 +x_0=28001.642 +y_0=38744.572 +ellps=WGS84"), // SVY21 / Singapore TM
    3057 -> ("+proj=lcc +lat_1=64.25 +lat_2=65.75 +lat_0=65 +lon_0=-19 " +
      "+x_0=500000 +y_0=500000 +ellps=GRS80 +towgs84=0,0,0"), // ISN93 / Lambert 1993 (Iceland)
    3067 -> "+proj=utm +zone=35 +ellps=GRS80 +towgs84=0,0,0", // ETRS89 / TM35FIN
    // Lambert conformal conic grids
    3034 -> ("+proj=lcc +lat_1=35 +lat_2=65 +lat_0=52 +lon_0=10 " +
      "+x_0=4000000 +y_0=2800000 +ellps=GRS80 +towgs84=0,0,0"), // ETRS89 LCC Europe
    3347 -> ("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=63.390675 " +
      "+lon_0=-91.86666666666666 +x_0=6200000 +y_0=3000000 " +
      "+ellps=GRS80 +towgs84=0,0,0"), // Statistics Canada Lambert
    3978 -> ("+proj=lcc +lat_1=49 +lat_2=77 +lat_0=49 +lon_0=-95 " +
      "+x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // NAD83 / Canada Atlas Lambert
    6622 -> ("+proj=lcc +lat_1=60 +lat_2=46 +lat_0=44 +lon_0=-68.5 " +
      "+x_0=800000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // NAD83(CSRS) / Quebec Lambert (FE 800 km, conversion 19944)
    32198 -> ("+proj=lcc +lat_1=60 +lat_2=46 +lat_0=44 +lon_0=-68.5 " +
      "+x_0=800000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // NAD83 / Quebec Lambert (same conversion 19944)
    5243 -> ("+proj=lcc +lat_1=48.66666666666666 +lat_2=53.66666666666666 " +
      "+lat_0=51 +lon_0=10.5 +x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // ETRS89 LCC Germany
    31370 -> ("+proj=lcc +lat_1=51.16666723333333 +lat_2=49.8333339 " +
      "+lat_0=90 +lon_0=4.367486666666666 +x_0=150000.013 +y_0=5400088.438 " +
      "+ellps=intl " +
      "+towgs84=-106.8686,52.2978,-103.7239,0.3366,-0.457,1.8422,-1.2747"), // Belgian Lambert 72
    // azimuthal / equal-area / world grids
    3575 -> "+proj=laea +lat_0=90 +lon_0=10 +x_0=0 +y_0=0 +ellps=WGS84", // North Pole LAEA Europe
    3573 -> "+proj=laea +lat_0=90 +lon_0=-100 +x_0=0 +y_0=0 +ellps=WGS84", // North Pole LAEA Canada
    3574 -> "+proj=laea +lat_0=90 +lon_0=-40 +x_0=0 +y_0=0 +ellps=WGS84", // North Pole LAEA Atlantic
    6931 -> "+proj=laea +lat_0=90 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",  // EASE-Grid 2.0 North
    6932 -> "+proj=laea +lat_0=-90 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84", // EASE-Grid 2.0 South
    6933 -> "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84",  // EASE-Grid 2.0 Global
    3976 -> ("+proj=stere +lat_0=-90 +lat_ts=-70 +lon_0=0 " +
      "+x_0=0 +y_0=0 +ellps=WGS84"), // WGS84 NSIDC Sea Ice South
    3995 -> ("+proj=stere +lat_0=90 +lat_ts=71 +lon_0=0 " +
      "+x_0=0 +y_0=0 +ellps=WGS84"), // Arctic Polar Stereographic
    3577 -> ("+proj=aea +lat_1=-18 +lat_2=-36 +lat_0=0 +lon_0=132 " +
      "+x_0=0 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // GDA94 Australian Albers
    3310 -> ("+proj=aea +lat_1=34 +lat_2=40.5 +lat_0=0 +lon_0=-120 " +
      "+x_0=0 +y_0=-4000000 +ellps=GRS80 +towgs84=0,0,0"), // NAD83 / California Albers
    3395 -> "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84", // World Mercator
    4087 -> ("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 " +
      "+x_0=0 +y_0=0 +ellps=WGS84"), // World Equidistant Cylindrical
    // US State Plane (NAD83, meters) — the r10 opportunistic-growth
    // subset (r9 verdict task 8): the most-asked-for LCC and TM zones,
    // parameter spellings from the public EPSG registry / PROJ database
    26945 -> ("+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 " +
      "+lat_0=33.5 +lon_0=-118 +x_0=2000000 +y_0=500000 " +
      "+ellps=GRS80 +towgs84=0,0,0"), // California zone 5
    26985 -> ("+proj=lcc +lat_1=39.45 +lat_2=38.3 +lat_0=37.66666666666666 " +
      "+lon_0=-77 +x_0=400000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // Maryland
    26986 -> ("+proj=lcc +lat_1=42.68333333333333 +lat_2=41.71666666666667 " +
      "+lat_0=41 +lon_0=-71.5 +x_0=200000 +y_0=750000 " +
      "+ellps=GRS80 +towgs84=0,0,0"), // Massachusetts Mainland
    32139 -> ("+proj=lcc +lat_1=31.88333333333333 +lat_2=30.11666666666667 " +
      "+lat_0=29.66666666666667 +lon_0=-100.3333333333333 " +
      "+x_0=700000 +y_0=3000000 +ellps=GRS80 +towgs84=0,0,0"), // Texas Central
    32118 -> ("+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666 " +
      "+lat_0=40.16666666666666 +lon_0=-74 +x_0=300000 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0"), // New York Long Island
    32112 -> ("+proj=tmerc +lat_0=31 +lon_0=-104.33333333333333 " +
      "+k=0.9999090909090909 +x_0=165000 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0"), // New Mexico East
    32115 -> ("+proj=tmerc +lat_0=38.83333333333334 +lon_0=-74.5 +k=0.9999 " +
      "+x_0=150000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // New York East
    26971 -> ("+proj=tmerc +lat_0=36.66666666666666 +lon_0=-88.33333333333333 " +
      "+k=0.999975 +x_0=300000 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0"), // Illinois East
    // US State Plane ftUS twins (r11 — the unit-conversion surface):
    // identical projection parameters to the meter zones above with
    // meter-valued false origins converted from the registry's ftUS
    // values and +units=us-ft scaling the published coordinates
    2229 -> ("+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 " +
      "+lat_0=33.5 +lon_0=-118 +x_0=2000000.0001016 +y_0=500000.0001016002 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // California zone 5 (ftUS)
    2263 -> ("+proj=lcc +lat_1=41.03333333333333 +lat_2=40.66666666666666 " +
      "+lat_0=40.16666666666666 +lon_0=-74 +x_0=300000.0000000001 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // New York Long Island (ftUS)
    2277 -> ("+proj=lcc +lat_1=31.88333333333333 +lat_2=30.11666666666667 " +
      "+lat_0=29.66666666666667 +lon_0=-100.3333333333333 " +
      "+x_0=699999.9998983998 +y_0=3000000 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // Texas Central (ftUS)
    2248 -> ("+proj=lcc +lat_1=39.45 +lat_2=38.3 +lat_0=37.66666666666666 " +
      "+lon_0=-77 +x_0=399999.9998983998 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // Maryland (ftUS)
    2249 -> ("+proj=lcc +lat_1=42.68333333333333 +lat_2=41.71666666666667 " +
      "+lat_0=41 +lon_0=-71.5 +x_0=200000.0001016002 +y_0=750000 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // Massachusetts Mainland (ftUS)
    3435 -> ("+proj=tmerc +lat_0=36.66666666666666 +lon_0=-88.33333333333333 " +
      "+k=0.999975 +x_0=300000 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // Illinois East (ftUS)
    // r12 twins: the registered TM zones' remaining ftUS spellings —
    // both published false eastings are EXACT meter values
    // (541,337.5 ftUS × 1200/3937 = 165,000 m; 492,125 ftUS × 1200/3937
    // = 150,000 m), so the twin is the pure unit scaling
    2257 -> ("+proj=tmerc +lat_0=31 +lon_0=-104.33333333333333 " +
      "+k=0.9999090909090909 +x_0=165000 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // New Mexico East (ftUS)
    2260 -> ("+proj=tmerc +lat_0=38.83333333333334 +lon_0=-74.5 +k=0.9999 " +
      "+x_0=150000 +y_0=0 " +
      "+ellps=GRS80 +towgs84=0,0,0 +units=us-ft"), // New York East (ftUS)
    // r13 NAD27 State Plane (the classic legacy-data ask, r12 verdict
    // task 6): Clarke 1866 zones with the published ftUS false origins
    // (the exact IEEE meter values of EPSG's round ftUS numbers —
    // 500000·1200/3937 = 152400.3048006096 etc.) and the CONUS
    // 3-parameter tie (-8,160,176), the same tie 4267 and the NAD27
    // UTM family 26703-26722 already use
    26745 -> ("+proj=lcc +lat_1=35.46666666666667 +lat_2=34.03333333333333 " +
      "+lat_0=33.5 +lon_0=-118 +x_0=609601.2192024384 +y_0=0 " +
      "+ellps=clrk66 +towgs84=-8,160,176 +units=us-ft"), // NAD27 / California zone 5
    32039 -> ("+proj=lcc +lat_1=30.11666666666667 +lat_2=31.88333333333333 " +
      "+lat_0=29.66666666666667 +lon_0=-100.3333333333333 " +
      "+x_0=609601.2192024384 +y_0=0 " +
      "+ellps=clrk66 +towgs84=-8,160,176 +units=us-ft"), // NAD27 / Texas Central
    26771 -> ("+proj=tmerc +lat_0=36.66666666666666 +lon_0=-88.33333333333333 " +
      "+k=0.999975 +x_0=152400.3048006096 +y_0=0 " +
      "+ellps=clrk66 +towgs84=-8,160,176 +units=us-ft"), // NAD27 / Illinois East
    32012 -> ("+proj=tmerc +lat_0=31 +lon_0=-104.33333333333333 " +
      "+k=0.9999090909090909 +x_0=152400.3048006096 +y_0=0 " +
      "+ellps=clrk66 +towgs84=-8,160,176 +units=us-ft"), // NAD27 / New Mexico East
    26786 -> ("+proj=lcc +lat_1=41.71666666666667 +lat_2=42.68333333333333 " +
      "+lat_0=41 +lon_0=-71.5 +x_0=182880.3657607315 +y_0=0 " +
      "+ellps=clrk66 +towgs84=-8,160,176 +units=us-ft"), // NAD27 / Massachusetts Mainland
    // r12 European TM grids of the implemented families
    3006 -> "+proj=utm +zone=33 +ellps=GRS80 +towgs84=0,0,0", // SWEREF99 TM
    3765 -> ("+proj=tmerc +lat_0=0 +lon_0=16.5 +k=0.9999 " +
      "+x_0=500000 +y_0=0 +ellps=GRS80 +towgs84=0,0,0"), // HTRS96 / Croatia TM
    // MGI (Bessel 1841) with the published 7-parameter transform
    31287 -> ("+proj=lcc +lat_1=49 +lat_2=46 +lat_0=47.5 " +
      "+lon_0=13.33333333333333 +x_0=400000 +y_0=400000 +ellps=bessel " +
      "+towgs84=577.326,90.129,463.919,5.137,1.474,5.297,2.4232") // Austria Lambert
  )

  private val EpsgCodePattern = "(?:EPSG:)?([0-9]{4,5})".r

  /** Codes the registry resolves (for specs/introspection). */
  def registeredEpsgCodes: Seq[Int] =
    ((25828 to 25838) ++ (26903 to 26923) ++ (26703 to 26722) ++
      (23028 to 23038) ++ (28349 to 28356) ++ (7846 to 7859) ++
      (31466 to 31469) ++ (32181 to 32197) ++ (6669 to 6687) ++
      (31965 to 31985) ++ (5185 to 5188) ++ (4491 to 4501) ++
      (4513 to 4533) ++ (4502 to 4512) ++ (4534 to 4554) ++
      (28402 to 28432) ++ (2443 to 2461) ++ EpsgSingles.keys).sorted

  // st_geomReproject evaluates per row but its CRS arguments are query
  // literals, so the handful of distinct strings per executor is memoized:
  // a hit skips the regex/proj4 parse AND the transform's constant setup
  // (Lcc2sp/Laea each run ~10 transcendentals at construction). Bounded
  // so adversarial per-row CRS strings can't grow the map; instances are
  // immutable, so cross-thread sharing is free.
  private val crsMemo = new java.util.concurrent.ConcurrentHashMap[String, Crs]()
  private val CrsMemoMax = 256

  /** Parse a CRS string to its transform. Accepted spellings: EPSG:4326
    * (4326 / WGS84 / LATLON / LATLNG), EPSG:3857 (3857 / WEBMERCATOR /
    * EPSG:900913), EPSG:326zz / EPSG:327zz ("UTM ZONE zzN"/"zzS" also
    * accepted), plus proj4 parameter strings (`+proj=…`, see
    * [[parseProj4]]). Anything else throws with the supported list,
    * matching the reference's fail-on-unknown behavior
    * (ST_CrsFromText.scala:23).
    */
  def parseCrs(crs: String): Crs = {
    val cached = crsMemo.get(crs)
    if (cached != null) cached
    else {
      val built = parseCrsUncached(crs)
      if (crsMemo.size < CrsMemoMax) crsMemo.putIfAbsent(crs, built)
      built
    }
  }

  private def parseCrsUncached(crs: String): Crs = if (crs.trim.startsWith("+")) parseProj4(crs)
  else crs.trim.toUpperCase.replaceAll("\\s+", " ") match {
    case "EPSG:4326" | "4326" | "WGS84" | "LATLNG" | "LATLON" => LonLat
    case "EPSG:3857" | "3857" | "WEBMERCATOR" | "EPSG:900913" => WebMercator
    case "EPSG:3031" | "3031" => PolarStereo(north = false, latTs = -71.0, lon0 = 0.0, name = "EPSG:3031")
    case "EPSG:3413" | "3413" => PolarStereo(north = true, latTs = 70.0, lon0 = -45.0, name = "EPSG:3413")
    case "EPSG:3035" | "3035" => Laea(lat0 = 52.0, lon0 = 10.0, fe = 4321000.0, fn = 3210000.0, name = "EPSG:3035")
    case "EPSG:2154" | "2154" => Lcc2sp(lat1 = 49.0, lat2 = 44.0, lat0 = 46.5, lon0 = 3.0,
      fe = 700000.0, fn = 6600000.0, name = "EPSG:2154")
    case "EPSG:5070" | "5070" => Aea(lat1 = 29.5, lat2 = 45.5, lat0 = 23.0, lon0 = -96.0,
      fe = 0.0, fn = 0.0, name = "EPSG:5070")
    case "EPSG:28992" | "28992" => // Amersfoort / RD New (Netherlands)
      val bessel = Ellipsoid.ByProj4Id("BESSEL")
      val base = Sterea(lat0 = 52.15616055555555, lon0 = 5.38763888888889,
        k0 = 0.9999079, fe = 155000.0, fn = 463000.0, name = "EPSG:28992",
        ell = bessel)
      DatumShifted(base, bessel,
        Helmert(565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.8774, 4.0725),
        "EPSG:28992")
    case "EPSG:5514" | "5514" => // S-JTSK / Krovak East North (CZ + SK)
      val bessel = Ellipsoid.ByProj4Id("BESSEL")
      val base = Krovak(latC = 49.5, lonO = 24.833333333333332,
        alphaC = 30.28813972222222, latP = 78.5, kP = 0.9999,
        fe = 0.0, fn = 0.0, name = "EPSG:5514", ell = bessel)
      DatumShifted(base, bessel, Helmert(589.0, 76.0, 480.0, 0, 0, 0, 0),
        "EPSG:5514")
    case UtmPattern(hemi, zz) => Utm(zz.toInt, north = hemi == "6")
    case s if s.startsWith("UTM ZONE ") && s.length > 9 =>
      val body = s.drop(9)
      val (digits, hemi) = body.span(_.isDigit)
      require(digits.nonEmpty && (hemi == "N" || hemi == "S"),
        s"Cannot parse UTM zone spec '$crs' (expected e.g. 'UTM zone 33N')")
      Utm(digits.toInt, north = hemi == "N")
    // the EPSG code registry: common national grids of the implemented
    // families resolve by code onto the proj4 path
    case EpsgCodePattern(code) if epsgProj4(code.toInt).isDefined =>
      parseProj4(epsgProj4(code.toInt).get)
    case other => throw new IllegalArgumentException(
      s"Unsupported CRS '$other' (supported: EPSG:4326, EPSG:3857, EPSG:2154, EPSG:3031, EPSG:3035, EPSG:3413, EPSG:5070, EPSG:5514, EPSG:28992, EPSG:32601-32660, EPSG:32701-32760, a registry of common national-grid EPSG codes (UTM-based ETRS89/NAD83/NAD27/ED50/MGA series, OSGB/Irish/Polish/NZ/Japan TM grids, CGCS2000 + Pulkovo 1942 Gauss-Krüger zone/CM series, European/Canadian/Belgian LCC, polar LAEA/stere, EASE-Grid 2.0, World Mercator), and +proj= strings for longlat/merc/utm/tmerc/lcc/laea/aea/stere/sterea/krovak/omerc/sinu/moll, incl. legacy-datum grids via +ellps=clrk66/airy/intl/bessel/krass + 3- or 7-param +towgs84 or an NTv2 +nadgrids=file.gsb)")
  }

  /** Canonical EPSG name for a supported CRS string (st_crsFromText). */
  def normalize(crs: String): String = parseCrs(crs).name

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

  /** Reproject a geometry between any two supported CRSs (copy, then
    * mutate coordinates in place via JTS's CoordinateFilter), routing
    * through geographic coordinates when neither side is EPSG:4326.
    */
  def reproject(g: Geometry, fromCrs: String, toCrs: String): Geometry = {
    val from = parseCrs(fromCrs)
    val to = parseCrs(toCrs)
    if (from == to) return g
    val out = g.copy()
    val filter: CoordinateFilter = (c: Coordinate) => {
      val (lon, lat) = from.toGeo(c.x, c.y)
      val (nx, ny) = to.fromGeo(lon, lat)
      c.setX(nx); c.setY(ny)
    }
    out.apply(filter)
    out.geometryChanged()
    out
  }
}
