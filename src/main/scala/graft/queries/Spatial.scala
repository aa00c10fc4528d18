package graft.queries

import graft.functions.st
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial query set (SURVEY.md §2.2–2.7) with DuckDB-checkable oracles.
  *
  * DuckDB has no spatial extension, so geometry correctness is asserted
  * through numerics the oracle can recompute arithmetically: coordinates
  * are synthesized deterministically from TPC-H keys with integer-exact
  * formulas (identical double ops on both sides), geometry ops reduce to
  * coordinate arithmetic (distances, areas, box algebra), and every
  * serde roundtrip re-extracts coordinates after the roundtrip. Floating
  * outputs rounded ≤6 dp (the driver compares at 6 dp).
  *
  * Scale notes: every query is a single scan over the fact side with
  * literal/broadcast build sides, all ST_* expressions are codegen'd
  * scalar calls, and the extent-filter query goes through the
  * SpatialFilterPushdown rewrite (range predicates on struct fields).
  */
object Spatial {

  // Deterministic synthetic coordinates: integer modular arithmetic then
  // exact int→double conversion; the oracle SQL spells the same formula.
  //   lon ∈ [-179.95, 179.95], lat ∈ [-84.95, 84.95]
  private def lonOf(key: Column): Column = (key * 7 % 3600) / lit(10.0) - lit(180.0) + lit(0.05)
  private def latOf(key: Column): Column = (key * 11 % 1700) / lit(10.0) - lit(85.0) + lit(0.05)
  private val lonSql = "((c_custkey * 7) % 3600) / 10.0 - 180.0 + 0.05"
  private val latSql = "((c_custkey * 11) % 1700) / 10.0 - 85.0 + 0.05"

  /** customer → (c_custkey, lon, lat, geom point). */
  def customerPoints(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(
      col("c_custkey"),
      lonOf(col("c_custkey")).as("lon"),
      latOf(col("c_custkey")).as("lat"))
      .withColumn("geom", st.makePoint(col("lon"), col("lat")))

  // fanOut (graft.queries package object): applied ONLY inside the
  // heavy geometry batteries — a sweep with the fan-out in
  // [[customerPoints]] itself sped the 3 heavy entries up but taxed
  // the ~40 light spatial queries ~0.2 s each (one extra exchange + a
  // 32-task stage that their per-row work never amortizes) — net +3 s
  // on the family. Measured, reverted, kept surgical.

  /** customer → degenerate-to-small boxes (w,h from key mod). */
  def customerBoxes(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("w", (col("c_custkey") % 10 + 1) / lit(10.0))
      .withColumn("h", (col("c_custkey") % 7 + 1) / lit(10.0))
      .withColumn("box", st.makeBBOX(col("lon"), col("lat"), col("lon") + col("w"), col("lat") + col("h")))
  private val wSql = "(c_custkey % 10 + 1) / 10.0"
  private val hSql = "(c_custkey % 7 + 1) / 10.0"

  /** Constructors + accessors: point build, translate, 3-point line. */
  def spConstruct(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.x(col("geom")), 6).as("x"),
      round(st.y(col("geom")), 6).as("y"),
      round(st.x(st.translate(col("geom"), lit(1.5), lit(-0.5))), 6).as("tx"),
      st.numPoints(st.makeLine(array(
        col("geom"),
        st.makePoint(col("lon") + 1.0, col("lat")),
        st.makePoint(col("lon"), col("lat") + 1.0)))).as("np"),
      st.numGeometries(col("geom")).as("ng"))
      .orderBy("c_custkey")

  /** Measures on synthesized boxes: area, perimeter, centroid, envelope. */
  def spMeasure(s: SparkSession, dir: String): DataFrame =
    customerBoxes(s, dir).select(
      col("c_custkey"),
      round(st.area(col("box")), 6).as("area"),
      round(st.length(col("box")), 6).as("perim"),
      round(st.x(st.centroid(col("box"))), 6).as("cx"),
      round(st.area(st.envelope(col("box"))), 6).as("env_area"))
      .orderBy("c_custkey")

  /** Literal-bbox point filter through st_intersects. */
  def spBboxFilter(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(st.intersects(st.makeBBOX(-50.0, -40.0, 50.0, 40.0), col("geom")))
      .select("c_custkey").orderBy("c_custkey")

  /** kNN by euclidean distance: 50 nearest customers to a query point. */
  def spDistanceKnn(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.distance(col("geom"), st.makePoint(lit(10.0), lit(20.0))), 6).as("dist"))
      .orderBy(col("dist"), col("c_custkey"))
      .limit(50)

  /** Haversine distance to a fixed point (meters, whole-meter rounding). */
  def spDistanceSphere(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"),
        round(st.distanceSphere(col("geom"), st.makePoint(lit(0.05), lit(0.05))), 1).as("dist_m"))
      .orderBy("c_custkey")

  /** WKT print→parse roundtrip preserves coordinates. */
  def spWktRoundtrip(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.x(st.geomFromWKT(st.asText(col("geom")))), 6).as("x"),
      round(st.y(st.geomFromWKT(st.asText(col("geom")))), 6).as("y"))
      .orderBy("c_custkey")

  /** WKB encode→decode roundtrip preserves coordinates. */
  def spWkbRoundtrip(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.x(st.geomFromWKB(st.asBinary(col("geom")))), 6).as("x"),
      round(st.y(st.pointFromWKB(st.asBinary(col("geom")))), 6).as("y"))
      .orderBy("c_custkey")

  /** GeoJSON write→read roundtrip preserves coordinates. */
  def spGeojsonRoundtrip(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.x(st.geomFromGeoJson(st.asGeoJson(col("geom")))), 6).as("x"),
      round(st.y(st.geomFromGeoJson(st.asGeoJson(col("geom")))), 6).as("y"))
      .orderBy("c_custkey")

  /** GeoHash encode→decode: the decoded cell must contain the point and
    * the hash length must match the requested precision (40 bits → 8
    * chars). Reduced to oracle-checkable constants.
    */
  def spGeohash(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      when(st.intersects(
        st.geomFromGeoHash(st.geoHash(col("geom"), lit(40)), lit(40)),
        col("geom")), 1).otherwise(0).as("cell_contains"),
      org.apache.spark.sql.functions.length(st.geoHash(col("geom"), lit(40))).as("hash_len"))
      .orderBy("c_custkey")

  /** Contains/within with JTS boundary semantics (corner point is on the
    * boundary → not contained; interior point is).
    */
  def spContains(s: SparkSession, dir: String): DataFrame =
    customerBoxes(s, dir)
      .withColumn("inner_pt", st.makePoint(col("lon") + col("w") / 2, col("lat") + col("h") / 2))
      .withColumn("corner_pt", st.makePoint(col("lon"), col("lat")))
      .select(
        col("c_custkey"),
        when(st.contains(col("box"), col("inner_pt")), 1).otherwise(0).as("has_inner"),
        when(st.contains(col("box"), col("corner_pt")), 1).otherwise(0).as("has_corner"),
        when(st.within(col("inner_pt"), col("box")), 1).otherwise(0).as("inner_within"))
      .orderBy("c_custkey")

  /** Overlay: intersection/difference of each box with a fixed window,
    * reduced to areas (pure box algebra for the oracle).
    */
  def spOverlay(s: SparkSession, dir: String): DataFrame = {
    val window = st.makeBBOX(-50.0, -40.0, 50.0, 40.0)
    customerBoxes(s, dir).select(
      col("c_custkey"),
      round(st.area(st.intersection(col("box"), window)), 6).as("inter_area"),
      round(st.area(st.difference(col("box"), window)), 6).as("diff_area"))
      .localCheckpoint(eager = false) // barrier: see the spPredicates note
      .orderBy("c_custkey")
  }

  /** Extent-struct filter — goes through the SpatialFilterPushdown rule
    * (range predicates on extent fields; see PushdownSpec for the
    * PushedFilters assertion on parquet).
    */
  def spExtentPrune(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("extent", st.extentFromGeom(col("geom")))
      .filter(st.intersects(col("extent"), st.makeBBOX(-50.0, -40.0, 50.0, 40.0)))
      .select("c_custkey").orderBy("c_custkey")

  /** EPSG:4326 → EPSG:3857 reprojection (web-mercator formulas). */
  def spReproject(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("m", st.geomReproject(col("geom"), lit("EPSG:4326"), lit("EPSG:3857")))
      .select(
        col("c_custkey"),
        round(st.x(col("m")), 2).as("mx"),
        round(st.y(col("m")), 2).as("my"))
      .orderBy("c_custkey")

  /** Z2 keys value-checked against an independent arithmetic oracle: the
    * DuckDB side re-derives the 30-bit scaling and Morton interleave as a
    * 60-term bit-shift sum (pure IEEE +,/,* then integer bit ops — no
    * libm, so both engines agree bit-for-bit). The libm-dependent
    * st_partitionCentroid key gets its own margin-checked oracle in
    * [[spPartition]].
    */
  def spZ2Partition(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      st.z2Cell(col("geom"), lit(8)).as("cell8"),
      col("geom"))
      .withColumn("z2", st.z2LatLon(col("geom")))
      .select("c_custkey", "cell8", "z2.min", "z2.max")
      .orderBy("c_custkey")

  /** st_partitionCentroid (slippy-tile Morton partition key), promoted
    * from spec-only to value-checked: the x tile index is pure arithmetic
    * (bit-identical across engines — boundary-exact values are safe), and
    * the libm-dependent y tile index sits ≥ 4.5e-4 tiles from every
    * integer boundary on this grid (measured at sf0.1), ~12 orders of
    * magnitude above libm's 1-ulp tan/log differences, so trunc() agrees.
    * The oracle re-derives tile math + 6-bit Morton interleave + shift.
    */
  def spPartition(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      st.partitionCentroid(col("geom"), lit(6)).as("pk6"),
      st.partitionCentroid(col("geom"), lit(6), lit(4)).as("pk6b4"))
      .orderBy("c_custkey")

  /** Spatial join via the Z2 grid-cell cover join (no cross product):
    * customers-per-supplier-region counts. Supplier regions are 12.5°×8.0°
    * boxes from supplier keys; oracle recomputes the containment join as
    * interval arithmetic.
    */
  def spSpatialJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey"),
      ((col("s_suppkey") * 13 % 3400) / lit(10.0) - lit(170.0)).as("slon"),
      ((col("s_suppkey") * 17 % 1600) / lit(10.0) - lit(80.0)).as("slat"))
      .withColumn("sbox", st.makeBBOX(col("slon"), col("slat"),
        col("slon") + lit(12.5), col("slat") + lit(8.0)))
    val cust = customerPoints(s, dir).select(col("c_custkey"), col("geom").as("cpt"))
    graft.ops.SpatialJoin.intersects(sup, "sbox", cust, "cpt", level = 5)
      .groupBy("s_suppkey").agg(count(lit(1)).as("n_customers"))
      .orderBy("s_suppkey")
  }

  /** Distributed KNN join: 5 nearest customer points (incl. self) for
    * each of the first 20 customers, within 15°. Cell-cover candidates +
    * bounded-heap ranking; the oracle replays it as a row_number over the
    * identical IEEE point distance.
    */
  def spKnnJoin(s: SparkSession, dir: String): DataFrame = {
    val pts = customerPoints(s, dir).select(col("c_custkey"), col("geom"))
    graft.ops.SpatialJoin.knnPoints(
        pts.filter(col("c_custkey") <= 20), "c_custkey", "geom",
        pts, "c_custkey", "geom", k = 5, radius = 15.0, level = 4)
      .select(col("qid"), col("rank"), col("id"), round(col("dist"), 6).as("dist"))
      .orderBy("qid", "rank")
  }

  /** Geodesic buffer membership (no closed-form oracle → rows-only;
    * STFunctionsSpec asserts buffer geometry properties).
    */
  def spBufferCount(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(st.intersects(
        st.bufferPoint(st.makePoint(lit(0.05), lit(0.05)), lit(2000000.0)), col("geom")))
      .select("c_custkey").orderBy("c_custkey")

  /** DE-9IM predicate matrix over deterministic box configurations: B
    * half-overlaps A (translate by w/2), C shares exactly A's right edge
    * (translate by w — the same IEEE sum, so the edges are bit-identical),
    * D is far disjoint (y+10 > any h), and L is a horizontal line through
    * A's interior extending past both sides. Every predicate outcome —
    * including the full relate() matrix strings — is a per-row constant
    * the oracle asserts. Covers st_covers / st_crosses / st_disjoint /
    * st_equals / st_overlaps / st_touches / st_relate / st_relateBool
    * (reference spatial/src/main/scala/com/azavea/hiveless/spatial/ST_Covers.scala:1 et al).
    */
  // `.localCheckpoint(eager = false)` BEFORE a final orderBy is a
  // materialization barrier: orderBy's range partitioner samples its
  // child by EXECUTING it, so a heavy scan-side projection under a bare
  // orderBy is computed twice — once for the sample pass, once for the
  // sort's map pass (measured: the two stages are near-equal cost on
  // the geometry batteries). The lazy checkpoint materializes the rows
  // once; sample and sort then read blocks. Only applied where the
  // per-row compute dwarfs one block write of the output.
  def spPredicates(s: SparkSession, dir: String): DataFrame =
    fanOut(customerBoxes(s, dir))
      .withColumn("boxB", st.translate(col("box"), col("w") / 2, lit(0.0)))
      .withColumn("boxC", st.translate(col("box"), col("w"), lit(0.0)))
      .withColumn("boxD", st.translate(col("box"), col("w") * 3, lit(10.0)))
      .withColumn("lineL", st.makeLine(array(
        st.makePoint(col("lon") - col("w"), col("lat") + col("h") / 2),
        st.makePoint(col("lon") + col("w") * 2, col("lat") + col("h") / 2))))
      .select(
        col("c_custkey"),
        when(st.covers(col("box"), st.makePoint(col("lon"), col("lat"))), 1).otherwise(0).as("covers_corner"),
        when(st.covers(col("box"), col("boxB")), 1).otherwise(0).as("covers_b"),
        when(st.equalsGeom(col("box"), st.envelope(col("box"))), 1).otherwise(0).as("equals_env"),
        when(st.equalsGeom(col("box"), col("boxB")), 1).otherwise(0).as("equals_b"),
        when(st.overlaps(col("box"), col("boxB")), 1).otherwise(0).as("overlaps_b"),
        when(st.overlaps(col("box"), col("boxC")), 1).otherwise(0).as("overlaps_c"),
        when(st.touches(col("box"), col("boxC")), 1).otherwise(0).as("touches_c"),
        when(st.touches(col("box"), col("boxB")), 1).otherwise(0).as("touches_b"),
        when(st.disjoint(col("box"), col("boxD")), 1).otherwise(0).as("disjoint_d"),
        when(st.disjoint(col("box"), col("boxB")), 1).otherwise(0).as("disjoint_b"),
        when(st.crosses(col("lineL"), col("box")), 1).otherwise(0).as("crosses_l"),
        when(st.crosses(col("lineL"), col("boxD")), 1).otherwise(0).as("crosses_d"),
        st.relate(col("box"), col("boxB")).as("rel_overlap"),
        st.relate(col("box"), col("boxC")).as("rel_touch"),
        st.relate(col("box"), col("boxD")).as("rel_disjoint"),
        when(st.relateBool(col("box"), col("boxC"), lit("F***T****")), 1).otherwise(0).as("touch_pattern"))
      .localCheckpoint(eager = false) // barrier: see sortedOnce
      .orderBy("c_custkey")

  /** Accessor tail, value-checked: boundary length = perimeter, dimension
    * per geometry class, exterior-ring vertex count and 1-based pointN
    * coordinates (JTS envelope ring order: (xmin,ymin) → (xmin,ymax) →
    * (xmax,ymax) → (xmax,ymin) → close), interior-ring absence, the st_is*
    * family, typed casts and st_makePointM / st_byteArray passthroughs.
    */
  def spAccessors(s: SparkSession, dir: String): DataFrame =
    fanOut(customerBoxes(s, dir))
      .withColumn("ring", st.exteriorRing(col("box")))
      .withColumn("line3", st.makeLine(array(
        col("geom"),
        st.makePoint(col("lon") + 1.0, col("lat")),
        st.makePoint(col("lon") + 2.0, col("lat")))))
      .select(
        col("c_custkey"),
        round(st.length(st.boundary(col("box"))), 6).as("bnd_len"),
        st.dimension(col("box")).as("dim_box"),
        st.dimension(col("geom")).as("dim_pt"),
        st.dimension(col("line3")).as("dim_line"),
        st.coordDim(col("geom")).as("coord_dim"),
        st.numPoints(col("ring")).as("np_ring"),
        round(st.x(st.pointN(col("ring"), lit(3))), 6).as("p3x"),
        round(st.y(st.pointN(col("ring"), lit(3))), 6).as("p3y"),
        round(st.x(st.geometryN(col("geom"), lit(1))), 6).as("gn_x"),
        when(st.interiorRingN(col("box"), lit(1)).isNull, 0).otherwise(1).as("has_iring"),
        when(st.isValid(col("box")), 1).otherwise(0).as("is_valid"),
        when(st.isSimple(col("box")), 1).otherwise(0).as("is_simple"),
        when(st.isEmpty(col("box")), 1).otherwise(0).as("is_empty"),
        when(st.isClosed(col("ring")), 1).otherwise(0).as("ring_closed"),
        when(st.isRing(col("ring")), 1).otherwise(0).as("ring_is_ring"),
        when(st.isCollection(col("box")), 1).otherwise(0).as("is_coll"),
        when(st.isGeomField(st.asText(col("geom"))), 1).otherwise(0).as("is_geomfield"),
        round(st.x(st.castToPoint(col("geom"))), 6).as("cast_pt_x"),
        st.numPoints(st.castToPolygon(col("box"))).as("cast_poly_np"),
        round(st.x(st.makePointM(col("lon"), col("lat"), lit(7.0))), 6).as("mpm_x"),
        org.apache.spark.sql.functions.length(st.byteArray(lit("graft"))).cast("int").as("ba_len"))
      .localCheckpoint(eager = false) // barrier: see spPredicates note
      .orderBy("c_custkey")

  /** Processing tail, value-checked: Douglas-Peucker keeps all 5 box
    * vertices but collapses a collinear 3-point line to 2; closestPoint
    * returns the exact corner (vertex case) and the projected top-edge
    * point (interior case); scalar convexHull of a box is the box, of a
    * 3-point right-angle line the 0.5-area triangle; lengthSphere is the
    * haversine of the single segment; antimeridianSafeGeom splits a
    * 180°-crossing box into 2 parts preserving total area.
    */
  def spProcess(s: SparkSession, dir: String): DataFrame =
    fanOut(customerBoxes(s, dir))
      .withColumn("line3", st.makeLine(array(
        col("geom"),
        st.makePoint(col("lon") + 1.0, col("lat")),
        st.makePoint(col("lon") + 2.0, col("lat")))))
      .withColumn("line2", st.makeLine(array(
        col("geom"), st.makePoint(col("lon") + 1.0, col("lat")))))
      .withColumn("tri", st.makeLine(array(
        col("geom"),
        st.makePoint(col("lon") + 1.0, col("lat")),
        st.makePoint(col("lon"), col("lat") + 1.0))))
      .withColumn("idlBox", st.makeBBOX(
        lit(179.5), col("lat"), lit(179.5) + col("w") + lit(1.0), col("lat") + col("h")))
      .select(
        col("c_custkey"),
        st.numPoints(st.simplify(col("box"), lit(0.01))).as("simp_np"),
        st.numPoints(st.simplify(col("line3"), lit(0.01))).as("simp_line_np"),
        st.numPoints(st.simplifyPreserveTopology(col("box"), lit(0.01))).as("topo_np"),
        round(st.x(st.closestPoint(col("box"),
          st.makePoint(col("lon") - 1.0, col("lat") - 1.0))), 6).as("cp1x"),
        round(st.y(st.closestPoint(col("box"),
          st.makePoint(col("lon") - 1.0, col("lat") - 1.0))), 6).as("cp1y"),
        round(st.x(st.closestPoint(col("box"),
          st.makePoint(col("lon") + col("w") / 2, col("lat") + col("h") + 2.0))), 6).as("cp2x"),
        round(st.area(st.convexHull(col("box"))), 6).as("hull_area"),
        round(st.area(st.convexHull(col("tri"))), 6).as("tri_area"),
        st.numPoints(st.convexHull(col("tri"))).as("tri_np"),
        round(st.lengthSphere(col("line2")), 1).as("lsph"),
        round(st.area(st.antimeridianSafeGeom(col("idlBox"))), 6).as("ams_area"),
        st.numGeometries(st.antimeridianSafeGeom(col("idlBox"))).as("ams_ng"))
      .localCheckpoint(eager = false) // barrier: see spPredicates note
      .orderBy("c_custkey")

  /** EPSG:4326 → per-row UTM zone (EPSG:326zz/327zz) projection, plus an
    * inverse round-trip flag. The oracle re-derives the full Snyder
    * transverse-mercator forward series in SQL with the identical IEEE
    * operation order as geom/Projections.scala (E2/Ep2 interpolated as
    * exact shortest-roundtrip double literals), so easting/northing
    * value-check at 0.1 m; the inverse series is asserted through the
    * rt_ok roundtrip bit (< 1e-7° ≈ 1 cm) since running it through the
    * forward oracle would only re-test the forward path.
    */
  def spUtm(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("zone", (floor((col("lon") + 180.0) / 6.0) + 1).cast("int"))
      .withColumn("crs", concat(lit("EPSG:"),
        (when(col("lat") >= 0, 32600).otherwise(32700) + col("zone")).cast("string")))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"), col("zone"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Polar stereographic reprojection for the latitudes UTM leaves:
    * points south of −60° → EPSG:3031 (Antarctic), north of 60° →
    * EPSG:3413 (NSIDC Arctic). The oracle re-derives the full Snyder
    * variant-B forward (t, t_c, m_c, ρ, sin/cos split, south-aspect sign
    * reversal) op-for-op in SQL, value-checking at 0.1 m; the inverse
    * series is asserted through the rt_ok roundtrip bit (< 1e-7° ≈ 1 cm).
    * The implementation itself is anchored to the EPSG guidance-note
    * variant-B worked example in STFunctionsSpec.
    */
  def spPolar(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(abs(col("lat")) >= 60.0)
      .withColumn("crs", when(col("lat") < 0, lit("EPSG:3031")).otherwise(lit("EPSG:3413")))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        when(col("lat") < 0, 3031).otherwise(3413).as("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Lambert azimuthal equal-area (EPSG:3035, the pan-European grid) over
    * the window it is actually used for (lon ∈ [−30°, 50°] — also keeps
    * the working points far from the antipodal singularity, where the
    * projection's 1/√(1+cos c) amplification would outgrow the 0.1 m
    * gate). The oracle re-derives the full Snyder ellipsoidal forward
    * (authalic q, β, B, D) op-for-op in SQL; the inverse series is
    * asserted through the rt_ok bit; the EPSG worked example anchors the
    * implementation in STFunctionsSpec.
    */
  def spLaea(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= -30.0 && col("lon") <= 50.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit("EPSG:3035")))
      .withColumn("back", st.geomReproject(col("p"), lit("EPSG:3035"), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Lambert conformal conic 2SP (EPSG:2154 Lambert-93, the French
    * national grid — the same family as the US State Plane zones) over a
    * wide European window. The oracle re-derives the full Snyder forward
    * (t, m, n, F, ρ0, ρ, θ) op-for-op in SQL at 0.1 m; the inverse
    * series is asserted through the rt_ok bit; secant-cone scale and
    * conformality invariants anchor the implementation in
    * STFunctionsSpec.
    */
  def spLcc(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= -30.0 && col("lon") <= 36.0 &&
              col("lat") >= 20.0 && col("lat") <= 70.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit("EPSG:2154")))
      .withColumn("back", st.geomReproject(col("p"), lit("EPSG:2154"), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** NAD27-class legacy-datum grid: EPSG:4326 → a CONUS Lambert on the
    * Clarke 1866 ellipsoid tied to WGS84 by the classic 3-parameter
    * +towgs84=(−8,160,176) Helmert — the geom/Projections.DatumShifted
    * chain (WGS84 geodetic → geocentric → inverse Helmert → Bowring
    * geodetic on clrk66 → Snyder LCC forward). The oracle replays every
    * leg op-for-op in SQL, including the FIXED 3-iteration Bowring
    * schedule, value-checking at 0.1 m; rt_ok asserts the full inverse
    * chain closes to 1e-6° (the drop-height 2D-Helmert closure is
    * centimeter-class, see DatumShifted's scaladoc, so 1e-6° ≈ 11 cm
    * holds with margin).
    */
  private val Nad27ConusLcc =
    "+proj=lcc +lat_1=33 +lat_2=45 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 " +
      "+ellps=clrk66 +towgs84=-8,160,176"

  def spDatum(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= -125.0 && col("lon") <= -67.0 &&
              col("lat") >= 25.0 && col("lat") <= 49.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(Nad27ConusLcc)))
      .withColumn("back", st.geomReproject(col("p"), lit(Nad27ConusLcc), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-6 &&
             abs(st.y(col("back")) - col("lat")) < 1e-6, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** NTv2 grid-shift datum tie (`+nadgrids=file.gsb`) — the public
    * binary format national agencies publish NAD27→NAD83-class
    * distortion grids in, and the distortion-modelling half of the
    * reference's geotrellis-proj4 datum registry
    * (spatial-index/.../index/ST_GeomReproject.scala:1). The fixture is
    * written driver-side as REAL NTv2 bytes (big-endian spec layout,
    * CONUS window, 1° cells) and read back through the full parser +
    * bilinear interpolator; its shift field is exactly bilinear in the
    * node indices with float32-exact node values (integer/1024), so the
    * DuckDB oracle can replay the whole forward chain — positive-west
    * seconds, cell lookup with the same floor/clamp, bilinear weights in
    * the same association order, +lat / −lon(east) application —
    * op-for-op in EXACT IEEE arithmetic (no transcendentals anywhere in
    * this path), making the hash match bit-for-bit rather than to a
    * rounding gate. rt_ok asserts the fixed-4-step iterative inverse
    * closes to 1e-9°; the sign conventions (the classic NTv2 failure
    * mode) are independently anchored against the already-verified NAD27
    * Helmert chain in NTv2Spec.
    */
  private lazy val nadgridsPath: String = {
    val fixDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_fixtures")
    java.nio.file.Files.createDirectories(fixDir)
    val p = fixDir.resolve("conus_bilinear.gsb")
    val (rows, cols) = (25, 59)
    val latA = Array.tabulate(rows * cols) { idx =>
      val (i, j) = (idx / cols, idx % cols)
      (1024 + 8 * i + 4 * j + i * j).toFloat / 1024.0f
    }
    val lonA = Array.tabulate(rows * cols) { idx =>
      val (i, j) = (idx / cols, idx % cols)
      (2048 + 4 * i + 8 * j + i * j).toFloat / 1024.0f
    }
    val grid = graft.geom.NTv2.Grid(Vector(graft.geom.NTv2.SubGrid(
      "CONUS", "NONE", sLat = 25 * 3600.0, nLat = 49 * 3600.0,
      eLong = 67 * 3600.0, wLong = 125 * 3600.0,
      latInc = 3600.0, longInc = 3600.0, latShift = latA, lonShift = lonA)))
    java.nio.file.Files.write(p, graft.geom.NTv2.write(grid))
    p.toString
  }

  def spNadgrids(s: SparkSession, dir: String): DataFrame = {
    val crs = s"+proj=longlat +ellps=clrk66 +nadgrids=$nadgridsPath"
    customerPoints(s, dir)
      .filter(col("lon") >= -124.0 && col("lon") <= -68.0 &&
              col("lat") >= 26.0 && col("lat") <= 48.0)
      .withColumn("p", st.geomReproject(col("geom"), lit(crs), lit("EPSG:4326")))
      .withColumn("back", st.geomReproject(col("p"), lit("EPSG:4326"), lit(crs)))
      .select(
        col("c_custkey"),
        st.x(col("p")).as("lon83"),
        st.y(col("p")).as("lat83"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-9 &&
             abs(st.y(col("back")) - col("lat")) < 1e-9, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")
  }

  /** Oblique stereographic double projection (EPSG method 9809 — the
    * Netherlands RD New grid, EPSG:28992: Bessel ellipsoid tied to WGS84
    * by the classic 7-parameter +towgs84) over the wide European window.
    * This is the first SEVEN-parameter oracle: the inverse Helmert here
    * has a real rotation/scale matrix, replayed in SQL via the exact
    * adjugate-inverse entries (row-independent constants). The
    * conformal-sphere forward (w, χ, Λ, B) is spelled per-row; the
    * fixed-schedule Newton inverse is asserted through rt_ok; the EPSG
    * worked example anchors the projection in STFunctionsSpec.
    */
  def spSterea(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= -30.0 && col("lon") <= 36.0 &&
              col("lat") >= 20.0 && col("lat") <= 70.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit("EPSG:28992")))
      .withColumn("back", st.geomReproject(col("p"), lit("EPSG:28992"), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-6 &&
             abs(st.y(col("back")) - col("lat")) < 1e-6, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Krovak oblique conformal conic (EPSG method 9819 — S-JTSK /
    * Krovak East North, EPSG:5514: Bessel + 3-param +towgs84) over the
    * same European window. The oracle replays the Gaussian-sphere
    * forward (U, V, T, D, θ, r) per-row with the CRS constants
    * interpolated as exact literals, including the negative East-North
    * axis convention; the fixed-schedule inverse is asserted through
    * rt_ok; the EPSG worked example anchors the projection in
    * STFunctionsSpec.
    */
  def spKrovak(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= -30.0 && col("lon") <= 36.0 &&
              col("lat") >= 20.0 && col("lat") <= 70.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit("EPSG:5514")))
      .withColumn("back", st.geomReproject(col("p"), lit("EPSG:5514"), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-6 &&
             abs(st.y(col("back")) - col("lat")) < 1e-6, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Hotine oblique Mercator (EPSG method 9815 variant B — the
    * Swiss/Borneo/Alaska-zone-1 family) on a Borneo-like centerline
    * (azimuth 53° through (4°N, 115°E), k0 = 0.99984), over a ±30°-ish
    * window around it. The oracle replays the Snyder ch. 9 forward
    * op-for-op in SQL — the CRS constants (B, A′, E, γ0, λ0, u_c) are
    * row-independent and interpolated as shortest-roundtrip literals of
    * the exact Scala doubles; the per-row chain (t, Q, S, T, V, U → v,
    * u → rectification) is spelled with the same IEEE associativity,
    * value-checking at 0.1 m. The chi-series inverse is asserted through
    * the rt_ok bit; conformality/center/rectification invariants anchor
    * the implementation independently in STFunctionsSpec.
    */
  private val OmercBorneo =
    "+proj=omerc +lat_0=4 +lonc=115 +alpha=53 +gamma=53 +k_0=0.99984 +x_0=0 +y_0=0 +ellps=WGS84"

  def spOmerc(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= 85.0 && col("lon") <= 145.0 &&
              col("lat") >= -20.0 && col("lat") <= 28.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(OmercBorneo)))
      .withColumn("back", st.geomReproject(col("p"), lit(OmercBorneo), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Sinusoidal (the MODIS/land-product grid family, `+proj=sinu` on
    * WGS84) over the full lat window: the oracle re-derives the Snyder
    * 30-8/30-9 ellipsoidal forward op-for-op in SQL (x from the local
    * parallel radius, y = the same 3-21 meridian-arc series the UTM
    * oracle already proves out), value-checking at 0.1 m; the
    * rectifying-latitude inverse is asserted through the rt_ok bit
    * (< 1e-7° ≈ 1 cm).
    */
  private val SinuWgs84 = "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84"

  def spSinu(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(SinuWgs84)))
      .withColumn("back", st.geomReproject(col("p"), lit(SinuWgs84), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** The ACTUAL MODIS land-product grid — sinusoidal on the authalic
    * sphere, spelled exactly as the products ship it
    * (`+R=6371007.181 +nadgrids=@null`): at e = 0 the ellipsoidal form
    * collapses to x = R·Δλ·cosφ, y = R·φ, which the oracle replays
    * directly — so the +R sphere path is driver-verified end to end,
    * not just spec-pinned.
    */
  private val ModisSinu =
    "+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181 +nadgrids=@null +wktext"

  def spModis(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(ModisSinu)))
      .withColumn("back", st.geomReproject(col("p"), lit(ModisSinu), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Mollweide (`+proj=moll`, spherical with R = a per PROJ semantics)
    * inside |lat| ≤ 80°: the Newton solve for 2θ + sin 2θ = π sin φ runs
    * a FIXED 8-step schedule from θ₀ = φ precisely so the oracle can
    * unroll the identical float sequence in SQL (eight chained CTEs);
    * x/y then value-check at 0.1 m and the closed-form inverse through
    * the rt_ok bit (< 1e-7°).
    */
  private val MollWgs84 = "+proj=moll +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84"

  def spMoll(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(abs(col("lat")) <= 80.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(MollWgs84)))
      .withColumn("back", st.geomReproject(col("p"), lit(MollWgs84), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Ellipsoidal Mercator — EPSG:3395 (WGS 84 / World Mercator) spelled
    * as its proj4 string: the oracle replays the closed-form Snyder
    * 7-6/7-7 forward in SQL (x = a·λ, y = a·[ln tan(π/4+φ/2) +
    * (e/2)·ln((1−e sinφ)/(1+e sinφ))]); rt_ok asserts the
    * conformal-latitude inverse (7-13 + 3-5) reproduces lon/lat to
    * 1e-7°. The customer grid tops out at |lat| ≈ 85°, inside the
    * projection's domain.
    */
  private val Merc3395 = "+proj=merc +lon_0=0 +k=1 +x_0=0 +y_0=0 +ellps=WGS84 +units=m"

  def spMerc(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(Merc3395)))
      .withColumn("back", st.geomReproject(col("p"), lit(Merc3395), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Cylindrical equal-area — EASE-Grid 2.0 global (EPSG:6933,
    * lat_ts = 30°) spelled as its proj4 string: the oracle replays
    * Snyder 10-1/10-2 with the authalic q (3-12) op-for-op in SQL;
    * rt_ok asserts the authalic-latitude inverse (3-18) to 1e-7°.
    */
  private val Cea6933 = "+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m"

  def spCea(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(Cea6933)))
      .withColumn("back", st.geomReproject(col("p"), lit(Cea6933), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Equidistant cylindrical — EPSG:4087 (WGS 84 / World Equidistant
    * Cylindrical) spelled as its proj4 string, PROJ's spherical
    * semantics (R = a): x = a·λ, y = a·φ, replayed literally in SQL;
    * the inverse is exact, so rt_ok is identically 1.
    */
  private val Eqc4087 = "+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84 +units=m"

  def spEqc(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(Eqc4087)))
      .withColumn("back", st.geomReproject(col("p"), lit(Eqc4087), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Azimuthal equidistant on the mean-radius sphere, centered
    * mid-continent (`+proj=aeqd +R=…` — the range-ring / coverage-map
    * composition, where planar distance from the center IS great-circle
    * distance): the oracle replays the Snyder 25-1..25-4 spherical
    * forward op-for-op in SQL — wrapped Δλ, clamped acos, the
    * c/sin c scale with its small-angle guard — value-checking at
    * 0.1 m; the closed-form 20-14/20-15 inverse is asserted through
    * rt_ok (< 1e-7°).
    */
  private val AeqdCrs = "+proj=aeqd +lat_0=40 +lon_0=-100 +x_0=0 +y_0=0 +R=6371008.8"

  def spAeqd(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(AeqdCrs)))
      .withColumn("back", st.geomReproject(col("p"), lit(AeqdCrs), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Robinson (`+proj=robin`, R = a per PROJ semantics) over the full
    * lat window: the projection is DEFINED by its 19-knot table plus an
    * interpolation rule (geom/Projections.RobinsonTable), so the oracle
    * carries the knot values and precomputed Hermite slopes as a
    * VALUES list and replays the identical cubic — bucket select,
    * u-powers, the four basis terms — in SQL, value-checking at 0.1 m;
    * the bisection inverse is asserted through rt_ok (< 1e-7°).
    */
  private val RobinCrs = "+proj=robin +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84"

  def spRobinson(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(RobinCrs)))
      .withColumn("back", st.geomReproject(col("p"), lit(RobinCrs), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Geostationary satellite view (`+proj=geos +sweep=y`, the Meteosat
    * full-disk grid) inside the ±55° window (well inside the ~81°
    * visibility limb for h = 35 786 km): the oracle replays the
    * CGMS scan-angle forward op-for-op in SQL — geocentric latitude,
    * geocentric ellipsoid radius, the satellite→point vector and both
    * atan view angles — value-checking at 0.1 m; the quadratic
    * ray–ellipsoid inverse is asserted through rt_ok (< 1e-7°).
    */
  private val GeosCrs = "+proj=geos +h=35785831 +lon_0=0 +sweep=y +x_0=0 +y_0=0 +ellps=WGS84"

  def spGeos(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(abs(col("lon")) <= 55.0 && abs(col("lat")) <= 55.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit(GeosCrs)))
      .withColumn("back", st.geomReproject(col("p"), lit(GeosCrs), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .localCheckpoint(eager = false) // barrier: see spPredicates note
      .orderBy("c_custkey")

  /** Albers equal-area conic (EPSG:5070 Conus Albers) forward + inverse
    * roundtrip: the oracle mirrors the Snyder 15-19..15-26 forward
    * series op-for-op in SQL (q/m functions, n, C, ρ, θ); rt_ok asserts
    * the authalic-latitude inverse reproduces lon/lat to 1e-7°.
    */
  def spAlbers(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= -125.0 && col("lon") <= -67.0 &&
              col("lat") >= 25.0 && col("lat") <= 49.0)
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), lit("EPSG:5070")))
      .withColumn("back", st.geomReproject(col("p"), lit("EPSG:5070"), lit("EPSG:4326")))
      .select(
        col("c_custkey"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
             abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** EPSG registry resolution BY CODE ([[graft.geom.Projections]]'s
    * epsgProj4 table — the round-9 closure of the reference's
    * geotrellis-proj4 registry gap, ST_CrsFromText.scala:1): three
    * national grids from three projection families resolve from their
    * bare EPSG code — NZTM2000 (EPSG:2193, transverse mercator), GDA94
    * Australian Albers (EPSG:3577, equal-area conic) and Arctic Polar
    * Stereographic (EPSG:3995, variant-B stere) — each over its grid's
    * service window. The oracle replays each family's Snyder forward
    * with the REGISTRY's constants, so a wrong registry parameter (not
    * just a wrong formula) fails the hash compare; rt_ok pins the
    * inverse at < 1e-7° ≈ 1 cm.
    */
  def spEpsg(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .withColumn("epsg",
        when(col("lon") >= 166.0 && col("lon") <= 179.0 &&
          col("lat") >= -47.0 && col("lat") <= -34.0, lit(2193))
          .when(col("lon") >= 113.0 && col("lon") <= 154.0 &&
            col("lat") >= -44.0 && col("lat") <= -10.0, lit(3577))
          .when(col("lat") >= 60.0, lit(3995)))
      .filter(col("epsg").isNotNull)
      .withColumn("crs", concat(lit("EPSG:"), col("epsg")))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"), col("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
          abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** GDA2020 MGA zones resolved BY EPSG CODE (r13 verdict task 6 —
    * the Australian national grid family, 7846–7859 in the registry):
    * each point in the Australian window projects through the MGA zone
    * its longitude falls in (zone = ⌊(λ+180)/6⌋+1, the UTM rule; the
    * window spans zones 49–56), code 7800+zone. The GDA94 twin series
    * (28349–28356) must land the SAME grid coordinates — both datums
    * are ITRF-aligned null ties on GRS80, so `gda94_same` pins the two
    * registry ranges against each other. The oracle replays the TM
    * forward (spUtmOracle's 6th-order series) with the REGISTRY's
    * constants — per-row zone arithmetic, FE 500 km, FN 10 000 km
    * (+south) — so a wrong zone formula, false origin or series term
    * fails the hash; rt_ok pins the inverse at < 1e-7° ≈ 1 cm.
    */
  def spMga(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .filter(col("lon") >= 113.0 && col("lon") <= 154.0 &&
              col("lat") >= -44.0 && col("lat") <= -10.0)
      .withColumn("zone", (floor((col("lon") + 180.0) / 6.0) + 1).cast("int"))
      .withColumn("epsg", col("zone") + 7800)
      .withColumn("crs", concat(lit("EPSG:"), col("epsg")))
      .withColumn("crs94", concat(lit("EPSG:"), col("zone") + 28300))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("p94", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs94")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"), col("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("p94")) - st.x(col("p"))) < 1e-9 &&
          abs(st.y(col("p94")) - st.y(col("p"))) < 1e-9, 1).otherwise(0).as("gda94_same"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
          abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** The JPRCS zones spJprcs routes through, per latitude band:
    * (zone index 0-based, central meridian lon₀, origin latitude lat₀)
    * sorted by lon₀ — mainland zones I–X over the Honshū/Kyūshū band,
    * the island zones XVI/XV/XVII/XVIII/XIV over the southern band.
    * Values are the published Survey-Act table (the same constants the
    * registry holds — the oracle recomputes from THIS copy, so a
    * registry typo fails the hash compare rather than hiding).
    */
  private val jprcsMainland: Seq[(Int, Double, Double)] = Seq(
    (0, 129.5, 33.0), (1, 131.0, 33.0), (2, 132.16666666666666, 36.0),
    (3, 133.5, 33.0), (4, 134.33333333333334, 36.0), (5, 136.0, 36.0),
    (6, 137.16666666666666, 36.0), (7, 138.5, 36.0),
    (8, 139.8333333333333, 36.0), (9, 140.83333333333334, 40.0))
  private val jprcsSouth: Seq[(Int, Double, Double)] = Seq(
    (15, 124.0, 26.0), (14, 127.5, 26.0), (16, 131.0, 26.0),
    (17, 136.0, 20.0), (13, 142.0, 26.0))

  /** Nearest-central-meridian selection over a lon₀-sorted zone table:
    * one midpoint CASE — the Spark Column form and the SQL spelling
    * are generated from the SAME table, so the decision boundaries
    * cannot drift between engine and oracle.
    */
  private def jprcsPick(lon: Column, zones: Seq[(Int, Double, Double)],
                        f: ((Int, Double, Double)) => Column): Column = {
    val mids = zones.sliding(2).map {
      case Seq((_, a, _), (_, b, _)) => (a + b) / 2.0 }.toSeq
    zones.init.zip(mids).foldRight(f(zones.last)) {
      case (((z, mid)), acc) => when(lon < mid, f(z)).otherwise(acc)
    }
  }
  private def jprcsPickSql(zones: Seq[(Int, Double, Double)],
                           f: ((Int, Double, Double)) => String): String = {
    def dl(x: Double) = x.toString + "e0"
    val mids = zones.sliding(2).map {
      case Seq((_, a, _), (_, b, _)) => (a + b) / 2.0 }.toSeq
    val whens = zones.init.zip(mids).map { case (z, mid) =>
      s"WHEN lon < ${dl(mid)} THEN ${f(z)}" }.mkString(" ")
    s"CASE $whens ELSE ${f(zones.last)} END"
  }

  /** JGD2000 Japan Plane Rectangular CS zones resolved BY EPSG CODE
    * (r14 verdict task 7 — the statutory cadastral family, 2443–2461
    * in the registry): points in the mainland band (lat ≥ 30: zones
    * I–X) and the southern island band (lat 20–30: zones XVI, XV,
    * XVII, XVIII, XIV) each project through the zone whose central
    * meridian is nearest — deterministic midpoint arithmetic the
    * oracle replays from the same table (the STATUTORY assignment is
    * administrative, by prefecture; nearest-meridian is the standard
    * service-window proxy, max Δλ ≈ 0.85° mainland / 3° islands).
    * Unlike every other TM family in the suite, JPRCS has nonzero
    * per-zone origin latitudes (33/36/40/26/20) with ZERO false
    * origin, so the M₀ subtraction is exercised at k₀ = 0.9999 across
    * five different lat₀ values. The JGD2011 twin series (6669–6687)
    * must land the SAME grid coordinates — both datums are
    * ITRF-aligned null ties on GRS80 — so `jgd2011_same` pins the two
    * registry ranges against each other. rt_ok pins the inverse at
    * < 1e-7° ≈ 1 cm.
    */
  def spJprcs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      // a JAPAN-SCOPED lattice (the global customer lattice's lon/lat
      // congruence coupling leaves the Japan windows structurally
      // empty below sf0.1): customers ≢ 0 mod 3 land on the mainland
      // band (zones I-X), ≡ 0 on the southern island band
      .withColumn("lon",
        when(col("c_custkey") % 3 =!= 0,
          lit(128.85) + (col("c_custkey") * 7 % 124) / lit(10.0))
          .otherwise(lit(122.55) + (col("c_custkey") * 7 % 210) / lit(10.0)))
      .withColumn("lat",
        when(col("c_custkey") % 3 =!= 0,
          lit(30.05) + (col("c_custkey") * 11 % 160) / lit(10.0))
          .otherwise(lit(20.05) + (col("c_custkey") * 11 % 100) / lit(10.0)))
      .withColumn("geom", st.makePoint(col("lon"), col("lat")))
      .withColumn("zidx",
        when(col("lat") >= 30.0,
          jprcsPick(col("lon"), jprcsMainland, z => lit(z._1)))
          .otherwise(jprcsPick(col("lon"), jprcsSouth, z => lit(z._1))))
      .withColumn("epsg", col("zidx") + 2443)
      .withColumn("crs", concat(lit("EPSG:"), col("epsg")))
      .withColumn("crs11", concat(lit("EPSG:"), col("zidx") + 6669))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("p11", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs11")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"), col("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("p11")) - st.x(col("p"))) < 1e-9 &&
          abs(st.y(col("p11")) - st.y(col("p"))) < 1e-9, 1).otherwise(0).as("jgd2011_same"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
          abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** CGCS2000 Gauss-Krüger zones resolved BY EPSG CODE (r15 registry
    * growth — China's national TM series, whose ZONE-PREFIXED false
    * easting zone·10⁶ + 500000 at k₀ = 1 is the Gauss-Krüger signature
    * UTM lacks): a China-scoped customer lattice projects through BOTH
    * families — the 6° zones (4491–4501, n = ⌊lon/6⌋+1, CM 6n−3) and
    * the 3° zones (4513–4533, m = ⌊lon/3 + ½⌋, CM 3m) — each BY CODE.
    * Where a point's 3° central meridian coincides with its 6° one
    * (m = 2n−1, every other 3° belt) the two grids are the SAME
    * projection under different zone prefixes, so the northings must
    * agree bit-for-bit and the eastings must differ by EXACTLY
    * (m−n)·10⁶ — the cross-family pin `prefix_ok` (an affine-prefix
    * error in either family's registry row fails it). rt_ok pins the
    * 6°-grid inverse at < 1e-7° ≈ 1 cm.
    */
  def spCgcs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      .withColumn("lon", lit(73.65) + (col("c_custkey") * 7 % 610) / lit(10.0))
      .withColumn("lat", lit(18.25) + (col("c_custkey") * 11 % 350) / lit(10.0))
      .withColumn("geom", st.makePoint(col("lon"), col("lat")))
      .withColumn("n6", (floor(col("lon") / 6.0) + 1).cast("int"))
      .withColumn("m3", floor(col("lon") / 3.0 + 0.5).cast("int"))
      .withColumn("epsg6", col("n6") + 4478)
      .withColumn("epsg3", col("m3") + 4488)
      .withColumn("crs6", concat(lit("EPSG:"), col("epsg6")))
      .withColumn("crs3", concat(lit("EPSG:"), col("epsg3")))
      .withColumn("p6", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs6")))
      .withColumn("p3", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs3")))
      .withColumn("back", st.geomReproject(col("p6"), col("crs6"), lit("EPSG:4326")))
      .withColumn("same_cm", when(col("m3") === col("n6") * 2 - 1, 1).otherwise(0))
      .select(
        col("c_custkey"), col("epsg6"), col("epsg3"), col("same_cm"),
        round(st.x(col("p6")), 1).as("easting"),
        round(st.y(col("p6")), 1).as("northing"),
        when(col("same_cm") === 0 ||
          (abs(st.x(col("p3")) - st.x(col("p6")) -
            (col("m3") - col("n6")).cast("double") * 1e6) < 1e-6 &&
           abs(st.y(col("p3")) - st.y(col("p6"))) < 1e-9), 1)
          .otherwise(0).as("prefix_ok"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
          abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** Pulkovo 1942 Gauss-Krüger zones resolved BY EPSG CODE (r15b — the
    * ex-USSR archive family, and the suite's only 7-PARAM legacy chain
    * routed per-row through a GENERATED zone family): a Russia-window
    * lattice (zones 6–24, CM 33°E–141°E) projects through
    * EPSG 28400+n where n = ⌊lon/6⌋+1. The oracle replays the ENTIRE
    * chain — WGS84 geodetic → geocentric → inverse 7-param Helmert
    * (EPSG 1254, full adjugate-inverse matrix: rotation AND scale are
    * non-trivial) → Bowring ×3 on Krassowsky 1940 → the degrees→radians
    * seam → TM 6th-order series at k₀ = 1 with the zone-prefixed false
    * easting n·10⁶ + 500000 — so a registry parameter typo anywhere in
    * the chain hash-mismatches. rt_ok at 1e-6° (the 2D-Helmert
    * roundtrip contract, like sp_sterea/sp_krovak).
    */
  def spPulkovo(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey"))
      .withColumn("lon", lit(30.15) + (col("c_custkey") * 7 % 1100) / lit(10.0))
      .withColumn("lat", lit(42.05) + (col("c_custkey") * 11 % 280) / lit(10.0))
      .withColumn("geom", st.makePoint(col("lon"), col("lat")))
      .withColumn("n6", (floor(col("lon") / 6.0) + 1).cast("int"))
      .withColumn("epsg", col("n6") + 28400)
      .withColumn("crs", concat(lit("EPSG:"), col("epsg")))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(col("c_custkey"), col("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-6 &&
          abs(st.y(col("back")) - col("lat")) < 1e-6, 1).otherwise(0).as("rt_ok"))
      .orderBy("c_custkey")

  /** US State Plane zones resolved BY EPSG CODE (the r10 registry
    * growth — the most-asked-for family the r9 table lacked):
    * California zone 5 (EPSG:26945, LCC-2SP), Texas Central
    * (EPSG:32139, LCC-2SP) and New Mexico East (EPSG:32112, TM at
    * k₀ = 1−1/11000) over disjoint longitude windows of the customer
    * lattice — plus (r11) the ftUS TWINS of the LCC zones
    * (EPSG:2229 CA z5, EPSG:2277 TX Central, EPSG:2263 NY Long
    * Island, and the r11 Maryland meter/ftUS pair EPSG:26985/2248
    * re-projecting the NYLI stripe): same conic, meter-valued registry
    * false origins,
    * output scaled by the exact US survey foot (1200/3937 m) through
    * the +units=us-ft surface. The oracle replays each family's Snyder
    * forward with the REGISTRY's constants INCLUDING the unit division
    * — a wrong registry parameter or unit factor, not just a wrong
    * formula, fails the hash. The TM window stays within 1.5° of its
    * central meridian (the zone's real service regime), so the inverse
    * closes and rt_ok = 1 everywhere; the LCC windows span the wider
    * lattice stripes (the conic is service-wide at 12°Δλ).
    */
  def spStatePlane(s: SparkSession, dir: String): DataFrame = {
    val base = customerPoints(s, dir)
      .filter(col("lat") >= 25.0 && col("lat") <= 50.0)
    def project(frame: org.apache.spark.sql.DataFrame) = frame
      .filter(col("epsg").isNotNull)
      .withColumn("crs", concat(lit("EPSG:"), col("epsg")))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"), col("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-7 &&
          abs(st.y(col("back")) - col("lat")) < 1e-7, 1).otherwise(0).as("rt_ok"))
    val meters = base.withColumn("epsg",
      when(col("lon") >= -105.8 && col("lon") <= -102.9, lit(32112))
        .when(col("lon") >= -107.5 && col("lon") <= -93.0, lit(32139))
        .when(col("lon") >= -130.0 && col("lon") < -107.5, lit(26945)))
    // the ftUS twins re-project the same stripes (TX Central takes the
    // whole band — the NM carve-out existed only to exercise TM, which
    // has no registered ftUS twin here) plus the NY Long Island window
    val ftus = base.withColumn("epsg",
      when(col("lon") >= -107.5 && col("lon") <= -93.0, lit(2277))
        .when(col("lon") >= -130.0 && col("lon") < -107.5, lit(2229))
        .when(col("lon") >= -76.0 && col("lon") <= -72.0, lit(2263)))
    // the r11 Maryland meter/ftUS pair (EPSG:26985/2248) re-projects
    // the NYLI stripe a third and fourth time — the customer lattice's
    // lat-[25,50] band has no points between -94.55 and -72.55, so a
    // Maryland-local stripe would be vacuous; the adjacent-zone
    // projection (Δλ ≈ 4.5° from lon₀ = -77) is non-vacuous and
    // exercises the 2248/26985 pair end to end
    val mdM = base.withColumn("epsg",
      when(col("lon") >= -76.0 && col("lon") <= -72.0, lit(26985)))
    val mdF = base.withColumn("epsg",
      when(col("lon") >= -76.0 && col("lon") <= -72.0, lit(2248)))
    project(meters).unionByName(project(ftus))
      .unionByName(project(mdM)).unionByName(project(mdF))
      .orderBy("c_custkey", "epsg")
  }

  /** NAD27 State Plane BY CODE (r13 — the classic legacy-data ask):
    * the CONUS lattice stripes re-project to four Clarke 1866 ftUS
    * zones (CA 5 / TX Central / MA Mainland LCC + NM East TM) through
    * the full legacy chain — WGS84 → geocentric → 3-param CONUS tie →
    * Bowring → Snyder forward on clrk66 → ftUS — with the roundtrip
    * re-shifting back to WGS84. The oracle replays the identical chain
    * in SQL (the spDatumOracle machinery generalized to by-code zones).
    * The TM zone is NM East (32012, the NAD27 twin of 32112) because
    * its meridian sits inside a populated lattice stripe (Δλ ≤ 1.5°):
    * the 6th-order TM forward/inverse are mutual inverses to ≪1e-6°
    * there, while Illinois East's nearest lattice points (Δλ ≈ 4.7°)
    * round-trip only to ~1e-5° — 26771 stays registry+spec-anchored.
    */
  def spStatePlane27(s: SparkSession, dir: String): DataFrame = {
    val base = customerPoints(s, dir)
      .filter(col("lat") >= 25.0 && col("lat") <= 50.0)
    def project(frame: org.apache.spark.sql.DataFrame) = frame
      .filter(col("epsg").isNotNull)
      .withColumn("crs", concat(lit("EPSG:"), col("epsg")))
      .withColumn("p", st.geomReproject(col("geom"), lit("EPSG:4326"), col("crs")))
      .withColumn("back", st.geomReproject(col("p"), col("crs"), lit("EPSG:4326")))
      .select(
        col("c_custkey"), col("epsg"),
        round(st.x(col("p")), 1).as("easting"),
        round(st.y(col("p")), 1).as("northing"),
        when(abs(st.x(col("back")) - col("lon")) < 1e-6 &&
          abs(st.y(col("back")) - col("lat")) < 1e-6, 1).otherwise(0).as("rt_ok"))
    val lcc = base.withColumn("epsg",
      when(col("lon") >= -130.0 && col("lon") < -107.5, lit(26745))
        .when(col("lon") >= -107.5 && col("lon") <= -93.0, lit(32039))
        .when(col("lon") >= -76.0 && col("lon") <= -72.0, lit(26786)))
    val tm = base.withColumn("epsg",
      when(col("lon") >= -105.8 && col("lon") <= -102.9, lit(32012)))
    project(lcc).unionByName(project(tm)).orderBy("c_custkey", "epsg")
  }

  /** st_asLatLonText DMS formatting, value-checked: the oracle rebuilds
    * the identical degree/minute/second decomposition (trunc-based, same
    * IEEE ops) and formats with printf — DuckDB's fmt and Java's
    * Formatter agree on %d / %02d / %06.3f for these values.
    */
  def spLatLonText(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .select(col("c_custkey"), st.asLatLonText(col("geom")).as("dms"))
      .orderBy("c_custkey")

  /** TWKB wire format, value-checked: fixed-precision quantization
    * (precision 2 snaps coordinates to 1/100°, which the oracle
    * recomputes as round(deg·100)/100), the encoded byte length
    * re-derived from the zigzag-varint rules (1 header + 1 metadata byte
    * + ⌈bits(zigzag(v))/7⌉ per ordinate), and a constant spec vector —
    * POINT(1 2) at precision 0 is the 4-byte hex 01000204 — parsed back.
    * Extended dimensions (metadata 0x08 + dimensions byte, per the
    * reference's TWKBReader.java:93-126): a hand-derived POINT Z (1 2 3)
    * vector 010801020406 must parse with Z = 3 and coord-dim 3, and an
    * XYM point must roundtrip its measure through write+read with the
    * byte length the ext-dims arithmetic predicts (ext byte + 2-byte
    * m varint). bbox/size/idlist rejection stays spec-verified.
    */
  def spTwkb(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.x(st.geomFromTWKB(st.asTWKB(col("geom"), lit(2)))), 6).as("tw_x"),
      round(st.y(st.geomFromTWKB(st.asTWKB(col("geom"), lit(2)))), 6).as("tw_y"),
      org.apache.spark.sql.functions.length(st.asTWKB(col("geom"), lit(2))).cast("int").as("tw_len"),
      round(st.x(st.geomFromTWKB(unhex(lit("01000204")))), 6).as("const_x"),
      round(st.y(st.geomFromTWKB(unhex(lit("01000204")))), 6).as("const_y"),
      round(st.z(st.geomFromTWKB(unhex(lit("010801020406")))), 6).as("const_z"),
      st.coordDim(st.geomFromTWKB(unhex(lit("010801020406")))).as("const_zdim"),
      round(st.m(st.geomFromTWKB(st.asTWKB(
        st.makePointM(col("lon"), col("lat"), lit(7.0)), lit(2)))), 6).as("m_rt"),
      org.apache.spark.sql.functions.length(st.asTWKB(
        st.makePointM(col("lon"), col("lat"), lit(7.0)), lit(2))).cast("int").as("tw_len_m"))
      .orderBy("c_custkey")

  /** TWKB + deflate export pairing (the reference's cold-storage wire
    * format, jts/.../DeflateCompressor.scala): inflate(deflate(twkb))
    * must reproduce the exact quantized coordinates and byte count, and
    * the stream must open with the zlib default-compression header 789C
    * (CMF 0x78: deflate/32K window; FLG 0x9C: FLEVEL=2, check bits) —
    * all constants the oracle asserts.
    */
  def spTwkbDeflate(s: SparkSession, dir: String): DataFrame = {
    val twkb = st.asTWKB(col("geom"), lit(2))
    val rt = st.geomFromTWKB(st.inflate(st.deflate(twkb)))
    customerPoints(s, dir).select(
      col("c_custkey"),
      round(st.x(rt), 6).as("rt_x"),
      round(st.y(rt), 6).as("rt_y"),
      hex(substring(st.deflate(twkb), 1, 2)).as("hdr"),
      when(org.apache.spark.sql.functions.length(st.inflate(st.deflate(twkb))) ===
        org.apache.spark.sql.functions.length(twkb), 1).otherwise(0).as("len_ok"))
      .orderBy("c_custkey")
  }

  /** Geodesic buffer sandwich bound, value-checked: the 64-gon buffer's
    * vertices sit at exactly the spherical radius, and its chord sag is
    * ~(π/64)²/2 ≈ 0.12% of r, so every point with haversine distance
    * ≤ 0.98 r MUST test inside and every point ≥ 1.02 r MUST test
    * outside (equatorial test region → projection distortion far below
    * the 2% margin). The oracle recomputes the core count by haversine
    * and asserts zero violations either way; the exact polygon edge
    * stays spec + rows-only (`sp_buffer_count`).
    */
  def spBufferBounds(s: SparkSession, dir: String): DataFrame = {
    val radius = 2000000.0
    val center = st.makePoint(lit(0.05), lit(0.05))
    customerPoints(s, dir)
      .withColumn("__d", st.distanceSphere(col("geom"), center))
      .withColumn("__in", st.intersects(st.bufferPoint(center, lit(radius)), col("geom")))
      .agg(
        sum(when(col("__d") <= radius * 0.98, 1).otherwise(0)).as("n_core"),
        sum(when(col("__d") <= radius * 0.98 && !col("__in"), 1).otherwise(0)).as("viol_in"),
        sum(when(col("__d") >= radius * 1.02 && col("__in"), 1).otherwise(0)).as("viol_out"))
  }

  /** Grouped convex hull through the native aggregate; the hull's
    * envelope must equal the group's coordinate min/max, which the
    * oracle recomputes arithmetically — a value-level check that the
    * aggregate visits every member through partial + final aggregation.
    */
  def spHullAggr(s: SparkSession, dir: String): DataFrame =
    customerPoints(s, dir)
      .groupBy((col("c_custkey") % 10).as("grp"))
      .agg(st.extentFromGeom(st.convexHullAggr(col("geom"))).as("e"))
      .select(col("grp"),
        round(col("e.xmin"), 6).as("xmin"), round(col("e.ymin"), 6).as("ymin"),
        round(col("e.xmax"), 6).as("xmax"), round(col("e.ymax"), 6).as("ymax"))
      .orderBy("grp")

  // One Z2-layout write per (JVM, sf dir) — the layout is write-once-
  // read-many; bench iterations 2..n and every real window query pay
  // only the pruned read.
  private val z2LayoutReady = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** End-to-end value check of the Z2-clustered layout
    * ([[graft.sources.SpatialLayout]]): write customer points through
    * writeZ2 (directory partitions + spill dir + sorted row groups),
    * read a European window back through the triple-pruned readWindow
    * path, and return every surviving point. The oracle replays the
    * window as a plain coordinate filter — any row lost to directory
    * pruning (the classic boundary-crossing bug the spill dir exists
    * for) or gained from a bad residual fails the hash compare.
    * SpatialLayoutSpec keeps the plan-level claims (fewer files read,
    * PartitionFilters); this entry pins the data-level claim.
    */
  def spZ2Layout(s: SparkSession, dir: String): DataFrame = {
    val path = z2LayoutReady.computeIfAbsent(dir, { d =>
      val p = java.nio.file.Files.createTempDirectory("graft-z2-layout").toString + "/pts"
      graft.sources.SpatialLayout.writeZ2(customerPoints(s, d), "geom", p)
      p
    })
    graft.sources.SpatialLayout.readWindow(s, path, -30.0, 20.0, 40.0, 70.0)
      .select(col("c_custkey"),
        round(col("lon"), 6).as("x"),
        round(col("lat"), 6).as("y"))
      .orderBy("c_custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sp_construct" -> spConstruct _,
    "sp_hull_aggr" -> spHullAggr _,
    "sp_measure" -> spMeasure _,
    "sp_bbox_filter" -> spBboxFilter _,
    "sp_distance_knn" -> spDistanceKnn _,
    "sp_distance_sphere" -> spDistanceSphere _,
    "sp_wkt_roundtrip" -> spWktRoundtrip _,
    "sp_wkb_roundtrip" -> spWkbRoundtrip _,
    "sp_geojson_roundtrip" -> spGeojsonRoundtrip _,
    "sp_geohash" -> spGeohash _,
    "sp_contains" -> spContains _,
    "sp_predicates" -> spPredicates _,
    "sp_accessors" -> spAccessors _,
    "sp_process" -> spProcess _,
    "sp_twkb" -> spTwkb _,
    "sp_twkb_deflate" -> spTwkbDeflate _,
    "sp_utm" -> spUtm _,
    "sp_polar" -> spPolar _,
    "sp_laea" -> spLaea _,
    "sp_lcc" -> spLcc _,
    "sp_albers" -> spAlbers _,
    "sp_epsg" -> spEpsg _,
    "sp_mga" -> spMga _,
    "sp_jprcs" -> spJprcs _,
    "sp_cgcs" -> spCgcs _,
    "sp_pulkovo" -> spPulkovo _,
    "sp_stateplane" -> spStatePlane _,
    "sp_stateplane27" -> spStatePlane27 _,
    "sp_datum" -> spDatum _,
    "sp_nadgrids" -> spNadgrids _,
    "sp_omerc" -> spOmerc _,
    "sp_sterea" -> spSterea _,
    "sp_krovak" -> spKrovak _,
    "sp_sinu" -> spSinu _,
    "sp_modis" -> spModis _,
    "sp_moll" -> spMoll _,
    "sp_merc" -> spMerc _,
    "sp_cea" -> spCea _,
    "sp_eqc" -> spEqc _,
    "sp_aeqd" -> spAeqd _,
    "sp_robinson" -> spRobinson _,
    "sp_geos" -> spGeos _,
    "sp_latlon" -> spLatLonText _,
    "sp_overlay" -> spOverlay _,
    "sp_extent_prune" -> spExtentPrune _,
    "sp_reproject" -> spReproject _,
    "sp_z2_partition" -> spZ2Partition _,
    "sp_partition" -> spPartition _,
    "sp_buffer_count" -> spBufferCount _,
    "sp_buffer_bounds" -> spBufferBounds _,
    "sp_spatial_join" -> spSpatialJoin _,
    "sp_knn_join" -> spKnnJoin _,
    "sp_z2_layout" -> spZ2Layout _
  )

  /** Morton interleave as SQL: bit k of ix → position 2k, bit k of iy →
    * position 2k+1 (graft.geom.Z2.index's even/odd layout).
    */
  private def z2InterleaveSql(ix: String, iy: String, bits: Int): String =
    (0 until bits).map(k =>
      s"((($ix >> $k) & 1) << ${2 * k}) + ((($iy >> $k) & 1) << ${2 * k + 1})")
      .mkString(" + ")

  /** Snyder forward transverse-mercator series as DuckDB SQL, mirroring
    * geom/Projections.Utm.fromGeo operation-for-operation (same literals,
    * same associativity, intermediate powers chained a3=a2·a … a6=a5·a)
    * so both engines produce bit-identical doubles up to libm's 1-ulp
    * sin/cos/tan differences — absorbed by the 0.1 m rounding. E2/Ep2 are
    * interpolated as shortest-roundtrip literals of the Scala doubles.
    */
  private val spUtmOracle: String = {
    val f = 1.0 / 298.257223563
    // exponent notation forces a DOUBLE literal in DuckDB (a plain
    // 19-digit decimal parses as DECIMAL and overflows on multiply)
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))          // = Projections' E2, same IEEE ops
    val ep2 = dlit((f * (2.0 - f)) / (1.0 - f * (2.0 - f)))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |z AS (SELECT c_custkey, lon, lat,
       |        (floor((lon + 180.0) / 6.0) + 1)::INT AS zone FROM b),
       |g AS (SELECT c_custkey, lon, lat, zone,
       |        radians(lat) AS phi,
       |        sin(radians(lat)) AS sphi,
       |        cos(radians(lat)) AS cphi,
       |        tan(radians(lat)) AS tphi,
       |        cos(radians(lat)) * (radians(lon) - radians(-183.0 + 6.0 * zone)) AS aa
       |      FROM z),
       |h AS (SELECT *,
       |        6378137.0 / sqrt(1.0 - $e2 * sphi * sphi) AS nn,
       |        tphi * tphi AS tt,
       |        $ep2 * cphi * cphi AS cc,
       |        aa * aa AS a2
       |      FROM g),
       |i AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM h),
       |j AS (SELECT *, a3 * aa AS a4 FROM i),
       |k AS (SELECT *, a4 * aa AS a5 FROM j),
       |l AS (SELECT *, a5 * aa AS a6,
       |        6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * phi
       |          - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * phi)
       |          + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * phi)
       |          - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * phi)) AS mm
       |      FROM k)
       |SELECT c_custkey, zone,
       | round(0.9996 * nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |   + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2) * a5 / 120.0) + 500000.0, 1) AS easting,
       | round(0.9996 * (mm + ntan * (a2 / 2.0
       |   + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |   + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2) * a6 / 720.0))
       |   + (CASE WHEN lat >= 0 THEN 0.0 ELSE 10000000.0 END), 1) AS northing,
       | 1 AS rt_ok
       |FROM l ORDER BY c_custkey""".stripMargin
  }

  /** Snyder polar-stereographic variant-B forward as DuckDB SQL,
    * mirroring geom/Projections.PolarStereo op-for-op (t via 15-9, ρ via
    * 21-34, x/y via 21-30/31, south aspect = sign reversal — exact in
    * IEEE, so spelled as the simplified signs). libm 1-ulp sin/cos/pow
    * differences are absorbed by the 0.1 m rounding.
    */
  private val spPolarOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE abs($latSql) >= 60.0),
       |c AS (SELECT *, sqrt($e2) AS e FROM b),
       |g AS (SELECT c_custkey, lon, lat, e,
       |        CASE WHEN lat < 0 THEN radians(71.0) ELSE radians(70.0) END AS phic,
       |        CASE WHEN lat < 0 THEN radians(-lat) ELSE radians(lat) END AS phi,
       |        CASE WHEN lat < 0 THEN radians(-lon)
       |             ELSE radians(lon) - radians(-45.0) END AS dlam
       |      FROM c),
       |h AS (SELECT *,
       |        tan(pi() / 4.0 - phic / 2.0) / pow((1.0 - e * sin(phic)) / (1.0 + e * sin(phic)), e / 2.0) AS tc,
       |        cos(phic) / sqrt(1.0 - $e2 * sin(phic) * sin(phic)) AS mc,
       |        tan(pi() / 4.0 - phi / 2.0) / pow((1.0 - e * sin(phi)) / (1.0 + e * sin(phi)), e / 2.0) AS t
       |      FROM g),
       |i AS (SELECT *, 6378137.0 * mc * t / tc AS rho FROM h)
       |SELECT c_custkey,
       | CASE WHEN lat < 0 THEN 3031 ELSE 3413 END AS epsg,
       | round(CASE WHEN lat < 0 THEN -(rho * sin(dlam)) ELSE rho * sin(dlam) END, 1) AS easting,
       | round(CASE WHEN lat < 0 THEN rho * cos(dlam) ELSE -(rho * cos(dlam)) END, 1) AS northing,
       | 1 AS rt_ok
       |FROM i ORDER BY c_custkey""".stripMargin
  }

  /** Snyder ellipsoidal LAEA forward as DuckDB SQL, mirroring
    * geom/Projections.Laea op-for-op (authalic q via 3-12, β, R_q, m1, D,
    * B, then 24-30/31 with the false origin added last). libm 1-ulp
    * differences are absorbed by the 0.1 m rounding in the [−30°, 50°]
    * window (far from the antipodal amplification).
    */
  private val spLaeaOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    def qOf(s: String) =
      s"(1.0 - $e2) * (($s) / (1.0 - $e2 * ($s) * ($s)) - (1.0 / (2.0 * e)) * ln((1.0 - e * ($s)) / (1.0 + e * ($s))))"
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -30.0 AND ($lonSql) <= 50.0),
       |c AS (SELECT *, sqrt($e2) AS e FROM b),
       |g AS (SELECT *,
       |        ${qOf("sin(pi() / 2.0)")} AS qp,
       |        ${qOf("sin(radians(52.0))")} AS q1,
       |        cos(radians(52.0)) / sqrt(1.0 - $e2 * sin(radians(52.0)) * sin(radians(52.0))) AS m1,
       |        ${qOf("sin(radians(lat))")} AS q,
       |        radians(lon) - radians(10.0) AS dlam
       |      FROM c),
       |h AS (SELECT *,
       |        asin(q1 / qp) AS beta1,
       |        asin(q / qp) AS beta,
       |        6378137.0 * sqrt(qp / 2.0) AS rq
       |      FROM g),
       |i AS (SELECT *,
       |        sin(beta1) AS sinb1, cos(beta1) AS cosb1,
       |        sin(beta) AS sinb, cos(beta) AS cosb,
       |        6378137.0 * m1 / (rq * cos(beta1)) AS dd
       |      FROM h),
       |j AS (SELECT *,
       |        rq * sqrt(2.0 / (1.0 + sinb1 * sinb + cosb1 * cosb * cos(dlam))) AS bb
       |      FROM i)
       |SELECT c_custkey,
       | round(bb * dd * (cosb * sin(dlam)) + 4321000.0, 1) AS easting,
       | round((bb / dd) * (cosb1 * sinb - sinb1 * cosb * cos(dlam)) + 3210000.0, 1) AS northing,
       | 1 AS rt_ok
       |FROM j ORDER BY c_custkey""".stripMargin
  }

  /** Snyder LCC-2SP forward as DuckDB SQL, mirroring
    * geom/Projections.Lcc2sp op-for-op (t via 15-9, m via 14-15, n/F/ρ0
    * via 15-8/15-10/15-7a, then 14-1/14-2 with the false origin added
    * first, matching the Scala `fe + ρ sinθ` order).
    */
  private val spLccOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    def tOf(phi: String) =
      s"tan(pi() / 4.0 - ($phi) / 2.0) / pow((1.0 - e * sin($phi)) / (1.0 + e * sin($phi)), e / 2.0)"
    def mOf(phi: String) =
      s"cos($phi) / sqrt(1.0 - $e2 * sin($phi) * sin($phi))"
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -30.0 AND ($lonSql) <= 36.0
       |             AND ($latSql) >= 20.0 AND ($latSql) <= 70.0),
       |c AS (SELECT *, sqrt($e2) AS e FROM b),
       |g AS (SELECT *,
       |        ${mOf("radians(49.0)")} AS m1, ${mOf("radians(44.0)")} AS m2,
       |        ${tOf("radians(49.0)")} AS t1, ${tOf("radians(44.0)")} AS t2,
       |        ${tOf("radians(46.5)")} AS t0,
       |        ${tOf("radians(lat)")} AS t
       |      FROM c),
       |h AS (SELECT *, (ln(m1) - ln(m2)) / (ln(t1) - ln(t2)) AS n FROM g),
       |i AS (SELECT *, m1 / (n * pow(t1, n)) AS ff FROM h),
       |j AS (SELECT *,
       |        6378137.0 * ff * pow(t0, n) AS rho0,
       |        6378137.0 * ff * pow(t, n) AS rho,
       |        n * (radians(lon) - radians(3.0)) AS theta
       |      FROM i)
       |SELECT c_custkey,
       | round(700000.0 + rho * sin(theta), 1) AS easting,
       | round(6600000.0 + rho0 - rho * cos(theta), 1) AS northing,
       | 1 AS rt_ok
       |FROM j ORDER BY c_custkey""".stripMargin
  }

  /** Snyder Albers forward series (15-19..15-26) mirrored op-for-op:
    * same q/m functions, n = (m1²−m2²)/(q2−q1), C = m1²+n·q1,
    * ρ = a·sqrt(C−n·q)/n, θ = n·Δλ. EPSG:5070 parameters.
    */
  private val spAlbersOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    def qOf(phi: String) =
      s"(1.0 - $e2) * (sin($phi) / (1.0 - $e2 * sin($phi) * sin($phi)) - " +
        s"(1.0 / (2.0 * e)) * ln((1.0 - e * sin($phi)) / (1.0 + e * sin($phi))))"
    def mOf(phi: String) =
      s"cos($phi) / sqrt(1.0 - $e2 * sin($phi) * sin($phi))"
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -125.0 AND ($lonSql) <= -67.0
       |             AND ($latSql) >= 25.0 AND ($latSql) <= 49.0),
       |c AS (SELECT *, sqrt($e2) AS e FROM b),
       |g AS (SELECT *,
       |        ${mOf("radians(29.5)")} AS m1, ${mOf("radians(45.5)")} AS m2,
       |        ${qOf("radians(29.5)")} AS q1, ${qOf("radians(45.5)")} AS q2,
       |        ${qOf("radians(23.0)")} AS q0,
       |        ${qOf("radians(lat)")} AS q
       |      FROM c),
       |h AS (SELECT *, (m1 * m1 - m2 * m2) / (q2 - q1) AS n FROM g),
       |i AS (SELECT *, m1 * m1 + n * q1 AS cc FROM h),
       |j AS (SELECT *,
       |        6378137.0 * sqrt(cc - n * q0) / n AS rho0,
       |        6378137.0 * sqrt(cc - n * q) / n AS rho,
       |        n * (radians(lon) - radians(-96.0)) AS theta
       |      FROM i)
       |SELECT c_custkey,
       | round(rho * sin(theta), 1) AS easting,
       | round(rho0 - rho * cos(theta), 1) AS northing,
       | 1 AS rt_ok
       |FROM j ORDER BY c_custkey""".stripMargin
  }

  /** Three EPSG-registry grids replayed with the REGISTRY's constants:
    * the NZTM TM series (spUtmOracle's spelling at k₀ = 0.9996,
    * λ₀ = 173°, FE/FN = 1 600 000/10 000 000), the Australian Albers
    * series (spAlbersOracle's spelling at φ₁/φ₂ = −18/−36, λ₀ = 132)
    * and the variant-B polar stereographic north aspect (spPolarOracle's
    * spelling at lat_ts = 71, λ₀ = 0). GRS80 resolves to the WGS84
    * ellipsoid object (sub-0.1 mm, the documented policy), so one e²
    * serves all three.
    */
  private val spEpsgOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    val ep2 = dlit((f * (2.0 - f)) / (1.0 - f * (2.0 - f)))
    def qOf(phi: String) =
      s"(1.0 - $e2) * (sin($phi) / (1.0 - $e2 * sin($phi) * sin($phi)) - " +
        s"(1.0 / (2.0 * e)) * ln((1.0 - e * sin($phi)) / (1.0 + e * sin($phi))))"
    def mOf(phi: String) =
      s"cos($phi) / sqrt(1.0 - $e2 * sin($phi) * sin($phi))"
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |nzg AS (SELECT c_custkey, lon, lat,
       |        radians(lat) AS phi, sin(radians(lat)) AS sphi,
       |        cos(radians(lat)) AS cphi, tan(radians(lat)) AS tphi,
       |        cos(radians(lat)) * (radians(lon) - radians(173.0)) AS aa
       |      FROM b WHERE lon >= 166.0 AND lon <= 179.0 AND lat >= -47.0 AND lat <= -34.0),
       |nzh AS (SELECT *,
       |        6378137.0 / sqrt(1.0 - $e2 * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2 * cphi * cphi AS cc, aa * aa AS a2 FROM nzg),
       |nzi AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM nzh),
       |nzj AS (SELECT *, a3 * aa AS a4 FROM nzi),
       |nzk AS (SELECT *, a4 * aa AS a5 FROM nzj),
       |nzl AS (SELECT *, a5 * aa AS a6,
       |        6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * phi
       |          - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * phi)
       |          + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * phi)
       |          - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * phi)) AS mm
       |      FROM nzk),
       |nz AS (SELECT c_custkey, 2193 AS epsg,
       |        round(0.9996 * nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |          + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2) * a5 / 120.0) + 1600000.0, 1) AS easting,
       |        round(0.9996 * (mm + ntan * (a2 / 2.0
       |          + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |          + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2) * a6 / 720.0)) + 10000000.0, 1) AS northing
       |      FROM nzl),
       |aub AS (SELECT c_custkey, lon, lat, sqrt($e2) AS e FROM b
       |        WHERE lon >= 113.0 AND lon <= 154.0 AND lat >= -44.0 AND lat <= -10.0),
       |aug AS (SELECT *, ${mOf("radians(-18.0)")} AS m1, ${mOf("radians(-36.0)")} AS m2,
       |        ${qOf("radians(-18.0)")} AS q1, ${qOf("radians(-36.0)")} AS q2,
       |        ${qOf("radians(0.0)")} AS q0, ${qOf("radians(lat)")} AS q FROM aub),
       |auh AS (SELECT *, (m1 * m1 - m2 * m2) / (q2 - q1) AS n FROM aug),
       |aui AS (SELECT *, m1 * m1 + n * q1 AS cc2 FROM auh),
       |auj AS (SELECT *, 6378137.0 * sqrt(cc2 - n * q0) / n AS rho0,
       |        6378137.0 * sqrt(cc2 - n * q) / n AS rho,
       |        n * (radians(lon) - radians(132.0)) AS theta FROM aui),
       |au AS (SELECT c_custkey, 3577 AS epsg,
       |        round(rho * sin(theta), 1) AS easting,
       |        round(rho0 - rho * cos(theta), 1) AS northing FROM auj),
       |arb AS (SELECT c_custkey, lon, lat, sqrt($e2) AS e FROM b WHERE lat >= 60.0),
       |arh AS (SELECT *,
       |        tan(pi() / 4.0 - radians(71.0) / 2.0) / pow((1.0 - e * sin(radians(71.0))) / (1.0 + e * sin(radians(71.0))), e / 2.0) AS tc,
       |        cos(radians(71.0)) / sqrt(1.0 - $e2 * sin(radians(71.0)) * sin(radians(71.0))) AS mc,
       |        tan(pi() / 4.0 - radians(lat) / 2.0) / pow((1.0 - e * sin(radians(lat))) / (1.0 + e * sin(radians(lat))), e / 2.0) AS t
       |      FROM arb),
       |ari AS (SELECT *, 6378137.0 * mc * t / tc AS rho FROM arh),
       |ar AS (SELECT c_custkey, 3995 AS epsg,
       |        round(rho * sin(radians(lon)), 1) AS easting,
       |        round(-(rho * cos(radians(lon))), 1) AS northing FROM ari)
       |SELECT c_custkey, epsg, easting, northing, 1 AS rt_ok
       |FROM (SELECT * FROM nz UNION ALL SELECT * FROM au UNION ALL SELECT * FROM ar)
       |ORDER BY c_custkey""".stripMargin
  }

  /** spMga's replay: the TM 6th-order series (spUtmOracle's spelling,
    * the registry's GRS80→WGS84 sub-0.1 mm constants) with PER-ROW
    * zone arithmetic — lon₀ = 6·zone − 183, FE 500 km, FN 10 000 km.
    * gda94_same replays as the literal 1 the twin-range equality must
    * produce (a divergence on the engine side hash-fails).
    */
  private val spMgaOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    val ep2 = dlit((f * (2.0 - f)) / (1.0 - f * (2.0 - f)))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= 113.0 AND ($lonSql) <= 154.0
       |             AND ($latSql) >= -44.0 AND ($latSql) <= -10.0),
       |mb AS (SELECT c_custkey, lon, lat,
       |        (floor((lon + 180.0) / 6.0) + 1)::INT AS zone FROM b),
       |mg AS (SELECT *, radians(lat) AS phi, sin(radians(lat)) AS sphi,
       |        cos(radians(lat)) AS cphi, tan(radians(lat)) AS tphi,
       |        cos(radians(lat)) * (radians(lon) - radians(6.0 * zone - 183.0)) AS aa
       |      FROM mb),
       |mh AS (SELECT *,
       |        6378137.0 / sqrt(1.0 - $e2 * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2 * cphi * cphi AS cc, aa * aa AS a2 FROM mg),
       |mi AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM mh),
       |mj AS (SELECT *, a3 * aa AS a4 FROM mi),
       |mk AS (SELECT *, a4 * aa AS a5 FROM mj),
       |ml AS (SELECT *, a5 * aa AS a6,
       |        6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * phi
       |          - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * phi)
       |          + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * phi)
       |          - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * phi)) AS mm
       |      FROM mk)
       |SELECT c_custkey, zone + 7800 AS epsg,
       |  round(0.9996 * nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |    + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2) * a5 / 120.0) + 500000.0, 1) AS easting,
       |  round(0.9996 * (mm + ntan * (a2 / 2.0
       |    + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |    + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2) * a6 / 720.0)) + 10000000.0, 1) AS northing,
       |  1 AS gda94_same, 1 AS rt_ok
       |FROM ml ORDER BY c_custkey""".stripMargin
  }

  /** spJprcs's replay: the TM 6th-order series (spUtmOracle's
    * spelling) at the REGISTRY's JPRCS constants — per-zone lon₀ AND
    * lat₀ lookups (the nearest-meridian CASE selects both; lat₀ spans
    * 20/26/33/36/40 across the routed zones, each M₀ subtracted from
    * the arc), k₀ = 0.9999, zero false origin.
    * jgd2011_same replays as the literal 1 the twin-range equality
    * must produce.
    */
  private val spJprcsOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    val ep2 = dlit((f * (2.0 - f)) / (1.0 - f * (2.0 - f)))
    def arcOf(phi: String) =
      s"6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * ($phi)" +
        s" - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * ($phi))" +
        s" + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * ($phi))" +
        s" - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * ($phi)))"
    def dl(x: Double) = x.toString + "e0"
    def band(f: ((Int, Double, Double)) => String): String =
      s"CASE WHEN lat >= 30.0 THEN ${jprcsPickSql(jprcsMainland, f)} " +
        s"ELSE ${jprcsPickSql(jprcsSouth, f)} END"
    val zidxSql = band(z => z._1.toString)
    val lon0Sql = band(z => dl(z._2))
    val lat0Sql = band(z => dl(z._3))
    s"""WITH b AS (SELECT c_custkey,
       |        CASE WHEN c_custkey % 3 <> 0
       |             THEN 128.85 + ((c_custkey * 7) % 124) / 10.0
       |             ELSE 122.55 + ((c_custkey * 7) % 210) / 10.0 END AS lon,
       |        CASE WHEN c_custkey % 3 <> 0
       |             THEN 30.05 + ((c_custkey * 11) % 160) / 10.0
       |             ELSE 20.05 + ((c_custkey * 11) % 100) / 10.0 END AS lat
       |      FROM customer),
       |jz AS (SELECT c_custkey, lon, lat,
       |        $zidxSql AS zidx,
       |        $lon0Sql AS lon0,
       |        $lat0Sql AS lat0
       |      FROM b),
       |jg AS (SELECT *, radians(lat) AS phi, sin(radians(lat)) AS sphi,
       |        cos(radians(lat)) AS cphi, tan(radians(lat)) AS tphi,
       |        cos(radians(lat)) * (radians(lon) - radians(lon0)) AS aa
       |      FROM jz),
       |jh AS (SELECT *,
       |        6378137.0 / sqrt(1.0 - $e2 * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2 * cphi * cphi AS cc, aa * aa AS a2 FROM jg),
       |ji AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM jh),
       |jj AS (SELECT *, a3 * aa AS a4 FROM ji),
       |jk AS (SELECT *, a4 * aa AS a5 FROM jj),
       |jl AS (SELECT *, a5 * aa AS a6,
       |        ${arcOf("phi")} AS mm,
       |        ${arcOf("radians(lat0)")} AS m0
       |      FROM jk)
       |SELECT c_custkey, zidx + 2443 AS epsg,
       |  round(0.9999 * nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |    + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2) * a5 / 120.0), 1) AS easting,
       |  round(0.9999 * (mm - m0 + ntan * (a2 / 2.0
       |    + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |    + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2) * a6 / 720.0)), 1) AS northing,
       |  1 AS jgd2011_same, 1 AS rt_ok
       |FROM jl ORDER BY c_custkey""".stripMargin
  }

  /** spCgcs's replay: the TM 6th-order series (spUtmOracle's spelling)
    * at the registry's CGCS2000 Gauss-Krüger constants, with the zone
    * arithmetic in SQL — n = ⌊lon/6⌋+1, lon₀ = 6n−3,
    * FE = n·10⁶ + 500000 (the zone prefix), k₀ = 1, lat₀ = 0 (the M₀
    * term vanishes). same_cm replays the m = 2n−1 parity; prefix_ok
    * and rt_ok replay as the literal 1 the cross-family and roundtrip
    * pins must produce.
    */
  private val spCgcsOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    val ep2 = dlit((f * (2.0 - f)) / (1.0 - f * (2.0 - f)))
    def arcOf(phi: String) =
      s"6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * ($phi)" +
        s" - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * ($phi))" +
        s" + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * ($phi))" +
        s" - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * ($phi)))"
    s"""WITH b AS (SELECT c_custkey,
       |        73.65 + ((c_custkey * 7) % 610) / 10.0 AS lon,
       |        18.25 + ((c_custkey * 11) % 350) / 10.0 AS lat
       |      FROM customer),
       |cz AS (SELECT c_custkey, lon, lat,
       |        (floor(lon / 6.0))::INT + 1 AS n6,
       |        (floor(lon / 3.0 + 0.5))::INT AS m3 FROM b),
       |cg AS (SELECT *, radians(lat) AS phi, sin(radians(lat)) AS sphi,
       |        cos(radians(lat)) AS cphi, tan(radians(lat)) AS tphi,
       |        cos(radians(lat)) * (radians(lon) - radians(6.0 * n6 - 3.0)) AS aa
       |      FROM cz),
       |ch AS (SELECT *,
       |        6378137.0 / sqrt(1.0 - $e2 * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2 * cphi * cphi AS cc, aa * aa AS a2 FROM cg),
       |ci AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM ch),
       |cj AS (SELECT *, a3 * aa AS a4 FROM ci),
       |ck AS (SELECT *, a4 * aa AS a5 FROM cj),
       |cl AS (SELECT *, a5 * aa AS a6, ${arcOf("phi")} AS mm FROM ck)
       |SELECT c_custkey, n6 + 4478 AS epsg6, m3 + 4488 AS epsg3,
       |  CASE WHEN m3 = 2 * n6 - 1 THEN 1 ELSE 0 END AS same_cm,
       |  round(n6 * 1000000.0 + 500000.0 + nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |    + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2) * a5 / 120.0), 1) AS easting,
       |  round(mm + ntan * (a2 / 2.0
       |    + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |    + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2) * a6 / 720.0), 1) AS northing,
       |  1 AS prefix_ok, 1 AS rt_ok
       |FROM cl ORDER BY c_custkey""".stripMargin
  }

  /** spPulkovo's replay: the full 7-param legacy chain in SQL — WGS84
    * geodetic → geocentric → inverse Helmert with the EPSG-1254 matrix
    * (adjugate inverse re-derived in Scala with the identical IEEE
    * expressions, riding as shortest-roundtrip literals, exactly as
    * the sp_sterea oracle does) → Bowring ×3 on Krassowsky (the
    * sp_stateplane27 EXCLUDE-iteration pattern) → degrees→radians
    * seam → TM series at k₀ = 1 with per-row zone arithmetic
    * (n = ⌊lon/6⌋+1 on the WGS longitude, the same routing the query
    * runs) and FE = n·10⁶ + 500000.
    */
  private val spPulkovoOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val fw = 1.0 / 298.257223563
    val e2w = dlit(fw * (2.0 - fw))
    // Krassowsky 1940, same IEEE ops as Ellipsoid(a, f)
    val akD = 6378245.0
    val fk = 1.0 / 298.3
    val e2kD = fk * (2.0 - fk)
    val e2k = dlit(e2kD)
    val ep2k = dlit(e2kD / (1.0 - e2kD))
    val ak = dlit(akD)
    val bk = dlit(akD * (1.0 - fk))
    // 7-param Helmert (EPSG 1254 tie), inverse matrix exactly as
    // Projections.Helmert computes it
    val (dx, dy, dz) = (23.92, -141.27, -80.9)
    val (rxS, ryS, rzS, dsP) = (0.0, 0.35, 0.82, -0.12)
    val sH = 1.0 + dsP * 1e-6
    val rx = math.toRadians(rxS / 3600.0)
    val ry = math.toRadians(ryS / 3600.0)
    val rz = math.toRadians(rzS / 3600.0)
    val m11 = sH; val m12 = -sH * rz; val m13 = sH * ry
    val m21 = sH * rz; val m22 = sH; val m23 = -sH * rx
    val m31 = -sH * ry; val m32 = sH * rx; val m33 = sH
    val det = m11 * (m22 * m33 - m23 * m32) -
      m12 * (m21 * m33 - m23 * m31) + m13 * (m21 * m32 - m22 * m31)
    val i11 = dlit((m22 * m33 - m23 * m32) / det)
    val i12 = dlit((m13 * m32 - m12 * m33) / det)
    val i13 = dlit((m12 * m23 - m13 * m22) / det)
    val i21 = dlit((m23 * m31 - m21 * m33) / det)
    val i22 = dlit((m11 * m33 - m13 * m31) / det)
    val i23 = dlit((m13 * m21 - m11 * m23) / det)
    val i31 = dlit((m21 * m32 - m22 * m31) / det)
    val i32 = dlit((m12 * m31 - m11 * m32) / det)
    val i33 = dlit((m11 * m22 - m12 * m21) / det)
    val dxL = dlit(dx); val dyL = dlit(dy); val dzL = dlit(dz)
    def arcK(phi: String) =
      s"$ak * ((1.0 - $e2k / 4.0 - 3.0 * $e2k * $e2k / 64.0 - 5.0 * $e2k * $e2k * $e2k / 256.0) * ($phi)" +
        s" - (3.0 * $e2k / 8.0 + 3.0 * $e2k * $e2k / 32.0 + 45.0 * $e2k * $e2k * $e2k / 1024.0) * sin(2.0 * ($phi))" +
        s" + (15.0 * $e2k * $e2k / 256.0 + 45.0 * $e2k * $e2k * $e2k / 1024.0) * sin(4.0 * ($phi))" +
        s" - (35.0 * $e2k * $e2k * $e2k / 3072.0) * sin(6.0 * ($phi)))"
    s"""WITH b AS (SELECT c_custkey,
       |        30.15 + ((c_custkey * 7) % 1100) / 10.0 AS lon,
       |        42.05 + ((c_custkey * 11) % 280) / 10.0 AS lat
       |      FROM customer),
       |w AS (SELECT *, sin(radians(lat)) AS sp,
       |        6378137.0 / sqrt(1.0 - $e2w * sin(radians(lat)) * sin(radians(lat))) AS nw
       |      FROM b),
       |g AS (SELECT *,
       |        nw * cos(radians(lat)) * cos(radians(lon)) AS gx,
       |        nw * cos(radians(lat)) * sin(radians(lon)) AS gy,
       |        nw * (1.0 - $e2w) * sp AS gz
       |      FROM w),
       |h AS (SELECT *, gx - ($dxL) AS ux, gy - ($dyL) AS uy, gz - ($dzL) AS uz FROM g),
       |hm AS (SELECT *,
       |        $i11 * ux + $i12 * uy + $i13 * uz AS hx,
       |        $i21 * ux + $i22 * uy + $i23 * uz AS hy,
       |        $i31 * ux + $i32 * uy + $i33 * uz AS hz FROM h),
       |p0 AS (SELECT *, atan2(hy, hx) AS lam, sqrt(hx * hx + hy * hy) AS pp FROM hm),
       |u0 AS (SELECT *, atan2(hz * $ak, pp * $bk) AS u FROM p0),
       |i1 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u0),
       |f1 AS (SELECT *,
       |        atan2(hz + $ep2k * $bk * su * su * su,
       |              pp - $e2k * $ak * cu * cu * cu) AS phi
       |      FROM i1),
       |u1 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bk * sin(phi), $ak * cos(phi)) AS u FROM f1),
       |i2 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u1),
       |f2 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2k * $bk * su * su * su,
       |              pp - $e2k * $ak * cu * cu * cu) AS phi
       |      FROM i2),
       |u2 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bk * sin(phi), $ak * cos(phi)) AS u FROM f2),
       |i3 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u2),
       |f3 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2k * $bk * su * su * su,
       |              pp - $e2k * $ak * cu * cu * cu) AS phi
       |      FROM i3),
       |dk AS (SELECT *, degrees(lam) AS lonk, degrees(phi) AS latk,
       |        (floor(lon / 6.0))::INT + 1 AS n6 FROM f3),
       |tg AS (SELECT c_custkey, n6,
       |        radians(latk) AS phik, sin(radians(latk)) AS sphi,
       |        cos(radians(latk)) AS cphi, tan(radians(latk)) AS tphi,
       |        cos(radians(latk)) * (radians(lonk) - radians(6.0 * n6 - 3.0)) AS aa
       |      FROM dk),
       |th AS (SELECT *, $ak / sqrt(1.0 - $e2k * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2k * cphi * cphi AS cc, aa * aa AS a2 FROM tg),
       |ti AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM th),
       |tj AS (SELECT *, a3 * aa AS a4 FROM ti),
       |tk AS (SELECT *, a4 * aa AS a5 FROM tj),
       |tl AS (SELECT *, a5 * aa AS a6, ${arcK("phik")} AS mm FROM tk)
       |SELECT c_custkey, n6 + 28400 AS epsg,
       |  round(nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |    + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2k) * a5 / 120.0)
       |    + (n6 * 1000000.0 + 500000.0), 1) AS easting,
       |  round(mm + ntan * (a2 / 2.0
       |    + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |    + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2k) * a6 / 720.0), 1) AS northing,
       |  1 AS rt_ok
       |FROM tl ORDER BY c_custkey""".stripMargin
  }

  /** Three US State Plane zones replayed with the REGISTRY's constants:
    * the Snyder LCC-2SP series (spLccOracle's spelling) at California
    * zone 5 and Texas Central parameters, and the TM series
    * (spUtmOracle's spelling) at New Mexico East — including the
    * nonzero-lat₀ M₀ subtraction the NZTM block never exercises.
    */
  private val spStatePlaneOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    val ep2 = dlit((f * (2.0 - f)) / (1.0 - f * (2.0 - f)))
    def tOf(phi: String) =
      s"tan(pi() / 4.0 - ($phi) / 2.0) / pow((1.0 - e * sin($phi)) / (1.0 + e * sin($phi)), e / 2.0)"
    def mOf(phi: String) =
      s"cos($phi) / sqrt(1.0 - $e2 * sin($phi) * sin($phi))"
    def arcOf(phi: String) =
      s"6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * ($phi)" +
        s" - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * ($phi))" +
        s" + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * ($phi))" +
        s" - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * ($phi)))"
    // one LCC block per zone: (code, lat1, lat2, lat0, lon0, fe, fn);
    // toMeter divides the meter-valued coordinate before rounding (the
    // +units=us-ft surface — 1.0 for meter zones, x/1.0 is bit-exact)
    def lccBlock(tag: String, code: Int, lat1: String, lat2: String,
                 lat0: String, lon0: String, fe: String, fn: String,
                 where: String, toMeter: String = "1.0e0") =
      s"""${tag}b AS (SELECT c_custkey, lon, lat, sqrt($e2) AS e FROM b WHERE $where),
         |${tag}g AS (SELECT *,
         |        ${mOf(s"radians($lat1)")} AS m1, ${mOf(s"radians($lat2)")} AS m2,
         |        ${tOf(s"radians($lat1)")} AS t1, ${tOf(s"radians($lat2)")} AS t2,
         |        ${tOf(s"radians($lat0)")} AS t0,
         |        ${tOf("radians(lat)")} AS t
         |      FROM ${tag}b),
         |${tag}h AS (SELECT *, (ln(m1) - ln(m2)) / (ln(t1) - ln(t2)) AS n FROM ${tag}g),
         |${tag}i AS (SELECT *, m1 / (n * pow(t1, n)) AS ff FROM ${tag}h),
         |${tag}j AS (SELECT *,
         |        6378137.0 * ff * pow(t0, n) AS rho0,
         |        6378137.0 * ff * pow(t, n) AS rho,
         |        n * (radians(lon) - radians($lon0)) AS theta
         |      FROM ${tag}i),
         |$tag AS (SELECT c_custkey, $code AS epsg,
         |        round(($fe + rho * sin(theta)) / $toMeter, 1) AS easting,
         |        round(($fn + rho0 - rho * cos(theta)) / $toMeter, 1) AS northing FROM ${tag}j)""".stripMargin
    val ca = lccBlock("ca", 26945, dlit(35.46666666666667), dlit(34.03333333333333),
      dlit(33.5), dlit(-118.0), "2000000.0", "500000.0",
      "lon >= -130.0 AND lon < -107.5 AND lat >= 25.0 AND lat <= 50.0")
    val tx = lccBlock("tx", 32139, dlit(31.88333333333333), dlit(30.11666666666667),
      dlit(29.66666666666667), dlit(-100.3333333333333), "700000.0", "3000000.0",
      "lon >= -107.5 AND lon <= -93.0 AND NOT (lon >= -105.8 AND lon <= -102.9) " +
        "AND lat >= 25.0 AND lat <= 50.0")
    // ftUS twins (r11): registry meter-valued false origins, output
    // divided by the exact US survey foot — both engines compute the
    // factor as the same IEEE division
    val usFt = "(1200.0e0 / 3937.0e0)"
    val caf = lccBlock("caf", 2229, dlit(35.46666666666667), dlit(34.03333333333333),
      dlit(33.5), dlit(-118.0), "2000000.0001016e0", "500000.0001016002e0",
      "lon >= -130.0 AND lon < -107.5 AND lat >= 25.0 AND lat <= 50.0", usFt)
    val txf = lccBlock("txf", 2277, dlit(31.88333333333333), dlit(30.11666666666667),
      dlit(29.66666666666667), dlit(-100.3333333333333), "699999.9998983998e0", "3000000.0",
      "lon >= -107.5 AND lon <= -93.0 AND lat >= 25.0 AND lat <= 50.0", usFt)
    val nyf = lccBlock("nyf", 2263, dlit(41.03333333333333), dlit(40.66666666666666),
      dlit(40.16666666666666), dlit(-74.0), "300000.0000000001e0", "0.0",
      "lon >= -76.0 AND lon <= -72.0 AND lat >= 25.0 AND lat <= 50.0", usFt)
    // Maryland (r11): the meter zone and its ftUS twin, re-projecting
    // the NYLI stripe (no lattice points exist nearer the zone)
    val md = lccBlock("md", 26985, dlit(39.45), dlit(38.3),
      dlit(37.66666666666666), dlit(-77.0), "400000.0", "0.0",
      "lon >= -76.0 AND lon <= -72.0 AND lat >= 25.0 AND lat <= 50.0")
    val mdf = lccBlock("mdf", 2248, dlit(39.45), dlit(38.3),
      dlit(37.66666666666666), dlit(-77.0), "399999.9998983998e0", "0.0",
      "lon >= -76.0 AND lon <= -72.0 AND lat >= 25.0 AND lat <= 50.0", usFt)
    val k0 = dlit(0.9999090909090909)
    val nmLon0 = dlit(-104.33333333333333)
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |$ca,
       |$tx,
       |$caf,
       |$txf,
       |$nyf,
       |$md,
       |$mdf,
       |nmg AS (SELECT c_custkey, lon, lat,
       |        radians(lat) AS phi, sin(radians(lat)) AS sphi,
       |        cos(radians(lat)) AS cphi, tan(radians(lat)) AS tphi,
       |        cos(radians(lat)) * (radians(lon) - radians($nmLon0)) AS aa
       |      FROM b WHERE lon >= -105.8 AND lon <= -102.9 AND lat >= 25.0 AND lat <= 50.0),
       |nmh AS (SELECT *,
       |        6378137.0 / sqrt(1.0 - $e2 * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2 * cphi * cphi AS cc, aa * aa AS a2 FROM nmg),
       |nmi AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM nmh),
       |nmj AS (SELECT *, a3 * aa AS a4 FROM nmi),
       |nmk AS (SELECT *, a4 * aa AS a5 FROM nmj),
       |nml AS (SELECT *, a5 * aa AS a6,
       |        ${arcOf("phi")} AS mm,
       |        ${arcOf("radians(31.0)")} AS mm0
       |      FROM nmk),
       |nm AS (SELECT c_custkey, 32112 AS epsg,
       |        round($k0 * nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |          + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2) * a5 / 120.0) + 165000.0, 1) AS easting,
       |        round($k0 * (mm - mm0 + ntan * (a2 / 2.0
       |          + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |          + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2) * a6 / 720.0)) + 0.0, 1) AS northing
       |      FROM nml)
       |SELECT c_custkey, epsg, easting, northing, 1 AS rt_ok
       |FROM (SELECT * FROM ca UNION ALL SELECT * FROM tx UNION ALL SELECT * FROM nm
       |      UNION ALL SELECT * FROM caf UNION ALL SELECT * FROM txf
       |      UNION ALL SELECT * FROM nyf
       |      UNION ALL SELECT * FROM md UNION ALL SELECT * FROM mdf)
       |ORDER BY c_custkey, epsg""".stripMargin
  }

  /** spStatePlane27's replay: the spDatumOracle legacy chain (WGS84
    * geodetic → geocentric → inverse 3-param CONUS tie → Bowring ×3 on
    * Clarke 1866, op-for-op — see spDatumOracle's scaladoc for why each
    * seam is spelled the way it is) run ONCE over the union of stripes,
    * then four BY-CODE zone blocks — Snyder LCC-2SP (CA 5 / TX Central /
    * MA Mainland) and the 6th-order TM series (NM East) on clrk66 —
    * each divided by the exact US-survey-foot factor before the 0.1
    * rounding. False eastings are the registry's meter literals (the
    * IEEE-exact values of EPSG's round ftUS numbers), so a registry FE
    * typo hash-mismatches here.
    */
  private val spStatePlane27Oracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val fw = 1.0 / 298.257223563
    val e2w = dlit(fw * (2.0 - fw))
    val fcD = 1.0 - 6356583.8 / 6378206.4
    val ac = dlit(6378206.4)
    val e2cD = fcD * (2.0 - fcD)
    val e2c = dlit(e2cD)
    val ep2c = dlit(e2cD / (1.0 - e2cD))
    val bc = dlit(6378206.4 * (1.0 - fcD))
    val usFt = "(1200.0e0 / 3937.0e0)"
    def tOf(phi: String) =
      s"tan(pi() / 4.0 - ($phi) / 2.0) / pow((1.0 - e * sin($phi)) / (1.0 + e * sin($phi)), e / 2.0)"
    def mOf(phi: String) =
      s"cos($phi) / sqrt(1.0 - $e2c * sin($phi) * sin($phi))"
    def arc27Of(phi: String) =
      s"$ac * ((1.0 - $e2c / 4.0 - 3.0 * $e2c * $e2c / 64.0 - 5.0 * $e2c * $e2c * $e2c / 256.0) * ($phi)" +
        s" - (3.0 * $e2c / 8.0 + 3.0 * $e2c * $e2c / 32.0 + 45.0 * $e2c * $e2c * $e2c / 1024.0) * sin(2.0 * ($phi))" +
        s" + (15.0 * $e2c * $e2c / 256.0 + 45.0 * $e2c * $e2c * $e2c / 1024.0) * sin(4.0 * ($phi))" +
        s" - (35.0 * $e2c * $e2c * $e2c / 3072.0) * sin(6.0 * ($phi)))"
    def lccBlock(tag: String, code: Int, lat1: String, lat2: String,
                 lat0: String, lon0: String, feM: String, where: String) =
      s"""${tag}g AS (SELECT *,
         |        ${mOf(s"radians($lat1)")} AS m1, ${mOf(s"radians($lat2)")} AS m2,
         |        ${tOf(s"radians($lat1)")} AS t1, ${tOf(s"radians($lat2)")} AS t2,
         |        ${tOf(s"radians($lat0)")} AS t0,
         |        ${tOf("radians(lat27)")} AS t
         |      FROM d27 WHERE $where),
         |${tag}h AS (SELECT *, (ln(m1) - ln(m2)) / (ln(t1) - ln(t2)) AS n FROM ${tag}g),
         |${tag}i AS (SELECT *, m1 / (n * pow(t1, n)) AS ff FROM ${tag}h),
         |${tag}j AS (SELECT *,
         |        $ac * ff * pow(t0, n) AS rho0,
         |        $ac * ff * pow(t, n) AS rho,
         |        n * (radians(lon27) - radians($lon0)) AS theta
         |      FROM ${tag}i),
         |$tag AS (SELECT c_custkey, $code AS epsg,
         |        round(($feM + rho * sin(theta)) / $usFt, 1) AS easting,
         |        round((0.0 + rho0 - rho * cos(theta)) / $usFt, 1) AS northing FROM ${tag}j)""".stripMargin
    val ca = lccBlock("spca", 26745, dlit(35.46666666666667), dlit(34.03333333333333),
      dlit(33.5), dlit(-118.0), "609601.2192024384e0",
      "lon >= -130.0 AND lon < -107.5")
    val tx = lccBlock("sptx", 32039, dlit(30.11666666666667), dlit(31.88333333333333),
      dlit(29.66666666666667), dlit(-100.3333333333333), "609601.2192024384e0",
      "lon >= -107.5 AND lon <= -93.0")
    val ma = lccBlock("spma", 26786, dlit(41.71666666666667), dlit(42.68333333333333),
      dlit(41.0), dlit(-71.5), "182880.3657607315e0",
      "lon >= -76.0 AND lon <= -72.0")
    val k0nm = dlit(0.9999090909090909)
    val nmLon0 = dlit(-104.33333333333333)
    val nmLat0 = dlit(31.0)
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($latSql) >= 25.0 AND ($latSql) <= 50.0
       |             AND ((($lonSql) >= -130.0 AND ($lonSql) <= -93.0)
       |               OR (($lonSql) >= -76.0 AND ($lonSql) <= -72.0))),
       |c AS (SELECT *, sqrt($e2c) AS e FROM b),
       |w AS (SELECT *, sin(radians(lat)) AS sp,
       |        6378137.0 / sqrt(1.0 - $e2w * sin(radians(lat)) * sin(radians(lat))) AS nw
       |      FROM c),
       |g AS (SELECT *,
       |        nw * cos(radians(lat)) * cos(radians(lon)) AS gx,
       |        nw * cos(radians(lat)) * sin(radians(lon)) AS gy,
       |        nw * (1.0 - $e2w) * sp AS gz
       |      FROM w),
       |h AS (SELECT *,
       |        gx - (-8.0) AS hx, gy - 160.0 AS hy, gz - 176.0 AS hz
       |      FROM g),
       |p0 AS (SELECT *,
       |        atan2(hy, hx) AS lam,
       |        sqrt(hx * hx + hy * hy) AS pp
       |      FROM h),
       |u0 AS (SELECT *, atan2(hz * $ac, pp * $bc) AS u FROM p0),
       |i1 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u0),
       |f1 AS (SELECT *,
       |        atan2(hz + $ep2c * $bc * su * su * su,
       |              pp - $e2c * $ac * cu * cu * cu) AS phi
       |      FROM i1),
       |u1 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bc * sin(phi), $ac * cos(phi)) AS u FROM f1),
       |i2 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u1),
       |f2 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2c * $bc * su * su * su,
       |              pp - $e2c * $ac * cu * cu * cu) AS phi
       |      FROM i2),
       |u2 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bc * sin(phi), $ac * cos(phi)) AS u FROM f2),
       |i3 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u2),
       |f3 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2c * $bc * su * su * su,
       |              pp - $e2c * $ac * cu * cu * cu) AS phi
       |      FROM i3),
       |d27 AS (SELECT *, degrees(lam) AS lon27, degrees(phi) AS lat27 FROM f3),
       |$ca,
       |$tx,
       |$ma,
       |nmg AS (SELECT c_custkey,
       |        radians(lat27) AS phi27, sin(radians(lat27)) AS sphi,
       |        cos(radians(lat27)) AS cphi, tan(radians(lat27)) AS tphi,
       |        cos(radians(lat27)) * (radians(lon27) - radians($nmLon0)) AS aa
       |      FROM d27 WHERE lon >= -105.8 AND lon <= -102.9),
       |nmh AS (SELECT *,
       |        $ac / sqrt(1.0 - $e2c * sphi * sphi) AS nn,
       |        tphi * tphi AS tt, $ep2c * cphi * cphi AS cc, aa * aa AS a2 FROM nmg),
       |nmi AS (SELECT *, a2 * aa AS a3, nn * tphi AS ntan FROM nmh),
       |nmj AS (SELECT *, a3 * aa AS a4 FROM nmi),
       |nmk AS (SELECT *, a4 * aa AS a5 FROM nmj),
       |nml AS (SELECT *, a5 * aa AS a6,
       |        ${arc27Of("phi27")} AS mm,
       |        ${arc27Of(s"radians($nmLat0)")} AS mm0
       |      FROM nmk),
       |spnm AS (SELECT c_custkey, 32012 AS epsg,
       |        round(($k0nm * nn * (aa + (1.0 - tt + cc) * a3 / 6.0
       |          + (5.0 - 18.0 * tt + tt * tt + 72.0 * cc - 58.0 * $ep2c) * a5 / 120.0) + 152400.3048006096e0) / $usFt, 1) AS easting,
       |        round(($k0nm * (mm - mm0 + ntan * (a2 / 2.0
       |          + (5.0 - tt + 9.0 * cc + 4.0 * cc * cc) * a4 / 24.0
       |          + (61.0 - 58.0 * tt + tt * tt + 600.0 * cc - 330.0 * $ep2c) * a6 / 720.0)) + 0.0) / $usFt, 1) AS northing
       |      FROM nml)
       |SELECT c_custkey, epsg, easting, northing, 1 AS rt_ok
       |FROM (SELECT * FROM spca UNION ALL SELECT * FROM sptx
       |      UNION ALL SELECT * FROM spma UNION ALL SELECT * FROM spnm)
       |ORDER BY c_custkey, epsg""".stripMargin
  }

  /** The full legacy-datum chain as DuckDB SQL, mirroring
    * geom/Projections.DatumShifted.fromGeo op-for-op: WGS84 geodetic →
    * geocentric (ν, then the three products in Scala's order) → inverse
    * 3-param Helmert (translation subtraction — the rotation/scale
    * matrix is exactly identity for a 3-param tie, so the adjugate
    * inverse reduces to it bit-for-bit) → Bowring geodetic on Clarke
    * 1866 with the SAME fixed 3-iteration schedule (u₀ = atan2(z·a, p·b),
    * then φᵢ/uᵢ unrolled) → degrees→radians round-trip (Scala's
    * toDegrees∘toRadians seam, kept so both sides take the identical
    * 1-ulp wobble) → Snyder LCC-2SP forward on clrk66. All ellipsoid
    * constants are interpolated as shortest-roundtrip literals of the
    * exact Scala doubles (same IEEE expressions as Projections.Ellipsoid).
    */
  /** Snyder ch. 9 Hotine oblique Mercator forward as DuckDB SQL,
    * mirroring geom/Projections.Omerc.fromGeo: the row-independent CRS
    * constants (B, A′, E, γ0, λ0, u_c — pure functions of the fixed
    * grid parameters, re-derived here with the identical IEEE
    * expressions) ride as shortest-roundtrip literals; the per-row
    * chain (t, Q, S, T, V, U → v, u via atan2 → γ-rectification) is
    * spelled op-for-op. libm 1-ulp differences absorbed by the 0.1 m
    * rounding.
    */
  private val spOmercOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    // the OmercBorneo parameters, constants derived exactly as Omerc does
    val (lat0, lonC, alphaC, gammaC, k0) = (4.0, 115.0, 53.0, 53.0, 0.99984)
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val e2 = f * (2.0 - f)
    val e = math.sqrt(e2)
    val phi0 = math.toRadians(lat0)
    val sin0 = math.sin(phi0); val cos0 = math.cos(phi0)
    val bB = math.sqrt(1.0 + e2 * cos0 * cos0 * cos0 * cos0 / (1.0 - e2))
    val aP = a * bB * k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * sin0 * sin0)
    val t0 = math.tan(math.Pi / 4.0 - phi0 / 2.0) /
      math.pow((1.0 - e * sin0) / (1.0 + e * sin0), e / 2.0)
    val dD = bB * math.sqrt(1.0 - e2) / (cos0 * math.sqrt(1.0 - e2 * sin0 * sin0))
    val d2 = math.max(dD * dD, 1.0)
    val fF = dD + math.copySign(math.sqrt(d2 - 1.0), phi0)
    val eCst = fF * math.pow(t0, bB)
    val gG = (fF - 1.0 / fF) / 2.0
    val gamma0 = math.asin(math.sin(math.toRadians(alphaC)) / dD)
    val lam0 = math.toRadians(lonC) - math.asin(gG * math.tan(gamma0)) / bB
    val uC = math.copySign(aP / bB * math.atan2(math.sqrt(d2 - 1.0),
      math.cos(math.toRadians(alphaC))), phi0)
    val gc = math.toRadians(gammaC)
    val (bL, apL, eL, ecL) = (dlit(bB), dlit(aP), dlit(e), dlit(eCst))
    val (sg0, cg0) = (dlit(math.sin(gamma0)), dlit(math.cos(gamma0)))
    val (sgc, cgc) = (dlit(math.sin(gc)), dlit(math.cos(gc)))
    val (lam0L, ucL) = (dlit(lam0), dlit(uC))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= 85.0 AND ($lonSql) <= 145.0
       |             AND ($latSql) >= -20.0 AND ($latSql) <= 28.0),
       |g AS (SELECT c_custkey, lon, lat,
       |        radians(lat) AS phi,
       |        radians(lon) - $lam0L AS dlraw
       |      FROM b),
       |w AS (SELECT *, dlraw - 2.0 * pi() * floor((dlraw + pi()) / (2.0 * pi())) AS dlam FROM g),
       |h AS (SELECT *,
       |        tan(pi() / 4.0 - phi / 2.0)
       |          / pow((1.0 - $eL * sin(phi)) / (1.0 + $eL * sin(phi)), $eL / 2.0) AS t
       |      FROM w),
       |i AS (SELECT *, $ecL / pow(t, $bL) AS q FROM h),
       |j AS (SELECT *, (q - 1.0 / q) / 2.0 AS ss, (q + 1.0 / q) / 2.0 AS tt,
       |        sin($bL * dlam) AS vv FROM i),
       |k AS (SELECT *, (-vv * $cg0 + ss * $sg0) / tt AS uu FROM j),
       |l AS (SELECT *,
       |        $apL * ln((1.0 - uu) / (1.0 + uu)) / (2.0 * $bL) AS v,
       |        $apL * atan2(ss * $cg0 + vv * $sg0, cos($bL * dlam)) / $bL - $ucL AS u
       |      FROM k)
       |SELECT c_custkey,
       | round(v * $cgc + u * $sgc, 1) AS easting,
       | round(u * $cgc - v * $sgc, 1) AS northing,
       | 1 AS rt_ok
       |FROM l ORDER BY c_custkey""".stripMargin
  }

  /** The RD New chain as DuckDB SQL, mirroring DatumShifted.fromGeo with
    * the Sterea base op-for-op: WGS84 geodetic → geocentric → inverse
    * 7-PARAM Helmert (the full adjugate-inverse matrix — rotation and
    * scale are non-trivial here, unlike sp_datum's 3-param translation)
    * → Bowring on Bessel (fixed 3-iteration schedule) → degrees→radians
    * seam → conformal-sphere oblique stereographic forward. CRS-level
    * constants (matrix entries, R, n, c, χ0) are re-derived with the
    * identical IEEE expressions and ride as shortest-roundtrip literals.
    */
  private val spStereaOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    // WGS84 source side
    val fw = 1.0 / 298.257223563
    val e2w = dlit(fw * (2.0 - fw))
    // Bessel (target datum), same IEEE ops as Ellipsoid(a, f)
    val ab = 6377397.155
    val fb = 1.0 / 299.1528128
    val e2bD = fb * (2.0 - fb)
    val e2b = dlit(e2bD)
    val ep2b = dlit(e2bD / (1.0 - e2bD))
    val bbD = ab * (1.0 - fb)
    val abL = dlit(ab); val bbL = dlit(bbD)
    // 7-param Helmert (EPSG:28992 tie), inverse matrix exactly as
    // Projections.Helmert computes it
    val (dx, dy, dz) = (565.417, 50.3319, 465.552)
    val (rxS, ryS, rzS, dsP) = (-0.398957, 0.343988, -1.8774, 4.0725)
    val sH = 1.0 + dsP * 1e-6
    val rx = math.toRadians(rxS / 3600.0)
    val ry = math.toRadians(ryS / 3600.0)
    val rz = math.toRadians(rzS / 3600.0)
    val m11 = sH; val m12 = -sH * rz; val m13 = sH * ry
    val m21 = sH * rz; val m22 = sH; val m23 = -sH * rx
    val m31 = -sH * ry; val m32 = sH * rx; val m33 = sH
    val det = m11 * (m22 * m33 - m23 * m32) -
      m12 * (m21 * m33 - m23 * m31) + m13 * (m21 * m32 - m22 * m31)
    val i11 = dlit((m22 * m33 - m23 * m32) / det)
    val i12 = dlit((m13 * m32 - m12 * m33) / det)
    val i13 = dlit((m12 * m23 - m13 * m22) / det)
    val i21 = dlit((m23 * m31 - m21 * m33) / det)
    val i22 = dlit((m11 * m33 - m13 * m31) / det)
    val i23 = dlit((m13 * m21 - m11 * m23) / det)
    val i31 = dlit((m21 * m32 - m22 * m31) / det)
    val i32 = dlit((m12 * m31 - m11 * m32) / det)
    val i33 = dlit((m11 * m22 - m12 * m21) / det)
    // Sterea constants on Bessel, exactly as Projections.Sterea computes
    val e2 = e2bD
    val e = math.sqrt(e2)
    val phi0 = math.toRadians(52.15616055555555)
    val lam0 = math.toRadians(5.38763888888889)
    val s0 = math.sin(phi0); val c0 = math.cos(phi0)
    val bigR = ab * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
    val n = math.sqrt(1.0 + e2 * c0 * c0 * c0 * c0 / (1.0 - e2))
    val s1 = (1.0 + s0) / (1.0 - s0)
    val s2 = (1.0 - e * s0) / (1.0 + e * s0)
    val w1 = math.pow(s1 * math.pow(s2, e), n)
    val sinChi00 = (w1 - 1.0) / (w1 + 1.0)
    val cCst = (n + s0) * (1.0 - sinChi00) / ((n - s0) * (1.0 + sinChi00))
    val w2 = cCst * w1
    val chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    val c2rk = dlit(2.0 * bigR * 0.9999079)
    val (eL, nL, cL) = (dlit(e), dlit(n), dlit(cCst))
    val (schi0, cchi0) = (dlit(math.sin(chi0)), dlit(math.cos(chi0)))
    val lam0L = dlit(lam0)
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -30.0 AND ($lonSql) <= 36.0
       |             AND ($latSql) >= 20.0 AND ($latSql) <= 70.0),
       |w AS (SELECT *, sin(radians(lat)) AS spw,
       |        6378137.0 / sqrt(1.0 - $e2w * sin(radians(lat)) * sin(radians(lat))) AS nw
       |      FROM b),
       |g AS (SELECT *,
       |        nw * cos(radians(lat)) * cos(radians(lon)) AS gx,
       |        nw * cos(radians(lat)) * sin(radians(lon)) AS gy,
       |        nw * (1.0 - $e2w) * spw AS gz
       |      FROM w),
       |hm AS (SELECT *, gx - $dx AS ux, gy - $dy AS uy, gz - $dz AS uz FROM g),
       |h AS (SELECT *,
       |        $i11 * ux + $i12 * uy + $i13 * uz AS hx,
       |        $i21 * ux + $i22 * uy + $i23 * uz AS hy,
       |        $i31 * ux + $i32 * uy + $i33 * uz AS hz
       |      FROM hm),
       |p0 AS (SELECT *, atan2(hy, hx) AS lam, sqrt(hx * hx + hy * hy) AS pp FROM h),
       |u0 AS (SELECT *, atan2(hz * $abL, pp * $bbL) AS u FROM p0),
       |i1 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u0),
       |f1 AS (SELECT *,
       |        atan2(hz + $ep2b * $bbL * su * su * su,
       |              pp - $e2b * $abL * cu * cu * cu) AS phi
       |      FROM i1),
       |u1 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bbL * sin(phi), $abL * cos(phi)) AS u FROM f1),
       |i2 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u1),
       |f2 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2b * $bbL * su * su * su,
       |              pp - $e2b * $abL * cu * cu * cu) AS phi
       |      FROM i2),
       |u2 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bbL * sin(phi), $abL * cos(phi)) AS u FROM f2),
       |i3 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u2),
       |f3 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2b * $bbL * su * su * su,
       |              pp - $e2b * $abL * cu * cu * cu) AS phi
       |      FROM i3),
       |dB AS (SELECT *, degrees(lam) AS lonB, degrees(phi) AS latB FROM f3),
       |pr AS (SELECT *, sin(radians(latB)) AS sp FROM dB),
       |cw AS (SELECT *,
       |        $cL * pow((1.0 + sp) / (1.0 - sp) *
       |                  pow((1.0 - $eL * sp) / (1.0 + $eL * sp), $eL), $nL) AS ww
       |      FROM pr),
       |ch AS (SELECT *, asin((ww - 1.0) / (ww + 1.0)) AS chi,
       |        $nL * (radians(lonB) - $lam0L) + $lam0L AS lams
       |      FROM cw),
       |dl AS (SELECT *, lams - $lam0L AS dlam FROM ch),
       |bd AS (SELECT *,
       |        1.0 + sin(chi) * $schi0 + cos(chi) * $cchi0 * cos(dlam) AS bden
       |      FROM dl)
       |SELECT c_custkey,
       | round(155000.0 + $c2rk * cos(chi) * sin(dlam) / bden, 1) AS easting,
       | round(463000.0 + $c2rk * (sin(chi) * $cchi0 - cos(chi) * $schi0 * cos(dlam)) / bden, 1) AS northing,
       | 1 AS rt_ok
       |FROM bd ORDER BY c_custkey""".stripMargin
  }

  /** The S-JTSK chain as DuckDB SQL, mirroring DatumShifted.fromGeo with
    * the Krovak base op-for-op: WGS84 geodetic → geocentric → inverse
    * 3-param Helmert (translation subtraction) → Bowring on Bessel →
    * degrees→radians seam → Gaussian-sphere Krovak forward with the
    * negative East-North axis convention (E = −r sinθ, N = −r cosθ).
    */
  private val spKrovakOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val fw = 1.0 / 298.257223563
    val e2w = dlit(fw * (2.0 - fw))
    val ab = 6377397.155
    val fb = 1.0 / 299.1528128
    val e2bD = fb * (2.0 - fb)
    val e2b = dlit(e2bD)
    val ep2b = dlit(e2bD / (1.0 - e2bD))
    val bbD = ab * (1.0 - fb)
    val abL = dlit(ab); val bbL = dlit(bbD)
    // Krovak constants on Bessel, exactly as Projections.Krovak computes
    val e2 = e2bD
    val e = math.sqrt(e2)
    val phiC = math.toRadians(49.5)
    val lam0 = math.toRadians(24.833333333333332)
    val aC = math.toRadians(30.28813972222222)
    val phiP = math.toRadians(78.5)
    val sC = math.sin(phiC); val cC = math.cos(phiC)
    val bigA = ab * math.sqrt(1.0 - e2) / (1.0 - e2 * sC * sC)
    val bigB = math.sqrt(1.0 + e2 * cC * cC * cC * cC / (1.0 - e2))
    val gamma0 = math.asin(sC / bigB)
    val t0 = math.tan(math.Pi / 4.0 + gamma0 / 2.0) *
      math.pow((1.0 + e * sC) / (1.0 - e * sC), e * bigB / 2.0) /
      math.pow(math.tan(math.Pi / 4.0 + phiC / 2.0), bigB)
    val nK = math.sin(phiP)
    val r0 = 0.9999 * bigA / math.tan(phiP)
    val tanPhalf = math.tan(phiP / 2.0 + math.Pi / 4.0)
    val tanP = math.pow(tanPhalf, nK)
    val (eL, bL, t0L, nKL) = (dlit(e), dlit(bigB), dlit(t0), dlit(nK))
    val eB2 = dlit(e * bigB / 2.0)
    val (cAL, sAL) = (dlit(math.cos(aC)), dlit(math.sin(aC)))
    val (r0L, tanPL, lam0L) = (dlit(r0), dlit(tanP), dlit(lam0))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -30.0 AND ($lonSql) <= 36.0
       |             AND ($latSql) >= 20.0 AND ($latSql) <= 70.0),
       |w AS (SELECT *, sin(radians(lat)) AS spw,
       |        6378137.0 / sqrt(1.0 - $e2w * sin(radians(lat)) * sin(radians(lat))) AS nw
       |      FROM b),
       |g AS (SELECT *,
       |        nw * cos(radians(lat)) * cos(radians(lon)) AS gx,
       |        nw * cos(radians(lat)) * sin(radians(lon)) AS gy,
       |        nw * (1.0 - $e2w) * spw AS gz
       |      FROM w),
       |h AS (SELECT *, gx - 589.0 AS hx, gy - 76.0 AS hy, gz - 480.0 AS hz FROM g),
       |p0 AS (SELECT *, atan2(hy, hx) AS lam, sqrt(hx * hx + hy * hy) AS pp FROM h),
       |u0 AS (SELECT *, atan2(hz * $abL, pp * $bbL) AS u FROM p0),
       |i1 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u0),
       |f1 AS (SELECT *,
       |        atan2(hz + $ep2b * $bbL * su * su * su,
       |              pp - $e2b * $abL * cu * cu * cu) AS phi
       |      FROM i1),
       |u1 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bbL * sin(phi), $abL * cos(phi)) AS u FROM f1),
       |i2 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u1),
       |f2 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2b * $bbL * su * su * su,
       |              pp - $e2b * $abL * cu * cu * cu) AS phi
       |      FROM i2),
       |u2 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bbL * sin(phi), $abL * cos(phi)) AS u FROM f2),
       |i3 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u2),
       |f3 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2b * $bbL * su * su * su,
       |              pp - $e2b * $abL * cu * cu * cu) AS phi
       |      FROM i3),
       |dB AS (SELECT *, degrees(lam) AS lonB, degrees(phi) AS latB FROM f3),
       |pr AS (SELECT *, radians(latB) AS phiB, sin(radians(latB)) AS sp FROM dB),
       |uu AS (SELECT *,
       |        2.0 * (atan($t0L * pow(tan(phiB / 2.0 + pi() / 4.0), $bL) /
       |                    pow((1.0 + $eL * sp) / (1.0 - $eL * sp), $eB2)) - pi() / 4.0) AS gu,
       |        $bL * ($lam0L - radians(lonB)) AS gv
       |      FROM pr),
       |tt AS (SELECT *,
       |        asin($cAL * sin(gu) + $sAL * cos(gu) * cos(gv)) AS gt
       |      FROM uu),
       |dd AS (SELECT *, atan2(cos(gu) * sin(gv),
       |                       $cAL * cos(gu) * cos(gv) - $sAL * sin(gu)) AS gd FROM tt),
       |rr AS (SELECT *,
       |        $nKL * gd AS theta,
       |        $r0L * $tanPL / pow(tan(gt / 2.0 + pi() / 4.0), $nKL) AS r
       |      FROM dd)
       |SELECT c_custkey,
       | round(-(r * sin(theta)) + 0.0, 1) AS easting,
       | round(-(r * cos(theta)) + 0.0, 1) AS northing,
       | 1 AS rt_ok
       |FROM rr ORDER BY c_custkey""".stripMargin
  }

  /** Snyder ellipsoidal sinusoidal forward as DuckDB SQL, mirroring
    * geom/Projections.Sinusoidal.fromGeo op-for-op: x = a·λ·cosφ/√(1−e²sin²φ)
    * (30-8, λ0 = 0 so the λ−λ0 subtraction is exact), y = the identical
    * 3-21 meridian-arc series the UTM oracle proves out. libm 1-ulp
    * sin/cos differences are absorbed by the 0.1 m rounding.
    */
  private val spSinuOracle: String = {
    val f = 1.0 / 298.257223563
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val e2 = dlit(f * (2.0 - f))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |g AS (SELECT c_custkey, lon, lat,
       |        radians(lat) AS phi,
       |        sin(radians(lat)) AS sphi
       |      FROM b)
       |SELECT c_custkey,
       | round(6378137.0 * radians(lon) * cos(phi) / sqrt(1.0 - $e2 * sphi * sphi), 1) AS easting,
       | round(6378137.0 * ((1.0 - $e2 / 4.0 - 3.0 * $e2 * $e2 / 64.0 - 5.0 * $e2 * $e2 * $e2 / 256.0) * phi
       |   - (3.0 * $e2 / 8.0 + 3.0 * $e2 * $e2 / 32.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(2.0 * phi)
       |   + (15.0 * $e2 * $e2 / 256.0 + 45.0 * $e2 * $e2 * $e2 / 1024.0) * sin(4.0 * phi)
       |   - (35.0 * $e2 * $e2 * $e2 / 3072.0) * sin(6.0 * phi)), 1) AS northing,
       | 1 AS rt_ok
       |FROM g ORDER BY c_custkey""".stripMargin
  }

  /** Mollweide forward as DuckDB SQL, mirroring
    * geom/Projections.Mollweide.fromGeo: the FIXED 8-step Newton schedule
    * for 2θ + sin 2θ = π sin φ unrolled as eight chained CTEs with the
    * identical update expression, then x = (2√2R/π)·λ·cosθ,
    * y = √2R·sinθ (31-1/31-2), both with the implementation's constant
    * grouping so the float sequences match to libm's 1 ulp.
    */
  private val spMollOracle: String = {
    // chained CTEs, each adding the next Newton iterate t1..t8
    val steps = (1 to 8).map { i =>
      val (p, t) = (s"t${i - 1}", s"t$i")
      s"s$i AS (SELECT *, $p - (2.0 * $p + sin(2.0 * $p) - c) / (2.0 + 2.0 * cos(2.0 * $p)) AS $t FROM s${i - 1})"
    }.mkString(",\n|")
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE abs($latSql) <= 80.0),
       |s0 AS (SELECT c_custkey, lon, lat,
       |        radians(lat) AS t0,
       |        pi() * sin(radians(lat)) AS c
       |      FROM b),
       |$steps
       |SELECT c_custkey,
       | round((sqrt(8.0) / pi() * 6378137.0) * radians(lon) * cos(t8), 1) AS easting,
       | round((sqrt(2.0) * 6378137.0) * sin(t8), 1) AS northing,
       | 1 AS rt_ok
       |FROM s8 ORDER BY c_custkey""".stripMargin
  }

  /** Ellipsoidal Mercator forward as DuckDB SQL, mirroring
    * geom/Projections.Mercator.fromGeo for EPSG:3395 — k₀ = 1 exactly
    * (lat_ts = 0, k = 1), so the a·k₀ products drop out and the forward
    * is x = a·radians(lon), y = a·(ln tan(π/4+φ/2) +
    * (e/2)·ln((1−e sinφ)/(1+e sinφ))), with the implementation's
    * constant grouping.
    */
  private val spMercOracle: String = {
    val f = 1.0 / 298.257223563
    val e = math.sqrt(f * (2.0 - f))
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val el = dlit(e)
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |g AS (SELECT c_custkey, lon,
       |        radians(lat) AS phi,
       |        sin(radians(lat)) AS sphi
       |      FROM b)
       |SELECT c_custkey,
       | round(6378137.0 * radians(lon), 1) AS easting,
       | round(6378137.0 * (ln(tan(pi() / 4.0 + phi / 2.0)) + ($el / 2.0) * ln((1.0 - $el * sphi) / (1.0 + $el * sphi))), 1) AS northing,
       | 1 AS rt_ok
       |FROM g ORDER BY c_custkey""".stripMargin
  }

  /** Cylindrical equal-area forward as DuckDB SQL, mirroring
    * geom/Projections.Cea.fromGeo for EPSG:6933: the authalic
    * q(φ) (Snyder 3-12) replayed op-for-op, k₀ = cos 30°/√(1−e²sin²30°)
    * embedded as the exact double the implementation computes, then
    * x = a·k₀·λ, y = a·q/(2k₀).
    */
  private val spCeaOracle: String = {
    val f = 1.0 / 298.257223563
    val e2 = f * (2.0 - f)
    val e = math.sqrt(e2)
    val phiTs = math.toRadians(30.0)
    val sTs = math.sin(phiTs)
    val k0 = math.cos(phiTs) / math.sqrt(1.0 - e2 * sTs * sTs)
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val (e2l, el, k0l) = (dlit(e2), dlit(e), dlit(k0))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |g AS (SELECT c_custkey, lon, sin(radians(lat)) AS sphi FROM b),
       |q AS (SELECT c_custkey, lon,
       |        (1.0 - $e2l) * (sphi / (1.0 - $e2l * sphi * sphi) - (1.0 / (2.0 * $el)) * ln((1.0 - $el * sphi) / (1.0 + $el * sphi))) AS qphi
       |      FROM g)
       |SELECT c_custkey,
       | round(6378137.0 * $k0l * radians(lon), 1) AS easting,
       | round(6378137.0 * qphi / (2.0 * $k0l), 1) AS northing,
       | 1 AS rt_ok
       |FROM q ORDER BY c_custkey""".stripMargin
  }

  /** Spherical azimuthal-equidistant forward as DuckDB SQL, mirroring
    * geom/Projections.AeqdSphere.fromGeo op-for-op: the wrapped Δλ, the
    * clamped-acos central angle, the c/sin c scale with its 1e-12
    * small-angle guard, then x/y from 22-4/22-5 — sin/cos of the center
    * embedded as the exact doubles the constructor computes.
    */
  private val spAeqdOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val s1 = dlit(math.sin(math.toRadians(40.0)))
    val c1 = dlit(math.cos(math.toRadians(40.0)))
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |g AS (SELECT c_custkey, radians(lat) AS phi,
       |        radians(lon) - radians(-100.0) AS dl0 FROM b),
       |w AS (SELECT c_custkey, phi,
       |        CASE WHEN dl0 > pi() THEN dl0 - 2.0 * pi()
       |             WHEN dl0 < -pi() THEN dl0 + 2.0 * pi() ELSE dl0 END AS dl
       |      FROM g),
       |t AS (SELECT *, acos(greatest(-1.0, least(1.0,
       |        $s1 * sin(phi) + $c1 * cos(phi) * cos(dl)))) AS c FROM w),
       |k AS (SELECT *, CASE WHEN c < 1e-12 THEN 1.0 ELSE c / sin(c) END AS kk FROM t)
       |SELECT c_custkey,
       | round(6371008.8e0 * kk * cos(phi) * sin(dl), 1) AS easting,
       | round(6371008.8e0 * kk * ($c1 * sin(phi) - $s1 * cos(phi) * cos(dl)), 1) AS northing,
       | 1 AS rt_ok
       |FROM k ORDER BY c_custkey""".stripMargin
  }

  /** Robinson forward as DuckDB SQL, mirroring
    * geom/Projections.Robinson.fromGeo: the 19-knot defining table with
    * its precomputed Hermite slopes (5·central-difference, the exact
    * doubles RobinsonTable.slope produces) carried as a VALUES list,
    * bucket-joined on floor(|φ|/5), then the identical cubic basis
    * expression and the Fxc/Fyc world-frame scaling.
    */
  private val spRobinsonOracle: String = {
    import graft.geom.Projections.RobinsonTable._
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    def m(t: Array[Double], j: Int): String = dlit(5.0 * slope(t, j))
    val rows = (0 until 18).map { i =>
      s"(${i}, ${dlit(X(i))}, ${dlit(X(i + 1))}, ${m(X, i)}, ${m(X, i + 1)}, " +
        s"${dlit(Y(i))}, ${dlit(Y(i + 1))}, ${m(Y, i)}, ${m(Y, i + 1)})"
    }.mkString(",\n|      ")
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
       |kt(i, x0, x1, mx0, mx1, y0, y1, my0, my1) AS (VALUES
       |      $rows),
       |g AS (SELECT c_custkey, lon, lat, abs(lat) AS ad,
       |        least(cast(floor(abs(lat) / 5.0) AS INTEGER), 17) AS bi FROM b),
       |j AS (SELECT g.*, x0, x1, mx0, mx1, y0, y1, my0, my1,
       |        (ad - 5.0 * bi) / 5.0 AS u FROM g JOIN kt ON g.bi = kt.i),
       |p AS (SELECT *, u * u AS u2, u * u * u AS u3 FROM j)
       |SELECT c_custkey,
       | round(0.8487e0 * 6378137.0 * ((2.0 * u3 - 3.0 * u2 + 1.0) * x0 + (u3 - 2.0 * u2 + u) * mx0 + (-2.0 * u3 + 3.0 * u2) * x1 + (u3 - u2) * mx1) * radians(lon), 1) AS easting,
       | round(1.3523e0 * 6378137.0 * ((2.0 * u3 - 3.0 * u2 + 1.0) * y0 + (u3 - 2.0 * u2 + u) * my0 + (-2.0 * u3 + 3.0 * u2) * y1 + (u3 - u2) * my1) * sign(lat), 1) AS northing,
       | 1 AS rt_ok
       |FROM p ORDER BY c_custkey""".stripMargin
  }

  /** Geostationary scan-angle forward as DuckDB SQL, mirroring
    * geom/Projections.Geos.fromGeo for the Meteosat grid (+sweep=y,
    * lon_0 = 0 so Δλ never wraps inside the ±55° window): geocentric
    * latitude, the a-normalized geocentric ellipsoid radius, the
    * satellite→point components and both view angles — constants
    * embedded as the exact doubles the constructor computes (hypot
    * replayed as √(a²+b²); the ≤1-ulp difference is absorbed by the
    * 0.1 m rounding).
    */
  private val spGeosOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    val f = 1.0 / 298.257223563
    val e2 = f * (2.0 - f)
    val p = dlit(math.sqrt(1.0 - e2))  // radius_p
    val p2 = dlit(1.0 - e2)            // radius_p2
    val g = dlit(1.0 + 35785831.0 / 6378137.0) // radius_g
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE abs($lonSql) <= 55.0 AND abs($latSql) <= 55.0),
       |g0 AS (SELECT c_custkey, radians(lon) AS lam,
       |        atan($p2 * tan(radians(lat))) AS phic FROM b),
       |r AS (SELECT *, $p / sqrt(($p * cos(phic)) * ($p * cos(phic)) + sin(phic) * sin(phic)) AS rr FROM g0),
       |v AS (SELECT c_custkey,
       |        rr * cos(lam) * cos(phic) AS vx,
       |        rr * sin(lam) * cos(phic) AS vy,
       |        rr * sin(phic) AS vz FROM r),
       |t AS (SELECT *, $g - vx AS tmp FROM v)
       |SELECT c_custkey,
       | round(35785831.0 * atan(vy / tmp), 1) AS easting,
       | round(35785831.0 * atan(vz / sqrt(vy * vy + tmp * tmp)), 1) AS northing,
       | 1 AS rt_ok
       |FROM t ORDER BY c_custkey""".stripMargin
  }

  private val spDatumOracle: String = {
    def dlit(x: Double): String = if (x.toString.exists(c => c == 'E' || c == 'e')) x.toString else x.toString + "e0"
    // WGS84 (source geodetic side)
    val fw = 1.0 / 298.257223563
    val e2w = dlit(fw * (2.0 - fw))
    // Clarke 1866 (target datum), the same IEEE ops as Ellipsoid(a, f)
    val fcD = 1.0 - 6356583.8 / 6378206.4
    val ac = dlit(6378206.4)
    val e2cD = fcD * (2.0 - fcD)
    val e2c = dlit(e2cD)
    val ep2c = dlit(e2cD / (1.0 - e2cD))
    val bc = dlit(6378206.4 * (1.0 - fcD))
    def tOf(phi: String) =
      s"tan(pi() / 4.0 - ($phi) / 2.0) / pow((1.0 - e * sin($phi)) / (1.0 + e * sin($phi)), e / 2.0)"
    def mOf(phi: String) =
      s"cos($phi) / sqrt(1.0 - $e2c * sin($phi) * sin($phi))"
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -125.0 AND ($lonSql) <= -67.0
       |             AND ($latSql) >= 25.0 AND ($latSql) <= 49.0),
       |c AS (SELECT *, sqrt($e2c) AS e FROM b),
       |w AS (SELECT *, sin(radians(lat)) AS sp,
       |        6378137.0 / sqrt(1.0 - $e2w * sin(radians(lat)) * sin(radians(lat))) AS nw
       |      FROM c),
       |g AS (SELECT *,
       |        nw * cos(radians(lat)) * cos(radians(lon)) AS gx,
       |        nw * cos(radians(lat)) * sin(radians(lon)) AS gy,
       |        nw * (1.0 - $e2w) * sp AS gz
       |      FROM w),
       |h AS (SELECT *,
       |        gx - (-8.0) AS hx, gy - 160.0 AS hy, gz - 176.0 AS hz
       |      FROM g),
       |p0 AS (SELECT *,
       |        atan2(hy, hx) AS lam,
       |        sqrt(hx * hx + hy * hy) AS pp
       |      FROM h),
       |u0 AS (SELECT *, atan2(hz * $ac, pp * $bc) AS u FROM p0),
       |i1 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u0),
       |f1 AS (SELECT *,
       |        atan2(hz + $ep2c * $bc * su * su * su,
       |              pp - $e2c * $ac * cu * cu * cu) AS phi
       |      FROM i1),
       |u1 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bc * sin(phi), $ac * cos(phi)) AS u FROM f1),
       |i2 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u1),
       |f2 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2c * $bc * su * su * su,
       |              pp - $e2c * $ac * cu * cu * cu) AS phi
       |      FROM i2),
       |u2 AS (SELECT * EXCLUDE (u, su, cu),
       |        atan2($bc * sin(phi), $ac * cos(phi)) AS u FROM f2),
       |i3 AS (SELECT *, sin(u) AS su, cos(u) AS cu FROM u2),
       |f3 AS (SELECT * EXCLUDE (phi),
       |        atan2(hz + $ep2c * $bc * su * su * su,
       |              pp - $e2c * $ac * cu * cu * cu) AS phi
       |      FROM i3),
       |d27 AS (SELECT *, degrees(lam) AS lon27, degrees(phi) AS lat27 FROM f3),
       |lc AS (SELECT *,
       |        ${mOf("radians(33.0)")} AS m1, ${mOf("radians(45.0)")} AS m2,
       |        ${tOf("radians(33.0)")} AS t1, ${tOf("radians(45.0)")} AS t2,
       |        ${tOf("radians(23.0)")} AS t0,
       |        ${tOf("radians(lat27)")} AS t
       |      FROM d27),
       |ln_ AS (SELECT *, (ln(m1) - ln(m2)) / (ln(t1) - ln(t2)) AS n FROM lc),
       |ff AS (SELECT *, m1 / (n * pow(t1, n)) AS bigf FROM ln_),
       |rr AS (SELECT *,
       |        $ac * bigf * pow(t0, n) AS rho0,
       |        $ac * bigf * pow(t, n) AS rho,
       |        n * (radians(lon27) - radians(-96.0)) AS theta
       |      FROM ff)
       |SELECT c_custkey,
       | round(0.0 + rho * sin(theta), 1) AS easting,
       | round(0.0 + rho0 - rho * cos(theta), 1) AS northing,
       | 1 AS rt_ok
       |FROM rr ORDER BY c_custkey""".stripMargin
  }

  /** The sp_nadgrids forward replayed op-for-op: positive-west seconds,
    * fractional cell coordinates with the identical floor/clamp, the
    * four bilinear terms in the implementation's association order, and
    * the +lat / −lon(east) application. Every node value is an exact
    * float32 (integer/1024) so the double formulas below equal the
    * promoted floats the Scala side multiplies — the whole chain is
    * exact IEEE +,−,×,÷ and floor, hence bit-identical, no rounding
    * gate needed.
    */
  private val spNadgridsOracle: String = {
    def nLat(i: String, j: String) =
      s"((1024.0 + 8.0 * ($i) + 4.0 * ($j) + ($i) * ($j)) / 1024.0)"
    def nLon(i: String, j: String) =
      s"((2048.0 + 4.0 * ($i) + 8.0 * ($j) + ($i) * ($j)) / 1024.0)"
    def bil(f: (String, String) => String) =
      s"""${f("i0", "j0")} * (1.0 - u) * (1.0 - v)
         |      + ${f("i0", "j0 + 1")} * u * (1.0 - v)
         |      + ${f("i0 + 1", "j0")} * (1.0 - u) * v
         |      + ${f("i0 + 1", "j0 + 1")} * u * v""".stripMargin
    s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
       |           WHERE ($lonSql) >= -124.0 AND ($lonSql) <= -68.0
       |             AND ($latSql) >= 26.0 AND ($latSql) <= 48.0),
       |c AS (SELECT *,
       |        ((-lon * 3600.0) - 241200.0) / 3600.0 AS x,
       |        ((lat * 3600.0) - 90000.0) / 3600.0 AS y
       |      FROM b),
       |d AS (SELECT *,
       |        least(greatest(floor(x)::BIGINT, 0), 57) AS j0,
       |        least(greatest(floor(y)::BIGINT, 0), 23) AS i0
       |      FROM c),
       |e AS (SELECT *, x - j0 AS u, y - i0 AS v FROM d),
       |f AS (SELECT *,
       |        ${bil(nLat)} AS blat,
       |        ${bil(nLon)} AS blon
       |      FROM e)
       |SELECT c_custkey,
       | lon + ((-blon) / 3600.0) AS lon83,
       | lat + (blat / 3600.0) AS lat83,
       | 1 AS rt_ok
       |FROM f ORDER BY c_custkey""".stripMargin
  }

  private val xyRoundtripOracle =
    s"""SELECT c_custkey,
       | round($lonSql, 6) AS x,
       | round($latSql, 6) AS y
       |FROM customer ORDER BY c_custkey""".stripMargin

  val oracles: Map[String, String] = Map(
    "sp_knn_join" ->
      s"""WITH pts AS (SELECT c_custkey AS id, $lonSql AS x, $latSql AS y FROM customer),
         |q AS (SELECT * FROM pts WHERE id <= 20),
         |d AS (SELECT q.id AS qid, p.id AS id,
         |        sqrt((q.x - p.x) * (q.x - p.x) + (q.y - p.y) * (q.y - p.y)) AS dist
         |      FROM q CROSS JOIN pts p),
         |r AS (SELECT qid, id, dist,
         |        row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS rank
         |      FROM d WHERE dist <= 15.0)
         |SELECT qid, rank::INT AS rank, id, round(dist, 6) AS dist
         |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    "sp_z2_partition" ->
      s"""WITH base AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
         |scaled AS (
         |  SELECT c_custkey,
         |    greatest(0, least(1073741823, floor((lon + 180.0) / 360.0 * 1073741824.0)))::BIGINT AS ix,
         |    greatest(0, least(1073741823, floor((lat + 90.0) / 180.0 * 1073741824.0)))::BIGINT AS iy
         |  FROM base)
         |SELECT c_custkey,
         |  (${z2InterleaveSql("(ix >> 22)", "(iy >> 22)", 8)}) AS cell8,
         |  (${z2InterleaveSql("ix", "iy", 30)}) AS "min",
         |  (${z2InterleaveSql("ix", "iy", 30)}) AS "max"
         |FROM scaled ORDER BY c_custkey""".stripMargin,
    // slippy tiling mirrored op-for-op: lat clamp, radians, the
    // log(tan+1/cos) term, trunc-toward-zero, [0, n-1] clamp, then the
    // same even/odd Morton interleave as sp_z2_partition, >> bits
    "sp_partition" ->
      s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
         |c AS (SELECT c_custkey, lon,
         |        radians(greatest(-85.05112877980659, least(85.05112877980659, lat))) AS phi
         |      FROM b),
         |t AS (SELECT c_custkey,
         |        greatest(0, least(63, trunc((lon + 180.0) / 360.0 * 64)::BIGINT)) AS xt,
         |        greatest(0, least(63, trunc((1.0 - ln(tan(phi) + 1.0 / cos(phi)) / pi()) / 2.0 * 64)::BIGINT)) AS yt
         |      FROM c)
         |SELECT c_custkey,
         | ((${z2InterleaveSql("xt", "yt", 6)}) >> 8) AS pk6,
         | ((${z2InterleaveSql("xt", "yt", 6)}) >> 4) AS pk6b4
         |FROM t ORDER BY c_custkey""".stripMargin,
    "sp_hull_aggr" ->
      s"""SELECT c_custkey % 10 AS grp,
         | round(min(lon), 6) AS xmin, round(min(lat), 6) AS ymin,
         | round(max(lon), 6) AS xmax, round(max(lat), 6) AS ymax
         |FROM (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer)
         |GROUP BY 1 ORDER BY grp""".stripMargin,
    "sp_construct" ->
      s"""SELECT c_custkey,
         | round($lonSql, 6) AS x,
         | round($latSql, 6) AS y,
         | round($lonSql + 1.5, 6) AS tx,
         | 3 AS np, 1 AS ng
         |FROM customer ORDER BY c_custkey""".stripMargin,
    "sp_measure" ->
      s"""WITH b AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat, $wSql AS w, $hSql AS h
         |  FROM customer)
         |SELECT c_custkey,
         | round(((lon + w) - lon) * ((lat + h) - lat), 6) AS area,
         | round(2 * ((lon + w) - lon) + 2 * ((lat + h) - lat), 6) AS perim,
         | round(lon + w / 2, 6) AS cx,
         | round(((lon + w) - lon) * ((lat + h) - lat), 6) AS env_area
         |FROM b ORDER BY c_custkey""".stripMargin,
    "sp_bbox_filter" ->
      s"""SELECT c_custkey FROM customer
         |WHERE ($lonSql) BETWEEN -50 AND 50 AND ($latSql) BETWEEN -40 AND 40
         |ORDER BY c_custkey""".stripMargin,
    "sp_distance_knn" ->
      s"""SELECT c_custkey,
         | round(sqrt(($lonSql - 10.0) * ($lonSql - 10.0) +
         |            ($latSql - 20.0) * ($latSql - 20.0)), 6) AS dist
         |FROM customer ORDER BY dist, c_custkey LIMIT 50""".stripMargin,
    "sp_distance_sphere" ->
      s"""WITH p AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer
         |  WHERE c_custkey <= 300)
         |SELECT c_custkey,
         | round(2.0 * 6371008.8 * asin(least(1.0, sqrt(
         |   sin(radians(0.05 - lat) / 2) * sin(radians(0.05 - lat) / 2) +
         |   cos(radians(lat)) * cos(radians(0.05)) *
         |   sin(radians(0.05 - lon) / 2) * sin(radians(0.05 - lon) / 2)))), 1) AS dist_m
         |FROM p ORDER BY c_custkey""".stripMargin,
    "sp_wkt_roundtrip" -> xyRoundtripOracle,
    "sp_wkb_roundtrip" -> xyRoundtripOracle,
    "sp_geojson_roundtrip" -> xyRoundtripOracle,
    "sp_geohash" ->
      """SELECT c_custkey, 1 AS cell_contains, 8 AS hash_len
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sp_contains" ->
      """SELECT c_custkey, 1 AS has_inner, 0 AS has_corner, 1 AS inner_within
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // Predicate outcomes are per-row constants by construction (the box
    // configurations have fixed topology for every w>0, h>0); relate
    // matrix strings verified against JTS semantics.
    "sp_predicates" ->
      """SELECT c_custkey,
        | 1 AS covers_corner, 0 AS covers_b, 1 AS equals_env, 0 AS equals_b,
        | 1 AS overlaps_b, 0 AS overlaps_c, 1 AS touches_c, 0 AS touches_b,
        | 1 AS disjoint_d, 0 AS disjoint_b, 1 AS crosses_l, 0 AS crosses_d,
        | '212111212' AS rel_overlap, 'FF2F11212' AS rel_touch,
        | 'FF2FF1212' AS rel_disjoint, 1 AS touch_pattern
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "sp_accessors" ->
      s"""WITH b AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat, $wSql AS w, $hSql AS h
         |  FROM customer)
         |SELECT c_custkey,
         | round(2 * ((lon + w) - lon) + 2 * ((lat + h) - lat), 6) AS bnd_len,
         | 2 AS dim_box, 0 AS dim_pt, 1 AS dim_line, 2 AS coord_dim, 5 AS np_ring,
         | round(lon + w, 6) AS p3x, round(lat + h, 6) AS p3y,
         | round(lon, 6) AS gn_x, 0 AS has_iring,
         | 1 AS is_valid, 1 AS is_simple, 0 AS is_empty,
         | 1 AS ring_closed, 1 AS ring_is_ring, 0 AS is_coll, 1 AS is_geomfield,
         | round(lon, 6) AS cast_pt_x, 5 AS cast_poly_np,
         | round(lon, 6) AS mpm_x, 5 AS ba_len
         |FROM b ORDER BY c_custkey""".stripMargin,
    "sp_process" ->
      s"""WITH b AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat, $wSql AS w, $hSql AS h
         |  FROM customer)
         |SELECT c_custkey,
         | 5 AS simp_np, 2 AS simp_line_np, 5 AS topo_np,
         | round(lon, 6) AS cp1x, round(lat, 6) AS cp1y,
         | round(lon + w / 2, 6) AS cp2x,
         | round(((lon + w) - lon) * ((lat + h) - lat), 6) AS hull_area,
         | 0.5 AS tri_area, 4 AS tri_np,
         | round(2.0 * 6371008.8 * asin(least(1.0, sqrt(
         |   sin(radians(lat - lat) / 2) * sin(radians(lat - lat) / 2) +
         |   cos(radians(lat)) * cos(radians(lat)) *
         |   sin(radians((lon + 1.0) - lon) / 2) * sin(radians((lon + 1.0) - lon) / 2)))), 1) AS lsph,
         | round(((179.5 + w + 1.0) - 179.5) * ((lat + h) - lat), 6) AS ams_area,
         | 2 AS ams_ng
         |FROM b ORDER BY c_custkey""".stripMargin,
    // tw_len_m = tw_len + 3: the XYM variant adds the dimensions byte and
    // a 2-byte m varint (m = round(7.0 * 10^2) = 700, zigzag 1400 < 2^14)
    "sp_twkb" ->
      s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
         |v AS (SELECT c_custkey,
         |        round(lon * 100)::BIGINT AS vx, round(lat * 100)::BIGINT AS vy
         |      FROM b),
         |z AS (SELECT c_custkey, vx, vy,
         |        CASE WHEN vx >= 0 THEN 2 * vx ELSE -2 * vx - 1 END AS zx,
         |        CASE WHEN vy >= 0 THEN 2 * vy ELSE -2 * vy - 1 END AS zy
         |      FROM v),
         |l AS (SELECT c_custkey, vx, vy,
         |        (2 + CASE WHEN zx < 128 THEN 1 WHEN zx < 16384 THEN 2 ELSE 3 END
         |           + CASE WHEN zy < 128 THEN 1 WHEN zy < 16384 THEN 2 ELSE 3 END)::INT AS tw_len
         |      FROM z)
         |SELECT c_custkey,
         | round(vx / 100.0, 6) AS tw_x,
         | round(vy / 100.0, 6) AS tw_y,
         | tw_len,
         | 1.0 AS const_x, 2.0 AS const_y,
         | 3.0 AS const_z, 3 AS const_zdim,
         | 7.0 AS m_rt,
         | (tw_len + 3)::INT AS tw_len_m
         |FROM l ORDER BY c_custkey""".stripMargin,
    "sp_twkb_deflate" ->
      s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer)
         |SELECT c_custkey,
         | round(round(lon * 100) / 100.0, 6) AS rt_x,
         | round(round(lat * 100) / 100.0, 6) AS rt_y,
         | '789C' AS hdr, 1 AS len_ok
         |FROM b ORDER BY c_custkey""".stripMargin,
    "sp_utm" -> spUtmOracle,
    "sp_polar" -> spPolarOracle,
    "sp_laea" -> spLaeaOracle,
    "sp_lcc" -> spLccOracle,
    "sp_albers" -> spAlbersOracle,
    "sp_epsg" -> spEpsgOracle,
    "sp_mga" -> spMgaOracle,
    "sp_jprcs" -> spJprcsOracle,
    "sp_cgcs" -> spCgcsOracle,
    "sp_pulkovo" -> spPulkovoOracle,
    "sp_stateplane" -> spStatePlaneOracle,
    "sp_stateplane27" -> spStatePlane27Oracle,
    "sp_datum" -> spDatumOracle,
    "sp_nadgrids" -> spNadgridsOracle,
    "sp_omerc" -> spOmercOracle,
    "sp_sterea" -> spStereaOracle,
    "sp_krovak" -> spKrovakOracle,
    "sp_sinu" -> spSinuOracle,
    // the sphere collapse replayed literally: x = R·Δλ·cosφ, y = R·φ
    "sp_modis" ->
      s"""SELECT c_custkey,
         | round(6371007.181e0 * radians(lon) * cos(radians(lat)), 1) AS easting,
         | round(6371007.181e0 * radians(lat), 1) AS northing,
         | 1 AS rt_ok
         |FROM (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer)
         |ORDER BY c_custkey""".stripMargin,
    "sp_moll" -> spMollOracle,
    "sp_merc" -> spMercOracle,
    "sp_cea" -> spCeaOracle,
    // PROJ eqc spherical semantics (R = a) replayed literally:
    // x = a·radians(lon), y = a·radians(lat); the inverse is exact
    "sp_eqc" ->
      s"""SELECT c_custkey,
         | round(6378137.0 * radians(lon), 1) AS easting,
         | round(6378137.0 * radians(lat), 1) AS northing,
         | 1 AS rt_ok
         |FROM (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer)
         |ORDER BY c_custkey""".stripMargin,
    "sp_aeqd" -> spAeqdOracle,
    "sp_robinson" -> spRobinsonOracle,
    "sp_geos" -> spGeosOracle,
    // the layout window replayed as a plain coordinate filter — the
    // layout must neither lose (spill/pruning) nor invent rows
    "sp_z2_layout" ->
      s"""SELECT c_custkey,
         | round($lonSql, 6) AS x,
         | round($latSql, 6) AS y
         |FROM customer
         |WHERE ($lonSql) >= -30.0 AND ($lonSql) <= 40.0
         |  AND ($latSql) >= 20.0 AND ($latSql) <= 70.0
         |ORDER BY c_custkey""".stripMargin,
    "sp_buffer_bounds" ->
      s"""WITH p AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
         |d AS (
         |  SELECT 2.0 * 6371008.8 * asin(least(1.0, sqrt(
         |    sin(radians(0.05 - lat) / 2) * sin(radians(0.05 - lat) / 2) +
         |    cos(radians(lat)) * cos(radians(0.05)) *
         |    sin(radians(0.05 - lon) / 2) * sin(radians(0.05 - lon) / 2)))) AS dist
         |  FROM p)
         |SELECT sum(CASE WHEN dist <= 2000000.0 * 0.98 THEN 1 ELSE 0 END)::BIGINT AS n_core,
         | 0 AS viol_in, 0 AS viol_out
         |FROM d""".stripMargin,
    // mirrors GeomImpl.asLatLonText's trunc-based DMS decomposition and
    // Java format "%d°%02d'%06.3f\"H" exactly
    "sp_latlon" ->
      s"""WITH b AS (SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer),
         |g AS (SELECT c_custkey, lon, lat, abs(lat) AS alat, abs(lon) AS alon FROM b),
         |m AS (SELECT c_custkey, lon, lat,
         |        trunc(alat)::INT AS latd, (alat - trunc(alat)) * 60.0 AS latmf,
         |        trunc(alon)::INT AS lond, (alon - trunc(alon)) * 60.0 AS lonmf
         |      FROM g)
         |SELECT c_custkey,
         | printf('%d°%02d''%06.3f"%s', latd, trunc(latmf)::INT,
         |        (latmf - trunc(latmf)) * 60.0,
         |        CASE WHEN lat < 0 THEN 'S' ELSE 'N' END)
         | || ' ' ||
         | printf('%d°%02d''%06.3f"%s', lond, trunc(lonmf)::INT,
         |        (lonmf - trunc(lonmf)) * 60.0,
         |        CASE WHEN lon < 0 THEN 'W' ELSE 'E' END) AS dms
         |FROM m ORDER BY c_custkey""".stripMargin,
    "sp_overlay" ->
      s"""WITH b AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat, $wSql AS w, $hSql AS h
         |  FROM customer)
         |SELECT c_custkey,
         | round(greatest(0, least(lon + w, 50.0) - greatest(lon, -50.0)) *
         |       greatest(0, least(lat + h, 40.0) - greatest(lat, -40.0)), 6) AS inter_area,
         | round(((lon + w) - lon) * ((lat + h) - lat) -
         |       greatest(0, least(lon + w, 50.0) - greatest(lon, -50.0)) *
         |       greatest(0, least(lat + h, 40.0) - greatest(lat, -40.0)), 6) AS diff_area
         |FROM b ORDER BY c_custkey""".stripMargin,
    "sp_extent_prune" ->
      s"""SELECT c_custkey FROM customer
         |WHERE ($lonSql) BETWEEN -50 AND 50 AND ($latSql) BETWEEN -40 AND 40
         |ORDER BY c_custkey""".stripMargin,
    "sp_reproject" ->
      s"""WITH p AS (
         |  SELECT c_custkey, $lonSql AS lon, $latSql AS lat FROM customer)
         |SELECT c_custkey,
         | round(6378137.0 * radians(lon), 2) AS mx,
         | round(6378137.0 * ln(tan(pi() / 4.0 + radians(least(greatest(lat, -85.05112877980659),
         |       85.05112877980659)) / 2.0)), 2) AS my
         |FROM p ORDER BY c_custkey""".stripMargin,
    "sp_spatial_join" ->
      s"""SELECT s_suppkey, count(*) AS n_customers
         |FROM supplier JOIN customer
         |  ON ($lonSql) BETWEEN ((s_suppkey * 13) % 3400) / 10.0 - 170.0
         |                   AND ((s_suppkey * 13) % 3400) / 10.0 - 170.0 + 12.5
         | AND ($latSql) BETWEEN ((s_suppkey * 17) % 1600) / 10.0 - 80.0
         |                   AND ((s_suppkey * 17) % 1600) / 10.0 - 80.0 + 8.0
         |GROUP BY s_suppkey ORDER BY s_suppkey""".stripMargin
    // sp_buffer_count: rows-only (driver) + specs
  )
}
