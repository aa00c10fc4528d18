package graft.functions

import graft.geom.{Extent, GeometryUDT}
import org.apache.spark.sql.types._

/** The complete catalog of graft SQL functions: every name the reference
  * registers (spatial/sql/createUDFs.sql:1 — including its `st_icClosed`
  * typo alias, for drop-in parity) plus the spatial-index functions
  * (spatial-index/src/main/scala/com/azavea/hiveless/spatial/index/) and
  * a few graft extensions (TWKB read, Z2 cell helpers) marked below.
  *
  * Each entry maps a SQL name to one or more typed overloads; polymorphic
  * names (st_intersects / st_contains over geometry vs extent, optional
  * precision args) list multiple [[FnSpec]]s and [[GeomFn]] dispatches on
  * the resolved child types.
  */
object FunctionDefs {

  // Plain instance, NOT the companion case object: the UDT's json embeds
  // its class name for parquet schema round-trips, and `GeometryUDT$`
  // (the object) has no public zero-arg constructor to restore from.
  private val G: DataType = new GeometryUDT
  private val GA: DataType = ArrayType(G)
  private val E: DataType = Extent.schema
  private val Z: DataType = Extent.z2IndexSchema
  private val D = DoubleType
  private val I = IntegerType
  private val B = BooleanType
  private val S = StringType
  private val Bin = BinaryType
  private val L = LongType

  private def f(method: String, dt: DataType, in: DataType*): Seq[FnSpec] =
    Seq(FnSpec(method, dt, in))
  private def boxed(method: String, dt: DataType, in: DataType*): Seq[FnSpec] =
    Seq(FnSpec(method, dt, in, boxed = true))

  /** name → overloads; insertion order is the documentation order. */
  val defs: Seq[(String, Seq[FnSpec])] = Seq(
    // ---- constructors
    "st_makePoint"     -> f("makePoint", G, D, D),
    "st_point"         -> f("makePoint", G, D, D),
    "st_makePointM"    -> f("makePointM", G, D, D, D),
    "st_makeLine"      -> f("makeLine", G, GA),
    "st_makePolygon"   -> f("makePolygon", G, G),
    "st_makeBBOX"      -> f("makeBBOX", G, D, D, D, D),
    "st_makeBox2D"     -> f("makeBox2D", G, G, G),
    // ---- parse
    "st_geomFromWKT"       -> f("geomFromWKT", G, S),
    "st_geometryFromText"  -> f("geomFromWKT", G, S),
    "st_pointFromText"     -> f("pointFromText", G, S),
    "st_lineFromText"      -> f("lineFromText", G, S),
    "st_polygonFromText"   -> f("polygonFromText", G, S),
    "st_mPointFromText"    -> f("mPointFromText", G, S),
    "st_mLineFromText"     -> f("mLineFromText", G, S),
    "st_mPolyFromText"     -> f("mPolyFromText", G, S),
    "st_geomFromWKB"       -> f("geomFromWKB", G, Bin),
    "st_pointFromWKB"      -> f("pointFromWKB", G, Bin),
    "st_geomFromGeoJson"   -> f("geomFromGeoJson", G, S),
    "st_geomFromGeoHash"   -> (f("geomFromGeoHash", G, S) ++ f("geomFromGeoHashPrec", G, S, I)),
    "st_box2DFromGeoHash"  -> (f("geomFromGeoHash", G, S) ++ f("geomFromGeoHashPrec", G, S, I)),
    "st_pointFromGeoHash"  -> (f("pointFromGeoHash", G, S) ++ f("pointFromGeoHashPrec", G, S, I)),
    "st_geomFromTWKB"      -> f("geomFromTWKB", G, Bin), // graft extension
    "st_castToPoint"       -> f("castToPoint", G, G),
    "st_castToLineString"  -> f("castToLineString", G, G),
    "st_castToPolygon"     -> f("castToPolygon", G, G),
    "st_castToGeometry"    -> f("castToGeometry", G, G),
    "st_byteArray"         -> f("byteArray", Bin, S),
    // ---- output
    "st_asText"        -> f("asText", S, G),
    "st_asBinary"      -> f("asBinary", Bin, G),
    "st_asTWKB"        -> (f("asTWKB", Bin, G) ++ f("asTWKBPrec", Bin, G, I)),
    "st_asGeoJson"     -> f("asGeoJson", S, G),
    "st_deflate"       -> f("deflate", Bin, Bin),  // graft extension (TWKB export pairing)
    "st_inflate"       -> f("inflate", Bin, Bin),  // graft extension
    "st_asGeoHash"     -> f("geoHash", S, G, I),
    "st_geoHash"       -> f("geoHash", S, G, I),
    "st_asLatLonText"  -> f("asLatLonText", S, G),
    // ---- accessors & measures
    "st_x"             -> boxed("x", D, G),
    "st_y"             -> boxed("y", D, G),
    "st_z"             -> boxed("zCoord", D, G),  // graft extension (Z/M TWKB/WKB)
    "st_m"             -> boxed("mCoord", D, G),  // graft extension
    "st_area"          -> f("area", D, G),
    "st_length"        -> f("length", D, G),
    "st_distance"      -> f("distance", D, G, G),
    "st_distanceSphere" -> f("distanceSphere", D, G, G),
    "st_lengthSphere"  -> f("lengthSphere", D, G),
    "st_centroid"      -> f("centroid", G, G),
    "st_envelope"      -> f("envelope", G, G),
    "st_boundary"      -> f("boundary", G, G),
    "st_dimension"     -> f("dimension", I, G),
    "st_coordDim"      -> f("coordDim", I, G),
    "st_numPoints"     -> f("numPoints", I, G),
    "st_numGeometries" -> f("numGeometries", I, G),
    "st_pointN"        -> f("pointN", G, G, I),
    "st_geometryN"     -> f("geometryN", G, G, I),
    "st_exteriorRing"  -> f("exteriorRing", G, G),
    "st_interiorRingN" -> f("interiorRingN", G, G, I),
    "st_isValid"       -> f("isValid", B, G),
    "st_isSimple"      -> f("isSimple", B, G),
    "st_isEmpty"       -> f("isEmptyGeom", B, G),
    "st_isClosed"      -> f("isClosed", B, G),
    "st_icClosed"      -> f("isClosed", B, G), // reference createUDFs.sql:44 registers this alias
    "st_isRing"        -> f("isRing", B, G),
    "st_isCollection"  -> f("isCollection", B, G),
    "st_isGeomField"   -> (f("isGeomFieldText", B, S) ++ f("isGeomFieldBin", B, Bin)),
    // ---- predicates (st_intersects / st_contains are polymorphic over Extent)
    "st_intersects"    -> (f("intersects", B, G, G) ++ f("intersectsExtentExtent", B, E, E) ++
                           f("intersectsExtentGeom", B, E, G) ++ f("intersectsGeomExtent", B, G, E)),
    "st_contains"      -> (f("contains", B, G, G) ++ f("containsExtentExtent", B, E, E) ++
                           f("containsExtentGeom", B, E, G) ++ f("containsGeomExtent", B, G, E)),
    "st_within"        -> f("within", B, G, G),
    "st_covers"        -> f("covers", B, G, G),
    "st_crosses"       -> f("crosses", B, G, G),
    "st_disjoint"      -> f("disjoint", B, G, G),
    "st_equals"        -> f("equalsGeom", B, G, G),
    "st_overlaps"      -> f("overlaps", B, G, G),
    "st_touches"       -> f("touches", B, G, G),
    "st_relate"        -> f("relate", S, G, G),
    "st_relateBool"    -> f("relateBool", B, G, G, S),
    // ---- processing
    "st_intersection"  -> f("intersection", G, G, G),
    "st_difference"    -> f("difference", G, G, G),
    "st_convexHull"    -> f("convexHull", G, G),
    "st_simplify"      -> f("simplify", G, G, D),
    "st_simplifyPreserveTopology" -> f("simplifyPreserveTopology", G, G, D),
    "st_bufferPoint"   -> f("bufferPoint", G, G, D),
    "st_closestPoint"  -> f("closestPoint", G, G, G),
    "st_translate"     -> f("translate", G, G, D, D),
    "st_antimeridianSafeGeom" -> f("antimeridianSafeGeom", G, G),
    "st_idlSafeGeom"   -> f("antimeridianSafeGeom", G, G),
    // ---- extent & indexing
    "st_makeExtent"     -> f("makeExtent", E, D, D, D, D),
    "st_extentFromGeom" -> f("extentFromGeom", E, G),
    "st_extentToGeom"   -> f("extentToGeom", G, E),
    "st_z2LatLon"       -> f("z2LatLon", Z, G),
    "st_z2Cell"         -> f("z2Cell", L, G, I),          // graft extension
    "st_z2CellXY"       -> f("z2CellXY", L, D, D, I),     // graft extension
    "st_z2CellCover"    -> f("z2CellCover", ArrayType(L), G, I), // graft extension
    "st_partitionCentroid" -> (f("partitionCentroid", L, G, I) ++ f("partitionCentroidBits", L, G, I, I)),
    "st_crsFromText"    -> f("crsFromText", S, S),
    "st_geomReproject"  -> f("geomReproject", G, G, S, S),
    // ---- vector & signature math (graft pipeline builtins; native
    //      codegen'd loops — see GeomImpl vector section)
    "vec_dot"           -> f("vecDot", D, ArrayType(D), ArrayType(D)),
    "vec_norm"          -> f("vecNorm", D, ArrayType(D)),
    "vec_cosine"        -> f("vecCosine", D, ArrayType(D), ArrayType(D)),
    "vec_l2"            -> f("vecL2", D, ArrayType(D), ArrayType(D)),
    "word_shingles"     -> f("wordShingles", ArrayType(S), ArrayType(S), I),
    "minhash_sig"       -> f("minhashSig", ArrayType(L), ArrayType(S), I, L),
    "simhash64"         -> f("simhashNative", L, ArrayType(S)),
    "alnum_space_count" -> f("alnumSpaceCount", I, S), // graft extension (quality-score hot path)
    "space_token_count" -> f("spaceTokenCount", I, S), // graft extension (size(split(t,' ')) twin)
    "letter_count"      -> f("letterCount", I, S),     // graft extension (regex [^A-Za-z] strip twin)
    "upper_count"       -> f("upperCount", I, S),      // graft extension (regex [^A-Z] strip twin)
    "run_token_count"   -> f("runTokenCount", I, S),   // graft extension (size(split(trim(t),' +')) twin)
    "alnum_token_count" -> f("alnumTokenCount", I, S), // graft extension (alnum-bearing token count twin)
    "byte_count"        -> f("byteOccurrences", I, S, I), // graft extension (ASCII-char occurrence count)
    "delete_variant_hashes" -> f("deleteVariantHashes", ArrayType(L), S, I), // graft extension (SymSpell neighborhood)
    "byte_entropy"        -> f("byteEntropy", D, S),       // graft extension (repetition/low-entropy signal)
    "distinct_byte_count" -> f("distinctByteCount", I, S), // graft extension
    "top_byte_count"      -> f("topByteCount", I, S),      // graft extension
    "winnow_fingerprints" -> f("winnowFingerprints", ArrayType(L), ArrayType(S), I),
    "lsh_bucket"        -> f("lshBucketNative", L, ArrayType(D), I, L),
    "lang_id"           -> f("langIdNative", S, ArrayType(S), ArrayType(S), ArrayType(ArrayType(S))),
    "script_counts"     -> f("scriptCounts", ArrayType(L), S), // graft extension (language-ID script router)
    "gram_hashes"       -> f("wordGramHashes", ArrayType(L), ArrayType(S), I), // graft extension (O(len) rolling n-gram hashes)
    "stopword_count"    -> f("stopwordCountNative", I, ArrayType(S), ArrayType(S)),
    "repetition_stats"  -> f("repetitionStats", ArrayType(L), ArrayType(S), I),
    "ivf_assign"        -> f("ivfAssign", I, ArrayType(D), ArrayType(ArrayType(D))),
    "pq_adc"            -> f("pqAdc", D, ArrayType(D), ArrayType(I), ArrayType(D), I),
    "ivf_probes"        -> f("ivfProbes", ArrayType(I), ArrayType(D), ArrayType(ArrayType(D)), I),
    "bloom_contains"    -> f("bloomContains", B, Bin, L, I),
    "nfc_normalize"     -> f("nfcNormalize", S, S),
    "nfkc_normalize"    -> f("nfkcNormalize", S, S),
    "fix_mojibake"      -> f("fixMojibake", S, S), // graft extension (ftfy-style encoding repair)
    "readability_counts" -> f("readabilityCounts", ArrayType(L), S) // graft extension (Flesch battery inputs, one byte pass)
  )

  val byName: Map[String, Seq[FnSpec]] = defs.toMap

  // user-registered functions (FunctionRegistration.registerFunction) —
  // overloads accumulate per name; re-registering the SAME input
  // signature REPLACES the old spec (idempotent: a re-run notebook cell
  // or retry loop doesn't grow the overload list, and the latest
  // implementation wins). The registry is JVM-global, shared by every
  // SparkSession in the process.
  private val userDefs =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[FnSpec]]()

  private[functions] def addUser(name: String, spec: FnSpec): Seq[FnSpec] =
    userDefs.merge(name, Seq(spec), (old, add) =>
      old.filterNot(_.inputTypes == spec.inputTypes) ++ add)

  /** Catalog + user-registry lookup (built-in names win). */
  def lookup(name: String): Seq[FnSpec] =
    byName.getOrElse(name, {
      val u = userDefs.get(name)
      if (u == null) throw new NoSuchElementException(
        s"unknown graft function '$name' (not in the catalog or the user registry)")
      u
    })

  /** Build a callable Column for any catalog or user-registered function
    * (shared by the [[st]] DSL and the pipeline operators).
    */
  def call(name: String, cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftBridge.column(
      GeomFn(name, lookup(name), cols.map(org.apache.spark.sql.GraftBridge.expression)))

  /** Build a callable aggregate Column (names from
    * [[FunctionRegistration.aggBuilders]]'s registry).
    */
  def callAgg(name: String, cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column = {
    val exprs = cols.map(org.apache.spark.sql.GraftBridge.expression)
    val agg = name.toLowerCase match {
      case "topk_by_score"     => TopKAgg(exprs(0), exprs(1), exprs(2))
      case "topn_rows"         => TopNRowsAgg(exprs(0), exprs(1), exprs(2), exprs(3))
      case "vec_sum"           => VectorSumAgg(exprs.head)
      case "bloom_agg"         => BloomAgg(exprs(0), exprs(1), exprs(2))
      case "cms_agg"           => CmsAgg(exprs(0), exprs(1), exprs(2))
      case "kmv_agg"           => KmvAgg(exprs(0), exprs(1))
      case "qdigest_agg"       => QdigestAgg(exprs(0), exprs(1))
      case "vec_outer_sum"     => VectorOuterSumAgg(exprs.head)
      case "st_convexhullaggr" => ConvexHullAgg(exprs.head)
      case other               => throw new IllegalArgumentException(s"unknown aggregate $other")
    }
    org.apache.spark.sql.GraftBridge.column(agg.toAggregateExpression(isDistinct = false))
  }
}
