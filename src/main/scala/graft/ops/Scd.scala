package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) build + point-in-time lookup —
  * the warehouse dimension-history pattern: turn a change stream of
  * (key, ts, attributes) observations into versioned rows with
  * [valid_from, valid_to) intervals, then resolve facts against the
  * version current at each fact's timestamp.
  *
  * Spark-first shape: ONE shuffle on the key serves the whole build —
  * change-collapse (drop observations equal to their predecessor) and
  * interval assembly (valid_to = next survivor's valid_from) are two
  * window passes over the SAME (key, ts) sort order, so Catalyst plans
  * a single Exchange+Sort and runs both windows in-partition. No join,
  * no self-anything: cost is the one key shuffle at any scale.
  *
  * The point-in-time join is [[AsofJoin.asof]] — SCD2 intervals are
  * contiguous per key by construction (each valid_to IS the next
  * valid_from), so "the version with valid_from ≤ ts < valid_to" and
  * "the latest version with valid_from ≤ ts" are the same row, and the
  * union-window as-of (one key shuffle, no range-join explosion)
  * resolves it.
  */
object Scd {

  /** Build the Type-2 dimension from an observation stream.
    *
    * @param obs      change stream; one row per observation
    * @param keyCol   dimension key
    * @param tsCol    observation timestamp (orderable)
    * @param attrCols tracked attributes: a new version opens exactly
    *                 when one of them changes (null-safe comparison)
    * @param tieCol   deterministic tiebreaker within equal (key, ts)
    * @return key, attrs, valid_from, valid_to (null = current),
    *         version (1-based per key), is_current
    */
  def buildType2(obs: DataFrame, keyCol: String, tsCol: String,
                 attrCols: Seq[String], tieCol: String): DataFrame = {
    val ord = Seq(col(tsCol).asc, col(tieCol).asc)
    val scan = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    val changed = obs
      .withColumn("__prev", lag(attrs, 1).over(scan))
      // null-safe: the first observation (null __prev) always opens v1
      .filter(!(attrs <=> col("__prev")))
      .drop("__prev")
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: attrCols ++: Seq(
        "valid_from", "valid_to", "version", "is_current")).map(col): _*)
  }

  /** Resolve each fact against the dimension version current at the
    * fact's timestamp (null attributes when the fact predates the
    * key's first version). Facts keep all their columns.
    *
    * Same-instant versions: two observations at the SAME (key, ts)
    * with different attributes produce a zero-length interval [T, T)
    * plus its successor — only the successor is ever current at or
    * after T, but the underlying as-of's tie among equal right
    * timestamps is unspecified. The dimension is therefore collapsed
    * to the HIGHEST version per (key, valid_from) before the as-of
    * (map-side max(struct) argmax, the evAttribution tie treatment) —
    * deterministic and exactly the contiguous-interval semantics.
    */
  def pointInTime(facts: DataFrame, factTs: String, dim: DataFrame,
                  keyCol: String, attrCols: Seq[String]): DataFrame = {
    require(dim.columns.contains("version"),
      "pointInTime expects a buildType2-shaped dimension (version column)")
    val surviving = dim
      .groupBy(col(keyCol), col("valid_from"))
      .agg(max(struct(col("version") +: attrCols.map(col): _*)).as("__v"))
      .select(col(keyCol) +: col("valid_from") +:
        attrCols.map(c => col(s"__v.$c").as(c)): _*)
    AsofJoin.asof(facts, factTs, surviving, "valid_from", Seq(keyCol))
  }

  /** Incremental SCD2 maintenance: fold a NEW batch of observations
    * into an existing Type-2 dimension without re-windowing history —
    * the result is bit-for-bit what [[buildType2]] over the combined
    * stream would produce (the oracle contract), at O(batch + affected
    * keys' current rows) instead of O(all history).
    *
    * Shape at 100 TB: untouched keys and already-closed versions pass
    * through behind a broadcast anti/semi join on the batch's key set
    * (the CDC-small side — the 100 TB dimension is one scan with a
    * scan-side hash probe, zero dim shuffle, the [[MergeInto]] trade).
    * Only each affected key's CURRENT version re-enters the window as
    * a seed observation carrying its version number; the rebuild
    * shuffles batch-sized data only.
    *
    * Precondition (append-only feed): every new observation's
    * timestamp must be STRICTLY greater than its key's current
    * valid_from — a batch row at exactly the current valid_from would
    * sort after the seed here but possibly before the opening
    * observation in a full rebuild (the original tiebreakers are not
    * retained in the dimension). Late data at or before the current
    * version's start needs the full per-key rebuild path. The
    * precondition is ENFORCED at runtime: a violating batch row
    * `raise_error`s with its key instead of silently producing a
    * dimension that diverges from the rebuild oracle.
    *
    * The tiebreaker keeps its ORIGINAL type (string event ids order
    * within a batch exactly as [[buildType2]] orders them — an earlier
    * revision cast to long, nulling non-numeric tiebreakers); the seed
    * row's tiebreaker is a typed null, which asc-nulls-first sorts
    * before every batch row — and the guard guarantees the seed never
    * shares a (key, ts) slot with a batch row anyway.
    */
  def applyIncrement(dim: DataFrame, obs: DataFrame, keyCol: String,
                     tsCol: String, attrCols: Seq[String],
                     tieCol: String): DataFrame = {
    val tieType = obs.schema(tieCol).dataType
    val keys = obs.select(keyCol).distinct()
    val untouched = dim.join(broadcast(keys), Seq(keyCol), "left_anti")
    val affected = dim.join(broadcast(keys), Seq(keyCol), "left_semi")
    val closed = affected.filter(!col("is_current"))
    // the current version re-enters as a seed observation: its ts is
    // its valid_from, its tiebreaker sorts before any same-ts batch row
    // (typed null, asc = nulls first), and it carries its version
    // number for the renumbering below
    val seed = affected.filter(col("is_current"))
      .select((col(keyCol) +: col("valid_from").as(tsCol) +:
        lit(null).cast(tieType).as(tieCol) +: attrCols.map(col)) :+
        col("version").as("__v0"): _*)
    val batch = obs
      .select((col(keyCol) +: col(tsCol) +: col(tieCol) +:
        attrCols.map(col)) :+ lit(null).cast("int").as("__v0"): _*)
    val ord = Seq(col(tsCol).asc, col(tieCol).asc_nulls_first)
    val scan = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    val keyPart = Window.partitionBy(col(keyCol))
    val attrs = struct(attrCols.map(col): _*)
    val rebuilt = seed.unionByName(batch)
      // LOUD precondition: batch ts must be strictly after the seed's
      // valid_from. The per-key seed ts comes from a no-order window
      // over the same key partitioning (same Exchange, batch-sized
      // data); the check lives in a filter so pruning can't drop it.
      .withColumn("__seed_ts",
        max(when(col("__v0").isNotNull, col(tsCol))).over(keyPart))
      .filter(coalesce(
        when(col("__v0").isNull && col("__seed_ts").isNotNull &&
          col(tsCol) <= col("__seed_ts"),
          raise_error(concat(
            lit("Scd.applyIncrement: batch observation at or before the " +
              "current valid_from for key "), col(keyCol).cast("string"),
            lit(" — late data needs the full rebuild path (buildType2)")))),
        lit(true)))
      .drop("__seed_ts")
      // per-key version offset: the seed's version, or 1 for brand-new
      // keys (no seed) — first_value over the same sort, no extra join
      .withColumn("__base", coalesce(
        first(col("__v0"), ignoreNulls = true).over(
          scan.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        lit(1)))
      .withColumn("__prev", lag(attrs, 1).over(scan))
      .filter(!(attrs <=> col("__prev")))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(scan))
      .withColumn("version", col("__base") + row_number().over(scan) - lit(1))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCol +: attrCols ++: Seq(
        "valid_from", "valid_to", "version", "is_current")).map(col): _*)
    untouched.unionByName(closed).unionByName(rebuilt)
  }
}
