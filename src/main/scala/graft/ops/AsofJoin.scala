package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the LATEST
  * right row with the same key whose timestamp is ≤ the left row's
  * timestamp — the classic trades→quotes / events→dimension-history
  * lookup. Matches DuckDB's `ASOF JOIN` semantics (inclusive on equal
  * timestamps, left join: unmatched left rows keep null payloads).
  *
  * Spark-first formulation — the union-window trick instead of a range
  * join: tag both inputs, UNION them, and run ONE window pass per key
  * ordered by (ts, side) where `last(payload, ignoreNulls)` carries the
  * most recent right payload forward onto each left row. Cost at 100 TB:
  * both sides shuffle once on the key (no range-join candidate
  * explosion, no per-key driver work), then a linear in-partition scan.
  * Hot-key caveat: the window partitions BY KEY, and AQE splits skewed
  * join/shuffle partitions but NOT window partitions — a single key with
  * millions of rows pins one task for its whole (sorted) scan. The scan
  * itself is linear, so the bound is O(max key group) per task; for
  * pathological keys use [[asofBucketed]], which pre-buckets the
  * timestamp range into coarse epochs and carries each epoch's last
  * right row forward, restoring per-key parallelism to #epochs. A range
  * join is strictly worse: it explodes candidates AND still
  * concentrates the hot key. Right rows sort before left rows at
  * equal timestamps, which is what makes the match inclusive.
  *
  * Determinism: if several right rows share the same (key, ts), which
  * payload wins is unspecified (same as DuckDB ASOF) — payload values
  * that are functions of the timestamp alone are always deterministic.
  */
object AsofJoin {

  /** @param left     probe side; all its columns pass through
    * @param leftTs   left timestamp column (any orderable type)
    * @param right    build side: key columns + timestamp + payload
    * @param rightTs  right timestamp column
    * @param keyCols  equi-join key column names, present on both sides
    * @return left columns + right's non-key columns (null when no right
    *         row is ≤ the left timestamp)
    */
  def asof(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "AsofJoin needs at least one key column")
    val payloadCols = right.columns.filterNot(keyCols.contains)
    val clash = payloadCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"AsofJoin: right-side column(s) ${clash.mkString(", ")} collide with left columns — rename before joining")
    val reserved = Seq("__ts", "__side", "__rpay", "__m")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"AsofJoin reserves working columns ${reserved.mkString(", ")}")

    val r2 = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__rpay")): _*)
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Hot-key-safe as-of join: identical semantics to [[asof]], but the
    * event-level window partitions by (key, epoch) where epoch =
    * floor(timestamp / bucketSeconds), so a key with millions of rows
    * spreads over #epochs tasks instead of pinning one.
    *
    * Carry-forward across epochs is itself a tiny as-of at EPOCH
    * granularity: the latest right row per (key, epoch) — a map-side
    * partial aggregate, one row per key-epoch — runs through one
    * bucket-level union-window (left epoch rows sort BEFORE right at
    * equal epoch, so an epoch's seed sees only strictly-earlier epochs)
    * and is injected as a synthetic right row into each left epoch.
    * Seed timestamps come from earlier epochs, so they sort first inside
    * the epoch window naturally. Cost: two extra aggregations whose
    * cardinality is key-epochs (≪ events), in exchange for bounding the
    * window task at O(events per key-epoch).
    *
    * Timestamps must be TimestampType (epochs come from unix_micros).
    * Tie handling at equal right timestamps is unspecified, same as
    * [[asof]]/DuckDB ASOF.
    */
  def asofBucketed(
      left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String,
      keyCols: Seq[String], bucketSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "AsofJoin needs at least one key column")
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val payloadCols = right.columns.filterNot(keyCols.contains)
    val clash = payloadCols.filter(left.columns.contains)
    require(clash.isEmpty,
      s"AsofJoin: right-side column(s) ${clash.mkString(", ")} collide with left columns — rename before joining")
    val reserved = Seq("__ts", "__side", "__rpay", "__m", "__bk", "__lastr", "__seed")
    require(!(left.columns ++ right.columns).exists(reserved.contains),
      s"AsofJoin reserves working columns ${reserved.mkString(", ")}")

    val wMicros = bucketSeconds * 1000000L
    // floor division on exact integers (micros and their pmod are exact
    // doubles below 2^53, and the quotient is an exact integer). The cast
    // accepts TIMESTAMP_NTZ inputs too (session-zone interpretation —
    // monotonic, so epoch assignment stays order-consistent).
    def bk(c: Column): Column = {
      val um = unix_micros(c.cast("timestamp"))
      ((um - pmod(um, lit(wMicros))) / lit(wMicros.toDouble)).cast("long")
    }

    val key = keyCols.map(col)
    val rpay = struct(payloadCols.map(col): _*)

    // one row per (key, epoch): the latest right row of that epoch
    val latest = right
      .select(key :+ col(rightTs).as("__ts") :+ rpay.as("__rpay"): _*)
      .withColumn("__bk", bk(col("__ts")))
      .groupBy(key :+ col("__bk"): _*)
      .agg(max_by(struct(col("__ts"), col("__rpay")), col("__ts")).as("__lastr"))

    // epochs that actually contain left rows (they need a seed)
    val lBuckets = left
      .select(key :+ bk(col(leftTs)).as("__bk"): _*)
      .distinct()

    // bucket-level union-window: for each left epoch, the last right row
    // of any STRICTLY earlier epoch (left rows sort first at equal epoch)
    val seedW = Window.partitionBy(key: _*)
      .orderBy(col("__bk").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seeds = latest.withColumn("__side", lit(1))
      .unionByName(lBuckets.withColumn("__side", lit(0)), allowMissingColumns = true)
      .withColumn("__seed", last(col("__lastr"), ignoreNulls = true).over(seedW))
      .filter(col("__side") === 0 && col("__seed").isNotNull)
      .select(key ++ Seq(col("__bk"),
        col("__seed.__ts").as("__ts"), col("__seed.__rpay").as("__rpay")): _*)

    // event-level union-window per (key, epoch), seeded
    val r2 = right
      .select(key ++ Seq(col(rightTs).as("__ts"), rpay.as("__rpay")): _*)
      .withColumn("__bk", bk(col("__ts")))
      .unionByName(seeds)
      .withColumn("__side", lit(0))
    val l2 = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__bk", bk(col("__ts")))
      .withColumn("__side", lit(1))
    val w2 = Window.partitionBy(key :+ col("__bk"): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__m", last(col("__rpay"), ignoreNulls = true).over(w2))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }
}
