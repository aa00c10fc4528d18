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
  * pathological keys, pre-bucket the timestamp range into coarse epochs
  * (carrying the last right row of each epoch forward) before calling
  * this. A range join is strictly worse: it explodes candidates AND
  * still concentrates the hot key. Right rows sort before left rows at
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
}
