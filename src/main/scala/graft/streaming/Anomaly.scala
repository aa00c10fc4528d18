package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key anomaly detection (SURVEY.md §2.12 maintenance surface) —
  * ONE transformation shared by the batch query (`ev_anomaly`,
  * DuckDB-oracle-verified) and the streaming path (MemoryStream spec),
  * so the streaming operator's logic is itself oracle-checked through
  * its batch twin — the same proof shape as EventAggs/cms_agg.
  *
  * The split into [[dailyCounts]] + [[flags]] is the streaming design:
  * the ONLY corpus-sized state is the daily count per (event_type, day)
  * — an algebraic aggregate that accumulates incrementally across
  * micro-batches (complete mode; |types|·|days| rows of state, never
  * events) — while the z-score needs each type's FULL day distribution
  * and therefore runs as a tiny finishing step over the aggregate's
  * output, exactly as it does in batch.
  */
object Anomaly {

  /** Stage 1 — daily event counts per type: the one corpus-sized
    * aggregation, and the whole streaming state. Counts are algebraic,
    * so the streamed accumulation converges to the batch groupBy
    * bit-for-bit.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_start"))
      .agg(count(lit(1)).as("cnt"))

  /** Stage 2 — z-score finishing over the (tiny) daily table: per-type
    * exact-integer moments (n·Σc² − (Σc)² in decimal(38,0); floats only
    * in the final mirrored division/sqrt), broadcast back onto the daily
    * rows, |z| > 2 flags. Degenerate strata (n_days < 2 or zero
    * variance) produce no flags by construction.
    */
  def flags(daily: DataFrame): DataFrame = {
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      sum(col("cnt")).as("sum_c"),
      // cnt² in exact decimal: a 1e10-events/day key at 100 TB would
      // overflow long; decimal(38,0) gives the same headroom the
      // profile moments use
      sum((col("cnt").cast("decimal(38,0)") * col("cnt")).cast("decimal(38,0)"))
        .as("sumsq_c"))
    daily.join(broadcast(stats), "event_type")
      .withColumn("__var",
        (col("n_days") * col("sumsq_c") -
          col("sum_c").cast("decimal(38,0)") * col("sum_c")).cast("double") /
          (col("n_days").cast("double") * (col("n_days") - 1).cast("double")))
      .filter(col("n_days") > 1 && col("__var") > 0.0)
      .withColumn("z",
        (col("cnt").cast("double") - col("sum_c").cast("double") / col("n_days")) /
          sqrt(col("__var")))
      .filter(abs(col("z")) > 2.0)
      .select(col("event_type"), col("day_start"), col("cnt"),
        round(col("z"), 4).as("z"))
  }
}
