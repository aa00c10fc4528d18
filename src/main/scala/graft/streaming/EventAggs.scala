package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed event aggregation (SURVEY.md §2.12) — ONE transformation
  * shared by the batch query (`ev_window`, DuckDB-oracle-verified) and
  * the streaming path (MemoryStream specs), so the streaming operator's
  * logic is itself oracle-checked through its batch twin.
  */
object EventAggs {

  /** Hourly tumbling window × event_type: count + avg(value), 4 dp.
    *
    * The average is computed entirely in integer arithmetic: values
    * become micro-unit longs (round(value·10⁶)), the sum is exact and
    * order-independent, and the 4-dp rounding is integer round-half-up
    * (floor((sum + d/2) / d)). `round(avg(double), 4)` is NOT reproducible
    * across engines: float summation order shifts the last ulp, and on
    * exact decimal ties Spark rounds the decimal string HALF_UP while
    * DuckDB rounds the binary double — both found by the oracle compare
    * at sf0.1.
    *
    * The floor division is spelled sign-aware ([[graft.queries.Relational.floorDivSql]]):
    * Spark's `div` truncates toward zero while the oracle's `//` floors,
    * so a bare `div` would silently diverge on negative sums.
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 1e6).cast("long")).as("__sum_micro"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n"),
        // integer round-half-up of sum_micro / (n·10⁶) to 4 dp
        (expr(graft.queries.Relational.floorDivSql("__sum_micro + n * 50", "n * 100")) / 1e4)
          .as("avg_value"))

  /** Streaming variant: same aggregation behind an event-time watermark
    * (late data beyond `delay` is dropped; state for closed windows is
    * evicted — bounded state at any corpus rate).
    */
  def hourlyStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    hourly(events.withWatermark("ts", delay))
}
