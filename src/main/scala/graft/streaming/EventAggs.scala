package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed event aggregation (SURVEY.md §2.12) — ONE transformation
  * shared by the batch query (`ev_window`, DuckDB-oracle-verified) and
  * the streaming path (MemoryStream specs), so the streaming operator's
  * logic is itself oracle-checked through its batch twin.
  */
object EventAggs {

  /** Hourly tumbling window × event_type: count + avg(value). */
  def hourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(avg("value"), 4).as("avg_value"))
      .select(
        unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("n"), col("avg_value"))

  /** Streaming variant: same aggregation behind an event-time watermark
    * (late data beyond `delay` is dropped; state for closed windows is
    * evicted — bounded state at any corpus rate).
    */
  def hourlyStream(events: DataFrame, delay: String = "2 hours"): DataFrame =
    hourly(events.withWatermark("ts", delay))
}
