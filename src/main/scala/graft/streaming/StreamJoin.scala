package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (SURVEY.md §2.12): correlate
  * each trigger event with the follow events of the same key that
  * arrive within a horizon — the attribution/funnel join (click →
  * purchase within an hour).
  *
  * ONE transformation shared by the batch entry (`ev_funnel`,
  * DuckDB-oracle-verified) and the streaming path (MemoryStream spec),
  * the same pattern as [[Enrich]] / [[Sessionize]]: `withWatermark` is
  * a no-op in batch (Catalyst's EliminateEventTimeWatermark strips it),
  * so the batch twin runs the IDENTICAL plan minus state.
  *
  * At scale: this is the one join shape Structured Streaming can run
  * unbounded — both sides shuffle on the key once, and the watermark +
  * time-range condition bound the join state (a trigger row is evicted
  * as soon as its horizon passes the watermark; without the range
  * condition state grows forever). The horizon is also exactly what a
  * batch backfill needs to bucket-prune.
  */
object StreamJoin {

  /** (trigger_id, follow_id, key, trigger_ts, follow_ts) for every
    * follow within (trigger_ts, trigger_ts + horizonSec]. Strictly
    * after: a simultaneous event is not its own consequence.
    */
  def correlate(triggers: DataFrame, follows: DataFrame,
                keyCol: String, idCol: String, tsCol: String,
                horizonSec: Long, watermarkDelay: String = "10 minutes"): DataFrame = {
    val a = triggers.select(col(keyCol).as("key"),
        col(idCol).as("trigger_id"), col(tsCol).as("trigger_ts"))
      .withWatermark("trigger_ts", watermarkDelay)
    val b = follows.select(col(keyCol).as("__k"),
        col(idCol).as("follow_id"), col(tsCol).as("follow_ts"))
      .withWatermark("follow_ts", watermarkDelay)
    a.join(b,
      col("key") === col("__k") &&
        col("follow_ts") > col("trigger_ts") &&
        col("follow_ts") <= col("trigger_ts") + expr(s"interval $horizonSec seconds"))
      .select("key", "trigger_id", "follow_id", "trigger_ts", "follow_ts")
  }
}
