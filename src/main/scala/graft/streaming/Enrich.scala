package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment (SURVEY.md §2.12): join an event frame —
  * batch or streaming — against a static dimension and count per
  * segment. ONE transformation shared by the batch entry (`ev_enrich`,
  * DuckDB-oracle-verified) and the streaming path (MemoryStream spec),
  * so the streaming operator's logic is value-checked through its batch
  * twin, the same pattern as [[EventAggs]] / [[Sessionize]].
  *
  * The dimension is explicitly broadcast: the stream side never
  * shuffles for the join (in streaming, Spark re-broadcasts the static
  * side per micro-batch; at 100 TB event rates that is the only join
  * shape that keeps up).
  */
object Enrich {

  def perSegment(events: DataFrame, dim: DataFrame,
                 keyCol: String, segCol: String): DataFrame =
    events.join(broadcast(dim), keyCol)
      .groupBy(segCol).agg(count(lit(1)).as("n_events"))
}
