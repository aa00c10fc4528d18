package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication (SURVEY.md §2.12) — the ingest-time twin
  * of `graft.ops.Dedup.exact`: drop documents whose content hash was
  * already seen, keeping state bounded by an event-time watermark.
  *
  * Same key as the batch operator (md5 of content, so state carries a
  * 16-byte digest per distinct document, never the text). With
  * `dropDuplicatesWithinWatermark`, a duplicate arriving within `delay`
  * of the original is dropped and older state is evicted — at ingest
  * scale, state is bounded by the distinct-content rate inside one
  * watermark span rather than growing with the whole corpus.
  */
object StreamDedup {

  /** The shared dedup key: identical to the batch grouping key in
    * `Dedup.exactGroups` so stream- and batch-deduped corpora agree.
    */
  def withContentHash(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))

  /** Streaming dedup: first arrival per content hash survives. */
  def exactStream(docs: DataFrame, textCol: String, tsCol: String,
                  delay: String = "1 hour"): DataFrame =
    withContentHash(docs, textCol)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Batch twin of [[exactStream]] with deterministic keep-FIRST-by-
    * arrival semantics (min (ts, id) per content hash — the row the
    * streaming path keeps when events arrive in timestamp order inside
    * one watermark span). One shuffle on the 16-byte digest with partial
    * aggregation; the wide payload never shuffles — the survivor row is
    * identified by id, not carried.
    */
  def exactBatch(docs: DataFrame, textCol: String, tsCol: String,
                 idCol: String): DataFrame =
    withContentHash(docs, textCol)
      .groupBy("content_hash")
      .agg(min(struct(col(tsCol), col(idCol))).as("__first"),
        count(lit(1)).as("n_copies"))
      .select(col("content_hash"),
        col(s"__first.$idCol").as("survivor_id"), col("n_copies"))
}
