package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** CSV ingest/egress with quarantine — the other wire format corpora
  * and vendor drops actually arrive in (metadata sheets, label exports,
  * registry dumps). Same design contract as [[Jsonl]], carried by
  * Spark's native csv source so the scan stays a codegen'd FileScan:
  *
  *  - explicit schema, never inference — no sampling pass over 100 TB,
  *    and column pruning reaches the Univocity parser (only requested
  *    fields are converted);
  *  - malformed rows are quarantined, not fatal: PERMISSIVE mode routes
  *    the raw line into a corrupt-record column. NOTE the CSV-specific
  *    semantics, different from JSONL and pinned by the src_csv oracle:
  *    a row with one unconvertible field keeps its OTHER parsed fields
  *    (only the bad field is null) while still carrying the raw line in
  *    the corrupt column — so a quarantine sink can triage by which
  *    fields survived, which JSONL's all-or-nothing parse can't;
  *  - the writer emits RFC-4180-style quoting only where needed
  *    (Univocity's minimal quote mode), header optional and OFF by
  *    default — at fleet scale a header per shard is a schema-drift
  *    hazard, the explicit schema is the contract.
  */
object Csv {

  /** Write `df` as headerless CSV shards in `df` column order. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(path)

  /** Read a CSV path with an explicit schema, quarantining malformed
    * rows into `corruptCol` (null for fully-parsed rows). See the
    * object doc for the partial-row semantics of a single bad field.
    * As with JSONL, never project ONLY the corrupt column (SPARK-21610).
    */
  def read(s: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt"): DataFrame =
    s.read
      .schema(StructType(schema.fields :+ StructField(corruptCol, StringType)))
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)

  /** Streaming twin of [[read]]: the same explicit-schema PERMISSIVE
    * parse as an unbounded file source — new CSV shards landing in
    * `path` flow through with malformed rows quarantined per
    * micro-batch (append mode, no state); `maxFilesPerTrigger` is the
    * ingest-rate knob.
    */
  def readStream(s: SparkSession, path: String, schema: StructType,
                 corruptCol: String = "_corrupt"): DataFrame =
    s.readStream
      .schema(StructType(schema.fields :+ StructField(corruptCol, StringType)))
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .csv(path)
}
