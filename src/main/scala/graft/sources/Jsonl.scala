package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (newline-delimited JSON) ingest/egress — the wire format
  * training corpora actually arrive in (WARC-extract → JSONL shards).
  * Mirrors the reference's SerDe surface (hiveless serializes rows for
  * Hive's LazySimpleSerDe; here the engine's own text source carries the
  * line format) re-expressed as Spark's native json source so the scan
  * stays a codegen'd FileScan with schema pruning.
  *
  * Scale notes:
  *  - the reader is `spark.read.schema(...).json` — an explicit schema,
  *    so NO sampling inference pass over 100 TB, and column pruning
  *    reaches the parser (Jackson parses only requested fields);
  *  - malformed lines are quarantined, not fatal: PERMISSIVE mode routes
  *    the raw line into a corrupt-record column, so one bad shard can't
  *    kill a fleet-sized ingest — the caller splits good/bad with one
  *    scan and writes the quarantine alongside the parsed output;
  *  - the writer emits one JSON object per line via `to_json` (codegen'd
  *    Jackson), partition-parallel text files.
  */
object Jsonl {

  /** Write `df` as JSONL: one canonical JSON object per line, fields in
    * `df` column order.
    */
  def write(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").text(path)

  /** Read a JSONL path with an explicit schema, quarantining malformed
    * lines into `corruptCol` (null for parsed rows). The returned frame
    * carries `schema` + the corrupt column; a malformed line yields all
    * data fields null and the raw line in `corruptCol`.
    *
    * Spark disallows queries that reference ONLY the corrupt column
    * (the parser would never run, so the column would be empty —
    * SPARK-21610); always keep at least one data column in the plan,
    * e.g. `read(...).filter(col("_corrupt").isNotNull).select("id",
    * "_corrupt")` for the quarantine sink.
    */
  def read(s: SparkSession, path: String, schema: StructType,
           corruptCol: String = "_corrupt"): DataFrame =
    s.read
      .schema(StructType(schema.fields :+ StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)

  /** Streaming twin of [[read]]: the SAME explicit-schema PERMISSIVE
    * parse as an unbounded file source — new JSONL shards landing in
    * `path` flow through with malformed lines quarantined per
    * micro-batch instead of killing the query (append mode, no state).
    * This is the continuous-ingest front door of a training-data
    * pipeline: a crawler drops shards, the stream parses + quarantines,
    * downstream dedup/curation consumes. `maxFilesPerTrigger` is the
    * ingest-rate knob at fleet scale.
    */
  def readStream(s: SparkSession, path: String, schema: StructType,
                 corruptCol: String = "_corrupt"): DataFrame =
    s.readStream
      .schema(StructType(schema.fields :+ StructField(corruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
}
