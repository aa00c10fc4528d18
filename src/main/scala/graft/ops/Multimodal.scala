package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.11): media as opaque binary
  * columns with typed metadata, batch-shaped decode/feature extraction
  * via mapPartitions.
  *
  * The decode step is a DETERMINISTIC STUB (byte histogram standing in
  * for an image/audio decoder — the real codec libraries are not on this
  * classpath); everything around it is the real engine surface: schema,
  * encoders, partition-batched iteration (the JVM twin of a
  * mapInPandas-style batched UDF), and the columnar contract that a real
  * decoder would slot into.
  */
object Multimodal {

  val FeatDim = 16
  val BatchSize = 256

  /** Attach the media binary + typed metadata to a text corpus: the blob
    * is the UTF-8 encoding of the text (deterministic fake media), the
    * metadata struct is what a real ingest would carry.
    */
  def withBlob(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      col(textCol).cast("binary").as("media"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(col(textCol)).as("n_bytes"),
        (col(idCol) % 3).cast("int").as("channel")).as("media_meta"))

  /** STUBBED decoder: a real implementation would decode image/audio
    * frames here; this deterministic stand-in histograms bytes into
    * FeatDim bins and L1-normalizes, so the batch plumbing and output
    * schema are fully exercised and testable.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatDim)
    var i = 0
    while (i < bytes.length) {
      bins((bytes(i) & 0xff) % FeatDim) += 1f
      i += 1
    }
    if (bytes.length > 0) {
      var j = 0
      while (j < FeatDim) { bins(j) /= bytes.length; j += 1 }
    }
    bins
  }

  /** Per-document features through partition-batched decode. The
    * iterator is consumed in BatchSize groups — the same batch shape a
    * vectorized (Arrow/pandas-style) UDF would see — so a real decoder
    * can amortize model/codec setup per batch.
    */
  def features(spark: SparkSession, media: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] =
      media.select(col(idCol).cast("long"), col("media")).as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.grouped(BatchSize).flatMap { batch =>
        // per-batch setup would go here (decoder init, model session…)
        batch.iterator.map { case (id, bytes) =>
          (id, bytes.length, decodeStub(bytes))
        }
      }
    }.toDF(idCol, "n_bytes", "features")
  }
}
