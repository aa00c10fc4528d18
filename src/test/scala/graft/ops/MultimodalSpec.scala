package graft.ops

import graft.SparkTestSession
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class MultimodalSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private lazy val media =
    Multimodal.withBlob(Tables.documents(SparkTestSession.session, sfDir), "doc_id", "text")

  test("withBlob: opaque binary column + typed metadata struct") {
    media.schema("media").dataType shouldBe BinaryType
    val meta = media.schema("media_meta").dataType.asInstanceOf[StructType]
    meta.fieldNames.toSeq shouldBe Seq("mime", "n_bytes", "channel")
    val r = media.orderBy("doc_id").head()
    r.getAs[Array[Byte]]("media") should not be empty
  }

  test("features: batched decode plumbing over every row, deterministic") {
    val f = Multimodal.features(spark, media, "doc_id").cache()
    f.count() shouldBe media.count()
    val rows = f.orderBy("doc_id").limit(5).collect()
    rows.foreach { r =>
      val feats = r.getSeq[Float](2)
      feats.length shouldBe Multimodal.FeatDim
      // histogram is L1-normalized
      feats.map(_.toDouble).sum shouldBe 1.0 +- 1e-3
    }
    // n_bytes equals the blob length
    val joined = f.join(media.select(col("doc_id"), org.apache.spark.sql.functions.length(col("media")).as("blen")), "doc_id")
      .filter(col("n_bytes") =!= col("blen")).count()
    joined shouldBe 0L
  }

  test("decode stub is a pure function of bytes") {
    val a = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("hello world".getBytes("UTF-8"))
    a.toSeq shouldBe b.toSeq
    Multimodal.decodeStub(Array.emptyByteArray).toSeq shouldBe Seq.fill(Multimodal.FeatDim)(0f)
  }

  test("batch grouping handles partitions larger than BatchSize") {
    import spark.implicits._
    val big = spark.range(3 * Multimodal.BatchSize + 17).select(
      col("id").as("doc_id"), lit("payload").cast("binary").as("media")).repartition(2)
    Multimodal.features(spark, big, "doc_id").count() shouldBe (3 * Multimodal.BatchSize + 17)
  }
}
