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

  test("resize: output bounded by target, small blobs untouched, deterministic") {
    val out = Multimodal.resize(spark, media, "doc_id", targetBytes = 64).cache()
    out.count() shouldBe media.count()
    out.filter(org.apache.spark.sql.functions.length(col("media")) > 64).count() shouldBe 0L
    // small inputs pass through unchanged
    val smalls = media.filter(org.apache.spark.sql.functions.length(col("media")) <= 64).select("doc_id").collect().map(_.getLong(0))
    if (smalls.nonEmpty) {
      val orig = media.filter(col("doc_id") === smalls.head).select("media").head().getAs[Array[Byte]](0)
      val res = out.filter(col("doc_id") === smalls.head).select("media").head().getAs[Array[Byte]](0)
      res.toSeq shouldBe orig.toSeq
    }
    // stub endpoints: first byte preserved
    Multimodal.resizeStub(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8), 4).toSeq shouldBe Seq[Byte](1, 3, 5, 7)
  }

  test("sampleFrames: fixed-size frames at the stride, remainder dropped") {
    import spark.implicits._
    val blob = (0 until 100).map(_.toByte).toArray // 10 frames of 10 bytes
    val df = Seq((1L, blob)).toDF("doc_id", "media")
    val frames = Multimodal.sampleFrames(spark, df, "doc_id", frameBytes = 10, stride = 3)
      .orderBy("frame_idx").collect()
    frames.map(_.getInt(1)).toSeq shouldBe Seq(0, 3, 6, 9)
    frames.foreach { r =>
      val f = r.getAs[Array[Byte]](2)
      f.length shouldBe 10
      f(0) shouldBe (r.getInt(1) * 10).toByte
    }
    // blob smaller than one frame → no rows, no crash
    val tiny = Seq((2L, Array[Byte](1, 2))).toDF("doc_id", "media")
    Multimodal.sampleFrames(spark, tiny, "doc_id", frameBytes = 10, stride = 1).count() shouldBe 0L
  }

  test("real PNG decode: javax.imageio roundtrips the synthesized pixels exactly") {
    import spark.implicits._
    // direct: encode then decode one image, compare every sample
    val bytes = Multimodal.synthPng(42L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img.getWidth shouldBe (1 + 42 % 8)
    img.getHeight shouldBe (1 + 42 % 5)
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      img.getRaster.getSample(x, y, 0) shouldBe ((42 * 31 + y * img.getWidth + x) % 256)
    // through the batched operator: dims + pixel sums match the formula
    val ids = spark.range(40).select(col("id").as("doc_id"))
    val out = Multimodal.decodeImages(spark, Multimodal.synthesizePngs(spark, ids, "doc_id"), "doc_id")
      .orderBy("doc_id").collect()
    out.length shouldBe 40
    out.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (1 + id % 8, 1 + id % 5)
      r.getInt(1).toLong shouldBe w
      r.getInt(2).toLong shouldBe h
      r.getLong(3) shouldBe (0L until w * h).map(i => (id * 31 + i) % 256).sum
    }
  }

  test("real WAV decode: javax.sound roundtrips the synthesized samples exactly") {
    import spark.implicits._
    // direct: encode then decode one clip, compare format + every sample
    val bytes = Multimodal.synthWav(42L)
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    ais.getFormat.getSampleRate shouldBe 8000f
    ais.getFormat.getChannels shouldBe 1
    val pcm = ais.readAllBytes()
    val n = Multimodal.wavNumSamples(42L)
    n should be >= 64 // every clip exercises all 64 fingerprint bits
    pcm.length shouldBe n * 2
    for (i <- 0 until n) {
      val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toInt
      s shouldBe Multimodal.wavSample(42L, i)
    }
    // the clone seed: every 100th clip is a byte-for-byte copy of its
    // block's base (the planted ~1% duplication rate)
    Multimodal.synthWav(199L) shouldBe Multimodal.synthWav(100L)
    Multimodal.synthWav(198L) should not be Multimodal.synthWav(100L)
    // through the batched operator: counts + sums match the formula
    val ids = spark.range(40).select(col("id").as("doc_id"))
    val out = Multimodal.decodeAudio(spark, Multimodal.synthesizeWavs(spark, ids, "doc_id"), "doc_id")
      .orderBy("doc_id").collect()
    out.length shouldBe 40
    out.foreach { r =>
      val id = r.getLong(0)
      val nn = Multimodal.wavNumSamples(id)
      r.getInt(1) shouldBe 8000
      r.getInt(2) shouldBe 1
      r.getLong(3) shouldBe nn.toLong
      r.getLong(4) shouldBe (0 until nn).map(i => Multimodal.wavSample(id, i).toLong).sum
    }
  }

  test("audioPhash: header-only clips skip, wrong PCM format fails loudly (the decodeAudio guards)") {
    import spark.implicits._
    // a valid WAV with zero samples: decodeAudio reports n_samples = 0;
    // the fingerprint path must DROP the row, not fail the stage
    def wav(fmt: javax.sound.sampled.AudioFormat, n: Int): Array[Byte] = {
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(
          new Array[Byte](n * fmt.getFrameSize)), fmt, n.toLong)
      val baos = new java.io.ByteArrayOutputStream(64)
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val le16 = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val media = Seq((1L, wav(le16, 0)), (2L, Multimodal.synthWav(2L)))
      .toDF("doc_id", "media")
    val out = Multimodal.audioPhash(spark, media, "doc_id").collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(2L)
    // an 8-bit clip must not fingerprint silently wrong: same loud
    // guard as decodeAudio
    val bad = Seq((3L, wav(
      new javax.sound.sampled.AudioFormat(8000f, 8, 1, true, false), 4)))
      .toDF("doc_id", "media")
    val e = intercept[Exception] {
      Multimodal.audioPhash(spark, bad, "doc_id").collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    chain should include("16-bit little-endian")
  }

  test("audioPhash: fingerprint bits are the decoded samples' signs vs the clip mean") {
    import spark.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    val out = Multimodal.audioPhash(spark,
        Multimodal.synthesizeWavs(spark, ids, "doc_id"), "doc_id")
      .orderBy("doc_id").collect()
    out.length shouldBe 40
    out.foreach { r =>
      val id = r.getLong(0)
      // the fingerprint reads min(n, 64) = 64 samples (every clip now
      // carries ≥ 64), so all 64 bits are live
      val nn = 64
      val smp = (0 until nn).map(i => Multimodal.wavSample(id, i).toLong)
      val mean = smp.sum.toDouble / nn
      val expected = smp.zipWithIndex
        .map { case (s, i) => if (s > mean) 1L << i else 0L }.sum
      r.getLong(1) shouldBe expected
    }
  }

  test("real GIF frame sampling: javax.imageio roundtrips every strided frame exactly") {
    import spark.implicits._
    // direct: encode then decode one animation, compare frame count + every sample
    val bytes = Multimodal.synthGif(42L)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val stream = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    reader.setInput(stream)
    reader.getNumImages(true) shouldBe (2 + 42 % 3)
    val (w, h) = (1 + 42 % 6, 1 + 42 % 4)
    for (f <- 0 until reader.getNumImages(true)) {
      val img = reader.read(f)
      img.getWidth shouldBe w
      img.getHeight shouldBe h
      for (y <- 0 until h; x <- 0 until w)
        (img.getRGB(x, y) & 0xff) shouldBe ((42 * 31 + f * 97 + y * w + x) % 256)
    }
    stream.close(); reader.dispose()
    // through the batched operator: strided frame indices + dims + pixel sums
    val ids = spark.range(40).select(col("id").as("doc_id"))
    val out = Multimodal.decodeFrames(
      spark, Multimodal.synthesizeGifs(spark, ids, "doc_id"), "doc_id", stride = 2)
      .orderBy("doc_id", "frame_idx").collect()
    out.length shouldBe (0L until 40L).map(id => (2 + id % 3 + 1) / 2).sum
    out.foreach { r =>
      val id = r.getLong(0)
      val f = r.getInt(1)
      val (ww, hh) = (1 + id % 6, 1 + id % 4)
      f % 2 shouldBe 0
      r.getInt(2).toLong shouldBe ww
      r.getInt(3).toLong shouldBe hh
      r.getLong(4) shouldBe (0L until ww * hh).map(p => (id * 31 + f * 97 + p) % 256).sum
    }
  }

  test("batch grouping handles partitions larger than BatchSize") {
    import spark.implicits._
    val big = spark.range(3 * Multimodal.BatchSize + 17).select(
      col("id").as("doc_id"), lit("payload").cast("binary").as("media")).repartition(2)
    Multimodal.features(spark, big, "doc_id").count() shouldBe (3 * Multimodal.BatchSize + 17)
  }
}
