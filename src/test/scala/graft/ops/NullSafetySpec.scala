package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Degenerate-input behavior: at corpus scale there is ALWAYS a null
  * text, an empty document, a zero vector, an empty partition. Operators
  * must pass them through or drop them — never throw and kill the job.
  */
class NullSafetySpec extends AnyFunSuite with SparkTestSession with Matchers {

  private def docs(rows: (Long, String)*) = {
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (i, t) => Row(i, t) }: _*),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
  }

  private lazy val dirty = docs(
    (1L, "a normal document with several words here"),
    (2L, null),
    (3L, ""),
    (4L, " "),
    (5L, "a normal document with several words here"))

  test("dedup family tolerates null and empty text") {
    noException should be thrownBy Dedup.exactGroups(dirty, "id", "text").collect()
    noException should be thrownBy
      Dedup.minhashLsh(dirty, "id", "text", k = 3, threshold = 0.5).collect()
    noException should be thrownBy
      Dedup.simhashNearDup(dirty, "id", "text", maxDist = 3, pieces = 4).collect()
    // the two identical real docs still pair up
    Dedup.exactGroups(dirty, "id", "text")
      .filter(col("n_copies") === 2).count() shouldBe 1L
    // exact keeps ONE representative per group INCLUDING the null-text
    // group (md5(null) is null → the semi-join must be null-safe)
    val kept = Dedup.exact(dirty, "id", "text").select("id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 2L, 3L, 4L)
  }

  test("text analysis tolerates null/empty text (null in, null out)") {
    val out = dirty.select(col("id"),
      Text.wsTokenCount(col("text")).as("ws"),
      Text.langId(col("text")).as("lang"),
      Text.fingerprints(col("text")).as("fp"))
    noException should be thrownBy out.collect()
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    byId(2L).isNullAt(1) shouldBe true
    byId(2L).isNullAt(2) shouldBe true
    byId(3L).getString(2) shouldBe "und" // empty text → undetermined, not a crash
  }

  test("ANN tolerates zero vectors and an empty query set") {
    val vecs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
        Row(2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: undefined cosine
        Row(3L, Seq(0.0f, 1.0f, 0.0f, 0.0f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    noException should be thrownBy Ann.bruteForce(
      vecs, "vec_id", "embedding", vecs.filter(col("vec_id") === 1), "vec_id", "embedding", 2).collect()
    val empty = Ann.bruteForce(
      vecs, "vec_id", "embedding", vecs.filter(col("vec_id") < 0), "vec_id", "embedding", 2)
    empty.count() shouldBe 0L
    noException should be thrownBy Ann.ivfTopK(
      vecs, "vec_id", "embedding", vecs.filter(col("vec_id") === 1), "vec_id", "embedding",
      k = 2, nlist = 2, nprobe = 1).collect()
  }

  test("round-5 additions tolerate null/empty text and degenerate strata") {
    // normalized dedup: null normalizes to null (null-safe grouping,
    // same contract as exactGroups); "" and " " normalize to the SAME
    // empty string and must collapse
    val g = Dedup.normalizedGroups(dirty, "id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    g(2L) shouldBe 1L // null group survives alone
    g(3L) shouldBe 2L // "" and " " collapse
    g(1L) shouldBe 2L // the two real duplicates
    // LM scoring: null/empty/1-token docs simply drop out, never throw
    // (" " splits to two empty tokens → one ("","") bigram, identically
    // in Spark and DuckDB, so id=4 legitimately scores)
    val px = Text.lmCrossEntropy(dirty, "id", "text", isTarget = col("id") =!= 2L)
    noException should be thrownBy px.collect()
    px.collect().map(_.getLong(0)).sorted shouldBe Array(1L, 4L, 5L)
    // leak-safe split: every row gets a verdict, null text is its own
    // singleton component
    val sp = Text.leakSafeSplit(dirty, "id", "text", valFrac = 0.5)
    sp.count() shouldBe 5L
    // mixture sampling over a null stratum: null-keyed rows get the
    // default equi-join drop (no match → excluded), real strata sampled
    val src = spark.createDataFrame(
      java.util.Arrays.asList(Row(1L, "a"), Row(2L, null), Row(3L, "a")),
      StructType(Seq(StructField("id", LongType), StructField("src", StringType))))
    noException should be thrownBy
      Text.sampleByMixture(src, "src", "id", alpha = 0.5, budget = 3.0).collect()
  }

  test("retrieval additions tolerate empty rankings, zero vectors and null words") {
    val spark0 = spark
    import spark0.implicits._
    // rrfFuse: an empty ranking contributes nothing; fusing with one
    // empty system degrades to the other system's ranking order
    val sys = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("qid", "id", "rank")
    val none = sys.filter(col("rank") < 0)
    Ann.rrfFuse(Seq(sys, none), k = 5).orderBy("rank")
      .collect().map(_.getLong(1)).toSeq shouldBe Seq(10L, 11L)
    Ann.rrfFuse(Seq(none), k = 5).count() shouldBe 0L
    // maxSimToSet: zero vectors (NaN cosine) never throw; empty ref set
    // → no rows rather than a crash
    val vecs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(0.0f, 0.0f)), Row(97L * 0, Seq(0.5f, 0.5f))),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    noException should be thrownBy Ann.maxSimToSet(
      vecs.filter(col("vec_id") > 0), "vec_id", "embedding",
      vecs.filter(col("vec_id") === 0), "vec_id", "embedding").collect()
    Ann.maxSimToSet(vecs, "vec_id", "embedding",
      vecs.filter(col("vec_id") < 0), "vec_id", "embedding").count() shouldBe 0L
    // BPE encode: null word → null tokens (no throw), empty word → []
    val enc = Seq[(java.lang.Long, String)]((1L, "ab"), (2L, null), (3L, ""))
      .toDF("id", "word")
      .select(col("id"), Bpe.encode(col("word"), Seq(("a", "b"))).as("t"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    enc(1L).get.asInstanceOf[scala.collection.Seq[String]].toSeq shouldBe Seq("ab")
    enc(2L) shouldBe None
    enc(3L).get.asInstanceOf[scala.collection.Seq[String]].toSeq shouldBe Seq.empty
  }

  test("round-7 curation ops tolerate null/empty text, urls and strata") {
    // canonicalUrl / urlHost: null in → null / empty out, never a throw
    val urls = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "HTTP://WWW.A.io:80/x?b=2&a=1#f"), Row(2L, null), Row(3L, ""), Row(4L, "   ")),
      StructType(Seq(StructField("id", LongType), StructField("u", StringType))))
    val cu = urls.select(col("id"), Text.canonicalUrl(col("u")).as("c"),
        Text.urlHost(col("u")).as("h")).collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    cu(1L) shouldBe (Some("http://a.io/x?a=1&b=2"), Some("a.io"))
    cu(2L)._1 shouldBe None
    cu(3L) shouldBe (Some(""), Some(""))
    cu(4L) shouldBe (Some(""), Some(""))

    // adaptiveQualityFilter: null text (null score) and null stratum
    // rows are dropped, never a throw; real strata unaffected
    val strat = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "a", "w w w w"), Row(2L, "a", "w w w w w w w w"),
        Row(3L, "a", null), Row(4L, null, "w w w w")),
      StructType(Seq(StructField("id", LongType), StructField("src", StringType),
        StructField("text", StringType))))
    val kept = Text.adaptiveQualityFilter(strat, "id", "text", "src", q = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 2L) // ceil(0.5*2)=1 → cutoff = min score of the 2 scored rows

    // weightedSample: zero/negative weights yield -inf/NaN-free keys?
    // ln(u) < 0 so w <= 0 flips/zeroes the key — op contract: weights
    // must be > 0; null weights must not throw, they sort deterministic
    noException should be thrownBy
      Text.weightedSample(dirty.withColumn("w", lit(null).cast("double")),
        "id", col("w"), k = 2).collect()

    // vocabCoverage: null text contributes nothing, never a throw
    Text.vocabCoverage(dirty, "text", topN = 100)
      .agg(sum("n_occurrences")).head().getLong(0) should be > 0L

    // sourceOverlap: null keys/sources fall out of the distinct+join
    val keyed = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("k1", "s1"), Row("k1", "s2"), Row(null, "s1"), Row("k2", null)),
      StructType(Seq(StructField("k", StringType), StructField("s", StringType))))
    val ov = Dedup.sourceOverlap(keyed, "k", "s").collect()
    ov.length shouldBe 1
    ov.head.getString(0) shouldBe "s1"
    ov.head.getString(1) shouldBe "s2"
  }

  test("multimodal tolerates empty and null blobs") {
    val media = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, Array.emptyByteArray), Row(2L, Array[Byte](1, 2, 3)), Row(3L, null)),
      StructType(Seq(StructField("doc_id", LongType), StructField("media", BinaryType))))
    val f = Multimodal.features(spark, media, "doc_id").collect()
    f.length shouldBe 2 // null-media rows dropped, not a stage failure
    noException should be thrownBy
      Multimodal.resize(spark, media, "doc_id", 2).collect()
    Multimodal.sampleFrames(spark, media, "doc_id", frameBytes = 2, stride = 1)
      .count() shouldBe 1L
  }

  test("round-8 ops tolerate null text/keys/hashes and empty inputs") {
    import spark.implicits._
    // edit-distance join: null + short strings filtered, never thrown
    noException should be thrownBy
      Dedup.editDistanceJoin(dirty, "id", "text", maxDist = 2).collect()
    Dedup.editDistanceJoin(dirty, "id", "text", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))) shouldBe Array((1L, 5L))
    // empty input → empty output, no aggregation failure
    Dedup.editDistanceJoin(docs(), "id", "text", maxDist = 1).count() shouldBe 0
    // hamming pairs: null hashes drop
    val sigs = Seq((1L, Some(5L)), (2L, Some(5L)), (3L, None))
      .toDF("id", "h")
    Dedup.hammingPairs(sigs, "id", "h", maxDist = 1).count() shouldBe 1
    // SCD2: null attrs collapse null-safely (covered in ScdSpec); null
    // timestamps in the PIT probe keep left rows with null payload
    val dim = Scd.buildType2(
      Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a"))
        .toDF("k", "t", "id", "attr"), "k", "t", Seq("attr"), "id")
    val facts = Seq(
      (10L, 1L, Some(java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))),
      (11L, 1L, None)).toDF("fid", "k", "t")
    val pit = Scd.pointInTime(facts, "t", dim, "k", Seq("attr"))
      .orderBy("fid").collect().map(r => Option(r.getAs[String]("attr")))
    pit shouldBe Array(Some("a"), None)
    // probes: null features excluded (ProbeSpec); empty corpus refuses
    // loudly rather than emitting NaN coefficients
    an[Exception] should be thrownBy
      Probe.ridgeFit(Seq.empty[(Array[Float], Double)].toDF("v", "y"),
        "v", col("y"), lambda = 1.0)
  }

  test("round-9 ops tolerate null text/sources/values and empty inputs") {
    import spark.implicits._
    // span coverage: null text/source rows drop; short docs count in
    // totals without producing grams; empty input → empty output
    val docs9 = Seq(
      (1L, Option("s"), Option("a b c d e f")),
      (2L, Option("s"), Option("a b c d e g")),
      (3L, Option("s"), None),
      (4L, None, Option("x y z w v u")),
      (5L, Option("s"), Option("tiny"))).toDF("id", "src", "text")
    val cov = Text.spanCoverage(docs9, "id", "text", "src", n = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    cov shouldBe Array(("s", 3L, 13L, 10L)) // docs 1,2 share "a b c d e"
    Text.spanCoverage(Seq.empty[(Long, String, String)].toDF("id", "src", "text"),
      "id", "text", "src", n = 5).count() shouldBe 0
    // MadStream: null values/types drop at the histogram; a 1-row type
    // degenerates to med = value, mad = 0 without dividing by zero
    val hist = graft.streaming.MadStream.valueHistogram(Seq(
      (Option("a"), Option(5.0)), (Option("a"), Option(7.0)),
      (Option("b"), Option(3.0)), (None, Option(1.0)), (Option("c"), None))
      .toDF("event_type", "value"))
    val stats = graft.streaming.MadStream.robustStats(hist)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    stats("a") shouldBe ((2L, 6.0, 1.0))
    stats("b") shouldBe ((1L, 3.0, 0.0))
    stats.keySet shouldBe Set("a", "b")
    // audio fingerprint: null blobs drop (the decodeAudio contract)
    val media = Seq((1L, Option(Multimodal.synthWav(1L))), (2L, None))
      .toDF("doc_id", "media")
    Multimodal.audioPhash(spark, media, "doc_id").count() shouldBe 1
  }

  test("connected components and mergeComponents drop null-endpoint edges instead of labeling null") {
    val spark0 = spark
    import spark0.implicits._
    // a pair with a null side is not an edge: neither endpoint of the
    // broken row becomes a node, and no (null, null) label row appears
    val pairs = Seq((Option(1L), Option(2L)), (Option(3L), None),
      (None, Option(4L)), (Option(2L), Option(5L)))
      .toDF("id_a", "id_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    labels shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 1L)
    // incremental maintenance: a null edge in a CDC batch is dropped,
    // never folded into the running labeling as junk state
    val merged = Dedup.mergeComponents(
      Seq((1L, 1L), (2L, 1L), (5L, 1L)).toDF("id", "comp"),
      Seq((Option(5L), Option(6L)), (Option(7L), None))
        .toDF("id_a", "id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    merged shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L)
  }

  test("r13 curation ops tolerate null/empty text (null in, null out; empty is data)") {
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(1L, "plain ordinary words here for the shape rules to like today"),
        Row(2L, null), Row(3L, "")),
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    // gopherRules: null text → null facets and null pass, never a throw;
    // empty text is a real (1-token) doc that fails minWords
    val g = Text.gopherRules(docs, "id", "text", minWords = 5)
      .orderBy("id").collect()
    Option(g(1).get(g(1).fieldIndex("gopher_pass"))) shouldBe None
    g(2).getAs[Boolean]("gopher_pass") shouldBe false
    g(0).getAs[Boolean]("gopher_pass") shouldBe true
    // the Column form agrees on the null row too
    val p = docs.withColumn("p", Text.gopherPass(col("text"), minWords = 5))
      .orderBy("id").collect().map(r => Option(r.get(r.fieldIndex("p"))))
    p.toSeq shouldBe Seq(Some(true), None, Some(false))
    // termBlocklistFlag: null → null hits/flag; empty → 0 hits
    val b = Text.termBlocklistFlag(docs, "id", "text", Seq("plain"))
      .orderBy("id").collect()
    b(0).getAs[Int]("n_hits") shouldBe 1
    Option(b(1).get(b(1).fieldIndex("blocked"))) shouldBe None
    b(2).getAs[Int]("n_hits") shouldBe 0
  }
}
