package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Round-7 curation operators: adaptive quality thresholding, weighted
  * sampling without replacement, vocabulary coverage, cross-source
  * overlap, URL canonicalization.
  */
class CurationSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._
  import scala.jdk.CollectionConverters._

  private def urls(us: String*) =
    SparkTestSession.session.createDataFrame(
      us.zipWithIndex.map { case (u, i) => Row(i.toLong, u) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("url", StringType))))

  private def canon(u: String): String =
    urls(u).select(Text.canonicalUrl(col("url"))).head().getString(0)

  test("native alnum_space_count / space_token_count equal their regex/split twins on adversarial strings") {
    // the SQL oracles keep the regexp_replace / split spellings — these
    // native one-byte-pass twins must agree on EVERY input class:
    // multi-byte unicode, runs of spaces, leading/trailing spaces,
    // punctuation-only, empty, tabs/newlines (NOT in the class)
    val cases = Seq(
      "hello world", "  doubled  spaces  ", "čžß→𝒳 mixed ascii123",
      "", " ", "tabs\tand\nnewlines", "!@#$%^&*()", "a",
      "ünïcödé wörds", "𝒳𝒴𝒵", "trailing space ", " leading")
    val df = SparkTestSession.session.createDataFrame(
      cases.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val rows = df.select(
      graft.functions.FunctionDefs.call("alnum_space_count", col("t")).as("na"),
      org.apache.spark.sql.functions.length(
        regexp_replace(col("t"), "[^A-Za-z0-9 ]", "")).as("ra"),
      graft.functions.FunctionDefs.call("space_token_count", col("t")).as("nw"),
      org.apache.spark.sql.functions.size(split(col("t"), " ")).as("rw")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      withClue(s"input '$c': ") {
        r.getInt(0) shouldBe r.getInt(1)
        r.getInt(2) shouldBe r.getInt(3)
      }
    }
    // null in, null out
    val nr = df.select(graft.functions.FunctionDefs.call("alnum_space_count",
      lit(null).cast("string"))).head()
    nr.isNullAt(0) shouldBe true
  }

  test("native letter_count / upper_count / run_token_count equal their regex twins (r12)") {
    // the boilerplate-filter hot path (keepLine) — same twin contract:
    // the oracle keeps regexp_replace / split(trim, " +"), the engine
    // runs byte loops; must agree on every input class
    val cases = Seq(
      "Home | About", "SUBSCRIBE NOW AND CLICK HERE TODAY", "",
      " ", "   ", "a", " leading", "trailing ", "  both  sides  ",
      "ünïcödé MIXED case", "𝒳𝒴𝒵", "12345 --- !!!",
      "tabs\tkeep\truns", "AB cd EF gh", "multi  spaced   words")
    val df = SparkTestSession.session.createDataFrame(
      cases.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("t", StringType))))
    val rows = df.select(
      graft.functions.FunctionDefs.call("letter_count", col("t")).as("nl"),
      org.apache.spark.sql.functions.length(
        regexp_replace(col("t"), "[^A-Za-z]", "")).as("rl"),
      graft.functions.FunctionDefs.call("upper_count", col("t")).as("nu"),
      org.apache.spark.sql.functions.length(
        regexp_replace(col("t"), "[^A-Z]", "")).as("ru"),
      graft.functions.FunctionDefs.call("run_token_count", col("t")).as("nt"),
      org.apache.spark.sql.functions.size(
        split(trim(col("t")), " +")).as("rt"),
      graft.functions.FunctionDefs.call("alnum_token_count", col("t")).as("na"),
      org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.filter(
        split(trim(col("t")), " +"),
        w => w.rlike("[A-Za-z0-9]"))).as("ra")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      withClue(s"input '$c': ") {
        r.getInt(0) shouldBe r.getInt(1)
        r.getInt(2) shouldBe r.getInt(3)
        r.getInt(4) shouldBe r.getInt(5)
        r.getInt(6) shouldBe r.getInt(7)
      }
    }
  }

  test("entropy signals: hand-computed values, non-ASCII byte semantics, compression-ratio ordering") {
    val rows = Seq(
      (1L, "aaaa"),           // 1 symbol: entropy 0, top frac 1
      (2L, "abab"),           // 2 symbols equal: entropy 1 bit
      (3L, "abcd"),           // 4 symbols equal: entropy 2 bits
      (4L, "ß"))              // U+00DF = 2 UTF-8 bytes (0xC3 0x9F): BYTE semantics
    val df = SparkTestSession.session.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val out = Text.entropySignals(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    out(1L).getDouble(4) shouldBe 0.0
    out(1L).getDouble(3) shouldBe 1.0
    out(2L).getDouble(4) shouldBe 1.0
    out(3L).getDouble(4) shouldBe 2.0
    out(3L).getInt(2) shouldBe 4
    // ß: one CHARACTER (n_chars = length = 1) but two distinct BYTES,
    // each once → byte entropy 1 bit; documents the byte-level contract
    out(4L).getLong(1) shouldBe 1L
    out(4L).getInt(2) shouldBe 2
    out(4L).getDouble(4) shouldBe 1.0

    // compression ratio: repetitive text compresses far below prose,
    // incompressible-ish random hex sits highest; empty → 1.0, null → null
    val texts = Seq(
      (1L, "spam " * 400),
      (2L, "the quick brown fox jumps over the lazy dog and then discusses " +
        "varied topics at considerable length with many distinct words " * 8),
      (3L, (1 to 200).map(i => (i * 2654435761L % 4096).toHexString).mkString(" ")),
      (4L, ""), (5L, null.asInstanceOf[String]))
    val cdf = SparkTestSession.session.createDataFrame(
      texts.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val cr = cdf.select(col("id"), Text.compressionRatio(col("text")).as("r")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double])).toMap
    cr(1L).get should be < cr(2L).get
    cr(2L).get should be < cr(3L).get
    cr(4L).get shouldBe 1.0
    cr(5L) shouldBe None
  }

  test("canonicalUrl: scheme+host lowercase, www/default-port/fragment/tracking stripped, params sorted") {
    canon("HTTP://WWW.Example.COM:80/Path/X?utm_source=a&b=2&a=1#frag") shouldBe
      "http://example.com/Path/X?a=1&b=2"
    // path case preserved, non-default port kept, empty query dropped
    canon("https://Example.com:8080/A/B/?utm_campaign=x") shouldBe
      "https://example.com:8080/A/B"
    // root path collapses, :443 stripped
    canon("HTTPS://example.com:443/") shouldBe "https://example.com"
    // ref/fbclid/gclid are tracking params; repeated & runs survive as empties and are dropped
    canon("http://a.io/p?ref=x&&fbclid=1&gclid=2&z=9&y=8") shouldBe
      "http://a.io/p?y=8&z=9"
    // malformed (no scheme): lowercased passthrough, never a throw
    canon("  Not A Url  ") shouldBe "not a url"
  }

  test("urlHost: canonical host; empty for schemeless input") {
    val r = urls("HTTP://WWW.Foo.ORG:80/x", "garbage")
      .select(Text.urlHost(col("url"))).collect().map(_.getString(0))
    r shouldBe Array("foo.org", "")
  }

  test("adaptiveQualityFilter: per-stratum discrete-percentile cutoff keeps >= ceil(q*n) semantics") {
    // stratum A: 4 docs with distinct scores; q=0.5 → cutoff = 2nd-smallest score
    // texts sized so qualityScore orders them deterministically
    val rows = Seq(
      (0L, "a", "x x"), (1L, "a", "x x x x"), (2L, "a", "x x x x x x"),
      (3L, "a", "x x x x x x x x"),
      (4L, "b", "y y"), (5L, "b", "y y y y"))
    val df = spark.createDataFrame(rows.map { case (i, s, t) => Row(i, s, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("src", StringType),
        StructField("text", StringType))))
    val kept = Text.adaptiveQualityFilter(df, "id", "text", "src", q = 0.5)
      .select("id").collect().map(_.getLong(0)).sorted
    // a: scores rise with word count; ceil(0.5*4)=2 → cutoff = score of id 1 → keep 1,2,3
    // b: ceil(0.5*2)=1 → cutoff = smaller score (id 4) → keep both
    kept shouldBe Array(1L, 2L, 3L, 4L, 5L)
  }

  test("weightedSample: deterministic, without replacement, k caps at n, heavier rows win expectation") {
    val df = spark.range(200).select(col("id"),
      (col("id") % 10 + 1).cast("double").as("w"))
    val s1 = Text.weightedSample(df, "id", col("w"), k = 50)
      .select("id").collect().map(_.getLong(0))
    val s2 = Text.weightedSample(df, "id", col("w"), k = 50)
      .select("id").collect().map(_.getLong(0))
    s1 shouldBe s2                       // deterministic under re-run
    s1.distinct.length shouldBe 50       // without replacement
    Text.weightedSample(df, "id", col("w"), k = 500).count() shouldBe 200
    // weight-monotone in expectation: the top-weight decile should be
    // overrepresented vs the bottom decile in a 50/200 draw
    val byW = df.filter(col("id").isin(s1.map(Long.box): _*))
      .groupBy("w").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    byW.getOrElse(10.0, 0L) should be > byW.getOrElse(1.0, 0L)
  }

  test("vocabCoverage: ranks total-ordered, counts exact, coverage reaches 1 when topN >= vocab") {
    val df = spark.createDataFrame(
      Seq(Row(0L, "a a a b b c"), Row(1L, "a b d")).asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))
    val r = Text.vocabCoverage(df, "text", topN = 10)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getLong(2), x.getDouble(3)))
    r.map(_._2) shouldBe Array("a", "b", "c", "d") // count desc, token asc
    r.map(_._3) shouldBe Array(4L, 3L, 1L, 1L)
    r.last._4 shouldBe 1.0
    // head-only cut keeps the same prefix
    Text.vocabCoverage(df, "text", topN = 2).collect().map(_.getString(1)) shouldBe
      Array("a", "b")
  }

  test("sourceOverlap: hand-computed matrix on a 3-source key table") {
    // A={k1,k2,k3}, B={k2,k3,k4}, C={k9}: A∩B=2, A∩C=B∩C=0 (absent rows)
    val keyed = spark.createDataFrame(
      Seq(("k1", "A"), ("k2", "A"), ("k3", "A"), ("k2", "A"), // dup collapses
        ("k2", "B"), ("k3", "B"), ("k4", "B"), ("k9", "C"))
        .map { case (k, s) => Row(k, s) }.asJava,
      StructType(Seq(StructField("k", StringType), StructField("s", StringType))))
    val m = Dedup.sourceOverlap(keyed, "k", "s").collect()
    m.length shouldBe 1
    val r = m.head
    (r.getString(0), r.getString(1), r.getLong(2)) shouldBe ("A", "B", 2L)
    r.getDouble(3) shouldBe (2.0 / 3.0 +- 1e-6) // frac_of_a
    r.getDouble(4) shouldBe (2.0 / 3.0 +- 1e-6) // frac_of_b
  }

  test("reservoirByStrata: exact k, local window replay, repartition-invariant, short strata kept whole") {
    val rows = (1L to 300L).map(i => (i, if (i <= 290) "big" else "small")) // small has 10 < k
    val df = spark.createDataFrame(
      rows.map { case (i, s) => Row(i, s) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("src", StringType))))
    val out = Text.reservoirByStrata(df, "src", "id", k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    out.count(_._1 == "big") shouldBe 25
    out.count(_._1 == "small") shouldBe 10 // fewer rows than k → all kept
    // local replay: k smallest draws per stratum, draw = (id*A') mod p
    def draw(i: Long): Long = (i % 1000000007L) * (2654435761L % 1000000007L) % 1000000007L
    val expectBig = rows.filter(_._2 == "big").map(_._1)
      .sortBy(i => (draw(i), i)).take(25).toSet
    out.filter(_._1 == "big").map(_._2).toSet shouldBe expectBig
    out.foreach { case (_, i, d) => d shouldBe draw(i) }
    // partitioning must not change the sample
    val re = Text.reservoirByStrata(df.repartition(7), "src", "id", k = 25)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    re shouldBe out.map(t => (t._1, t._2)).toSet
    // the heap is map-side: partial_topk before the stratum shuffle
    Text.reservoirByStrata(df, "src", "id", k = 25)
      .queryExecution.executedPlan.toString should include("partial_topk_by_score")
  }
}
