package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TextSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private def one(text: String) = {
    import scala.jdk.CollectionConverters._
    SparkTestSession.session.createDataFrame(
      Seq(org.apache.spark.sql.Row(1L, text)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
  }

  test("token counts: whitespace runs collapse, BPE-ish splits punctuation and digits") {
    val df = one("Hello,  world!  I have 42 apples.")
    val r = df.select(
      Text.wsTokenCount(col("text")),
      Text.bpeishTokenCount(col("text"))).head()
    r.getInt(0) shouldBe 6
    // Hello , world ! I have 42 apples . → 9
    r.getInt(1) shouldBe 9
  }

  test("quality facets on a known string") {
    val r = Text.quality(one("the cat sat on a mat"), "id", "text").head()
    r.getAs[Int]("n_chars") shouldBe 20
    r.getAs[Int]("n_words") shouldBe 6
    r.getAs[Double]("avg_word_len") shouldBe 2.5 // 15 letters / 6 words
    r.getAs[Double]("stop_ratio") shouldBe 0.5 // the, on, a
    r.getAs[Double]("alnum_ratio") shouldBe 1.0
  }

  test("repetition signals on known strings") {
    // "a a a b": top word 3/4, dup fraction (4-2)/4, 3-grams "a a a"/"a a b" unique
    val r1 = Text.repetition(one("a a a b"), "id", "text").head()
    r1.getAs[Long]("n_words") shouldBe 4L
    r1.getAs[Double]("top_word_frac") shouldBe 0.75
    r1.getAs[Double]("dup_word_frac") shouldBe 0.5
    r1.getAs[Double]("dup_3gram_frac") shouldBe 0.0
    // a fully-repeated loop: every 3-gram occurs more than once
    val r2 = Text.repetition(one("x y z x y z x y z"), "id", "text").head()
    r2.getAs[Double]("dup_3gram_frac") shouldBe 1.0
    r2.getAs[Double]("top_word_frac") shouldBe 0.3333
    // all-distinct text: zero repetition everywhere
    val r3 = Text.repetition(one("p q r s t u"), "id", "text").head()
    r3.getAs[Double]("top_word_frac") shouldBe 0.1667
    r3.getAs[Double]("dup_word_frac") shouldBe 0.0
    r3.getAs[Double]("dup_3gram_frac") shouldBe 0.0
    // shorter than n: no 3-grams → 0 by convention, words still counted
    val r4 = Text.repetition(one("w w"), "id", "text").head()
    r4.getAs[Double]("dup_word_frac") shouldBe 0.5
    r4.getAs[Double]("dup_3gram_frac") shouldBe 0.0
  }

  test("language ID picks the profile language; gibberish → und") {
    val cases = Seq(
      "the cat is in the house and it was warm" -> "en",
      "el perro y la casa de un amigo con los gatos" -> "es",
      "der hund und die katze ist ein tier mit den anderen" -> "de",
      "le chat et les chiens dans une maison pour qui" -> "fr",
      // r13 breadth: the widened profile set, incl. the non-ASCII
      // letters the tokenizer class grew (ã å ç)
      "il gatto non è di una casa che sono anche del cane" -> "it",
      "não é uma casa para ele mas com mais gatos como isso" -> "pt",
      "het is een huis van dat niet met voor zijn maar" -> "nl",
      "och att det som är på för med inte huset" -> "sv",
      "og at til er ikke jeg han hun den har" -> "da",
      "nie jest jak ale czy dla tak ten przez oraz" -> "pl",
      "yang dan itu dengan untuk tidak ini dari akan pada" -> "id",
      "bir ve bu için ile olarak çok daha gibi ama" -> "tr",
      "zzz qqq xxx www" -> "und")
    cases.foreach { case (text, expected) =>
      withClue(text) {
        one(text).select(Text.langId(col("text"))).head().getString(0) shouldBe expected
      }
    }
  }

  test("script-aware language ID: every pinned plant labels correctly, routing edges hold") {
    def idOf(text: String): String =
      one(text).select(Text.langIdScript(col("text"))).head().getString(0)
    // the tx_langid fixture sentences — ru/uk/bg via Cyrillic stopwords,
    // el by script, ar/fa via Arabic-script stopwords, hi via
    // Devanagari, zh/ja/ko by CJK block evidence
    graft.queries.Pipeline.langPlants.foreach { case (lang, sent) =>
      withClue(sent) { idOf(sent) shouldBe lang }
    }
    // Latin routing delegates to the existing profiles unchanged
    idOf("the cat is in the house and it was warm") shouldBe "en"
    idOf("le chat et les chiens dans une maison pour qui") shouldBe "fr"
    // dominant script with zero stopword hits → und (the langId contract)
    idOf("щжх фыва юэъ") shouldBe "und"
    idOf("zzz qqq xxx www") shouldBe "und"
    // no letters of any script at all → und
    idOf("123 456 !!!") shouldBe "und"
    // CJK block evidence: kana beats han (ja), hangul-majority is ko,
    // pure ideographs are zh
    idOf("日本語です") shouldBe "ja"   // han + hiragana
    idOf("中文文本") shouldBe "zh"     // han only
    idOf("한국어 문장") shouldBe "ko"  // hangul only
    // null in, null out (not "zh" — the when-chain otherwise trap)
    import spark.implicits._
    Seq[(Long, String)]((1L, null)).toDF("id", "text")
      .select(Text.langIdScript(col("text"))).head().isNullAt(0) shouldBe true
  }

  test("gopherRules: shape facets computed exactly, pass flag at thresholds") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again\nplain second line of ordinary prose here now"),
      (2L, "• alpha beta\n• gamma delta\n• epsilon zeta\nwaiting ...\n# # # #")
    ).toDF("id", "text")
    val got = Text.gopherRules(df, "id", "text", minWords = 5)
      .orderBy("id").collect()
    // doc 1: clean prose — 17 space-tokens, every facet in range
    got(0).getAs[Int]("n_words") shouldBe 17
    // 77 word chars (94 total − 16 spaces − 1 newline) / 17 tokens —
    // the newline is NOT a word char (the r13 ADVICE multi-line drift)
    got(0).getAs[Double]("avg_word_len") shouldBe 4.5294
    got(0).getAs[Double]("alpha_word_frac") shouldBe 1.0
    got(0).getAs[Double]("bullet_line_frac") shouldBe 0.0
    got(0).getAs[Double]("ellipsis_line_frac") shouldBe 0.0
    got(0).getAs[Double]("symbol_ratio") shouldBe 0.0
    got(0).getAs[Boolean]("gopher_pass") shouldBe true
    // doc 2: 3 of 5 lines bullet-led, one "..." line, 4 '#' over 11
    // tokens, 6 of 11 tokens letter-bearing — fails on three rules
    got(1).getAs[Int]("n_words") shouldBe 11
    got(1).getAs[Double]("bullet_line_frac") shouldBe 0.6
    got(1).getAs[Double]("ellipsis_line_frac") shouldBe 0.2
    got(1).getAs[Double]("symbol_ratio") shouldBe 0.3636
    got(1).getAs[Double]("alpha_word_frac") shouldBe 0.5455
    got(1).getAs[Boolean]("gopher_pass") shouldBe false
  }

  test("gopherPass / termBlocked Column forms equal the DataFrame forms row-for-row") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again\nplain second line of ordinary prose here now"),
      (2L, "• alpha beta\n• gamma delta\n• epsilon zeta\nwaiting ...\n# # # #"),
      (3L, "Spark and VECTOR stuff in a sentence long enough to pass the shape rules today")
    ).toDF("id", "text")
    val viaDf = Text.gopherRules(df, "id", "text", minWords = 5)
      .orderBy("id").collect().map(_.getAs[Boolean]("gopher_pass")).toSeq
    val viaCol = df.withColumn("p", Text.gopherPass(col("text"), minWords = 5))
      .orderBy("id").collect().map(_.getAs[Boolean]("p")).toSeq
    viaCol shouldBe viaDf
    val terms = Seq("spark", "vector", "hash")
    val bDf = Text.termBlocklistFlag(df, "id", "text", terms)
      .orderBy("id").collect().map(_.getAs[Boolean]("blocked")).toSeq
    val bCol = df.withColumn("b", Text.termBlocked(col("text"), terms))
      .orderBy("id").collect().map(_.getAs[Boolean]("b")).toSeq
    bCol shouldBe bDf
    bCol shouldBe Seq(false, false, true)
  }

  test("termBlocklistFlag: occurrence counts over lowercase alnum tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, "Spark and VECTOR stuff"),
      (2L, "a clean document"),
      (3L, "hash-hash hash")).toDF("id", "text")
    val got = Text.termBlocklistFlag(df, "id", "text",
      Seq("spark", "vector", "hash")).orderBy("id").collect()
    got.map(_.getAs[Int]("n_hits")).toSeq shouldBe Seq(2, 0, 3)
    got.map(_.getAs[Boolean]("blocked")).toSeq shouldBe Seq(true, false, true)
    intercept[IllegalArgumentException] {
      Text.termBlocklistFlag(df, "id", "text", Seq.empty)
    }
  }

  test("winnowing fingerprints: deterministic, shared substrings share prints") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    def fps(t: String): Set[Long] =
      one(t).select(Text.fingerprints(col("text")).as("f")).head().getSeq[Long](0).toSet
    fps(base) shouldBe fps(base) // deterministic
    val shifted = "prefix words here " + base
    fps(base).intersect(fps(shifted)) should not be empty // shared long substring
    val unrelated = "one two three four five six seven eight nine ten eleven twelve thirteen"
    fps(base).intersect(fps(unrelated)) shouldBe empty
  }

  test("fingerprints tolerate short documents") {
    one("two words").select(org.apache.spark.sql.functions.size(Text.fingerprints(col("text")))).head().getInt(0) should be >= 1
  }

  test("sampleByStrata: deterministic, rate-monotone, exact at the extremes") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = (0L until 1000L).map(i => Row(if (i % 2 == 0) "en" else "de", i))
    val df = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(rows: _*)),
      StructType(Seq(StructField("lang", StringType), StructField("id", LongType))))
    // rate 1.0 keeps everything in the stratum, rate 0.0 nothing
    val kept = Text.sampleByStrata(df, "lang", "id", Map("en" -> 1.0, "de" -> 0.0))
      .collect().map(_.getLong(1)).toSet
    kept.size shouldBe 500
    kept.forall(_ % 2 == 0) shouldBe true
    // a fractional rate is deterministic across runs and ballpark-sized
    val half = Text.sampleByStrata(df, "lang", "id", Map("en" -> 0.5, "de" -> 0.5))
      .collect().map(_.getLong(1)).toSet
    Text.sampleByStrata(df, "lang", "id", Map("en" -> 0.5, "de" -> 0.5))
      .collect().map(_.getLong(1)).toSet shouldBe half
    half.size.toDouble shouldBe 500.0 +- 100.0
    // a lower rate keeps a subset of the higher rate's rows (same hash)
    val quarter = Text.sampleByStrata(df, "lang", "id", Map("en" -> 0.25, "de" -> 0.25))
      .collect().map(_.getLong(1)).toSet
    quarter.subsetOf(half) shouldBe true
  }

  test("chunk: overlapping windows cover every token at the stride") {
    val out = Text.chunk(one("a b c d e f g h i j"), "id", "text", window = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    // 10 tokens, starts 0,3,6,9 → 4 chunks
    out.length shouldBe 4
    out.map(_.getInt(1)).toSeq shouldBe Seq(0, 1, 2, 3)
    out.map(_.getString(3)).toSeq shouldBe
      Seq("a b c d", "d e f g", "g h i j", "j")
    out.map(_.getInt(2)).toSeq shouldBe Seq(4, 4, 4, 1)
    // window >= tokens → one full chunk
    val one4 = Text.chunk(one("x y z"), "id", "text", window = 16, stride = 12).collect()
    one4.length shouldBe 1
    one4.head.getString(3) shouldBe "x y z"
  }

  test("packByTokenBudget: contiguous budget chunks per shard, oversized doc gets own chunk") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row("en", 1L, "a b c"),          // 3 tokens, cum 3  → chunk 0
        Row("en", 2L, "d e f g"),        // 4 tokens, cum 7  → chunk 0
        Row("en", 3L, "h i j k l m n o p q r s"), // 12 tokens, cum 19 → chunk 1 (floor(7/5)=1)
        Row("en", 4L, "t"),              // 1 token,  cum 20 → chunk 3 (floor(19/5))
        Row("de", 9L, "x y")),           // separate shard restarts at chunk 0
      StructType(Seq(StructField("lang", StringType),
        StructField("doc_id", LongType), StructField("text", StringType))))
    val out = Text.packByTokenBudget(docs, "lang", "doc_id", "text", budget = 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(3)).toMap
    out(("en", 1L)) shouldBe 0L
    out(("en", 2L)) shouldBe 0L
    out(("en", 3L)) shouldBe 1L // starts at cum-exclusive 7 → floor(7/5)
    out(("en", 4L)) shouldBe 3L // after the oversized doc: floor(19/5)
    out(("de", 9L)) shouldBe 0L
    // budget guarantee: a chunk's first doc starts within its budget slot
    Text.packByTokenBudget(docs, "lang", "doc_id", "text", budget = 5)
      .collect().foreach { r =>
        val chunk = r.getLong(3)
        chunk should be >= 0L
      }
  }

  test("bm25TopK matches a locally computed BM25 on a hand corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark shuffle join join"),
      (2L, "spark scan"),
      (3L, "join broadcast join join join"),
      (4L, "filter filter filter filter filter filter")).toDF("doc_id", "text")
    val q = Seq((0L, "join"), (0L, "spark")).toDF("qid", "term")
    val got = Text.bm25TopK(docs, "doc_id", "text", q, "qid", "term", k = 10)
      .collect().map(r => (r.getLong(1), r.getInt(2), r.getDouble(3)))
      .sortBy(_._2)

    // local BM25, same Lucene-variant idf
    val corpus = Map(
      1L -> Seq("spark", "shuffle", "join", "join"),
      2L -> Seq("spark", "scan"),
      3L -> Seq("join", "broadcast", "join", "join", "join"),
      4L -> Seq("filter", "filter", "filter", "filter", "filter", "filter"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.size).sum / n
    def score(id: Long, terms: Seq[String]): Double = terms.map { t =>
      val tf = corpus(id).count(_ == t).toDouble
      if (tf == 0) 0.0
      else {
        val df = corpus.values.count(_.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val dl = corpus(id).size.toDouble
        idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      }
    }.sum
    val expect = corpus.keys.toSeq
      .map(id => id -> score(id, Seq("join", "spark")))
      .filter(_._2 > 0)
      .sortBy { case (id, sc) => (-sc, id) }
    got.map(_._1).toSeq shouldBe expect.map(_._1)
    got.zip(expect).foreach { case ((_, _, g), (_, e)) => g shouldBe e +- 1e-9 }
    // doc 4 contains no query term and must not appear
    got.map(_._1) should not contain 4L
  }

  private def docs(rows: (Long, String)*) = {
    import scala.jdk.CollectionConverters._
    SparkTestSession.session.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
  }

  test("fuzzyMatch: minimum edit distance with lexicographic tie-break, exact matches at dist 0") {
    val spark0 = spark
    import spark0.implicits._
    val dict = Seq("alpha", "beta", "gamma").toDF("name")
    val dirty = Seq(
      (1L, "alpha"),  // exact → dist 0
      (2L, "alph"),   // deletion → alpha, dist 1
      (3L, "betta"),  // insertion → beta, dist 1
      (4L, "gxmma"),  // substitution → gamma, dist 1
      (5L, "zzzzz")   // nothing close: all three at dist 5 → lexicographic tie-break
    ).toDF("id", "s")
    val got = Text.fuzzyMatch(dirty, "id", "s", dict, "name")
      .collect().map(r => r.getLong(0) -> (r.getString(2), r.getInt(3))).toMap
    got(1L) shouldBe ("alpha", 0)
    got(2L) shouldBe ("alpha", 1)
    got(3L) shouldBe ("beta", 1)
    got(4L) shouldBe ("gamma", 1)
    got(5L) shouldBe ("alpha", 5)
    // tie at equal distance breaks to the lexicographically smaller entry
    val tie = Text.fuzzyMatch(Seq((9L, "aeta")).toDF("id", "s"),
      "id", "s", Seq("aeta1", "aeta2").toDF("name"), "name")
      .collect().head
    tie.getString(2) shouldBe "aeta1"
    tie.getInt(3) shouldBe 1
  }

  test("nfc_normalize: composes decomposed sequences, idempotent, resolves from SQL") {
    val spark0 = spark
    import spark0.implicits._
    val decomposed = "e\u0301cole" // e + COMBINING ACUTE
    val composed = "\u00e9cole"    // precomposed e-acute
    val df = Seq(decomposed).toDF("s").select(
      graft.functions.FunctionDefs.call("nfc_normalize", col("s")).as("n"),
      org.apache.spark.sql.functions.length(col("s")).as("raw_len"))
    val row = df.collect().head
    row.getString(0) shouldBe composed
    row.getInt(1) shouldBe composed.length + 1 // the decomposed form is one code point longer
    // idempotent on already-composed text
    Seq(composed).toDF("s")
      .select(graft.functions.FunctionDefs.call("nfc_normalize", col("s")))
      .collect().head.getString(0) shouldBe composed
    // resolves through the SQL registry too
    spark.sql(s"SELECT nfc_normalize('$decomposed') AS n")
      .collect().head.getString(0) shouldBe composed
  }

  test("nfkc_normalize: folds compatibility forms (fullwidth, ligature, superscript), supersets NFC") {
    val spark0 = spark
    import spark0.implicits._
    val cases = Seq(
      "Ａbc" -> "Abc",        // fullwidth A
      "ﬁne" -> "fine",       // fi ligature
      "x²" -> "x2",          // superscript two
      "№ 5" -> "No 5",       // numero sign
      "école" -> "école") // NFKC ⊇ NFC canonical composition
    cases.foreach { case (in, want) =>
      withClue(in) {
        Seq(in).toDF("s")
          .select(graft.functions.FunctionDefs.call("nfkc_normalize", col("s")))
          .collect().head.getString(0) shouldBe want
      }
    }
    // resolves through the SQL registry; ASCII is a fixed point
    spark.sql("SELECT nfkc_normalize('plain ascii') AS n")
      .collect().head.getString(0) shouldBe "plain ascii"
  }

  test("fix_mojibake: heals single and double cp1252 misdecodes, leaves sound text alone") {
    val spark0 = spark
    import spark0.implicits._
    // the LENIENT cp1252 decode real-world mojibake goes through
    // (ftfy's "sloppy windows-1252": the five undefined bytes decode
    // to their C1 controls). Java's own windows-1252 charset maps them
    // to U+FFFD, which destroys the byte and makes the corruption
    // unrecoverable by construction — not the class this op reverses.
    val cp1252Hi =
      "€\u0081‚ƒ„…†‡ˆ‰Š‹Œ\u008DŽ\u008F" +
      "\u0090‘’“”•–—˜™š›œ\u009DžŸ"
    def lenient1252(bytes: Array[Byte]): String = bytes.map { b =>
      val u = b & 0xFF
      if (u >= 0x80 && u <= 0x9F) cp1252Hi.charAt(u - 0x80) else u.toChar
    }.mkString
    def moji(s: String, times: Int): String =
      (1 to times).foldLeft(s)((t, _) => lenient1252(t.getBytes("UTF-8")))
    def fix(in: String): String =
      Seq(in).toDF("s")
        .select(graft.functions.FunctionDefs.call("fix_mojibake", col("s")))
        .collect().head.getString(0)

    val clean = "café résumé — “naïve” ’quoted’ €5"
    fix(moji(clean, 1)) shouldBe clean                   // classic Ã©-class
    fix(moji(clean, 2)) shouldBe clean                   // double-encoded ÃƒÂ©-class
    // mixed corruption depths in ONE string heal per token (a
    // whole-string pass would reject the already-sound half)
    fix(moji("déjà", 1) + " " + moji("vu…", 2)) shouldBe "déjà vu…"
    // sound text is untouched: ASCII, genuine accents, non-Latin
    // scripts (unmappable to cp1252), isolated cp1252-range chars
    // (not valid UTF-8 bytes), and pre-healed output (idempotence)
    Seq("plain ascii text", clean, "Ελλάδα 中文",
        "Ã alone", "AéB").foreach { s =>
      withClue(s)(fix(s) shouldBe s)
    }
    fix(fix(moji(clean, 2))) shouldBe clean
    // the cp1252-undefined bytes (0x81/8D/8F/90/9D) take the latin-1
    // C1-control fallback: U+009D encodes to 0x9D, so the misdecoded
    // RIGHT DOUBLE QUOTATION MARK (E2 80 9D) still heals
    fix("â€\u009D") shouldBe "”"
    // ...while the TRUNCATED two-char prefix is not valid UTF-8 and
    // must stay untouched
    fix("â€") shouldBe "â€"
    // resolves through the SQL registry
    spark.sql("SELECT fix_mojibake('ascii') AS n")
      .collect().head.getString(0) shouldBe "ascii"
  }

  test("readability: hand-counted Flesch inputs and formulas, floors, whitespace and non-ASCII words") {
    val spark0 = spark
    import spark0.implicits._
    def run(s: String) = {
      val r = Text.readability(Seq((1L, s)).toDF("id", "t"), "id", "t").collect().head
      (r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }
    // "The cat sat." → 3 words, 1 sentence, syllables: the=1 cat=1 sat=1
    val (w1, s1, sy1, f1) = run("The cat sat.")
    (w1, s1, sy1) shouldBe ((3L, 1L, 3L))
    f1.get shouldBe (206.835 - 1.015 * 3.0 - 84.6 * 1.0 +- 1e-9)
    // vowel GROUPS not vowels: "beautiful queue" → eau-i-u = 3, ueue = 1
    run("beautiful queue")._3 shouldBe 4L
    // all-consonant tokens take the 1-syllable floor; enders floor to 1
    run("xyz 123")._3 shouldBe 2L
    run("xyz 123")._2 shouldBe 1L
    // tabs/newlines/multi-space all delimit; enders count every .!?
    val (w2, s2, _, _) = run("one\ttwo\nthree   four. Five! Six?")
    (w2, s2) shouldBe ((6L, 3L))
    // non-ASCII words are one-syllable-floor words, never vowels
    run("中文 café")._1 shouldBe 2L
    run("中文")._3 shouldBe 1L
    // empty / whitespace-only → zero words, NULL metrics
    run("   ")._1 shouldBe 0L
    run("   ")._4 shouldBe None
  }

  test("compressionRatio: repetition compresses below prose, junk stays near 1, roundtrip is exact") {
    val spark0 = spark
    import spark0.implicits._
    val prose = "the quality of mercy is not strained it droppeth as the gentle rain " * 8
    val spam = "buy now " * 64
    val junk = { // seeded → deterministic; ~6.5 bits/char defeats zlib
      val r = new scala.util.Random(42)
      (0 until 512).map(_ => r.nextPrintableChar()).mkString
    }
    val df = Seq(("prose", prose), ("spam", spam), ("junk", junk)).toDF("k", "t")
      .select(col("k"), Text.compressionRatio(col("t")).as("r"))
    val r = df.collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    r("spam") should be < r("prose")
    r("prose") should be < r("junk")
    r("junk") should be > 0.5
    r("spam") should be < 0.1
    // inflate(deflate(x)) restores the exact bytes
    val rt = Seq(prose).toDF("t").select(
      graft.functions.st.inflate(
        graft.functions.st.deflate(col("t").cast("binary"))).cast("string"))
      .collect().head.getString(0)
    rt shouldBe prose
    // NULL-safe + empty-text contract
    Seq("").toDF("t").select(Text.compressionRatio(col("t")))
      .collect().head.getDouble(0) shouldBe 1.0
  }

  test("decontaminate: flags exactly the train docs sharing an n-gram with the eval set") {
    val evalSet = docs(100L -> "alpha beta gamma delta")
    val train = docs(
      1L -> "zero alpha beta gamma end",        // shares "alpha beta gamma"
      2L -> "beta gamma delta tail word",       // shares "beta gamma delta"
      3L -> "alpha gamma beta delta scrambled", // no shared 3-gram
      4L -> "completely unrelated words here")
    val r = Text.decontaminate(train, evalSet, "id", "text", n = 3)
      .orderBy("id").collect()
    r.map(_.getAs[Long]("n_hit_grams")).toSeq shouldBe Seq(1L, 1L, 0L, 0L)
    r.map(_.getAs[Int]("contaminated")).toSeq shouldBe Seq(1, 1, 0, 0)
  }

  test("decontaminate: short texts collapse to a whole-doc gram like word_shingles") {
    val evalSet = docs(100L -> "tiny doc")
    val train = docs(1L -> "tiny doc", 2L -> "tiny")
    val r = Text.decontaminate(train, evalSet, "id", "text", n = 3)
      .orderBy("id").collect()
    r.map(_.getAs[Long]("n_hit_grams")).toSeq shouldBe Seq(1L, 0L)
  }

  test("duplicateSpans: counts per-doc distinct n-grams occurring in >=2 docs") {
    val d = docs(
      1L -> "one two three four five",  // spans: 3 distinct 3-grams
      2L -> "zz one two three yy",      // shares "one two three" with doc 1
      3L -> "totally different words here now")
    val r = Text.duplicateSpans(d, "id", "text", n = 3).orderBy("id").collect()
    r.map(_.getAs[Int]("n_spans")).toSeq shouldBe Seq(3, 3, 3)
    r.map(_.getAs[Long]("n_dup_spans")).toSeq shouldBe Seq(1L, 1L, 0L)
  }

  test("duplicateSpans: a span repeated within ONE doc only is not a duplicate") {
    val d = docs(
      1L -> "x y z x y z", // "x y z" twice in the same doc → distinct once
      2L -> "unrelated content entirely")
    val r = Text.duplicateSpans(d, "id", "text", n = 3).orderBy("id").collect()
    r.map(_.getAs[Long]("n_dup_spans")).toSeq shouldBe Seq(0L, 0L)
  }

  test("dsirWeights: matches a brute-force smoothed log-likelihood ratio") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      (1L, "the cat sat", true),
      (2L, "cat cat dog", true),
      (3L, "der hund dog", false),
      (4L, "the the dog hund", false))
    val df = SparkTestSession.session.createDataFrame(
      rows.map { case (i, t, g) => org.apache.spark.sql.Row(i, t, g) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tgt", org.apache.spark.sql.types.BooleanType))))
    val got = Text.dsirWeights(df, "id", "text", isTarget = col("tgt"))
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_tokens"), r.getAs[Double]("dsir_logw")))
    // brute force
    val toks = rows.map { case (i, t, g) => (i, t.split(" ").toSeq, g) }
    val cr = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val ct = toks.filter(_._3).flatMap(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val v = cr.size.toDouble
    val nr = cr.values.sum
    val nt = ct.values.sum
    def lw(w: String) =
      math.log((ct.getOrElse(w, 0.0) + 1) / (nt + v)) - math.log((cr(w) + 1) / (nr + v))
    for ((id, n, w) <- got) {
      val words = toks.find(_._1 == id).get._2
      n shouldBe words.size.toLong
      w shouldBe (math.rint(words.map(lw).sum * 1e4) / 1e4) +- 1e-9
    }
    // target-like docs score higher than raw-only docs
    got.find(_._1 == 2L).get._3 should be > got.find(_._1 == 3L).get._3
  }

  test("tfidfKeywords: scores match a local replay; equal-real scores tie-break by first position") {
    import scala.jdk.CollectionConverters._
    // N=4: in doc 1, 'b' (tf=2, df=2) scores 2·ln(2) and 'a' (tf=1, df=1)
    // scores ln(4) — EQUAL reals from different factorizations; the
    // 4-dp round + first-occurrence tie-break must put 'b' (pos 0)
    // ahead of 'a' (pos 2) deterministically
    val rows = Seq((1L, "b b a c"), (2L, "b c"), (3L, "d d d"), (4L, "e"))
    val df = SparkTestSession.session.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val got = Text.tfidfKeywords(df, "id", "text", k = 3)
      .collect().groupBy(_.getLong(0))
    def kw(id: Long) = got(id).sortBy(_.getInt(1)).map(r => (r.getString(2), r.getDouble(3))).toSeq
    kw(1L).map(_._1) shouldBe Seq("b", "a", "c")
    kw(1L)(0)._2 shouldBe (math.rint(2 * math.log(2) * 1e4) / 1e4) +- 1e-9
    kw(1L)(1)._2 shouldBe (math.rint(math.log(4) * 1e4) / 1e4) +- 1e-9
    kw(1L)(2)._2 shouldBe (math.rint(math.log(2) * 1e4) / 1e4) +- 1e-9
    kw(3L) shouldBe Seq(("d", math.rint(3 * math.log(4) * 1e4) / 1e4))
    kw(4L).map(_._1) shouldBe Seq("e")
  }

  test("leakSafeSplit: near-dup components never straddle the split; extremes are total") {
    import scala.jdk.CollectionConverters._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val rows = Seq(
      1L -> base,
      2L -> base, // exact dup of 1 — same component
      3L -> base.replace("today", "tomorrow"), // near dup of 1/2
      4L -> "completely different words nothing shared at all here truly",
      5L -> "another unrelated document with its own private vocabulary set")
    val df = SparkTestSession.session.createDataFrame(
      rows.map { case (i, t) => org.apache.spark.sql.Row(i, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType))))
    val got = Text.leakSafeSplit(df, "id", "text", k = 3, threshold = 0.5, valFrac = 0.5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    // docs 1,2,3 share one component (transitively) → identical split
    got(1L)._1 shouldBe 1L
    got(2L) shouldBe got(1L)
    got(3L) shouldBe got(1L)
    // singletons are their own component
    got(4L)._1 shouldBe 4L
    got(5L)._1 shouldBe 5L
    // extremes: every row lands on the designated side
    Text.leakSafeSplit(df, "id", "text", valFrac = 0.0)
      .collect().foreach(_.getString(2) shouldBe "train")
    Text.leakSafeSplit(df, "id", "text", valFrac = 1.0)
      .collect().foreach(_.getString(2) shouldBe "val")
  }

  test("leakSafeSplit: default LSH pair path agrees with the exact pair path on the fixture") {
    // the DEFAULT pair generator is banded MinHash-LSH (scale-safe: a
    // hot shingle can't go quadratic); the oracle-replayed path passes
    // the exact jaccardJoin explicitly. On the documents fixture —
    // near-dups are templated rewrites well above the 0.8 threshold —
    // the banded candidates recover every exact pair, so the component
    // labels and split verdicts are IDENTICAL. This pins the txSplit
    // correctness entry's documented claim that using the exact join
    // there tests the same downstream the default runs.
    val docs = graft.sources.Tables.documents(SparkTestSession.session, sfDir)
    val exact = Text.leakSafeSplit(docs, "doc_id", "text",
        k = 3, threshold = 0.8, valFrac = 0.1, salt = 0L,
        pairs = Some(Dedup.jaccardJoin(docs, "doc_id", "text", k = 3, threshold = 0.8)))
      .orderBy("doc_id").collect()
    val viaLsh = Text.leakSafeSplit(docs, "doc_id", "text",
        k = 3, threshold = 0.8, valFrac = 0.1, salt = 0L)
      .orderBy("doc_id").collect()
    viaLsh should contain theSameElementsInOrderAs exact
  }

  test("spanCoverage: positional union over cross-doc duplicated n-grams, per source") {
    import spark.implicits._
    // docs 1 and 2 share the 3-gram "a b c" (cross-doc dup); doc 3
    // repeats its own 3-gram only (within-doc — must NOT count); doc 4
    // is short (< n); doc 5 is clean
    val df = Seq(
      (1L, "s1", "a b c x y"),    // "a b c" dup → positions 0,1,2 covered
      (2L, "s1", "q a b c"),      // positions 1,2,3 covered
      (3L, "s1", "k l m k l m"),  // "k l m" twice IN ONE DOC: df(docs)=1 → no cover
      (4L, "s1", "t u"),          // too short for 3-grams
      (5L, "s2", "p q r s t")     // clean source
    ).toDF("id", "src", "text")
    val got = Text.spanCoverage(df, "id", "text", "src", n = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // s1: 4 docs, 5+4+6+2 = 17 words, covered = 3 (doc1) + 3 (doc2) = 6
    got("s1") shouldBe ((4L, 17L, 6L, math.rint(6.0 / 17.0 * 1e6) / 1e6))
    got("s2") shouldBe ((1L, 5L, 0L, 0.0))
  }

  test("spanCoverage: overlapping duplicated grams union their positions, no double count") {
    import spark.implicits._
    // docs share the 4-word run "a b c d": both 3-grams "a b c" and
    // "b c d" are cross-doc dups; the union covers 4 positions per doc,
    // not 6
    val df = Seq(
      (1L, "s", "a b c d x"),
      (2L, "s", "y a b c d")
    ).toDF("id", "src", "text")
    val r = Text.spanCoverage(df, "id", "text", "src", n = 3).collect().head
    r.getLong(2) shouldBe 10L  // words
    r.getLong(3) shouldBe 8L   // 4 + 4, unioned
  }

  test("scrubSpans: removes cross-doc duplicated spans; within-doc repeats and short docs survive") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c x y"),    // shares "a b c" with doc 2 → loses pos 0-2
      (2L, "q a b c"),      // → loses pos 1-3
      (3L, "k l m k l m"),  // "k l m" twice IN ONE DOC only → untouched
      (4L, "t u"),          // shorter than n → untouched by definition
      (5L, "p q r s t")     // clean
    ).toDF("id", "text")
    val got = Text.scrubSpans(df, "id", "text", n = 3).orderBy("id").collect()
    got.map(_.getAs[String]("text_scrubbed")).toSeq shouldBe
      Seq("x y", "q", "k l m k l m", "t u", "p q r s t")
    got.map(_.getAs[Long]("n_removed")).toSeq shouldBe Seq(3L, 3L, 0L, 0L, 0L)
    got.map(_.getAs[Long]("n_words")).toSeq shouldBe Seq(5L, 4L, 6L, 2L, 5L)
    got.head.getAs[Double]("removed_frac") shouldBe 0.6 +- 1e-9
  }

  test("scrubSpans: overlapping covered intervals merge before excision") {
    import spark.implicits._
    // both 3-grams of the shared 4-word run are dups: the union covers
    // 4 positions per doc, never 6
    val df = Seq(
      (1L, "a b c d x"),
      (2L, "y a b c d")
    ).toDF("id", "text")
    val got = Text.scrubSpans(df, "id", "text", n = 3).orderBy("id").collect()
    got.map(_.getAs[String]("text_scrubbed")).toSeq shouldBe Seq("x", "y")
    got.map(_.getAs[Long]("n_removed")).toSeq shouldBe Seq(4L, 4L)
  }

  test("scrubSpans: disjoint duplicated runs excise separately, full-dup docs scrub to empty") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c mm nn d e f"), // two separated dup runs; middle survives
      (2L, "a b c"),             // exactly n words, fully duplicated → ""
      (3L, "d e f")
    ).toDF("id", "text")
    val got = Text.scrubSpans(df, "id", "text", n = 3).orderBy("id").collect()
    got.map(_.getAs[String]("text_scrubbed")).toSeq shouldBe Seq("mm nn", "", "")
    got.map(_.getAs[Double]("removed_frac")).toSeq shouldBe Seq(0.75, 1.0, 1.0)
  }

  test("gram_hashes: rolling hashes group exactly like the string grams they replace") {
    import graft.functions.FunctionDefs.call
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x a b c d y z w"),   // shares the "a b c d" run with doc 1
      (3L, "ab cd e f g h a b"), // token-boundary trap: "ab cd" ≠ "a b c d"
      (4L, "short doc")          // shorter than n → empty
    ).toDF("id", "text").select(col("id"), split(col("text"), " ").as("ws"))
    // length contract
    val lens = docs.select(col("id"),
      org.apache.spark.sql.functions.size(call("gram_hashes", col("ws"), lit(4))).as("n"))
      .orderBy("id").collect().map(_.getInt(1))
    lens shouldBe Array(5, 5, 5, 0)
    // grouping equivalence: (id, pos) dup sets under rolling hashes ==
    // under the joined-string grams, on every n
    for (n <- Seq(2, 3, 4)) {
      def dups(gram: org.apache.spark.sql.Column): Set[(Long, Int)] = {
        val g = docs.select(col("id"), posexplode(gram).as(Seq("p", "g")))
        val dup = g.groupBy("g").count().filter(col("count") >= 2).select("g")
        g.join(dup, "g").select("id", "p").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSet
      }
      val viaRolling = dups(call("gram_hashes", col("ws"), lit(n)))
      val viaString = dups(expr(
        s"CASE WHEN size(ws) >= $n THEN transform(sequence(0, size(ws) - $n), " +
          s"i -> array_join(slice(ws, i + 1, $n), chr(1))) " +
          "ELSE CAST(array() AS array<string>) END"))
      withClue(s"n=$n") { viaRolling shouldBe viaString }
    }
  }

  test("scrubSpans minLen: n-gram chains gate on total span length with exact boundaries") {
    import spark.implicits._
    // docs 1/2 share a 6-word run (chains across 3-gram boundaries →
    // one [1,7) interval); docs 1/3 share a 4-word run — detected at
    // n = 3 but below the 5-word chain gate, so it must SURVIVE
    val df = Seq(
      (1L, "x a b c d e f y p q r s z"),
      (2L, "k a b c d e f"),
      (3L, "m p q r s")
    ).toDF("id", "text")
    val got = Text.scrubSpans(df, "id", "text", n = 3, minLen = 5)
      .orderBy("id").collect()
    got.map(_.getAs[String]("text_scrubbed")).toSeq shouldBe
      Seq("x y p q r s z", "k", "m p q r s")
    got.map(_.getAs[Long]("n_removed")).toSeq shouldBe Seq(6L, 6L, 0L)
    // minLen = 0 (default) excises both runs — the un-gated semantics
    Text.scrubSpans(df, "id", "text", n = 3).orderBy("id").collect()
      .map(_.getAs[String]("text_scrubbed")).toSeq shouldBe
      Seq("x y z", "k", "m")
    an[IllegalArgumentException] should be thrownBy
      Text.scrubSpans(df, "id", "text", n = 5, minLen = 3)
  }

  test("scrubSpans minLen tangent-merge: rate of the documented over-approximation at n=5 and n=12") {
    import spark.implicits._
    // the chain gate's one over-approximation, measured: two DISTINCT
    // sub-minLen shared substrings (different partner docs) that sit
    // ADJACENT in the host doc merge into one >= minLen chain and are
    // excised together; one intervening word breaks the chain and both
    // survive. A suffix-array implementation would keep the tangent
    // pair — this pins the rate: 100% of tangent-pair positions, 0%
    // once separated, identical at both detection widths.
    val X = (1 to 20).map(i => s"x$i").mkString(" ")
    val Y = (1 to 20).map(i => s"y$i").mkString(" ")
    val T = (1 to 35).map(i => s"t$i").mkString(" ")
    for (n <- Seq(5, 12)) withClue(s"n=$n") {
      val df = Seq(
        (1L, s"h1 $X $Y h2"),     // tangent pair: X immediately before Y
        (2L, s"p1 p2 $X p3"),     // partner sharing only X (20 < 30)
        (3L, s"q1 q2 $Y q3"),     // partner sharing only Y (20 < 30)
        (4L, s"g1 $X gap $Y g2"), // one-word gap: chains stay separate
        (5L, s"r1 $T r2"),        // a TRUE 35-word duplicate
        (6L, s"s1 s2 $T s3")
      ).toDF("id", "text")
      val got = Text.scrubSpans(df, "id", "text", n = n, minLen = 30)
        .orderBy("id").collect()
      val removed = got.map(r => r.getAs[Long]("n_removed"))
      // host: both sub-minLen runs excised (40 = the merged tangent
      // chain); partners + gapped host: fully kept; true dup: exact 35
      removed.toSeq shouldBe Seq(40L, 0L, 0L, 0L, 35L, 35L)
      got(0).getAs[String]("text_scrubbed") shouldBe "h1 h2"
      got(3).getAs[String]("text_scrubbed") shouldBe s"g1 $X gap $Y g2"
      // the corpus-level false-excision rate this fixture pins: only
      // the tangent chain's 40 words are false (no single >= minLen
      // duplicate covers them)
      val falseExcised = removed(0)
      val rate = falseExcised.toDouble / removed.sum
      rate shouldBe (40.0 / 110.0) +- 1e-9
    }
  }

  test("blocklistFlag: exact + dot-anchored subdomain semantics, ports ignored, lookalikes pass") {
    import spark.implicits._
    val urls = Seq(
      (1L, "https://spam.com/x"),          // exact → blocked
      (2L, "https://a.b.spam.com/x"),      // subdomain → blocked
      (3L, "https://notspam.com/x"),       // suffix WITHOUT dot → pass
      (4L, "https://spam.com.evil.io/x"),  // blocked domain as infix → pass
      (5L, "http://WWW.SPAM.COM:8080/x"),  // case + www + port → blocked
      (6L, "https://clean.org/x")
    ).toDF("id", "url")
    val got = Text.blocklistFlag(urls, col("url"), Seq("Spam.COM"))
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    got shouldBe Map(1L -> 1, 2L -> 1, 3L -> 0, 4L -> 0, 5L -> 1, 6L -> 0)
  }

  test("blocklistFlag: suffix-join shape == exists() scan baseline on a randomized corpus") {
    import spark.implicits._
    // domains at depths 1..4, plus lookalike bait in the corpus
    val doms = Seq("io", "spam.com", "ads.track.net", "a.b.c.d")
    val hosts = (1L to 300L).map { i =>
      val h = (i % 11) match {
        case 0 => "spam.com"
        case 1 => s"sub$i.spam.com"
        case 2 => "notspam.com"
        case 3 => "spam.com.evil.org"
        case 4 => s"x$i.ads.track.net"
        case 5 => "track.net"
        case 6 => s"deep$i.a.b.c.d"
        case 7 => s"site$i.io"
        case 8 => s"SITE$i.IO:8443"
        case 9 => "b.c.d"
        case _ => s"clean$i.org"
      }
      (i, s"https://$h/p$i")
    }.toDF("id", "url")
    val viaJoin = Text.blocklistFlag(hosts, col("url"), doms)
      .select("id", "host", "blocked").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    val viaScan = Text.blocklistFlagScan(hosts, col("url"), doms)
      .select("id", "host", "blocked").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    viaJoin shouldBe viaScan
    // the table-shaped entry point agrees too (computed maxDepth)
    val viaTable = Text.blocklistFlagJoin(hosts, col("url"), doms.toDF("d"), "d")
      .select("id", "host", "blocked").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sortBy(_._1)
    viaTable shouldBe viaScan
    // an empty domain table (after null/blank filtering) fails loudly
    val emptyBl = Seq.empty[String].toDF("d")
    an[IllegalArgumentException] should be thrownBy
      Text.blocklistFlagJoin(hosts, col("url"), emptyBl, "d").collect()
    val blankBl = Seq("", null.asInstanceOf[String]).toDF("d")
    an[IllegalArgumentException] should be thrownBy
      Text.blocklistFlagJoin(hosts, col("url"), blankBl, "d").collect()
  }

  test("mixtureRates: α-temperature rates on a hand corpus; sampling honors them exactly") {
    import scala.jdk.CollectionConverters._
    // source a: 4 docs, source b: 1 doc; α=0.5, budget=3
    // tp = √4 + √1 = 3; rate_a = min(1, 3·2/3/4) = 0.5; rate_b = min(1, 3·1/3/1) = 1
    val rows = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"))
    val df = SparkTestSession.session.createDataFrame(
      rows.map { case (i, s) => org.apache.spark.sql.Row(i, s) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.StringType))))
    val rates = Text.mixtureRates(df, "src", alpha = 0.5, budget = 3.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    rates("a") shouldBe 0.5 +- 1e-12
    rates("b") shouldBe 1.0 +- 1e-12
    // α=1 reproduces proportional sampling: every rate = budget/total
    Text.mixtureRates(df, "src", alpha = 1.0, budget = 3.0)
      .collect().foreach(r => r.getDouble(2) shouldBe 0.6 +- 1e-12)
    val kept = Text.sampleByMixture(df, "src", "id", alpha = 0.5, budget = 3.0, salt = 7L)
      .select("id").collect().map(_.getLong(0)).toSet
    // replay the exact integer decision locally
    val expected = rows.filter { case (i, s) =>
      val h = (i * 2654435761L + 7L) % 1000000007L
      h.toDouble < rates(s) * 1000000007.0
    }.map(_._1).toSet
    kept shouldBe expected
    // source b (rate 1.0) always survives in full
    kept should contain(5L)
  }

  test("lmCrossEntropy: matches a brute-force interpolated bigram model") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "the cat sat", true),
      (3L, "der hund bellt laut", false),
      (4L, "x", false)) // single token → no bigrams → absent from output
    val df = SparkTestSession.session.createDataFrame(
      rows.map { case (i, t, g) => org.apache.spark.sql.Row(i, t, g) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("tgt", org.apache.spark.sql.types.BooleanType))))
    val lambda = 0.7
    val got = Text.lmCrossEntropy(df, "id", "text", isTarget = col("tgt"), lambda = lambda)
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_bigrams"), r.getAs[Double]("nll")))
    got.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L)
    // brute force: target-slice counts
    val toks = rows.map { case (i, t, g) => (i, t.split(" ").toSeq, g) }
    val tgt = toks.filter(_._3)
    val cu = tgt.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val cb = tgt.flatMap(_._2.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val n = cu.values.sum
    val vo = cu.size.toDouble
    def p(v: String, w: String) =
      lambda * (cb.getOrElse((v, w), 0.0) + 1) / (cu.getOrElse(v, 0.0) + vo) +
        (1.0 - lambda) * (cu.getOrElse(w, 0.0) + 1) / (n + vo)
    for ((id, nb, nll) <- got) {
      val bgs = toks.find(_._1 == id).get._2.sliding(2).filter(_.size == 2).toSeq
      nb shouldBe bgs.size.toLong
      nll shouldBe (math.rint(-bgs.map(b => math.log(p(b(0), b(1)))).sum * 1e4) / 1e4) +- 1e-9
    }
    // in-domain text is far less surprising than out-of-domain text
    val nllPerBg = got.map(g => g._1 -> g._3 / g._2).toMap
    nllPerBg(2L) should be < nllPerBg(3L)
  }

  test("pii: counts and redaction on known strings, emails before ips") {
    val d = docs(1L ->
      "mail a.user+tag@sub.example.org or b@x.co, host 10.0.0.1 and 192.168.1.255, call +1-555-0199")
    val r = d.select(
      Text.piiCount(col("text"), Text.emailPattern).as("e"),
      Text.piiCount(col("text"), Text.ipv4Pattern).as("i"),
      Text.piiCount(col("text"), Text.phonePattern).as("p"),
      Text.scrubPii(col("text")).as("s")).head()
    r.getAs[Int]("e") shouldBe 2
    r.getAs[Int]("i") shouldBe 2
    r.getAs[Int]("p") shouldBe 1
    r.getAs[String]("s") shouldBe
      "mail <EMAIL> or <EMAIL>, host <IP> and <IP>, call <PHONE>"
  }

  test("pii: plain text and version-ish dotted pairs are untouched") {
    val d = docs(1L -> "release v1.2 of the tool at example.com cost 3.50")
    val r = d.select(Text.scrubPii(col("text")).as("s")).head()
    r.getAs[String]("s") shouldBe "release v1.2 of the tool at example.com cost 3.50"
  }

  test("dedupLines: keep-first global line dedup — later docs AND later within-doc repeats drop") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha line\nunique one\nalpha line"), // 2nd within-doc repeat drops
      (2L, "alpha line\nunique two"),             // loses the line doc 1 owns
      (3L, "solo text")                           // untouched
    ).toDF("id", "text")
    val got = Text.dedupLines(df, "id", "text").orderBy("id").collect()
    got.map(_.getAs[String]("text_dedup")).toSeq shouldBe
      Seq("alpha line\nunique one", "unique two", "solo text")
    got.map(_.getAs[Long]("n_lines")).toSeq shouldBe Seq(3L, 2L, 1L)
    got.map(_.getAs[Long]("n_removed")).toSeq shouldBe Seq(1L, 1L, 0L)
    got.head.getAs[Double]("removed_frac") shouldBe 0.333333 +- 1e-9
  }

  test("dedupLines: keeper is the global (doc, pos) minimum regardless of input order") {
    import spark.implicits._
    // doc 5 arrives "first" in the data but doc 2 owns the min id —
    // the keeper must be (2, 0), so doc 5's copy drops
    val df = Seq(
      (5L, "shared\nfive only"),
      (2L, "shared\ntwo only")
    ).toDF("id", "text")
    val got = Text.dedupLines(df, "id", "text").orderBy("id").collect()
    got.map(r => (r.getAs[Long]("id"), r.getAs[String]("text_dedup"))).toSeq shouldBe
      Seq((2L, "shared\ntwo only"), (5L, "five only"))
    // a doc whose every line is owned elsewhere rewrites to empty
    val df2 = Seq((1L, "only"), (9L, "only")).toDF("id", "text")
    val got2 = Text.dedupLines(df2, "id", "text").orderBy("id").collect()
    got2.map(_.getAs[String]("text_dedup")).toSeq shouldBe Seq("only", "")
    got2.map(_.getAs[Double]("removed_frac")).toSeq shouldBe Seq(0.0, 1.0)
  }

  test("dedupLines: blank lines are structure, not content — exempt from dedup everywhere") {
    import spark.implicits._
    // docs share NO content; their paragraph breaks (empty +
    // whitespace-only lines) must all survive with n_removed = 0
    val df = Seq(
      (1L, "para one\n\npara two"),
      (2L, "other one\n \nother two\n")
    ).toDF("id", "text")
    val got = Text.dedupLines(df, "id", "text").orderBy("id").collect()
    got.map(_.getAs[String]("text_dedup")).toSeq shouldBe
      Seq("para one\n\npara two", "other one\n \nother two\n")
    got.map(_.getAs[Long]("n_removed")).toSeq shouldBe Seq(0L, 0L)
    got.map(_.getAs[Long]("n_lines")).toSeq shouldBe Seq(3L, 4L)
  }

  test("extractHtml: multi-line script/style/comment bodies drop whole (DOTALL)") {
    val d = docs(1L ->
      "<script>\nvar x = 1;\nif (x < 2) { bad(); }\n</script>keep me<style>\n.x {}\n</style><!--\nnote\n-->tail")
    val r = d.select(Text.extractHtml(col("text")).as("s")).head()
    r.getAs[String]("s") shouldBe "keep me tail"
  }

  test("dedupLinesIncremental: history lines drop exactly, batch keep-first applies, blanks exempt") {
    import spark.implicits._
    val history = Seq(
      (100L, "seen before\nhistory only")
    ).toDF("id", "text")
    val batch = Seq(
      (1L, "seen before\nfresh one\n\nfresh one"), // hist drop + batch-repeat drop + blank survives
      (2L, "fresh one\nfresh two"),                // loses "fresh one" to doc 1 (batch-first)
      (3L, "seen before\nhistory only")            // fully in history → scrubs to empty
    ).toDF("id", "text")
    val got = Text.dedupLinesIncremental(history, batch, "id", "text")
      .orderBy("id").collect()
    got.map(_.getAs[String]("text_dedup")).toSeq shouldBe
      Seq("fresh one\n", "fresh two", "")
    got.map(_.getAs[Long]("n_removed_history")).toSeq shouldBe Seq(1L, 0L, 2L)
    got.map(_.getAs[Long]("n_removed_batch")).toSeq shouldBe Seq(1L, 1L, 0L)
    got.map(_.getAs[Long]("n_lines")).toSeq shouldBe Seq(4L, 2L, 2L)
  }

  test("LineHistory.append: appended lines become history for later batches; blanks never enter") {
    import spark.implicits._
    val state = Text.prepareLineHistory(
      Seq((1L, "seen a")).toDF("id", "text"), "text")
    try {
      // fold a batch in (its blank line must NOT enter history)
      state.append(Seq((10L, "fresh one\n\nfresh two")).toDF("id", "text"), "text")
      val got = Text.dedupLinesIncremental(state,
        Seq((20L, "seen a\nfresh one\n\nnovel")).toDF("id", "text"),
        "id", "text", "\n").head()
      // "seen a" (original) and "fresh one" (appended) both drop as
      // HISTORY; the blank survives (structure, and never appended)
      got.getAs[String]("text_dedup") shouldBe "\nnovel"
      got.getAs[Long]("n_removed_history") shouldBe 2L
      got.getAs[Long]("n_removed_batch") shouldBe 0L
      // append is exact algebra: state after appends ≡ a fresh prepare
      // over the concatenated corpus — same bloom bits, same digest set
      val oneShot = Text.prepareLineHistory(
        Seq((1L, "seen a"), (10L, "fresh one\n\nfresh two")).toDF("id", "text"), "text")
      try {
        state.bloom.toSeq shouldBe oneShot.bloom.toSeq
        state.digests.select("__hh").collect().map(_.getString(0)).sorted.toSeq shouldBe
          oneShot.digests.select("__hh").collect().map(_.getString(0)).sorted.toSeq
      } finally oneShot.release()
    } finally state.release()
  }

  test("shuffleShards: refuses input that already carries shard/seq columns (no silent clobber)") {
    import spark.implicits._
    val df = Seq((1L, 7)).toDF("id", "shard")
    val e = intercept[IllegalArgumentException] {
      Text.shuffleShards(df, "id", numShards = 4, seed = 1L)
    }
    e.getMessage should include("shard")
  }

  test("extractHtml: script/style/comments vanish, tags space, entities decode with &amp; last") {
    val d = docs(1L ->
      ("<html><head><script>if (1 < 2) { bad(); }</script><style>.x{}</style></head>" +
        "<body><h1>T&#39;s</h1><!-- hidden --><p>a &lt;b&gt; &amp;lt; c&nbsp;&quot;d&quot;</p></body></html>"))
    val r = d.select(Text.extractHtml(col("text")).as("s")).head()
    // &amp;lt; decodes to the LITERAL text &lt; (amp decodes last)
    r.getAs[String]("s") shouldBe "T's a <b> &lt; c \"d\""
  }

  test("extractHtml: malformed markup degrades to whitespace, plain text passes through") {
    val d = docs(1L -> "no markup at all", 2L -> "broken <tag and <b>kept</b>")
    val got = d.select(col("id"), Text.extractHtml(col("text")).as("s"))
      .orderBy("id").collect()
    got(0).getAs[String]("s") shouldBe "no markup at all"
    // "<tag and <b>" is one tag span (first '<' to first '>'): the
    // documented degradation — never a throw
    got(1).getAs[String]("s") shouldBe "broken kept"
  }

  test("extractHtmlBlocks: block closes become lines, inline tags stay spaces, whitespace normalizes") {
    val d = docs(1L ->
      ("<h1>Title Here</h1><p>first <b>para</b> text</p><p>second para</p>" +
        "<br><div>after break</div><script>var x = 1;</script><p>a &amp; b</p>"))
    val r = d.select(Text.extractHtmlBlocks(col("text")).as("s")).head()
    r.getAs[String]("s") shouldBe
      "Title Here\nfirst para text\nsecond para\n\nafter break\na & b"
    // 3+ newline runs squeeze to one paragraph break; leading and
    // trailing whitespace (incl. newlines) drop
    val d2 = docs(1L -> "<p></p><p></p><p>only text</p><p></p>")
    d2.select(Text.extractHtmlBlocks(col("text")).as("s")).head()
      .getAs[String]("s") shouldBe "only text"
  }

  test("dropBoilerplateLines: short/shouting/letterless lines drop, prose and blanks survive") {
    val d = docs(1L -> Seq(
      "Home | About",                         // 2 alnum words → drop
      "Terms | Privacy | Sitemap | Careers",  // separator-padded nav: 4 alnum words → drop
      "SUBSCRIBE NOW AND CLICK HERE TODAY",   // 6 words, all caps → drop
      "12345 --- 67890 !!! 22222",            // 3 alnum words, no letters → drop
      "",                                     // blank = structure → keep
      "This line has Seven Ordinary prose words", // keep (3/36 caps)
      "(c) 2026",                             // 2 words → drop
      "one two three four").mkString("\n"))   // 4 words → drop
    val r = d.select(Text.dropBoilerplateLines(col("text")).as("s")).head()
    r.getAs[String]("s") shouldBe "\nThis line has Seven Ordinary prose words"
    // exactly-half uppercase letters passes the <= 0.5 boundary
    val half = docs(1L -> "AB cd EF gh IJ kl MN op")
    half.select(Text.dropBoilerplateLines(col("text")).as("s")).head()
      .getAs[String]("s") shouldBe "AB cd EF gh IJ kl MN op"
  }

  test("shuffleShards: reproducible uniform permutation — total, seed-stable, seed-sensitive") {
    import spark.implicits._
    val df = (0L until 200L).map(i => Tuple1(i)).toDF("id")
    val a = Text.shuffleShards(df, "id", numShards = 8, seed = 7)
      .select("shard", "seq", "id").collect()
    // total: every id exactly once; shards in range; seq dense per shard
    a.length shouldBe 200
    a.map(_.getAs[Long]("id")).toSet.size shouldBe 200
    all(a.map(_.getAs[Int]("shard")).toSeq) should (be >= 0 and be < 8)
    a.groupBy(_.getAs[Int]("shard")).foreach { case (_, rows) =>
      rows.map(_.getAs[Int]("seq")).sorted.toSeq shouldBe (1 to rows.length)
    }
    // deterministic: a second run is bit-identical
    val b = Text.shuffleShards(df, "id", numShards = 8, seed = 7)
      .select("shard", "seq", "id").collect()
    a.map(_.toSeq).toSeq shouldBe b.map(_.toSeq).toSeq
    // a different seed is a different permutation (astronomically sure)
    val c = Text.shuffleShards(df, "id", numShards = 8, seed = 8)
      .select("shard", "seq", "id").collect()
    c.map(_.toSeq).toSeq should not be a.map(_.toSeq).toSeq
    // and not the sorted identity: the order within a shard is shuffled
    val shard0 = a.filter(_.getAs[Int]("shard") == 0).sortBy(_.getAs[Int]("seq"))
      .map(_.getAs[Long]("id")).toSeq
    shard0 should not be shard0.sorted
  }
}
