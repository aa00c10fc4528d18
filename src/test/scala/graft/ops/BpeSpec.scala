package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BpeSpec extends AnyFunSuite with SparkTestSession with Matchers {

  // the classic Sennrich corpus: low×5 lower×2 newest×6 widest×3
  private def corpus = {
    val spark0 = spark
    import spark0.implicits._
    Seq(
      "low low low low low",
      "lower lower",
      "newest newest newest newest newest newest",
      "widest widest widest").toDF("text")
  }

  test("learn reproduces the hand-computed merge sequence (with tie-breaks)") {
    val got = Bpe.learn(corpus, "text", nMerges = 3)
      .orderBy("step")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 0: e-s and s-t both 9 → (e,s) by string order; round 1: es-t 9;
    // round 2: l-o and o-w both 7 → (l,o)
    got.toSeq shouldBe Seq(
      (0, "e", "s", 9L),
      (1, "es", "t", 9L),
      (2, "l", "o", 7L))
  }

  test("encode applies merges in learning order, greedy left-to-right") {
    val spark0 = spark
    import spark0.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val words = Seq("newest", "low", "lower", "widest").toDF("word")
    val got = words.select(col("word"), Bpe.encode(col("word"), merges).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    got("newest") shouldBe List("n", "e", "w", "est")
    got("low") shouldBe List("lo", "w")
    got("lower") shouldBe List("lo", "w", "e", "r")
    got("widest") shouldBe List("w", "i", "d", "est")
  }

  test("greedy application is non-overlapping left-to-right (BPE semantics)") {
    val spark0 = spark
    import spark0.implicits._
    val got = Seq("aaa", "aaaa").toDF("word")
      .select(col("word"), Bpe.encode(col("word"), Seq(("a", "a"))).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    got("aaa") shouldBe List("aa", "a")
    got("aaaa") shouldBe List("aa", "aa")
  }

  test("encode is lossless: token concatenation restores every word under any merge list") {
    val spark0 = spark
    import spark0.implicits._
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"), ("t", "h"))
    val words = Seq("newest", "low", "lower", "the", "a", "", "ésta").toDF("word")
    val got = words
      .select(col("word"),
        array_join(Bpe.encode(col("word"), merges), "").as("back"),
        org.apache.spark.sql.functions.size(Bpe.encode(col("word"), merges)).as("n"))
      .collect()
    got.foreach { r =>
      r.getString(1) shouldBe r.getString(0) // lossless roundtrip
      r.getInt(2) should be <= r.getString(0).length.max(0) // never more tokens than chars
    }
  }

  test("learning is deterministic across partitionings") {
    val a = Bpe.learn(corpus.repartition(1), "text", nMerges = 4)
      .orderBy("step").collect().map(_.toSeq).toSeq
    val b = Bpe.learn(corpus.repartition(7), "text", nMerges = 4)
      .orderBy("step").collect().map(_.toSeq).toSeq
    a shouldBe b
  }
}
