package graft.ops

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class JoinEstimateSpec extends AnyFunSuite with SparkTestSession with Matchers {

  test("k >= distincts: sketch estimates are EXACT and uniform multiplicities give the true join size") {
    import spark.implicits._
    // A: keys 1..100, each twice; B: keys 51..150, each three times —
    // 50 shared keys, so |A ⋈ B| = 50 · 2 · 3 = 300
    val a = (1L to 100L).flatMap(k => Seq(k, k)).toDF("k")
    val b = (51L to 150L).flatMap(k => Seq(k, k, k)).toDF("k")
    val r = JoinEstimate.estimate(a, "k", b, "k", k = 256, exact = true).head()
    r.getLong(0) shouldBe 200L
    r.getLong(1) shouldBe 300L
    r.getDouble(2) shouldBe 100.0 // d̂_A exact (sketch holds all hashes)
    r.getDouble(3) shouldBe 100.0
    r.getDouble(4) shouldBe 50.0  // d̂(A∩B) exact
    r.getDouble(5) shouldBe 300.0 // uniform multiplicities ⇒ estimate == truth
    r.getLong(6) shouldBe 300L
  }

  test("disjoint keys estimate zero; null keys are excluded") {
    import spark.implicits._
    val a = (1L to 50L).map(Option(_)).toDF("k")
    val b = ((100L to 140L).map(Option(_)) :+ Option.empty[Long]).toDF("k")
    val r = JoinEstimate.estimate(a, "k", b, "k", k = 256, exact = true).head()
    r.getLong(0) shouldBe 50L
    r.getLong(1) shouldBe 41L // null dropped
    r.getDouble(4) shouldBe 0.0
    r.getDouble(5) shouldBe 0.0
    r.getLong(6) shouldBe 0L
  }

  test("estimate-only (default): the real a×b join is never executed — sketch passes only") {
    import spark.implicits._
    val a = (1L to 100L).flatMap(k => Seq(k, k)).toDF("k")
    val b = (51L to 150L).flatMap(k => Seq(k, k, k)).toDF("k")
    val df = JoinEstimate.estimate(a, "k", b, "k", k = 256)
    df.columns should not contain "exact_rows"
    val r = df.head()
    r.getDouble(4) shouldBe 50.0
    r.getDouble(5) shouldBe 300.0
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    withClue(s"plan:\n$p") {
      // the only joins are the 1-row sketch-summary crossJoins; an
      // executed a×b join would surface as a hash/merge equi-join
      p.contains("SortMergeJoin") shouldBe false
      p.contains("ShuffledHashJoin") shouldBe false
      p.contains("BroadcastHashJoin") shouldBe false
    }
  }

  test("estimation regime (distincts >> k) stays within a loose band of truth") {
    import spark.implicits._
    val a = (1L to 20000L).toDF("k")
    val b = (10001L to 30000L).toDF("k") // 10k shared of 20k per side
    val r = JoinEstimate.estimate(a, "k", b, "k", k = 256, exact = true).head()
    // deterministic (md5), so the band is a fixed fact of this corpus
    r.getDouble(2) shouldBe 20000.0 +- 4000.0
    r.getDouble(3) shouldBe 20000.0 +- 4000.0
    r.getDouble(5) shouldBe 10000.0 +- 3000.0
    r.getLong(6) shouldBe 10000L
  }
}
