package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** KMV bottom-k sketch aggregate + the sketch-path source-overlap
  * estimator built on it (the scale twin of Dedup.sourceOverlap).
  */
class KmvSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import scala.jdk.CollectionConverters._

  private def vals(rows: (String, Long)*) = {
    val s = SparkTestSession.session
    s.createDataFrame(
      rows.map { case (src, v) => org.apache.spark.sql.Row(src, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.LongType))))
  }

  test("kmv_agg: k smallest DISTINCT values, sorted, duplicates and nulls ignored") {
    val df = vals(("a", 50L), ("a", 10L), ("a", 10L), ("a", 30L), ("a", 20L),
      ("a", 40L), ("a", 50L))
    val sk = df.groupBy("src")
      .agg(FunctionDefs.callAgg("kmv_agg", col("h"), lit(3)).as("sk"))
      .collect().head.getSeq[Long](1)
    sk shouldBe Seq(10L, 20L, 30L)
    // fewer distinct values than k → the whole set
    val all = df.groupBy("src")
      .agg(FunctionDefs.callAgg("kmv_agg", col("h"), lit(100)).as("sk"))
      .collect().head.getSeq[Long](1)
    all shouldBe Seq(10L, 20L, 30L, 40L, 50L)
  }

  test("kmv_agg: partitioning and merge order are irrelevant") {
    val rows = (1L to 500L).map(i => ("s", i * 2654435761L % 1000003L))
    val df = vals(rows: _*)
    val expected = df.repartition(1).groupBy("src")
      .agg(FunctionDefs.callAgg("kmv_agg", col("h"), lit(32)).as("sk"))
      .collect().head.getSeq[Long](1)
    for (n <- Seq(3, 7, 16)) {
      df.repartition(n).groupBy("src")
        .agg(FunctionDefs.callAgg("kmv_agg", col("h"), lit(32)).as("sk"))
        .collect().head.getSeq[Long](1) shouldBe expected
    }
    // and it is the true bottom-32 of the distinct set
    expected shouldBe rows.map(_._2).distinct.sorted.take(32)
  }

  test("kmvOverlap: k >= distinct count makes the estimate EXACT") {
    // planted sets: a∩b = {c0..c19}, |a|=|b|=40 → J = 20/60
    val a = (0 until 20).map(i => (1000L + i, s"common token number $i payload"))
    val b = (0 until 20).map(i => (2000L + i, s"only in a number $i payload"))
    val c = (0 until 20).map(i => (3000L + i, s"only in b number $i payload"))
    val s = SparkTestSession.session
    val rows = (a ++ b).map { case (_, t) => ("srcA", t) } ++
      (a ++ c).map { case (_, t) => ("srcB", t) }
    val df = s.createDataFrame(
      rows.map { case (src, t) => org.apache.spark.sql.Row(src, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType))))
    val out = graft.ops.Dedup.kmvOverlap(df, "key", "source", 1000)
      .collect().head
    out.getAs[String]("source_a") shouldBe "srcA"
    out.getAs[Long]("k_used") shouldBe 60L
    out.getAs[Long]("n_shared_sk") shouldBe 20L
    out.getAs[Double]("jaccard_est") shouldBe (20.0 / 60.0 +- 1e-6)
  }

  test("kmvOverlap: small-k estimate lands within the sketch error band") {
    // 400 keys per side, 200 shared → J = 200/600 ≈ 0.333
    val shared = (0 until 200).map(i => s"shared key $i")
    val onlyA = (0 until 200).map(i => s"alpha key $i")
    val onlyB = (0 until 200).map(i => s"beta key $i")
    val s = SparkTestSession.session
    val rows = (shared ++ onlyA).map(("srcA", _)) ++ (shared ++ onlyB).map(("srcB", _))
    val df = s.createDataFrame(
      rows.map { case (src, t) => org.apache.spark.sql.Row(src, t) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("key", org.apache.spark.sql.types.StringType))))
    val est = graft.ops.Dedup.kmvOverlap(df, "key", "source", 64)
      .collect().head.getAs[Double]("jaccard_est")
    // k=64 → se ≈ sqrt(J(1-J)/k) ≈ 0.059; allow 3σ
    est shouldBe (200.0 / 600.0 +- 0.18)
  }
}
