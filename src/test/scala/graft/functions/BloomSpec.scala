package graft.functions

import graft.SparkTestSession
import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class BloomSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import spark.implicits._

  test("bloom_agg + bloom_contains: zero false negatives, bounded false-positive rate") {
    val members = spark.range(0, 2000).select(xxhash64(concat(lit("m"), col("id"))).as("h"))
      .repartition(8) // force partial filters to merge across partitions
    val bloom = members
      .agg(FunctionDefs.callAgg("bloom_agg", col("h"), lit(1 << 16), lit(5)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    bloom.length shouldBe (1 << 16) / 8

    // every member must probe true — a Bloom "no" is definitive
    val misses = spark.range(0, 2000)
      .select(xxhash64(concat(lit("m"), col("id"))).as("h"))
      .filter(!FunctionDefs.call("bloom_contains", lit(bloom), col("h"), lit(5)))
      .count()
    misses shouldBe 0L

    // non-members: fp rate near the analytic (1 - e^{-kn/m})^k ≈ 0.2%
    // at n=2000, m=65536, k=5; assert an order-of-magnitude bound
    val fps = spark.range(0, 10000)
      .select(xxhash64(concat(lit("x"), col("id"))).as("h"))
      .filter(FunctionDefs.call("bloom_contains", lit(bloom), col("h"), lit(5)))
      .count()
    fps.toDouble / 10000.0 should be < 0.02
  }

  test("bloom_agg resolves from SQL and plans a partial aggregate") {
    spark.range(0, 100).select(xxhash64(col("id").cast("string")).as("h"))
      .createOrReplaceTempView("bloom_in")
    val df = spark.sql("SELECT bloom_agg(h, 4096, 3) AS bf FROM bloom_in")
    df.head().getAs[Array[Byte]]("bf").length shouldBe 512
    df.queryExecution.executedPlan.toString should include("partial_bloom_agg")
  }

  test("incrementalNovel: flags match a brute-force membership check, nulls dedup too") {
    val history = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val incoming = Seq(
      (10L, "alpha"),        // dup of history
      (11L, "beta"),         // dup
      (12L, "delta"),        // novel
      (13L, null.asInstanceOf[String]), // dup of the null-text history row
      (14L, "epsilon"))      // novel
      .toDF("id", "text")
    val got = Dedup.incrementalNovel(history, incoming, "id", "text")
      .orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("is_new"))).toSeq
    got shouldBe Seq((10L, 0), (11L, 0), (12L, 1), (13L, 0), (14L, 1))
  }

  test("incrementalNovel: definite-novel rows bypass the verification join") {
    // with an empty history every incoming row is a Bloom "no": the
    // result must still be complete and all-novel
    val history = Seq.empty[(Long, String)].toDF("id", "text")
    val incoming = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val got = Dedup.incrementalNovel(history, incoming, "id", "text")
      .orderBy("id").collect().map(_.getAs[Int]("is_new")).toSeq
    got shouldBe Seq(1, 1)
  }
}
