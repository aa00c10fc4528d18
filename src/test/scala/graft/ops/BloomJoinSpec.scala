package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bloom semi-join reduction: identical results to the plain join, and
  * the fact pre-filter actually removes the non-matching majority.
  */
class BloomJoinSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import scala.jdk.CollectionConverters._

  private def frame(name: String, rows: Seq[(Long, Long)]) =
    spark.createDataFrame(
      rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(name + "_k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField(name + "_v", org.apache.spark.sql.types.LongType))))

  // fact: 10,000 rows over keys 0..999; dim: the 20 keys 0..19
  private lazy val fact = frame("f", (0L until 10000L).map(i => (i % 1000L, i)))
  private lazy val dim = frame("d", (0L until 20L).map(k => (k, k * 10)))

  test("reduced join == plain join, row for row") {
    val plain = fact.join(dim, col("f_k") === col("d_k"))
      .select("f_k", "f_v", "d_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val reduced = BloomJoin.reducedJoin(fact, dim, "f_k", "d_k")
      .select("f_k", "f_v", "d_v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    reduced shouldBe plain
    reduced.length shouldBe 200 // 20 keys × 10 fact rows each
  }

  test("the pre-filter strips the non-matching majority before the join") {
    val bloom = dim.agg(graft.functions.FunctionDefs.callAgg("bloom_agg",
        coalesce(xxhash64(col("d_k")), lit(0L)), lit(1L << 22), lit(5)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val passed = fact.filter(graft.functions.FunctionDefs.call("bloom_contains",
        lit(bloom), coalesce(xxhash64(col("f_k")), lit(0L)), lit(5)))
      .count()
    passed should be >= 200L // zero false negatives — every true match passes
    // 2% of fact matches; at m=4Mbit/n=20 the fp rate is ~0 — allow 1%
    passed should be <= 300L
  }

  test("degenerate: empty dim keeps nothing; null keys never join but never crash") {
    val emptyDim = dim.filter(col("d_k") < 0L)
    BloomJoin.reducedJoin(fact, emptyDim, "f_k", "d_k").count() shouldBe 0L
    val factNull = fact.withColumn("f_k",
      when(col("f_k") === 0L, lit(null).cast("long")).otherwise(col("f_k")))
    BloomJoin.reducedJoin(factNull, dim, "f_k", "d_k").count() shouldBe 190L
  }
}
