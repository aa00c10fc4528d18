package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class CmsSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import spark.implicits._

  private def localSketch(keys: Seq[Long], depth: Int, width: Int): Array[Long] = {
    val sk = new Array[Long](depth * width)
    for (key <- keys; d <- 0 until depth)
      sk(d * width + ((key * CmsAgg.A(d) + CmsAgg.B(d)) % width).toInt) += 1L
    sk
  }

  test("cms_agg reproduces the local reference sketch bucket-for-bucket across partitions") {
    val keys = (0L until 500L).flatMap(k => Seq.fill((k % 7 + 1).toInt)(k))
    val sk = keys.toDF("k").repartition(8) // force partial sketches to merge
      .agg(FunctionDefs.callAgg("cms_agg", col("k"), lit(4), lit(64)).as("sk"))
      .head().getSeq[Long](0)
    sk shouldBe localSketch(keys, 4, 64).toSeq
    sk.sum shouldBe keys.length.toLong * 4 // each key increments once per hash row
  }

  test("cms estimates never underestimate and are exact when width has no collisions") {
    val keys = (0L until 300L).flatMap(k => Seq.fill((k % 5 + 1).toInt)(k))
    val exact = keys.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    // tight sketch: collisions guaranteed at width 32 — one-sided error only
    val tight = localSketch(keys, 4, 32)
    val sk = keys.toDF("k")
      .agg(FunctionDefs.callAgg("cms_agg", col("k"), lit(4), lit(32)).as("sk"))
      .head().getSeq[Long](0)
    sk shouldBe tight.toSeq
    exact.foreach { case (k, cnt) =>
      val est = (0 until 4).map(d => sk((d * 32 + (k * CmsAgg.A(d) + CmsAgg.B(d)) % 32).toInt)).min
      est should be >= cnt
    }

    // wide sketch: 300 keys into depth 4 × width 4096 — estimates exact
    // for every key only if NO hash row collides; assert the min-over-rows
    // estimate instead, which is exact here by construction check
    val wide = keys.toDF("k")
      .agg(FunctionDefs.callAgg("cms_agg", col("k"), lit(4), lit(4096)).as("sk"))
      .head().getSeq[Long](0)
    val allExact = exact.forall { case (k, cnt) =>
      (0 until 4).map(d => wide((d * 4096 + (k * CmsAgg.A(d) + CmsAgg.B(d)) % 4096).toInt)).min == cnt
    }
    allExact shouldBe true
  }

  test("cms_agg ignores nulls and rejects out-of-range keys loudly") {
    val withNulls = Seq(Some(1L), None, Some(1L), Some(2L)).toDF("k")
    val sk = withNulls
      .agg(FunctionDefs.callAgg("cms_agg", col("k"), lit(2), lit(16)).as("sk"))
      .head().getSeq[Long](0)
    sk.sum shouldBe 3L * 2 // null ignored; 3 keys × 2 hash rows

    val ex = intercept[org.apache.spark.SparkException] {
      Seq(-1L).toDF("k")
        .agg(FunctionDefs.callAgg("cms_agg", col("k"), lit(2), lit(16)))
        .collect()
    }
    ex.getMessage should include("cms_agg")
  }

  test("cms_agg resolves from SQL and plans a partial aggregate") {
    spark.range(0, 100).select(col("id").as("k")).createOrReplaceTempView("cms_in")
    val df = spark.sql("SELECT cms_agg(k, 3, 128) AS sk FROM cms_in")
    df.head().getSeq[Long](0).sum shouldBe 300L
    df.queryExecution.executedPlan.toString should include("partial_cms_agg")
  }
}
