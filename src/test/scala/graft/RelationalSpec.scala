package graft

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

class RelationalSpec extends AnyFunSpec with Matchers with SparkTestSession {
  import graft.queries.Relational

  describe("relational query set (sf0.001)") {
    it("every query runs and returns rows") {
      Relational.queries.foreach { case (name, fn) =>
        withClue(s"query $name: ") {
          val rows = fn(spark, sfDir).collect()
          rows.length should be > 0
        }
      }
    }

    it("q1_agg aggregates the full lineitem row count") {
      val total = Relational.q1Agg(spark, sfDir)
        .agg(org.apache.spark.sql.functions.sum("count_order")).collect()(0).getLong(0)
      val expected = graft.sources.Tables.lineitem(spark, sfDir).count()
      total shouldBe expected
    }

    it("q_window_topn never exceeds 3 rows per customer") {
      val df = Relational.qWindowTopN(spark, sfDir)
      val maxPer = df.groupBy("o_custkey").count()
        .agg(org.apache.spark.sql.functions.max("count")).collect()(0).getLong(0)
      maxPer should be <= 3L
    }

    it("every query has an oracle") {
      Relational.queries.keySet shouldBe Relational.oracles.keySet
    }
  }
}
