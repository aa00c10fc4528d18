package graft.sources

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Bucketed layout must make the recurring join shuffle-free: same
  * results as the plain join, with no Exchange on either side of the
  * join in the executed plan.
  */
class BucketedLayoutSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private lazy val tablesReady: Unit = {
    // clear any leftover managed-table location from a previous JVM (the
    // fresh catalog doesn't know the table, but the directory persists)
    for (t <- Seq("lineitem_b", "orders_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
    val l = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_orderdate", "o_totalprice")
    BucketedLayout.writeBucketed(l, "lineitem_b", "l_orderkey", 4)
    BucketedLayout.writeBucketed(o, "orders_b", "o_orderkey", 4)
  }

  private def bucketedJoin = {
    tablesReady
    BucketedLayout.read(spark, "lineitem_b")
      .join(BucketedLayout.read(spark, "orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderdate").agg(sum("l_quantity").as("qty"))
  }

  test("bucketed join result equals the plain-scan join") {
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderdate").agg(sum("l_quantity").as("qty"))
      .collect().map(r => (r.get(0).toString, r.getDouble(1))).toMap
    val bucketed = bucketedJoin
      .collect().map(r => (r.get(0).toString, r.getDouble(1))).toMap
    bucketed shouldBe plain
  }

  test("the join itself is shuffle-free: no Exchange below the SortMergeJoin") {
    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      tablesReady
      val df = BucketedLayout.read(spark, "lineitem_b")
        .join(BucketedLayout.read(spark, "orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      df.collect()
      // final AQE plan only (the Initial Plan section repeats pre-AQE shape)
      val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      withClue(plan) {
        plan should include("SortMergeJoin")
        plan.contains("Exchange") shouldBe false
        plan should include("SelectedBucketsCount")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
