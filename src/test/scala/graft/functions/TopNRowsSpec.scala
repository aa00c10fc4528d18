package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class TopNRowsSpec extends AnyFunSuite with SparkTestSession with Matchers {

  private def run(partitions: Int) = {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1L to 200L).map(i => (i, s"grp${i % 5}", (i * 37 % 101).toDouble, s"payload-$i"))
    rows.toDF("id", "grp", "score", "tag").repartition(partitions)
      .groupBy("grp")
      .agg(FunctionDefs.callAgg("topn_rows",
        col("id"), struct(col("tag"), col("score")), col("score"), lit(4)).as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("r", "t")))
      .select(col("grp"), (col("r") + 1).cast("long").as("rank"), col("t.id"),
        col("t.score"), col("t.payload.tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
  }

  test("matches the window formulation and is invariant to partitioning") {
    val spark0 = spark
    import spark0.implicits._
    val rows = (1L to 200L).map(i => (i, s"grp${i % 5}", (i * 37 % 101).toDouble, s"payload-$i"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy(col("score").desc, col("id"))
    val expected = rows.toDF("id", "grp", "score", "tag")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 4)
      .collect().map(r => (r.getString(1), r.getInt(4).toLong, r.getLong(0), r.getDouble(2), r.getString(3)))
      .sortBy(t => (t._1, t._2))
    run(1).toSeq shouldBe expected.toSeq
    run(13).toSeq shouldBe expected.toSeq // serialize/merge paths across partials
  }

  test("payload struct round-trips through buffer serialization intact") {
    val got = run(13)
    got.foreach { case (_, _, id, _, tag) => tag shouldBe s"payload-$id" }
  }
}
