package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Salting must be invisible to results (every fact row meets every
  * matching dim row exactly once, under exactly one salt) and must
  * actually split the hot key across reducer groups.
  */
class SkewJoinSpec extends AnyFunSuite with SparkTestSession with Matchers {

  import scala.jdk.CollectionConverters._

  // hot key 7: 5,000 fact rows; 50 cold keys with 10 rows each
  private lazy val fact = {
    val rows = (0L until 5000L).map(i => (7L, i)) ++
      (for (k <- 100L until 150L; i <- 0L until 10L) yield (k, 100000L + k * 100 + i))
    spark.createDataFrame(
      rows.map { case (k, r) => org.apache.spark.sql.Row(k, r) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("rowid", org.apache.spark.sql.types.LongType))))
  }
  private lazy val dim = {
    val rows = (Seq(7L) ++ (100L until 150L)).map(k => (k, s"dim-$k"))
    spark.createDataFrame(
      rows.map { case (k, v) => org.apache.spark.sql.Row(k, v) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType))))
  }

  test("salted join == plain join, row for row") {
    val plain = fact.join(dim, "k")
      .select("k", "rowid", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = SkewJoin.saltedJoin(fact, dim, "k", Seq(col("rowid")), nSalt = 8)
      .select("k", "rowid", "payload").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    salted shouldBe plain
    salted.length shouldBe 5000 + 500
  }

  test("the hot key's rows actually spread across salts") {
    val perSalt = fact.filter(col("k") === 7L)
      .select(pmod(xxhash64(col("rowid")), lit(8L)).cast("int").as("salt"))
      .groupBy("salt").count().collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    perSalt.keySet.size shouldBe 8 // all 8 reducer groups engaged
    // no salt carries more than ~2x the fair share (hash balance)
    perSalt.values.max should be < (2 * 5000L / 8 + 1)
  }

  test("nSalt=1 degenerates to the plain join; missing keys drop as inner-join semantics") {
    val lonely = fact.filter(col("k") === 999L) // no dim match
    SkewJoin.saltedJoin(lonely, dim, "k", Seq(col("rowid")), nSalt = 4).count() shouldBe 0L
    SkewJoin.saltedJoin(fact, dim, "k", Seq(col("rowid")), nSalt = 1).count() shouldBe 5500L
  }
}
