package graft.tools

import org.apache.spark.sql.functions._

/** Measures the r14 rolling gram-hash pass (`gram_hashes`, one O(len)
  * sweep per doc) against the r11 per-position spelling
  * (`xxhash64(slice(ws, i+1, n))`, O(n) work per position) at the two
  * regimes that matter: the verify n = 8 and the Lee-et-al. n = 50.
  * The measured stage is the gram explode + dup-gram count — the scan
  * work the hash choice actually changes; downstream (window, rewrite)
  * is identical either way.
  */
object GramBench {

  private def time2(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; val d0 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); f; val d1 = (System.nanoTime() - t1) / 1e9
    math.min(d0, d1)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/localdata/sf1"
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    val words = graft.sources.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id").as("__id"), split(col("text"), " ").as("__ws"))
      .localCheckpoint()
    for (n <- Seq(8, 50)) {
      def dupCount(grams: org.apache.spark.sql.Column): Long =
        words.select(posexplode(grams).as(Seq("__pos", "__g")))
          .groupBy("__g").agg(count(lit(1)).as("c"))
          .filter(col("c") >= 2).count()
      val slice = expr(
        s"CASE WHEN size(__ws) >= $n THEN transform(sequence(0, size(__ws) - $n), " +
          s"i -> xxhash64(slice(__ws, i + 1, $n))) " +
          "ELSE CAST(array() AS array<bigint>) END")
      val rolling = graft.functions.FunctionDefs.call(
        "gram_hashes", col("__ws"), lit(n))
      val tSlice = time2(dupCount(slice))
      val tRoll = time2(dupCount(rolling))
      println(f"| n=$n gram hash + dup count | slice $tSlice%.2f s | rolling $tRoll%.2f s | ${tSlice / tRoll}%.1fx |")
    }
    println("== GRAMBENCH DONE ==")
    spark.stop()
  }
}
