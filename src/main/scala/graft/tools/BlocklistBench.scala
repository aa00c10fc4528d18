package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured contract for the r10 blocklist rewrite: per-row cost of
  * [[graft.ops.Text.blocklistFlag]] (broadcast suffix joins) must be
  * FLAT in blocklist size, while the r9 exists()-scan shape
  * ([[graft.ops.Text.blocklistFlagScan]]) is linear in it. Sweeps a
  * synthetic host corpus against 1k / 100k / 1M-domain lists and
  * cross-checks both shapes' blocked counts at each size.
  */
object BlocklistBench {

  private def time2(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; val d0 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); f; val d1 = (System.nanoTime() - t1) / 1e9
    math.min(d0, d1)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toLong else 2000000L
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.Text

    // corpus: ~1/8 of hosts are subdomains of a blocked-list member at
    // every list size (lists are prefixes of each other)
    val corpus = spark.range(nRows).select(col("id"),
        concat(lit("https://"),
          when(col("id") % 8 === 0,
            concat(lit("sub"), col("id") % 97, lit(".dom"), col("id") % 1000, lit(".example.net")))
            .otherwise(concat(lit("host"), col("id") % 100000, lit(".clean.org"))),
          lit("/p"), col("id")).as("url"))
      .localCheckpoint()
    println(s"corpus: ${corpus.count()} urls")

    // join shape at every list size — the flat-in-|list| claim
    for (listSize <- Seq(1000, 100000, 1000000)) {
      val domsDf = spark.range(listSize)
        .select(concat(lit("dom"), col("id"), lit(".example.net")).as("domain"))
      val tJoin = time2(noop(
        Text.blocklistFlagJoin(corpus, col("url"), domsDf, "domain", maxDepth = 3)
          .select("id", "blocked")))
      val nJoin = Text.blocklistFlagJoin(corpus, col("url"), domsDf, "domain", maxDepth = 3)
        .agg(sum("blocked")).head.getLong(0)
      println(f"| join  | list=$listSize%7d | $tJoin%6.2f s | $nRows rows | $nJoin blocked |")
    }
    // exists()-scan counter-baseline: linear in |list| — measured where
    // it still terminates (10k domains × 2M rows is already 2·10¹⁰
    // suffix comparisons; 100k+ was killed at >15 min in r10) and
    // cross-checked against the join shape for agreement
    for (listSize <- Seq(1000, 10000)) {
      val doms = (0 until listSize).map(i => s"dom$i.example.net")
      val domsDf = spark.range(listSize)
        .select(concat(lit("dom"), col("id"), lit(".example.net")).as("domain"))
      val tScan = time2(noop(
        Text.blocklistFlagScan(corpus, col("url"), doms).select("id", "blocked")))
      val nScan = Text.blocklistFlagScan(corpus, col("url"), doms)
        .agg(sum("blocked")).head.getLong(0)
      val nJoin = Text.blocklistFlagJoin(corpus, col("url"), domsDf, "domain", maxDepth = 3)
        .agg(sum("blocked")).head.getLong(0)
      println(f"| scan  | list=$listSize%7d | $tScan%6.2f s | $nRows rows | $nScan blocked | agree: ${nScan == nJoin} |")
    }
    println("== BLOCKLIST DONE ==")
    spark.stop()
  }
}
