package graft.tools

import org.apache.spark.sql.functions._

/** The SemDeDup knob story, measured: with nlist FIXED the pair stage
  * is Σ|cluster|² ≈ n²/nlist, so each data decade costs ~100× — the
  * operator's documented contract is that nlist SCALES with n (the
  * SemDeDup paper runs ~100k clusters at web scale), keeping mean
  * cluster size (and so pair cost per row) constant. This main measures
  * both regimes at two scales so SCALE_r06.md can show the knob doing
  * its job rather than asserting it.
  */
object SemScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String, nlist: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.semanticDedup(
        graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = 0.4, nlist = nlist).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm-up
    spark.read.parquet("/root/repo/localdata/sf1/embeddings.parquet")
      .agg(count(lit(1))).collect()
    for ((dir, nlists) <- Seq(
        "/root/repo/localdata/sf1" -> Seq(8, 80),
        "/root/repo/localdata/sf10" -> Seq(8, 80, 800))) {
      for (nl <- nlists) {
        val (n, t) = run(dir, nl)
        println(f"| ${dir.split('/').last} | nlist=$nl%4d | $t%8.2f s | $n groups |")
      }
    }
    spark.stop()
  }
}

/** Same story for [[graft.ops.Dedup.embeddingNearDupBlocked]]'s nBits
  * knob: expected bucket size n/2^nBits, pair cost Σ|bucket|² per
  * table — fixed nBits goes quadratic per decade, nBits ≈ log₂(n/B)
  * stays linear.
  */
object EmbedScale {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String, nBits: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.embeddingNearDupBlocked(
        graft.sources.Tables.embeddings(spark, dir), "vec_id", "embedding",
        threshold = 0.4, nBits = nBits).count()
      (n, (System.nanoTime() - t0) / 1e9)
    }
    spark.read.parquet("/root/repo/localdata/sf1/embeddings.parquet")
      .agg(count(lit(1))).collect()
    for ((dir, bits) <- Seq(
        "/root/repo/localdata/sf1" -> Seq(8, 12),
        "/root/repo/localdata/sf10" -> Seq(8, 12))) {
      for (b <- bits) {
        val (n, t) = run(dir, b)
        println(f"| ${dir.split('/').last} | nBits=$b%2d | $t%8.2f s | $n pairs |")
      }
    }
    spark.stop()
  }
}
