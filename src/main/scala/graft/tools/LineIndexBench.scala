package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured contract for the persisted line-dedup index
  * ([[graft.sources.LineIndex]], r13) — the [[LshIndexBench]] /
  * [[HammingIndexBench]] axes applied to the exact-membership line
  * family: probing a day's batch against an indexed line history must
  * cost O(batch), not O(history), with the one-shot in-memory
  * [[graft.ops.Text.dedupLinesIncremental]] (which re-scans history
  * every call) as the counter-baseline. Rows per corpus:
  *  - static probe vs [[graft.sources.LineIndex.Maintainer]] probe
  *    (the metadata-floor amortization);
  *  - the mostly-NOVEL batch (fresh line text — the crawl regime, the
  *    collect-and-prune fast path) vs the all-DUP batch (history docs
  *    re-id'd — the re-ingest regime; at scale it crosses maxCollect
  *    into the distributed semi-join path);
  *  - Maintainer append cost (delta-sized);
  *  - the one-shot in-memory form at the same batch.
  */
object LineIndexBench {

  private def time2(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; val d0 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); f; val d1 = (System.nanoTime() - t1) / 1e9
    math.min(d0, d1)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val small = if (args.length > 0) args(0) else "/root/repo/localdata/sf1"
    val big = if (args.length > 1) args(1) else "/root/repo/localdata/sf10docs"
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.LineIndex

    def lined(dir: String) = graft.sources.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"), expr(
        """array_join(transform(sequence(1, size(__ws), 7),
          |  i -> array_join(slice(__ws, i, 7), ' ')), '\n')"""
          .stripMargin).as("text"))

    for (dir <- Seq(small, big)) {
      val tag = new java.io.File(dir).getName
      if (new java.io.File(dir).exists()) {
        val docs = lined(dir).localCheckpoint()
        val hist = docs.filter(col("doc_id") % 17 =!= 0)
        val nHist = hist.count()
        // novel batch: fresh line text (suffix token per 7-word line)
        val novel = docs.filter(col("doc_id") % 17 === 0).limit(2000)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            regexp_replace(col("text"), "\n", " zqx\n").as("text"))
          .localCheckpoint()
        // dup batch: history docs re-id'd — every line a history hit
        val dup = hist.limit(2000)
          .select((col("doc_id") + 910000000L).as("doc_id"), col("text"))
          .localCheckpoint()
        val path = java.nio.file.Files.createTempDirectory(s"graft-lineix-$tag")
          .toString + "/ix"
        val tBuild = time2(LineIndex.build(hist, "text", path))
        println(f"| $tag build ($nHist docs) | $tBuild%.2f s | once, write-time |")
        val ix = new LineIndex.Maintainer(spark, path)
        for ((name, batch) <- Seq("novel" -> novel, "dup" -> dup)) {
          val tStatic = time2(noop(
            LineIndex.probe(spark, path, batch, "doc_id", "text")))
          val tMaint = time2(noop(ix.probe(batch, "doc_id", "text")))
          val tOneShot = time2(noop(graft.ops.Text.dedupLinesIncremental(
            hist, batch, "doc_id", "text")))
          println(f"| $tag probe 2000 $name | static $tStatic%.2f s | " +
            f"maintainer $tMaint%.2f s | one-shot in-memory $tOneShot%.2f s |")
        }
        val kept = ix.probe(novel, "doc_id", "text").localCheckpoint()
        val tAppend = time2(ix.append(kept, "text_dedup"))
        println(f"| $tag append 2000 kept | $tAppend%.2f s | delta-sized |")
        // OPTIMIZE (r13 verdict task 8): re-cluster the digest layout
        // after appends left overlapping delta files — one full table
        // read + dropDuplicates + range-clustered rewrite (idempotent,
        // so min-of-2 is honest) — then the restored probe floor on a
        // FRESH maintainer (compact invalidates live handles) against
        // the all-dup batch, comparable to the pre-compact dup row.
        val tCompact = time2(LineIndex.compact(spark, path))
        val ix2 = new LineIndex.Maintainer(spark, path)
        val tPost = time2(noop(ix2.probe(dup, "doc_id", "text")))
        println(f"| $tag compact | $tCompact%.2f s | post-compact dup probe $tPost%.2f s |")
      } else println(s"[lineix] $dir missing — skipped")
    }
    println("== LINEIX DONE ==")
    spark.stop()
  }
}
