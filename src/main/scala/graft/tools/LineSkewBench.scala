package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured answer to the heavy-hitter caveat on the line/gram window
  * operators ([[graft.ops.Text.dedupLines]] / spanCoverage-family): a
  * corpus-wide boilerplate line routes EVERY document's copy of it into
  * ONE window task (min/max windows have no map-side reduction). The
  * documented bound is that min(struct) windows STREAM without
  * buffering the frame, so the hot key costs one task's worth of
  * scanning, not memory. This tool makes the bound a number: dedupLines
  * over the 7-word-chunked documents corpus, then the same corpus with
  * 1 / 3 boilerplate lines INJECTED INTO EVERY DOC (hot keys carrying
  * |docs| rows each), wall-clock min-of-2.
  */
object LineSkewBench {

  private def time2(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; val d0 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime(); f; val d1 = (System.nanoTime() - t1) / 1e9
    math.min(d0, d1)
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/localdata/sf10docs"
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")

    val lined = graft.sources.Tables.documents(spark, dir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"), expr(
        """array_join(transform(sequence(1, size(__ws), 7),
          |  i -> array_join(slice(__ws, i, 7), ' ')), '\n')"""
          .stripMargin).as("text"))
      .localCheckpoint()
    val n = lined.count()

    def withBoiler(k: Int): DataFrame = {
      val boiler = (1 to k)
        .map(i => s"subscribe to our newsletter $i").mkString("\n")
      lined.select(col("doc_id"),
        concat(lit(boiler + "\n"), col("text")).as("text"))
    }

    val base = time2(noop(graft.ops.Text.dedupLines(lined, "doc_id", "text")))
    val hot1 = time2(noop(graft.ops.Text.dedupLines(withBoiler(1), "doc_id", "text")))
    val hot3 = time2(noop(graft.ops.Text.dedupLines(withBoiler(3), "doc_id", "text")))
    println(f"[lineskew] $dir docs=$n base=$base%.2f s " +
      f"hot1=$hot1%.2f s hot3=$hot3%.2f s " +
      f"(each hot line lands $n rows in ONE window task)")
    println("== LINESKEW DONE ==")
    spark.stop()
  }
}
