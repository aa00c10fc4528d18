package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times each SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Results are fully materialized through the noop sink (not `count()`,
  * which would let the optimizer prune expensive projection expressions
  * and under-report the real work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")

    // Warm the JVM/codegen/IO paths once so per-query times measure the
    // plan, not first-use classloading: a real parquet scan, a broadcast
    // join, an exchange and an aggregate (the first timed query otherwise
    // absorbs all session init).
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val warmR = sources.Tables.region(spark, sfDir)
    val warmN = sources.Tables.nation(spark, sfDir)
    warmN.join(org.apache.spark.sql.functions.broadcast(warmR),
        warmN("n_regionkey") === warmR("r_regionkey"))
      .groupBy("r_name").count()
      .write.format("noop").mode("overwrite").save()

    // Median of `iters` timed passes per query: one-shot timings mix
    // codegen compilation, JIT warmup and IO-cache state into the number,
    // which showed up as uninterpretable 1.4–4.8× swings on unchanged
    // plans between rounds. The median of 3 is robust to one outlier pass.
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    // SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts to named queries for quick
    // single-operator iteration; unset = full sweep (the driver's mode).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    val results = selected.map { case (name, fn) =>
      val times = (1 to iters).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); None
        }
      }
      val median = if (times.isEmpty) 0.0 else times.sorted.apply(times.size / 2)
      (name, median, times.size == iters)
    }
    // Failed queries are recorded as -1 (sentinel) and listed under
    // "errors"; they are EXCLUDED from total so a partially-failed run
    // never publishes a comparable-looking headline number.
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"iterations":$iters,"sf":"$sfDir"}"""
    // Persist the FULL per-query sweep to a file: the driver's stdout
    // capture keeps only a 2000-char tail, which a 132-query JSON line
    // (~4 KB) overflows — BENCH_r04–r06 all lost the line start and
    // recorded parsed:null.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench/bench_last.json")
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
      System.err.println(s"[bench] wrote $outPath")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // Locale-independent 3-decimal formatting: the f-interpolator uses
    // the JVM default locale, which on comma-decimal locales emits 0,123
    // and breaks the JSON — the exact parsed:null failure class the
    // compact line exists to fix.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Stdout strategy: TWO JSON lines, complete map first, compact
    // headline LAST. A tail-window capture that only keeps the end of
    // stdout always gets the intact compact line (as in r7); a capture
    // wide enough for both gets the full 150-query map without needing
    // the committed sweep file. A multiline scan for lines starting
    // '{"metric"' matches both; a last-line parse gets the compact one.
    val qsFull = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) fmt(v) else "-1") }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsFull,"n_queries":${results.size},"errors":$errors,"iterations":$iters,"sf":"$sfDir"}""")
    // The final compact line: `value` is still the full-suite total, but
    // `queries` is limited to a fixed headline subset (one-per-family
    // heavies) at 3-decimal precision so the line stays well under a
    // 2000-char tail window even after sbt's trailing "[success]" line.
    // The complete sweep lives in `full` (and the first line above).
    val headline = Seq(
      "q1_agg", "q3_shipping", "q5_local_supplier", "q_window_topn",
      "q_asof_join", "q_range_join", "q_median",
      "ev_heavy", "ev_sessions", "ev_retention",
      "sp_spatial_join", "sp_knn_join", "sp_z2_layout", "sp_predicates",
      "sp_reproject",
      "dd_exact", "dd_minhash", "dd_jaccard_join", "dd_components",
      "dd_semantic",
      "ann_brute", "ann_ivf", "ann_pq", "ann_hybrid",
      "tx_quality", "tx_curate", "tx_bpe_apply", "tx_split", "tx_decontam",
      "mm_decode", "mm_features",
      "q_profile", "q_diff", "src_dpp", "tx_threshold", "dd_overlap",
      "q_dq", "tx_entropy",
      "ann_ivf_layout", "ann_pq_layout", "src_zorder", "src_csv", "sp_geos",
      "q_scd2_pit", "src_timetravel", "dd_editdist", "mm_phash", "ann_probe",
      "ev_rfm", "q_mv_join")
    val byName = results.map { case (k, v, ok) => k -> (if (ok) v else -1.0) }.toMap
    val qsCompact = headline.flatMap(k => byName.get(k).map(v => "\"" + k + "\":" + fmt(v)))
      .mkString("{", ",", "}")
    val compact =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qsCompact,"n_queries":${results.size},"errors":$errors,"iterations":$iters,"sf":"$sfDir","full":"$outPath"}"""
    println(compact)
    spark.stop()
  }
}
