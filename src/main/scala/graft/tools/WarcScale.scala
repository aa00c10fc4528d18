package graft.tools

import org.apache.spark.sql.functions._

/** WARC ingest at realistic container sizes (r14 verdict task 4 — the
  * r14 scale cell used 8 KB-sized fixture files): generates N
  * Common-Crawl-layout files of ~M MB COMPRESSED each (member-per-
  * record gzip, compressible synthetic pages, one file per task),
  * plants one mid-file tear (file 0 truncated to 60% — mid-deflate,
  * past the gzip-header blind spot), then measures the
  * [[graft.sources.Warc.read]] parse over the directory: wall,
  * MB/s (compressed) and per-core rate, and the quarantine outcome
  * (every record before the tear kept, exactly one torn row, zero
  * other corruption).
  *
  * Memory is the point: the pre-r15 binaryFile content path held one
  * whole compressed FILE per task slot (32 × M MB resident before
  * parsing); the streaming path holds one record. WarcSpec's
  * capped-heap subprocess proves the bound; this tool measures the
  * throughput at fleet-shaped sizes.
  *
  * usage: WarcScale [outDir] [nFiles] [targetMBPerFile]
  */
object WarcScale {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_warc_scale"
    val nFiles = if (args.length > 1) args(1).toInt else 32
    val mbPerFile = if (args.length > 2) args(2).toInt else 96
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    graft.GraftSession.enable(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = new java.io.File(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(d)
    d.mkdirs()

    // ---- generate: one file per task, deterministic word-salad pages
    val target = mbPerFile.toLong << 20
    val counts = spark.range(nFiles).repartition(nFiles)
      .mapPartitions { it =>
        it.map { fid =>
          val vocab = (0 until 1024).map(i => s"w$i")
          val out = new java.io.BufferedOutputStream(
            new java.io.FileOutputStream(s"$dir/part-$fid.warc.gz"), 1 << 20)
          var written = 0L
          var rec = 0L
          try {
            while (written < target) {
              val rnd = new java.util.Random(fid * 1000003L + rec)
              val nw = 400 + rnd.nextInt(400)
              val sb = new StringBuilder(nw * 6 + 64)
              sb.append("<html><body><p>")
              var i = 0
              while (i < nw) {
                sb.append(vocab(rnd.nextInt(vocab.size))).append(' ')
                i += 1
              }
              sb.append("</p></body></html>")
              val block = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
                sb.toString).getBytes("UTF-8")
              val member = graft.sources.Warc.gzipMember(
                graft.sources.Warc.recordBytes("response",
                  s"http://example.com/f$fid/r$rec", "2026-01-01T00:00:00Z",
                  "application/http; msgtype=response", block))
              out.write(member)
              written += member.length
              rec += 1
            }
          } finally out.close()
          rec
        }
      }.collect()
    val totalRecords = counts.sum
    // plant the tear: truncate file 0 to 60% (mid-deflate, far past the
    // header blind spot); records after the cut are lost by design
    val f0 = new java.io.File(s"$dir/part-0.warc.gz")
    val cut = (f0.length() * 0.6).toLong
    val ch = new java.io.RandomAccessFile(f0, "rw")
    ch.setLength(cut)
    ch.close()
    val totalBytes = d.listFiles().map(_.length()).sum
    val mb = totalBytes / 1048576.0

    // ---- measure: min-of-2 full parses with quarantine accounting
    def parseOnce(): (Double, Long, Long, Long) = {
      val t0 = System.nanoTime()
      val agg = graft.sources.Warc.read(spark, dir)
        .agg(count(lit(1)), count(col("_corrupt")),
          count(when(col("_corrupt").startsWith("torn"), 1)))
        .as[(Long, Long, Long)].head()
      val dt = (System.nanoTime() - t0) / 1e9
      (dt, agg._1, agg._2, agg._3)
    }
    val r1 = parseOnce(); val r2 = parseOnce()
    val best = if (r1._1 < r2._1) r1 else r2
    val cores = spark.sparkContext.defaultParallelism
    // scalastyle:off println
    println(f"""{"tool":"WarcScale","n_files":$nFiles,"mb_per_file":$mbPerFile,""" +
      f""""total_mb":$mb%.1f,"records_written":$totalRecords,""" +
      f""""rows":${best._2},"corrupt":${best._3},"torn":${best._4},""" +
      f""""parse_sec":${best._1}%.2f,"mb_per_sec":${mb / best._1}%.1f,""" +
      f""""mb_per_sec_core":${mb / best._1 / cores}%.2f,"cores":$cores}""")
    // scalastyle:on println
    spark.stop()
  }
}
