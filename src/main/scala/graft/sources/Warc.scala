package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{BufferedInputStream, ByteArrayInputStream, InputStream}
import java.util.zip.GZIPInputStream

/** WARC/WET ingest (ISO 28500 — the Common Crawl container format):
  * the front door that lets the web-curation chain
  * ([[graft.queries.Pipeline.txWebCurate]]) start from REAL crawl
  * container bytes instead of a pre-extracted html column. Same
  * quarantine contract as [[Jsonl]]/[[Csv]]: a malformed record, a
  * truncated block, or a torn gzip member yields a row with null data
  * fields and the reason in `_corrupt` — one bad shard (or one tear
  * mid-shard) can never kill a fleet-sized ingest, and every record
  * parsed BEFORE a tear is kept.
  *
  * Reference scope: the reference engine has no ingest surface at all
  * (Hive hands it pre-parsed rows); this extends the engine's front
  * doors the way Jsonl/Csv/ORC do, from the public ISO 28500 spec.
  *
  * Layout facts the reader builds on (all from the public spec / the
  * Common Crawl convention):
  *  - a WARC file is a sequence of records: a `WARC/1.x` version line,
  *    CRLF header lines, a blank line, `Content-Length` octets of
  *    block, and a CRLF CRLF separator;
  *  - Common Crawl compresses MEMBER-PER-RECORD (multi-member gzip),
  *    so records are recoverable from any prefix of the file —
  *    `GZIPInputStream` concatenates members natively and a tear
  *    surfaces as an IOException exactly at the torn member (one
  *    inherent blind spot: a tail shorter than a gzip header at a
  *    member boundary reads as clean EOF — indistinguishable from a
  *    complete file by any reader without the uncompressed index);
  *  - `response` records wrap an HTTP message (status line + headers +
  *    payload); WET `conversion` records carry extracted text
  *    directly. The reader parses the HTTP envelope for responses
  *    (status, Content-Type mime, payload bytes) and passes other
  *    record types through with the WARC-level Content-Type.
  *
  * Scale shape: `binaryFile` is used for FILE DISCOVERY ONLY — the
  * reader projects just `path`, which the binaryFile format's column
  * pruning turns into a listing (no content bytes ever cross the
  * scan). Tasks then `FileSystem.open` each container and parse
  * record-by-record off the decompressing stream — per-task memory
  * is ONE record plus fixed 64 KiB buffers, never the file (neither
  * compressed nor decompressed), so Common Crawl's ~1 GiB containers
  * fit the same 4-8 GiB executor heap as KB fixtures, and
  * binaryFile's 2 GiB content cap does not apply. Parallelism is one
  * stream per file, the natural unit (a crawl segment is tens of
  * thousands of ~1 GB files; gzip members are not splittable without
  * a side index, so per-file streams are what every public WARC
  * reader does). The output is ordinary columns, so everything
  * downstream (extraction, Gopher rules, line dedup) stays codegen'd
  * scans over the parsed frame.
  *
  * Body bytes are kept as an opaque BINARY column (the multimodal
  * discipline — the payload may be an image or gzip, not text);
  * `decode(body, 'UTF-8')` is the one-expression bridge into the text
  * chain. Malformed-header recovery is line-based resync to the next
  * `WARC/` version line: binary blocks behind a malformed header scan
  * as long junk lines — acceptable on the quarantine path, free on
  * the happy path (Content-Length skips blocks exactly).
  */
object Warc {

  /** One parsed record (or one quarantined parse failure).
    * `http_headers` carries the RESPONSE records' HTTP header map
    * (lowercased names, last value wins) — the curation signals real
    * pipelines filter on (x-robots-tag, content-language,
    * last-modified) without re-parsing body bytes; empty for non-HTTP
    * records.
    */
  final case class WarcRow(
      url: String, warc_date: String, warc_type: String, record_id: String,
      mime: String, status: Option[Int], http_headers: Map[String, String],
      body: Array[Byte], src: String, _corrupt: String)

  /** The binaryFile source's fixed schema — needed explicitly by
    * [[readStream]] (file stream sources require one).
    */
  private val binaryFileSchema: StructType = StructType(Seq(
    StructField("path", StringType),
    StructField("modificationTime", TimestampType),
    StructField("length", LongType),
    StructField("content", BinaryType)))

  /** Batch read: every WARC record under `path` (glob ok), parsed rows
    * + quarantine rows in one frame. Columns: url, warc_date,
    * warc_type, record_id, mime, status, body (binary), src (the
    * container file), _corrupt (null = parsed).
    */
  def read(s: SparkSession, path: String): DataFrame =
    parseFiles(s.read.format("binaryFile").load(path))

  /** Streaming twin: new WARC shards landing in `path` flow through
    * per micro-batch with the same quarantine contract — the
    * continuous crawl-ingest front door ([[Jsonl.readStream]]'s
    * shape). `maxFilesPerTrigger` is the rate knob. binaryFile is the
    * file-DISCOVERY source only (path column, content pruned); record
    * bytes stream off `FileSystem.open` exactly like [[read]].
    */
  def readStream(s: SparkSession, path: String): DataFrame =
    parseFiles(s.readStream.format("binaryFile")
      .schema(binaryFileSchema).load(path))

  private def parseFiles(files: DataFrame): DataFrame = {
    val s = files.sparkSession
    import s.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      s.sparkContext.hadoopConfiguration)
    // path-only projection: binaryFile's column pruning never reads
    // content bytes for it — discovery stays a listing, not an IO pass
    files.select(col("path")).as[String]
      .mapPartitions(_.flatMap(p => recordsAt(p, conf.value)))
      .toDF()
  }

  /** Stream one container straight off the (Hadoop) filesystem —
    * record-bounded memory at any file size. Quarantines an unopenable
    * path the same way [[recordsOf]] quarantines unreadable bytes; the
    * stream is closed at iterator exhaustion and, defensively, at task
    * completion (an abandoned iterator must not leak a connection).
    */
  def recordsAt(src: String,
                conf: org.apache.hadoop.conf.Configuration): Iterator[WarcRow] =
    try {
      val p = new org.apache.hadoop.fs.Path(src)
      val in = sniff(p.getFileSystem(conf).open(p))
      val ctx = org.apache.spark.TaskContext.get()
      if (ctx != null)
        ctx.addTaskCompletionListener[Unit](_ => closeQuietly(in))
      records(src, in)
    } catch {
      case e: java.io.IOException if isDecodeCorruption(e) =>
        Iterator.single(corruptRow(src, s"unreadable container: ${e.getMessage}"))
    }

  /** The quarantine/retry split for file-backed reads: gzip/deflate
    * decode errors (ZipException, the inflater's mid-stream
    * EOFException) are CONTENT corruption — quarantine the row and
    * keep the job green. Every other IOException off a real
    * filesystem (socket reset, S3/HDFS timeout, open failure) is a
    * TRANSPORT fault: it must rethrow and fail the task so Spark
    * retries it — quarantining it would silently drop every record
    * after the fault and make reruns of identical input disagree.
    * (The pre-r15 binaryFile path got this for free: content bytes
    * were materialized by the scan, so stream faults failed the task
    * before parsing ever started.)
    */
  private def isDecodeCorruption(e: java.io.IOException): Boolean =
    e.isInstanceOf[java.util.zip.ZipException] ||
      e.isInstanceOf[java.io.EOFException]

  /** Lazy record iterator over one in-memory container — pure JVM, the
    * spec's unit-test surface (fixtures are KB-sized; file-scale reads
    * go through [[recordsAt]]).
    */
  def recordsOf(src: String, content: Array[Byte]): Iterator[WarcRow] =
    try records(src, sniff(new ByteArrayInputStream(content)))
    catch {
      // in-memory bytes have no transport leg, so (unlike recordsAt)
      // EVERY IOException here is content corruption — keep the catch
      // broad
      case e: java.io.IOException =>
        Iterator.single(corruptRow(src, s"unreadable container: ${e.getMessage}"))
    }

  /** Robots-directive drop predicate over the parsed `http_headers`
    * map: true iff the `X-Robots-Tag` response header carries a
    * `noindex` or `none` directive (the REP extension Google/Bing
    * honor — `none` = noindex+nofollow). Token match on the
    * comma/space-separated directive list, case-insensitive, so
    * `noarchive` or `by-noindex-bot: ...` agent-scoped values never
    * false-positive on a substring. Absent header (or a non-HTTP
    * record's empty map) → false. Scan-side expression — composes into
    * the curation chain's one-projection prefix.
    */
  def robotsDeny(httpHeaders: Column): Column =
    lower(coalesce(element_at(httpHeaders, "x-robots-tag"), lit("")))
      .rlike("(^|[,\\s])(noindex|none)($|[,\\s])")

  /** Buffer + gzip-magic sniff: a two-byte mark/reset probe picks the
    * decompressing wrapper without materializing anything.
    */
  private def sniff(raw: InputStream): InputStream = {
    val in = new BufferedInputStream(raw, 1 << 16)
    in.mark(2)
    val b0 = in.read(); val b1 = in.read()
    in.reset()
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(in, 1 << 16) else in
  }

  private def closeQuietly(in: InputStream): Unit =
    try in.close() catch { case _: java.io.IOException => () }

  private def corruptRow(src: String, msg: String): WarcRow =
    WarcRow(null, null, null, null, null, None, Map.empty, null, src, msg)

  private[sources] def records(src: String, in: InputStream): Iterator[WarcRow] =
    new scala.collection.AbstractIterator[WarcRow] {
      private var pendingLine: String = null // resync lookahead
      private var done = false
      private var ready: WarcRow = null
      private var tornMsg: String = null // stream fault hit during resync

      private def finish(): Unit = { done = true; closeQuietly(in) }

      private def nextLine(): String =
        if (pendingLine != null) { val l = pendingLine; pendingLine = null; l }
        else readLine(in)

      /** Consume lines until the next `WARC/` version line (kept as
        * lookahead) or EOF — recovery after a malformed record. A
        * stream fault here (the malformed record sits directly before
        * a torn gzip member) must NOT overwrite the malformed
        * quarantine row the caller is about to emit: it is deferred to
        * the next advance() so BOTH rows surface.
        */
      private def resync(): Unit =
        try {
          var l = nextLine()
          while (l != null && !l.startsWith("WARC/")) l = nextLine()
          pendingLine = l
        } catch {
          case e: java.io.IOException if isDecodeCorruption(e) =>
            tornMsg = s"torn gzip member: ${e.getMessage}"
            pendingLine = null
        }

      private def advance(): Unit = {
        if (done) { ready = null; return }
        if (tornMsg != null) {
          ready = corruptRow(src, tornMsg); tornMsg = null; finish()
          return
        }
        try {
          var line = nextLine()
          while (line != null && line.trim.isEmpty) line = nextLine()
          if (line == null) { ready = null; finish(); return }
          if (!line.startsWith("WARC/")) {
            val snippet = line.take(60)
            resync()
            ready = corruptRow(src, s"malformed record header: '$snippet'")
            return
          }
          // header lines (name: value, continuations folded) to blank
          val hdrs = scala.collection.mutable.Map.empty[String, String]
          var last: String = null
          var h = nextLine()
          while (h != null && h.nonEmpty) {
            if ((h.charAt(0) == ' ' || h.charAt(0) == '\t') && last != null)
              hdrs(last) = hdrs(last) + " " + h.trim
            else {
              val i = h.indexOf(':')
              if (i > 0) {
                last = h.substring(0, i).trim.toLowerCase
                hdrs(last) = h.substring(i + 1).trim
              }
            }
            h = nextLine()
          }
          if (h == null) {
            ready = corruptRow(src, "truncated record header"); finish()
            return
          }
          val lenOpt = hdrs.get("content-length")
            .flatMap(v => v.toLongOption).filter(_ >= 0)
          if (lenOpt.isEmpty) {
            resync()
            ready = corruptRow(src,
              s"missing/invalid content-length (${hdrs.getOrElse("content-length", "absent")})")
            return
          }
          val want = lenOpt.get
          if (want > Int.MaxValue - 8) {
            // a corrupt length must not drive allocation — quarantine
            resync()
            ready = corruptRow(src, s"implausible content-length ($want)")
            return
          }
          // chunked read: allocation tracks bytes actually present, so
          // a corrupt length against a torn tail never pre-allocates
          val block = readUpTo(in, want.toInt)
          if (block.length < want) {
            ready = corruptRow(src,
              s"truncated record block (${block.length} of $want bytes)")
            finish()
            return
          }
          val wtype = hdrs.getOrElse("warc-type", null)
          val url = hdrs.getOrElse("warc-target-uri", null)
          val date = hdrs.getOrElse("warc-date", null)
          val rid = hdrs.getOrElse("warc-record-id", null)
          val ctype = hdrs.get("content-type")
          ready =
            if (wtype == "response"
                && ctype.exists(_.toLowerCase.startsWith("application/http"))) {
              val (status, mime, headers, payload) = parseHttp(block)
              WarcRow(url, date, wtype, rid, mime, status, headers, payload,
                src, null)
            } else
              WarcRow(url, date, wtype, rid,
                ctype.map(_.split(';')(0).trim).orNull, None, Map.empty,
                block, src, null)
        } catch {
          // a torn gzip member (EOF mid-inflate / corrupt deflate):
          // quarantine the tail, keep everything already emitted.
          // Transport faults fall through isDecodeCorruption and fail
          // the task for retry instead (see the split's scaladoc).
          case e: java.io.IOException if isDecodeCorruption(e) =>
            ready = corruptRow(src, s"torn gzip member: ${e.getMessage}")
            finish()
        }
      }

      advance()
      override def hasNext: Boolean = ready != null
      override def next(): WarcRow = {
        val r = ready; advance(); r
      }
    }

  /** Read one CRLF/LF-terminated line as ISO-8859-1 (headers are
    * ASCII; byte-faithful so resync never mangles offsets). Null at
    * EOF. The BUFFER is capped at 64 KiB while the stream still
    * consumes to the newline: a malformed header in front of a large
    * binary payload (no newline bytes for hundreds of MB) must not
    * materialize the payload as one String — the per-task-memory
    * contract holds on the quarantine path too, and the returned
    * prefix is all resync's `startsWith("WARC/")` probe needs.
    */
  private val MaxLineBytes = 1 << 16

  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (buf.size() < MaxLineBytes) buf.write(b)
      b = in.read()
    }
    val arr = buf.toByteArray
    val n = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1
            else arr.length
    new String(arr, 0, n, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** Read up to `want` bytes in 64 KiB chunks (short only at EOF). */
  private def readUpTo(in: InputStream, want: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.min(want, 1 << 16))
    val chunk = new Array[Byte](1 << 16)
    var left = want
    while (left > 0) {
      val n = in.read(chunk, 0, math.min(left, chunk.length))
      if (n < 0) return out.toByteArray
      out.write(chunk, 0, n)
      left -= n
    }
    out.toByteArray
  }

  /** Split a response record's HTTP message: (status, mime, headers,
    * payload). Headers come back as a lowercased-name map; repeated
    * names combine comma-joined in arrival order (RFC 9110 list
    * semantics — the curation-signal surface: x-robots-tag,
    * content-language, last-modified). A block that doesn't start with
    * `HTTP/` passes through whole with no status and no headers
    * (defensive — some crawlers store raw payloads).
    */
  private def parseHttp(block: Array[Byte])
      : (Option[Int], String, Map[String, String], Array[Byte]) = {
    val headEnd = httpHeaderEnd(block)
    if (headEnd < 0) return (None, null, Map.empty, block)
    val head = new String(block, 0, headEnd,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/"))
      return (None, null, Map.empty, block)
    val status = lines(0).split(" ").lift(1).flatMap(_.toIntOption)
    // repeated headers COMBINE comma-joined in first-seen order (RFC
    // 9110 §5.3 list semantics — and the Robots Exclusion Protocol
    // requires combining repeated X-Robots-Tag lines, where a
    // last-wins map would let 'noindex' be shadowed by a later
    // 'noarchive' and robotsDeny keep an explicitly-denied page)
    val headers = lines.iterator.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i > 0) Some(l.substring(0, i).trim.toLowerCase ->
        l.substring(i + 1).trim)
      else None
    }.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._2).mkString(", ")).toMap
    val mime = headers.get("content-type").map(_.split(';')(0).trim).orNull
    val bodyStart = skipBlank(block, headEnd)
    (status, mime, headers,
      java.util.Arrays.copyOfRange(block, bodyStart, block.length))
  }

  /** Index of the first byte of the blank line ending the HTTP headers
    * (handles CRLF CRLF and LF LF), or -1.
    */
  private def httpHeaderEnd(b: Array[Byte]): Int = {
    var i = 0
    while (i < b.length) {
      if (b(i) == '\n') {
        if (i + 1 < b.length && b(i + 1) == '\n') return i + 1
        if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n') return i + 1
      }
      i += 1
    }
    -1
  }

  private def skipBlank(b: Array[Byte], from: Int): Int = {
    var i = from
    if (i < b.length && b(i) == '\r') i += 1
    if (i < b.length && b(i) == '\n') i += 1
    i
  }

  // ------------------------------------------------------------ writer

  /** Serialize one record as WARC bytes (member payload — gzip it per
    * record for the Common Crawl layout). Public so fixtures and
    * egress both speak the exact spec format.
    */
  def recordBytes(warcType: String, url: String, date: String,
                  contentType: String, block: Array[Byte],
                  versionLine: String = "WARC/1.0"): Array[Byte] = {
    // CR/LF in a header VALUE would desync the record framing (header
    // injection — Content-Length no longer frames the block and the
    // written container mis-parses): fail fast, never corrupt egress
    for ((n, v) <- Seq("warcType" -> warcType, "url" -> url,
        "date" -> date, "contentType" -> contentType))
      require(v == null || (!v.contains('\r') && !v.contains('\n')),
        s"recordBytes: $n contains CR/LF — would corrupt record framing")
    // url/date are the only legitimately optional headers; a null
    // contentType would serialize the literal 'Content-Type: null' and
    // a null block NPEs at block.length — fail fast, like the writer
    // (which always supplies both) expects
    require(contentType != null, "recordBytes: contentType is required")
    require(block != null, "recordBytes: block is required (use Array.empty)")
    val sb = new StringBuilder
    sb.append(versionLine).append("\r\n")
    sb.append("WARC-Type: ").append(warcType).append("\r\n")
    if (url != null) sb.append("WARC-Target-URI: ").append(url).append("\r\n")
    if (date != null) sb.append("WARC-Date: ").append(date).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    sb.append("Content-Length: ").append(block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val out = new java.io.ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head); out.write(block)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** Gzip one member (the Common Crawl member-per-record convention). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes); gz.finish(); gz.close()
    out.toByteArray
  }

  /** Distributed WARC egress — the symmetric half of [[read]]: each
    * partition writes one `part-NNNNN.warc.gz` of member-per-record
    * gzip under `path` (Hadoop FS, so file:/hdfs:/object stores all
    * work), each row one record of `warcType` (default `conversion` —
    * the WET shape curated text naturally exports as; a pipeline's
    * final text goes back out in the same container format it came in
    * from). `bodyCol` may be string or binary. Parallelism = input
    * partitions, memory = one record — the same shape as the reader.
    * Readable back by [[read]]/any ISO 28500 reader; [[WarcSpec]]
    * pins the write→read roundtrip byte-for-byte.
    *
    * Task-retry contract: each attempt writes its OWN temp file
    * (`.part-NNNNN-attempt<id>.tmp`) and renames onto the final
    * `part-NNNNN.warc.gz` when its iterator completes — a zombie or
    * speculative duplicate attempt can never interleave bytes into a
    * shard, and a killed attempt leaves only a temp file the rename of
    * a healthy attempt ignores (its temp is deleted on failure). If
    * the final file exists (the other attempt won), it is replaced —
    * partition contents are deterministic, so both attempts' bytes are
    * identical (GZIPOutputStream writes MTIME=0). This is the
    * single-writer-per-shard subset of a commit protocol; it trades
    * the job-level _SUCCESS marker for the exact container layout.
    */
  def write(df: DataFrame, path: String, urlCol: String, dateCol: String,
            bodyCol: String, warcType: String = "conversion",
            contentType: String = "text/plain"): Unit = {
    val cols = df.select(
      col(urlCol).cast("string"), col(dateCol).cast("string"),
      col(bodyCol))
    val isBinary = cols.schema.fields(2).dataType == BinaryType
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs0 = dirPath.getFileSystem(conf.value)
    fs0.mkdirs(dirPath)
    // overwrite happens HERE, on the driver, before any task runs:
    // task-side commit is rename-first (exactly one attempt wins), so
    // a previous job's shards must be cleared up front — a task-side
    // delete would reintroduce the zombie-attempt data-loss window
    fs0.globStatus(new org.apache.hadoop.fs.Path(dirPath, "part-*.warc.gz"))
      .foreach(st => fs0.delete(st.getPath, false))
    fs0.globStatus(new org.apache.hadoop.fs.Path(dirPath, ".part-*.tmp"))
      .foreach(st => fs0.delete(st.getPath, false))
    cols.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val ctx = org.apache.spark.TaskContext.get()
        val pid = ctx.partitionId()
        val fin = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.warc.gz")
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d-attempt${ctx.taskAttemptId()}.tmp")
        val fs = fin.getFileSystem(conf.value)
        val out = fs.create(tmp, true)
        var ok = false
        try {
          it.foreach { r =>
            val body: Array[Byte] =
              if (r.isNullAt(2)) Array.empty[Byte]
              else if (isBinary) r.getAs[Array[Byte]](2)
              else r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8)
            out.write(gzipMember(recordBytes(warcType,
              if (r.isNullAt(0)) null else r.getString(0),
              if (r.isNullAt(1)) null else r.getString(1),
              contentType, body)))
          }
          ok = true
        } finally {
          out.close()
          if (ok) {
            // rename-FIRST commit: HDFS-semantics rename refuses an
            // existing destination, so exactly one attempt wins. The
            // old delete-then-rename order let a zombie attempt delete
            // an already-committed shard and die before its rename —
            // a permanent loss the job never notices. A failed rename
            // with the destination present means another attempt
            // committed first: drop our tmp and succeed.
            if (!fs.rename(tmp, fin)) {
              fs.delete(tmp, false)
              if (!fs.exists(fin))
                throw new java.io.IOException(
                  s"Warc.write: rename $tmp -> $fin failed with no committed shard present")
            }
          } else fs.delete(tmp, false)
        }
      }
    }
  }
}
