package graft.tools

import graft.sources.Warc

/** Capped-heap proof for the WARC reader's per-task memory contract
  * (one record + fixed buffers, never the file). WarcSpec launches
  * this main in a SUBPROCESS with `-Xmx` far below the container's
  * size: if [[Warc.recordsAt]] materialized the compressed file (the
  * pre-r15 `binaryFile` content path) the probe would OOM; streaming
  * off `FileSystem.open` parses it in a few MB.
  *
  * args: `<containerPath> <expectedRecords>`; prints
  * `parsed=<n> corrupt=<m>` and exits 0 iff n == expected && m == 0.
  */
object WarcMemProbe {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val expected = args(1).toLong
    val conf = new org.apache.hadoop.conf.Configuration()
    var parsed = 0L
    var corrupt = 0L
    Warc.recordsAt(new java.io.File(path).toURI.toString, conf).foreach { r =>
      if (r._corrupt == null) parsed += 1 else corrupt += 1
    }
    // scalastyle:off println
    println(s"parsed=$parsed corrupt=$corrupt")
    // scalastyle:on println
    if (parsed != expected || corrupt != 0) sys.exit(1)
  }
}
