package graft.geom

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

/** Deflate helper for compact geometry interchange — the reference pairs
  * its TWKB codec with a deflate utility
  * (jts/src/main/scala/com/azavea/hiveless/spatial/util/DeflateCompressor.scala:22)
  * for cold-storage export of geometry columns; [[TWKB]] + deflate is the
  * compact wire format, WKB stays the in-engine representation.
  */
object Deflate {

  def compress(data: Array[Byte], level: Int = Deflater.DEFAULT_COMPRESSION): Array[Byte] = {
    val deflater = new Deflater(level)
    try {
      deflater.setInput(data)
      deflater.finish()
      val out = new ByteArrayOutputStream(math.max(data.length / 2, 32))
      val buf = new Array[Byte](1024)
      while (!deflater.finished()) {
        val n = deflater.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally deflater.end()
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val inflater = new Inflater()
    try {
      inflater.setInput(data)
      val out = new ByteArrayOutputStream(math.max(data.length * 2, 32))
      val buf = new Array[Byte](1024)
      while (!inflater.finished()) {
        val n = inflater.inflate(buf)
        // an empty payload returns 0 AND finishes in the same call — only
        // a 0 that leaves the stream unfinished is an error. needsDictionary
        // covers FDICT streams, where inflate() returns 0 with
        // needsInput() false and the loop would otherwise never end.
        if (n == 0 && !inflater.finished() &&
            (inflater.needsInput() || inflater.needsDictionary())) {
          throw new IllegalArgumentException("truncated or unsupported deflate stream")
        }
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inflater.end()
  }
}
