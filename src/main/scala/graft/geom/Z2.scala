package graft.geom

import org.locationtech.jts.geom.Geometry

/** Z2 (Morton) space-filling-curve keys over lon/lat, 30 bits per
  * dimension → 60-bit key. Same key layout as the reference's
  * spatial-index/src/main/scala/com/azavea/hiveless/spatial/index/ST_Z2LatLon.scala:40
  * (scale lon/lat to 30-bit grid, interleave x/y); the bit-interleave
  * below is the standard public magic-number dilation, not a port.
  */
object Z2 {

  val Bits: Int = 30

  /** Scale longitude [-180,180] to a 30-bit cell index. */
  def scaleLon(lon: Double): Int = {
    val s = ((lon + 180.0) / 360.0 * (1L << Bits)).toInt
    math.max(0, math.min((1 << Bits) - 1, s))
  }

  /** Scale latitude [-90,90] to a 30-bit cell index. */
  def scaleLat(lat: Double): Int = {
    val s = ((lat + 90.0) / 180.0 * (1L << Bits)).toInt
    math.max(0, math.min((1 << Bits) - 1, s))
  }

  /** Dilate a 30-bit int so its bits occupy even positions of a long. */
  def split(x: Long): Long = {
    var v = x & 0x3fffffffL
    v = (v | (v << 32)) & 0x00000000ffffffffL
    v = (v | (v << 16)) & 0x0000ffff0000ffffL
    v = (v | (v << 8))  & 0x00ff00ff00ff00ffL
    v = (v | (v << 4))  & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v << 2))  & 0x3333333333333333L
    v = (v | (v << 1))  & 0x5555555555555555L
    v
  }

  /** Inverse of split: gather even-position bits back into a 30-bit int. */
  def combine(z: Long): Int = {
    var v = z & 0x5555555555555555L
    v = (v | (v >> 1))  & 0x3333333333333333L
    v = (v | (v >> 2))  & 0x0f0f0f0f0f0f0f0fL
    v = (v | (v >> 4))  & 0x00ff00ff00ff00ffL
    v = (v | (v >> 8))  & 0x0000ffff0000ffffL
    v = (v | (v >> 16)) & 0x00000000ffffffffL
    v.toInt
  }

  /** Interleave x (even bits) and y (odd bits) into the Morton key. */
  def index(x: Int, y: Int): Long = split(x.toLong) | (split(y.toLong) << 1)

  def xOf(z: Long): Int = combine(z)
  def yOf(z: Long): Int = combine(z >> 1)

  def indexLonLat(lon: Double, lat: Double): Long = index(scaleLon(lon), scaleLat(lat))

  /** (min, max) Z2 keys of a geometry's envelope corners — the same
    * envelope→key-range shape as the reference's Z2Index struct.
    */
  def indexRange(g: Geometry): (Long, Long) = {
    val env = g.getEnvelopeInternal
    (indexLonLat(env.getMinX, env.getMinY), indexLonLat(env.getMaxX, env.getMaxY))
  }

  /** Grid cell key at a coarser `level` (bits per dimension, 1..30):
    * Morton key of the 2^level × 2^level cell containing the point.
    * Used as the bucket key for grid-partitioned spatial joins.
    */
  def cell(lon: Double, lat: Double, level: Int): Long = {
    val shift = Bits - level
    index(scaleLon(lon) >>> shift, scaleLat(lat) >>> shift)
  }

  /** All cell keys at `level` covering an envelope (row-major loop over
    * the covered cell rectangle). Callers choose `level` so the expected
    * cover count stays small; the loop is bounded defensively.
    */
  def coverEnvelope(xmin: Double, ymin: Double, xmax: Double, ymax: Double,
                    level: Int, maxCells: Int = 4096): Array[Long] = {
    val shift = Bits - level
    val x0 = scaleLon(xmin) >>> shift
    val x1 = scaleLon(xmax) >>> shift
    val y0 = scaleLat(ymin) >>> shift
    val y1 = scaleLat(ymax) >>> shift
    val nx = x1 - x0 + 1
    val ny = y1 - y0 + 1
    require(nx.toLong * ny <= maxCells,
      s"envelope covers ${nx.toLong * ny} cells at level $level (max $maxCells); use a coarser level")
    val out = new Array[Long](nx * ny)
    var i = 0
    var y = y0
    while (y <= y1) {
      var x = x0
      while (x <= x1) {
        out(i) = index(x, y)
        i += 1
        x += 1
      }
      y += 1
    }
    out
  }
}
