package graft.geom

import org.locationtech.jts.geom.{Envelope, Geometry, Point}

/** Standard geohash (base-32 interleaved binary subdivision).
  *
  * Precision is expressed in BITS (multiples of 5 map to whole base-32
  * characters), matching the reference's GeoMesa-backed semantics
  * (reference: spatial/src/main/scala/com/azavea/hiveless/spatial/ST_GeoHash.scala:1).
  */
object GeoHash {
  private val base32 = "0123456789bcdefghjkmnpqrstuvwxyz"
  private val base32Idx: Map[Char, Int] = base32.zipWithIndex.toMap

  /** Encode a point's location to `precisionBits` bits (hash string of
    * ceil(bits/5) chars; trailing sub-char bits are truncated to zero).
    */
  def encode(lon: Double, lat: Double, precisionBits: Int): String = {
    require(precisionBits > 0, "precision must be positive")
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    val nChars = (precisionBits + 4) / 5
    val sb = new StringBuilder(nChars)
    var bit = 0
    var ch = 0
    var evenBit = true
    var produced = 0
    while (produced < nChars * 5) {
      ch <<= 1
      if (produced < precisionBits) {
        if (evenBit) {
          val mid = (lonMin + lonMax) / 2
          if (lon >= mid) { ch |= 1; lonMin = mid } else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (lat >= mid) { ch |= 1; latMin = mid } else latMax = mid
        }
      }
      evenBit = !evenBit
      produced += 1
      bit += 1
      if (bit == 5) { sb.append(base32(ch)); bit = 0; ch = 0 }
    }
    sb.toString()
  }

  def encode(g: Geometry, precisionBits: Int): String = {
    val c = g match {
      case p: Point => p.getCoordinate
      case other    => other.getCentroid.getCoordinate
    }
    encode(c.x, c.y, precisionBits)
  }

  /** Decode a geohash (optionally limited to `precisionBits`) to its cell. */
  def decodeEnvelope(hash: String, precisionBits: Int = Int.MaxValue): Envelope = {
    var lonMin = -180.0; var lonMax = 180.0
    var latMin = -90.0; var latMax = 90.0
    var evenBit = true
    var consumed = 0
    val limit = math.min(hash.length * 5, precisionBits)
    var i = 0
    while (i < hash.length && consumed < limit) {
      val idx = base32Idx.getOrElse(hash.charAt(i).toLower,
        throw new IllegalArgumentException(s"invalid geohash char in: $hash"))
      var b = 4
      while (b >= 0 && consumed < limit) {
        val bitSet = ((idx >> b) & 1) == 1
        if (evenBit) {
          val mid = (lonMin + lonMax) / 2
          if (bitSet) lonMin = mid else lonMax = mid
        } else {
          val mid = (latMin + latMax) / 2
          if (bitSet) latMin = mid else latMax = mid
        }
        evenBit = !evenBit
        consumed += 1
        b -= 1
      }
      i += 1
    }
    new Envelope(lonMin, lonMax, latMin, latMax)
  }

  def decodeGeometry(hash: String, precisionBits: Int = Int.MaxValue): Geometry =
    GeomIO.factory.toGeometry(decodeEnvelope(hash, precisionBits))

  def decodePoint(hash: String, precisionBits: Int = Int.MaxValue): Point = {
    val e = decodeEnvelope(hash, precisionBits)
    GeomIO.point((e.getMinX + e.getMaxX) / 2, (e.getMinY + e.getMaxY) / 2)
  }
}
