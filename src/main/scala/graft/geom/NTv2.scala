package graft.geom

import java.nio.{ByteBuffer, ByteOrder}

/** NTv2 grid-shift file support (`.gsb`): the binary format national
  * geodetic agencies publish datum-transformation grids in (NAD27→NAD83,
  * AGD66→GDA94, OSGB ↔ ETRS89, …), and the format behind proj4's
  * `+nadgrids=` parameter. The reference reaches these grids through
  * geotrellis-proj4's registry (spatial-index/src/main/scala/com/azavea/
  * hiveless/spatial/index/ST_GeomReproject.scala:1); this is a from-spec
  * reimplementation of the public NTv2 format — the "NTv2 Developer's
  * Guide" layout used identically by PROJ, proj4j and GeoTools:
  *
  *   - an 11-record overview header (16 bytes each: 8-byte ASCII tag +
  *     8-byte value; int values are int32 + 4 pad bytes),
  *   - per sub-grid an 11-record header (S_LAT/N_LAT/E_LONG/W_LONG/
  *     LAT_INC/LONG_INC in arc-seconds, GS_COUNT nodes), then GS_COUNT
  *     16-byte nodes of four float32s (lat shift, lon shift, lat
  *     accuracy, lon accuracy) in arc-seconds,
  *   - node ordering row-major from S_LAT northward, each row from
  *     E_LONG **westward** — NTv2 longitudes are positive WEST,
  *   - either byte order in the wild (the spec is big-endian, Canadian
  *     and most European files are little-endian); detected from
  *     NUM_OREC which must decode to 11.
  *
  * Shifts map the *from* datum to the *to* datum (NAD27 coordinates plus
  * the interpolated shift are NAD83 coordinates). The public convention:
  * add the lat shift, SUBTRACT the lon shift from an east-positive
  * longitude (the stored value is positive west). Interpolation is
  * bilinear on the four surrounding nodes; the inverse (to→from) is the
  * standard fixed-point iteration on the forward field, run on a FIXED
  * 4-step schedule so replays are deterministic (PROJ iterates the same
  * recurrence to a tolerance it reaches in ≤4 steps for real grids).
  *
  * Scale shape: a grid file is a few KB–MB driver-side artifact loaded
  * once per executor and memoized by path ([[load]]) — the per-row work
  * is a bounds check plus one bilinear interpolation, no data motion. On
  * a cluster the `.gsb` ships like any side file (`--files`); the path
  * in the CRS string resolves per-executor.
  */
object NTv2 {

  /** One sub-grid: bounds/increments in arc-seconds, longitudes positive
    * west, `latShift`/`lonShift` row-major south→north, east→west.
    */
  final case class SubGrid(name: String, parent: String,
                           sLat: Double, nLat: Double,
                           eLong: Double, wLong: Double,
                           latInc: Double, longInc: Double,
                           latShift: Array[Float], lonShift: Array[Float]) {
    val nRows: Int = ((nLat - sLat) / latInc + 0.5).toInt + 1
    val nCols: Int = ((wLong - eLong) / longInc + 0.5).toInt + 1
    require(latShift.length == nRows * nCols && lonShift.length == nRows * nCols,
      s"sub-grid $name: ${latShift.length} nodes != $nRows rows x $nCols cols")

    /** Cell area in arc-sec² — sub-grid selection picks the densest
      * (smallest-cell) grid containing the point, which is NTv2's
      * parent/child refinement semantics without walking the tree.
      */
    def cellArea: Double = latInc * longInc

    def contains(lonWestSec: Double, latSec: Double): Boolean =
      latSec >= sLat && latSec <= nLat && lonWestSec >= eLong && lonWestSec <= wLong

    /** Bilinear (latShiftSec, lonWestShiftSec) at an interior point. */
    def interpolate(lonWestSec: Double, latSec: Double): (Double, Double) = {
      val x = (lonWestSec - eLong) / longInc
      val y = (latSec - sLat) / latInc
      val j0 = math.min(math.max(math.floor(x).toInt, 0), nCols - 2)
      val i0 = math.min(math.max(math.floor(y).toInt, 0), nRows - 2)
      val u = x - j0
      val v = y - i0
      val b = i0 * nCols + j0
      def bil(a: Array[Float]): Double =
        a(b) * (1.0 - u) * (1.0 - v) + a(b + 1) * u * (1.0 - v) +
          a(b + nCols) * (1.0 - u) * v + a(b + nCols + 1) * u * v
      (bil(latShift), bil(lonShift))
    }
  }

  /** A loaded grid file (possibly several sub-grids). Transforms use
    * east-positive degrees; points outside every sub-grid pass through
    * unshifted — the total-function choice that fits a SQL engine (a
    * per-row throw would poison whole partitions for one stray point;
    * the alternative PROJ default is a hard error unless the grid is
    * marked optional with `@`).
    */
  final case class Grid(subs: Vector[SubGrid]) {
    require(subs.nonEmpty, "NTv2 grid has no sub-grids")

    private def select(lonWestSec: Double, latSec: Double): SubGrid = {
      var best: SubGrid = null
      var i = 0
      while (i < subs.length) {
        val s = subs(i)
        if (s.contains(lonWestSec, latSec) && (best == null || s.cellArea < best.cellArea))
          best = s
        i += 1
      }
      best
    }

    /** (dLonDeg, dLatDeg) to ADD to east-positive from-datum degrees. */
    def shiftAt(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lonWestSec = -lonDeg * 3600.0
      val latSec = latDeg * 3600.0
      val s = select(lonWestSec, latSec)
      if (s == null) (0.0, 0.0)
      else {
        val (dLatSec, dLonWestSec) = s.interpolate(lonWestSec, latSec)
        (-dLonWestSec / 3600.0, dLatSec / 3600.0)
      }
    }

    /** from-datum → to-datum (e.g. NAD27 → NAD83/WGS84). */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val (dLon, dLat) = shiftAt(lonDeg, latDeg)
      (lonDeg + dLon, latDeg + dLat)
    }

    /** to-datum → from-datum: fixed-point s_{k+1} = t − shift(s_k),
      * seeded at t, FIXED 4 steps (shift fields are arc-seconds over
      * degree-scale cells, so the recurrence contracts by ~1e-4 per
      * step — 4 steps land far below float32 node precision).
      */
    def inverse(lonDeg: Double, latDeg: Double): (Double, Double) = {
      var lon = lonDeg
      var lat = latDeg
      var k = 0
      while (k < 4) {
        val (dLon, dLat) = shiftAt(lon, lat)
        lon = lonDeg - dLon
        lat = latDeg - dLat
        k += 1
      }
      (lon, lat)
    }
  }

  // ---- binary codec ------------------------------------------------------

  private val OverviewRecords = 11
  private val SubHeaderRecords = 11

  /** Parse `.gsb` bytes. Endianness is detected from NUM_OREC (== 11). */
  def read(bytes: Array[Byte]): Grid = {
    require(bytes.length >= OverviewRecords * 16, "NTv2: truncated overview header")
    val order =
      if (ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt == OverviewRecords)
        ByteOrder.LITTLE_ENDIAN
      else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)

    def tag(off: Int): String = {
      val b = new Array[Byte](8); buf.position(off); buf.get(b)
      new String(b, "US-ASCII").trim
    }
    def intVal(off: Int): Int = buf.getInt(off + 8)
    def dblVal(off: Int): Double = buf.getDouble(off + 8)
    def strVal(off: Int): String = tag(off + 8)

    require(tag(0) == "NUM_OREC" && intVal(0) == OverviewRecords,
      s"NTv2: bad overview header (NUM_OREC tag '${tag(0)}' value ${intVal(0)})")
    require(intVal(16) == SubHeaderRecords,
      s"NTv2: unsupported NUM_SREC ${intVal(16)} (spec value 11)")
    val numFile = intVal(32)
    require(numFile >= 1 && numFile <= 10000, s"NTv2: implausible NUM_FILE $numFile")
    val gsType = strVal(48)
    require(gsType == "SECONDS", s"NTv2: unsupported GS_TYPE '$gsType' (SECONDS only)")

    var off = OverviewRecords * 16
    val subs = Vector.newBuilder[SubGrid]
    var f = 0
    while (f < numFile) {
      require(bytes.length >= off + SubHeaderRecords * 16, "NTv2: truncated sub-grid header")
      require(tag(off) == "SUB_NAME", s"NTv2: expected SUB_NAME at offset $off, got '${tag(off)}'")
      val name = strVal(off)
      val parent = strVal(off + 16)
      val sLat = dblVal(off + 64)
      val nLat = dblVal(off + 80)
      val eLong = dblVal(off + 96)
      val wLong = dblVal(off + 112)
      val latInc = dblVal(off + 128)
      val longInc = dblVal(off + 144)
      val count = intVal(off + 160)
      require(latInc > 0 && longInc > 0 && nLat > sLat && wLong > eLong,
        s"NTv2: degenerate sub-grid '$name' bounds")
      off += SubHeaderRecords * 16
      require(bytes.length >= off + count * 16, s"NTv2: truncated nodes in sub-grid '$name'")
      val latShift = new Array[Float](count)
      val lonShift = new Array[Float](count)
      var i = 0
      while (i < count) {
        latShift(i) = buf.getFloat(off)
        lonShift(i) = buf.getFloat(off + 4)
        off += 16
        i += 1
      }
      subs += SubGrid(name, parent, sLat, nLat, eLong, wLong, latInc, longInc, latShift, lonShift)
      f += 1
    }
    Grid(subs.result())
  }

  /** Serialize a grid as spec-layout `.gsb` bytes (fixtures, tests, and
    * publishing derived grids). Accuracy fields are written as −1
    * ("unknown" per the spec).
    */
  def write(grid: Grid, order: ByteOrder = ByteOrder.BIG_ENDIAN): Array[Byte] = {
    val nodes = grid.subs.map(_.latShift.length).sum
    val size = (OverviewRecords + grid.subs.length * SubHeaderRecords + nodes + 1) * 16
    val buf = ByteBuffer.allocate(size).order(order)
    def rec(tag: String)(put: => Unit): Unit = {
      buf.put(tag.padTo(8, ' ').getBytes("US-ASCII")); val p = buf.position(); put
      buf.position(p + 8)
    }
    def irec(tag: String, v: Int): Unit = rec(tag)(buf.putInt(v))
    def drec(tag: String, v: Double): Unit = rec(tag)(buf.putDouble(v))
    def srec(tag: String, v: String): Unit =
      rec(tag)(buf.put(v.take(8).padTo(8, ' ').getBytes("US-ASCII")))
    irec("NUM_OREC", OverviewRecords)
    irec("NUM_SREC", SubHeaderRecords)
    irec("NUM_FILE", grid.subs.length)
    srec("GS_TYPE", "SECONDS")
    srec("VERSION", "NTv2.0")
    srec("SYSTEM_F", "FROM")
    srec("SYSTEM_T", "TO")
    drec("MAJOR_F", 6378206.4); drec("MINOR_F", 6356583.8)
    drec("MAJOR_T", 6378137.0); drec("MINOR_T", 6356752.314)
    grid.subs.foreach { s =>
      srec("SUB_NAME", s.name); srec("PARENT", s.parent)
      srec("CREATED", "GRAFT"); srec("UPDATED", "GRAFT")
      drec("S_LAT", s.sLat); drec("N_LAT", s.nLat)
      drec("E_LONG", s.eLong); drec("W_LONG", s.wLong)
      drec("LAT_INC", s.latInc); drec("LONG_INC", s.longInc)
      irec("GS_COUNT", s.latShift.length)
      var i = 0
      while (i < s.latShift.length) {
        buf.putFloat(s.latShift(i)); buf.putFloat(s.lonShift(i))
        buf.putFloat(-1.0f); buf.putFloat(-1.0f)
        i += 1
      }
    }
    srec("END", "")
    buf.array()
  }

  // Grids are immutable; memoizing by path makes case-class equality on
  // GridShifted CRSs (array fields compare by reference) behave as path
  // identity within a JVM, and bounds executor-side file reads to one
  // per distinct grid.
  private val gridMemo = new java.util.concurrent.ConcurrentHashMap[String, Grid]()
  private val GridMemoMax = 64

  def load(path: String): Grid = {
    val cached = gridMemo.get(path)
    if (cached != null) cached
    else {
      val p = java.nio.file.Paths.get(path)
      require(java.nio.file.Files.isReadable(p),
        s"NTv2 grid file not readable: $path (on a cluster, ship it with --files " +
          "so the path resolves on every executor)")
      val built = read(java.nio.file.Files.readAllBytes(p))
      if (gridMemo.size < GridMemoMax) gridMemo.putIfAbsent(path, built)
      built
    }
  }
}
