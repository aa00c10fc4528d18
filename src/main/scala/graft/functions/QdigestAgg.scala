package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Q-digest quantile sketch (Shrivastava, Buragohain, Agrawal, Suri —
  * SenSys 2004, "Medians and beyond") over 64-bit values as an
  * algebraic aggregate: `qdigest_agg(value, k)` → the sketch as
  * array<bigint> `[n, k, (level, prefix, count)*]`;
  * `qdigest_quantile(sketch, q)` reads a quantile back out.
  *
  * The scale shape: quantiles over 100 TB with HARD-BOUNDED state.
  * Exact percentiles aren't algebraic — Spark's `percentile` buffers
  * the group's VALUES, and the exact-histogram path ([[graft.streaming.MadStream]],
  * `ev_mad`) is bounded only by the value domain. The q-digest's state
  * is ≤ 3k tree nodes NO MATTER WHAT (map-side partials are k-bounded
  * before the shuffle, merge = count union + recompress), and unlike
  * sampling or randomized sketches (KLL, t-digest) its rank-error
  * guarantee is WORST-CASE, not probabilistic: a quantile query
  * returns a value whose true rank r satisfies
  * `q·n − (64/k)·n ≤ r ≤ q·n + (64/k)·n` on EVERY run, every merge
  * order, every partitioning (64 = log₂ of the value universe). That
  * determinism-of-the-GUARANTEE (the sketch bytes may differ across
  * merge orders; the bound never fails) is what lets the CORRECTNESS
  * twin pin literal `1`s for the bound checks while DuckDB recomputes
  * the exact side.
  *
  * Mechanics: values map order-preserving onto unsigned 64-bit space
  * (`v XOR Long.MinValue`); each input increments its leaf; when the
  * node map exceeds 6k the digest compresses — bottom-up, siblings
  * and parent merge whenever their combined count ≤ ⌊n/k⌋ (the
  * q-digest property) — back to the O(k) frontier. A quantile query
  * scans nodes by ascending upper bound (deeper node first on ties)
  * accumulating counts until ⌈q·n⌉ and reports that node's upper
  * bound, mapped back to signed space.
  *
  * Reference analog: none — the reference has no sketching; this
  * completes the engine's streaming-sketch family (Bloom, CMS heavy
  * hitters, KMV distinct) with the quantile member. Runs unchanged as
  * a complete-mode streaming aggregate (state = the sketch, the
  * [[CmsAgg]] contract).
  */
object Qdigest {

  val MaxK = 1 << 16

  /** Mutable digest buffer, primitive-keyed throughout — this runs
    * once per input ROW map-side, so the hot path must not box:
    *  - `leaves` holds level-64 counts keyed by the unsigned-mapped
    *    value itself (one LongMap probe per insert);
    *  - `inner` holds levels 0..63 keyed by the HEAP id 2^d + prefix
    *    (unique across levels because the highest set bit IS the
    *    level; the root is id 1). Inner nodes exist only after a
    *    compression, so inserts never touch this map.
    * A node at level d covers the 2^(64−d) unsigned values sharing its
    * top-d bits; level 64 = single values.
    */
  final class Buf(val k: Int) {
    var n: Long = 0L
    val leaves: mutable.LongMap[Long] = mutable.LongMap.empty
    val inner: mutable.LongMap[Long] = mutable.LongMap.empty

    def nodeCount: Int = leaves.size + inner.size

    def insert(v: Long): Unit = {
      val u = v ^ Long.MinValue
      leaves(u) = leaves.getOrElse(u, 0L) + 1L
      n += 1
      if (nodeCount > 6 * k) compress()
    }

    def mergeIn(o: Buf): Unit = {
      o.leaves.foreach { case (u, c) => leaves(u) = leaves.getOrElse(u, 0L) + c }
      o.inner.foreach { case (id, c) => inner(id) = inner.getOrElse(id, 0L) + c }
      n += o.n
      if (nodeCount > 6 * k) compress()
    }

    /** Bottom-up merge under the ⌊n/k⌋ threshold: at each level
      * (descending), the children of a parent fold into it whenever
      * children + parent ≤ ⌊n/k⌋ — absent siblings count 0, exactly
      * the q-digest property. Leaves every stored non-leaf violating
      * the merge condition, so the node count is O(k). One grouping
      * pass per level; folds only ever create parent-level nodes, so
      * the single deepest-first sweep reaches the fixpoint.
      */
    def compress(): Unit = {
      val t = n / k // ⌊n/k⌋: at t = 0 nothing may merge — small inputs stay EXACT
      if (t == 0) return
      // level 64: leaf pairs fold into their level-63 parent
      if (leaves.nonEmpty) {
        val byParent = mutable.LongMap.empty[Long]
        leaves.foreach { case (u, c) =>
          val p = u >>> 1
          byParent(p) = byParent.getOrElse(p, 0L) + c
        }
        byParent.foreach { case (p, cSum) =>
          val parId = (1L << 63) | p
          val cp = inner.getOrElse(parId, 0L)
          if (cSum + cp <= t) {
            leaves.remove(p << 1)
            leaves.remove((p << 1) | 1L)
            inner(parId) = cSum + cp
          }
        }
      }
      // levels 63..1: heap ids bucketed by level once; folds append
      // their (possibly pre-existing) parent id to the next bucket —
      // deduped at grouping time
      val byLevel = Array.fill(64)(mutable.ArrayBuffer.empty[Long])
      inner.foreach { case (id, _) => byLevel(levelOf(id)) += id }
      var d = 63
      while (d >= 1) {
        val ids = byLevel(d)
        if (ids.nonEmpty) {
          val byParent = mutable.LongMap.empty[Long]
          ids.distinct.foreach { id =>
            val c = inner.getOrElse(id, -1L)
            if (c >= 0) {
              val prefix = id ^ (1L << d)
              byParent((1L << (d - 1)) | (prefix >>> 1)) =
                byParent.getOrElse((1L << (d - 1)) | (prefix >>> 1), 0L) + c
            }
          }
          byParent.foreach { case (parId, cSum) =>
            val cp = inner.getOrElse(parId, 0L)
            if (cSum + cp <= t) {
              val parPrefix = parId ^ (1L << (d - 1))
              inner.remove((1L << d) | (parPrefix << 1))
              inner.remove((1L << d) | (parPrefix << 1) | 1L)
              inner(parId) = cSum + cp
              byLevel(d - 1) += parId
            }
          }
        }
        d -= 1
      }
    }
  }

  /** Level of a heap node id (the index of its highest set bit). */
  private def levelOf(id: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(id)

  /** (level, canonical lo, count) triples of a buffer — the serialized
    * node form shared by eval/serialize.
    */
  private[functions] def triplesOf(buf: Buf): Array[(Int, Long, Long)] = {
    val out = new Array[(Int, Long, Long)](buf.nodeCount)
    var i = 0
    buf.leaves.foreach { case (u, c) => out(i) = (64, u, c); i += 1 }
    buf.inner.foreach { case (id, c) =>
      val d = levelOf(id)
      val prefix = id ^ (1L << d)
      out(i) = (d, if (d == 0) 0L else prefix << (64 - d), c)
      i += 1
    }
    out
  }

  /** Quantile in SIGNED space from the serialized sketch triples:
    * nodes by ascending unsigned upper bound (deeper first on ties),
    * accumulate to ⌈q·n⌉.
    */
  /** Unsigned upper bound of node (lo, level). NB `1L << 64` wraps to
    * 1 on the JVM (shift counts are mod 64), so the root (level 0,
    * covering everything) is special-cased to all-ones.
    */
  private def hiOf(lo: Long, level: Int): Long =
    if (level >= 64) lo
    else if (level <= 0) -1L
    else lo | ((1L << (64 - level)) - 1)

  def quantile(n: Long, triples: Array[(Int, Long, Long)], q: Double): Long = {
    val target = math.max(1L, math.ceil(q * n).toLong)
    val sorted = triples.sortWith { (a, b) =>
      val c = java.lang.Long.compareUnsigned(hiOf(a._2, a._1), hiOf(b._2, b._1))
      if (c != 0) c < 0 else a._1 > b._1
    }
    var acc = 0L
    var i = 0
    while (i < sorted.length) {
      acc += sorted(i)._3
      if (acc >= target) return hiOf(sorted(i)._2, sorted(i)._1) ^ Long.MinValue
      i += 1
    }
    // all counts exhausted below target (q = 1 rounding): max node hi
    val last = sorted.last
    hiOf(last._2, last._1) ^ Long.MinValue
  }
}

case class QdigestAgg(
    child: Expression,
    kChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Qdigest.Buf] {

  override def prettyName: String = "qdigest_agg"
  override def children: Seq[Expression] = Seq(child, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(_.resolved)) TypeCheckResult.TypeCheckSuccess
    else if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("qdigest_agg expects a bigint/int value")
    else if (!kChild.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType).contains(kChild.dataType))
      TypeCheckResult.TypeCheckFailure("qdigest_agg k must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val k: Int = {
    val n = kChild.eval().asInstanceOf[Number].intValue()
    require(n >= 16 && n <= Qdigest.MaxK, s"qdigest_agg k $n out of range 16..${Qdigest.MaxK}")
    n
  }

  override def createAggregationBuffer(): Qdigest.Buf = new Qdigest.Buf(k)

  override def update(buf: Qdigest.Buf, input: InternalRow): Qdigest.Buf = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: Qdigest.Buf, b: Qdigest.Buf): Qdigest.Buf = {
    a.mergeIn(b); a
  }

  override def eval(buf: Qdigest.Buf): Any = {
    buf.compress()
    val triples = Qdigest.triplesOf(buf)
      .sortBy { case (d, lo, _) => (d, lo ^ Long.MinValue) } // deterministic order
    val out = new Array[Long](2 + 3 * triples.length)
    out(0) = buf.n
    out(1) = buf.k.toLong
    var i = 2
    triples.foreach { case (d, lo, c) =>
      out(i) = d.toLong; out(i + 1) = lo; out(i + 2) = c; i += 3
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Qdigest.Buf): Array[Byte] = {
    buf.compress() // shuffle k-bounded partials, never raw leaves
    val triples = Qdigest.triplesOf(buf)
    val bb = ByteBuffer.allocate(8 + 4 + 4 + 17 * triples.length)
    bb.putLong(buf.n).putInt(buf.k).putInt(triples.length)
    triples.foreach { case (d, lo, c) => bb.put(d.toByte).putLong(lo).putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Qdigest.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong
    val kk = bb.getInt
    val size = bb.getInt
    val buf = new Qdigest.Buf(kk)
    buf.n = n
    var i = 0
    while (i < size) {
      val d = bb.get().toInt
      val lo = bb.getLong
      val c = bb.getLong
      if (d == 64) buf.leaves(lo) = buf.leaves.getOrElse(lo, 0L) + c
      else {
        val id = (1L << d) | (if (d == 0) 0L else lo >>> (64 - d))
        buf.inner(id) = buf.inner.getOrElse(id, 0L) + c
      }
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QdigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QdigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): QdigestAgg =
    copy(child = c(0), kChild = c(1))
}

/** `qdigest_quantile(sketch, q)` → bigint: the q-quantile read from a
  * [[QdigestAgg]] sketch. Null on an empty sketch; q must be in [0, 1].
  */
case class QdigestQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "qdigest_quantile"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (!left.resolved || !right.resolved) TypeCheckResult.TypeCheckSuccess
    else if (!left.dataType.isInstanceOf[ArrayType] ||
        left.dataType.asInstanceOf[ArrayType].elementType != LongType)
      TypeCheckResult.TypeCheckFailure("qdigest_quantile expects an array<bigint> sketch")
    else if (right.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure("qdigest_quantile q must be a double")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(sketch: Any, q: Any): Any = {
    val arr = sketch.asInstanceOf[ArrayData].toLongArray()
    val qq = q.asInstanceOf[Double]
    require(qq >= 0.0 && qq <= 1.0, s"quantile $qq outside [0, 1]")
    if (arr.length < 5 || arr(0) == 0L) null
    else {
      val triples = Array.tabulate((arr.length - 2) / 3) { i =>
        (arr(2 + 3 * i).toInt, arr(3 + 3 * i), arr(4 + 3 * i))
      }
      Qdigest.quantile(arr(0), triples, qq)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): QdigestQuantile =
    copy(left = l, right = r)
}
