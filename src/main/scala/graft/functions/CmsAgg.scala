package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch (Cormode & Muthukrishnan 2005) over non-negative
  * 64-bit keys as an algebraic aggregate:
  * `cms_agg(key, depth, width)` → array<bigint> of depth·width counters,
  * row-major (hash row d occupies slots [d·width, (d+1)·width)). The
  * point estimate for key x is min over d of
  * counters[d·width + (x·A(d) + B(d)) mod width], and it NEVER
  * underestimates the true count — the classic one-sided error bound.
  *
  * The scale shape: heavy-hitter detection over 100 TB of events with
  * bounded memory. The exact `groupBy(key).count` alternative shuffles
  * one row per distinct key (billions for user/IP-style keys); this
  * aggregate reduces every input partition to ONE depth·width counter
  * array before the shuffle (merge = element-wise sum), so the shuffle
  * carries a few KB per partition regardless of key cardinality, and the
  * estimate lookup is a scan-side expression against the broadcast (or
  * literal) sketch.
  *
  * The hash rows are fixed public affine functions (x·A(d) + B(d)) mod
  * width with small prime constants — deliberately NOT seeded from
  * runtime state, so an external system (or a SQL oracle) can replay the
  * sketch bucket-for-bucket. Preconditions, enforced loudly: keys must
  * be non-negative and < 2^40 (keeps x·A(d) inside int64 for any engine
  * that errors on overflow rather than wrapping; pre-hash wider keys
  * down), depth ≤ 8, depth·width ≤ 2^22. Null keys are ignored.
  */
case class CmsAgg(
    child: Expression,
    depthE: Expression,
    widthE: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def prettyName: String = "cms_agg"
  override def children: Seq[Expression] = Seq(child, depthE, widthE)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(_.resolved)) TypeCheckResult.TypeCheckSuccess
    else if (child.dataType != LongType && child.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure("cms_agg expects a bigint/int key as input")
    else if (!depthE.foldable || !widthE.foldable)
      TypeCheckResult.TypeCheckFailure("cms_agg depth/width must be literals")
    else if (!Seq(depthE, widthE).forall(e => e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }))
      TypeCheckResult.TypeCheckFailure(
        "cms_agg depth/width must be integral literals, got " +
          s"(${depthE.dataType.simpleString}, ${widthE.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val depth: Int = {
    val d = depthE.eval().asInstanceOf[Number].intValue()
    require(d >= 1 && d <= CmsAgg.A.length,
      s"cms_agg depth $d out of range 1..${CmsAgg.A.length}")
    d
  }
  @transient private lazy val width: Int = {
    val w = widthE.eval().asInstanceOf[Number].intValue()
    require(w >= 1 && depth.toLong * w <= (1 << 22),
      s"cms_agg width $w out of range (depth*width must be <= 2^22)")
    w
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val key = v match { case i: Int => i.toLong; case l: Long => l }
    require(key >= 0 && key < (1L << 40),
      s"cms_agg key $key out of range [0, 2^40) — pre-hash wider keys")
    var d = 0
    while (d < depth) {
      buf(d * width + ((key * CmsAgg.A(d) + CmsAgg.B(d)) % width).toInt) += 1L
      d += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a.length == b.length, s"cms_agg: mixed sketch sizes (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsAgg =
    copy(child = c(0), depthE = c(1), widthE = c(2))
}

object CmsAgg {
  /** Per-row affine hash constants — small primes so x·A(d)+B(d) stays
    * inside int64 for keys < 2^40 on engines that error on overflow.
    * Public contract: changing these changes every stored sketch.
    */
  val A: Array[Long] = Array(31L, 131L, 523L, 2053L, 8191L, 32771L, 131071L, 524287L)
  val B: Array[Long] = Array(7L, 101L, 1009L, 10007L, 100003L, 611953L, 999983L, 414977L)
}
