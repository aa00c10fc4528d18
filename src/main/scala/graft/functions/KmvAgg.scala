package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch as an algebraic aggregate:
  * `kmv_agg(hash, k)` → the k SMALLEST DISTINCT non-null hash values,
  * sorted ascending (fewer if the group has fewer distinct values).
  *
  * The scale shape this exists for is SET comparison without set
  * materialization: `dd_overlap`'s exact matrix needs the distinct
  * (key, source) pairs shuffled and self-joined — at 100 TB that's a
  * corpus-sized shuffle per run. The KMV sketch replaces it with ONE
  * scan-side aggregate whose state is ≤ k longs per source (the merge
  * keeps the k smallest of a union, so map-side partials are k-bounded
  * and the shuffle carries |sources|·k values, never the keys). Pairwise
  * Jaccard is then estimated from the tiny per-source sketches alone:
  * among the k smallest values of the merged pair, the fraction present
  * in BOTH sketches is an unbiased estimate of J(A,B) (Beyer et al.,
  * SIGMOD 2007, "On synopses for distinct-value estimation under
  * multiset operations" — the bottom-k coordinated-sample argument).
  *
  * Determinism contract: the sketch is a pure function of the input's
  * distinct hash SET (insertion order, partitioning and merge order are
  * irrelevant — a TreeSet of the k global minima), so an external engine
  * that can order the same hash values replays the sketch, the merged
  * bottom-k, and the estimate bit-for-bit. Use a hash both engines
  * compute identically (the md5-prefix family, not xxhash64).
  *
  * Reference analog: none — the reference has no sketching; this is the
  * engine-side scale path for its exact set-overlap reports.
  */
case class KmvAgg(
    child: Expression,
    kChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def prettyName: String = "kmv_agg"
  override def children: Seq[Expression] = Seq(child, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(_.resolved)) TypeCheckResult.TypeCheckSuccess
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("kmv_agg expects a bigint hash as input")
    else if (!kChild.foldable ||
        !Seq[DataType](IntegerType, LongType, ShortType).contains(kChild.dataType))
      TypeCheckResult.TypeCheckFailure("kmv_agg k must be an integer literal")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val k: Int = {
    val n = kChild.eval().asInstanceOf[Number].intValue()
    require(n >= 1 && n <= (1 << 20), s"kmv_agg k $n out of range 1..2^20")
    n
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) { if (buf.add(v)) { buf.pollLast(); () } }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
                     b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvAgg =
    copy(child = c(0), kChild = c(1))
}
