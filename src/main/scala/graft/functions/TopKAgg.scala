package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: the k highest-scoring (id, score) pairs, ordered
  * by (score desc, id asc) — identical tie-break to
  * `row_number() OVER (ORDER BY score DESC, id)`.
  */
final class TopKBuffer(val k: Int) {
  // min-heap on (score asc, id desc): the root is the WORST kept entry
  private var n = 0
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)

  private def worseThan(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(pos: Int): Unit = {
    var i = pos
    while (i > 0 && worseThan(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      val p = (i - 1) / 2
      swap(i, p); i = p
    }
  }

  private def siftDown(pos: Int): Unit = {
    var i = pos
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var worst = i
      if (l < n && worseThan(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worseThan(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == i) done = true else { swap(i, worst); i = worst }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val t = ids(a); ids(a) = ids(b); ids(b) = t
  }

  def add(id: Long, score: Double): Unit =
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (n > 0 && worseThan(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown(0)
    }

  def size: Int = n
  def scoreAt(i: Int): Double = scores(i)
  def idAt(i: Int): Long = ids(i)

  /** (id, score) best-first. */
  def sorted: Array[(Long, Double)] =
    (0 until n).map(i => (ids(i), scores(i))).toArray
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
}

/** Aggregate top-k by score: returns array<struct<id long, score double>>
  * best-first, with `row_number`-compatible ordering (score desc, id asc).
  *
  * The point at scale: this is an algebraic aggregate, so Spark applies
  * it map-side — each input partition reduces to ≤k entries per group
  * BEFORE the shuffle. The window-function formulation
  * (`row_number().over(partitionBy(qid))`) must shuffle every scored row
  * to its group's partition; with a 100 TB corpus and a handful of query
  * groups that is the whole corpus through the wire into a few hot
  * partitions. This shuffles ≤ k·partitions rows per group instead.
  */
case class TopKAgg(
    idChild: Expression,
    scoreChild: Expression,
    kChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kChild.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"topk_by_score: k must be a literal int, got $other")
  }

  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(idChild, scoreChild, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (!idChild.resolved || idChild.dataType == LongType || idChild.dataType == IntegerType) &&
      (!scoreChild.resolved || scoreChild.dataType == DoubleType || scoreChild.dataType == FloatType) &&
      kChild.foldable
    if (!ok)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "topk_by_score expects (id bigint, score double, k literal int)")
    else if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: k must be >= 1, got $k")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idChild.eval(input)
    val score = scoreChild.eval(input)
    if (id != null && score != null) {
      val idL = id match { case i: Int => i.toLong; case l: Long => l }
      val scoreD = score match { case f: Float => f.toDouble; case d: Double => d }
      // NaN never ranks (cosine of a zero vector); letting one in would
      // poison the heap — every comparison against NaN is false, so a NaN
      // root would reject all later candidates.
      if (!scoreD.isNaN) buf.add(idL, scoreD)
    }
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.idAt(i), b.scoreAt(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (id, s) =>
      new GenericInternalRow(Array[Any](id, s))
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.idAt(i)).putDouble(buf.scoreAt(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(idChild = c(0), scoreChild = c(1), kChild = c(2))
}
