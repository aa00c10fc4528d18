package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-n buffer carrying an opaque serialized payload per entry.
  * Ordering matches `row_number() OVER (ORDER BY score DESC, id ASC)`.
  */
final class TopNRowsBuffer(val k: Int) {
  private var n = 0
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private val payloads = new Array[Array[Byte]](k)

  private def worseThan(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(id: Long, score: Double, payload: Array[Byte]): Unit = {
    if (n < k) {
      scores(n) = score; ids(n) = id; payloads(n) = payload; n += 1
      var i = n - 1
      while (i > 0 && worseThan(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (n > 0 && worseThan(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; payloads(0) = payload
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var worst = i
        if (l < n && worseThan(scores(l), ids(l), scores(worst), ids(worst))) worst = l
        if (r < n && worseThan(scores(r), ids(r), scores(worst), ids(worst))) worst = r
        if (worst == i) done = true else { swap(i, worst); i = worst }
      }
    }
  }

  private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val t = ids(a); ids(a) = ids(b); ids(b) = t
    val p = payloads(a); payloads(a) = payloads(b); payloads(b) = p
  }

  def size: Int = n
  def idAt(i: Int): Long = ids(i)
  def scoreAt(i: Int): Double = scores(i)
  def payloadAt(i: Int): Array[Byte] = payloads(i)

  /** (id, score, payload) best-first. */
  def sorted: IndexedSeq[(Long, Double, Array[Byte])] =
    (0 until n).map(i => (ids(i), scores(i), payloads(i)))
      .sortWith((a, b) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
}

object TopNRowsBuffer {
  /** Payload slot for the payload-free [[TopKAgg]]. */
  val NoPayload: Array[Byte] = Array.emptyByteArray

  /** Evaluate a foldable k literal, or -1 when it is null/non-integral
    * (reported by [[checkK]] as an analysis error, never an exception).
    */
  def literalK(kChild: org.apache.spark.sql.catalyst.expressions.Expression,
               fn: String): Int =
    scala.util.Try(kChild.eval(InternalRow.empty)).toOption.orNull match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
      case _ => -1
    }

  def checkK(inputsOk: Boolean,
             kChild: org.apache.spark.sql.catalyst.expressions.Expression,
             fn: String, usage: String): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (!inputsOk || !kChild.foldable) TypeCheckResult.TypeCheckFailure(usage)
    else if (literalK(kChild, fn) < 1)
      TypeCheckResult.TypeCheckFailure(s"$fn: k must be a literal integer >= 1")
    else TypeCheckResult.TypeCheckSuccess
  }
}

/** Grouped top-N rows: `topn_rows(id, payload, score, k)` returns
  * array<struct<id, score, payload>> best-first, ranked like
  * `row_number() OVER (PARTITION BY grp ORDER BY score DESC, id ASC)`.
  *
  * The classic training-pipeline shape — "keep the N best documents per
  * domain/language by quality" — as an algebraic aggregate: each input
  * partition keeps ≤N rows per group map-side, so the shuffle carries
  * N·partitions rows per group instead of every row. The window
  * formulation shuffles the entire corpus into group partitions first.
  * Payloads travel as UnsafeRow bytes inside the buffer.
  */
case class TopNRowsAgg(
    idChild: Expression,
    payloadChild: Expression,
    scoreChild: Expression,
    kChild: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopNRowsBuffer] {

  private lazy val k: Int = TopNRowsBuffer.literalK(kChild, "topn_rows")

  @transient private lazy val payloadProj =
    UnsafeProjection.create(Array(payloadChild.dataType))
  @transient private lazy val payloadHolder = new GenericInternalRow(1)

  override def prettyName: String = "topn_rows"
  override def children: Seq[Expression] = Seq(idChild, payloadChild, scoreChild, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType),
    StructField("payload", payloadChild.dataType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (!idChild.resolved || idChild.dataType == LongType || idChild.dataType == IntegerType) &&
      (!scoreChild.resolved || scoreChild.dataType == DoubleType || scoreChild.dataType == FloatType)
    TopNRowsBuffer.checkK(ok, kChild, "topn_rows",
      "topn_rows expects (id bigint, payload, score double, k literal int)")
  }

  override def createAggregationBuffer(): TopNRowsBuffer = new TopNRowsBuffer(k)

  override def update(buf: TopNRowsBuffer, input: InternalRow): TopNRowsBuffer = {
    val id = idChild.eval(input)
    val score = scoreChild.eval(input)
    if (id != null && score != null) {
      val scoreD = score match { case f: Float => f.toDouble; case d: Double => d }
      if (!scoreD.isNaN) {
        val idL = id match { case i: Int => i.toLong; case l: Long => l }
        payloadHolder.update(0, payloadChild.eval(input))
        // UnsafeProjection reuses its output row; copy the bytes out
        buf.add(idL, scoreD, payloadProj(payloadHolder).copy().getBytes)
      }
    }
    buf
  }

  override def merge(a: TopNRowsBuffer, b: TopNRowsBuffer): TopNRowsBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.idAt(i), b.scoreAt(i), b.payloadAt(i)); i += 1 }
    a
  }

  private def payloadValue(bytes: Array[Byte]): Any = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.get(0, payloadChild.dataType)
  }

  override def eval(buf: TopNRowsBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (id, s, p) =>
      new GenericInternalRow(Array[Any](id, s, payloadValue(p)))
    }.toArray[Any])

  override def serialize(buf: TopNRowsBuffer): Array[Byte] = {
    var total = 8
    var i = 0
    while (i < buf.size) { total += 20 + buf.payloadAt(i).length; i += 1 }
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.k).putInt(buf.size)
    i = 0
    while (i < buf.size) {
      bb.putLong(buf.idAt(i)).putDouble(buf.scoreAt(i))
      bb.putInt(buf.payloadAt(i).length).put(buf.payloadAt(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopNRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopNRowsBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val id = bb.getLong; val score = bb.getDouble
      val p = new Array[Byte](bb.getInt)
      bb.get(p)
      buf.add(id, score, p)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopNRowsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopNRowsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopNRowsAgg =
    copy(idChild = c(0), payloadChild = c(1), scoreChild = c(2), kChild = c(3))
}
