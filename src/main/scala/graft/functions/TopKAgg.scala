package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregate top-k by score: returns array<struct<id long, score double>>
  * best-first, with `row_number`-compatible ordering (score desc, id asc).
  * The payload-free twin of [[TopNRowsAgg]] — both share
  * [[TopNRowsBuffer]]'s bounded heap, so ranking/tie-break/NaN semantics
  * can never diverge.
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
  extends TypedImperativeAggregate[TopNRowsBuffer] {

  private lazy val k: Int = TopNRowsBuffer.literalK(kChild, "topk_by_score")

  override def prettyName: String = "topk_by_score"
  override def children: Seq[Expression] = Seq(idChild, scoreChild, kChild)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType))))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (!idChild.resolved || idChild.dataType == LongType || idChild.dataType == IntegerType) &&
      (!scoreChild.resolved || scoreChild.dataType == DoubleType || scoreChild.dataType == FloatType)
    TopNRowsBuffer.checkK(ok, kChild, "topk_by_score",
      "topk_by_score expects (id bigint, score double, k literal int)")
  }

  override def createAggregationBuffer(): TopNRowsBuffer = new TopNRowsBuffer(k)

  override def update(buf: TopNRowsBuffer, input: InternalRow): TopNRowsBuffer = {
    val id = idChild.eval(input)
    val score = scoreChild.eval(input)
    if (id != null && score != null) {
      val idL = id match { case i: Int => i.toLong; case l: Long => l }
      val scoreD = score match { case f: Float => f.toDouble; case d: Double => d }
      // NaN never ranks (cosine of a zero vector); letting one in would
      // poison the heap — every comparison against NaN is false, so a NaN
      // root would reject all later candidates.
      if (!scoreD.isNaN) buf.add(idL, scoreD, TopNRowsBuffer.NoPayload)
    }
    buf
  }

  override def merge(a: TopNRowsBuffer, b: TopNRowsBuffer): TopNRowsBuffer = {
    var i = 0
    while (i < b.size) { a.add(b.idAt(i), b.scoreAt(i), TopNRowsBuffer.NoPayload); i += 1 }
    a
  }

  override def eval(buf: TopNRowsBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (id, s, _) =>
      new GenericInternalRow(Array[Any](id, s))
    }.toArray[Any])

  override def serialize(buf: TopNRowsBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.idAt(i)).putDouble(buf.scoreAt(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopNRowsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopNRowsBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble, TopNRowsBuffer.NoPayload); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(idChild = c(0), scoreChild = c(1), kChild = c(2))
}
