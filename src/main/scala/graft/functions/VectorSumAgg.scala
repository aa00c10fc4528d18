package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Elementwise sum of `array<double>` vectors as an algebraic aggregate.
  *
  * The point at scale: each partition reduces to ONE dim-length array per
  * group before the shuffle (map-side partial aggregation), and a grouped
  * mean over nlist clusters hands the driver nlist rows of dim doubles —
  * not the nlist×dim exploded (cluster, dim, value) rows a
  * posexplode+groupBy(cluster, dim) formulation collects. Used by the IVF
  * Lloyd step (graft.ops.Ann.ivfTopK), where at nlist=65536, dim=1024 the
  * difference is 64 k rows vs 67 M rows through the driver per iteration.
  *
  * Null vectors are ignored (an all-null group evaluates to null);
  * mismatched dimensions throw — corrupt input should fail the job, not
  * mis-sum.
  */
case class VectorSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "vec_sum"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.resolved || (child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("vec_sum expects array<double> or array<float>")

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  /** Empty array = "no input seen yet" sentinel (a real vector sum always
    * has the input's dimension ≥ 1 … a genuinely zero-length input vector
    * also stays "empty", which sums to the empty vector = null, fine).
    */
  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n == 0) return buf
    if (buf.isEmpty) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i); i += 1 }
      out
    } else {
      require(buf.length == n, s"vec_sum: mixed vector dimensions (${buf.length} vs $n)")
      var i = 0
      while (i < n) { buf(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)); i += 1 }
      buf
    }
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"vec_sum: mixed vector dimensions (${a.length} vs ${b.length})")
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(buf.length)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Double](bb.getInt)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorSumAgg =
    copy(child = c(0))
}
