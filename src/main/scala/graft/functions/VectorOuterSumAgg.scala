package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sum of vector outer products Σ v·vᵀ as an algebraic aggregate, packed
  * as the row-major upper triangle (dim·(dim+1)/2 doubles) — the one-pass
  * second-moment matrix that PCA ([[graft.ops.Pca]]) turns into a
  * covariance.
  *
  * The point at scale: the Gram matrix of a 100 TB embedding corpus is
  * computed with map-side partial aggregation — every partition reduces
  * to ONE triangle buffer, the shuffle moves #partitions × dim²/2
  * doubles, and the driver receives a single row. The alternatives
  * (posexplode to (i, j, v_i·v_j) rows, or collecting vectors) move n×dim²
  * or n×dim values; at n=10⁹, dim=64 that is the difference between 16 KB
  * and terabytes through the shuffle.
  *
  * Null vectors are ignored (an all-null group evaluates to null);
  * mismatched dimensions throw — corrupt input should fail the job, not
  * mis-sum.
  */
case class VectorOuterSumAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  override def prettyName: String = "vec_outer_sum"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.resolved || (child.dataType match {
      case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("vec_outer_sum expects array<double> or array<float>")

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val d = arr.numElements()
    if (d == 0) return buf
    val row = new Array[Double](d)
    var i = 0
    while (i < d) { row(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i); i += 1 }
    val tri = d * (d + 1) / 2
    val out =
      if (buf.isEmpty) new Array[Double](tri)
      else { require(buf.length == tri, s"vec_outer_sum: mixed vector dimensions"); buf }
    var p = 0
    i = 0
    while (i < d) {
      val vi = row(i)
      var j = i
      while (j < d) { out(p) += vi * row(j); p += 1; j += 1 }
      i += 1
    }
    out
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"vec_outer_sum: mixed vector dimensions")
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

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorOuterSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorOuterSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VectorOuterSumAgg =
    copy(child = c(0))
}
