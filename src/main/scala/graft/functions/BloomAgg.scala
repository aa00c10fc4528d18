package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bloom filter over 64-bit element hashes as an algebraic aggregate:
  * `bloom_agg(hash, numBits, numHashes)` → the filter's byte[] bitset.
  *
  * The scale shape this exists for is INCREMENTAL ingest dedup: build the
  * filter over the historical corpus once (map-side partial filters OR
  * together — the merge is a byte-wise OR, so the shuffle carries one
  * m-bit buffer per partition, never the rows), broadcast the result, and
  * gate incoming rows with [[GeomImpl.bloomContains]]. Only the
  * maybe-duplicate survivors (true dups + the fp rate) pay the exact
  * verification join against history; a Bloom "no" is definitive, so the
  * bulk of a mostly-novel batch never shuffles at all.
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing (public):
  * bit_i = (h1 + i·h2) mod m with h2 forced odd, h1 = the input hash.
  * numBits is rounded up to a whole byte and the EFFECTIVE m is implied
  * by the emitted array's length, so build and probe can never disagree
  * on the filter geometry. Null hashes are ignored. numBits/numHashes
  * must be foldable (they size the buffer before any input is seen).
  */
case class BloomAgg(
    child: Expression,
    numBits: Expression,
    numHashes: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def prettyName: String = "bloom_agg"
  override def children: Seq[Expression] = Seq(child, numBits, numHashes)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(_.resolved)) TypeCheckResult.TypeCheckSuccess
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure("bloom_agg expects a bigint hash as input")
    else if (!numBits.foldable || !numHashes.foldable)
      TypeCheckResult.TypeCheckFailure("bloom_agg numBits/numHashes must be literals")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val mBytes: Int = {
    val bits = numBits.eval().asInstanceOf[Number].longValue()
    require(bits > 0 && bits <= (Int.MaxValue.toLong - 8) * 8,
      s"bloom_agg numBits $bits out of range (shard the corpus for larger filters)")
    ((bits + 7) / 8).toInt
  }
  @transient private lazy val k: Int = {
    val n = numHashes.eval().asInstanceOf[Number].intValue()
    require(n >= 1 && n <= 32, s"bloom_agg numHashes $n out of range 1..32")
    n
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](mBytes)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h1 = v.asInstanceOf[Long]
    val m = buf.length.toLong * 8L
    val h2 = (h1 >>> 32) | 1L
    var i = 0
    while (i < k) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      buf((pos >>> 3).toInt) = (buf((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, s"bloom_agg: mixed filter sizes (${a.length} vs ${b.length})")
    var i = 0
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0), numBits = c(1), numHashes = c(2))
}
