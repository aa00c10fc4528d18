package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.DataType

/** A user-defined aggregate's lifecycle — the four methods Hive's
  * GenericUDAFEvaluator asks for (init/iterate/merge/terminate;
  * reference: core/HGenericUDAFEvaluator.scala:1), Spark-first: the
  * implementation runs inside the engine's own
  * [[TypedImperativeAggregate]] machinery via [[UserAgg]], so it gets
  * map-side partial aggregation, ObjectHashAggregate exec, and
  * spill-safe shuffle of SERIALIZED buffers for free — the user writes
  * only the algebra.
  *
  * Values cross the boundary as EXTERNAL Scala types (String, Seq, Row,
  * boxed numerics — the types `collect()` returns), converted from the
  * Catalyst internals per row; that conversion is the ergonomic tax a
  * user extension pays vs a native built-in (the same trade
  * [[FunctionRegistration.registerFunction]] documents the other way —
  * there the user targets internal types for codegen speed; an
  * aggregate's per-row work is usually dominated by its own state
  * update, so external types are the right default here).
  *
  * The buffer `B` must be `java.io.Serializable` unless
  * [[serialize]]/[[deserialize]] are overridden (partials cross the
  * shuffle in serialized form — override with a compact binary codec
  * when state is large; Java serialization is the zero-code default).
  * `update` and `merge` may mutate and return their left argument (the
  * built-ins' contract). Nulls reach `update` as Scala `null` — filter
  * or fold them per the aggregate's semantics (the Hive contract; the
  * engine does NOT pre-drop null rows).
  */
abstract class UserAggregateSpec[B] extends Serializable {
  def init(): B
  def update(buf: B, args: Seq[Any]): B
  def merge(a: B, b: B): B
  /** Final result in the EXTERNAL representation of the registered
    * return type; null → SQL NULL.
    */
  def finish(buf: B): Any

  def serialize(buf: B): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(buf); oos.close()
    bos.toByteArray
  }
  def deserialize(bytes: Array[Byte]): B =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[B]
}

/** The Catalyst wrapper [[FunctionRegistration.registerAggregate]]
  * builds around a [[UserAggregateSpec]]: a TypedImperativeAggregate
  * whose buffer is the user's own object, with input/output value
  * conversion at the boundary. Same physical shape as the built-in
  * sketch aggregates (QdigestAgg etc.): ObjectHashAggregate, partial →
  * shuffle of serialized buffers → final merge.
  */
case class UserAgg(
    name: String,
    spec: UserAggregateSpec[Any],
    returns: DataType,
    accepts: Seq[DataType],
    children: Seq[Expression],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Any] {

  override def prettyName: String = name
  override def nullable: Boolean = true
  override def dataType: DataType = returns

  override def checkInputDataTypes(): TypeCheckResult =
    if (!children.forall(_.resolved)) TypeCheckResult.TypeCheckSuccess
    else if (children.size != accepts.size)
      TypeCheckResult.TypeCheckFailure(
        s"$name expects ${accepts.size} arguments, got ${children.size}")
    else children.map(_.dataType).zip(accepts).zipWithIndex.collectFirst {
      case ((got, want), i)
          if !org.apache.spark.sql.GraftBridge.accepts(want, got) =>
        TypeCheckResult.TypeCheckFailure(
          s"$name argument ${i + 1} expects ${want.simpleString}, got ${got.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  @transient private lazy val toScala =
    accepts.map(org.apache.spark.sql.GraftBridge.toScalaConverter).toIndexedSeq
  @transient private lazy val toCatalyst =
    org.apache.spark.sql.GraftBridge.toCatalystConverter(returns)

  override def createAggregationBuffer(): Any = spec.init()

  override def update(buf: Any, input: InternalRow): Any = {
    val args = new Array[Any](children.size)
    var i = 0
    while (i < args.length) {
      args(i) = toScala(i)(children(i).eval(input))
      i += 1
    }
    spec.update(buf, scala.collection.immutable.ArraySeq.unsafeWrapArray(args))
  }

  override def merge(a: Any, b: Any): Any = spec.merge(a, b)

  override def eval(buf: Any): Any = {
    val r = spec.finish(buf)
    if (r == null) null else toCatalyst(r)
  }

  override def serialize(buf: Any): Array[Byte] = spec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Any = spec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): UserAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UserAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): UserAgg =
    copy(children = c)
}
