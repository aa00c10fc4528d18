package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.StructType

/** A user-defined table function's row expansion — the one method
  * Hive's GenericUDTF asks for (process(args) → forward(row);
  * reference: core/HGenericUDTF.scala:1, HUDTF.scala:1), Spark-first:
  * [[FunctionRegistration.registerGenerator]] wraps it in the engine's
  * own [[org.apache.spark.sql.catalyst.expressions.Generator]]
  * machinery, so the user function runs under the same GenerateExec
  * operator as `explode`/`inline` — streamed row expansion, no
  * materialized intermediate, callable from SQL both generator-style
  * (`SELECT my_gen(col) FROM t`) and `LATERAL VIEW my_gen(col) g AS
  * a, b`.
  *
  * `eval` is called once per input row with the arguments as EXTERNAL
  * Scala types (String, Seq, Row — the registerAggregate convention)
  * and returns the OUTPUT ROWS: each element a `Row`, a `Product`
  * (tuple/case class) or a `Seq` in declared-field order for
  * multi-column schemas, or the bare value for a single-column schema.
  * `terminate` (Hive's close()) emits trailing rows once per partition
  * after the last input row — its output rows have NULL for the
  * generator's input-derived columns upstream of Generate, exactly
  * like Hive's.
  */
abstract class UserGeneratorSpec extends Serializable {
  def eval(args: Seq[Any]): IterableOnce[Any]
  def terminate(): IterableOnce[Any] = Nil
}

/** The Catalyst wrapper [[FunctionRegistration.registerGenerator]]
  * builds around a [[UserGeneratorSpec]]: a [[Generator]] with
  * external-type conversion at the boundary (the [[UserAgg]] trade —
  * ergonomics over the last bit of codegen speed; row expansion is
  * dominated by the user's own per-row work).
  */
case class UserGenerator(
    name: String,
    spec: UserGeneratorSpec,
    output: StructType,
    accepts: Seq[org.apache.spark.sql.types.DataType],
    children: Seq[Expression])
  extends Generator with CodegenFallback {

  override def prettyName: String = name
  override def elementSchema: StructType = output

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
  @transient private lazy val fieldConv =
    output.fields.map(f =>
      org.apache.spark.sql.GraftBridge.toCatalystConverter(f.dataType))
      .toIndexedSeq

  private def toRow(v: Any): InternalRow = {
    val vals: Seq[Any] = v match {
      case r: org.apache.spark.sql.Row => r.toSeq
      case p: Product if output.size > 1 => p.productIterator.toSeq
      case s: Seq[_] if output.size > 1 => s
      case x => Seq(x)
    }
    require(vals.size == output.size,
      s"$name: spec returned ${vals.size} fields for a ${output.size}-column schema")
    val arr = new Array[Any](vals.size)
    var i = 0
    vals.foreach { x =>
      arr(i) = if (x == null) null else fieldConv(i)(x)
      i += 1
    }
    new GenericInternalRow(arr)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val args = new Array[Any](children.size)
    var i = 0
    while (i < args.length) {
      args(i) = toScala(i)(children(i).eval(input))
      i += 1
    }
    spec.eval(scala.collection.immutable.ArraySeq.unsafeWrapArray(args))
      .iterator.map(toRow)
  }

  override def terminate(): IterableOnce[InternalRow] =
    spec.terminate().iterator.map(toRow)

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): UserGenerator = copy(children = c)
}
