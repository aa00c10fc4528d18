package graft.functions

import graft.geom.GeometryUDT
import java.lang.invoke.{MethodHandle, MethodHandles}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen._
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Declarative spec of one overload of a graft SQL function: the
  * static method implementing it (on [[GeomImpl]] by default, or any
  * class named by `implClass` for user-registered functions — see
  * [[FunctionRegistration.registerFunction]]) and its Catalyst types.
  * `boxed` marks methods returning a boxed primitive where JVM null means
  * SQL NULL (e.g. st_x on a non-point).
  */
case class FnSpec(
    method: String,
    dataType: DataType,
    inputTypes: Seq[DataType],
    boxed: Boolean = false,
    implClass: String = GeomFn.ImplClass)

/** The one Catalyst Expression class behind every graft scalar function.
  *
  * A function is a name plus one or more typed overloads ([[FnSpec]]);
  * the overload is chosen from the resolved child types (e.g.
  * st_intersects over geometry×geometry vs extent×geometry). Interpreted
  * eval goes through a cached MethodHandle; doGenCode emits a direct
  * static call to the same [[GeomImpl]] method, so these stay inside
  * whole-stage codegen (no virtual eval dispatch, no boxed primitive
  * args). This replaces the reference's Hive UDF wrapper layer
  * (core/src/main/scala/com/azavea/hiveless/HUDF.scala:1) with native
  * Catalyst machinery.
  */
case class GeomFn(name: String, variants: Seq[FnSpec], children: Seq[Expression])
    extends Expression with ImplicitCastInputTypes {

  @transient private lazy val resolvedSpec: Option[FnSpec] =
    variants.find { v =>
      v.inputTypes.size == children.size &&
        children.zip(v.inputTypes).forall { case (c, t) =>
          c.resolved && GeomFn.compatible(c.dataType, t)
        }
    }

  private def specOrHead: FnSpec = resolvedSpec.getOrElse(variants.head)

  override def prettyName: String = name
  // Print as st_fn(child, ...) — without this, TreeNode dumps the whole
  // variant table into every explain string.
  override def stringArgs: Iterator[Any] = children.iterator
  override def dataType: DataType = specOrHead.dataType
  override def nullable: Boolean = true

  /** Padded/truncated to children.size: the ImplicitTypeCasts rule zips
    * children with inputTypes and rebuilds the child list, so a length
    * mismatch (user arity error) must not silently drop children — the
    * arity error is reported by checkInputDataTypes instead.
    */
  override def inputTypes: Seq[DataType] = {
    val base = specOrHead.inputTypes
    if (base.size == children.size) base
    else if (base.size > children.size) base.take(children.size)
    else base ++ Seq.fill(children.size - base.size)(NullType)
  }
  override def foldable: Boolean = children.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult =
    resolvedSpec match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case None => TypeCheckResult.TypeCheckFailure(
        s"$name cannot be applied to (${children.map(_.dataType.simpleString).mkString(", ")}); " +
          s"expected one of: ${variants.map(_.inputTypes.map(_.simpleString).mkString("(", ", ", ")")).mkString("; ")}")
    }

  @transient private lazy val handle: MethodHandle = {
    val s = specOrHead
    GeomFn.handle(s.implClass, s.method, s.inputTypes.size)
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val args = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      args.add(v.asInstanceOf[AnyRef])
      i += 1
    }
    handle.invokeWithArguments(args)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spec = specOrHead
    val evals = children.map(_.genCode(ctx))
    val childCode: Block = blocksToBlock(evals.map(_.code))
    val nonNull =
      if (evals.isEmpty) "true"
      else evals.map(e => s"!${e.isNull}").mkString(" && ")
    val argList = evals.map(_.value).mkString(", ")
    val impl = spec.implClass
    val call =
      if (spec.boxed) {
        val boxedT = CodeGenerator.boxedType(dataType)
        s"""$boxedT r = $impl.${spec.method}($argList);
           |if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }""".stripMargin
      } else if (CodeGenerator.isPrimitiveType(dataType)) {
        s"${ev.value} = $impl.${spec.method}($argList);"
      } else {
        s"""${ev.value} = (${CodeGenerator.javaType(dataType)}) $impl.${spec.method}($argList);
           |${ev.isNull} = (${ev.value} == null);""".stripMargin
      }
    ev.copy(code =
      code"""
            |$childCode
            |boolean ${ev.isNull} = true;
            |${CodeGenerator.javaType(dataType)} ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
            |if ($nonNull) {
            |  ${ev.isNull} = false;
            |  $call
            |}
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object GeomFn {
  val ImplClass = "graft.functions.GeomImpl"

  def apply(name: String, spec: FnSpec, children: Seq[Expression]): GeomFn =
    GeomFn(name, Seq(spec), children)

  /** Type compatibility with geometry-slot special cases: a geometry
    * argument accepts both GeometryUDT-typed and raw-WKB BinaryType
    * columns (identical internal representation).
    */
  def compatible(actual: DataType, expected: DataType): Boolean = expected match {
    case _: GeometryUDT => actual.isInstanceOf[GeometryUDT] || actual == BinaryType
    case ArrayType(_: GeometryUDT, _) => actual match {
      case ArrayType(et, _) => et.isInstanceOf[GeometryUDT] || et == BinaryType
      case _                => false
    }
    case dt => GraftBridge.accepts(dt, actual)
  }

  private val lookup = MethodHandles.publicLookup()
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, MethodHandle]()

  def handle(implClassName: String, method: String, arity: Int): MethodHandle =
    cache.computeIfAbsent(s"$implClassName#$method/$arity", _ => {
      val cls = Class.forName(implClassName)
      val jm = cls.getMethods
        .find(x => x.getName == method && x.getParameterCount == arity &&
          java.lang.reflect.Modifier.isStatic(x.getModifiers))
        .getOrElse(throw new IllegalStateException(
          s"$implClassName.$method/$arity: no public static method found"))
      lookup.unreflect(jm)
    })
}
