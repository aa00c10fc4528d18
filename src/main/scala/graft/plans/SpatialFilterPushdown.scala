package graft.plans

import graft.functions.GeomFn
import graft.geom.{Extent, GeomIO}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.locationtech.jts.geom.Envelope

/** Rewrites spatial predicates over Extent struct columns into plain
  * range predicates on the struct's fields, so they reach the parquet
  * scan as PushedFilters (row-group min/max pruning — with Z2-sorted file
  * layout this is what makes spatial filters prune IO at 100 TB).
  *
  *   st_intersects(ext, lit)  →  ext.xmin <= env.xmax AND ext.xmax >= env.xmin
  *                               AND ext.ymin <= env.ymax AND ext.ymax >= env.ymin
  *                               [AND original predicate when lit is a
  *                                non-rectangular geometry — exact residual]
  *   st_contains(ext, lit)    →  envelope-containment ranges AND original
  *                               (JTS boundary semantics need the residual)
  *
  * Same optimization as the reference's
  * spatial-index/.../spark/sql/rules/STIntersectsRule.scala:40 /
  * STContainsRule.scala, expressed as a plain Rule[LogicalPlan] over
  * graft's native expressions instead of Hive UDF nodes. The rewrite is
  * an equivalence (the ranges are implied by the predicate, and
  * null-in → null-out is preserved by GetStructField's null propagation),
  * so it is safe anywhere in the condition tree, including under NOT.
  */
object SpatialFilterPushdown extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case g @ GeomFn(name, _, Seq(a, b))
            if (name == "st_intersects" || name == "st_contains") && g.resolved =>
          rewriteIfPossible(name, g, a, b).getOrElse(g)
      }
      if (rewritten.fastEquals(cond)) f else Filter(rewritten, child)
  }

  /** Applies when one argument is an Extent-typed column expression and
    * the other folds to a constant (geometry or extent literal).
    */
  private def rewriteIfPossible(
      name: String, original: GeomFn, a: Expression, b: Expression): Option[Expression] = {
    if (Extent.isExtentType(a.dataType) && !a.foldable && b.foldable)
      rewrite(name, original, extCol = a, litExpr = b)
    else if (Extent.isExtentType(b.dataType) && !b.foldable && a.foldable && name == "st_intersects")
      // st_intersects is symmetric; st_contains(geomLit, extCol) is not
      // an extent-side containment and is left alone.
      rewrite(name, original, extCol = b, litExpr = a)
    else None
  }

  private def rewrite(
      name: String, original: GeomFn, extCol: Expression, litExpr: Expression): Option[Expression] = {
    val value = try litExpr.eval(InternalRow.empty) catch { case _: Exception => null }
    if (value == null) return None
    val (env, exactBox) = litExpr.dataType match {
      case dt if Extent.isExtentType(dt) =>
        val r = value.asInstanceOf[InternalRow]
        (new Envelope(r.getDouble(0), r.getDouble(2), r.getDouble(1), r.getDouble(3)), true)
      case _ =>
        val geom = GeomIO.fromWKB(value.asInstanceOf[Array[Byte]])
        (geom.getEnvelopeInternal, geom.isRectangle)
    }
    def field(i: Int, fname: String) = GetStructField(extCol, i, Some(fname))
    val xmin = field(0, "xmin"); val ymin = field(1, "ymin")
    val xmax = field(2, "xmax"); val ymax = field(3, "ymax")

    val ranges = name match {
      case "st_intersects" => Seq(
        LessThanOrEqual(xmin, Literal(env.getMaxX)),
        GreaterThanOrEqual(xmax, Literal(env.getMinX)),
        LessThanOrEqual(ymin, Literal(env.getMaxY)),
        GreaterThanOrEqual(ymax, Literal(env.getMinY)))
      case "st_contains" => Seq(
        LessThanOrEqual(xmin, Literal(env.getMinX)),
        GreaterThanOrEqual(xmax, Literal(env.getMaxX)),
        LessThanOrEqual(ymin, Literal(env.getMinY)),
        GreaterThanOrEqual(ymax, Literal(env.getMaxY)))
    }
    val rangePred = ranges.reduce(And)
    // Box-box intersects is exactly the range test (closed semantics both
    // sides); everything else keeps the original predicate as the exact
    // residual — it is evaluated only on rows surviving the ranges.
    val exact = name == "st_intersects" && exactBox
    Some(if (exact) rangePred else And(rangePred, original))
  }
}
