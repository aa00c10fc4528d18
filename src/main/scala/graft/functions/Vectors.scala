package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, backed by graft's
  * native codegen'd expressions (vec_dot / vec_norm / vec_cosine /
  * vec_l2 — primitive loops, no boxing). Folds run in ascending element
  * order, which keeps results bit-identical to any left-fold reference
  * (the DuckDB oracle relies on this). The same functions are SQL-callable
  * under the same names.
  */
object Vectors {

  /** Elementwise cast to double (float inputs promote exactly). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column = FunctionDefs.call("vec_dot", a, b)

  def norm(a: Column): Column = FunctionDefs.call("vec_norm", a)

  /** Cosine similarity, computed as dot/(sqrt(n2a)*sqrt(n2b)) so the
    * oracle-side SQL can reproduce the exact double operations.
    */
  def cosine(a: Column, b: Column): Column = FunctionDefs.call("vec_cosine", a, b)

  def l2Distance(a: Column, b: Column): Column = FunctionDefs.call("vec_l2", a, b)
}
