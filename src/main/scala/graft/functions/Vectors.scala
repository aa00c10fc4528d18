package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built entirely from
  * codegen'd higher-order functions — no UDFs, no custom expressions
  * needed. Folds run in element order, which keeps results bit-identical
  * to any left-fold reference (the DuckDB oracle relies on this).
  */
object Vectors {

  /** Elementwise cast to double (float inputs promote exactly). */
  def toDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  def norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; written as dot/(sqrt(n2a)*sqrt(n2b)) so the
    * oracle-side SQL can reproduce the exact double operations.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
