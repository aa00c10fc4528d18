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

  // ---- int8 storage quantization (built-in HOFs — codegen'd, scan-side)
  //
  // At 100 TB an int8-quantized embedding column is 4× less IO and
  // shuffle than float32 and 8× less than double; symmetric per-vector
  // quantization (scale = 127/max|x|) bounds reconstruction error at
  // 0.5/scale per element, and cosine ranking degrades only marginally.
  // All arithmetic is order-independent or per-element, so an external
  // engine reproduces the exact values (see the ann_int8 oracle).

  /** Largest |x_i| of the vector (0.0 for an empty vector). */
  def maxAbs(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x)))

  /** Symmetric int8 scale: 127/max|x|; an all-zero vector gets scale 1
    * so quantization stays total (q = 0 vector).
    */
  def int8Scale(v: Column): Column = {
    val m = maxAbs(v)
    when(m === 0.0, lit(1.0)).otherwise(lit(127.0) / m)
  }

  /** q_i = round(x_i · scale), always within [-127, 127] by scale
    * construction.
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x => round(x * scale).cast("int"))

  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x / scale)
}
