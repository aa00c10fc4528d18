package graft.ops

import graft.functions.{FunctionDefs, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the standard
  * dimensionality-reduction step in front of similarity search / ANN
  * (project 1024-d embeddings to the 64 directions that carry the
  * variance, then index the small vectors).
  *
  * Reference scope note: the reference engine has no PCA; this belongs
  * to the training-data-pipeline surface the brief adds on top
  * (SURVEY.md §2.9).
  *
  * Design for 100 TB, mirroring the IVF Lloyd step (graft.ops.Ann):
  *  - **fit** is ONE distributed pass: count, Σv ([[graft.functions.VectorSumAgg]])
  *    and Σv·vᵀ ([[graft.functions.VectorOuterSumAgg]] — upper-triangle
  *    packed) with map-side partial aggregation; the driver receives a
  *    single row of ~dim²/2 doubles (16 KB at dim=64), never the data.
  *  - the dim×dim eigenproblem is solved ON THE DRIVER with cyclic
  *    Jacobi — dim is bounded (embeddings are ≤ a few thousand wide), so
  *    an O(dim³) driver solve is microseconds; distributing it would be
  *    pure overhead.
  *  - **project** is scan-side, shuffle-free codegen: component c with
  *    mean μ projects v as c·(v−μ) = c·v − c·μ, where c·μ is folded into
  *    a plan-literal constant — k native vec_dot calls per row, no
  *    intermediate centered array, no UDF.
  *
  * Covariance is the population (divide-by-n) moment
  * C = Σv·vᵀ/n − μμᵀ; eigenvectors get a deterministic sign convention
  * (largest-|coordinate| entry positive) so fits are stable across runs
  * and partitionings.
  */
object Pca {

  /** mean, then rows of `components` are the top-k eigenvectors of the
    * covariance (descending eigenvalue); `totalVariance` = trace(C).
    */
  final case class Model(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {
    def dim: Int = mean.length
    def k: Int = components.length
    /** Fraction of total variance captured by the k components. */
    def varianceExplained: Double =
      if (totalVariance == 0) 1.0 else eigenvalues.sum / totalVariance
  }

  /** One-pass distributed moments: (n, Σv, packed-upper-triangle Σv·vᵀ). */
  private[graft] def moments(corpus: DataFrame, vecCol: String): (Long, Array[Double], Array[Double]) = {
    val row = corpus
      .select(Vectors.toDouble(col(vecCol)).as("__v"))
      .filter(col("__v").isNotNull)
      .agg(
        count(lit(1)).as("n"),
        FunctionDefs.callAgg("vec_sum", col("__v")).as("s"),
        FunctionDefs.callAgg("vec_outer_sum", col("__v")).as("g"))
      .head()
    val n = row.getLong(0)
    require(n > 0, "pca: empty corpus")
    (n, row.getSeq[Double](1).toArray, row.getSeq[Double](2).toArray)
  }

  /** Fit the top-k model in one distributed pass + a driver-side solve. */
  def fit(corpus: DataFrame, vecCol: String, k: Int): Model = {
    val (n, s, tri) = moments(corpus, vecCol)
    val d = s.length
    require(k >= 1 && k <= d, s"pca: k=$k out of range 1..$d")
    val mean = s.map(_ / n)
    // unpack the triangle into a full symmetric covariance matrix
    val cov = Array.ofDim[Double](d, d)
    var p = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = tri(p) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        p += 1; j += 1
      }
      i += 1
    }
    val trace = (0 until d).map(i => cov(i)(i)).sum
    val (eigVals, eigVecs) = jacobiEigSym(cov)
    // sort descending, apply the sign convention, keep top-k
    val order = eigVals.indices.sortBy(i => -eigVals(i)).take(k)
    val comps = order.map { idx =>
      val v = Array.tabulate(d)(r => eigVecs(r)(idx))
      var m = 0
      var mi = 0
      while (mi < d) { if (math.abs(v(mi)) > math.abs(v(m))) m = mi; mi += 1 }
      if (v(m) < 0) { var t = 0; while (t < d) { v(t) = -v(t); t += 1 } }
      v
    }.toArray
    Model(mean, comps, order.map(eigVals).toArray, trace)
  }

  /** The k-dim projection of `vecCol` as a Column (array<double>):
    * element i = cᵢ·v − cᵢ·μ, each a codegen'd native dot against a
    * plan-literal component — no centered intermediate, no UDF.
    */
  def projectColumn(vecCol: Column, model: Model): Column = {
    val v = Vectors.toDouble(vecCol)
    array(model.components.map { c =>
      val offset = c.iterator.zip(model.mean.iterator).map { case (a, b) => a * b }.sum
      Vectors.dot(v, typedlit(c.toSeq)) - lit(offset)
    }.toIndexedSeq: _*)
  }

  /** Append `outCol` = projected `vecCol` (scan-side, shuffle-free). */
  def project(df: DataFrame, vecCol: String, model: Model, outCol: String = "pca"): DataFrame =
    df.withColumn(outCol, projectColumn(col(vecCol), model))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix (public
    * textbook algorithm — Golub & Van Loan §8.5): repeatedly rotate away
    * the off-diagonal entries until they vanish. Returns (eigenvalues,
    * eigenvector-columns). O(d³) per sweep, converges in ~log(d) sweeps —
    * driver-side for the bounded embedding dims this serves.
    */
  private[graft] def jacobiEigSym(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val maxSweeps = 64
    var sweep = 0
    var off = offDiagNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (sweep < maxSweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > tol / (d * d)) {
            // the rotation that zeroes a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = c * arp - s * arq
              a(r)(q) = s * arp + c * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = c * apr - s * aqr
              a(q)(r) = s * apr + c * aqr
              r += 1
            }
            r = 0
            while (r < d) {
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = c * vrp - s * vrq
              v(r)(q) = s * vrp + c * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiagNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiagNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }
}
