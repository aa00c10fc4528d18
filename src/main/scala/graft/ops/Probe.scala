package graft.ops

import graft.functions.{FunctionDefs, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form linear probe (OLS via sufficient statistics) — the
  * training-data-pipeline "fit a tiny linear model over a corpus-scale
  * feature table" primitive (quality probes, scaling-law fits,
  * feature-importance screens).
  *
  * Spark-first shape: ONE partial-aggregated scan collects the normal-
  * equation sufficient statistics (the Gram matrix XᵀX and XᵀY — ten
  * numbers for two features), and the solve is plain column arithmetic
  * ON THE 1-ROW AGGREGATE — no driver collect, no iteration, no second
  * pass. At 100 TB the cost is exactly one map-side-combined scan; the
  * shuffle carries one stats row per partition.
  *
  * Determinism contract: features and target are INTEGER-valued, so
  * every sufficient statistic is an exact long (order-independent —
  * float summation order never enters); the doubles appear only in the
  * final Cramer solve, a fixed expression tree over those exact stats
  * that an oracle replays bit-for-bit.
  */
object Probe {

  /** Fit y ≈ b0 + b1·x1 + b2·x2 by OLS. `x1`/`x2`/`y` must be integer-
    * valued expressions (cast to long internally). Returns one row:
    * n_docs, b0, b1, b2, r2, rmse (coefficients rounded to 6 dp).
    */
  def ols2(df: DataFrame, x1: Column, x2: Column, y: Column): DataFrame = {
    val f = df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .filter(col("x1").isNotNull && col("x2").isNotNull && col("y").isNotNull)
    // second-order stats accumulate in DECIMAL(38,0): a long×long
    // product wraps silently under Spark's non-ANSI sum at corpus scale
    // while the DuckDB oracle widens to HUGEINT — the exactness
    // contract would diverge engine-vs-oracle exactly when it matters.
    // Decimal products are exact (8.5e37 < 1e38) and a sum past 38
    // digits nulls, which the guard below turns into a loud error.
    def dec(c: Column) = c.cast("decimal(38,0)")
    val st = f.agg(
      count(lit(1)).as("n"),
      sum(dec(col("x1"))).as("s1"), sum(dec(col("x2"))).as("s2"),
      sum(dec(col("y"))).as("sy"),
      sum(dec(col("x1")) * dec(col("x1"))).as("s11"),
      sum(dec(col("x1")) * dec(col("x2"))).as("s12"),
      sum(dec(col("x2")) * dec(col("x2"))).as("s22"),
      sum(dec(col("x1")) * dec(col("y"))).as("s1y"),
      sum(dec(col("x2")) * dec(col("y"))).as("s2y"),
      sum(dec(col("y")) * dec(col("y"))).as("syy"))
      .filter(coalesce(
        when(col("n") > 0 &&
          (col("s1").isNull || col("s2").isNull || col("sy").isNull ||
            col("s11").isNull || col("s12").isNull || col("s22").isNull ||
            col("s1y").isNull || col("s2y").isNull || col("syy").isNull),
          raise_error(lit("ols2: sufficient-statistic overflow past " +
            "DECIMAL(38,0) — bound feature magnitudes"))),
        lit(true)))
    // everything below is double arithmetic over exact integer stats —
    // the expression trees are mirrored verbatim in the SQL oracle
    val d = st.select(st.columns.map(c => col(c).cast("double").as(c)): _*)
    val withDets = d.select(col("*"),
      (col("n") * (col("s11") * col("s22") - col("s12") * col("s12"))
        - col("s1") * (col("s1") * col("s22") - col("s12") * col("s2"))
        + col("s2") * (col("s1") * col("s12") - col("s11") * col("s2"))).as("det"),
      (col("sy") * (col("s11") * col("s22") - col("s12") * col("s12"))
        - col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
        + col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y"))).as("det0"),
      (col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y"))
        - col("sy") * (col("s1") * col("s22") - col("s12") * col("s2"))
        + col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2"))).as("det1"),
      (col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12"))
        - col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2"))
        + col("sy") * (col("s1") * col("s12") - col("s11") * col("s2"))).as("det2"))
    // collinear/constant features make det = 0 — fail loudly instead of
    // emitting null coefficients that surface as a baffling mismatch
    // three stages later (ridgeFit's 'singular system' contract)
    val detSafe = when(col("det") =!= 0.0, col("det"))
      .otherwise(raise_error(lit(
        "ols2: singular normal equations (collinear or constant features)"))
        .cast("double"))
    val withB = withDets.select(col("*"),
      (col("det0") / detSafe).as("b0"),
      (col("det1") / detSafe).as("b1"),
      (col("det2") / detSafe).as("b2"))
    val withFit = withB.select(col("*"),
      (col("syy") - (col("b0") * col("sy") + col("b1") * col("s1y")
        + col("b2") * col("s2y"))).as("sse"),
      (col("syy") - col("sy") * col("sy") / col("n")).as("sst"))
    // a constant target makes sst = 0: Spark's non-ANSI division would
    // emit a null r² while DuckDB emits IEEE inf/NaN — guard it the
    // same way det = 0 is guarded, loudly
    val sstSafe = when(col("sst") =!= 0.0, col("sst"))
      .otherwise(raise_error(lit(
        "ols2: constant target (sst = 0) — r² undefined"))
        .cast("double"))
    withFit.select(
      col("n").cast("long").as("n_docs"),
      (round(col("b0"), 6) + lit(0.0)).as("b0"),
      (round(col("b1"), 6) + lit(0.0)).as("b1"),
      (round(col("b2"), 6) + lit(0.0)).as("b2"),
      (round(lit(1.0) - col("sse") / sstSafe, 6) + lit(0.0)).as("r2"),
      (round(sqrt(greatest(col("sse"), lit(0.0)) / col("n")), 6) + lit(0.0)).as("rmse"))
  }

  /** Logistic-regression quality classifier via exact-statistics IRLS
    * (Newton–Raphson) — the "train a tiny quality filter on weak labels,
    * score the corpus" curation primitive (the public CCNet / GPT-3
    * data-quality-classifier recipe, linear-model form).
    *
    * Spark-first shape: each Newton iteration is ONE partial-aggregated
    * scan computing the nine logistic sufficient statistics (gradient
    * Σ(y−p)·x and symmetric Hessian triangle Σp(1−p)·x·xᵀ for
    * x = [1, x1, x2]); the 3×3 Newton solve is closed-form adjugate
    * arithmetic on the driver over those nine doubles. At 100 TB the
    * cost is `iters` map-side-combined scans of three pruned columns —
    * the driver holds three doubles and collects one 9-stat row per
    * iteration (bounded metadata, never data). No caching is imposed:
    * each pass re-reads the (column-pruned, filter-pushed) source, the
    * right trade when the projected frame is corpus-sized.
    *
    * Determinism: a FIXED iteration count (no data-dependent stopping),
    * so an oracle replays the whole trajectory by unrolling the same
    * per-iteration aggregate + adjugate update. Newton from β = 0
    * converges in < 8 iterations for well-scaled features (scale to
    * O(1) magnitudes); a near-singular Hessian (separable data pushed
    * past convergence, or collinear features) fails loudly.
    *
    * @return fitted [b0, b1, b2] for p = σ(b0 + b1·x1 + b2·x2)
    */
  def logit2(df: DataFrame, y: Column, x1: Column, x2: Column,
             iters: Int = 8): Array[Double] = {
    require(iters >= 1 && iters <= 64, "logit2: 1 <= iters <= 64")
    val f = df.select(y.cast("double").as("y"), x1.cast("double").as("x1"),
        x2.cast("double").as("x2"))
      .filter(col("y").isNotNull && col("x1").isNotNull && col("x2").isNotNull)
    val b = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until iters) {
      val z = lit(b(0)) + lit(b(1)) * col("x1") + lit(b(2)) * col("x2")
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val w = p * (lit(1.0) - p)
      val r = f.agg(
        sum(col("y") - p).as("g0"),
        sum((col("y") - p) * col("x1")).as("g1"),
        sum((col("y") - p) * col("x2")).as("g2"),
        sum(w).as("h00"), sum(w * col("x1")).as("h01"),
        sum(w * col("x2")).as("h02"),
        sum(w * col("x1") * col("x1")).as("h11"),
        sum(w * col("x1") * col("x2")).as("h12"),
        sum(w * col("x2") * col("x2")).as("h22")).head()
      require(!r.isNullAt(0), "logit2: empty input")
      val Seq(g0, g1, g2, h00, h01, h02, h11, h12, h22) =
        (0 until 9).map(r.getDouble)
      // symmetric 3×3 Newton step via the adjugate (closed form)
      val a00 = h11 * h22 - h12 * h12
      val a01 = h02 * h12 - h01 * h22
      val a02 = h01 * h12 - h11 * h02
      val a11 = h00 * h22 - h02 * h02
      val a12 = h01 * h02 - h00 * h12
      val a22 = h00 * h11 - h01 * h01
      val det = h00 * a00 + h01 * a01 + h02 * a02
      require(math.abs(det) > 1e-12,
        "logit2: singular Hessian (separable data over-iterated, or " +
          "collinear features) — rescale features or lower iters")
      b(0) += (a00 * g0 + a01 * g1 + a02 * g2) / det
      b(1) += (a01 * g0 + a11 * g1 + a12 * g2) / det
      b(2) += (a02 * g0 + a12 * g1 + a22 * g2) / det
    }
    b
  }

  /** Scan-side scoring column for a [[logit2]] fit: σ(b0 + b1·x1 + b2·x2). */
  def logitScore(beta: Seq[Double], x1: Column, x2: Column): Column =
    lit(1.0) / (lit(1.0) +
      exp(-(lit(beta(0)) + lit(beta(1)) * x1 + lit(beta(2)) * x2)))

  /** A trained ridge probe: intercept + weights over the embedding,
    * plus the fit's sufficient-statistic by-products. `optResidual` is
    * ‖(G + λI')β − Xᵀy‖∞ over the AUGMENTED system (intercept
    * unpenalized) — the ridge optimality condition, ~0 for a correct
    * solve regardless of the data.
    */
  final case class RidgeModel(
      b0: Double, w: Array[Double], n: Long,
      sy: Double, optResidual: Double) {
    def dim: Int = w.length
  }

  /** Closed-form ridge-regression probe over an embedding column — the
    * "train a tiny linear classifier on frozen embeddings" primitive
    * (quality probes, one-vs-rest label probes, representation audits).
    *
    * Spark-first shape, mirroring [[Pca.fit]]: ONE partial-aggregated
    * pass collects the augmented normal-equation moments — n, Σv
    * ([[graft.functions.VectorSumAgg]]), the Gram triangle Σv·vᵀ
    * ([[graft.functions.VectorOuterSumAgg]]), Σy·v (the same vec_sum
    * over a scan-side y-scaled copy), Σy, Σy² — a single ~dim²/2-double
    * row to the driver, never the data. The (dim+1)² solve (Gaussian
    * elimination, partial pivoting — deterministic) is driver-side
    * microseconds, exactly like PCA's Jacobi. Scoring is scan-side
    * codegen: b0 + vec_dot(v, w).
    *
    * λ penalizes weights only, not the intercept (standard ridge).
    */
  def ridgeFit(corpus: DataFrame, vecCol: String, y: Column,
               lambda: Double): RidgeModel = {
    require(lambda >= 0, "ridge: lambda must be non-negative")
    val f = corpus
      .select(Vectors.toDouble(col(vecCol)).as("__v"), y.cast("double").as("__y"))
      .filter(col("__v").isNotNull && col("__y").isNotNull)
    val row = f.agg(
      count(lit(1)).as("n"),
      FunctionDefs.callAgg("vec_sum", col("__v")).as("sv"),
      FunctionDefs.callAgg("vec_outer_sum", col("__v")).as("g"),
      FunctionDefs.callAgg("vec_sum", expr("transform(__v, x -> x * __y)")).as("syv"),
      sum(col("__y")).as("sy")).head()
    val n = row.getLong(0)
    require(n > 0, "ridge: empty corpus")
    val sv = row.getSeq[Double](1).toArray
    val tri = row.getSeq[Double](2).toArray
    val syv = row.getSeq[Double](3).toArray
    val sy = row.getDouble(4)
    val d = sv.length
    // augmented system A β = b, A = [[n, Σvᵀ], [Σv, G + λI]], b = [Σy, Σyv]
    val m = d + 1
    val a = Array.ofDim[Double](m, m)
    val b = new Array[Double](m)
    a(0)(0) = n.toDouble; b(0) = sy
    var i = 0
    while (i < d) {
      a(0)(i + 1) = sv(i); a(i + 1)(0) = sv(i); b(i + 1) = syv(i); i += 1
    }
    var p = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        a(i + 1)(j + 1) = tri(p); a(j + 1)(i + 1) = tri(p); j += 1; p += 1
      }
      i += 1
    }
    i = 0
    while (i < d) { a(i + 1)(i + 1) += lambda; i += 1 }
    val a0 = a.map(_.clone()) // keep A for the optimality residual
    val b0v = b.clone()
    val beta = solveInPlace(a, b)
    var resid = 0.0
    i = 0
    while (i < m) {
      var acc = 0.0
      var j = 0
      while (j < m) { acc += a0(i)(j) * beta(j); j += 1 }
      resid = math.max(resid, math.abs(acc - b0v(i)))
      i += 1
    }
    RidgeModel(beta(0), beta.drop(1), n, sy, resid)
  }

  /** Gaussian elimination with partial pivoting; mutates its args. */
  private def solveInPlace(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val m = b.length
    var k = 0
    while (k < m) {
      var piv = k
      var i = k + 1
      while (i < m) { if (math.abs(a(i)(k)) > math.abs(a(piv)(k))) piv = i; i += 1 }
      require(math.abs(a(piv)(k)) > 1e-12, "ridge: singular system (raise lambda)")
      if (piv != k) { val t = a(piv); a(piv) = a(k); a(k) = t
        val tb = b(piv); b(piv) = b(k); b(k) = tb }
      i = k + 1
      while (i < m) {
        val fct = a(i)(k) / a(k)(k)
        var j = k
        while (j < m) { a(i)(j) -= fct * a(k)(j); j += 1 }
        b(i) -= fct * b(k)
        i += 1
      }
      k += 1
    }
    val x = new Array[Double](m)
    k = m - 1
    while (k >= 0) {
      var acc = b(k)
      var j = k + 1
      while (j < m) { acc -= a(k)(j) * x(j); j += 1 }
      x(k) = acc / a(k)(k)
      k -= 1
    }
    x
  }

  /** Scan-side scoring column for a trained probe: b0 + w·v. */
  def score(model: RidgeModel, vecCol: Column): Column =
    lit(model.b0) + Vectors.dot(Vectors.toDouble(vecCol),
      typedlit(model.w.toSeq))
}
