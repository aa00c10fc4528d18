package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class PcaSpec extends AnyFunSuite with SparkTestSession with Matchers {

  test("jacobiEigSym matches the closed-form 2x2 eigendecomposition") {
    // [[3, 1], [1, 3]] has eigenpairs (4, [1,1]/√2) and (2, [1,-1]/√2)
    val (vals, vecs) = Pca.jacobiEigSym(Array(Array(3.0, 1.0), Array(1.0, 3.0)))
    val order = vals.indices.sortBy(i => -vals(i))
    vals(order(0)) shouldBe 4.0 +- 1e-12
    vals(order(1)) shouldBe 2.0 +- 1e-12
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    math.abs(v0(0)) shouldBe (1.0 / math.sqrt(2)) +- 1e-12
    math.abs(v0(1)) shouldBe (1.0 / math.sqrt(2)) +- 1e-12
    v0(0) * v0(1) should be > 0.0 // same sign: the [1,1] direction
  }

  test("moments agree with a local computation") {
    import spark.implicits._
    val data = Seq(
      Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0), Array(7.0, 8.0, 10.0))
    val df = data.toDF("v")
    val (n, s, tri) = Pca.moments(df, "v")
    n shouldBe 3L
    s.toSeq shouldBe Seq(12.0, 15.0, 19.0)
    // packed upper triangle of Σ v·vᵀ, row-major
    val expected = Array(
      1.0 * 1 + 4 * 4 + 7 * 7, 1.0 * 2 + 4 * 5 + 7 * 8, 1.0 * 3 + 4 * 6 + 7 * 10,
      2.0 * 2 + 5 * 5 + 8 * 8, 2.0 * 3 + 5 * 6 + 8 * 10,
      3.0 * 3 + 6 * 6 + 10 * 10)
    tri.toSeq shouldBe expected.toSeq
  }

  test("fit recovers a planted low-rank structure") {
    import spark.implicits._
    // points on a 2-D plane (axes e1+e2 and e3-e4) inside 6-D space,
    // plus a deterministic speck of noise in e5
    val rows = (0 until 400).map { i =>
      val a = math.sin(i * 0.7) * 5.0
      val b = math.cos(i * 1.3) * 2.0
      val eps = ((i * 2654435761L) % 1000) / 1e7
      Array(a, a, b, -b, eps, 0.0)
    }
    val df = rows.toDF("v")
    val model = Pca.fit(df, "v", k = 2)
    model.dim shouldBe 6
    model.varianceExplained should be > 0.999999
    model.eigenvalues(0) should be > model.eigenvalues(1)
    // components span the planted plane: projecting the plane's basis
    // onto the component space must preserve its norm
    def planeResidual(u: Array[Double]): Double = {
      val proj = model.components.map(c => c.zip(u).map { case (x, y) => x * y }.sum)
      math.sqrt(u.map(x => x * x).sum - proj.map(x => x * x).sum)
    }
    val s2 = math.sqrt(2)
    planeResidual(Array(1 / s2, 1 / s2, 0, 0, 0, 0)) shouldBe 0.0 +- 1e-6
    planeResidual(Array(0, 0, 1 / s2, -1 / s2, 0, 0)) shouldBe 0.0 +- 1e-6
  }

  test("projection is scan-side arithmetic: centered dot products, exactly") {
    import spark.implicits._
    val rows = (0 until 50).map(i => Array(i * 1.0, 50.0 - i, (i % 7) * 2.0))
    val df = rows.toDF("v")
    val model = Pca.fit(df, "v", k = 3)
    val got = Pca.project(df, "v", model, "p")
      .select("p").collect().map(_.getSeq[Double](0).toArray)
    rows.zip(got).foreach { case (v, p) =>
      model.components.zipWithIndex.foreach { case (c, ci) =>
        val want = c.zip(v).map { case (x, y) => x * y }.sum -
          c.zip(model.mean).map { case (x, y) => x * y }.sum
        p(ci) shouldBe want +- 1e-9
      }
    }
  }

  test("full-rank projection preserves centered norms (orthogonal transform)") {
    import spark.implicits._
    val rows = (0 until 100).map(i =>
      Array(math.sin(i * 1.1), math.cos(i * 0.3) * 3, i % 5 * 1.0, math.tan(i % 3 + 1)))
    val df = rows.toDF("v")
    val model = Pca.fit(df, "v", k = 4)
    val gap = Pca.project(df, "v", model, "p")
      .select(
        aggregate(zip_with(col("p"), col("p"), (a, b) => a * b), lit(0.0), (a, x) => a + x)
          .as("psq"),
        aggregate(zip_with(col("v"), typedlit(model.mean.toSeq), (a, b) => (a - b) * (a - b)),
          lit(0.0), (a, x) => a + x).as("osq"))
      .select(max(abs(col("psq") - col("osq")))).head().getDouble(0)
    gap should be < 1e-9
  }

  test("fit is deterministic across repartitionings (sign convention + merge order)") {
    import spark.implicits._
    val rows = (0 until 200).map(i => Array(math.sin(i * 0.9) * 2, i % 11 * 1.0, math.cos(i) * 4))
    val m1 = Pca.fit(rows.toDF("v").repartition(1), "v", k = 2)
    val m32 = Pca.fit(rows.toDF("v").repartition(32), "v", k = 2)
    m1.eigenvalues.zip(m32.eigenvalues).foreach { case (a, b) => a shouldBe b +- 1e-9 }
    m1.components.zip(m32.components).foreach { case (ca, cb) =>
      ca.zip(cb).foreach { case (a, b) => a shouldBe b +- 1e-7 }
    }
  }

  test("null vectors are ignored by the moment pass") {
    import spark.implicits._
    val df = Seq(Some(Array(1.0, 2.0)), None, Some(Array(3.0, 4.0))).toDF("v")
    val (n, s, _) = Pca.moments(df, "v")
    n shouldBe 2L
    s.toSeq shouldBe Seq(4.0, 6.0)
  }
}
