package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class Z2Spec extends AnyFunSuite with Matchers {

  private val rnd = new scala.util.Random(42)
  private def cases30: Seq[Int] = Seq(0, 1, (1 << 30) - 1) ++ Seq.fill(200)(rnd.nextInt(1 << 30))

  test("Morton interleave known vectors") {
    Z2.index(0, 0) shouldBe 0L
    Z2.index(1, 0) shouldBe 1L
    Z2.index(0, 1) shouldBe 2L
    Z2.index(1, 1) shouldBe 3L
    Z2.index(2, 0) shouldBe 4L
    Z2.index(3, 5) shouldBe (1L | 2L | 4L | 32L) // x=11b→bits0,2; y=101b→bits1,5
  }

  test("split/combine are inverses over 30-bit ints") {
    cases30.foreach { x =>
      Z2.combine(Z2.split(x.toLong)) shouldBe x
    }
  }

  test("index/xOf/yOf roundtrip") {
    cases30.zip(cases30.reverse).foreach { case (x, y) =>
      val z = Z2.index(x, y)
      Z2.xOf(z) shouldBe x
      Z2.yOf(z) shouldBe y
    }
  }

  test("lon/lat scaling: corners and clamping") {
    Z2.indexLonLat(-180, -90) shouldBe 0L
    Z2.indexLonLat(180, 90) shouldBe Z2.index((1 << 30) - 1, (1 << 30) - 1)
    Z2.scaleLon(-200) shouldBe 0
    Z2.scaleLat(95) shouldBe (1 << 30) - 1
  }

  test("same formula as the reference's scale factors") {
    // reference ST_Z2LatLon.scala:43: ((lat+90)/180 * 2^30).toInt
    Z2.scaleLat(0.0) shouldBe (1 << 29)
    Z2.scaleLon(0.0) shouldBe (1 << 29)
  }

  test("envelope cover: counts, membership, bounds") {
    val cells = Z2.coverEnvelope(-1.0, -1.0, 1.0, 1.0, 8)
    // level 8 → 256×256 grid: lon cells are 1.406° (±1° spans 2), lat
    // cells 0.703° (±1° spans 4)
    cells.length shouldBe 8
    cells should contain(Z2.cell(-0.5, -0.5, 8))
    cells should contain(Z2.cell(0.5, 0.5, 8))
    an[IllegalArgumentException] should be thrownBy
      Z2.coverEnvelope(-179, -89, 179, 89, 12, maxCells = 16)
  }

  test("locality: nearby points share coarse cells") {
    val a = Z2.cell(10.001, 20.001, 10)
    val b = Z2.cell(10.002, 20.002, 10)
    a shouldBe b
  }

  test("z2 range struct matches envelope corners") {
    val g = GeomIO.bbox(10, 20, 11, 21)
    val (lo, hi) = Z2.indexRange(g)
    lo shouldBe Z2.indexLonLat(10, 20)
    hi shouldBe Z2.indexLonLat(11, 21)
    lo should be < hi
  }
}
