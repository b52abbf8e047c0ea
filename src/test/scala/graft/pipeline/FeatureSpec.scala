package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed micro-fixtures for F1–F4 (FIXTURES.md §B.1) plus invariants
  * (SURVEY.md §5.2): area ≤ w·h, circularity bounds, border handling. */
class FeatureSpec extends AnyFunSuite {

  /** 8×8 single-channel image with a 3×3 square mask at (2..4, 2..4). */
  private def squareImage: CellImage = {
    val w = 8; val h = 8
    val mask = new Array[Boolean](w * h)
    val data = new Array[Double](w * h)
    for (x <- 0 until w; y <- 0 until h) {
      val i = x * h + y
      data(i) = if (x >= 2 && x <= 4 && y >= 2 && y <= 4) 100.0 else 10.0
      mask(i) = x >= 2 && x <= 4 && y >= 2 && y <= 4
    }
    CellImage("f", 0L, w, h, 1, data, mask)
  }

  test("area of a 3x3 square is 9") {
    assert(Features.area(squareImage).toSeq == Seq(9.0))
  }

  test("4-neighborhood perimeter of a 3x3 square is 12") {
    // each of the 8 boundary pixels contributes its exposed sides: 4 corners x 2 +
    // 4 edge-centers x 1 = 12; the center pixel contributes 0
    assert(Features.perimeter(squareImage).toSeq == Seq(12.0))
  }

  test("circularity = 4*pi*A/P^2, and 0 when perimeter is 0") {
    val c = Features.circularity(Array(9.0), Array(12.0))
    assert(math.abs(c(0) - 4 * math.Pi * 9 / 144) < 1e-12)
    assert(Features.circularity(Array(0.0), Array(0.0)).toSeq == Seq(0.0))
  }

  test("mean_intensity follows numpy masked-array semantics: mask=true EXCLUDED") {
    // 64 pixels, 9 masked (value 100), 55 unmasked (value 10) -> mean of the 55
    val mi = Features.meanIntensity(squareImage)
    assert(math.abs(mi(0) - 10.0) < 1e-12)
  }

  test("border cell pixels add no perimeter on the image edge (reference guards)") {
    // 2x2 image fully masked: every pixel has only in-bounds masked neighbors -> 0
    val ci = CellImage("f", 0L, 2, 2, 1,
      Array(1.0, 1.0, 1.0, 1.0), Array(true, true, true, true))
    assert(Features.perimeter(ci).toSeq == Seq(0.0))
    // single masked pixel in 1x2: one in-bounds background neighbor -> 1
    val ci2 = CellImage("f", 0L, 1, 2, 1, Array(1.0, 2.0), Array(true, false))
    assert(Features.perimeter(ci2).toSeq == Seq(1.0))
  }

  test("invariants on generated fixtures: area <= w*h, 4-connected circularity <= ~1") {
    for (i <- 0 until 30) {
      val ci = CellImageFixtures.make("f", 0, i.toLong, channels = 3)
      val a = Features.area(ci)
      val p = Features.perimeter(ci)
      val c = Features.circularity(a, p)
      a.foreach(av => assert(av <= ci.width * ci.height))
      c.foreach(cv => assert(cv >= 0.0 && cv < 1.2)) // digital 4-perimeter: pi/4 bound fuzz
    }
  }

  test("extract emits the reference's four features in insertion order") {
    val fs = Features.extract(squareImage)
    assert(fs.map(_.featureName) == Seq("area", "perimeter", "circularity", "mean_intensity"))
    assert(fs.forall(_.values.length == 1))
  }
}
