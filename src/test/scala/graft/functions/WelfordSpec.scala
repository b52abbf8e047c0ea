package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Welford/Chan statistics: exactness vs two-pass, and the merge laws that
  * combineByKey demands (SURVEY.md §5.2) — order- and partitioning-invariance,
  * exercised over deterministic pseudo-random datasets. */
class WelfordSpec extends AnyFunSuite {

  private def twoPass(xs: Seq[Double]): (Double, Double) = {
    val n = xs.length
    val mean = xs.sum / n
    val m2 = xs.map(x => (x - mean) * (x - mean)).sum
    (mean, if (n > 1) m2 / (n - 1) else 0.0)
  }

  private def fold(xs: Seq[Double]): WelfordBuf = xs.foldLeft(Welford.zero)(Welford.update)

  test("sequential update matches two-pass mean/variance") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val mv = Welford.finish(fold(xs))
    val (m, v) = twoPass(xs)
    assert(math.abs(mv.mean - m) < 1e-12)
    assert(math.abs(mv.variance - v) < 1e-12)
    assert(mv.n == xs.length)
  }

  test("corrected Chan merge equals single-pass result (reference quirk 1 fixed)") {
    // the reference's merge (outlier_detection.py:98) squares n1*(m1-m) instead of
    // multiplying n1 by (m1-m)^2; correct math must agree with the unsplit fold
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    val b = Seq(10.0, 20.0)
    val merged = Welford.finish(Welford.merge(fold(a), fold(b)))
    val direct = Welford.finish(fold(a ++ b))
    assert(math.abs(merged.variance - direct.variance) < 1e-9)
    assert(math.abs(merged.mean - direct.mean) < 1e-12)
  }

  test("merge is commutative and matches any split point (100 random datasets)") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val xs = Seq.fill(1 + rng.nextInt(200))(rng.nextDouble() * 2000 - 1000)
      val split = rng.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(split)
      val ab = Welford.finish(Welford.merge(fold(l), fold(r)))
      val ba = Welford.finish(Welford.merge(fold(r), fold(l)))
      val direct = Welford.finish(fold(xs))
      val scale = math.max(1.0, direct.variance)
      assert(math.abs(ab.variance - direct.variance) / scale < 1e-9)
      assert(math.abs(ba.variance - direct.variance) / scale < 1e-9)
      assert(ab.n == direct.n && ba.n == direct.n)
    }
  }

  test("merge is associative across three partitions (100 random datasets)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      def xs() = Seq.fill(1 + rng.nextInt(50))(rng.nextDouble() * 200 - 100)
      val (a, b, c) = (xs(), xs(), xs())
      val left = Welford.merge(Welford.merge(fold(a), fold(b)), fold(c))
      val right = Welford.merge(fold(a), Welford.merge(fold(b), fold(c)))
      val scale = math.max(1.0, math.abs(left.m2))
      assert(math.abs(left.m2 - right.m2) / scale < 1e-9)
      assert(math.abs(left.mean - right.mean) < 1e-9)
    }
  }

  test("zero is the merge identity") {
    val b = fold(Seq(1.0, 5.0, 9.0))
    assert(Welford.merge(Welford.zero, b) == b)
    assert(Welford.merge(b, Welford.zero) == b)
  }
}
