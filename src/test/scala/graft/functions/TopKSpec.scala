package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** TopK: a mergeable EXACT summary — under any partitioning (reduce order and
  * merge tree) the result must equal plain sort-and-take under the total order
  * (score DESC, id ASC). */
class TopKSpec extends SparkSpec {

  private def stream(seed: Int, n: Int): Seq[(Long, Long)] = {
    val rnd = new Random(seed)
    // duplicate scores on purpose: ties must break by id, not arrival order
    Seq.tabulate(n)(i => (rnd.nextInt(50).toLong, i.toLong))
  }

  private def expected(xs: Seq[(Long, Long)], k: Int): Seq[(Long, Long)] =
    xs.sortBy { case (s, id) => (-s, id) }.take(k)

  test("distributed top-k equals sort-and-take under any partitioning") {
    val xs = stream(7, 500)
    import spark.implicits._
    for (k <- Seq(1, 3, 16); parts <- Seq(1, 4, 9)) {
      val topk = udaf(new TopK(k))
      val got = xs.toDF("score", "id").repartition(parts)
        .agg(topk(col("score"), col("id")).as("top"))
        .select(explode(col("top")).as("p"))
        .select(col("p._1"), col("p._2"))
        .as[(Long, Long)].collect().toSeq
      assert(got == expected(xs, k), s"k=$k parts=$parts")
    }
  }

  test("local reduce/merge: associativity and the zero-allocation reject path") {
    val xs = stream(11, 300)
    val k = 8
    val topk = new TopK(k)
    def summarize(part: Seq[(Long, Long)]) = part.foldLeft(topk.zero)(topk.reduce)
    val (a, rest) = xs.splitAt(100)
    val (b, c) = rest.splitAt(100)
    val left = topk.merge(topk.merge(summarize(a), summarize(b)), summarize(c))
    val right = topk.merge(summarize(a), topk.merge(summarize(b), summarize(c)))
    assert(left == expected(xs, k))
    assert(right == expected(xs, k))
    // hot path: a row strictly worse than the k-th must return the SAME buffer
    val full = summarize(xs)
    val worse = (-1L, 999999L)
    assert(topk.reduce(full, worse) eq full, "reject path must not allocate")
  }

  test("k larger than the input returns everything, sorted") {
    val xs = stream(13, 5)
    val topk = new TopK(64)
    val buf = xs.foldLeft(topk.zero)(topk.reduce)
    assert(topk.finish(buf) == expected(xs, 64))
  }
}
