package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** Misra-Gries sketch: the n/k superset guarantee must hold under any
  * partitioning (reduce order AND merge tree), and the q124 recheck must turn
  * the candidate superset into the exact heavy-hitter set. */
class MisraGriesSpec extends SparkSpec {

  /** Zipf-ish stream: planted heavy items + a long tail, shuffled. */
  private def stream(seed: Int): Seq[String] = {
    val rnd = new Random(seed)
    val heavy = (0 until 5).flatMap(i => Seq.fill(400 - 40 * i)(s"H$i"))
    val tail = (0 until 300).flatMap(i => Seq.fill(rnd.nextInt(6) + 1)(s"t$i"))
    rnd.shuffle(heavy ++ tail)
  }

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("candidate set contains every item with count > n/k, any partitioning") {
    val xs = stream(7)
    val n = xs.size
    for (k <- Seq(16, 64); parts <- Seq(1, 3, 8)) {
      val mg = udaf(new MisraGries(k))
      import spark.implicits._
      val cands = xs.toDF("x").repartition(parts)
        .agg(mg(col("x")).as("c")).select(explode(col("c")).as("x"))
        .as[String].collect().toSet
      val mustHave = exactCounts(xs).collect {
        case (item, c) if c * k > n => item
      }.toSet
      assert(mustHave.subsetOf(cands),
        s"k=$k parts=$parts missing ${mustHave -- cands}")
      assert(cands.size <= k, s"k=$k parts=$parts summary exceeded k")
    }
  }

  test("local reduce/merge obey the same guarantee as the distributed run") {
    val xs = stream(11)
    val k = 32
    val mg = new MisraGries(k)
    // three-way split merged in both associations
    val (a, rest) = xs.splitAt(xs.size / 3)
    val (b, c) = rest.splitAt(rest.size / 3)
    def summarize(part: Seq[String]) = part.foldLeft(mg.zero)(mg.reduce)
    val left = mg.merge(mg.merge(summarize(a), summarize(b)), summarize(c))
    val right = mg.merge(summarize(a), mg.merge(summarize(b), summarize(c)))
    val n = xs.size
    val mustHave = exactCounts(xs).collect { case (i, cnt) if cnt * k > n => i }.toSet
    import scala.jdk.CollectionConverters._
    for (buf <- Seq(left, right).map(_.asScala.map { case (i, c) => i -> c.longValue }.toMap)) {
      assert(buf.size <= k)
      assert(mustHave.subsetOf(buf.keySet))
      // counters never over-estimate, and under-estimate by at most n/k
      buf.foreach { case (item, est) =>
        val truth = exactCounts(xs).getOrElse(item, 0L)
        assert(est <= truth, s"$item over-estimated")
        assert(truth - est <= n / k + 1, s"$item under-estimated past n/k")
      }
    }
  }

  test("recheck yields exactly the true heavy hitters (q124 contract)") {
    val xs = stream(13)
    val k = 24
    import spark.implicits._
    val df = xs.toDF("x").repartition(5)
    val mg = udaf(new MisraGries(k))
    val cands = df.agg(mg(col("x")).as("c")).select(explode(col("c")).as("x"))
    val total = df.count()
    val got = df.join(broadcast(cands), "x").groupBy("x").count()
      .filter(col("count") * k > total)
      .as[(String, Long)].collect().toMap
    val want = exactCounts(xs).filter { case (_, c) => c * k > total }
    assert(got == want)
  }
}
