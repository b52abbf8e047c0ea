package graft.queries

import graft.{Registry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** q71 is rows-only at the driver (seeded sampling is not reproducible in another
  * engine), so its guarantees are property-checked here instead: strata honor their
  * fractions within Bernoulli tolerance, excluded strata vanish, and the same seed
  * replays to the identical sample. */
class StratifiedSampleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private val fractions =
    Map("purchase" -> 1.0, "click" -> 0.25, "error" -> 0.5, "view" -> 0.05)

  test("sampleBy honors per-stratum fractions within Bernoulli tolerance") {
    val totals = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Registry.byName("q71_stratified_sample").fn(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(!sampled.contains("signup"), "stratum with no declared fraction must vanish")
    assert(sampled.getOrElse("purchase", 0L) == totals.getOrElse("purchase", -1L),
      "fraction 1.0 keeps every row")
    for ((typ, frac) <- fractions if frac < 1.0) {
      // getOrElse(0): a stratum sampling to zero rows is statistically legal for
      // tiny strata and must read as count 0, not a NoSuchElementException
      val n = totals.getOrElse(typ, 0L).toDouble
      val expected = frac * n
      // 5 sigma of Binomial(n, frac): far tighter than any plausible regression,
      // far looser than seed-to-seed wobble
      val tol = 5.0 * math.sqrt(n * frac * (1 - frac))
      assert(math.abs(sampled.getOrElse(typ, 0L) - expected) <= tol,
        s"$typ: got ${sampled.getOrElse(typ, 0L)}, expected $expected +- $tol")
    }
  }

  test("same seed replays the identical sample; the query itself is deterministic") {
    def run() = Tables.events(spark, sf)
      .stat.sampleBy("event_type", fractions, seed = 42L)
      .agg(count(lit(1)), coalesce(sum(col("event_id")), lit(0L))).collect()(0)
    val a = run()
    val b = run()
    assert(a == b, "seed 42 must reproduce the exact same rows")
  }
}
