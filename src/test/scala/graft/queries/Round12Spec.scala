package graft.queries

import graft.SparkSpec

/** Property pins for q215's TABLESAMPLE — the declared rows-only exemption
  * (sample membership depends on the scan's split layout, so no ANSI oracle):
  * the REPEATABLE seed makes the sample deterministic within a session
  * config, the sampled fraction obeys binomial bounds, and the sample is a
  * true subset of the source. */
class Round12Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sampleKeys(seed: Int): Seq[Long] = {
    graft.Tables.lineitem(spark, sf).createOrReplaceTempView("r12_lineitem")
    spark.sql(
      s"""SELECT l_orderkey * 10 + l_linenumber AS k
          FROM r12_lineitem TABLESAMPLE (10 PERCENT) REPEATABLE ($seed)""")
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  test("q215: REPEATABLE seed makes the sample deterministic") {
    assert(sampleKeys(42) === sampleKeys(42))
  }

  test("q215: sampled fraction within binomial bounds and a true subset") {
    val total = graft.Tables.lineitem(spark, sf).count()
    val keys = sampleKeys(42)
    val frac = keys.size.toDouble / total
    assert(frac > 0.05 && frac < 0.15, s"sampled fraction $frac outside [0.05, 0.15]")
    // subset: every sampled key exists in the source exactly as often
    val source = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_orderkey * 10 + l_linenumber AS k")
      .collect().map(_.getLong(0)).toSet
    assert(keys.forall(source.contains))
    // distinct seeds draw distinct samples (overwhelmingly likely at n≈600)
    assert(sampleKeys(7) !== keys)
  }

  test("q215: declared query returns one group per returnflag") {
    val out = graft.Registry.byName("q215_tablesample").fn(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 3)
    assert(out.forall(_.getLong(1) > 0))
  }
}
