package graft.queries

import graft.SparkSpec

/** Property pins for the round-13 surface beyond the DuckDB hash gate:
  * q230's hint contract (each strategy hint lands its physical operator, all
  * three strategies agree on values), q233's sum-preservation invariant
  * (largest-remainder allocation hits the budget bit-exactly), and q229's
  * BFS layering invariants (hop 0 is exactly the source; layers are
  * disjoint by construction of the min-aggregate). */
class Round13Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def physicalOps(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q230: each join strategy hint selects its physical join") {
    val merge = Round13Queries.hintedJoin(spark, sf, "merge")
    val shuffleHash = Round13Queries.hintedJoin(spark, sf, "shuffle_hash")
    val bcast = Round13Queries.hintedJoin(spark, sf, "broadcast")
    assert(physicalOps(merge).contains("SortMergeJoin"),
      "merge hint must force a sort-merge join")
    assert(physicalOps(shuffleHash).contains("ShuffledHashJoin"),
      "shuffle_hash hint must force a shuffled hash join")
    assert(physicalOps(bcast).contains("BroadcastHashJoin"),
      "broadcast hint must force a broadcast hash join")
  }

  test("q230: strategy changes, semantics don't — all three hints agree") {
    val rows = Seq("merge", "shuffle_hash", "broadcast")
      .map(h => Round13Queries.hintedJoin(spark, sf, h).collect().toSeq.map(_.toSeq))
    assert(rows(0) === rows(1))
    assert(rows(0) === rows(2))
  }

  test("q233: allocation preserves the budget exactly") {
    val units = graft.Registry.byName("q233_largest_remainder_proration")
      .fn(spark, sf).collect().map(_.getLong(2))
    assert(units.sum === 1000000L, s"allocated ${units.sum}, budget 1000000")
    // base share alone never exceeds the budget; every nation gets >= base
    assert(units.forall(_ >= 0L))
  }

  test("q229: hop 0 is exactly the one source node") {
    val layers = graft.Registry.byName("q229_bfs_reachability")
      .fn(spark, sf).collect()
    val hop0 = layers.find(_.getInt(0) == 0).get
    assert(hop0.getLong(1) === 1L, "hop 0 must contain exactly the source")
    // layer counts are positive and hops increase contiguously from 0
    val hops = layers.map(_.getInt(0)).toSeq
    assert(hops === (0 until hops.size))
    assert(layers.forall(_.getLong(1) > 0))
  }

  test("q226: freqItems candidates are a superset of the exact heavy hitters") {
    val docs = graft.Tables.documents(spark, sf)
    val total = docs.count()
    val cand = docs.stat.freqItems(Seq("lang"), 0.1).head.getSeq[String](0).toSet
    val exact = docs.groupBy("lang").count()
      .where(org.apache.spark.sql.functions.col("count") * 10 >
        org.apache.spark.sql.functions.lit(total))
      .collect().map(_.getString(0)).toSet
    assert(exact.subsetOf(cand),
      s"sketch guarantee violated: exact $exact not within candidates $cand")
  }

  test("q231: script transform pipes through an external process losslessly") {
    // identity pipe == no pipe: the TRANSFORM result must equal the direct agg
    val viaScript = graft.Registry.byName("q231_script_transform")
      .fn(spark, sf).collect().map(_.toSeq)
    graft.Tables.lineitem(spark, sf).createOrReplaceTempView("r13_li")
    val direct = spark.sql(
      """SELECT l_orderkey % 100 AS bucket, COUNT(*) AS n,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM r13_li GROUP BY 1 ORDER BY 1""").collect().map(_.toSeq)
    assert(viaScript.toSeq === direct.toSeq)
  }
}
