package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape assertions: the optimizations the 100 TB story depends on must be
  * visible in the physical plan, not assumed — filter/projection pushdown into the
  * parquet scan, broadcast joins for small dimensions, whole-stage codegen on the
  * hot paths, and partial aggregation below shuffles.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.byName(name).fn(spark, sf).queryExecution.executedPlan.toString

  private def formatted(df: DataFrame): String = {
    val qe = df.queryExecution
    qe.executedPlan.toString + "\n" + qe.optimizedPlan.toString
  }

  test("q01: shipdate filter and column pruning reach the parquet scan") {
    val df = Registry.byName("q01_pricing_summary").fn(spark, sf)
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("l_shipdate"),
      s"expected pushed shipdate filter in:\n$scan")
    // only the 7 referenced columns are read, not all 11
    assert(!scan.contains("l_partkey") && !scan.contains("l_suppkey"),
      "unused columns must be pruned from ReadSchema")
  }

  test("q02: every predicate form pushes into the scan") {
    val df = Registry.byName("q02_filter_predicates").fn(spark, sf)
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("PushedFilters:") && leaves.contains("o_totalprice"))
  }

  test("q03: nation and region join as broadcasts, not shuffles") {
    val p = plan("q03_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
  }

  test("q01 and q12 run inside whole-stage codegen with partial aggregation") {
    Seq("q01_pricing_summary", "q12_stats_family").foreach { q =>
      val df = Registry.byName(q).fn(spark, sf)
      df.collect() // finalize the adaptive plan so codegen stages materialize
      val p = df.queryExecution.executedPlan.toString
      // codegen stages render as "*(n)" in the compact plan string
      assert(p.contains("*("), s"$q must codegen:\n${p.take(400)}")
      assert(p.contains("partial_"), s"$q must partial-aggregate map-side")
    }
  }

  test("q42: codegen'd dot product appears in the plan (no interpreted lambda)") {
    val p = plan("q42_knn_brute_force")
    assert(p.contains("dotproductfloat") || p.contains("DotProductFloat") ||
      p.toLowerCase.contains("graft_dot_f"), s"expected native dot expression in plan")
  }

  test("q30: as-of join plans one shuffle on the key, no join blowup") {
    val p = plan("q30_asof_join")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "union+carry-forward as-of must not plan a join")
    assert(p.contains("Window"), "carry-forward runs as a window")
  }

  test("q16: global sort+limit plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q16_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n${p.take(400)}")
  }

  test("q17: rank filter pushes into the window (WindowGroupLimit)") {
    val p = plan("q17_topk_per_group")
    assert(p.contains("WindowGroupLimit"),
      s"rn <= 3 must prune inside the window operator:\n${p.take(400)}")
  }

  test("q66: returnflag filter becomes a partition filter, not a data filter") {
    val df = Registry.byName("q66_partitioned_pruning").fn(spark, sf)
    val leaves = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("PartitionFilters") && leaves.contains("l_returnflag"),
      s"expected partition pruning in scan:\n${leaves.take(600)}")
  }

  test("q69: bucketed join plans no hash exchange for join or aggregation") {
    val df = Registry.byName("q69_bucketed_join").fn(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"), s"merge hint must pin SMJ:\n${p.take(600)}")
    assert(!p.contains("BroadcastExchange"), "merge hint must prevent broadcast")
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed sides must join and aggregate without shuffling:\n${p.take(800)}")
  }

  // ---- AQE-era plan pins for the heaviest queries --------------------------
  // Exchange counts and join strategies under AQE, asserted so a future plan
  // regression fails a test instead of surfacing as an unexplained bench delta.
  // Counts are for THIS corpus at sf0.001 with AQE on; "+- Exchange" matching
  // deliberately excludes ReusedExchange mentions.

  private def finalPlan(name: String): String = {
    val df = Registry.byName(name).fn(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  private def hashExchanges(p: String): Int =
    "\\+\\- Exchange hashpartitioning".r.findAllIn(p).size

  test("q03 pin: 4 broadcast joins, no sort-merge, 3 hash exchanges (agg only)") {
    val p = finalPlan("q03_star_join_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 4, s"q03 join strategy changed:\n$p")
    assert(!p.contains("SortMergeJoin"))
    // distinct-count rewrite = 2 agg exchanges + expand; +1 for the final agg
    assert(hashExchanges(p) <= 3, s"q03 gained a shuffle:\n$p")
  }

  test("q36 pin: pure aggregation pipeline — no join operator, 3 hash exchanges") {
    val p = finalPlan("q36_lsh_candidates")
    assert(!p.contains("Join"), s"LSH pair-gen must stay join-free (bucket agg):\n$p")
    assert(hashExchanges(p) == 3, s"q36 shuffle count changed:\n$p")
    assert(p.contains("partial_min"), "minhash must partial-aggregate map-side")
  }

  test("q44 pin: near-dup join key includes the sign-LSH bucket, not just label") {
    val p = finalPlan("q44_cosine_neardup")
    val joinLine = p.linesIterator.find(_.contains("HashJoin")).getOrElse(
      fail(s"no hash join in q44 plan:\n$p"))
    assert(joinLine.contains("bucket"),
      s"q44 must block on (label, bucket) — label-only is all-pairs within a label:\n$joinLine")
    assert(joinLine.contains("label"), s"label must stay in the blocking key:\n$joinLine")
  }

  test("q60 pin: cell equi-join + rank-1 via WindowGroupLimit + cached assignment") {
    val p = finalPlan("q60_ann_ivf")
    val joinLine = p.linesIterator.find(_.contains("HashJoin")).getOrElse(
      fail(s"no hash join in q60 plan:\n$p"))
    assert(joinLine.contains("cell"), s"kNN probe must join on the IVF cell:\n$joinLine")
    assert(p.contains("WindowGroupLimit"), "rank-1 must prune inside the window")
    assert(p.contains("InMemoryTableScan"), "centroid assignment must be cached (consumed twice)")
  }

  test("q65 pin: full-outer sort-merge + orders-agg exchange reuse") {
    val p = finalPlan("q65_outer_join_variants")
    assert(p.contains("SortMergeJoin") && p.contains("FullOuter"),
      s"full outer must stay sort-merge:\n$p")
    assert(p.contains("ReusedExchange"),
      s"the urgent-orders aggregate must reuse one exchange across both joins:\n$p")
    assert(hashExchanges(p) <= 4, s"q65 gained a shuffle:\n$p")
  }

  test("q68 pin: band rewrite joins on the bucket with 2 agg exchanges, no extra shuffle") {
    val p = finalPlan("q68_band_join_rule")
    val joinLine = p.linesIterator.find(_.contains("HashJoin")).getOrElse(
      fail(s"no hash join in q68 plan:\n$p"))
    assert(joinLine.contains("__graft_ij_bucket"), s"band join must ride the bucket key:\n$joinLine")
    assert(hashExchanges(p) <= 2, s"q68 gained a shuffle beyond the aggregation pair:\n$p")
  }

  test("q82/q83 pin: anti and full-outer band joins ride the rewrite, not nested-loop") {
    for (q <- Seq("q82_anti_band_join", "q83_full_outer_band_join")) {
      val p = finalPlan(q)
      assert(p.contains("__graft_ij_bucket"), s"$q must ride the band rewrite:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$q still nested-loop:\n$p")
    }
  }

  test("q88 pin: combined layout prunes partitions AND joins without a hash exchange") {
    val df = Registry.byName("q88_partitioned_bucketed").fn(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // partition pruning: the scan location lists ONLY the o_orderstatus=F dir
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus=F"),
      s"status filter must prune partitions:\n${p.take(800)}")
    assert(p.contains("Bucketed: true"), "both scans must read bucketed layout")
    // the JOIN is shuffle-free; the single hash exchange is the c_mktsegment
    // aggregation — a different key than the bucket key, so it must shuffle
    assert(p.contains("SortMergeJoin"), s"merge hint must pin SMJ:\n${p.take(600)}")
    assert(hashExchanges(p) == 1,
      s"only the mktsegment agg may shuffle (join must ride the buckets):\n$p")
  }

  test("q284 pin: storage-partitioned join + agg plan ZERO hash exchanges") {
    // both graft tables are identity-partitioned by nat: the scans report
    // KeyGroupedPartitioning (GraftSpj), so the nat-keyed join AND the
    // nat-keyed aggregation both plan without any exchange — the only
    // shuffle in the query is the final ORDER BY's range partitioning.
    // Broadcast is disabled so the pin proves the GROUPED join (at sf0.001
    // the tiny dim would otherwise broadcast and hide the SPJ evidence).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = finalPlan("q284_storage_partitioned_join")
      assert(hashExchanges(p) == 0,
        s"SPJ must eliminate every hash exchange (join and agg):\n$p")
      assert(!p.contains("BroadcastExchange"),
        s"the grouped join must not degrade to a broadcast:\n${p.take(600)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("q285 pin: bucketed SPJ joins shuffle-free; only the rollup exchanges") {
    // the orders x lineitem join rides the derived-bucket KeyGroupedPartitioning
    // (join keys (bkt, k) ⊇ partition key bkt, co-partition on the subset) —
    // the single hash exchange is the returnflag rollup, a different key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = finalPlan("q285_bucketed_spj")
      assert(hashExchanges(p) == 1,
        s"only the flag rollup may shuffle (the fact-fact join must ride the buckets):\n$p")
      assert(!p.contains("BroadcastExchange"),
        s"the grouped join must not degrade to a broadcast:\n${p.take(600)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("q288 pin: native bucket tables join on k alone with ONE exchange (the rollup)") {
    // both fact scans report bucket(16, k) resolved through the catalog's
    // FunctionCatalog — the k-only join co-partitions with no exchange; the
    // single hash exchange is the status rollup, a different key
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = finalPlan("q288_native_bucket_join")
      assert(hashExchanges(p) == 1,
        s"only the status rollup may shuffle (the k-join must ride the buckets):\n$p")
      assert(!p.contains("BroadcastExchange"),
        s"the grouped join must not degrade to a broadcast:\n${p.take(600)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
  }

  test("q96 pin: sessionization windows and session agg share ONE hash exchange") {
    // lag-window, running-sum window, and (user_id, session_id) agg all cluster
    // by user_id: EnsureRequirements must satisfy the agg with the windows'
    // HashPartitioning(user_id) instead of reshuffling on the wider key.
    val p = finalPlan("q96_sessionization")
    assert(p.contains("Window"), s"sessionization must plan windows:\n${p.take(400)}")
    assert(hashExchanges(p) == 1,
      s"windows + agg must ride one user_id exchange:\n$p")
  }

  test("q101 pin: range-layout write plans a RangePartitioning exchange") {
    val df = Tables.orders(spark, sf)
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"repartitionByRange must plan a range exchange:\n${p.take(600)}")
    assert(p.contains("Sort"), "files must be written sorted within partitions")
  }

  test("join strategy hints steer the planner: shuffle_hash and shuffle_replicate_nl") {
    // the two hints not already exercised by the corpus (broadcast: q03,
    // merge: q69/q88): shuffle_hash forces a ShuffledHashJoin where SMJ would
    // win by default; shuffle_replicate_nl forces a replicated nested-loop
    // cartesian — the explicit escape hatches when the planner's choice is
    // wrong for a known workload.
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf)
    val sh = c.hint("shuffle_hash").join(o, col("c_custkey") === col("o_custkey"))
    assert(sh.queryExecution.executedPlan.toString.contains("ShuffledHashJoin"),
      "shuffle_hash hint must force a shuffled hash join")
    val nl = Tables.region(spark, sf).hint("shuffle_replicate_nl")
      .crossJoin(Tables.nation(spark, sf))
    assert(nl.queryExecution.executedPlan.toString.contains("CartesianProduct"),
      "shuffle_replicate_nl must plan the replicated nested-loop form")
    assert(nl.count() == 5 * 25)
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // The scale pattern behind every partitioned star join: the fact table is
    // partitioned on the join key, the dim filter is only known at runtime, and
    // DPP injects a dynamicpruning subquery into the fact scan's
    // PartitionFilters so unmatched partitions are never read.
    import spark.implicits._
    val c = spark.conf
    // At test scale (tiny fact, no CBO stats) PartitionPruning.pruningHasBenefit
    // declines under the stats-based estimate; useStats=false switches it to the
    // fallback-filter-ratio path, which is how a real partitioned 100 TB fact
    // table (where the benefit is obvious) gets pruned too.
    val overrides = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false")
    val saved = overrides.map { case (k, _) => k -> c.getOption(k) }
    overrides.foreach { case (k, v) => c.set(k, v) }
    try {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_dpp_p${ProcessHandle.current().pid()}").getAbsolutePath
      Tables.lineitem(spark, sf)
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .write.mode("overwrite").partitionBy("l_returnflag").parquet(dir)
      val fact = spark.read.parquet(dir)
      // the dim must be file-backed: a LocalRelation dim gets its filter constant-
      // folded away, leaving no selective predicate for DPP to latch onto.
      // The filter must also survive optimization as a form isLikelySelective
      // accepts: a bare boolean attribute (or `keep = true`, which
      // BooleanSimplification reduces to one) is NOT considered selective, so
      // the filter column is a string compared by equality — and it must not be
      // the join key, or constraint inference would turn it into a STATIC
      // partition filter and there'd be nothing dynamic left to prune.
      Seq(("R", "yes"), ("A", "no"), ("N", "no")).toDF("flag", "keep")
        .write.mode("overwrite").parquet(s"$dir-dim")
      val dim = spark.read.parquet(s"$dir-dim")
      val joined = fact.join(dim, fact("l_returnflag") === dim("flag"))
        .filter(col("keep") === "yes")
        .agg(sum(col("l_quantity")).as("q"))
      val leaves = joined.queryExecution.executedPlan.collectLeaves()
        .map(_.toString).mkString("\n")
      assert(leaves.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamicpruning partition filter on the fact scan:\n${leaves.take(800)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("runtime bloom filter: selective dim join injects might_contain on the fact side") {
    // Spark's own runtime row-level filter (the built-in twin of q123's manual
    // bloom): with the size thresholds lowered to test scale, the optimizer
    // plans bloom_filter_agg on the creation side and might_contain above the
    // fact scan, cutting shuffled rows before the join.
    val c = spark.conf
    val overrides = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // InjectRuntimeFilter bails on any join it COULD plan as broadcast — the
      // filtered orders side is far under the default 10 MB threshold at test
      // scale, so broadcast must be disabled for the injection path to engage
      // (at 100 TB both sides exceed the threshold and this happens naturally).
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = overrides.map { case (k, _) => k -> c.getOption(k) }
    overrides.foreach { case (k, v) => c.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        // shuffle-join path: runtime filters skip broadcast-join app sides
        .hint("shuffle_hash")
      val ord = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") && p.contains("bloom_filter_agg"),
        s"expected an injected runtime bloom filter:\n${p.take(1000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(c.unset(k))(c.set(k, _))
    }
  }

  test("q122/q124: sketch-then-score shapes run exactly two corpus scans") {
    // the round-5 verdict's "weak" items: both queries claimed a minimal-pass
    // shape while scanning the exploded corpus three times. Pin the fix: after
    // execution (so AQE exchange reuse is applied), the final physical plan
    // must contain exactly two FileScans of the documents table — q122's c1 is
    // derived from the vocab-sized c2 (its shared exchange is reused, not
    // rescanned) and q124's n_total rides in the sketch aggregate.
    Seq("q122_bigram_lm_score", "q124_heavy_hitters").foreach { q =>
      val df = Registry.byName(q).fn(spark, sf)
      df.collect() // finalize the adaptive plan so exchange reuse materializes
      val full = df.queryExecution.executedPlan.toString
      // the adaptive plan prints BOTH the final and the initial plan — count
      // scans only in the final section (reused exchanges print as one-line
      // ReusedExchange/TableCacheQueryStage references, not repeated subtrees)
      val p = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i  => full.substring(0, i)
      }
      val scans = "FileScan".r.findAllIn(p).size
      assert(scans == 2, s"$q must read the corpus exactly twice, saw $scans:\n${p.take(1200)}")
    }
  }

  test("q124: the exact recheck joins against BROADCAST candidates") {
    val df = Registry.byName("q124_heavy_hitters").fn(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "the ≤ k candidate rows must broadcast — a shuffle join here re-shuffles the corpus")
  }

  test("q123: bloom probe filters the fact side below the join, above the scan") {
    // the pre-shuffle row cut is the entire point of the pattern: the UDF
    // membership probe must sit BETWEEN the join and the lineitem scan, so
    // non-candidate rows never reach the exchange.
    val df = Registry.byName("q123_bloom_prejoin").fn(spark, sf)
    val lines = df.queryExecution.optimizedPlan.toString.linesIterator.toSeq
    val joinIdx = lines.indexWhere(_.contains("Join"))
    val udfIdx = lines.indexWhere(l => l.contains("Filter") && l.contains("UDF"))
    val scanIdx = lines.indexWhere(l => l.contains("Relation") && l.contains("l_orderkey"))
    assert(joinIdx >= 0 && udfIdx > joinIdx,
      s"probe must sit under the join (join@$joinIdx udf@$udfIdx):\n${lines.mkString("\n").take(900)}")
    assert(scanIdx > udfIdx,
      s"probe must sit above the lineitem scan (udf@$udfIdx scan@$scanIdx)")
  }

  test("q125: per-iteration lineage is one join + one agg over the cached graph") {
    // a persist regression would splice the full edge-building subtree (self-
    // join + distinct + degree agg) into EVERY iteration — visible here as the
    // join/aggregate counts jumping from PrIters to ~4× that.
    val (top, caches) = graft.queries.Round5Queries.pagerankRanks(spark, sf)
    try {
      val p = top.queryExecution.optimizedPlan
      val joins = p.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      val aggs = p.collect { case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
      assert(joins.size == 5, s"expected 5 per-iteration joins, saw ${joins.size}")
      assert(aggs.size == 5, s"expected 5 per-iteration aggregates, saw ${aggs.size}")
      assert(p.collectLeaves().exists(_.nodeName.contains("InMemoryRelation")),
        "links/deg must resolve to cached frames, not recomputed subtrees")
    } finally caches.foreach(_.unpersist())
  }

  test("q166: NOT IN plans a null-aware broadcast anti join") {
    // the third argument printed after BuildRight is isNullAwareAntiJoin: a
    // plain LeftAnti would silently change NOT IN's three-valued semantics
    // the moment the subquery column holds a NULL
    val df = Registry.byName("q166_not_in_null_aware").fn(spark, sf)
    df.collect() // AQE: the final plan materializes the broadcast decision
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti, BuildRight, true"),
      s"expected a null-aware broadcast anti join:\n${plan.take(1200)}")
  }

  test("every declared query plans clean: no cartesian, no unaudited global window") {
    // ONE planning pass over the whole corpus (the lake queries' DDL/DML runs
    // eagerly at plan time — don't pay it twice), checking two scale-killer
    // classes:
    //  - CartesianProduct anywhere except the declared cross join (q08);
    //  - an unpartitioned Window, which funnels EVERY row through one task.
    //    The two allowed cases run over inputs that are aggregate-sized by
    //    construction, audited as such:
    //      q98  — cumulative token-coverage curve over the vocab-sized
    //             frequency table (already grouped; the curve IS the result)
    //      q146 — final dominance window over the per-partition-pruned skyline
    //             CANDIDATES (frontier-sized — the pruning before it is the
    //             operator's whole point)
    //      q233 — largest-remainder ranking over the per-NATION aggregate
    //             (≤25 rows — dimension-bounded by construction)
    //      q246 — grand-total window over the 9-row first-digit frequency
    //             table (digit-bounded by construction)
    //      q247 — trailing-7-day set union over the per-DAY aggregate
    //             (|days| rows — calendar-bounded by construction)
    //      q252 — Kaplan–Meier cumulative at-risk/survival windows over the
    //             30-day-bucketed time table (≤ ~25 rows at any scale)
    //      q255 — quintile-boundary rank selection over the customer
    //             aggregate (exact oracle-matchable quantiles need a rank;
    //             the query documents approx_percentile as the scale swap)
    //    collectWithSubqueries so a window nested in a subquery can't hide.
    val allowedGlobalWindow =
      Set("q98_vocab_coverage", "q146_skyline", "q233_largest_remainder_proration",
        "q246_benford_profile", "q247_rolling_distinct_users", "q252_kaplan_meier",
        "q255_rfm_segmentation",
        // q267: the KS cumulative walk runs over the DISTINCT-CENTS aggregate
        // (bounded by the value range at ~49k rows, never corpus-sized)
        "q267_ks_test",
        // q268: both rank windows run over top-200 sort+LIMIT cuts — the
        // TakeOrdered happens distributed BEFORE the window sees any rows
        "q268_rrf_fusion",
        // q269: the rank walk runs over the same distinct-cents aggregate
        // as q267 — bounded by the value range, never corpus-sized
        "q269_mann_whitney",
        // q270: prefix-sum + running-min windows over the DAILY aggregate —
        // bounded by the calendar
        "q270_cusum_drift",
        // q273: rank walks over each variable's DISTINCT-VALUE aggregate
        // (entity-sized for spend; the documented 100 TB swap is q160's
        // range-partitioned enumerate)
        "q273_spearman")
    Registry.all.foreach { q =>
      val df = q.fn(spark, sf)
      if (q.name != "q08_cross_join") {
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n${p.take(500)}")
      }
      val glob = df.queryExecution.optimizedPlan.collectWithSubqueries {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      assert(glob.isEmpty || allowedGlobalWindow.contains(q.name),
        s"${q.name} plans a global (single-task) window outside the allowlist")
    }
  }

  test("q250 PQ pins: every codebook join broadcasts (centroid side is 16 rows)") {
    val df = Registry.byName("q250_product_quantization").fn(spark, sf)
    df.collect()
    // judge the FINAL AQE plan only — the rendered string also carries the
    // initial (pre-runtime-stats) plan, where the same joins are sort-merge
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!plan.contains("SortMergeJoin"),
      "a centroid join fell back to sort-merge — the 16-row side must broadcast")
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("SQL join hints override the physical strategy (BROADCAST / MERGE / SHUFFLE_HASH)") {
    graft.Tables.orders(spark, sf).createOrReplaceTempView("hint_o")
    graft.Tables.customer(spark, sf).createOrReplaceTempView("hint_c")
    def planFor(hint: String): String = spark.sql(
      s"SELECT /*+ $hint */ c.c_custkey, o.o_orderkey FROM hint_o o JOIN hint_c c ON o.o_custkey = c.c_custkey")
      .queryExecution.executedPlan.toString
    // each hint must surface its strategy — the hint surface is how a user
    // overrides a mis-estimated build side without touching configs
    assert(planFor("BROADCAST(c)").contains("BroadcastHashJoin"))
    val merge = planFor("MERGE(c)")
    assert(merge.contains("SortMergeJoin") && !merge.contains("BroadcastHashJoin"),
      s"MERGE hint ignored:\n${merge.take(400)}")
    val sh = planFor("SHUFFLE_HASH(c)")
    assert(sh.contains("ShuffledHashJoin"), s"SHUFFLE_HASH hint ignored:\n${sh.take(400)}")
  }

  test("DISTRIBUTE BY / SORT BY plan a hash exchange + partition-local sort, no global sort") {
    graft.Tables.orders(spark, sf).createOrReplaceTempView("dist_o")
    val df = spark.sql(
      "SELECT o_custkey, o_totalprice FROM dist_o DISTRIBUTE BY o_custkey SORT BY o_totalprice")
    val p = df.queryExecution.executedPlan.toString
    // the Sort node renders `Sort [keys], <global>, 0` — SORT BY must plan a
    // partition-LOCAL sort (global=false) and never a global one
    assert(p.contains("Sort [o_totalprice") && p.contains("], false, 0"),
      s"SORT BY must be partition-local:\n${p.take(400)}")
    assert(!p.contains("], true, 0"), s"unexpected GLOBAL sort:\n${p.take(400)}")
    assert(p.contains("hashpartitioning(o_custkey"),
      s"DISTRIBUTE BY must hash-partition:\n${p.take(400)}")
  }

  test("q221 pin: lake audit aggregate serves from zone maps — no parquet scan in the plan") {
    val df = graft.Registry.byName("q221_lake_stats_aggregate").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-stats-agg"),
      s"expected the stats-served aggregate scan:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"),
      s"the audit aggregate must read NO data file:\n$plan")
  }

  test("q290 pin: per-partition rollup serves from zone maps — no parquet scan in the plan") {
    val df = graft.Registry.byName("q290_partition_rollup_pushdown").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-stats-agg"),
      s"expected the stats-served grouped aggregate scan:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"),
      s"the per-partition rollup must read NO data file:\n$plan")
  }

  test("q183 pin: SQL pipe syntax plans the SAME physical tree as the classic form") {
    graft.Tables.lineitem(spark, sf).createOrReplaceTempView("pipe_pin_li")
    val piped = spark.sql(
      """FROM pipe_pin_li
        ||> WHERE l_shipdate <= DATE'1998-09-02'
        ||> AGGREGATE COUNT(*) AS n GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
    val classic = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n FROM pipe_pin_li
        |WHERE l_shipdate <= DATE'1998-09-02'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    // pipe syntax is resolution-time sugar: the OPTIMIZED plans must be
    // structurally identical (same scan, same pushed filter, same agg, same
    // sort) — canonicalized to erase expression ids
    assert(piped.queryExecution.optimizedPlan.canonicalized ===
      classic.queryExecution.optimizedPlan.canonicalized,
      s"pipe plan diverged from classic:\n${piped.queryExecution.optimizedPlan}\n--- vs ---\n${classic.queryExecution.optimizedPlan}")
  }
}
