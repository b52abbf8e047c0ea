package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Two cluster-scale optimizer capabilities the engine relies on but no single
  * declared query can pin:
  *
  *  - CBO statistics: `ANALYZE TABLE ... COMPUTE STATISTICS` feeds rowCount /
  *    sizeInBytes into the optimizer — the input join reorder and broadcast
  *    decisions read at 100 TB (a dimension that *looks* big by file size but is
  *    known-small by stats still broadcasts).
  *  - AQE runtime Bloom-filter injection: a selective filter on one join side
  *    plants a `bloom_filter_agg`/`might_contain` pair that prunes the probe side
  *    BEFORE the shuffle — the built-in generalization of manual semi-join
  *    pre-filtering.
  */
class StatsRuntimeFilterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("ANALYZE TABLE feeds rowCount and column stats into the optimizer") {
    val t = s"graft_stats_probe_p${ProcessHandle.current().pid()}"
    graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").saveAsTable(t)
    val cboSaved = spark.conf.getOption("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true") // rowCount propagates only under CBO
    try {
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR ALL COLUMNS")
      val stats = spark.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1500)),
        s"analyzed rowCount must be exact: ${stats.rowCount}")
      assert(stats.sizeInBytes > 0)
      val colStats = stats.attributeStats.map { case (a, s) => a.name -> s }
      assert(colStats.get("o_orderkey").exists(_.distinctCount.isDefined),
        s"column stats must carry NDV: $colStats")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      cboSaved.fold(spark.conf.unset("spark.sql.cbo.enabled"))(
        spark.conf.set("spark.sql.cbo.enabled", _))
    }
  }

  test("CBO join reorder restructures a chain join to start from the small end") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    // Chain lineitem(6000) - orders(1500) - customer(150) - nation(25), WRITTEN
    // starting from the big end. With ANALYZE'd rowCounts and joinReorder on,
    // the cost-based reorder must instead join the small end (customer ⋈
    // nation, 150 rows) as its own subtree — the decision that keeps
    // intermediate cardinality low at 100 TB. Without CBO the written order
    // stands and no (customer, nation)-only join subtree exists.
    val pid = ProcessHandle.current().pid()
    val t = Map(
      "li" -> s"graft_ro_li_$pid", "ord" -> s"graft_ro_ord_$pid",
      "cust" -> s"graft_ro_cust_$pid", "nat" -> s"graft_ro_nat_$pid")
    graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .write.mode("overwrite").saveAsTable(t("li"))
    graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .write.mode("overwrite").saveAsTable(t("ord"))
    graft.Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      .write.mode("overwrite").saveAsTable(t("cust"))
    graft.Tables.nation(spark, sf).select("n_nationkey", "n_name")
      .write.mode("overwrite").saveAsTable(t("nat"))
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    def chain() = spark.table(t("li"))
      .join(spark.table(t("ord")), col("l_orderkey") === col("o_orderkey"))
      .join(spark.table(t("cust")), col("o_custkey") === col("c_custkey"))
      .join(spark.table(t("nat")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name")).agg(sum(col("l_quantity")).as("qty"))
    def hasCustNatSubtree(): Boolean =
      chain().queryExecution.optimizedPlan.collect { case j: Join => j }.exists { j =>
        val s = j.toString
        s.contains(t("cust")) && s.contains(t("nat")) &&
          !s.contains(t("li")) && !s.contains(t("ord"))
      }
    try {
      t.values.foreach(n => spark.sql(s"ANALYZE TABLE $n COMPUTE STATISTICS"))
      spark.conf.set("spark.sql.cbo.enabled", "false")
      assert(!hasCustNatSubtree(),
        "without CBO the written big-end-first order must stand")
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      assert(hasCustNatSubtree(),
        "with CBO stats the reorder must join customer ⋈ nation as its own subtree")
      // reorder must not change results
      val rows = chain().orderBy(col("n_name")).collect()
      assert(rows.length == 25)
    } finally {
      t.values.foreach(n => spark.sql(s"DROP TABLE IF EXISTS $n"))
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("AQE splits skewed partitions inside a sort-merge join (skew=true)") {
    import org.apache.spark.sql.{functions => F}
    // One hot key (~90% of the left side) against a uniform right side: with
    // the skew thresholds scaled down to fixture size, AQE must mark the SMJ
    // skew-handled — partitions of the hot key are split across tasks instead
    // of pinning one reducer, which is the built-in alternative to q76's
    // manual salting at 100 TB.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 200k rows across 8 explicit slices: enough hot-partition bytes to clear
      // the (scaled-down) skew threshold, and multiple mappers so the skewed
      // reduce partition is splittable by mapper ranges
      val left = spark.range(0, 200000, 1, 8)
        .select((F.when(F.col("id") % 10 < 9, 7L).otherwise(F.col("id") % 1000))
          .as("k"), F.col("id").as("payload"))
      val right = spark.range(0, 1000).select(F.col("id").as("k"), (F.col("id") * 2).as("v"))
      val joined = left.hint("merge").join(right, "k")
        .groupBy().agg(F.count(F.lit(1)).as("n"), F.sum("v").as("sv"))
      val Array(row) = joined.collect()
      assert(row.getLong(0) == 200000L, "every left row joins exactly once")
      val plan = joined.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(plan.contains("skew=true"),
        s"AQE must mark the skewed sort-merge join:\n${plan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("runtime Bloom filter injects might_contain on the probe side of a selective join") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // testdata is tiny; drop the size gates so the injection logic itself is
      // what's under test, not the 10 GB production threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled" -> "false",
      // the rule (correctly) declines when the creation side would broadcast —
      // force the shuffle-join world the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.Tables.lineitem(spark, sf)
      val ord = graft.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000)
      // merge hint: a broadcast join would make the bloom filter pointless (and
      // the optimizer correctly skips injection there)
      val joined = li.hint("merge").join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
      assert(joined.collect().nonEmpty, "query must still return correct rows")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
