package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Pins for STORAGE-PARTITIONED JOINS (GraftSpj): zero-exchange plans for
  * joins and aggregations keyed on the partition columns of co-partitioned
  * graft tables, value-set alignment, NULL partitions, multi-segment
  * grouping — and every honest fallback (conf off, pruned key column,
  * mixed-layout after partition evolution), each proven result-identical
  * to the shuffled plan. */
class StoragePartitionedJoinSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_spj")
    spark.conf.set("spark.sql.catalog.gspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gspj.root", d.toString)
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    d
  }

  private def sql(q: String) = spark.sql(q)

  /** HASH exchange count in the FINAL (post-AQE) plan string — exchanges
    * hide inside AdaptiveSparkPlanExec, so tree collection sees none
    * pre-execution (the PlanSpec convention). Range exchanges (a final
    * ORDER BY) are not the joins'/aggs' shuffles and don't count. Collects
    * the frame as a side effect. */
  private def shuffles(df: DataFrame): Int = {
    df.collect()
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)).size
  }

  /** Fixture: two tables partitioned by geo. `a` has us/eu/ap plus a NULL-geo
    * segment and TWO commits to us (multi-segment value); `b` has us/eu only
    * (mismatched value sets). */
  private lazy val fixture: Unit = {
    root
    sql("CREATE TABLE gspj.ns.a (k BIGINT, v BIGINT, geo STRING) USING parquet PARTITIONED BY (geo)")
    sql("CREATE TABLE gspj.ns.b (k BIGINT, w BIGINT, geo STRING) USING parquet PARTITIONED BY (geo)")
    sql("""INSERT INTO gspj.ns.a SELECT id, id * 2,
             CASE WHEN id % 7 = 6 THEN NULL
                  WHEN id % 3 = 0 THEN 'us' WHEN id % 3 = 1 THEN 'eu' ELSE 'ap' END
           FROM range(900)""")
    sql("INSERT INTO gspj.ns.a SELECT id + 5000, id, 'us' FROM range(100)")
    sql("INSERT INTO gspj.ns.b SELECT id, id * 7, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(800)")
  }

  private def withBucketing[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", on.toString)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  private val joinSql =
    """SELECT a.geo, COUNT(*) AS n, SUM(a.v + b.w) AS s
       FROM gspj.ns.a a JOIN gspj.ns.b b ON a.geo = b.geo
       GROUP BY a.geo ORDER BY a.geo"""

  test("co-partitioned join + agg on the partition key plans ZERO exchanges") {
    fixture
    val (plan0, rows) = withBucketing(on = true) {
      val df = sql(joinSql); (shuffles(df), df.collect().toSeq)
    }
    val (planN, expect) = withBucketing(on = false) {
      val df = sql(joinSql); (shuffles(df), df.collect().toSeq)
    }
    assert(plan0 === 0, "SPJ must eliminate every exchange (join AND agg)")
    assert(planN > 0, "the fallback plan shuffles — proving SPJ did the work")
    assert(rows === expect, "grouped and shuffled plans must agree exactly")
    assert(rows.nonEmpty && rows.map(_.getString(0)).toSet === Set("eu", "us"),
      "mismatched value sets (a: us/eu/ap/null, b: us/eu) align via pushPartValues")
  }

  test("aggregation alone on the partition key plans zero exchanges") {
    fixture
    val agg = "SELECT geo, COUNT(*) AS n, SUM(v) AS s FROM gspj.ns.a GROUP BY geo"
    val grouped = withBucketing(on = true) {
      val df = sql(agg); assert(shuffles(df) === 0,
        "KeyGroupedPartitioning satisfies the aggregate's clustering"); df.collect()
    }
    val plain = withBucketing(on = false)(sql(agg).collect())
    assert(grouped.map(r => (String.valueOf(r.getString(0)), r.getLong(1), r.getLong(2))).sortBy(_._1)
      === plain.map(r => (String.valueOf(r.getString(0)), r.getLong(1), r.getLong(2))).sortBy(_._1))
    assert(grouped.exists(_.isNullAt(0)), "the NULL-geo partition groups too")
  }

  test("fallback: projecting away the key column keeps plans + results sane") {
    fixture
    withBucketing(on = true) {
      // no partition column in the output: the scan must not report grouping
      // (Spark resolves reported transforms against the pruned output)
      val df = sql("SELECT SUM(v) AS s FROM gspj.ns.a WHERE k < 100")
      assert(df.collect().head.getLong(0) > 0)
    }
  }

  test("fallback: mixed layout after partition evolution degrades to shuffles") {
    root
    sql("CREATE TABLE gspj.ns.m (k BIGINT, v BIGINT, geo STRING) USING parquet PARTITIONED BY (geo)")
    sql("INSERT INTO gspj.ns.m SELECT id, id % 4, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(200)")
    // REAL evolution (different column) bumps the spec id; the geo-suffixed
    // segments are now old-spec, so grouping on v cannot be reported
    sql("ALTER TABLE gspj.ns.m SET TBLPROPERTIES ('graft.partition-by' = 'v')")
    sql("INSERT INTO gspj.ns.m SELECT id + 1000, id % 4, 'ap' FROM range(50)")
    withBucketing(on = true) {
      val df = sql("SELECT v, COUNT(*) AS n FROM gspj.ns.m GROUP BY v")
      assert(shuffles(df) > 0,
        "old-spec segments cannot report grouping; the scan must fall back")
      assert(df.collect().length === 4)
    }
  }

  test("zone-pruned SPJ: a residual filter keeps the grouped, exchange-free plan") {
    fixture
    withBucketing(on = true) {
      val df = sql(
        """SELECT a.geo, COUNT(*) AS n
           FROM gspj.ns.a a JOIN gspj.ns.b b ON a.geo = b.geo
           WHERE a.k < 600 AND b.k < 600
           GROUP BY a.geo""")
      assert(shuffles(df) === 0)
      assert(df.collect().nonEmpty)
    }
  }

  test("bucket recipe: high-cardinality join rides a derived bucket partition") {
    root
    // the 100 TB fact-fact shape: the join key is too high-cardinality to
    // identity-partition, so both tables partition by bkt = pmod(hash(k), 8)
    // (the explicit-column rendering of Iceberg's bucket transform) and the
    // k-join carries the bucket column — equal k implies equal bkt, so the
    // extra conjunct never changes the result, and SPJ groups on it
    sql("CREATE TABLE gspj.ns.f1 (k BIGINT, v BIGINT, bkt INT) USING parquet PARTITIONED BY (bkt)")
    sql("CREATE TABLE gspj.ns.f2 (k BIGINT, w BIGINT, bkt INT) USING parquet PARTITIONED BY (bkt)")
    sql("INSERT INTO gspj.ns.f1 SELECT id, id * 3, CAST(pmod(xxhash64(id), 8) AS INT) FROM range(2000)")
    sql("INSERT INTO gspj.ns.f2 SELECT id, id * 5, CAST(pmod(xxhash64(id), 8) AS INT) FROM range(1500)")
    withBucketing(on = true) {
      // the join clusters on (bkt, k) while the layout groups on bkt alone:
      // co-partitioning on the SUBSET needs the exact-match requirement off
      spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      val df = sql(
        """SELECT COUNT(*) AS n, SUM(f1.v + f2.w) AS s
           FROM gspj.ns.f1 f1 JOIN gspj.ns.f2 f2
           ON f1.bkt = f2.bkt AND f1.k = f2.k""")
      val n = shuffles(df)
      info(s"bucket-recipe shuffles: $n")
      info(df.queryExecution.executedPlan.toString.take(1800))
      assert(df.collect().head.getLong(0) === 1500L)
      assert(n === 0, "the k-join must ride the bucket grouping, no exchange")
    }
  }

  test("one-side shuffle: a plain view joins a partitioned table with ONE exchange") {
    fixture
    withBucketing(on = true) {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      spark.range(300).selectExpr("id AS k",
        "CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END AS geo")
        .createOrReplaceTempView("plain_side")
      val df = sql(
        """SELECT a.geo, COUNT(*) AS n
           FROM gspj.ns.a a JOIN plain_side p ON a.geo = p.geo
           GROUP BY a.geo""")
      val n = shuffles(df)
      info(s"one-side-shuffle exchanges: $n")
      assert(df.collect().nonEmpty)
      assert(n <= 1, "only the UN-partitioned side may shuffle (storage-partitioned shuffle)")
    }
  }

  test("reported partition-key ordering drops the SMJ sorts too (single-split opt-in)") {
    fixture
    withBucketing(on = true) {
      // the ordering claim is tied to the one-split-per-value layout, which
      // trades plain-scan parallelism for sort-free SMJs — strictly opt-in
      spark.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
      spark.conf.set(GraftSpj.SingleSplitKey, "true")
      try {
        val df = sql(
          """SELECT a.geo, COUNT(*) AS n
             FROM gspj.ns.a a JOIN gspj.ns.b b ON a.geo = b.geo GROUP BY a.geo""")
        df.collect()
        val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
        assert(p.contains("SortMergeJoin"), s"grouped join should be SMJ here:\n${p.take(400)}")
        assert("\\bSort \\[".r.findAllIn(p).isEmpty,
          s"single-key splits are trivially key-sorted — no Sort may plan:\n$p")
        assert("Exchange hashpartitioning".r.findAllIn(p).isEmpty)
      } finally spark.conf.unset(GraftSpj.SingleSplitKey)
    }
  }

  test("plain scans keep file-level parallelism; only clustering consumers group") {
    root
    sql("CREATE TABLE gspj.ns.par (k BIGINT, v BIGINT, geo STRING) USING parquet PARTITIONED BY (geo)")
    (0 until 5).foreach { i =>
      sql(s"INSERT INTO gspj.ns.par SELECT id + ${i * 1000}, id, " +
        "CASE WHEN id % 4 = 0 THEN 'a' WHEN id % 4 = 1 THEN 'b' WHEN id % 4 = 2 THEN 'c' ELSE 'd' END " +
        "FROM range(400)")
    }
    withBucketing(on = true) {
      // force many file-sized splits so split-count != partition-count
      spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
      spark.conf.set("spark.sql.files.openCostInBytes", "1024")
      try {
        def scanTasks[T](f: => T): Int = {
          val counts = scala.collection.mutable.ArrayBuffer.empty[Int]
          val l = new org.apache.spark.scheduler.SparkListener {
            override def onStageSubmitted(
                s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
              counts.synchronized { counts += s.stageInfo.numTasks }
          }
          spark.sparkContext.addSparkListener(l)
          try { f; Thread.sleep(300); counts.max }
          finally spark.sparkContext.removeSparkListener(l)
        }
        // 1. a bare SELECT (scan-only, not even AQE) must NOT collapse to the
        //    4 partition values — the 100 TB full-table-read shape
        val bare = scanTasks(sql("SELECT * FROM gspj.ns.par WHERE v >= 0").collect())
        assert(bare > 4, s"plain scan must keep file-level parallelism, got $bare tasks")
        // 2. an aggregate keyed off the partition column shuffles, so its scan
        //    stage must also stay file-parallel
        val nonKey = scanTasks(
          sql("SELECT v % 10 AS m, COUNT(*) AS n FROM gspj.ns.par GROUP BY 1").collect())
        assert(nonKey > 4, s"non-key agg scan must stay file-parallel, got $nonKey tasks")
        // 3. the partition-keyed aggregate still consumes the grouping: zero
        //    exchanges (and therefore partition-count tasks) — the SPJ promise.
        //    AVG needs rows (the zero-IO stats rollup refuses it), so this
        //    exercises the grouped SCAN; the COUNT form upgrades further to
        //    the stats-agg scan (r16), pinned alongside
        val keyed = sql("SELECT geo, AVG(v) AS a FROM gspj.ns.par GROUP BY geo")
        assert(shuffles(keyed) === 0, "partition-keyed agg keeps the grouped, exchange-free plan")
        assert(keyed.collect().length === 4)
        val counted = sql("SELECT geo, COUNT(*) AS n FROM gspj.ns.par GROUP BY geo")
        assert(counted.queryExecution.executedPlan.toString.contains("graft-stats-agg"),
          "the partition-keyed COUNT serves from zone maps with zero IO")
        assert(counted.collect().map(_.getLong(1)).sum === 2000L)
      } finally {
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
      }
    }
  }

  test("fallback: delete vectors switch the scan off grouping, results exact") {
    root
    sql("""CREATE TABLE gspj.ns.dv1 (k BIGINT, v BIGINT, geo STRING) USING parquet
           PARTITIONED BY (geo) TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gspj.ns.dv1 SELECT id, id, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(400)")
    withBucketing(on = true) {
      // AVG needs rows, so this pins the grouped SCAN (a COUNT would serve
      // from the r16 zero-IO stats rollup and never plan the parquet read)
      val before = sql("SELECT geo, AVG(v) AS a FROM gspj.ns.dv1 GROUP BY geo")
      assert(shuffles(before) === 0, "pre-delete the clean scan reports grouping")
      // a MOR delete lands vectors: the composite DV scan honestly reports
      // nothing — plans shuffle again, but the merged rows must be exact
      sql("DELETE FROM gspj.ns.dv1 WHERE v < 100")
      val after = sql("SELECT geo, COUNT(*) AS n FROM gspj.ns.dv1 GROUP BY geo ORDER BY geo")
      assert(after.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        === Seq(("eu", 150L), ("us", 150L)),
        "DV-merged reads under the bucketing conf must serve exact rows")
    }
  }

  test("compaction preserves the grouped layout (suffixes carry through)") {
    root
    sql("CREATE TABLE gspj.ns.cp (k BIGINT, v BIGINT, geo STRING) USING parquet PARTITIONED BY (geo)")
    (0 until 3).foreach { i =>
      sql(s"INSERT INTO gspj.ns.cp SELECT id + ${i * 100}, id, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END FROM range(100)")
    }
    sql("CALL gspj.system.compact('ns.cp')")
    withBucketing(on = true) {
      val df = sql("SELECT geo, COUNT(*) AS n, SUM(v) AS s FROM gspj.ns.cp GROUP BY geo")
      assert(shuffles(df) === 0,
        "compacted partition-pure segments must still report grouping")
      assert(df.collect().map(_.getLong(1)).sum === 300L)
    }
  }

  test("multi-column partition tuples group; the two-key join is exchange-free") {
    root
    sql("CREATE TABLE gspj.ns.m1 (k BIGINT, geo STRING, tier BIGINT) USING parquet PARTITIONED BY (geo, tier)")
    sql("CREATE TABLE gspj.ns.m2 (w BIGINT, geo STRING, tier BIGINT) USING parquet PARTITIONED BY (geo, tier)")
    sql("""INSERT INTO gspj.ns.m1 SELECT id, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END, id % 3 FROM range(600)""")
    sql("""INSERT INTO gspj.ns.m2 SELECT id, CASE WHEN id % 2 = 0 THEN 'us' ELSE 'eu' END, id % 2 FROM range(400)""")
    withBucketing(on = true) {
      val df = sql(
        """SELECT a.geo, a.tier, COUNT(*) AS n
           FROM gspj.ns.m1 a JOIN gspj.ns.m2 b ON a.geo = b.geo AND a.tier = b.tier
           GROUP BY a.geo, a.tier""")
      assert(shuffles(df) === 0,
        "a join clustered on the FULL partition tuple must plan no exchange")
      val expect = withBucketing(on = false)(sql(
        """SELECT a.geo, a.tier, COUNT(*) AS n
           FROM gspj.ns.m1 a JOIN gspj.ns.m2 b ON a.geo = b.geo AND a.tier = b.tier
           GROUP BY a.geo, a.tier""").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
      assert(df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet === expect)
    }
  }

  test("date-typed partition keys group (canonical-string round trip)") {
    root
    sql("CREATE TABLE gspj.ns.d1 (k BIGINT, day DATE) USING parquet PARTITIONED BY (day)")
    sql("CREATE TABLE gspj.ns.d2 (w BIGINT, day DATE) USING parquet PARTITIONED BY (day)")
    sql("INSERT INTO gspj.ns.d1 SELECT id, DATE_ADD(DATE'2024-01-01', CAST(id % 3 AS INT)) FROM range(90)")
    sql("INSERT INTO gspj.ns.d2 SELECT id, DATE_ADD(DATE'2024-01-01', CAST(id % 2 AS INT)) FROM range(60)")
    withBucketing(on = true) {
      val df = sql(
        """SELECT d1.day, COUNT(*) AS n FROM gspj.ns.d1 d1 JOIN gspj.ns.d2 d2
           ON d1.day = d2.day GROUP BY d1.day ORDER BY d1.day""")
      assert(shuffles(df) === 0)
      val rows = df.collect()
      assert(rows.length === 2, "only the two shared days join")
      assert(rows.map(_.getLong(1)).toSeq === Seq(30L * 30L, 30L * 30L))
    }
  }
}
