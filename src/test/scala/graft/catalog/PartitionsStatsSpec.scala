package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Pins for the two round-14 planner-facing surfaces:
  *   - `t.partitions` metadata table: per-partition rollups from suffixes +
  *     zone stats, planned as a LocalScan (zero jobs, zero file IO);
  *   - committed statistics reported through SupportsReportStatistics:
  *     EXACT numRows from zone stats and NDV estimates from opt-in HLL
  *     sketches, so the broadcast threshold / CBO see graft tables
  *     truthfully. */
class PartitionsStatsSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_ps_spec")
    spark.conf.set("spark.sql.catalog.gps", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gps.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("t.partitions: per-value rollup, exact rows, LocalScan plan") {
    root
    sql("DROP TABLE IF EXISTS gps.ns.p1")
    sql("""CREATE TABLE gps.ns.p1 (k BIGINT, region STRING) USING parquet
           PARTITIONED BY (region)""")
    sql("INSERT INTO gps.ns.p1 VALUES (1, 'eu'), (2, 'eu'), (3, 'us')")
    sql("INSERT INTO gps.ns.p1 VALUES (4, 'eu'), (5, NULL)")
    val df = sql("SELECT partition, n_segments, n_rows, n_delete_vectors " +
      "FROM gps.ns.p1.partitions ORDER BY partition NULLS LAST")
    // zero-job contract: the plan is a local scan over driver-built rows
    assert(df.queryExecution.executedPlan.toString.contains("LocalTableScan"),
      s"partitions metadata must plan as a LocalScan:\n${df.queryExecution.executedPlan}")
    val rows = df.collect().map(r =>
      (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    assert(rows === Seq(("eu", 2, 3L, 0), ("null", 1, 1L, 0), ("us", 1, 1L, 0)))
  }

  test("t.partitions: unpartitioned-era segments roll into one NULL-partition row") {
    root
    sql("DROP TABLE IF EXISTS gps.ns.p2")
    sql("CREATE TABLE gps.ns.p2 (k BIGINT, v STRING) USING parquet")
    sql("INSERT INTO gps.ns.p2 VALUES (1, 'a')")
    sql("INSERT INTO gps.ns.p2 VALUES (2, 'b')")
    val rows = sql("SELECT partition, spec_id, n_segments, n_rows FROM gps.ns.p2.partitions")
      .collect()
    assert(rows.length === 1)
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) === 0L)
    assert(rows.head.getInt(2) === 2 && rows.head.getLong(3) === 2L)
  }

  test("scan reports EXACT numRows from committed zone stats") {
    root
    sql("DROP TABLE IF EXISTS gps.ns.s1")
    sql("CREATE TABLE gps.ns.s1 (k BIGINT, v STRING) USING parquet")
    sql("INSERT INTO gps.ns.s1 SELECT id, CAST(id AS STRING) FROM range(100)")
    sql("INSERT INTO gps.ns.s1 SELECT id, CAST(id AS STRING) FROM range(100, 137)")
    val df = sql("SELECT * FROM gps.ns.s1")
    val scans = df.queryExecution.executedPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val stats = scans.head.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().isPresent && stats.numRows().getAsLong === 137L,
      s"expected exact 137 rows, got ${stats.numRows()}")
    assert(stats.sizeInBytes().isPresent && stats.sizeInBytes().getAsLong > 0L,
      "sizeInBytes must keep passing through from the parquet scan")
  }

  test("zone-pruned scans report the SURVIVING segments' rows; NDV sketches surface as distinctCount") {
    root
    sql("DROP TABLE IF EXISTS gps.ns.s2")
    sql("""CREATE TABLE gps.ns.s2 (k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.stats.ndv' = 'k', 'write.order-by' = 'k')""")
    sql("INSERT INTO gps.ns.s2 SELECT id, id FROM range(0, 50)")       // k in [0,49]
    sql("INSERT INTO gps.ns.s2 SELECT id, id FROM range(1000, 1025)")  // k in [1000,1024]
    val pruned = sql("SELECT * FROM gps.ns.s2 WHERE k >= 1000")
    val scan = pruned.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val st = scan.estimateStatistics()
    assert(st.numRows().isPresent && st.numRows().getAsLong === 25L,
      s"zone pruning dropped the first segment, so exact rows = 25, got ${st.numRows()}")
    // NDV from the surviving segment's HLL sketch (~1.6% RSE at lgK=12 —
    // exact at this cardinality)
    val colStats = st.columnStats()
    val kStats = colStats.entrySet().iterator()
    var found = false
    while (kStats.hasNext) {
      val e = kStats.next()
      if (e.getKey.fieldNames()(0) == "k") {
        found = true
        assert(e.getValue.distinctCount().isPresent &&
          math.abs(e.getValue.distinctCount().getAsLong - 25L) <= 2L,
          s"ndv estimate for k: ${e.getValue.distinctCount()}")
        assert(e.getValue.nullCount().isPresent &&
          e.getValue.nullCount().getAsLong === 0L)
      }
    }
    assert(found, "column k must report statistics")
  }

  test("a dim-sized graft table joins as BROADCAST from reported stats") {
    root
    sql("DROP TABLE IF EXISTS gps.ns.dim")
    sql("CREATE TABLE gps.ns.dim (k BIGINT, name STRING) USING parquet")
    sql("INSERT INTO gps.ns.dim SELECT id, CAST(id AS STRING) FROM range(10)")
    val fact = spark.range(10000).selectExpr("id % 10 AS k", "id AS x")
    val joined = fact.join(sql("SELECT * FROM gps.ns.dim"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"a 10-row graft dim must plan as the broadcast side:\n$plan")
  }
}
