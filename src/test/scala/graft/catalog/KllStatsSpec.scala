package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for KLL quantile-sketch stats (`graft.stats.kll` + `t.column_stats`,
  * r17 — the quantile sibling of the NDV sketches): commit-time per-segment
  * KLL harvest, zero-IO cross-segment MERGE serving (per-segment exact
  * medians can never compose — quantiles do not sum), the published rank
  * error bound, coverage honesty, date/timestamp domains, and the
  * DML/compaction re-harvest. */
class KllStatsSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_kll_spec")
    spark.conf.set("spark.sql.catalog.gkl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gkl.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("opt-in harvest: merged quantiles within KLL's rank error across skewed segments") {
    root
    sql("DROP TABLE IF EXISTS gkl.ns.t1")
    sql("""CREATE TABLE gkl.ns.t1 (k BIGINT, cents BIGINT, d DATE) USING parquet
      TBLPROPERTIES ('graft.stats.kll' = '*')""")
    // two DISJOINT skewed waves: the true p50 of the union (≈5000) is inside
    // NEITHER segment's own median (≈2500 and ≈7500) — only a real sketch
    // MERGE can answer, per-segment stats cannot compose
    sql("INSERT INTO gkl.ns.t1 SELECT id, id, DATE'2024-01-01' + CAST(id % 300 AS INT) FROM range(0, 5000)")
    sql("INSERT INTO gkl.ns.t1 SELECT id, id, DATE'2024-01-01' + CAST(id % 300 AS INT) FROM range(5000, 10000)")
    val rows = sql("SELECT * FROM gkl.ns.t1.column_stats ORDER BY column").collect()
    val byCol = rows.map(r => r.getAs[String]("column") -> r).toMap
    // k=200 ⇒ ~1.65% one-sided rank error; 2% of 10000 = 200 rank slack
    val p50 = byCol("cents").getAs[Double]("p50_estimate")
    val p90 = byCol("cents").getAs[Double]("p90_estimate")
    val p99 = byCol("cents").getAs[Double]("p99_estimate")
    assert(math.abs(p50 - 5000.0) <= 200.0, s"p50 $p50 vs exact ~5000")
    assert(math.abs(p90 - 9000.0) <= 200.0, s"p90 $p90 vs exact ~9000")
    assert(math.abs(p99 - 9900.0) <= 200.0, s"p99 $p99 vs exact ~9900")
    // date domain: epoch days (the zone-entry convention); values 2024-01-01
    // + 0..299 uniformly, so p50 ≈ epochDay(2024-01-01) + 150
    val base = java.time.LocalDate.parse("2024-01-01").toEpochDay.toDouble
    val dp50 = byCol("d").getAs[Double]("p50_estimate")
    assert(math.abs(dp50 - (base + 150)) <= 10.0, s"date p50 $dp50 vs ~${base + 150}")
  }

  test("zero IO: quantiles ride the LocalTableScan column_stats plan") {
    val df = sql("SELECT column, p50_estimate FROM gkl.ns.t1.column_stats")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan.take(300))
    assert(!plan.toLowerCase.contains("parquet"), plan.take(300))
  }

  test("coverage honesty: no opt-in or a sketch-less segment -> null, never a partial answer") {
    root
    sql("DROP TABLE IF EXISTS gkl.ns.t2")
    sql("CREATE TABLE gkl.ns.t2 (k BIGINT) USING parquet") // no kll opt-in
    sql("INSERT INTO gkl.ns.t2 SELECT id FROM range(0, 100)")
    val r = sql("SELECT * FROM gkl.ns.t2.column_stats").collect().head
    assert(r.isNullAt(r.fieldIndex("p50_estimate")), "no opt-in -> no quantiles")
    // opting in AFTER a segment exists: the old segment has no sketch, so
    // the estimate stays null instead of answering from half the data
    sql("ALTER TABLE gkl.ns.t2 SET TBLPROPERTIES('graft.stats.kll' = '*')")
    sql("INSERT INTO gkl.ns.t2 SELECT id FROM range(100, 200)")
    val r2 = sql("SELECT * FROM gkl.ns.t2.column_stats").collect().head
    assert(r2.isNullAt(r2.fieldIndex("p50_estimate")),
      "a sketch-less segment must void the estimate, not skew it")
    // strings are not sketchable: the column row stays null under '*'
    sql("DROP TABLE IF EXISTS gkl.ns.t3")
    sql("""CREATE TABLE gkl.ns.t3 (s STRING) USING parquet
      TBLPROPERTIES ('graft.stats.kll' = '*')""")
    sql("INSERT INTO gkl.ns.t3 VALUES ('a'), ('b')")
    val r3 = sql("SELECT * FROM gkl.ns.t3.column_stats").collect().head
    assert(r3.isNullAt(r3.fieldIndex("p50_estimate")))
  }

  test("compaction and COW DML re-harvest: quantiles keep serving and track the data") {
    root
    sql("DROP TABLE IF EXISTS gkl.ns.t4")
    sql("""CREATE TABLE gkl.ns.t4 (k BIGINT) USING parquet
      TBLPROPERTIES ('graft.stats.kll' = 'k')""")
    sql("INSERT INTO gkl.ns.t4 SELECT id FROM range(0, 1000)")
    sql("INSERT INTO gkl.ns.t4 SELECT id FROM range(1000, 2000)")
    sql("CALL gkl.system.compact('ns.t4')")
    val afterCompact = sql("SELECT p50_estimate FROM gkl.ns.t4.column_stats").collect().head
    assert(!afterCompact.isNullAt(0), "compaction must re-harvest the sketch")
    assert(math.abs(afterCompact.getDouble(0) - 1000.0) <= 60.0)
    // COW delete of the top half: the rewritten segment's fresh sketch moves
    // the merged median to the surviving distribution
    sql("CALL gkl.system.delete_where('ns.t4', 'k >= 1000')")
    val afterDelete = sql("SELECT p50_estimate FROM gkl.ns.t4.column_stats").collect().head
    assert(!afterDelete.isNullAt(0))
    assert(math.abs(afterDelete.getDouble(0) - 500.0) <= 40.0,
      s"post-delete p50 ${afterDelete.getDouble(0)} vs ~500")
  }

  test("all-null segments store EMPTY sketches: information, not absence") {
    root
    sql("DROP TABLE IF EXISTS gkl.ns.t5")
    sql("""CREATE TABLE gkl.ns.t5 (k BIGINT, v BIGINT) USING parquet
      TBLPROPERTIES ('graft.stats.kll' = 'v')""")
    sql("INSERT INTO gkl.ns.t5 SELECT id, id * 2 FROM range(0, 500)")
    sql("INSERT INTO gkl.ns.t5 SELECT id, NULL FROM range(500, 600)")
    val r = sql("SELECT * FROM gkl.ns.t5.column_stats WHERE column = 'v'").collect().head
    assert(!r.isNullAt(r.fieldIndex("p50_estimate")),
      "an all-null segment must contribute an empty sketch, not void coverage")
    assert(math.abs(r.getAs[Double]("p50_estimate") - 500.0) <= 30.0)
  }
}
