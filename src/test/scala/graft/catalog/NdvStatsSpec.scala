package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for NDV sketch stats (`graft.stats.ndv` + `t.column_stats`):
  * commit-time HLL harvest, zero-IO union serving, accuracy bound, opt-out
  * nulls, coverage honesty (any sketch-less segment voids the estimate),
  * compaction re-harvest, and the LocalTableScan (no files opened) plan. */
class NdvStatsSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_ndv_spec")
    spark.conf.set("spark.sql.catalog.gnv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnv.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("opt-in harvest: unioned estimate within 5% of exact across multi-segment overlap") {
    root
    sql("DROP TABLE IF EXISTS gnv.ns.t1")
    sql("""CREATE TABLE gnv.ns.t1 (k BIGINT, tag STRING) USING parquet
      TBLPROPERTIES ('graft.stats.ndv' = '*')""")
    // overlapping ranges across two commits: per-segment exact counts can NOT
    // be summed (1500 + 1500 != 2000 distinct) — the union must handle it
    sql("INSERT INTO gnv.ns.t1 SELECT id, concat('t', id % 7) FROM range(0, 1500)")
    sql("INSERT INTO gnv.ns.t1 SELECT id, concat('t', id % 7) FROM range(500, 2000)")
    val rows = sql("SELECT * FROM gnv.ns.t1.column_stats ORDER BY column").collect()
    val byCol = rows.map(r => r.getAs[String]("column") -> r).toMap
    assert(byCol("k").getAs[Long]("rows") === 3000L)
    assert(byCol("k").getAs[Long]("nulls") === 0L)
    val estK = byCol("k").getAs[Long]("ndv_estimate")
    assert(math.abs(estK - 2000L) <= 100L, s"k ndv estimate $estK vs exact 2000")
    val estTag = byCol("tag").getAs[Long]("ndv_estimate")
    assert(estTag === 7L, s"tag ndv estimate $estTag vs exact 7 (exact at low cardinality)")
  }

  test("zero IO: column_stats plans a LocalTableScan — no parquet in the plan") {
    val df = sql("SELECT * FROM gnv.ns.t1.column_stats")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), plan.take(300))
    assert(!plan.toLowerCase.contains("parquet"), plan.take(300))
  }

  test("coverage honesty: a sketch-less segment voids the estimate, never under-counts") {
    sql("DROP TABLE IF EXISTS gnv.ns.t2")
    sql("CREATE TABLE gnv.ns.t2 (k BIGINT) USING parquet") // no ndv opt-in
    sql("INSERT INTO gnv.ns.t2 SELECT id FROM range(0, 100)")
    sql("ALTER TABLE gnv.ns.t2 SET TBLPROPERTIES('graft.stats.sums' = '*')") // unrelated alter
    val r = sql("SELECT * FROM gnv.ns.t2.column_stats").collect().head
    assert(r.getAs[Long]("rows") === 100L)
    assert(r.isNullAt(r.fieldIndex("ndv_estimate")), "no opt-in -> no estimate")
  }

  test("compaction re-harvests: the merged segment keeps serving an estimate") {
    sql("CALL gnv.system.compact('ns.t1')")
    val r = sql("SELECT * FROM gnv.ns.t1.column_stats WHERE column = 'k'").collect().head
    assert(r.getAs[Long]("rows") === 3000L)
    val est = r.getAs[Long]("ndv_estimate")
    assert(math.abs(est - 2000L) <= 100L, s"post-compaction estimate $est")
  }

  test("ALTER TABLE can opt an EXISTING table into ndv (and back out), like sums") {
    // ADVICE r11 (low): the opt-in must not be CREATE-only — mirrors sums
    sql("DROP TABLE IF EXISTS gnv.ns.t3")
    sql("CREATE TABLE gnv.ns.t3 (k BIGINT) USING parquet")
    sql("INSERT INTO gnv.ns.t3 SELECT id FROM range(0, 500)")
    sql("ALTER TABLE gnv.ns.t3 SET TBLPROPERTIES('graft.stats.ndv' = '*')")
    // harvest applies to FUTURE segments only; the pre-existing sketch-less
    // segment keeps the estimate voided (coverage honesty)
    sql("INSERT INTO gnv.ns.t3 SELECT id FROM range(500, 1000)")
    val mixed = sql("SELECT * FROM gnv.ns.t3.column_stats").collect().head
    assert(mixed.isNullAt(mixed.fieldIndex("ndv_estimate")),
      "pre-opt-in segment lacks a sketch -> estimate voided")
    // a compact re-harvests everything under the now-active opt-in
    sql("CALL gnv.system.compact('ns.t3')")
    val r = sql("SELECT * FROM gnv.ns.t3.column_stats").collect().head
    val est = r.getAs[Long]("ndv_estimate")
    assert(math.abs(est - 1000L) <= 50L, s"post-compact estimate $est vs exact 1000")
    // and the opt-out is symmetric
    sql("ALTER TABLE gnv.ns.t3 UNSET TBLPROPERTIES('graft.stats.ndv')")
    sql("INSERT INTO gnv.ns.t3 SELECT id FROM range(1000, 1100)")
    val off = sql("SELECT * FROM gnv.ns.t3.column_stats").collect().head
    assert(off.getAs[Long]("rows") === 1100L)
    assert(off.isNullAt(off.fieldIndex("ndv_estimate")), "opt-out stops new harvests")
  }
}
