package graft.catalog

import graft.SparkSpec

/** Pins for metadata-only aggregate pushdown (GraftStatsAggregate.scala):
  * COUNT/MIN/MAX served from segment zone maps with zero file IO, and every
  * exactness gate that must refuse the shortcut. */
class StatsAggSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_statsagg_spec")
    spark.conf.set("spark.sql.catalog.gsa", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gsa.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  private def planOf(q: String): String =
    sql(q).queryExecution.executedPlan.toString

  private val Marker = "graft-stats-agg"

  test("COUNT/MIN/MAX over a multi-segment table serve from zone maps") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.a1")
    sql("CREATE TABLE gsa.ns.a1 (k BIGINT, d DATE, s STRING) USING parquet")
    sql("INSERT INTO gsa.ns.a1 SELECT id, DATE'2024-01-01' + CAST(id AS INT), 'v' || id FROM range(0, 100)")
    sql("INSERT INTO gsa.ns.a1 SELECT id, DATE'2024-01-01' + CAST(id AS INT), NULL FROM range(100, 250)")
    val q = "SELECT COUNT(*) AS n, COUNT(s) AS ns, MIN(k) AS mn, MAX(k) AS mx, " +
      "MIN(d) AS mnd, MAX(d) AS mxd FROM gsa.ns.a1"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"expected stats-served aggregate:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"no file scan expected:\n$plan")
    val r = sql(q).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDate(4).toString, r.getDate(5).toString) ===
      ((250L, 100L, 0L, 249L, "2024-01-01", "2024-09-06")))
  }

  test("a pushed predicate refuses the shortcut and still answers correctly") {
    root
    val q = "SELECT COUNT(*) AS n FROM gsa.ns.a1 WHERE k >= 200"
    val plan = planOf(q)
    assert(!plan.contains(Marker), s"filtered aggregate must scan:\n$plan")
    assert(sql(q).collect().head.getLong(0) === 50L)
  }

  test("string MIN/MAX, SUM and COUNT DISTINCT refuse the shortcut") {
    root
    // a1 never opted into graft.stats.sums, so SUM has no harvested partials
    for (q <- Seq(
        "SELECT MIN(s) AS m FROM gsa.ns.a1",
        "SELECT SUM(k) AS m FROM gsa.ns.a1",
        "SELECT COUNT(DISTINCT k) AS m FROM gsa.ns.a1")) {
      assert(!planOf(q).contains(Marker), s"must not serve from stats: $q")
    }
    assert(sql("SELECT SUM(k) FROM gsa.ns.a1").collect().head.getLong(0) ===
      (0L until 250L).sum)
  }

  test("SUM serves from zone maps when the table opts into commit-time sum harvest") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.a2")
    sql("""CREATE TABLE gsa.ns.a2 (k BIGINT, v BIGINT, s STRING) USING parquet
            TBLPROPERTIES ('graft.stats.sums' = 'k,v')""")
    sql("INSERT INTO gsa.ns.a2 SELECT id, id * 3, 'x' || id FROM range(0, 100)")
    sql("INSERT INTO gsa.ns.a2 SELECT id, CASE WHEN id % 2 = 0 THEN NULL ELSE id * 3 END, NULL FROM range(100, 200)")
    val q = "SELECT SUM(k) AS sk, SUM(v) AS sv, COUNT(*) AS n FROM gsa.ns.a2"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"opted-in SUM must serve from stats:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"no file scan expected:\n$plan")
    val r = sql(q).collect().head
    val expectedV = (0L until 100L).map(_ * 3).sum +
      (100L until 200L).filter(_ % 2 == 1).map(_ * 3).sum
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      (((0L until 200L).sum, expectedV, 200L)))

    // a column OUTSIDE the opt-in list refuses (string col has no sum at all)
    assert(!planOf("SELECT SUM(LENGTH(s)) AS m FROM gsa.ns.a2").contains(Marker))

    // all-null opted-in column over a fresh table: SUM must be NULL, not 0
    sql("DROP TABLE IF EXISTS gsa.ns.a3")
    sql("""CREATE TABLE gsa.ns.a3 (k BIGINT, v BIGINT) USING parquet
            TBLPROPERTIES ('graft.stats.sums' = '*')""")
    sql("INSERT INTO gsa.ns.a3 SELECT id, CAST(NULL AS BIGINT) FROM range(0, 10)")
    val q3 = "SELECT SUM(v) AS sv FROM gsa.ns.a3"
    assert(planOf(q3).contains(Marker))
    assert(sql(q3).collect().head.isNullAt(0), "SUM over all-null must be NULL")

    // segments written BEFORE the opt-in lack sums -> the whole table refuses
    sql("DROP TABLE IF EXISTS gsa.ns.a4")
    sql("CREATE TABLE gsa.ns.a4 (k BIGINT) USING parquet")
    sql("INSERT INTO gsa.ns.a4 SELECT id FROM range(0, 10)")
    sql("ALTER TABLE gsa.ns.a4 SET TBLPROPERTIES ('graft.stats.sums' = '*')")
    sql("INSERT INTO gsa.ns.a4 SELECT id FROM range(10, 20)")
    assert(!planOf("SELECT SUM(k) AS m FROM gsa.ns.a4").contains(Marker),
      "a sum-less segment must refuse the shortcut")
    assert(sql("SELECT SUM(k) FROM gsa.ns.a4").collect().head.getLong(0) ===
      (0L until 20L).sum)
  }

  test("GROUP BY refuses; read-option disables; time travel serves its snapshot") {
    root
    assert(!planOf("SELECT d, COUNT(*) FROM gsa.ns.a1 GROUP BY d").contains(Marker))
    val disabled = spark.read.option("graft.stats.aggregate-pushdown", "false")
      .table("gsa.ns.a1").groupBy().count()
    assert(!disabled.queryExecution.executedPlan.toString.contains(Marker))
    assert(disabled.collect().head.getLong(0) === 250L)
    val tt = "SELECT COUNT(*) AS n, MAX(k) AS mx FROM gsa.ns.a1 VERSION AS OF 1"
    assert(planOf(tt).contains(Marker), "time travel serves from its snapshot's stats")
    val r = sql(tt).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((100L, 99L)))
  }

  test("delete vectors disable the shortcut; the live count is exact") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.a2")
    sql("""CREATE TABLE gsa.ns.a2 (k BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gsa.ns.a2 SELECT id FROM range(0, 50)")
    assert(planOf("SELECT COUNT(*) FROM gsa.ns.a2").contains(Marker))
    sql("DELETE FROM gsa.ns.a2 WHERE k < 10")
    val q = "SELECT COUNT(*) AS n FROM gsa.ns.a2"
    val plan = planOf(q)
    assert(!plan.contains(Marker), s"DV'd snapshot must count live rows:\n$plan")
    assert(sql(q).collect().head.getLong(0) === 40L)
    // materializing the vectors restores the metadata-only path
    sql("CALL gsa.system.rewrite_deletes('ns.a2')")
    assert(planOf(q).contains(Marker))
    assert(sql(q).collect().head.getLong(0) === 40L)
  }

  test("a column added after a segment was written refuses COUNT(col) but serves COUNT(*)") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.a3")
    sql("CREATE TABLE gsa.ns.a3 (k BIGINT) USING parquet")
    sql("INSERT INTO gsa.ns.a3 SELECT id FROM range(0, 20)")
    sql("ALTER TABLE gsa.ns.a3 ADD COLUMNS (extra BIGINT)")
    assert(!planOf("SELECT COUNT(extra) FROM gsa.ns.a3").contains(Marker),
      "old segment has no stats for the new column")
    assert(sql("SELECT COUNT(extra) FROM gsa.ns.a3").collect().head.getLong(0) === 0L)
    assert(planOf("SELECT COUNT(*) FROM gsa.ns.a3").contains(Marker))
    assert(sql("SELECT COUNT(*) FROM gsa.ns.a3").collect().head.getLong(0) === 20L)
  }

  test("empty table serves count 0 and null bounds") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.a4")
    sql("CREATE TABLE gsa.ns.a4 (k BIGINT) USING parquet")
    val q = "SELECT COUNT(*) AS n, MIN(k) AS mn FROM gsa.ns.a4"
    assert(planOf(q).contains(Marker))
    val r = sql(q).collect().head
    assert(r.getLong(0) === 0L && r.isNullAt(1))
  }
}
