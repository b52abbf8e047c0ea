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

  test("SUM and COUNT DISTINCT refuse the shortcut") {
    root
    // a1 never opted into graft.stats.sums, so SUM has no harvested partials
    for (q <- Seq(
        "SELECT SUM(k) AS m FROM gsa.ns.a1",
        "SELECT COUNT(DISTINCT k) AS m FROM gsa.ns.a1")) {
      assert(!planOf(q).contains(Marker), s"must not serve from stats: $q")
    }
    assert(sql("SELECT SUM(k) FROM gsa.ns.a1").collect().head.getLong(0) ===
      (0L until 250L).sum)
  }

  test("string MIN/MAX serves zero-IO on engine-written segments (exact bounds, r17)") {
    root
    // a1's segments were engine-written, so their string bounds are EXACT
    val q = "SELECT MIN(s) AS mn, MAX(s) AS mx FROM gsa.ns.a1"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"exact string bounds must serve MIN/MAX:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"no file scan expected:\n$plan")
    val r = sql(q).collect().head
    // 'v0'..'v99' in UTF-8 byte order: min 'v0', max 'v99' (the '9' digit
    // outranks every shorter prefix continuation here)
    assert((r.getString(0), r.getString(1)) === (("v0", "v99")))
  }

  test("string MIN/MAX merges in UTF8String binary order, not java String order") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.a8")
    sql("CREATE TABLE gsa.ns.a8 (s STRING) USING parquet")
    // U+1F600 (😀, a surrogate PAIR in UTF-16) vs U+FFFD: java String
    // compareTo puts the surrogate (0xD83D) BELOW 0xFFFD; UTF-8 byte order —
    // Spark's actual string order — puts the supplementary char ABOVE it.
    // Two segments so the answer comes from a cross-segment MERGE.
    sql("INSERT INTO gsa.ns.a8 VALUES ('😀'), ('apple')")
    sql("INSERT INTO gsa.ns.a8 VALUES ('�'), ('zebra')")
    val q = "SELECT MAX(s) AS mx, MIN(s) AS mn FROM gsa.ns.a8"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"expected stats-served aggregate:\n$plan")
    val r = sql(q).collect().head
    assert(r.getString(0) === "😀",
      "max must follow UTF-8 byte order (the row-reading answer), not UTF-16")
    assert(r.getString(1) === "apple")
    // cross-check against the row-reading plan (shortcut disabled per read)
    val rowRead = spark.read.option("graft.stats.aggregate-pushdown", "false")
      .table("gsa.ns.a8").agg(org.apache.spark.sql.functions.max("s"))
    assert(rowRead.collect().head.getString(0) === "😀")
  }

  test("imported (add_files) string bounds are brackets: MIN/MAX refuses, pruning survives") {
    root
    // foreign parquet: written by a plain spark.write OUTSIDE the catalog —
    // provenance unknown to the engine, so bounds decode non-exact
    val src = java.nio.file.Files.createTempDirectory("gsa_foreign").toString
    spark.sql("SELECT 'm' || id AS s, id AS k FROM range(10)")
      .coalesce(1).write.mode("overwrite").parquet(src)
    sql("DROP TABLE IF EXISTS gsa.ns.a9")
    sql("CREATE TABLE gsa.ns.a9 (s STRING, k BIGINT) USING parquet")
    sql(s"CALL gsa.system.add_files('ns.a9', '$src')")
    val q = "SELECT MIN(s) AS mn FROM gsa.ns.a9"
    assert(!planOf(q).contains(Marker),
      "imported string bounds must refuse the MIN/MAX shortcut")
    assert(sql(q).collect().head.getString(0) === "m0")
    // numeric MIN/MAX and COUNT(*) still serve — truncation is a string risk
    val qn = "SELECT COUNT(*) AS n, MAX(k) AS mx FROM gsa.ns.a9"
    assert(planOf(qn).contains(Marker), "numeric aggregates still serve on imports")
    assert(sql(qn).collect().head.getLong(1) === 9L)
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

  test("GROUP BY a non-constant column refuses; read-option disables; time travel serves its snapshot") {
    root
    // a1's segments span k/d RANGES (min != max), so no zone entry can name
    // a group key — the rollup must read rows
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

  test("AVG serves zero-IO on sums-opted tables (Spark decomposes it to Sum+Count)") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.av1")
    sql("""CREATE TABLE gsa.ns.av1 (k BIGINT, p STRING) USING parquet
           PARTITIONED BY (p) TBLPROPERTIES ('graft.stats.sums' = 'k')""")
    sql("""INSERT INTO gsa.ns.av1
           SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(0, 100)""")
    val q = "SELECT p, AVG(k) AS a FROM gsa.ns.av1 GROUP BY p ORDER BY p"
    val plan = planOf(q)
    assert(plan.contains(Marker),
      s"AVG must decompose to pushed Sum+Count and serve from stats:\n$plan")
    val rows = sql(q).collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(rows.toSeq === Seq(("a", 49.0), ("b", 50.0)))
    // without the sums opt-in the Sum half refuses and AVG reads rows
    sql("DROP TABLE IF EXISTS gsa.ns.av2")
    sql("CREATE TABLE gsa.ns.av2 (k BIGINT) USING parquet")
    sql("INSERT INTO gsa.ns.av2 SELECT id FROM range(10)")
    assert(!planOf("SELECT AVG(k) AS a FROM gsa.ns.av2").contains(Marker))
  }

  test("GROUP BY a partition column serves per-partition rollups from zone maps") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.g1")
    sql("""CREATE TABLE gsa.ns.g1 (k BIGINT, p STRING, d DATE) USING parquet
           PARTITIONED BY (p) TBLPROPERTIES ('graft.stats.sums' = 'k')""")
    // two commits x three partitions + a NULL-partition wave: six value
    // segments + one null segment, each partition-PURE so every zone entry
    // is constant in p (min == max == the group key)
    sql("""INSERT INTO gsa.ns.g1
           SELECT id, CASE id % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END,
                  DATE'2024-01-01' + CAST(id % 30 AS INT)
           FROM range(0, 90)""")
    sql("""INSERT INTO gsa.ns.g1
           SELECT id, CASE id % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END,
                  DATE'2024-01-01' + CAST(id % 30 AS INT)
           FROM range(90, 150)""")
    sql("INSERT INTO gsa.ns.g1 SELECT id, NULL, DATE'2024-02-01' FROM range(150, 160)")
    val q = "SELECT p, COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx, " +
      "CAST(SUM(k) AS BIGINT) AS sk FROM gsa.ns.g1 GROUP BY p ORDER BY p NULLS FIRST"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"expected stats-served grouped aggregate:\n$plan")
    assert(!plan.toLowerCase.contains("parquet"), s"no file scan expected:\n$plan")
    val rows = sql(q).collect()
    val exp = (0L until 150L).groupBy(i => (i % 3) match {
      case 0 => "a"; case 1 => "b"; case _ => "c"
    }).map { case (p, ks) => p -> ((ks.size.toLong, ks.min, ks.max, ks.sum)) }
    assert(rows.length === 4)
    assert(rows.head.isNullAt(0) && rows.head.getLong(1) === 10L &&
      rows.head.getLong(2) === 150L && rows.head.getLong(3) === 159L)
    rows.tail.foreach { r =>
      val (n, mn, mx, sk) = exp(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((n, mn, mx, sk)))
    }
    // grouping by the partition value + aggregating the partition column
    // itself serves too since r17 (exact engine-written string bounds)
    val q2 = "SELECT p, MIN(p) AS mp FROM gsa.ns.g1 GROUP BY p ORDER BY p NULLS FIRST"
    assert(planOf(q2).contains(Marker), "exact string bounds serve MIN even as a group key")
    val r2 = sql(q2).collect()
    assert(r2.head.isNullAt(1), "the NULL partition's MIN(p) is NULL")
    assert(r2.tail.map(_.getString(1)).toSeq === Seq("a", "b", "c"))
  }

  test("GROUP BY serves on any constant-per-segment column, not just declared partitions") {
    root
    // an UNPARTITIONED table whose commits happen to be constant in `era`:
    // the gate is the value-level zone invariant, so this serves too (the
    // post-partition-evolution / add_files shape)
    sql("DROP TABLE IF EXISTS gsa.ns.g2")
    sql("CREATE TABLE gsa.ns.g2 (k BIGINT, era INT) USING parquet")
    sql("INSERT INTO gsa.ns.g2 SELECT id, 1 FROM range(0, 40)")
    sql("INSERT INTO gsa.ns.g2 SELECT id, 2 FROM range(40, 100)")
    sql("INSERT INTO gsa.ns.g2 SELECT id, 1 FROM range(100, 110)")
    val q = "SELECT era, COUNT(*) AS n, MAX(k) AS mx FROM gsa.ns.g2 GROUP BY era ORDER BY era"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"constant-column rollup must serve:\n$plan")
    val rows = sql(q).collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((1, 50L, 109L), (2, 60L, 99L)))

    // a PARTIALLY-null segment can name no group key: refuse
    sql("INSERT INTO gsa.ns.g2 SELECT id, CASE WHEN id % 2 = 0 THEN 3 ELSE NULL END FROM range(110, 120)")
    assert(!planOf(q).contains(Marker), "a mixed null/value segment must refuse")
    // ... and the row-reading plan still answers exactly (ASC = NULLS FIRST)
    val after = sql(q).collect().map(r =>
      (if (r.isNullAt(0)) -1 else r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(after.toSeq === Seq((-1, 5L, 119L), (1, 50L, 109L), (2, 60L, 99L), (3, 5L, 118L)))
  }

  test("multi-column GROUP BY and date group keys serve; a non-column group expression refuses") {
    root
    sql("DROP TABLE IF EXISTS gsa.ns.g3")
    sql("""CREATE TABLE gsa.ns.g3 (k BIGINT, p STRING, d DATE) USING parquet
           PARTITIONED BY (p, d)""")
    sql("""INSERT INTO gsa.ns.g3
           SELECT id, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END,
                  DATE'2024-03-01' + CAST(id % 2 AS INT)
           FROM range(0, 40)""")
    val q = "SELECT p, d, COUNT(*) AS n FROM gsa.ns.g3 GROUP BY p, d ORDER BY p, d"
    val plan = planOf(q)
    assert(plan.contains(Marker), s"two-column partition rollup must serve:\n$plan")
    val rows = sql(q).collect().map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    assert(rows.toSeq === Seq(("x", "2024-03-01", 20L), ("y", "2024-03-02", 20L)))
    // an EXPRESSION over the partition column is not a plain NamedReference
    assert(!planOf("SELECT UPPER(p) AS u, COUNT(*) FROM gsa.ns.g3 GROUP BY UPPER(p)")
      .contains(Marker))
  }
}
