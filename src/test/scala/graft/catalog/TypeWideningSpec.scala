package graft.catalog

import graft.SparkSpec

/** Pins for metadata-only ALTER COLUMN TYPE widening: old segments keep
  * their narrow physical columns and upcast at read time (probe-pinned
  * native mechanism); narrowings refuse; zone stats stay CORRECT across the
  * date->timestamp_ntz domain change. */
class TypeWideningSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_widen_spec")
    spark.conf.set("spark.sql.catalog.gwid", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwid.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("int->bigint: both eras read; values past Int.MaxValue land after the widen") {
    root
    sql("DROP TABLE IF EXISTS gwid.ns.w1")
    sql("CREATE TABLE gwid.ns.w1 (k INT, amt INT) USING parquet")
    sql("INSERT INTO gwid.ns.w1 VALUES (1, 100), (2, 200)")
    sql("ALTER TABLE gwid.ns.w1 ALTER COLUMN amt TYPE BIGINT")
    sql("INSERT INTO gwid.ns.w1 VALUES (3, 5000000000)") // > Int.MaxValue
    val rows = sql("SELECT k, amt FROM gwid.ns.w1 ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.toSeq === Seq((1, 100L), (2, 200L), (3, 5000000000L)))
    assert(sql("SELECT SUM(amt) FROM gwid.ns.w1").head.getLong(0) === 5000000300L)
    // filter pushdown across the narrow/wide era boundary
    assert(sql("SELECT k FROM gwid.ns.w1 WHERE amt > 150").collect()
      .map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
  }

  test("float->double widens; narrowing and non-widening changes refuse") {
    root
    sql("DROP TABLE IF EXISTS gwid.ns.w2")
    sql("CREATE TABLE gwid.ns.w2 (k BIGINT, x FLOAT) USING parquet")
    sql("INSERT INTO gwid.ns.w2 VALUES (1, CAST(1.5 AS FLOAT))")
    sql("ALTER TABLE gwid.ns.w2 ALTER COLUMN x TYPE DOUBLE")
    sql("INSERT INTO gwid.ns.w2 VALUES (2, 2.25)")
    val xs = sql("SELECT x FROM gwid.ns.w2 ORDER BY k").collect().map(_.getDouble(0))
    assert(xs.toSeq === Seq(1.5, 2.25))
    intercept[Exception] { sql("ALTER TABLE gwid.ns.w2 ALTER COLUMN k TYPE INT") }
    intercept[Exception] { sql("ALTER TABLE gwid.ns.w2 ALTER COLUMN x TYPE STRING") }
  }

  test("NESTED member widening is metadata-only; narrowing still refuses") {
    root
    sql("DROP TABLE IF EXISTS gwid.ns.w5")
    sql("CREATE TABLE gwid.ns.w5 (k BIGINT, s STRUCT<a: INT, b: BIGINT>) USING parquet")
    sql("INSERT INTO gwid.ns.w5 VALUES (1, named_struct('a', 5, 'b', 2L))") // narrow era
    sql("ALTER TABLE gwid.ns.w5 ALTER COLUMN s.a TYPE BIGINT")
    // wide era holds a value impossible before the widen
    sql("""INSERT INTO gwid.ns.w5
           VALUES (2, named_struct('a', 5000000000, 'b', 3L))""")
    val rows = sql("SELECT k, s.a FROM gwid.ns.w5 ORDER BY k").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(5L, 5000000000L),
      "old segments' narrow physical member must upcast at read time")
    assert(sql("SELECT SUM(s.a) FROM gwid.ns.w5 WHERE s.a > 0").collect()
      .head.getLong(0) === 5000000005L)
    // narrowing a nested member refuses like its top-level sibling
    intercept[Exception] { sql("ALTER TABLE gwid.ns.w5 ALTER COLUMN s.b TYPE INT") }
  }

  test("date->timestamp_ntz: zone stats convert domains so pruning stays CORRECT") {
    root
    sql("DROP TABLE IF EXISTS gwid.ns.w3")
    sql("""CREATE TABLE gwid.ns.w3 (k BIGINT, dt DATE) USING parquet
           TBLPROPERTIES ('write.order-by' = 'dt')""")
    sql("INSERT INTO gwid.ns.w3 VALUES (1, DATE'2026-01-10'), (2, DATE'2026-01-20')")
    sql("ALTER TABLE gwid.ns.w3 ALTER COLUMN dt TYPE TIMESTAMP_NTZ")
    // the pre-widen segment's day-domain bounds were rewritten to micros:
    // a micro-literal predicate the rows SATISFY must not be pruned away
    val hits = sql(
      "SELECT k FROM gwid.ns.w3 WHERE dt > TIMESTAMP_NTZ'2026-01-15 00:00:00'")
      .collect().map(_.getLong(0))
    assert(hits.toSeq === Seq(2L),
      "stale day-domain zone bounds would have pruned the whole segment")
    val meta = GraftMeta.read(root.resolve("ns").resolve("w3"))
    val entries = meta.zstats.values.map(SegmentStats.decode)
    assert(entries.exists(_.cols.get("dt").exists(c =>
      c.kind == 't' && c.min.contains((20463L * 86400000000L).toString))),
      s"dt zone entry must be micros now: ${meta.zstats}")
  }

  test("widening survives rename, DML and compaction") {
    root
    sql("DROP TABLE IF EXISTS gwid.ns.w4")
    sql("CREATE TABLE gwid.ns.w4 (k INT, v SMALLINT) USING parquet")
    sql("INSERT INTO gwid.ns.w4 VALUES (1, CAST(7 AS SMALLINT))")
    sql("ALTER TABLE gwid.ns.w4 ALTER COLUMN v TYPE INT")
    sql("ALTER TABLE gwid.ns.w4 RENAME COLUMN v TO val")
    sql("INSERT INTO gwid.ns.w4 VALUES (2, 100000)")
    sql("UPDATE gwid.ns.w4 SET val = val + 1 WHERE k = 1")
    sql("CALL gwid.system.compact('ns.w4')")
    val rows = sql("SELECT k, val FROM gwid.ns.w4 ORDER BY k").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(rows.toSeq === Seq((1, 8), (2, 100000)))
  }
}
