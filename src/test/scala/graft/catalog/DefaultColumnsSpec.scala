package graft.catalog

import graft.SparkSpec

/** Pins for column DEFAULT values (TableCatalogCapability
  * .SUPPORT_COLUMN_DEFAULT_VALUE): ADD COLUMN ... DEFAULT stays
  * metadata-only — EXISTS_DEFAULT (frozen at ADD) fills pre-ADD segments at
  * read time through Spark's native parquet default machinery
  * (ExistsDefaultProbeSpec), CURRENT_DEFAULT fills future INSERTs, and SET
  * DEFAULT moves only the latter (history never rewrites). */
class DefaultColumnsSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_def_spec")
    spark.conf.set("spark.sql.catalog.gdef", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdef.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("ADD COLUMN DEFAULT: pre-ADD segments read the default, not NULL") {
    root
    sql("DROP TABLE IF EXISTS gdef.ns.d1")
    sql("CREATE TABLE gdef.ns.d1 (k BIGINT) USING parquet")
    sql("INSERT INTO gdef.ns.d1 VALUES (1), (2)")          // pre-ADD segment
    sql("ALTER TABLE gdef.ns.d1 ADD COLUMNS (score BIGINT DEFAULT 42)")
    sql("INSERT INTO gdef.ns.d1 VALUES (3, 7)")            // explicit value
    sql("INSERT INTO gdef.ns.d1 (k) VALUES (4)")           // analyzer fills 42
    val rows = sql("SELECT k, score FROM gdef.ns.d1 ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    assert(rows.toSeq === Seq((1L, 42L), (2L, 42L), (3L, 7L), (4L, 42L)))
    // filters see the filled value on pre-ADD segments (zone pruning is
    // conservative there: the new column has no stats entry at all)
    assert(sql("SELECT COUNT(*) FROM gdef.ns.d1 WHERE score = 42").head.getLong(0) === 3L)
    assert(sql("SELECT COUNT(*) FROM gdef.ns.d1 WHERE score IS NULL").head.getLong(0) === 0L)
  }

  test("SET DEFAULT moves future INSERTs only; EXISTS_DEFAULT history is frozen") {
    root
    sql("DROP TABLE IF EXISTS gdef.ns.d2")
    sql("CREATE TABLE gdef.ns.d2 (k BIGINT) USING parquet")
    sql("INSERT INTO gdef.ns.d2 VALUES (1)")
    sql("ALTER TABLE gdef.ns.d2 ADD COLUMNS (tag STRING DEFAULT 'old')")
    sql("ALTER TABLE gdef.ns.d2 ALTER COLUMN tag SET DEFAULT 'new'")
    sql("INSERT INTO gdef.ns.d2 (k) VALUES (2)")
    val rows = sql("SELECT k, tag FROM gdef.ns.d2 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "old"), (2L, "new")),
      "pre-ADD rows keep the FROZEN exists-default; new inserts take the new one")
    sql("ALTER TABLE gdef.ns.d2 ALTER COLUMN tag DROP DEFAULT")
    sql("INSERT INTO gdef.ns.d2 (k) VALUES (3)")
    val r3 = sql("SELECT tag FROM gdef.ns.d2 WHERE k = 3").collect().head
    assert(r3.isNullAt(0), "after DROP DEFAULT new inserts null-fill")
  }

  test("defaults survive COW DML and compaction (values materialize physically)") {
    root
    sql("DROP TABLE IF EXISTS gdef.ns.d3")
    sql("CREATE TABLE gdef.ns.d3 (k BIGINT) USING parquet")
    sql("INSERT INTO gdef.ns.d3 VALUES (1), (2)")
    sql("ALTER TABLE gdef.ns.d3 ADD COLUMNS (score BIGINT DEFAULT 5)")
    sql("UPDATE gdef.ns.d3 SET score = score * 10 WHERE k = 1") // COW rewrite
    sql("CALL gdef.system.compact('ns.d3')")
    val rows = sql("SELECT k, score FROM gdef.ns.d3 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((1L, 50L), (2L, 5L)))
  }

  test("CREATE TABLE with DEFAULT; rename keeps the default metadata") {
    root
    sql("DROP TABLE IF EXISTS gdef.ns.d4")
    sql("CREATE TABLE gdef.ns.d4 (k BIGINT, st STRING DEFAULT 'open') USING parquet")
    sql("INSERT INTO gdef.ns.d4 (k) VALUES (1)")
    sql("ALTER TABLE gdef.ns.d4 RENAME COLUMN st TO status")
    sql("INSERT INTO gdef.ns.d4 (k) VALUES (2)")
    val rows = sql("SELECT k, status FROM gdef.ns.d4 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((1L, "open"), (2L, "open")))
  }
}
