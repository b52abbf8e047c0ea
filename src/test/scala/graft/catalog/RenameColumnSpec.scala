package graft.catalog

import graft.SparkSpec

/** Pins for ALTER TABLE ... RENAME COLUMN via stable field ids
  * (GraftFieldIds): metadata-only rename, pre-rename segments resolved BY ID
  * with zero data rewritten, refusals where id resolution cannot be proven
  * safe, and the property/stat bookkeeping that must follow the new name. */
class RenameColumnSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_ren_spec")
    spark.conf.set("spark.sql.catalog.gren", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gren.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("rename reads through PRE-rename segments by field id; new writes land under the new name") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r1")
    sql("CREATE TABLE gren.ns.r1 (k BIGINT, bal BIGINT) USING parquet")
    sql("INSERT INTO gren.ns.r1 VALUES (1, 100), (2, 200)") // pre-rename segment
    sql("ALTER TABLE gren.ns.r1 RENAME COLUMN bal TO balance")
    sql("INSERT INTO gren.ns.r1 VALUES (3, 300)")           // post-rename segment
    val rows = sql("SELECT k, balance FROM gren.ns.r1 ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 100L), (2L, 200L), (3L, 300L)),
      "old segments must serve the renamed column by id, not null-fill it")
    // filter pushdown on the renamed name, value living only in an OLD segment
    assert(sql("SELECT k FROM gren.ns.r1 WHERE balance = 200").collect()
      .map(_.getLong(0)).toSeq === Seq(2L))
    // aggregates across both segment eras
    assert(sql("SELECT SUM(balance) FROM gren.ns.r1").collect().head.getLong(0) === 600L)
  }

  test("time travel reads pre-rename snapshots under the CURRENT (renamed) schema") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r2")
    sql("CREATE TABLE gren.ns.r2 (k BIGINT, v BIGINT) USING parquet")
    sql("INSERT INTO gren.ns.r2 VALUES (1, 10)")
    sql("ALTER TABLE gren.ns.r2 RENAME COLUMN v TO val")
    sql("INSERT INTO gren.ns.r2 VALUES (2, 20)")
    val asOf = sql("SELECT k, val FROM gren.ns.r2 VERSION AS OF 1").collect()
    assert(asOf.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 10L)))
  }

  test("DML and compaction keep id resolution intact after a rename") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r3")
    sql("CREATE TABLE gren.ns.r3 (k BIGINT, amt BIGINT) USING parquet")
    sql("INSERT INTO gren.ns.r3 VALUES (1, 10), (2, 20)")
    sql("ALTER TABLE gren.ns.r3 RENAME COLUMN amt TO amount")
    sql("INSERT INTO gren.ns.r3 VALUES (3, 30)")
    // copy-on-write UPDATE through the renamed name (rewrites segments)
    sql("UPDATE gren.ns.r3 SET amount = amount + 1 WHERE k = 1")
    assert(sql("SELECT amount FROM gren.ns.r3 WHERE k = 1").collect()
      .head.getLong(0) === 11L)
    // compaction rewrites segments — the rewritten files must carry ids
    // (GraftFieldIds.applyIds in the rewrite job) so reads keep resolving
    sql("CALL gren.system.compact('ns.r3')")
    assert(sql("SELECT SUM(amount) FROM gren.ns.r3").collect().head.getLong(0) === 61L)
    // a SECOND rename after compaction still passes the footer-id pre-flight
    sql("ALTER TABLE gren.ns.r3 RENAME COLUMN amount TO amt2")
    assert(sql("SELECT SUM(amt2) FROM gren.ns.r3").collect().head.getLong(0) === 61L)
  }

  test("zone-map stats follow the rename (old segments keep pruning)") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r4")
    sql("CREATE TABLE gren.ns.r4 (k BIGINT, x BIGINT) USING parquet")
    sql("INSERT INTO gren.ns.r4 VALUES (1, 5)")
    sql("ALTER TABLE gren.ns.r4 RENAME COLUMN x TO y")
    val dir = root.resolve("ns").resolve("r4")
    val meta = GraftMeta.read(dir)
    val stats = meta.zstats.values.map(SegmentStats.decode)
    assert(stats.nonEmpty && stats.forall(_.cols.contains("y")),
      s"zone entries must be re-keyed to the new name, got ${meta.zstats}")
    assert(stats.forall(!_.cols.contains("x")))
  }

  test("refusals: duplicate name, CHECK/generated references, unsafe charset") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r5")
    sql("""CREATE TABLE gren.ns.r5 (k BIGINT, v BIGINT, w BIGINT) USING parquet
           TBLPROPERTIES ('graft.check.pos' = 'v >= 0')""")
    sql("INSERT INTO gren.ns.r5 VALUES (1, 1, 1)")
    intercept[Exception] { sql("ALTER TABLE gren.ns.r5 RENAME COLUMN v TO w") }
    intercept[Exception] { sql("ALTER TABLE gren.ns.r5 RENAME COLUMN v TO v2") }
    intercept[Exception] { sql("ALTER TABLE gren.ns.r5 RENAME COLUMN w TO `a:b`") }
    // an unreferenced column renames fine even with a CHECK present
    sql("ALTER TABLE gren.ns.r5 RENAME COLUMN w TO w2")
    assert(sql("SELECT w2 FROM gren.ns.r5").collect().head.getLong(0) === 1L)
  }

  test("add_files: refused AFTER a rename; id-less imported segments refuse a rename") {
    root
    val ext = java.nio.file.Files.createTempDirectory("gren_ext")
    spark.range(2).selectExpr("id AS k", "id * 10 AS v")
      .coalesce(1).write.mode("overwrite").parquet(ext.toString)
    // crud left by spark's committer confuses nothing: add_files links *.parquet
    sql("DROP TABLE IF EXISTS gren.ns.r6")
    sql("CREATE TABLE gren.ns.r6 (k BIGINT, v BIGINT) USING parquet")
    sql(s"CALL gren.system.add_files('ns.r6', '${ext.toString}')")
    // imported files carry no footer ids -> rename refuses honestly
    val e = intercept[Exception] {
      sql("ALTER TABLE gren.ns.r6 RENAME COLUMN v TO v2")
    }
    assert(e.getMessage.contains("footer field ids"))
    // and the mirror gate: a renamed table refuses add_files
    sql("DROP TABLE IF EXISTS gren.ns.r7")
    sql("CREATE TABLE gren.ns.r7 (k BIGINT, v BIGINT) USING parquet")
    sql("INSERT INTO gren.ns.r7 VALUES (1, 1)")
    sql("ALTER TABLE gren.ns.r7 RENAME COLUMN v TO v2")
    val e2 = intercept[Exception] {
      sql(s"CALL gren.system.add_files('ns.r7', '${ext.toString}')")
    }
    assert(e2.getMessage.contains("field id"))
  }

  test("layout properties follow the rename: cluster-by and partition-by") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r8")
    sql("""CREATE TABLE gren.ns.r8 (k BIGINT, region STRING) USING parquet
           PARTITIONED BY (region)""")
    sql("INSERT INTO gren.ns.r8 VALUES (1, 'eu'), (2, 'us')")
    sql("ALTER TABLE gren.ns.r8 RENAME COLUMN region TO geo")
    // future writes route by the renamed partition column
    sql("INSERT INTO gren.ns.r8 VALUES (3, 'eu')")
    assert(sql("SELECT k FROM gren.ns.r8 WHERE geo = 'eu' ORDER BY k").collect()
      .map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val meta = GraftMeta.read(root.resolve("ns").resolve("r8"))
    assert(meta.props(GraftTable.PartitionByProp) === "geo")
  }

  test("NESTED member rename/add/drop are metadata-only via recursive field ids") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r10")
    sql("CREATE TABLE gren.ns.r10 (k BIGINT, s STRUCT<a: BIGINT, b: BIGINT>) USING parquet")
    sql("INSERT INTO gren.ns.r10 VALUES (1, named_struct('a', 10L, 'b', 2L))") // pre-rename
    sql("ALTER TABLE gren.ns.r10 RENAME COLUMN s.a TO alpha")
    sql("INSERT INTO gren.ns.r10 VALUES (2, named_struct('alpha', 20L, 'b', 3L))")
    // pre-rename segments serve the member BY ID under the new name
    val vals = sql("SELECT s.alpha FROM gren.ns.r10 ORDER BY k").collect().map(_.getLong(0))
    assert(vals.toSeq === Seq(10L, 20L),
      "old segments must serve the renamed nested member by id, not null-fill it")
    // filter on the renamed member with the hit living in the OLD segment
    assert(sql("SELECT k FROM gren.ns.r10 WHERE s.alpha = 10").collect()
      .map(_.getLong(0)).toSeq === Seq(1L))
    // nested ADD: old rows null-fill the new member
    sql("ALTER TABLE gren.ns.r10 ADD COLUMNS (s.c BIGINT)")
    sql("INSERT INTO gren.ns.r10 VALUES (3, named_struct('alpha', 30L, 'b', 4L, 'c', 7L))")
    val cRows = sql("SELECT k, s.c FROM gren.ns.r10 ORDER BY k").collect()
    assert(cRows.map(r => if (r.isNullAt(1)) -1L else r.getLong(1)).toSeq === Seq(-1L, -1L, 7L))
    // nested DROP: the member leaves the schema; its path can never be re-added
    sql("ALTER TABLE gren.ns.r10 DROP COLUMN s.b")
    assert(!sql("SELECT s.* FROM gren.ns.r10").schema.fieldNames.contains("b"))
    intercept[Exception] { sql("ALTER TABLE gren.ns.r10 ADD COLUMNS (s.b BIGINT)") }
    // total content across all three eras still correct
    assert(sql("SELECT SUM(s.alpha) FROM gren.ns.r10").collect().head.getLong(0) === 60L)
  }

  test("nested refusals: paths through collections, nested member DEFAULT") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r12")
    sql("""CREATE TABLE gren.ns.r12
           (k BIGINT, arr ARRAY<STRUCT<x: BIGINT>>, s STRUCT<a: BIGINT>) USING parquet""")
    sql("INSERT INTO gren.ns.r12 VALUES (1, array(named_struct('x', 1L)), named_struct('a', 2L))")
    // collection elements stay name-resolved — the ALTER surface refuses them
    intercept[Exception] { sql("ALTER TABLE gren.ns.r12 RENAME COLUMN arr.x TO y") }
    intercept[Exception] { sql("ALTER TABLE gren.ns.r12 ADD COLUMNS (arr.y BIGINT)") }
    // DEFAULT is top-level-only machinery
    intercept[Exception] { sql("ALTER TABLE gren.ns.r12 ADD COLUMNS (s.d BIGINT DEFAULT 3)") }
    assert(sql("SELECT s.a FROM gren.ns.r12").collect().head.getLong(0) === 2L)
  }

  test("chained renames in ONE programmatic ALTER compose to the final name in zone stats") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r11")
    sql("CREATE TABLE gren.ns.r11 (k BIGINT, x BIGINT) USING parquet")
    sql("INSERT INTO gren.ns.r11 VALUES (1, 5)")
    // SQL issues one RenameColumn per statement; the v2 API allows several in
    // one alterTable call — a->y then y->z must carry x's stats to 'z', not
    // park them on the dead intermediate name
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    val cat = new GraftCatalog()
    cat.initialize("gren_prog", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("root", root.toString)))
    cat.alterTable(Identifier.of(Array("ns"), "r11"),
      TableChange.renameColumn(Array("x"), "y"),
      TableChange.renameColumn(Array("y"), "z"))
    val meta = GraftMeta.read(root.resolve("ns").resolve("r11"))
    val stats = meta.zstats.values.map(SegmentStats.decode)
    assert(stats.nonEmpty && stats.forall(_.cols.contains("z")),
      s"chained renames must re-key stats to the FINAL name, got ${meta.zstats}")
    assert(stats.forall(st => !st.cols.contains("x") && !st.cols.contains("y")))
  }

  test("generated column renames by re-keying its property") {
    root
    sql("DROP TABLE IF EXISTS gren.ns.r9")
    sql("""CREATE TABLE gren.ns.r9 (ts TIMESTAMP, day DATE) USING parquet
           TBLPROPERTIES ('graft.generate.day' = 'CAST(ts AS DATE)')""")
    sql("INSERT INTO gren.ns.r9 (ts) VALUES (TIMESTAMP '2026-01-02 03:04:05')")
    sql("ALTER TABLE gren.ns.r9 RENAME COLUMN day TO d")
    sql("INSERT INTO gren.ns.r9 (ts) VALUES (TIMESTAMP '2026-02-03 04:05:06')")
    val rows = sql("SELECT CAST(d AS STRING) FROM gren.ns.r9 ORDER BY ts").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("2026-01-02", "2026-02-03"))
    val meta = GraftMeta.read(root.resolve("ns").resolve("r9"))
    assert(meta.props.contains(GraftGenerate.Prefix + "d"))
    assert(!meta.props.contains(GraftGenerate.Prefix + "day"))
  }
}
