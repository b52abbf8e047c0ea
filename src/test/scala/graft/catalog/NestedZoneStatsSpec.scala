package graft.catalog

import graft.SparkSpec

/** Pins for NESTED zone-map stats (r15, riding the recursive-field-id work):
  * struct-member leaves are harvested into dot-path zone entries at commit,
  * nested predicates (GetStructField chains) prune whole segments at plan
  * time, entries re-key through nested AND struct renames, and a nested
  * date->ntz widen converts the entry domain so pruning stays correct. */
class NestedZoneStatsSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_nzone")
    spark.conf.set("spark.sql.catalog.gnz", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gnz.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  private def plannedSegs(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.toBatch.planInputPartitions().toSeq.flatMap {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(p => java.nio.file.Paths.get(
              new java.net.URI(p.filePath.toString).getPath).getParent.getFileName.toString)
          case _ => Nil
        }
    }.flatten.distinct

  test("nested leaves harvest dot-path zone entries; nested predicates prune segments") {
    root
    sql("DROP TABLE IF EXISTS gnz.ns.t1")
    sql("CREATE TABLE gnz.ns.t1 (k BIGINT, info STRUCT<bal: BIGINT, tag: STRING>) USING parquet")
    spark.range(0, 100).selectExpr("id AS k", "named_struct('bal', id, 'tag', 'lo') AS info")
      .writeTo("gnz.ns.t1").append()
    spark.range(100, 200).selectExpr("id AS k", "named_struct('bal', id, 'tag', 'hi') AS info")
      .writeTo("gnz.ns.t1").append()
    // the committed entries carry the dot-path keys
    val meta = GraftMeta.read(root.resolve("ns").resolve("t1"))
    val stats = meta.zstats.values.map(SegmentStats.decode)
    assert(stats.nonEmpty && stats.forall(s =>
      s.cols.contains("info.bal") && s.cols.contains("info.tag") && s.cols.contains("k")),
      s"expected dot-path zone entries, got ${stats.map(_.cols.keySet)}")
    // a nested range predicate prunes to ONE segment
    val hi = sql("SELECT k FROM gnz.ns.t1 WHERE info.bal >= 150")
    assert(plannedSegs(hi).size === 1, s"expected one surviving segment, saw ${plannedSegs(hi)}")
    assert(hi.count() === 50L)
    // nested string equality prunes too
    val lo = sql("SELECT k FROM gnz.ns.t1 WHERE info.tag = 'lo'")
    assert(plannedSegs(lo).size === 1)
    assert(lo.count() === 100L)
    // a satisfiable-everywhere nested predicate keeps both segments
    assert(plannedSegs(sql("SELECT k FROM gnz.ns.t1 WHERE info.bal >= 0")).size === 2)
  }

  test("nested member rename re-keys the entries; struct-typed renames refuse (v2 reader hole)") {
    root
    sql("DROP TABLE IF EXISTS gnz.ns.t2")
    sql("CREATE TABLE gnz.ns.t2 (k BIGINT, s STRUCT<a: BIGINT>) USING parquet")
    spark.range(0, 50).selectExpr("id AS k", "named_struct('a', id) AS s")
      .writeTo("gnz.ns.t2").append()
    spark.range(1000, 1050).selectExpr("id AS k", "named_struct('a', id) AS s")
      .writeTo("gnz.ns.t2").append()
    sql("ALTER TABLE gnz.ns.t2 RENAME COLUMN s.a TO amount")        // member rename
    val meta = GraftMeta.read(root.resolve("ns").resolve("t2"))
    val stats = meta.zstats.values.map(SegmentStats.decode)
    assert(stats.forall(_.cols.contains("s.amount")),
      s"entries must follow the member rename, got ${stats.map(_.cols.keySet)}")
    assert(stats.forall(s => !s.cols.contains("s.a")))
    val q = sql("SELECT k FROM gnz.ns.t2 WHERE s.amount >= 1000")
    assert(plannedSegs(q).size === 1, s"pruning must survive the rename, saw ${plannedSegs(q)}")
    assert(q.count() === 50L)
    // renaming the STRUCT itself refuses: Spark's v2 parquet reader does not
    // id-resolve members of a renamed group (V2RenameProbeSpec pins the
    // reader behavior) — silent null-fill is never acceptable
    val e = intercept[Exception] { sql("ALTER TABLE gnz.ns.t2 RENAME COLUMN s TO payload") }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("struct-typed"), s"expected the struct-rename guard, got: $msgs")
    assert(sql("SELECT SUM(s.amount) FROM gnz.ns.t2").collect().head.getLong(0) ===
      (0L until 50L).sum + (1000L until 1050L).sum)
  }

  test("nested date->ntz widen converts the entry domain — pruning stays CORRECT") {
    root
    sql("DROP TABLE IF EXISTS gnz.ns.t3")
    sql("CREATE TABLE gnz.ns.t3 (k BIGINT, ev STRUCT<d: DATE>) USING parquet")
    sql("""INSERT INTO gnz.ns.t3 VALUES
           (1, named_struct('d', DATE '2024-01-10')),
           (2, named_struct('d', DATE '2024-01-20'))""")
    sql("ALTER TABLE gnz.ns.t3 ALTER COLUMN ev.d TYPE TIMESTAMP_NTZ")
    sql("INSERT INTO gnz.ns.t3 VALUES (3, named_struct('d', TIMESTAMP_NTZ '2026-06-01 12:00:00'))")
    // a predicate inside the OLD segment's (converted) range must keep it —
    // stale day-domain bounds compared against micros would wrongly prune
    val q = sql("SELECT k FROM gnz.ns.t3 WHERE ev.d >= TIMESTAMP_NTZ '2024-01-15 00:00:00'")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L))
    // and a post-2025 predicate prunes the pre-widen segment entirely
    val late = sql("SELECT k FROM gnz.ns.t3 WHERE ev.d >= TIMESTAMP_NTZ '2026-01-01 00:00:00'")
    assert(plannedSegs(late).size === 1)
    assert(late.collect().map(_.getLong(0)).toSeq === Seq(3L))
  }
}
