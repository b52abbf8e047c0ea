package graft.catalog

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Pins for `add_files` — zero-copy parquet import (GraftAddFiles.scala):
  * hard-linked (same inode), stats-harvested, one append commit; schema /
  * partitioned / CHECK-constraint gates refuse with remediation named. */
class AddFilesSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_addf_spec")
    spark.conf.set("spark.sql.catalog.gaf", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gaf.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(q: String): Long = sql(q).collect().head.getLong(0)

  private def rawDir(name: String, n: Int): Path = {
    import spark.implicits._
    val d = root.resolve(s"raw_$name")
    (1 to n).map(i => (i.toLong, s"v$i", i * 10L)).toDF("k", "tag", "amt")
      .coalesce(2).write.mode("overwrite").parquet(d.toString)
    d
  }

  test("import links files (same inode), content lands, stats prune") {
    root
    sql("DROP TABLE IF EXISTS gaf.ns.t1")
    sql("CREATE TABLE gaf.ns.t1 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    sql("INSERT INTO gaf.ns.t1 VALUES (100, 'seed', 1000)")
    val src = rawDir("t1", 6)
    val out = sql(s"CALL gaf.system.add_files('ns.t1', '$src')").collect().head
    assert(out.getAs[Int]("files_added") === 2)
    assert(out.getAs[Long]("rows") === 6L)
    assert(count("SELECT count(*) c FROM gaf.ns.t1") === 7)
    assert(count("SELECT sum(amt) s FROM gaf.ns.t1") === 210 + 1000)
    // zero-copy: the segment's files share inodes with the source files
    val seg = root.resolve("ns").resolve("t1").resolve(out.getAs[String]("segment"))
    val linked = GraftMeta.listDir(seg).filter(_.getFileName.toString.endsWith(".parquet"))
    val srcInodes = GraftMeta.listDir(src).filter(_.getFileName.toString.endsWith(".parquet"))
      .map(p => Files.getAttribute(p, "unix:ino")).toSet
    assert(linked.nonEmpty && linked.forall(p =>
      srcInodes.contains(Files.getAttribute(p, "unix:ino"))))
    // harvested zone maps serve pruning: a k-range predicate skips the seed segment
    val planned = sql("SELECT k FROM gaf.ns.t1 WHERE k <= 6")
      .queryExecution.executedPlan.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.toBatch.planInputPartitions().length
      }.sum
    assert(planned >= 1)
    assert(count("SELECT count(*) c FROM gaf.ns.t1 WHERE k <= 6") === 6)
  }

  test("source dir deletion does not affect the table (links, not references)") {
    sql("DROP TABLE IF EXISTS gaf.ns.t2")
    sql("CREATE TABLE gaf.ns.t2 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    val src = rawDir("t2", 4)
    sql(s"CALL gaf.system.add_files('ns.t2', '$src')")
    GraftMeta.deleteRecursively(src)
    assert(count("SELECT count(*) c FROM gaf.ns.t2") === 4)
  }

  test("schema gates: missing column, type mismatch, extra column all refused") {
    import spark.implicits._
    sql("DROP TABLE IF EXISTS gaf.ns.t3")
    sql("CREATE TABLE gaf.ns.t3 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    val missing = root.resolve("raw_missing")
    Seq((1L, "a")).toDF("k", "tag").write.mode("overwrite").parquet(missing.toString)
    val e1 = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t3', '$missing')") }
    assert(e1.getMessage.contains("lacks table column"))
    val wrongType = root.resolve("raw_wrongtype")
    Seq((1, "a", 1.5)).toDF("k", "tag", "amt").write.mode("overwrite").parquet(wrongType.toString)
    val e2 = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t3', '$wrongType')") }
    assert(e2.getMessage.contains("in the table") || e2.getMessage.contains("is"))
    val extra = root.resolve("raw_extra")
    Seq((1L, "a", 1L, true)).toDF("k", "tag", "amt", "oops")
      .write.mode("overwrite").parquet(extra.toString)
    val e3 = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t3', '$extra')") }
    assert(e3.getMessage.contains("columns the table lacks"))
    assert(count("SELECT count(*) c FROM gaf.ns.t3") === 0)
  }

  test("per-file schema drift among the linked files is refused (no sampled-footer pass)") {
    import spark.implicits._
    sql("DROP TABLE IF EXISTS gaf.ns.t6")
    sql("CREATE TABLE gaf.ns.t6 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    // one conforming file and one drifted file (amt DOUBLE) in the SAME dir:
    // a directory-level sampled read can pick the good footer and let the
    // drift through to read time — the per-file gate must catch it here
    val mixed = root.resolve("raw_mixed")
    Files.createDirectories(mixed)
    val good = root.resolve("raw_mixed_good")
    val bad = root.resolve("raw_mixed_bad")
    Seq((1L, "a", 10L)).toDF("k", "tag", "amt").coalesce(1)
      .write.mode("overwrite").parquet(good.toString)
    Seq((2L, "b", 1.5)).toDF("k", "tag", "amt").coalesce(1)
      .write.mode("overwrite").parquet(bad.toString)
    def partFile(d: Path): Path =
      GraftMeta.listDir(d).filter(_.getFileName.toString.endsWith(".parquet")).head
    // copy the good file FIRST (lexicographic name order) so a first-footer
    // sample would see the conforming schema
    Files.copy(partFile(good), mixed.resolve("part-00000-aaa.parquet"))
    Files.copy(partFile(bad), mixed.resolve("part-00001-zzz.parquet"))
    val e = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t6', '$mixed')") }
    assert(e.getMessage.contains("amt") && e.getMessage.contains("zzz"),
      e.getMessage)
    assert(count("SELECT count(*) c FROM gaf.ns.t6") === 0)
  }

  test("nested parquet (partitioned/multi-level export) is refused, not silently skipped") {
    import spark.implicits._
    sql("DROP TABLE IF EXISTS gaf.ns.t7")
    sql("CREATE TABLE gaf.ns.t7 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    // a partition-dir export: files live under tag=a/, none at the top level
    val nested = root.resolve("raw_nested")
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "tag", "amt")
      .write.partitionBy("tag").mode("overwrite").parquet(nested.toString)
    val e = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t7', '$nested')") }
    assert(e.getMessage.contains("nested"), e.getMessage)
    assert(count("SELECT count(*) c FROM gaf.ns.t7") === 0)
  }

  /** A FLAT export whose files are each partition-pure: one file per entry
    * of `rows` grouped by tag, moved into one directory with unique names. */
  private def pureExport(name: String, rows: Seq[(String, Long)]): Path = {
    import spark.implicits._
    val src = root.resolve(s"raw_$name")
    Files.createDirectories(src)
    rows.groupBy(_._1).foreach { case (tag, rs) =>
      val tmp = Files.createTempDirectory(root, s"exp_$tag")
      rs.map { case (t, k) => (k, t, k * 10L) }.toDF("k", "tag", "amt")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      GraftMeta.listDir(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
        .zipWithIndex.foreach { case (p, i) =>
          Files.move(p, src.resolve(s"part_${tag}_$i.parquet"))
        }
    }
    src
  }

  test("validate_partitions: pure files land as correctly-suffixed segments (r19)") {
    root
    sql("DROP TABLE IF EXISTS gaf.ns.t6")
    sql("""CREATE TABLE gaf.ns.t6 (k BIGINT, tag STRING, amt BIGINT)
           USING parquet PARTITIONED BY (tag)""")
    sql("INSERT INTO gaf.ns.t6 VALUES (100, 'a', 1000)") // seed partition 'a'
    val src = pureExport("t6", Seq(("a", 1L), ("b", 2L), ("b", 3L)))
    val out = sql(s"CALL gaf.system.add_files('ns.t6', '$src', validate_partitions => true)")
      .collect().head
    assert(out.getAs[Int]("files_added") === 2)
    assert(out.getAs[Long]("rows") === 3L)
    // one segment per proven tuple, byte-identical canonical suffixes
    val meta = GraftMeta.read(root.resolve("ns").resolve("t6"))
    val segs = meta.snapshots(meta.current).filter(_.startsWith("seg-add-"))
    assert(segs.size === 2, segs.toString)
    assert(segs.flatMap(GraftPartitions.suffixOf).toSet === Set("a", "b"))
    assert(count("SELECT COUNT(*) c FROM gaf.ns.t6") === 4)
    assert(count("SELECT COUNT(*) c FROM gaf.ns.t6 WHERE tag = 'b'") === 2)
    assert(count("SELECT CAST(SUM(amt) AS BIGINT) s FROM gaf.ns.t6") === 1000 + 10 + 20 + 30)
    // the imported layout composes with partition-suffix operations:
    // dynamic overwrite of 'b' swaps BOTH imported 'b' files' segment out
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE gaf.ns.t6 VALUES (7, 'b', 70)")
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    assert(count("SELECT COUNT(*) c FROM gaf.ns.t6 WHERE tag = 'b'") === 1)
    assert(count("SELECT COUNT(*) c FROM gaf.ns.t6") === 3)
  }

  test("validate_partitions: an impure file refuses BY NAME; nothing commits (r19)") {
    root
    sql("DROP TABLE IF EXISTS gaf.ns.t7")
    sql("""CREATE TABLE gaf.ns.t7 (k BIGINT, tag STRING, amt BIGINT)
           USING parquet PARTITIONED BY (tag)""")
    import spark.implicits._
    val src = root.resolve("raw_impure")
    Files.createDirectories(src)
    // one file holding TWO tag values — the layout no suffix can describe
    val tmp = Files.createTempDirectory(root, "exp_mixed")
    Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("k", "tag", "amt")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    GraftMeta.listDir(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.move(p, src.resolve("mixed_file.parquet")))
    val e = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t7', '$src', validate_partitions => true)")
    }
    assert(e.getMessage.contains("mixed_file.parquet"), e.getMessage)
    assert(e.getMessage.contains("not partition-pure"), e.getMessage)
    assert(count("SELECT COUNT(*) c FROM gaf.ns.t7") === 0)
  }

  test("validate_partitions: a WIDE impure import refuses file-count-bounded (r20)") {
    root
    sql("DROP TABLE IF EXISTS gaf.ns.t8")
    sql("""CREATE TABLE gaf.ns.t8 (k BIGINT, tag STRING, amt BIGINT)
           USING parquet PARTITIONED BY (tag)""")
    import spark.implicits._
    // ONE file with 50k DISTINCT partition tuples: the r19 distinct-pairs
    // collect materialized all 50k rows on the driver before refusing; the
    // per-file count(distinct) aggregate brings back ONE row per file. The
    // pin is behavioral (refusal fires, names the file and the tuple count,
    // nothing commits) — the bound itself is the aggregate's shape.
    val src = root.resolve("raw_wide_impure")
    Files.createDirectories(src)
    val tmp = Files.createTempDirectory(root, "exp_wide")
    spark.range(0, 50000)
      .selectExpr("id AS k", "concat('t', CAST(id AS STRING)) AS tag", "id * 10 AS amt")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    GraftMeta.listDir(tmp).filter(_.getFileName.toString.endsWith(".parquet"))
      .foreach(p => Files.move(p, src.resolve("wide_file.parquet")))
    val e = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t8', '$src', validate_partitions => true)")
    }
    assert(e.getMessage.contains("wide_file.parquet"), e.getMessage)
    assert(e.getMessage.contains("50000 distinct partition"), e.getMessage)
    assert(count("SELECT COUNT(*) c FROM gaf.ns.t8") === 0)
  }

  test("partitioned and CHECK-constrained targets are refused with remediation") {
    sql("DROP TABLE IF EXISTS gaf.ns.t4")
    sql("CREATE TABLE gaf.ns.t4 (k BIGINT, tag STRING, amt BIGINT) USING parquet PARTITIONED BY (tag)")
    val src = rawDir("t4", 3)
    val e1 = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t4', '$src')") }
    assert(e1.getMessage.contains("identity-partitioned"))
    sql("DROP TABLE IF EXISTS gaf.ns.t5")
    sql("""CREATE TABLE gaf.ns.t5 (k BIGINT, tag STRING, amt BIGINT) USING parquet
      TBLPROPERTIES ('graft.check.pos' = 'amt > 0')""")
    val e2 = intercept[Exception] {
      sql(s"CALL gaf.system.add_files('ns.t5', '$src')") }
    assert(e2.getMessage.contains("CHECK constraints"))
  }
}
