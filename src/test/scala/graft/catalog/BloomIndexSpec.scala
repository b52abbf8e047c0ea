package graft.catalog

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec

/** Pins for the segment-level bloom index (GraftBloom.scala): filters are
  * harvested at commit for `graft.index.bloom` columns, a plan-time equality
  * probe drops segments the value cannot be in — exactly where zone maps are
  * blind (interleaved values make every segment's min/max span the full
  * domain) — results stay exact, and maintenance rebuilds the filters. */
class BloomIndexSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_bloom_spec")
    spark.conf.set("spark.sql.catalog.gbl", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gbl.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def tdir(t: String): Path = root.resolve("ns").resolve(t)

  private def plannedSegs(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.toBatch.planInputPartitions().toSeq.flatMap {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(x => Paths.get(x.filePath.toString).getParent.getFileName.toString)
          case _ => Nil
        }
    }.flatten.toSet

  /** Three segments with INTERLEAVED keys (k % 3 routing) so every segment's
    * min/max spans ~the whole domain — zone maps can prune nothing, only the
    * bloom can. */
  private def mk(t: String): Unit = {
    sql(s"DROP TABLE IF EXISTS gbl.ns.$t")
    // fpp tight enough that the 999-value fixture has no deterministic false
    // positives — the pruning assertions below are exact-count pins
    sql(s"""CREATE TABLE gbl.ns.$t (k BIGINT, tag STRING) USING parquet
            TBLPROPERTIES ('graft.index.bloom' = 'k,tag',
                           'graft.index.bloom.fpp' = '0.00001')""")
    (0 to 2).foreach { m =>
      spark.range(0, 999).selectExpr("id AS k", "concat('u', id) AS tag")
        .where(s"id % 3 = $m").coalesce(1)
        .writeTo(s"gbl.ns.$t").append()
    }
  }

  test("commit harvests bloom files for declared columns only") {
    root
    mk("t1")
    val segs = GraftMeta.listDir(tdir("t1")).filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith("seg-"))
    assert(segs.size === 3)
    segs.foreach { s =>
      assert(Files.isRegularFile(s.resolve("_bloom_k.bf")), s"$s missing k bloom")
      assert(Files.isRegularFile(s.resolve("_bloom_tag.bf")), s"$s missing tag bloom")
    }
    // an un-indexed table harvests nothing
    sql("DROP TABLE IF EXISTS gbl.ns.plain")
    sql("CREATE TABLE gbl.ns.plain (k BIGINT) USING parquet")
    sql("INSERT INTO gbl.ns.plain VALUES (1)")
    val psegs = GraftMeta.listDir(tdir("plain")).filter(p =>
      Files.isDirectory(p) && p.getFileName.toString.startsWith("seg-"))
    assert(psegs.forall(s => !Files.exists(s.resolve("_bloom_k.bf"))))
  }

  test("integral point lookup prunes to one segment where zone maps are blind") {
    root
    mk("t2")
    // zone maps are provably blind: every segment spans nearly [0, 998]
    val zs = GraftMeta.read(tdir("t2")).zstats.values.map(SegmentStats.decode)
    assert(zs.forall(s => s.cols("k").min.get.toLong <= 2 &&
      s.cols("k").max.get.toLong >= 996))
    val q = sql("SELECT k FROM gbl.ns.t2 WHERE k = 7") // 7 % 3 = 1: one segment
    assert(plannedSegs(q).size === 1, s"bloom should keep 1 segment, saw ${plannedSegs(q)}")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("string equality and IN-lists prune; ranges never mis-prune") {
    root
    mk("t3")
    val s1 = sql("SELECT k FROM gbl.ns.t3 WHERE tag = 'u14'") // 14 % 3 = 2
    assert(plannedSegs(s1).size === 1)
    assert(s1.collect().map(_.getLong(0)).toSeq === Seq(14L))
    // IN over two residue classes keeps exactly their two segments
    val s2 = sql("SELECT k FROM gbl.ns.t3 WHERE k IN (3, 4)") // 0 and 1 mod 3
    assert(plannedSegs(s2).size === 2)
    assert(s2.collect().map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    // a range predicate is not an equality: blooms keep everything, and the
    // answer is exact
    val s3 = sql("SELECT COUNT(*) c FROM gbl.ns.t3 WHERE k BETWEEN 10 AND 20")
    assert(s3.collect().head.getLong(0) === 11L)
    // absent value: every bloom says no → zero files planned, empty result
    val s4 = sql("SELECT k FROM gbl.ns.t3 WHERE k = 100000")
    assert(plannedSegs(s4).isEmpty)
    assert(s4.collect().isEmpty)
  }

  test("compaction rebuilds the index on the compacted segment") {
    root
    mk("t4")
    sql("CALL gbl.system.compact('ns.t4')")
    val segs = GraftMeta.read(tdir("t4")).snapshots(GraftMeta.read(tdir("t4")).current)
    assert(segs.size === 1)
    assert(Files.isRegularFile(tdir("t4").resolve(segs.head).resolve("_bloom_k.bf")))
    val q = sql("SELECT k FROM gbl.ns.t4 WHERE k = 7")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(7L))
  }

  test("clone carries the index (hard-linked) and prunes immediately") {
    root
    mk("t5")
    sql("CALL gbl.system.clone_table('ns.t5', 'ns.t5c')")
    val q = sql("SELECT k FROM gbl.ns.t5c WHERE k = 11")
    assert(plannedSegs(q).size === 1)
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(11L))
  }
}
