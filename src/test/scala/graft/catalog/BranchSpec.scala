package graft.catalog

import java.nio.file.{Files, Path}

import graft.SparkSpec

/** Pins for branch refs — the write-audit-publish surface (GraftRefs.scala):
  * branch writes stage segments outside the main snapshot lineage, audit
  * reads see base+staged with the base's delete vectors, fast_forward
  * publishes the whole staged state as ONE main commit iff main has not
  * moved, drop_branch discards staged-only segments, and maintenance
  * (expire_snapshots) can never eat an unpublished branch. */
class BranchSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_branch_spec")
    spark.conf.set("spark.sql.catalog.gwb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gwb.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def tableDir(t: String): Path = t.split('.').foldLeft(root)(_ resolve _)
  private def count(q: String): Long = sql(q).collect().head.getLong(0)

  private def mk(t: String, partitioned: Boolean = false): Unit = {
    sql(s"DROP TABLE IF EXISTS gwb.ns.$t")
    val part = if (partitioned) "PARTITIONED BY (tag)" else ""
    sql(s"CREATE TABLE gwb.ns.$t (k BIGINT, tag STRING, amt BIGINT) USING parquet $part")
    sql(s"INSERT INTO gwb.ns.$t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
  }

  private def stage(t: String, branch: String, rows: Seq[(Long, String, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "tag", "amt").write.format("parquet")
      .option("graft.branch", branch).mode("append").saveAsTable(s"gwb.ns.$t")
  }

  test("branch write stages; main unmoved; audit read sees base+staged; publish is one commit") {
    root
    mk("t1")
    val snapsBefore = sql("SELECT count(*) c FROM gwb.ns.t1.snapshots").collect().head.getLong(0)
    sql("CALL gwb.system.create_branch('ns.t1', 'audit')")
    stage("t1", "audit", Seq((4L, "b", 40L), (5L, "a", 50L)))

    // main: unchanged content, NO new snapshot
    assert(count("SELECT count(*) c FROM gwb.ns.t1") === 3)
    assert(count("SELECT count(*) c FROM gwb.ns.t1.snapshots") === snapsBefore)
    // audit read: both syntaxes
    assert(count("SELECT count(*) c FROM gwb.ns.t1 VERSION AS OF 'audit'") === 5)
    assert(spark.read.option("graft.branch", "audit").table("gwb.ns.t1").count() === 5)
    // refs metadata table
    val ref = sql("SELECT * FROM gwb.ns.t1.refs").collect().head
    assert(ref.getAs[String]("branch") === "audit")
    assert(ref.getAs[Int]("n_staged_segments") === 1)
    assert(ref.getAs[Long]("n_rows") === 5L)

    val ff = sql("CALL gwb.system.fast_forward('ns.t1', 'audit')").collect().head
    assert(ff.getAs[Int]("segments_published") === 1)
    assert(count("SELECT count(*) c FROM gwb.ns.t1") === 5)
    assert(count("SELECT sum(amt) c FROM gwb.ns.t1") === 150)
    // exactly ONE main commit; ref consumed
    assert(count("SELECT count(*) c FROM gwb.ns.t1.snapshots") === snapsBefore + 1)
    assert(sql("SELECT * FROM gwb.ns.t1.refs").collect().isEmpty)
    // CDC attributes the publish as one commit carrying exactly the staged rows
    val deltas = GraftCdc.commitDeltas(spark, "gwb", "ns.t1",
      ff.getAs[Long]("previous_snapshot"), Some(ff.getAs[Long]("new_snapshot"))).collect()
    assert(deltas.length === 2 && deltas.forall(_.getAs[String]("_change_type") == "insert"))
  }

  test("fast_forward on a diverged main fails typed; re-staging works") {
    root
    mk("t2")
    sql("CALL gwb.system.create_branch('ns.t2', 'wap')")
    stage("t2", "wap", Seq((4L, "b", 40L)))
    sql("INSERT INTO gwb.ns.t2 VALUES (9, 'z', 90)") // main moves
    val e = intercept[Exception](sql("CALL gwb.system.fast_forward('ns.t2', 'wap')"))
    assert(e.getMessage.contains("main moved"))
    // the audited-but-stale branch is re-staged against the new current
    sql("CALL gwb.system.drop_branch('ns.t2', 'wap')")
    sql("CALL gwb.system.create_branch('ns.t2', 'wap')")
    stage("t2", "wap", Seq((4L, "b", 40L)))
    sql("CALL gwb.system.fast_forward('ns.t2', 'wap')")
    assert(count("SELECT count(*) c FROM gwb.ns.t2") === 5)
  }

  test("drop_branch deletes staged-only segments, never published/shared ones") {
    root
    mk("t3")
    sql("CALL gwb.system.create_branch('ns.t3', 'tmp')")
    stage("t3", "tmp", Seq((7L, "c", 70L)))
    val segsWithStaged = GraftMeta.listDir(tableDir("ns.t3"))
      .count(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("seg-"))
    val dropped = sql("CALL gwb.system.drop_branch('ns.t3', 'tmp')").collect().head
    assert(dropped.getAs[Int]("segments_deleted") === 1)
    val segsAfter = GraftMeta.listDir(tableDir("ns.t3"))
      .count(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("seg-"))
    assert(segsAfter === segsWithStaged - 1)
    assert(count("SELECT count(*) c FROM gwb.ns.t3") === 3) // main untouched
    // branch gone from both surfaces
    assert(sql("SELECT * FROM gwb.ns.t3.refs").collect().isEmpty)
    intercept[Exception](sql("SELECT * FROM gwb.ns.t3 VERSION AS OF 'tmp'").collect())
  }

  test("expire_snapshots keeps an unpublished branch's base and staged segments") {
    root
    mk("t4")
    sql("CALL gwb.system.create_branch('ns.t4', 'keepme')")
    stage("t4", "keepme", Seq((8L, "d", 80L)))
    // bury the base under newer main commits, then expire to keep_last=1
    sql("INSERT INTO gwb.ns.t4 VALUES (10, 'x', 1)")
    sql("INSERT INTO gwb.ns.t4 VALUES (11, 'x', 1)")
    sql("CALL gwb.system.expire_snapshots('ns.t4', keep_last => 1, orphan_retention_ms => 0)")
    // the branch still reads: base snapshot + staged segment both survived
    assert(count("SELECT count(*) c FROM gwb.ns.t4 VERSION AS OF 'keepme'") === 4)
    assert(count("SELECT count(*) c FROM gwb.ns.t4") === 5)
  }

  test("branch from a DV'd base applies the base's delete vectors; publish preserves them") {
    root
    sql("DROP TABLE IF EXISTS gwb.ns.t5")
    sql("""CREATE TABLE gwb.ns.t5 (k BIGINT, tag STRING, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gwb.ns.t5 VALUES (1, 'a', 10), (2, 'b', 20), (3, 'a', 30)")
    sql("DELETE FROM gwb.ns.t5 WHERE k = 2") // merge-on-read: positional vector
    sql("CALL gwb.system.create_branch('ns.t5', 'b5')")
    stage("t5", "b5", Seq((4L, "c", 40L)))
    // audit read must NOT resurrect k=2
    assert(sql("SELECT k FROM gwb.ns.t5 VERSION AS OF 'b5' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
    sql("CALL gwb.system.fast_forward('ns.t5', 'b5')")
    assert(sql("SELECT k FROM gwb.ns.t5 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L))
  }

  test("partitioned branch write stages partition-pure segments; publish keeps pruning") {
    root
    mk("t6", partitioned = true)
    sql("CALL gwb.system.create_branch('ns.t6', 'pb')")
    stage("t6", "pb", Seq((4L, "a", 40L), (5L, "c", 50L)))
    assert(count("SELECT count(*) c FROM gwb.ns.t6") === 3)
    assert(count("SELECT count(*) c FROM gwb.ns.t6 VERSION AS OF 'pb'") === 5)
    // staged segments are partition-pure (one per partition value, suffixed)
    val staged = sql("SELECT * FROM gwb.ns.t6.refs").collect().head.getAs[Int]("n_staged_segments")
    assert(staged === 2, "one staged segment per written partition value")
    sql("CALL gwb.system.fast_forward('ns.t6', 'pb')")
    assert(count("SELECT count(*) c FROM gwb.ns.t6 WHERE tag = 'a'") === 3)
    assert(count("SELECT sum(amt) c FROM gwb.ns.t6") === 150)
  }

  test("WAP appends to identity tables allocate at stage time (r18): main stays disjoint") {
    root
    sql("DROP TABLE IF EXISTS gwb.ns.wid")
    sql("""CREATE TABLE gwb.ns.wid
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gwb.ns.wid (v) VALUES (1), (2)") // main ids 1, 2
    sql("CALL gwb.system.create_branch('ns.wid', 'audit')")
    // staged rows get ids; the branch commit advances the MAIN high-water
    spark.range(3).selectExpr("CAST(NULL AS BIGINT) AS id", "id + 100 AS v")
      .write.format("parquet").option("graft.branch", "audit")
      .mode("append").saveAsTable("gwb.ns.wid")
    assert(sql("SELECT COUNT(*) FROM gwb.ns.wid").collect().head.getLong(0) === 2L,
      "main must not move on a branch write")
    // a MAIN append after staging allocates PAST the staged range (the
    // stage-time propCas advance) — no collision across branch + main
    sql("INSERT INTO gwb.ns.wid (v) VALUES (3)")
    val branchIds = spark.read.option("graft.branch", "audit")
      .table("gwb.ns.wid").select("id").collect().map(_.getLong(0))
    val mainIds = sql("SELECT id FROM gwb.ns.wid").collect().map(_.getLong(0))
    assert(branchIds.length === 5 && branchIds.distinct.length === 5)
    assert((branchIds ++ mainIds).distinct.length ===
      (branchIds.toSet ++ mainIds.toSet).size)
    assert(mainIds.toSet.intersect(branchIds.toSet -- Seq(1L, 2L)).isEmpty,
      s"staged ids ${branchIds.sorted.toSeq} and main ids ${mainIds.sorted.toSeq} must be disjoint")
    // main moved -> the publish refuses (the standard WAP divergence rule)
    val e = intercept[Exception](sql("CALL gwb.system.fast_forward('ns.wid', 'audit')"))
    assert(e.getMessage.contains("moved"), e.getMessage)
  }

  test("WAP identity: publish serves unique ids; drop_branch leaves a gap, never a collision") {
    root
    sql("DROP TABLE IF EXISTS gwb.ns.wid2")
    sql("""CREATE TABLE gwb.ns.wid2
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gwb.ns.wid2 (v) VALUES (1), (2)")
    sql("CALL gwb.system.create_branch('ns.wid2', 'audit')")
    spark.range(3).selectExpr("CAST(NULL AS BIGINT) AS id", "id + 100 AS v")
      .write.format("parquet").option("graft.branch", "audit")
      .mode("append").saveAsTable("gwb.ns.wid2")
    // audit read sees staged ids; publish makes them main — all unique
    sql("CALL gwb.system.fast_forward('ns.wid2', 'audit')")
    val ids = sql("SELECT id FROM gwb.ns.wid2").collect().map(_.getLong(0))
    assert(ids.length === 5 && ids.distinct.length === 5, ids.sorted.toSeq.toString)
    // post-publish appends continue past the staged range
    sql("INSERT INTO gwb.ns.wid2 (v) VALUES (9)")
    val all = sql("SELECT id FROM gwb.ns.wid2").collect().map(_.getLong(0))
    assert(all.distinct.length === 6 && all.max > ids.max)
    // a DROPPED branch's staged range is a gap, never reissued
    sql("CALL gwb.system.create_branch('ns.wid2', 'doomed')")
    spark.range(4).selectExpr("CAST(NULL AS BIGINT) AS id", "id + 500 AS v")
      .write.format("parquet").option("graft.branch", "doomed")
      .mode("append").saveAsTable("gwb.ns.wid2")
    sql("CALL gwb.system.drop_branch('ns.wid2', 'doomed')")
    sql("INSERT INTO gwb.ns.wid2 (v) VALUES (10), (11)")
    val after = sql("SELECT id FROM gwb.ns.wid2").collect().map(_.getLong(0))
    assert(after.distinct.length === 8,
      s"ids minted after a dropped staged range must not collide, got ${after.sorted.toSeq}")
  }

  test("branch writes refuse overwrite and unknown branches; numeric names refused") {
    root
    mk("t7")
    sql("CALL gwb.system.create_branch('ns.t7', 'ok')")
    import spark.implicits._
    val df = Seq((9L, "z", 90L)).toDF("k", "tag", "amt")
    // INSERT OVERWRITE (not saveAsTable-overwrite, which is a table REPLACE
    // and never reaches the write builder) must refuse the branch option
    val e1 = intercept[Exception](df.write
      .option("graft.branch", "ok").mode("overwrite").insertInto("gwb.ns.t7"))
    assert(e1.getMessage.contains("plain appends") ||
      Option(e1.getCause).exists(_.getMessage.contains("plain appends")))
    val e2 = intercept[Exception](df.write.format("parquet")
      .option("graft.branch", "nope").mode("append").saveAsTable("gwb.ns.t7"))
    assert(e2.getMessage.contains("no branch"))
    val e3 = intercept[Exception](sql("CALL gwb.system.create_branch('ns.t7', '123')"))
    assert(e3.getMessage.contains("all digits"))
  }
}
