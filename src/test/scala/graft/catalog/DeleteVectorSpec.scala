package graft.catalog

import java.nio.file.{Files, Path}

import scala.collection.JavaConverters._

import graft.SparkSpec

/** Pins for merge-on-read DELETE via positional delete vectors:
  * point deletes write O(rows-deleted) vectors instead of rewriting
  * segments, reads merge them (clean segments stay vectorized), every
  * rewrite path materializes them, and time travel / CDC / streaming see
  * each snapshot's exact row content. */
class DeleteVectorSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_dv_spec")
    spark.conf.set("spark.sql.catalog.gdv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gdv.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  private def tableDir(t: String): Path = t.split('.').foldLeft(root)(_ resolve _)

  /** (name, mtime, recursive file list) of every seg-* dir — byte-identity
    * witness for "merge-on-read touched no segment". */
  private def segState(dir: Path): Map[String, Seq[(String, Long)]] =
    GraftMeta.listDir(dir)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("seg-"))
      .map { p =>
        val files = GraftMeta.listDir(p).filter(Files.isRegularFile(_))
          .map(f => (f.getFileName.toString, Files.getLastModifiedTime(f).toMillis))
          .sortBy(_._1)
        p.getFileName.toString -> files
      }.toMap

  private def dvDirs(dir: Path): Seq[String] =
    GraftMeta.listDir(dir)
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("dv-"))
      .map(_.getFileName.toString).sorted

  private def mkMor(t: String, rows: Seq[(Long, String, Long)], batches: Int = 2): Unit = {
    sql(s"DROP TABLE IF EXISTS gdv.ns.$t")
    sql(s"""CREATE TABLE gdv.ns.$t (k BIGINT, tag STRING, amt BIGINT) USING parquet
            TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    rows.grouped(math.max(1, (rows.size + batches - 1) / batches)).foreach { g =>
      val vals = g.map { case (k, s, a) => s"($k, '$s', $a)" }.mkString(", ")
      sql(s"INSERT INTO gdv.ns.$t VALUES $vals")
    }
  }

  private val fixture: Seq[(Long, String, Long)] =
    (1L to 20L).map(k => (k, if (k % 2 == 0) "even" else "odd", k * 10))

  test("DV positions load PER TASK: planning a multi-segment DV read runs no driver job") {
    root
    mkMor("lazy1", fixture, batches = 3) // 3 segments
    sql("DELETE FROM gdv.ns.lazy1 WHERE k IN (2, 9, 15)")  // dv commit 1
    sql("DELETE FROM gdv.ns.lazy1 WHERE k IN (4, 18)")     // dv commit 2
    // plan the scan's batch THROUGH the catalog: no positions map exists on
    // the driver (GraftDvPartition carries only its seg/file key + the dv
    // FILE LIST), and neither scan build nor split planning may run a job —
    // the old implementation collected every (seg,file,pos) here
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    val parts = try {
      val cat = spark.sessionState.catalogManager.catalog("gdv")
        .asInstanceOf[GraftCatalog]
      val tbl = cat.loadTable(
        org.apache.spark.sql.connector.catalog.Identifier.of(Array("ns"), "lazy1"))
      val scan = tbl.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
        .newScanBuilder(org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
        .build()
      val p = scan.toBatch.planInputPartitions()
      Thread.sleep(300)
      p
    } finally spark.sparkContext.removeSparkListener(l)
    assert(jobs.get() === 0,
      "scan build + split planning must be metadata-only (no positions collect)")
    val dvParts = parts.collect { case p: GraftDvPartition => p }
    assert(dvParts.nonEmpty, "the DV'd segments must plan lazy DV partitions")
    assert(dvParts.forall(_.dvFiles.nonEmpty), "each task carries the dv file list")
    assert(dvParts.map(_.key).distinct.length === dvParts.length,
      "one partition per dirty file")
    // the executor-side loader finds exactly each file's deleted positions:
    // summed across files it must equal the 5 deleted rows
    val total = dvParts.map(p => GraftDv.positionsFor(p.dvFiles, p.key).length).sum
    assert(total === 5, s"per-task loads must cover exactly the 5 deleted rows, got $total")
    // and the merged read is exact
    assert(sql("SELECT COUNT(*) AS n, SUM(amt) AS s FROM gdv.ns.lazy1").collect()
      .map(r => (r.getLong(0), r.getLong(1))).head
      === ((15L, fixture.map(_._3).sum - (2 + 9 + 15 + 4 + 18) * 10L)))
  }

  test("MOR delete: content correct, no segment rewritten, vector on disk") {
    root
    mkMor("t1", fixture)
    val dir = tableDir("ns.t1")
    val before = segState(dir)
    assert(before.size === 2)

    val res = sql("CALL gdv.system.delete_where('ns.t1', 'k IN (3, 4, 17)')").collect()
    assert(res.head.getLong(2) === 3L) // rows_deleted

    // byte-identity: every segment dir and file untouched
    assert(segState(dir) === before)
    assert(dvDirs(dir).size === 1)

    val rows = sql("SELECT k FROM gdv.ns.t1 ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === (1L to 20L).filterNot(Set(3L, 4L, 17L)))
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t1").collect().head.getLong(0) === 17L)
  }

  test("MOR delete composes: overlapping second delete counts each row once") {
    root
    mkMor("t2", fixture)
    sql("CALL gdv.system.delete_where('ns.t2', 'k <= 6')")
    // k in 1..6 already deleted; this predicate also matches k=5,6 — they
    // must NOT be double-counted or re-recorded
    val res = sql("CALL gdv.system.delete_where('ns.t2', 'k BETWEEN 5 AND 8')").collect()
    assert(res.head.getLong(2) === 2L) // only 7, 8 newly deleted
    val rows = sql("SELECT k FROM gdv.ns.t2 ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === (9L to 20L))
    assert(dvDirs(tableDir("ns.t2")).size === 2)
  }

  test("SQL DELETE FROM routes to vectors on a merge-on-read table") {
    root
    mkMor("t3", fixture)
    val dir = tableDir("ns.t3")
    val before = segState(dir)
    sql("DELETE FROM gdv.ns.t3 WHERE tag = 'even'")
    assert(segState(dir) === before) // no segment rewritten
    assert(dvDirs(dir).nonEmpty)
    val rows = sql("SELECT k FROM gdv.ns.t3 ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === (1L to 20L).filter(_ % 2 == 1))
  }

  test("time travel pins each snapshot's delete vectors") {
    root
    mkMor("t4", fixture, batches = 1)
    sql("CALL gdv.system.delete_where('ns.t4', 'k > 15')") // snap 2
    sql("CALL gdv.system.delete_where('ns.t4', 'k < 5')")  // snap 3
    def at(v: Int) =
      sql(s"SELECT count(*) AS c FROM gdv.ns.t4 VERSION AS OF $v").collect().head.getLong(0)
    assert(at(1) === 20L)
    assert(at(2) === 15L)
    assert(at(3) === 11L)
    // filters push down through the DV merge
    val filtered = sql("SELECT k FROM gdv.ns.t4 WHERE k >= 14").collect().map(_.getLong(0))
    assert(filtered.toSeq.sorted === Seq(14L, 15L))
  }

  test("COW update on a DV'd table does not resurrect deleted rows") {
    root
    mkMor("t5", fixture, batches = 1)
    sql("CALL gdv.system.delete_where('ns.t5', 'k <= 10')")
    sql("CALL gdv.system.update_where('ns.t5', 'k = 12', 'amt = 999')")
    val rows = sql("SELECT k, amt FROM gdv.ns.t5 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === (11L to 20L).map(k => (k, if (k == 12) 999L else k * 10)))
    // the rewrite materialized the vector: it no longer applies to current
    val meta = GraftMeta.read(tableDir("ns.t5"))
    assert(meta.dvs.getOrElse(meta.current, Map.empty).isEmpty)
  }

  test("SQL MERGE on a DV'd table: group rewrite stays DV-merged") {
    root
    mkMor("t6", fixture, batches = 1)
    sql("CALL gdv.system.delete_where('ns.t6', 'k >= 18')")
    sql("""MERGE INTO gdv.ns.t6 t
           USING (SELECT * FROM VALUES (1L, 'm', 111L), (18L, 'back', 0L) AS s(k, tag, amt)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, tag, amt) VALUES (s.k, s.tag, s.amt)""")
    // k=18 was DELETED → merge sees no match → INSERTs it back; k=1 updates
    val rows = sql("SELECT k, amt FROM gdv.ns.t6 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq ===
      ((1L, 111L) +: (2L to 17L).map(k => (k, k * 10)) :+ ((18L, 0L))))
  }

  test("compaction materializes vectors; rewrite_deletes touches only dirty segments") {
    root
    // rewrite_deletes: two segments, vector on one — the clean one must not move
    mkMor("t7", fixture)
    val dir = tableDir("ns.t7")
    val metaBefore = GraftMeta.read(dir)
    val seg1 = metaBefore.snapshots(metaBefore.current).head // holds k=1..10
    sql("CALL gdv.system.delete_where('ns.t7', 'k IN (1, 2)')")
    val before = segState(dir)
    val res = sql("CALL gdv.system.rewrite_deletes('ns.t7')").collect()
    assert((res.head.getInt(0), res.head.getInt(1), res.head.getLong(2)) === ((1, 1, 2L)))
    val after = segState(dir)
    // the untouched (clean) segment is byte-identical; the dirty one replaced
    val metaAfter = GraftMeta.read(dir)
    val survivors = metaAfter.snapshots(metaAfter.current)
    assert(survivors.size === 2)
    val carried = before.keySet.intersect(survivors.toSet)
    carried.foreach(s => assert(after(s) === before(s)))
    assert(!survivors.contains(seg1) || carried.size == 1)
    assert(metaAfter.dvs.getOrElse(metaAfter.current, Map.empty).isEmpty)
    val rows = sql("SELECT k FROM gdv.ns.t7 ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === (3L to 20L))
    // idempotent no-op when no vectors remain
    val res2 = sql("CALL gdv.system.rewrite_deletes('ns.t7')").collect()
    assert(res2.head.getInt(0) === 0)

    // compaction also materializes
    mkMor("t8", fixture)
    sql("CALL gdv.system.delete_where('ns.t8', 'k % 5 = 0')")
    sql("CALL gdv.system.compact('ns.t8')")
    val m8 = GraftMeta.read(tableDir("ns.t8"))
    assert(m8.dvs.getOrElse(m8.current, Map.empty).isEmpty)
    val r8 = sql("SELECT k FROM gdv.ns.t8 ORDER BY k").collect().map(_.getLong(0))
    assert(r8.toSeq === (1L to 20L).filterNot(_ % 5 == 0))
  }

  test("CDC row deltas see a DV commit as row-level deletes") {
    root
    mkMor("t9", fixture, batches = 1)
    sql("CALL gdv.system.delete_where('ns.t9', 'k IN (2, 9)')") // snap 2
    val deltas = GraftCdc.rowDeltas(spark, "gdv", "ns.t9", from = 1, to = Some(2))
      .collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(deltas.toSeq === Seq((2L, "delete"), (9L, "delete")))
    // per-commit attribution agrees
    val perCommit = GraftCdc.commitDeltas(spark, "gdv", "ns.t9", from = 1, to = Some(2))
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(4))).sorted
    assert(perCommit.toSeq === Seq((2L, "delete", 2L), (9L, "delete", 2L)))
  }

  test("t.changes serves a DV commit; append-only feed and plain stream refuse it") {
    root
    mkMor("t10", fixture, batches = 1)
    sql("CALL gdv.system.delete_where('ns.t10', 'k = 7')") // snap 2: DV commit
    // the first-class change feed materializes the delete
    val feed = sql(
      """SELECT k, _change_type FROM gdv.ns.t10.changes
         WHERE _commit_version = 2""").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(feed.toSeq === Seq((7L, "delete")))
    // the append-only incremental read refuses the range
    val e = intercept[Exception] {
      spark.read.option("graft.changes.from", "1").table("gdv.ns.t10").collect()
    }
    assert(e.getMessage.contains("delete vector"))
  }

  test("expire_snapshots GCs vectors with their snapshots; rollback restores them") {
    root
    mkMor("t11", fixture, batches = 1)
    sql("CALL gdv.system.delete_where('ns.t11', 'k <= 5')")  // snap 2 + dv A
    val dir = tableDir("ns.t11")
    assert(dvDirs(dir).size === 1)
    // rollback to 1: rows resurrect (metadata-only commit)
    sql("CALL gdv.system.rollback_to_snapshot('ns.t11', 1)")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t11").collect().head.getLong(0) === 20L)
    // roll forward again to the DV'd state
    sql("CALL gdv.system.rollback_to_snapshot('ns.t11', 2)")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t11").collect().head.getLong(0) === 15L)
    // expiring history keeps the vector (current still references it)
    sql("CALL gdv.system.expire_snapshots('ns.t11', 1, false, 0)")
    assert(dvDirs(dir).size === 1)
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t11").collect().head.getLong(0) === 15L)
    // rewrite away the vector, then expire: the dv dir is garbage-collected
    sql("CALL gdv.system.rewrite_deletes('ns.t11')")
    sql("CALL gdv.system.expire_snapshots('ns.t11', 1, false, 0)")
    assert(dvDirs(dir).isEmpty)
  }

  test("partitioned table: MOR delete leaves sibling partitions byte-identical") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.p1")
    sql("""CREATE TABLE gdv.ns.p1 (k BIGINT, part STRING) USING parquet
           PARTITIONED BY (part)
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gdv.ns.p1 SELECT id AS k, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(1, 21)")
    val dir = tableDir("ns.p1")
    val before = segState(dir)
    sql("DELETE FROM gdv.ns.p1 WHERE k IN (2, 4)") // both in partition 'a'
    assert(segState(dir) === before)
    val rows = sql("SELECT k FROM gdv.ns.p1 WHERE part = 'a' ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(6L, 8L, 10L, 12L, 14L, 16L, 18L, 20L))
    assert(sql("SELECT count(*) AS c FROM gdv.ns.p1").collect().head.getLong(0) === 18L)
  }

  test("changes STREAM serves DV commits with attribution, exactly-once across restart") {
    root
    mkMor("t13", fixture, batches = 1)                       // snap 1
    sql("INSERT INTO gdv.ns.t13 VALUES (100, 'x', 1000)")    // snap 2
    val ckpt = Files.createTempDirectory("graft_dv_ckpt").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long)]]
    def runAvailable(): Unit = {
      val q = spark.readStream.table("gdv.ns.t13.changes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.collect()
            .map(r => (r.getLong(4), r.getString(3), r.getLong(0))) // (_commit_version, _change_type, k)
            .sorted.toSeq
          batches.synchronized { batches += rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runAvailable() // drains snaps 1..2 (appends)
    val drained = batches.size
    // a merge-on-read DELETE lands while the stream is down — the PLAIN
    // source refuses this range (pinned above); the changes stream must
    // deliver it as row-level deletes
    sql("CALL gdv.system.delete_where('ns.t13', 'k IN (3, 100)')") // snap 3 (DV)
    runAvailable()
    val resumed = batches.drop(drained).flatten.toSeq.sorted
    assert(resumed === Seq((3L, "delete", 3L), (3L, "delete", 100L)),
      s"restart must deliver the DV commit's deletes: $resumed")
    val api = GraftCdc.commitDeltas(spark, "gdv", "ns.t13", 0L).collect()
      .map(r => (r.getLong(4), r.getString(3), r.getLong(0))).sorted.toSeq
    assert(batches.flatten.toSeq.sorted === api,
      "stream-over-lifetime must equal commitDeltas(0, current)")
  }

  test("metadata tables expose delete-vector counts per snapshot and segment") {
    root
    mkMor("t14", fixture)
    sql("CALL gdv.system.delete_where('ns.t14', 'k IN (1, 11)')") // one dv, both segments
    val snaps = sql(
      "SELECT snapshot_id, n_delete_vectors FROM gdv.ns.t14.snapshots ORDER BY snapshot_id")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(snaps.last._2 === 1, s"current snapshot applies one vector: ${snaps.toSeq}")
    assert(snaps.init.forall(_._2 === 0))
    val segs = sql("SELECT segment, n_delete_vectors FROM gdv.ns.t14.segments")
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(segs.forall(_._2 === 1), s"the vector touches both segments: ${segs.toSeq}")
  }

  test("DV commit validation is positional: appends commute, same-segment conflicts fail") {
    root
    mkMor("t15", fixture, batches = 1)
    val dir = tableDir("ns.t15")
    val base = GraftMeta.read(dir)
    val seg = base.snapshots(base.current).head
    // a concurrent APPEND lands between the delete's snapshot pin and its
    // commit — positional deletes reference immutable files, so the commit
    // must SUCCEED (the continuous-ingest case)
    sql("INSERT INTO gdv.ns.t15 VALUES (100, 'x', 1000)")
    val dvA = s"dv-${java.util.UUID.randomUUID().toString.take(12)}"
    stageDv(dir, dvA, seg, poss = Seq(0L))
    GraftMeta.commitAddDeletes(dir, dvA, Set(seg),
      baseDvs = GraftDv.forSegments(base, base.current, Seq(seg)))
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t15").collect().head.getLong(0) === 20L,
      "21 rows after append, minus the 1 vectored position")
    // a concurrent SAME-SEGMENT merge-on-read delete must fail: this
    // commit's match set was computed against the pre-delete vectors
    val dvB = s"dv-${java.util.UUID.randomUUID().toString.take(12)}"
    stageDv(dir, dvB, seg, poss = Seq(1L))
    val e1 = intercept[IllegalArgumentException] {
      GraftMeta.commitAddDeletes(dir, dvB, Set(seg),
        baseDvs = GraftDv.forSegments(base, base.current, Seq(seg))) // stale: pre-dvA
    }
    assert(e1.getMessage.contains("concurrent merge-on-read delete"))
    // a concurrent REWRITE of the touched segment must fail: the files the
    // positions point into are gone
    sql("CALL gdv.system.compact('ns.t15')")
    val e2 = intercept[IllegalArgumentException] {
      val m = GraftMeta.read(dir)
      GraftMeta.commitAddDeletes(dir, dvB, Set(seg),
        baseDvs = GraftDv.forSegments(m, m.current, Seq(seg)))
    }
    assert(e2.getMessage.contains("concurrent rewrite"))
  }

  /** Write a minimal (seg, file, pos) vector dir targeting `seg`'s first
    * parquet file — the fixture for commit-level validation tests. */
  private def stageDv(dir: Path, dvName: String, seg: String, poss: Seq[Long]): Unit = {
    val file = GraftMeta.listDir(dir.resolve(seg))
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).sorted.head
    import spark.implicits._
    poss.map(p => (seg, file, p)).toDF("seg", "file", "pos")
      .coalesce(1).write.parquet(dir.resolve(dvName).toString)
  }

  test("MOR update: old positions vectored, new versions appended, no segment rewritten") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.u1")
    sql("""CREATE TABLE gdv.ns.u1 (k BIGINT, tag STRING, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read',
                          'graft.update-mode' = 'merge-on-read')""")
    fixture.grouped(10).foreach { g =>
      val vals = g.map { case (k, s, a) => s"($k, '$s', $a)" }.mkString(", ")
      sql(s"INSERT INTO gdv.ns.u1 VALUES $vals")
    }
    val dir = tableDir("ns.u1")
    val before = segState(dir)
    val res = sql(
      "CALL gdv.system.update_where('ns.u1', 'k IN (2, 15)', 'amt = amt * 100')").collect()
    assert(res.head.getLong(2) === 2L) // rows_updated
    // the pre-update segments are byte-identical; one new segment appended
    val after = segState(dir)
    before.keys.foreach(s => assert(after(s) === before(s)))
    assert(after.size === before.size + 1)
    assert(dvDirs(dir).size === 1)
    val rows = sql("SELECT k, amt FROM gdv.ns.u1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === (1L to 20L).map(k =>
      (k, if (k == 2 || k == 15) k * 1000 else k * 10)))
    // RHS saw pre-update values; count is stable; time travel sees the old amt
    assert(sql("SELECT count(*) AS c FROM gdv.ns.u1").collect().head.getLong(0) === 20L)
    assert(sql("SELECT amt FROM gdv.ns.u1 VERSION AS OF 2 WHERE k = 2")
      .collect().head.getLong(0) === 20L)
    // CDC: the update commit is a delete+insert pair per row
    val m = GraftMeta.read(dir)
    val deltas = GraftCdc.commitDeltas(spark, "gdv", "ns.u1", m.current - 1, Some(m.current))
      .collect().map(r => (r.getLong(0), r.getString(3), r.getLong(2))).sorted
    assert(deltas.toSeq === Seq(
      (2L, "delete", 20L), (2L, "insert", 2000L),
      (15L, "delete", 150L), (15L, "insert", 15000L)))
  }

  test("MOR update may move rows ACROSS partitions (COW refuses this)") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.u2")
    sql("""CREATE TABLE gdv.ns.u2 (k BIGINT, part STRING) USING parquet
           PARTITIONED BY (part)
           TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    sql("INSERT INTO gdv.ns.u2 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(1, 11)")
    val dir = tableDir("ns.u2")
    val before = segState(dir)
    sql("CALL gdv.system.update_where('ns.u2', 'k = 4', \"part = 'b'\")")
    // every pre-existing segment untouched; the moved row landed partition-pure in 'b'
    before.keys.foreach(s => assert(segState(dir)(s) === before(s)))
    val aRows = sql("SELECT k FROM gdv.ns.u2 WHERE part = 'a' ORDER BY k")
      .collect().map(_.getLong(0))
    val bRows = sql("SELECT k FROM gdv.ns.u2 WHERE part = 'b' ORDER BY k")
      .collect().map(_.getLong(0))
    assert(aRows.toSeq === Seq(2L, 6L, 8L, 10L))
    assert(bRows.toSeq === Seq(1L, 3L, 4L, 5L, 7L, 9L))
    val m = GraftMeta.read(dir)
    val moved = m.snapshots(m.current).filterNot(before.keySet)
    assert(moved.size === 1 && moved.head.contains("@b"),
      s"the new row version must land in a partition-pure 'b' segment: $moved")
  }

  test("MOR upsert: matched keys vectored + replaced, new keys inserted, one commit") {
    root
    mkMor("t16", fixture, batches = 1)
    val dir = tableDir("ns.t16")
    val before = segState(dir)
    // 3 updates (k=1,2,3 with new amounts) + 2 inserts (k=30,31)
    spark.sql("""SELECT * FROM VALUES
        (1L, 'up', 111L), (2L, 'up', 222L), (3L, 'up', 333L),
        (30L, 'new', 300L), (31L, 'new', 310L) AS v(k, tag, amt)""")
      .createOrReplaceTempView("ups_src")
    val res = sql("CALL gdv.system.upsert('ns.t16', 'ups_src', 'k')").collect()
    assert((res.head.getLong(0), res.head.getLong(1)) === ((3L, 2L)))
    // no pre-existing segment rewritten; exactly one commit happened
    before.keys.foreach(s => assert(segState(dir)(s) === before(s)))
    val m = GraftMeta.read(dir)
    assert(m.current === 2L, "the upsert is ONE commit")
    val rows = sql("SELECT k, amt FROM gdv.ns.t16 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq ===
      (Seq((1L, 111L), (2L, 222L), (3L, 333L)) ++
        (4L to 20L).map(k => (k, k * 10)) ++ Seq((30L, 300L), (31L, 310L))))
    // time travel shows the pre-upsert state; CDC shows pairs + inserts
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t16 VERSION AS OF 1")
      .collect().head.getLong(0) === 20L)
    val deltas = GraftCdc.rowDeltas(spark, "gdv", "ns.t16", 1, Some(2))
      .collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(deltas.toSeq === Seq((1L, "delete"), (1L, "insert"), (2L, "delete"),
      (2L, "insert"), (3L, "delete"), (3L, "insert"),
      (30L, "insert"), (31L, "insert")))
    // a second upsert hitting an APPENDED segment's row composes
    spark.sql("SELECT * FROM VALUES (30L, 'up2', 3000L) AS v(k, tag, amt)")
      .createOrReplaceTempView("ups_src2")
    val res2 = sql("CALL gdv.system.upsert('ns.t16', 'ups_src2', 'k')").collect()
    assert((res2.head.getLong(0), res2.head.getLong(1)) === ((1L, 0L)))
    assert(sql("SELECT amt FROM gdv.ns.t16 WHERE k = 30").collect().head.getLong(0) === 3000L)
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t16").collect().head.getLong(0) === 22L)
  }

  test("MOR upsert: duplicate-keyed TARGET vectors all positions, reports key arithmetic") {
    root
    // appends bypass upsert's source-side uniqueness: plant k=1 twice
    mkMor("t18", fixture, batches = 1)
    sql("INSERT INTO gdv.ns.t18 VALUES (1, 'dup', 999)")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t18 WHERE k = 1")
      .collect().head.getLong(0) === 2L)
    spark.sql("SELECT * FROM VALUES (1L, 'up', 111L), (40L, 'new', 400L) AS v(k, tag, amt)")
      .createOrReplaceTempView("ups_dup_tgt")
    val res = sql("CALL gdv.system.upsert('ns.t18', 'ups_dup_tgt', 'k')").collect()
    // KEY arithmetic: 1 key updated (both its live positions vectored),
    // 1 key inserted — rows_inserted must not go negative or overstate
    assert((res.head.getLong(0), res.head.getLong(1)) === ((1L, 1L)))
    // the upsert healed the duplicate: exactly ONE live version of k=1
    val k1 = sql("SELECT tag, amt FROM gdv.ns.t18 WHERE k = 1").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(k1.toSeq === Seq(("up", 111L)))
    assert(sql("SELECT amt FROM gdv.ns.t18 WHERE k = 40").collect()
      .head.getLong(0) === 400L)
  }

  test("upsert commit is serializable: a snapshot advanced since the probe loses the CAS") {
    root
    mkMor("t19", fixture, batches = 1)
    val dir = tableDir("ns.t19")
    val probed = GraftMeta.read(dir)
    sql("INSERT INTO gdv.ns.t19 VALUES (50, 'race', 500)") // advances the snapshot
    // a delta commit pinned to the probed snapshot must fail typed-retryable
    val seg = probed.snapshots(probed.current).head
    val e = intercept[GraftConcurrentCommitException] {
      GraftMeta.commitAddDeletesAndAppend(dir, "dv-nonexistent", Set(seg),
        baseDvs = Map.empty, newSegments = Nil,
        expectedCurrent = Some(probed.current))
    }
    assert(e.getMessage.contains("concurrent commit"))
    // ...and WITHOUT the pin the same commit passes positional validation —
    // the append-commutative contract plain MOR DELETE relies on
    sql("CALL gdv.system.delete_where('ns.t19', 'k = 2')")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t19").collect().head.getLong(0) === 20L)
  }

  test("racing upserts of the same key leave exactly one live version") {
    root
    mkMor("t20", fixture, batches = 1)
    spark.sql("SELECT * FROM VALUES (100L, 'a', 1L) AS v(k, tag, amt)")
      .createOrReplaceTempView("race_a")
    spark.sql("SELECT * FROM VALUES (100L, 'b', 2L) AS v(k, tag, amt)")
      .createOrReplaceTempView("race_b")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val session = spark
    def race(view: String) = pool.submit(new Runnable {
      override def run(): Unit = {
        org.apache.spark.sql.SparkSession.setActiveSession(session)
        gate.await()
        sql(s"CALL gdv.system.upsert('ns.t20', '$view', 'k')").collect()
        ()
      }
    })
    val (fa, fb) = (race("race_a"), race("race_b"))
    gate.countDown()
    fa.get(120, TimeUnit.SECONDS); fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // both upserts carry k=100: whatever the interleaving, the serializable
    // retry means the loser re-probes and vectors the winner's row — never
    // two live versions of one key
    val versions = sql("SELECT tag FROM gdv.ns.t20 WHERE k = 100").collect()
    assert(versions.length === 1,
      s"expected one live version of k=100, got ${versions.map(_.getString(0)).toSeq}")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t20").collect().head.getLong(0) === 21L)
  }

  test("MOR upsert: duplicate source keys fail; pure insert commits no vector") {
    root
    mkMor("t17", fixture, batches = 1)
    spark.sql("SELECT * FROM VALUES (1L, 'a', 1L), (1L, 'b', 2L) AS v(k, tag, amt)")
      .createOrReplaceTempView("ups_dup")
    val e = intercept[Exception] {
      sql("CALL gdv.system.upsert('ns.t17', 'ups_dup', 'k')").collect()
    }
    assert(e.getMessage.contains("duplicate keys"))
    spark.sql("SELECT * FROM VALUES (40L, 'new', 400L) AS v(k, tag, amt)")
      .createOrReplaceTempView("ups_ins")
    val res = sql("CALL gdv.system.upsert('ns.t17', 'ups_ins', 'k')").collect()
    assert((res.head.getLong(0), res.head.getLong(1)) === ((0L, 1L)))
    assert(dvDirs(tableDir("ns.t17")).isEmpty, "pure insert publishes no vector")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.t17").collect().head.getLong(0) === 21L)
  }

  test("MOR upsert on a PARTITIONED table lands partition-pure new versions") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.u3")
    sql("""CREATE TABLE gdv.ns.u3 (k BIGINT, part STRING) USING parquet
           PARTITIONED BY (part)""")
    sql("INSERT INTO gdv.ns.u3 SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END FROM range(1, 11)")
    // k=4 moves partition a→b; k=50 inserts into c
    spark.sql("SELECT * FROM VALUES (4L, 'b'), (50L, 'c') AS v(k, part)")
      .createOrReplaceTempView("ups_p")
    val dir = tableDir("ns.u3")
    val before = segState(dir)
    sql("CALL gdv.system.upsert('ns.u3', 'ups_p', 'k')")
    before.keys.foreach(s => assert(segState(dir)(s) === before(s)))
    val m = GraftMeta.read(dir)
    val appended = m.snapshots(m.current).filterNot(before.keySet).sorted
    assert(appended.size === 2 &&
      appended.exists(_.contains("@b")) && appended.exists(_.contains("@c")),
      s"partition-pure appends expected: $appended")
    assert(sql("SELECT k FROM gdv.ns.u3 WHERE part = 'b' ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 4L, 5L, 7L, 9L))
    assert(sql("SELECT k FROM gdv.ns.u3 WHERE part = 'c'")
      .collect().map(_.getLong(0)).toSeq === Seq(50L))
  }

  test("end-to-end CDC apply: t.changes stream + exactly-once upsert mirrors a table") {
    root
    // SOURCE: a table with an append + a merge-on-read update in its history
    mkMor("src1", fixture.take(6), batches = 1)                       // snap 1
    sql("INSERT INTO gdv.ns.src1 VALUES (100, 'x', 1000)")            // snap 2
    sql("ALTER TABLE gdv.ns.src1 SET TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')")
    sql("CALL gdv.system.update_where('ns.src1', 'k = 2', 'amt = 999')") // snap 3 (DV + append)
    // MIRROR: built by replaying the change feed, one upsert per commit.
    // An UPDATE arrives as delete(old)+insert(new) on one key inside one
    // commit — applying the commit's INSERT rows via keyed upsert replaces
    // the old version exactly (the delete half is implied by the key match).
    sql("DROP TABLE IF EXISTS gdv.ns.mir1")
    sql("CREATE TABLE gdv.ns.mir1 (k BIGINT, tag STRING, amt BIGINT) USING parquet")
    def applyFeed(tag: String): Unit = {
      val ckpt = Files.createTempDirectory(s"graft_apply_$tag").toString
      val q = spark.readStream.option("maxSnapshotsPerTrigger", 1)
        .table("gdv.ns.src1.changes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          val inserts = df.where("_change_type = 'insert'")
            .select("k", "tag", "amt")
          // view + CALL must share the micro-batch's session clone
          inserts.createOrReplaceTempView("cdc_apply_batch")
          // the batch id is the idempotency key: replays become no-ops
          inserts.sparkSession.sql(
            s"CALL gdv.system.upsert('ns.mir1', 'cdc_apply_batch', 'k', '$tag-$batchId')")
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    applyFeed("a")
    def mirrorRows() = sql("SELECT k, tag, amt FROM gdv.ns.mir1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    def sourceRows() = sql("SELECT k, tag, amt FROM gdv.ns.src1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(mirrorRows() === sourceRows(), "mirror must equal the source after apply")
    val snapAfter = GraftMeta.read(tableDir("ns.mir1")).current
    // REPLAY the whole feed with a FRESH checkpoint (same batch ids
    // re-delivered from epoch 0): every upsert is a registry no-op — the
    // mirror neither doubles rows nor advances a snapshot
    applyFeed("a")
    assert(mirrorRows() === sourceRows(), "replay must not change the mirror")
    assert(GraftMeta.read(tableDir("ns.mir1")).current === snapAfter,
      "replayed batches must commit nothing")
  }

  test("cross-segment DV: same-named files in two segments never cross-filter") {
    root
    // GraftPartitionedWrite names files `part-<partitionId>-<taskId>`, and ONE
    // task writes that same name into EVERY partition segment it touches — so
    // a coalesce(1) insert spanning two partition values plants the collision:
    // two segments, each holding a parquet file with the SAME base name.
    // Positions keyed by bare file name would merge both files' vectors and
    // filter each file with the union, silently dropping live rows.
    sql("DROP TABLE IF EXISTS gdv.ns.txseg")
    sql("""CREATE TABLE gdv.ns.txseg (k BIGINT, p STRING) USING parquet
            PARTITIONED BY (p)
            TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    import spark.implicits._
    (0L until 20L).map(k => (k, if (k < 10) "a" else "b")).toDF("k", "p")
      .coalesce(1).writeTo("gdv.ns.txseg").append()
    val dir = tableDir("ns.txseg")
    // precondition: the collision is REAL — both segments contain a parquet
    // file with the same base name (else this test stops covering the bug)
    val segFiles = segState(dir).view.mapValues(_.map(_._1).filter(_.endsWith(".parquet")).toSet).toMap
    assert(segFiles.size === 2, s"expected 2 partition segments, got ${segFiles.keySet}")
    val common = segFiles.values.reduce(_ intersect _)
    assert(common.nonEmpty,
      s"fixture must plant same-named files across segments, got $segFiles")

    // k=0 is position 0 in segment p=a; k=15 is position 5 in segment p=b.
    // A name-keyed union {0,5} applied to both files would also kill k=5
    // (pos 5 in a) and k=10 (pos 0 in b).
    val res = sql("CALL gdv.system.delete_where('ns.txseg', 'k IN (0, 15)')").collect()
    assert(res.head.getLong(2) === 2L)
    val rows = sql("SELECT k FROM gdv.ns.txseg ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === (0L until 20L).filterNot(Set(0L, 15L)))

    // a second DV on the OTHER partition at a clashing position composes
    sql("CALL gdv.system.delete_where('ns.txseg', 'k = 5')") // pos 5 in seg a
    val rows2 = sql("SELECT k FROM gdv.ns.txseg ORDER BY k").collect().map(_.getLong(0))
    assert(rows2.toSeq === (0L until 20L).filterNot(Set(0L, 5L, 15L)))

    // materialization must not bake in any cross-filter loss
    sql("CALL gdv.system.rewrite_deletes('ns.txseg')")
    val rows3 = sql("SELECT k FROM gdv.ns.txseg ORDER BY k").collect().map(_.getLong(0))
    assert(rows3.toSeq === (0L until 20L).filterNot(Set(0L, 5L, 15L)))
  }

  test("SQL MERGE on update-mode=merge-on-read: vectors + appends, no segment rewritten") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.dm1")
    sql("""CREATE TABLE gdv.ns.dm1 (k BIGINT, tag STRING, amt BIGINT) USING parquet
            TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    fixture.grouped(10).foreach { g =>
      val vals = g.map { case (k, s, a) => s"($k, '$s', $a)" }.mkString(", ")
      sql(s"INSERT INTO gdv.ns.dm1 VALUES $vals")
    }
    val dir = tableDir("ns.dm1")
    val before = segState(dir)
    assert(before.size === 2)
    val snapBefore = GraftMeta.read(dir).current

    sql("""MERGE INTO gdv.ns.dm1 t
           USING (SELECT * FROM VALUES
             (1L, 'up', 111L), (11L, 'up', 211L),
             (30L, 'new', 300L), (5L, 'kill', 0L) AS s(k, tag, amt)) s
           ON t.k = s.k
           WHEN MATCHED AND s.tag = 'kill' THEN DELETE
           WHEN MATCHED THEN UPDATE SET amt = s.amt, tag = s.tag
           WHEN NOT MATCHED THEN INSERT (k, tag, amt) VALUES (s.k, s.tag, s.amt)""")

    // MERGE-ON-READ: every pre-existing segment byte-identical, a delete
    // vector on disk, exactly ONE new commit
    before.keys.foreach(s => assert(segState(dir)(s) === before(s),
      s"segment $s must not be rewritten by a merge-on-read MERGE"))
    assert(dvDirs(dir).nonEmpty)
    val metaAfter = GraftMeta.read(dir)
    assert(metaAfter.current === snapBefore + 1, "the MERGE is ONE commit")
    assert(metaAfter.dvs.getOrElse(metaAfter.current, Map.empty).nonEmpty)

    // content: k=1,11 updated; k=5 deleted; k=30 inserted; rest untouched
    val rows = sql("SELECT k, amt FROM gdv.ns.dm1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = (1L to 20L).filterNot(_ == 5L).map {
      case 1L  => (1L, 111L)
      case 11L => (11L, 211L)
      case k   => (k, k * 10)
    } :+ ((30L, 300L))
    assert(rows.toSeq === expected)

    // time travel sees the pre-MERGE state; CDC nets exact delete/insert pairs
    assert(sql(s"SELECT count(*) AS c FROM gdv.ns.dm1 VERSION AS OF $snapBefore")
      .collect().head.getLong(0) === 20L)
    val deltas = GraftCdc.rowDeltas(spark, "gdv", "ns.dm1", snapBefore, Some(metaAfter.current))
      .collect().map(r => (r.getLong(0), r.getString(3))).sorted
    assert(deltas.toSeq === Seq((1L, "delete"), (1L, "insert"), (5L, "delete"),
      (11L, "delete"), (11L, "insert"), (30L, "insert")))

    // a second MERGE composes on top of the vectors (hits a vectored segment
    // AND an appended segment); rewrite_deletes then materializes cleanly
    sql("""MERGE INTO gdv.ns.dm1 t
           USING (SELECT * FROM VALUES (1L, 'up2', 112L), (30L, 'up2', 302L)
             AS s(k, tag, amt)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET amt = s.amt, tag = s.tag""")
    val rows2 = sql("SELECT k, amt FROM gdv.ns.dm1 WHERE k IN (1, 30) ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows2.toSeq === Seq((1L, 112L), (30L, 302L)))
    sql("CALL gdv.system.rewrite_deletes('ns.dm1')")
    val rows3 = sql("SELECT k, amt FROM gdv.ns.dm1 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows3.toSeq === (expected.map {
      case (1L, _)  => (1L, 112L)
      case (30L, _) => (30L, 302L)
      case other    => other
    }))
    assert(sql("SELECT count(*) AS c FROM gdv.ns.dm1").collect().head.getLong(0) === 20L)
  }

  test("delta MERGE on a PARTITIONED MOR table: partition-pure appends, cross-partition update") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.dm2")
    sql("""CREATE TABLE gdv.ns.dm2 (k BIGINT, p STRING) USING parquet
            PARTITIONED BY (p)
            TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    import spark.implicits._
    (0L until 10L).map(k => (k, if (k < 5) "a" else "b")).toDF("k", "p")
      .coalesce(1).writeTo("gdv.ns.dm2").append()
    val dir = tableDir("ns.dm2")
    val before = segState(dir)

    // k=2 MOVES from partition a to b — the COW path refuses partition
    // reassignment; merge-on-read expresses it as vector + partition-pure
    // append, atomically
    sql("""MERGE INTO gdv.ns.dm2 t
           USING (SELECT * FROM VALUES (2L, 'b'), (77L, 'a') AS s(k, p)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET p = s.p
           WHEN NOT MATCHED THEN INSERT (k, p) VALUES (s.k, s.p)""")
    before.keys.foreach(s => assert(segState(dir)(s) === before(s)))
    val rows = sql("SELECT k, p FROM gdv.ns.dm2 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === (0L until 10L).map(k =>
      (k, if (k == 2L) "b" else if (k < 5) "a" else "b")) :+ ((77L, "a")))
    // every appended segment is partition-pure (suffix present), and
    // partition pruning still serves exact results through the vectors
    val metaAfter = GraftMeta.read(dir)
    metaAfter.snapshots(metaAfter.current).foreach(s =>
      assert(GraftPartitions.suffixOf(s).isDefined, s"segment $s must be partition-pure"))
    val aOnly = sql("SELECT k FROM gdv.ns.dm2 WHERE p = 'a' ORDER BY k")
      .collect().map(_.getLong(0))
    assert(aOnly.toSeq === Seq(0L, 1L, 3L, 4L, 77L))
  }

  test("delta MERGE is serializable: concurrent append between scan and commit fails it") {
    root
    sql("DROP TABLE IF EXISTS gdv.ns.dm3")
    sql("""CREATE TABLE gdv.ns.dm3 (k BIGINT, tag STRING, amt BIGINT) USING parquet
            TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    sql("INSERT INTO gdv.ns.dm3 VALUES (1, 'a', 10), (2, 'b', 20)")
    // insert-only merge still commits through the serializable path and
    // appends without a vector
    sql("""MERGE INTO gdv.ns.dm3 t
           USING (SELECT * FROM VALUES (9L, 'i', 90L) AS s(k, tag, amt)) s
           ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT (k, tag, amt) VALUES (s.k, s.tag, s.amt)""")
    val meta = GraftMeta.read(tableDir("ns.dm3"))
    assert(meta.dvs.getOrElse(meta.current, Map.empty).isEmpty,
      "insert-only merge must not publish a vector")
    assert(sql("SELECT count(*) AS c FROM gdv.ns.dm3").collect().head.getLong(0) === 3L)
  }

  test("meta round-trips the dv map through parse/render") {
    root
    mkMor("t12", fixture)
    sql("CALL gdv.system.delete_where('ns.t12', 'k = 1')")
    sql("CALL gdv.system.delete_where('ns.t12', 'k = 11')")
    val dir = tableDir("ns.t12")
    val meta = GraftMeta.read(dir)
    val cur = meta.dvs(meta.current)
    assert(cur.valuesIterator.flatten.toSeq.distinct.size === 2)
    assert(cur.keys.forall(s => meta.snapshots(meta.current).contains(s)))
    // render → parse identity via a fresh read (the CAS file round trip)
    assert(GraftMeta.read(dir).dvs === meta.dvs)
  }

  test("rewrite_deletes sizes output files by target bytes, not 1 file per suffix") {
    // ADVICE r12 (medium): a hardcoded 1 slot per suffix serialized a large
    // unpartitioned MOR rewrite into ONE task writing ONE unbounded file.
    // Slots must size like compact: ceil(dirty-group bytes / target).
    import spark.implicits._
    root
    sql("DROP TABLE IF EXISTS gdv.ns.t13")
    sql("""CREATE TABLE gdv.ns.t13 (k BIGINT, pad STRING) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    (1L to 5000L).map(k => (k, ("x" * 64) + k)).toDF("k", "pad")
      .coalesce(1).write.mode("append").saveAsTable("gdv.ns.t13")
    sql("CALL gdv.system.delete_where('ns.t13', 'k <= 10')")
    val dir = tableDir("ns.t13")
    val dirtyBytes = {
      val meta = GraftMeta.read(dir)
      meta.snapshots(meta.current).map(dir.resolve).flatMap(s =>
        GraftMeta.listDir(s).filter(_.getFileName.toString.endsWith(".parquet")))
        .map(Files.size).sum
    }
    assert(dirtyBytes > 16384, s"fixture too small: $dirtyBytes bytes")
    // target far below the dirty bytes -> multiple size-targeted files
    sql("CALL gdv.system.rewrite_deletes('ns.t13', 16384)").collect()
    val meta = GraftMeta.read(dir)
    val files = meta.snapshots(meta.current).map(dir.resolve).flatMap(s =>
      GraftMeta.listDir(s).filter(_.getFileName.toString.endsWith(".parquet")))
    assert(files.size >= 2,
      s"expected >=2 size-targeted files, got ${files.size} ($dirtyBytes dirty bytes, target 16384)")
    // rows intact minus the deleted prefix, vectors gone
    assert(sql("SELECT count(*) c FROM gdv.ns.t13").collect().head.getLong(0) === 4990L)
    assert(meta.dvs.getOrElse(meta.current, Map.empty).isEmpty)
    // default target still applies when omitted (back-compat call shape)
    sql("CALL gdv.system.delete_where('ns.t13', 'k = 11')")
    sql("CALL gdv.system.rewrite_deletes('ns.t13')").collect()
    assert(sql("SELECT count(*) c FROM gdv.ns.t13").collect().head.getLong(0) === 4989L)
  }
}
