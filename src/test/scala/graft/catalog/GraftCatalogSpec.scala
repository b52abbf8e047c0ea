package graft.catalog

import scala.collection.JavaConverters._

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, count, lit, max, min}

/** End-to-end pins for the graft snapshot catalog: DDL, append, full-table
  * overwrite, copy-on-write MERGE/UPDATE/DELETE, and VERSION AS OF time
  * travel. Fixtures are tiny and fully enumerated so every expectation is a
  * hand-checkable ground truth. */
class GraftCatalogSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_cat_spec")
    spark.conf.set("spark.sql.catalog.gtest", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gtest.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("create + insert + read back") {
    root // force catalog registration
    sql("DROP TABLE IF EXISTS gtest.ns.t1")
    sql("CREATE TABLE gtest.ns.t1 (k BIGINT, v STRING) USING parquet")
    sql("INSERT INTO gtest.ns.t1 VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO gtest.ns.t1 VALUES (3, 'c')")
    val rows = sql("SELECT k, v FROM gtest.ns.t1 ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("CTAS + INSERT OVERWRITE replaces the snapshot") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t2")
    sql("CREATE TABLE gtest.ns.t2 AS SELECT * FROM VALUES (1L, 10L), (2L, 20L) AS v(k, x)")
    sql("INSERT OVERWRITE gtest.ns.t2 SELECT * FROM VALUES (7L, 70L) AS v(k, x)")
    val rows = sql("SELECT k, x FROM gtest.ns.t2 ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 70L)))
  }

  test("MERGE INTO: delete + update + insert in one statement") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t3")
    sql("""CREATE TABLE gtest.ns.t3 AS
           SELECT * FROM VALUES (1L, 'keep', 100L), (2L, 'upd', 200L),
                                (3L, 'del', 300L) AS v(k, tag, amt)""")
    sql("""MERGE INTO gtest.ns.t3 t
           USING (SELECT * FROM VALUES (2L, 'upd2', 999L), (3L, 'x', 0L),
                                       (4L, 'new', 400L) AS s(k, tag, amt)) s
           ON t.k = s.k
           WHEN MATCHED AND t.tag = 'del' THEN DELETE
           WHEN MATCHED THEN UPDATE SET tag = s.tag, amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, tag, amt) VALUES (s.k, s.tag, s.amt)""")
    val rows = sql("SELECT k, tag, amt FROM gtest.ns.t3 ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq((1L, "keep", 100L), (2L, "upd2", 999L), (4L, "new", 400L)))
  }

  test("UPDATE and DELETE rewrite as copy-on-write snapshots") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t4")
    sql("""CREATE TABLE gtest.ns.t4 AS
           SELECT * FROM VALUES (1L, 5L), (2L, 6L), (3L, 7L) AS v(k, x)""")
    sql("DELETE FROM gtest.ns.t4 WHERE k = 2")
    sql("UPDATE gtest.ns.t4 SET x = x * 10 WHERE k = 3")
    val rows = sql("SELECT k, x FROM gtest.ns.t4 ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 5L), (3L, 70L)))
  }

  test("VERSION AS OF pins an old snapshot; snapshot read option agrees") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t5")
    sql("CREATE TABLE gtest.ns.t5 AS SELECT * FROM VALUES (1L) AS v(k)") // snap 1
    sql("INSERT INTO gtest.ns.t5 VALUES (2L)") // snap 2
    sql("DELETE FROM gtest.ns.t5 WHERE k = 1") // snap 3 (replace)
    assert(sql("SELECT count(*) FROM gtest.ns.t5").head.getLong(0) === 1L)
    assert(sql("SELECT count(*) FROM gtest.ns.t5 VERSION AS OF 2").head.getLong(0) === 2L)
    assert(sql("SELECT count(*) FROM gtest.ns.t5 VERSION AS OF 1").head.getLong(0) === 1L)
    assert(sql("SELECT k FROM gtest.ns.t5 VERSION AS OF 1").head.getLong(0) === 1L)
    val viaOption = spark.read.option("snapshot", "2")
      .table("gtest.ns.t5").count()
    assert(viaOption === 2L)
  }

  test("scan delegation keeps parquet filter pushdown on catalog tables") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t6")
    sql("CREATE TABLE gtest.ns.t6 AS SELECT id AS k, id % 10 AS m FROM range(1000)")
    val df = sql("SELECT k FROM gtest.ns.t6 WHERE k > 990")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters: [IsNotNull(k), GreaterThan(k,990)]"),
      s"expected pushed filters in:\n$scan")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq === (991L to 999L))
  }

  private def segmentDirs(table: String): Seq[java.nio.file.Path] = {
    val dir = root.resolve("ns").resolve(table)
    java.nio.file.Files.list(dir).iterator().asScala
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("seg-")).toSeq
  }

  test("CALL system.compact rewrites small segments into one, preserving history") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t7")
    sql("CREATE TABLE gtest.ns.t7 AS SELECT id AS k FROM range(0, 100)")   // snap 1
    sql("INSERT INTO gtest.ns.t7 SELECT id FROM range(100, 200)")          // snap 2
    sql("INSERT INTO gtest.ns.t7 SELECT id FROM range(200, 300)")          // snap 3
    val before = segmentDirs("t7").size
    assert(before === 3, s"expected 3 segments before compaction, saw $before")
    val summary = sql("CALL gtest.system.compact('ns.t7', 134217728)").collect()
    assert(summary.length === 1)
    assert(summary(0).getInt(0) === 3, "segments_before")
    assert(summary(0).getInt(2) === 1, "files_after: everything fits one target file")
    // data identical, snapshot advanced, history intact
    assert(sql("SELECT COUNT(*), SUM(k) FROM gtest.ns.t7").head ===
      sql("SELECT 300L, SUM(id) FROM range(300)").head)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t7 VERSION AS OF 2").head.getLong(0) === 200L)
    // old segments remain on disk until expiry (time travel needs them)
    assert(segmentDirs("t7").size === 4)
  }

  test("multi-partition compact is ONE write job with byte-identical per-partition layout") {
    // the r11 scale seam: the old rewrite collected partition values and
    // drove one filtered write job per partition — a 10k-partition compact
    // was 10k sequential jobs. The unified path (GraftDml.rewriteGroupsOneJob)
    // routes every row to its source group's suffix inside ONE distributed
    // job; this pin counts jobs so a per-partition loop can never return.
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t40")
    sql("""CREATE TABLE gtest.ns.t40 (k BIGINT, p STRING, v BIGINT)
           USING parquet PARTITIONED BY (p)""")
    spark.range(0, 600).selectExpr("id AS k", "concat('p', id % 6) AS p", "id AS v")
      .writeTo("gtest.ns.t40").append()
    spark.range(600, 1200).selectExpr("id AS k", "concat('p', id % 6) AS p", "id AS v")
      .writeTo("gtest.ns.t40").append()
    val dir = root.resolve("ns").resolve("t40")
    val before = GraftMeta.read(dir)
    val beforeSegs = before.snapshots(before.current)
    assert(beforeSegs.size === 12, s"2 appends x 6 partitions: $beforeSegs")
    val suffixesBefore = beforeSegs.flatMap(GraftPartitions.suffixOf).toSet
    val contentBefore = sql(
      "SELECT p, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s FROM gtest.ns.t40 GROUP BY p ORDER BY p")
      .collect().toSeq

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      sql("CALL gtest.system.compact('ns.t40')")
      // listener delivery is async — poll until the count stops moving
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(100)
        val c = jobs.get()
        if (c == last) stable += 1 else { stable = 0; last = c }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // one distributed write (AQE materializes its shuffle as a stage job) +
    // scan-side small jobs; NEVER one per partition — 6 partitions must not
    // mean >= 6 write jobs
    assert(jobs.get() <= 4,
      s"compact of 6 partitions ran ${jobs.get()} Spark jobs — per-partition loop regression?")

    val after = GraftMeta.read(dir)
    val afterSegs = after.snapshots(after.current)
    assert(afterSegs.size === 6, s"one rewritten segment per partition: $afterSegs")
    assert(afterSegs.flatMap(GraftPartitions.suffixOf).toSet === suffixesBefore,
      "per-partition suffixes byte-identical across the rewrite")
    // partition purity: each rewritten segment holds exactly its own p value
    afterSegs.foreach { seg =>
      val sfx = GraftPartitions.suffixOf(seg).get
      val vals = spark.read.parquet(dir.resolve(seg).toString)
        .select("p").distinct().collect().map(_.getString(0)).toSeq
      assert(vals.size === 1 && GraftPartitions.encodeTuple(Seq(vals.head)) === sfx,
        s"segment $seg is not partition-pure: $vals")
    }
    val contentAfter = sql(
      "SELECT p, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s FROM gtest.ns.t40 GROUP BY p ORDER BY p")
      .collect().toSeq
    assert(contentAfter === contentBefore, "per-partition content identical")
  }

  test("compact handles map-typed columns (unhashable types drop out of the slot salt)") {
    // Spark's hash() rejects MapType — the rewrite salt must skip map columns
    // rather than crash the whole compaction
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t42")
    sql("CREATE TABLE gtest.ns.t42 (k BIGINT, m MAP<STRING, BIGINT>) USING parquet")
    sql("INSERT INTO gtest.ns.t42 SELECT id, map('a', id) FROM range(0, 50)")
    sql("INSERT INTO gtest.ns.t42 SELECT id, map('b', id) FROM range(50, 100)")
    sql("CALL gtest.system.compact('ns.t42')")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t42").head.getLong(0) === 100L)
    assert(sql("SELECT CAST(SUM(element_at(m, 'a')) AS BIGINT) FROM gtest.ns.t42")
      .head.getLong(0) === (0L until 50L).sum)
    val meta = GraftMeta.read(root.resolve("ns").resolve("t42"))
    assert(meta.snapshots(meta.current).size === 1)
  }

  test("expire_snapshots older_than_ms: young snapshots survive keep_last; old ones expire") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t41")
    sql("CREATE TABLE gtest.ns.t41 AS SELECT id AS k FROM range(0, 10)")    // snap 1
    sql("INSERT INTO gtest.ns.t41 SELECT id FROM range(10, 20)")            // snap 2
    sql("INSERT INTO gtest.ns.t41 SELECT id FROM range(20, 30)")            // snap 3
    val dir = root.resolve("ns").resolve("t41")
    // every snapshot is young: with a 1h age horizon, keep_last=1 must
    // remove NOTHING (age protection is strictly more conservative)
    val r1 = sql("CALL gtest.system.expire_snapshots('ns.t41', 1, false, 0, " +
      3600L * 1000 + ")").collect()(0)
    assert(r1.getInt(0) === 0, "all snapshots inside the age horizon must survive")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t41 VERSION AS OF 2").head.getLong(0) === 20L)
    // age the two non-current snapshots past the horizon; they now expire
    GraftMeta.mutate(dir) { meta =>
      val aged = meta.snapshotTimes.map { case (id, t) =>
        id -> (if (id < meta.current) t - 2 * 3600L * 1000 else t)
      }
      meta.copy(snapshotTimes = aged)
    }
    val r2 = sql("CALL gtest.system.expire_snapshots('ns.t41', 1, false, 0, " +
      3600L * 1000 + ")").collect()(0)
    assert(r2.getInt(0) >= 2, s"aged snapshots beyond keep_last must expire: $r2")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t41").head.getLong(0) === 30L)
    intercept[Exception](sql("SELECT * FROM gtest.ns.t41 VERSION AS OF 2").collect())
    // default (-1) keeps the original keep_last-only behavior: nothing left to drop
    val r3 = sql("CALL gtest.system.expire_snapshots('ns.t41', 1)").collect()(0)
    assert(r3.getInt(0) === 0)
  }

  test("CALL system.expire_snapshots deletes unreferenced segments and old versions") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t8")
    sql("CREATE TABLE gtest.ns.t8 AS SELECT id AS k FROM range(0, 10)")    // snap 1
    sql("INSERT INTO gtest.ns.t8 SELECT id FROM range(10, 20)")            // snap 2
    sql("CALL gtest.system.compact('ns.t8', 134217728)")                   // snap 3
    val summary = sql("CALL gtest.system.expire_snapshots('ns.t8', 1)").collect()
    assert(summary.length === 1)
    assert(summary(0).getInt(0) >= 3, "snapshots_removed (0,1,2 at least)")
    assert(summary(0).getInt(2) === 2, "segments_deleted: the two pre-compaction segments")
    assert(segmentDirs("t8").size === 1, "only the compacted segment survives")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t8").head.getLong(0) === 20L)
    val err = intercept[Exception] { sql("SELECT * FROM gtest.ns.t8 VERSION AS OF 2").collect() }
    assert(err.getMessage.contains("no snapshot"), s"expired version must fail: ${err.getMessage}")
  }

  test("ALTER TABLE ADD/DROP COLUMN: metadata-only evolution, old rows null-fill") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t9")
    sql("CREATE TABLE gtest.ns.t9 AS SELECT * FROM VALUES (1L, 'a'), (2L, 'b') AS v(k, tag)")
    sql("ALTER TABLE gtest.ns.t9 ADD COLUMNS (score BIGINT)")
    // old segment has no 'score' column in its footer: reads as NULL
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t9 WHERE score IS NULL").head.getLong(0) === 2L)
    sql("INSERT INTO gtest.ns.t9 VALUES (3L, 'c', 30L)")
    val rows = sql("SELECT k, tag, score FROM gtest.ns.t9 ORDER BY k").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq ===
      Seq((1L, "a", -1L), (2L, "b", -1L), (3L, "c", 30L)))
    sql("ALTER TABLE gtest.ns.t9 DROP COLUMN tag")
    val after = sql("SELECT * FROM gtest.ns.t9 ORDER BY k").collect()
    assert(after.head.schema.fieldNames.toSeq === Seq("k", "score"))
    // renames ride stable field ids since round 14 (RenameColumnSpec pins
    // the full contract); the DDL that used to refuse now works end to end
    sql("ALTER TABLE gtest.ns.t9 RENAME COLUMN score TO s2")
    assert(sql("SELECT s2 FROM gtest.ns.t9 WHERE k = 3").head.getLong(0) === 30L)
  }

  test("named segments make appends idempotent (exactly-once replay contract)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t10")
    sql("CREATE TABLE gtest.ns.t10 (k BIGINT) USING parquet")
    val batch = spark.range(10).toDF("k")
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t10", "w1")(batch, 0L)
    // replay of the same epoch: rows discarded, no new snapshot
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t10", "w1")(batch, 0L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t10").head.getLong(0) === 10L)
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t10", "w1")(batch, 1L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t10").head.getLong(0) === 20L)
    assert(segmentDirs("t10").size === 2, "one segment per distinct batch id")
    // a SECOND writer restarts batch ids from 0 — the writer id in the
    // segment name keeps its epoch distinct instead of silently discarding it
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t10", "w2")(batch, 0L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t10").head.getLong(0) === 30L,
      "distinct writers must not collide on equal batch ids")
  }

  test("replayed epochs stay no-ops across compaction and expiry (durable registry)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t29")
    sql("CREATE TABLE gtest.ns.t29 (k BIGINT) USING parquet")
    val batch = spark.range(10).toDF("k")
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t29", "w1")(batch, 0L)
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t29", "w1")(batch, 1L)
    // maintenance folds the named segments away and deletes their dirs: the
    // old inference ("is the segment in a retained snapshot?") now says no
    sql("CALL gtest.system.compact('ns.t29', 134217728)")
    sql("CALL gtest.system.expire_snapshots('ns.t29', 1)")
    assert(segmentDirs("t29").size === 1, "only the compacted segment remains")
    // a replayed epoch after maintenance must STILL be discarded — the
    // committed-batch registry in the meta file survives segment deletion
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t29", "w1")(batch, 0L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t29").head.getLong(0) === 20L,
      "replay after compaction+expiry must not duplicate rows")
  }

  test("meta commits are cross-process safe: a stale CAS loses, nothing is lost") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t28")
    sql("CREATE TABLE gtest.ns.t28 (k BIGINT) USING parquet")
    spark.range(5).toDF("k").writeTo("gtest.ns.t28").append()
    val dir = root.resolve("ns").resolve("t28")
    val (m, v) = GraftMeta.readVersioned(dir)
    // an "external process" publishes version v+1 (re-publishing the same
    // segment list as a new snapshot — content-neutral, so reads stay valid)
    val external = m.copy(current = m.current + 1,
      snapshots = m.snapshots + ((m.current + 1) -> m.snapshots(m.current)))
    assert(GraftMeta.casWrite(dir, external, v), "external writer claims v+1")
    // our stale write must LOSE: the claim is create-exclusive (hard link),
    // not last-writer-wins like a plain meta-file swap was
    assert(!GraftMeta.casWrite(dir, m.copy(current = m.current + 1), v),
      "a second claim of the same version must fail atomically")
    // the normal commit path re-reads and lands ON TOP of the winner
    spark.range(5, 10).toDF("k").writeTo("gtest.ns.t28").append()
    val (after, _) = GraftMeta.readVersioned(dir)
    assert(after.current === m.current + 2, "append must build on the external commit")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t28").head.getLong(0) === 10L)
  }

  test("expire_snapshots: dry_run reports reclaimable bytes, live run sweeps orphans") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t30")
    sql("CREATE TABLE gtest.ns.t30 AS SELECT id AS k FROM range(0, 10)")   // snap 1
    sql("INSERT INTO gtest.ns.t30 SELECT id FROM range(10, 20)")           // snap 2
    sql("CALL gtest.system.compact('ns.t30', 134217728)")                  // snap 3
    val dir = root.resolve("ns").resolve("t30")
    // plant an orphan: a fully-written segment dir no snapshot references
    // (what a lost optimistic commit used to leak before cleanup existed)
    val orphan = dir.resolve("seg-orphaned0000")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("part-0.parquet"), Array.fill(128)(7.toByte))

    val dry = sql("CALL gtest.system.expire_snapshots('ns.t30', 1, true, 0)").collect()(0)
    assert(dry.getInt(0) >= 1, "dry run: snapshots that would be removed")
    assert(dry.getInt(2) === 2, "dry run: both pre-compaction segments would die")
    assert(dry.getInt(3) === 1, "dry run: the planted orphan is visible")
    assert(dry.getLong(4) >= 128L, "dry run: reclaimable bytes cover the orphan")
    assert(java.nio.file.Files.exists(orphan), "dry run must not delete")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t30 VERSION AS OF 1").head.getLong(0) === 10L,
      "dry run must not expire history")

    val live = sql("CALL gtest.system.expire_snapshots('ns.t30', 1, false, 0)").collect()(0)
    assert(live.getInt(2) === 2 && live.getInt(3) === 1)
    assert(live.getLong(4) >= dry.getLong(4), "live reclaims at least the dry estimate")
    assert(!java.nio.file.Files.exists(orphan), "live run sweeps the orphan")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t30").head.getLong(0) === 20L)
    // superseded full-state commit files are GC'd down to the newest
    val cd = dir.resolve(GraftMeta.CommitsDir)
    val left = java.nio.file.Files.list(cd).iterator().asScala
      .flatMap(p => scala.util.Try(p.getFileName.toString.toLong).toOption).toSeq
    assert(left.size === 1, s"commit-file GC must keep exactly the newest, left $left")
  }

  test("foreachBatch streaming ingestion lands each micro-batch as one snapshot") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t11")
    sql("CREATE TABLE gtest.ns.t11 (v BIGINT) USING parquet")
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ingest_ckpt").toString
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    def runAvailable(): Unit = {
      val q = source.toDF().toDF("v").writeStream
        .foreachBatch(graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t11", "ing") _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    source.addData(1L, 2L, 3L)
    runAvailable()
    // restart from the same checkpoint: batch ids continue, earlier segments stand
    source.addData(4L, 5L)
    runAvailable()
    assert(sql("SELECT CAST(SUM(v) AS BIGINT) FROM gtest.ns.t11").head.getLong(0) === 15L)
  }

  test("concurrent appends serialize on the table lock: no lost commits") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t12")
    sql("CREATE TABLE gtest.ns.t12 (k BIGINT) USING parquet")
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 3).foreach { i =>
        spark.range(t * 100 + i * 10, t * 100 + i * 10 + 5).toDF("k")
          .writeTo("gtest.ns.t12").append()
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t12").head.getLong(0) === 60L,
      "4 threads x 3 appends x 5 rows")
    assert(segmentDirs("t12").size === 12, "every commit kept its own segment")
  }

  test("write.order-by: every writer sorts rows before parquet (per-file sortedness)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t14")
    sql("""CREATE TABLE gtest.ns.t14 (k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('write.order-by'='k')""")
    // deliberately unsorted, multi-partition input
    spark.range(1000).selectExpr("(id * 997) % 1000 AS k", "id AS v")
      .repartition(4).writeTo("gtest.ns.t14").append()
    val files = segmentDirs("t14").flatMap(seg =>
      java.nio.file.Files.list(seg).iterator().asScala
        .filter(_.toString.endsWith(".parquet")))
    assert(files.nonEmpty)
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"file $f not sorted by k")
    }
  }

  test("write.cluster-by: equal keys land in one output file") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t15")
    sql("""CREATE TABLE gtest.ns.t15 (k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('write.cluster-by'='k')""")
    spark.range(2000).selectExpr("id % 8 AS k", "id AS v")
      .repartition(5).writeTo("gtest.ns.t15").append()
    val files = segmentDirs("t15").flatMap(seg =>
      java.nio.file.Files.list(seg).iterator().asScala
        .filter(_.toString.endsWith(".parquet")))
    val keyToFiles = files.flatMap { f =>
      spark.read.parquet(f.toString).select("k").distinct().collect()
        .map(r => r.getLong(0) -> f.toString)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size)
    keyToFiles.foreach { case (k, n) =>
      assert(n === 1, s"key $k spread across $n files — clustering not applied")
    }
    // rejected at CREATE time: property naming a column the schema lacks
    val err = intercept[Exception] {
      sql("""CREATE TABLE gtest.ns.t15bad (k BIGINT) USING parquet
             TBLPROPERTIES ('write.cluster-by'='nope')""")
    }
    assert(err.getMessage.contains("unknown column"))
  }

  test("small catalog tables broadcast in joins (scan reports statistics)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t16")
    sql("CREATE TABLE gtest.ns.t16 AS SELECT id AS k, id * 2 AS w FROM range(50)")
    val big = spark.range(100000).selectExpr("id % 50 AS k", "id AS x")
    val joined = big.join(spark.table("gtest.ns.t16"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the 50-row catalog table to broadcast:\n${plan.take(800)}")
    assert(joined.count() === 100000L)
  }

  test("scan statistics drive STATIC broadcast planning (no AQE rescue)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t16b")
    sql("CREATE TABLE gtest.ns.t16b AS SELECT id AS k, id * 2 AS w FROM range(50)")
    // AQE off: only compile-time statistics can pick the broadcast join. The
    // GraftStreamableScan wrapper must forward SupportsReportStatistics or
    // DataSourceV2Relation falls back to defaultSizeInBytes (= never small
    // enough) and this plans a sort-merge join.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val big = spark.range(100000).selectExpr("id % 50 AS k", "id AS x")
      val joined = big.join(spark.table("gtest.ns.t16b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && !plan.contains("SortMergeJoin"),
        s"expected a statically-planned broadcast:\n${plan.take(800)}")
      assert(joined.count() === 100000L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("expire_snapshots sweeps aged casWrite .tmp residue from _graft_commits") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t30b")
    sql("CREATE TABLE gtest.ns.t30b AS SELECT id AS k FROM range(0, 5)")
    sql("INSERT INTO gtest.ns.t30b SELECT id FROM range(5, 10)")
    val cd = root.resolve("ns").resolve("t30b").resolve(GraftMeta.CommitsDir)
    // plant what a crash between Files.write(tmp) and createLink leaves behind
    val freshTmp = cd.resolve(".tmp.planted-fresh")
    val agedTmp = cd.resolve(".tmp.planted-aged")
    java.nio.file.Files.write(freshTmp, Array[Byte](1))
    java.nio.file.Files.write(agedTmp, Array[Byte](1))
    java.nio.file.Files.setLastModifiedTime(agedTmp,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - 48L * 3600 * 1000))
    sql("CALL gtest.system.expire_snapshots('ns.t30b', 1, false, " + (3600L * 1000) + ")")
    assert(!java.nio.file.Files.exists(agedTmp),
      "a tmp file older than the retention horizon must be GC'd")
    assert(java.nio.file.Files.exists(freshTmp),
      "a tmp file inside the horizon may be a LIVE casWrite in flight — keep it")
    java.nio.file.Files.deleteIfExists(freshTmp)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t30b").head.getLong(0) === 10L)
  }

  test("casWrite refuses to publish into a vanished (renamed/dropped) table dir") {
    root
    val ghost = java.nio.file.Files.createTempDirectory("graft_ghost")
    // no _graft_meta mirror: exactly what a commit racing renameTable sees
    // after the directory moved away — it must NOT recreate the dir and
    // publish a commit nothing will ever read
    val err = intercept[IllegalStateException] {
      GraftMeta.casWrite(ghost.resolve("gone"),
        GraftMeta(schema = new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType),
          current = 1L, snapshots = Map(1L -> Nil)), 0L)
    }
    assert(err.getMessage.contains("vanished"))
    assert(!java.nio.file.Files.exists(ghost.resolve("gone").resolve(GraftMeta.CommitsDir)),
      "the refused commit must not have resurrected the commits dir")
  }

  test("CALL system.delete_where rewrites only segments holding matching rows") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t17")
    sql("CREATE TABLE gtest.ns.t17 (k BIGINT) USING parquet")
    spark.range(0, 100).toDF("k").writeTo("gtest.ns.t17").append()
    spark.range(100, 200).toDF("k").writeTo("gtest.ns.t17").append()
    spark.range(200, 300).toDF("k").writeTo("gtest.ns.t17").append()
    val untouchedBefore = segmentDirs("t17").map(d =>
      d.getFileName.toString -> java.nio.file.Files.list(d).iterator().asScala
        .map(f => f.getFileName.toString -> java.nio.file.Files.getLastModifiedTime(f))
        .toMap).toMap
    val summary = sql("CALL gtest.system.delete_where('ns.t17', 'k >= 250 AND k % 2 = 0')").collect()
    assert(summary(0).getInt(0) === 3, "segments_total")
    assert(summary(0).getInt(1) === 1, "only the [200,300) segment holds matches")
    assert(summary(0).getLong(2) === 25L, "250..298 evens")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t17").head.getLong(0) === 275L)
    assert(sql("SELECT CAST(SUM(k) AS BIGINT) FROM gtest.ns.t17").head.getLong(0) ===
      (0L until 300L).filterNot(k => k >= 250 && k % 2 == 0).sum)
    // the two untouched segments carried over by reference: same files, same mtimes
    val metaDirs = sql("SELECT COUNT(*) FROM gtest.ns.t17 VERSION AS OF 3").head.getLong(0)
    assert(metaDirs === 300L, "pre-delete snapshot intact")
    val after = segmentDirs("t17").map(d => d.getFileName.toString -> d).toMap
    val carried = untouchedBefore.filter { case (name, _) => after.contains(name) }
    assert(carried.size >= 2, "untouched segments still on disk")
    carried.foreach { case (name, files) =>
      files.foreach { case (f, mtime) =>
        val now = java.nio.file.Files.getLastModifiedTime(after(name).resolve(f))
        assert(now === mtime, s"untouched segment $name file $f was rewritten")
      }
    }
    // matching nothing is a metadata no-op: no new snapshot
    val before = sql("CALL gtest.system.delete_where('ns.t17', 'k < 0')").collect()
    assert(before(0).getInt(1) === 0)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t17").head.getLong(0) === 275L)
    // SQL NULL semantics: predicate NULL keeps the row (DELETE removes TRUE only)
    sql("ALTER TABLE gtest.ns.t17 ADD COLUMNS (tag STRING)")
    sql("CALL gtest.system.delete_where('ns.t17', 'tag = \\'x\\'')")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t17").head.getLong(0) === 275L,
      "NULL-tag rows must survive a tag = 'x' delete")
  }

  private def plannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.scan.toBatch.planInputPartitions().toSeq.flatMap {
          case f: org.apache.spark.sql.execution.datasources.FilePartition =>
            f.files.map(_.filePath.toString)
          case _ => Nil
        }
    }.flatten

  test("zone maps prune whole segments at plan time from committed min/max stats") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t18")
    sql("CREATE TABLE gtest.ns.t18 (k BIGINT, tag STRING) USING parquet")
    spark.range(0, 100).selectExpr("id AS k", "'alpha' AS tag")
      .writeTo("gtest.ns.t18").append()
    spark.range(100, 200).selectExpr("id AS k", "'beta' AS tag")
      .writeTo("gtest.ns.t18").append()
    spark.range(200, 300).selectExpr("id AS k", "'gamma' AS tag")
      .writeTo("gtest.ns.t18").append()

    // integral range: only the [200,300) segment can hold k >= 250
    val hi = sql("SELECT k FROM gtest.ns.t18 WHERE k >= 250")
    val hiFiles = plannedFiles(hi)
    assert(hiFiles.nonEmpty)
    val hiSegs = hiFiles.map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString).distinct
    assert(hiSegs.size === 1, s"expected one surviving segment, saw $hiSegs")
    assert(hi.count() === 50L)

    // point lookup lands in the first segment only
    val pt = sql("SELECT k FROM gtest.ns.t18 WHERE k = 50")
    assert(plannedFiles(pt).map(f =>
      java.nio.file.Paths.get(f).getParent.getFileName.toString).distinct.size === 1)
    assert(pt.count() === 1L)

    // string bounds prune too (ASCII-comparable)
    val st = sql("SELECT k FROM gtest.ns.t18 WHERE tag = 'gamma'")
    assert(plannedFiles(st).map(f =>
      java.nio.file.Paths.get(f).getParent.getFileName.toString).distinct.size === 1)
    assert(st.count() === 100L)

    // no nulls anywhere: IS NULL plans zero files yet stays correct
    val nn = sql("SELECT k FROM gtest.ns.t18 WHERE k IS NULL")
    assert(plannedFiles(nn).isEmpty, "null-free segments must all prune")
    assert(nn.count() === 0L)

    // a predicate every segment can satisfy prunes nothing
    val all = sql("SELECT k FROM gtest.ns.t18 WHERE k >= 0")
    assert(plannedFiles(all).map(f =>
      java.nio.file.Paths.get(f).getParent.getFileName.toString).distinct.size === 3)
    assert(all.count() === 300L)
  }

  test("SQL DELETE FROM routes through the segment-level path when translatable") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t19")
    sql("CREATE TABLE gtest.ns.t19 (k BIGINT) USING parquet")
    spark.range(0, 100).toDF("k").writeTo("gtest.ns.t19").append()
    spark.range(100, 200).toDF("k").writeTo("gtest.ns.t19").append()
    val untouched = segmentDirs("t19").map(d =>
      d -> java.nio.file.Files.list(d).iterator().asScala
        .map(f => f -> java.nio.file.Files.getLastModifiedTime(f)).toMap).toMap
    sql("DELETE FROM gtest.ns.t19 WHERE k >= 150")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t19").head.getLong(0) === 150L)
    // the [0,100) segment was never rewritten: same files, same mtimes — the
    // whole-table group rewrite would have replaced it
    val lowSeg = untouched.keys.find { d =>
      spark.read.parquet(d.toString).agg(org.apache.spark.sql.functions.max("k"))
        .head.getLong(0) < 100
    }.get
    untouched(lowSeg).foreach { case (f, mtime) =>
      assert(java.nio.file.Files.getLastModifiedTime(f) === mtime,
        s"untouched segment file $f was rewritten by DELETE")
    }
    // unconditional DELETE: metadata-only empty snapshot, history intact
    sql("DELETE FROM gtest.ns.t19")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t19").head.getLong(0) === 0L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t19 VERSION AS OF 3").head.getLong(0) === 150L)
  }

  test("metadata tables: .snapshots and .segments introspect without a data scan") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t20")
    sql("CREATE TABLE gtest.ns.t20 AS SELECT id AS k FROM range(10)")   // snap 1
    sql("INSERT INTO gtest.ns.t20 SELECT id FROM range(10, 30)")        // snap 2
    sql("DELETE FROM gtest.ns.t20 WHERE k >= 25")                       // snap 3
    val snaps = sql("SELECT * FROM gtest.ns.t20.snapshots ORDER BY snapshot_id").collect()
    assert(snaps.map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2))).toSeq ===
      Seq((0L, false, 0), (1L, false, 1), (2L, false, 2), (3L, true, 2)))
    // n_rows from zone-map stats, no data scan: 10, 30, then 25 after the delete
    assert(snaps.map(r => if (r.isNullAt(3)) -1L else r.getLong(3)).toSeq ===
      Seq(0L, 10L, 30L, 25L))
    val segs = sql("SELECT * FROM gtest.ns.t20.segments ORDER BY segment").collect()
    assert(segs.length === 3, "two appended + one rewritten segment on disk")
    assert(segs.count(_.getBoolean(1)) === 2, "current snapshot holds two segments")
    assert(segs.forall(r => r.getInt(2) >= 1 && r.getLong(3) > 0L))
    // the metadata scan plans locally — no file source in the plan
    val plan = sql("SELECT * FROM gtest.ns.t20.snapshots").queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"), s"expected LocalTableScan:\n$plan")
  }

  test("CALL system.update_where: pre-update RHS values, untouched segments by reference") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t23")
    sql("CREATE TABLE gtest.ns.t23 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    spark.range(0, 10).selectExpr("id AS k", "id * 10 AS a", "id * 100 AS b")
      .writeTo("gtest.ns.t23").append()
    spark.range(10, 20).selectExpr("id AS k", "id * 10 AS a", "id * 100 AS b")
      .writeTo("gtest.ns.t23").append()
    val untouched = segmentDirs("t23").map(d =>
      d -> java.nio.file.Files.list(d).iterator().asScala
        .map(f => f -> java.nio.file.Files.getLastModifiedTime(f)).toMap).toMap
    // swap-read: both RHS must see pre-update values
    val summary = sql(
      "CALL gtest.system.update_where('ns.t23', 'k >= 15', 'a = b, b = a')").collect()
    assert(summary(0).getInt(0) === 2 && summary(0).getInt(1) === 1)
    assert(summary(0).getLong(2) === 5L)
    val r17 = sql("SELECT a, b FROM gtest.ns.t23 WHERE k = 17").head
    assert((r17.getLong(0), r17.getLong(1)) === (1700L, 170L), "RHS saw post-update values")
    val r5 = sql("SELECT a, b FROM gtest.ns.t23 WHERE k = 5").head
    assert((r5.getLong(0), r5.getLong(1)) === (50L, 500L), "non-matching row changed")
    // the [0,10) segment was never rewritten
    val lowSeg = untouched.keys.find { d =>
      spark.read.parquet(d.toString).agg(org.apache.spark.sql.functions.max("k"))
        .head.getLong(0) < 10
    }.get
    untouched(lowSeg).foreach { case (f, mtime) =>
      assert(java.nio.file.Files.getLastModifiedTime(f) === mtime,
        s"untouched segment file $f was rewritten by update_where")
    }
    // NULL predicate rows pass through unchanged (SQL UPDATE semantics)
    sql("ALTER TABLE gtest.ns.t23 ADD COLUMNS (tag STRING)")
    sql("CALL gtest.system.update_where('ns.t23', 'tag = \\'x\\'', 'a = 0')")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t23 WHERE a = 0").head.getLong(0) === 1L,
      "only k=0 (a already 0) may have a = 0; NULL-tag rows must not update")
  }

  test("ALTER TABLE guards: layout columns cannot drop, dropped names cannot return") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t21")
    sql("""CREATE TABLE gtest.ns.t21 (k BIGINT, v BIGINT, w STRING) USING parquet
           TBLPROPERTIES ('write.order-by'='v')""")
    // dropping the ordering column would brick every future write
    val e1 = intercept[Exception] { sql("ALTER TABLE gtest.ns.t21 DROP COLUMN v") }
    assert(e1.getMessage.contains("write-layout"))
    sql("INSERT INTO gtest.ns.t21 VALUES (1, 2, 'x')")
    sql("ALTER TABLE gtest.ns.t21 DROP COLUMN w")
    // re-adding a dropped name would be an unguarded type change over the old
    // segment's physical column
    val e2 = intercept[Exception] { sql("ALTER TABLE gtest.ns.t21 ADD COLUMNS (w BIGINT)") }
    assert(e2.getMessage.contains("previously dropped"))
    sql("INSERT INTO gtest.ns.t21 VALUES (3, 4)")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t21").head.getLong(0) === 2L)
  }

  test("replace commits refuse a base that moved (lost-update guard)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t22")
    sql("CREATE TABLE gtest.ns.t22 AS SELECT id AS k FROM range(10)")
    val dir = root.resolve("ns").resolve("t22")
    val base = GraftMeta.read(dir).current
    sql("INSERT INTO gtest.ns.t22 VALUES (99)") // lands after the base was pinned
    val err = intercept[IllegalArgumentException] {
      GraftMeta.commit(dir, "seg-bogus", replace = true, None, expectedCurrent = Some(base))
    }
    assert(err.getMessage.contains("concurrent commit"))
    val err2 = intercept[IllegalArgumentException] {
      GraftMeta.commitReplaceSegments(dir, Nil, Set("x"), expectedCurrent = Some(base))
    }
    assert(err2.getMessage.contains("concurrent commit"))
    // the concurrent append survives; nothing was lost or replaced
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t22").head.getLong(0) === 11L)
  }

  test("ALTER TABLE RENAME TO moves the directory; history and stats survive") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t24")
    sql("DROP TABLE IF EXISTS gtest.ns.t24r")
    sql("CREATE TABLE gtest.ns.t24 AS SELECT id AS k FROM range(10)")
    sql("INSERT INTO gtest.ns.t24 SELECT id FROM range(10, 30)")
    // the RENAME TO target resolves inside the source's catalog: no catalog prefix
    sql("ALTER TABLE gtest.ns.t24 RENAME TO ns.t24r")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t24r").head.getLong(0) === 30L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t24r VERSION AS OF 1").head.getLong(0) === 10L,
      "time travel must survive a rename")
    // zone maps moved with the table: a range predicate still plans one segment
    val pf = plannedFiles(sql("SELECT k FROM gtest.ns.t24r WHERE k >= 15"))
    assert(pf.map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString)
      .distinct.size === 1, "segment stats must survive a rename")
    val err = intercept[Exception] { sql("SELECT * FROM gtest.ns.t24").collect() }
    assert(err.getMessage.toLowerCase.contains("t24"), "old name must be gone")
  }

  test("zone-map stats harvest from parquet footers: no second read, same bounds") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t25")
    sql("CREATE TABLE gtest.ns.t25 (k BIGINT, tag STRING, d DATE) USING parquet")
    // planted nulls in tag so harvested null counts are non-trivial
    sql("""INSERT INTO gtest.ns.t25
           SELECT id, CASE WHEN id % 3 = 0 THEN NULL ELSE concat('v', id) END,
                  DATE'2024-01-01' + CAST(id AS INT) FROM range(100)""")
    val dir = root.resolve("ns").resolve("t25")
    val meta = GraftMeta.read(dir)
    val seg = meta.snapshots(meta.current).head
    // the footer path alone must cover every column of this schema —
    // fromFooters has no SparkSession parameter, so a clean harvest is
    // STRUCTURALLY incapable of re-reading the segment's rows
    val (rows, ok, failed) =
      SegmentStats.fromFooters(dir.resolve(seg).toString, meta.schema,
        exactStrings = true).get
    assert(failed.isEmpty, s"footer harvest must cover int/string/date, missed $failed")
    assert(rows === 100L)
    // bit-identical to the aggregate-scan fallback (the round-5 implementation)
    val agg = SegmentStats.compute(spark, dir.resolve(seg).toString, meta.schema)
    assert(SegmentStats.Stats(rows, ok) === agg,
      "footer-harvested bounds must equal the aggregate scan's")
    // and the COMMITTED stats are the harvested ones (same encode round-trip,
    // string exactness included — this segment was engine-written)
    assert(SegmentStats.decode(meta.zstats(seg)) === agg)
    assert(ok("tag").nulls === 34L) // ids 0,3,...,99
    assert(ok("k").min.contains("0") && ok("k").max.contains("99"))
  }

  test("footer harvest: pre-ADD COLUMN segments read as all-null; INT64 timestamps harvest") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t26")
    sql("CREATE TABLE gtest.ns.t26 (k BIGINT) USING parquet")
    sql("INSERT INTO gtest.ns.t26 SELECT id FROM range(10)")          // no `extra` yet
    sql("ALTER TABLE gtest.ns.t26 ADD COLUMN extra BIGINT")
    val dir = root.resolve("ns").resolve("t26")
    val meta = GraftMeta.read(dir)
    val seg = meta.snapshots(meta.current).head
    val (rows, ok, failed) =
      SegmentStats.fromFooters(dir.resolve(seg).toString, meta.schema).get
    assert(failed.isEmpty && rows === 10L)
    // the old segment has no chunk for `extra`: all rows count as null and the
    // bounds stay empty — exactly what the null-filling scan computes
    assert(ok("extra") === SegmentStats.Col('i', None, None, 10L))

    // timestamps: INT64 micros footers harvest; the writer's timestamp
    // encoding is session conf, so pin the micros path explicitly
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val saved = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MICROS")
    try {
      sql("DROP TABLE IF EXISTS gtest.ns.t27")
      sql("CREATE TABLE gtest.ns.t27 (ts TIMESTAMP) USING parquet")
      sql("INSERT INTO gtest.ns.t27 VALUES (TIMESTAMP'2024-01-01 00:00:00'), (TIMESTAMP'2024-06-01 12:34:56')")
      val d27 = root.resolve("ns").resolve("t27")
      val m27 = GraftMeta.read(d27)
      val s27 = m27.snapshots(m27.current).head
      val (r27, ok27, failed27) =
        SegmentStats.fromFooters(d27.resolve(s27).toString, m27.schema).get
      assert(failed27.isEmpty && r27 === 2L)
      assert(SegmentStats.Stats(r27, ok27) ===
        SegmentStats.compute(spark, d27.resolve(s27).toString, m27.schema))
    } finally saved.fold(spark.conf.unset(tsKey))(spark.conf.set(tsKey, _))
  }

  test("TIMESTAMP AS OF resolves to the newest snapshot committed at or before the instant") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t32")
    sql("CREATE TABLE gtest.ns.t32 (k BIGINT) USING parquet")
    spark.range(0, 10).toDF("k").writeTo("gtest.ns.t32").append()   // snap 1
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    spark.range(10, 30).toDF("k").writeTo("gtest.ns.t32").append()  // snap 2
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val asOf = fmt.format(new java.util.Date(between))
    // the instant between the commits must see snapshot 1 only
    assert(sql(s"SELECT COUNT(*) FROM gtest.ns.t32 TIMESTAMP AS OF '$asOf'")
      .head.getLong(0) === 10L)
    // an instant after both sees the current snapshot
    val now = fmt.format(new java.util.Date(System.currentTimeMillis() + 1000))
    assert(sql(s"SELECT COUNT(*) FROM gtest.ns.t32 TIMESTAMP AS OF '$now'")
      .head.getLong(0) === 30L)
    // before the table existed: a loud resolution error, never an empty read
    val early = fmt.format(new java.util.Date(between - 3600 * 1000))
    val err = intercept[Exception] {
      sql(s"SELECT COUNT(*) FROM gtest.ns.t32 TIMESTAMP AS OF '$early'").collect()
    }
    assert(err.getMessage.contains("no snapshot"), err.getMessage)
    // commit instants surface in the .snapshots metadata table
    val times = sql("SELECT snapshot_id, committed_at_ms FROM gtest.ns.t32.snapshots ORDER BY snapshot_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(times.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(times.forall(_._2 > 0L) && times(1)._2 < between && between < times(2)._2)
  }

  test("changes feed: appended segments between snapshots; replace ranges refuse") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t33")
    sql("CREATE TABLE gtest.ns.t33 (k BIGINT) USING parquet")
    spark.range(0, 10).toDF("k").writeTo("gtest.ns.t33").append()   // snap 1
    spark.range(10, 30).toDF("k").writeTo("gtest.ns.t33").append()  // snap 2
    spark.range(30, 60).toDF("k").writeTo("gtest.ns.t33").append()  // snap 3
    def changes(from: Long, to: Option[Long] = None) = {
      val r = spark.read.option("graft.changes.from", from)
      to.fold(r)(t => r.option("graft.changes.to", t)).table("gtest.ns.t33")
    }
    // (1, 3]: the two later appends, not the first
    assert(changes(1).select(min(col("k")), max(col("k")), count(lit(1))).head.toSeq ===
      Seq(10L, 59L, 50L))
    // (1, 2]: exactly the second batch
    assert(changes(1, Some(2)).agg(count(lit(1))).head.getLong(0) === 20L)
    // (3, 3]: empty, not an error — "nothing new since N" is a normal answer
    assert(changes(3).count() === 0L)
    // a rewrite commit inside the range breaks append-only: loud failure
    sql("DELETE FROM gtest.ns.t33 WHERE k < 5")                     // snap 4 (replace)
    val err = intercept[Exception] { changes(1).count() }
    assert(err.getMessage.contains("append-only"), err.getMessage)
    // but a range entirely before the rewrite still serves
    assert(changes(1, Some(3)).agg(count(lit(1))).head.getLong(0) === 50L)
  }

  test("rollback_to_snapshot restores content as a new commit; history and replay guard survive") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t34")
    sql("CREATE TABLE gtest.ns.t34 (k BIGINT) USING parquet")
    val batch = spark.range(0, 10).toDF("k")
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t34", "w1")(batch, 0L) // snap 1
    spark.range(10, 30).toDF("k").writeTo("gtest.ns.t34").append()                   // snap 2
    val out = sql("CALL gtest.system.rollback_to_snapshot('ns.t34', 1)").collect()(0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) === ((2L, 1L, 3L)))
    // content restored; the rolled-back-over snapshot stays readable for audit
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t34").head.getLong(0) === 10L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t34 VERSION AS OF 2").head.getLong(0) === 30L)
    // rollback does NOT reopen the exactly-once registry: the replayed epoch
    // is still discarded (re-ingesting rolled-back rows needs a new appId)
    graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.t34", "w1")(batch, 0L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t34").head.getLong(0) === 10L,
      "replay after rollback must stay a no-op")
    // unknown snapshot: loud failure, no commit
    val err = intercept[Exception] {
      sql("CALL gtest.system.rollback_to_snapshot('ns.t34', 99)").collect()
    }
    assert(err.getMessage.contains("no snapshot"), err.getMessage)
  }

  test("compact honors write.cluster-by/order-by: the rewritten segment keeps the layout") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t31")
    sql("""CREATE TABLE gtest.ns.t31 (k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('write.cluster-by'='k', 'write.order-by'='k')""")
    spark.range(0, 500).selectExpr("id % 10 AS k", "id AS v").writeTo("gtest.ns.t31").append()
    spark.range(500, 1000).selectExpr("id % 10 AS k", "id AS v").writeTo("gtest.ns.t31").append()
    // tiny size target → a multi-file rewrite, so the layout is observable; a
    // blind coalesce would interleave the two appends in every output file
    sql("CALL gtest.system.compact('ns.t31', 2048)")
    val dir = root.resolve("ns").resolve("t31")
    val meta = GraftMeta.read(dir)
    val segs = meta.snapshots(meta.current)
    assert(segs.size === 1, "compaction replaces the snapshot with one segment")
    val files = java.nio.file.Files.list(dir.resolve(segs.head)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    assert(files.size >= 2, s"size target must split the rewrite, got ${files.size} file(s)")
    // cluster-by: after compaction every key still lives in exactly one file
    val fileOfKey = files.flatMap(f => spark.read.parquet(f.toString)
      .select("k").distinct().collect().map(_.getLong(0) -> f.getFileName.toString))
    fileOfKey.groupBy(_._1).foreach { case (k, fs) =>
      assert(fs.map(_._2).distinct.size === 1, s"key $k split across files after compact")
    }
    // order-by: within each file rows stay sorted (row-group stats selective)
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"file ${f.getFileName} lost sortedness")
    }
    assert(sql("SELECT CAST(SUM(v) AS BIGINT) FROM gtest.ns.t31").head.getLong(0) === 499500L)
  }

  test("streaming source: readStream.table follows the snapshot log, one batch per commit range") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t35")
    sql("CREATE TABLE gtest.ns.t35 (k BIGINT, tag STRING) USING parquet")
    spark.range(0, 10).selectExpr("id AS k", "'a' AS tag").writeTo("gtest.ns.t35").append()
    val q = spark.readStream.table("gtest.ns.t35")
      .select(col("k")) // pruned projection must flow into the per-batch scans
      .writeStream.format("memory").queryName("g_stream_t35").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("g_stream_t35").count() === 10L, "initial snapshot is batch one")
      // two more commits while the stream runs: each arrives exactly once
      spark.range(10, 30).selectExpr("id AS k", "'b' AS tag").writeTo("gtest.ns.t35").append()
      spark.range(30, 60).selectExpr("id AS k", "'c' AS tag").writeTo("gtest.ns.t35").append()
      q.processAllAvailable()
      val got = spark.table("g_stream_t35").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === (0L until 60L), "streamed rows must equal the batch table exactly")
    } finally q.stop()
  }

  test("streaming source: graft.stream.from skips history before the named snapshot") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t37")
    sql("CREATE TABLE gtest.ns.t37 (k BIGINT) USING parquet")
    spark.range(0, 10).toDF("k").writeTo("gtest.ns.t37").append()   // snap 1
    spark.range(10, 30).toDF("k").writeTo("gtest.ns.t37").append()  // snap 2
    val q = spark.readStream.option("graft.stream.from", 1)
      .table("gtest.ns.t37")
      .writeStream.format("memory").queryName("g_stream_t37").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("g_stream_t37").collect().map(_.getLong(0)).sorted
      assert(got.toSeq === (10L until 30L),
        "start offset 1 must deliver only commits after snapshot 1")
    } finally q.stop()
  }

  test("streaming source: checkpointed restart resumes at the committed snapshot offset") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t36")
    sql("CREATE TABLE gtest.ns.t36 (k BIGINT) USING parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    def runAvailable(): Unit = {
      val q = spark.readStream.table("gtest.ns.t36")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    spark.range(0, 10).toDF("k").writeTo("gtest.ns.t36").append()
    runAvailable()
    spark.range(10, 25).toDF("k").writeTo("gtest.ns.t36").append()
    runAvailable() // must deliver ONLY the second append
    val got = spark.read.parquet(outDir).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (0L until 25L), "restart must neither lose nor duplicate rows")
  }

  test("streaming source: maxSnapshotsPerTrigger drains a backlog in bounded batches") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t38")
    sql("CREATE TABLE gtest.ns.t38 (k BIGINT) USING parquet")
    // 3-commit backlog BEFORE the stream ever starts
    spark.range(0, 10).toDF("k").writeTo("gtest.ns.t38").append()   // snap 1
    spark.range(10, 30).toDF("k").writeTo("gtest.ns.t38").append()  // snap 2
    spark.range(30, 60).toDF("k").writeTo("gtest.ns.t38").append()  // snap 3
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rate_ckpt").toString
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    def runAvailable(): Unit = {
      val q = spark.readStream.option("maxSnapshotsPerTrigger", 1)
        .table("gtest.ns.t38")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val ks = df.collect().map(_.getLong(0))
          sizes.synchronized { sizes += ks.length.toLong; seen ++= ks }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    runAvailable()
    assert(sizes.toSeq === Seq(10L, 20L, 30L),
      s"backlog must drain one COMMIT per batch, saw batch sizes $sizes")
    // restart mid-history continues exactly-once: two more commits, same cap
    spark.range(60, 70).toDF("k").writeTo("gtest.ns.t38").append()  // snap 4
    spark.range(70, 85).toDF("k").writeTo("gtest.ns.t38").append()  // snap 5
    runAvailable()
    assert(sizes.toSeq === Seq(10L, 20L, 30L, 10L, 15L),
      s"restart must resume at the checkpointed snapshot with the same bound, saw $sizes")
    assert(seen.sorted.toSeq === (0L until 85L),
      "no row lost or duplicated across the bounded batches and the restart")
  }

  test("streaming source: maxBytesPerTrigger groups commits under a byte budget, oversized commits still drain") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t38b")
    sql("CREATE TABLE gtest.ns.t38b (k BIGINT) USING parquet")
    // 4-commit backlog: two tiny, one large, one tiny
    spark.range(0, 5).coalesce(1).toDF("k").writeTo("gtest.ns.t38b").append()      // snap 1 (~KB)
    spark.range(5, 10).coalesce(1).toDF("k").writeTo("gtest.ns.t38b").append()     // snap 2 (~KB)
    spark.range(10, 100010).coalesce(1).toDF("k").writeTo("gtest.ns.t38b").append() // snap 3 (>>50KB)
    spark.range(100010, 100015).coalesce(1).toDF("k").writeTo("gtest.ns.t38b").append() // snap 4
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bytes_ckpt").toString
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.option("maxBytesPerTrigger", 50000)
      .table("gtest.ns.t38b")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val ks = df.collect().map(_.getLong(0))
        sizes.synchronized { sizes += ks.length.toLong; seen ++= ks }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // snaps 1+2 fit one budget; snap 3 exceeds it ALONE but must still
    // drain as its own batch (never stall); snap 4 follows separately
    assert(sizes.toSeq === Seq(10L, 100000L, 5L),
      s"expected byte-grouped batches [10, 100000, 5], saw $sizes")
    assert(seen.sorted.toSeq === (0L until 100015L),
      "no row lost or duplicated under byte-based admission")
  }

  test("CDC row deltas: rewrites yield exact rows, compaction nets to zero") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t39")
    sql("CREATE TABLE gtest.ns.t39 AS SELECT * FROM VALUES " +
      "(1L, 'a'), (2L, 'b'), (3L, 'c') AS v(k, tag)")                    // snap 1
    sql("INSERT INTO gtest.ns.t39 VALUES (4, 'd')")                      // snap 2
    sql("""MERGE INTO gtest.ns.t39 t
           USING (SELECT * FROM VALUES (2L, 'B'), (5L, 'e') AS s(k, tag)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET tag = s.tag
           WHEN NOT MATCHED THEN INSERT (k, tag) VALUES (s.k, s.tag)""") // snap 3 (rewrite)
    sql("CALL gtest.system.compact('ns.t39', 134217728)")                // snap 4 (rewrite)
    def deltas(from: Long, to: Option[Long] = None) =
      GraftCdc.rowDeltas(spark, "gtest", "ns.t39", from, to)
        .collect().map(r => (r.getString(2), r.getLong(0), r.getString(1))).sorted.toSeq
    // the full range nets MERGE's update to delete+insert; rows 1/3 copied
    // forward by the rewrites cancel exactly
    assert(deltas(1) === Seq(
      ("delete", 2L, "b"),
      ("insert", 2L, "B"), ("insert", 4L, "d"), ("insert", 5L, "e")))
    // a compaction-only range nets to ZERO deltas
    assert(deltas(3, Some(4)) === Seq.empty,
      "compaction rewrites every segment but changes no row")
    // an append-only range agrees with the changes feed
    assert(deltas(1, Some(2)) === Seq(("insert", 4L, "d")))
    val err = intercept[Exception] { GraftCdc.rowDeltas(spark, "gtest", "ns.t39", 99L) }
    assert(err.getMessage.contains("no snapshot"), err.getMessage)
  }

  test("CDC per-commit attribution: each delta carries the commit that produced it") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t40")
    sql("CREATE TABLE gtest.ns.t40 AS SELECT * FROM VALUES " +
      "(1L, 'a'), (2L, 'b'), (3L, 'c') AS v(k, tag)")                    // snap 1
    sql("INSERT INTO gtest.ns.t40 VALUES (4, 'd')")                      // snap 2
    sql("""MERGE INTO gtest.ns.t40 t
           USING (SELECT * FROM VALUES (2L, 'B'), (5L, 'e') AS s(k, tag)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET tag = s.tag
           WHEN NOT MATCHED THEN INSERT (k, tag) VALUES (s.k, s.tag)""") // snap 3 (rewrite)
    sql("CALL gtest.system.compact('ns.t40', 134217728)")                // snap 4 (rewrite)
    sql("CALL gtest.system.delete_where('ns.t40', 'k = 2')")             // snap 5
    def perCommit(from: Long, to: Option[Long] = None) =
      GraftCdc.commitDeltas(spark, "gtest", "ns.t40", from, to)
        .collect().map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1)))
        .sorted.toSeq
    // full history: the MERGE's update is attributed to ITS commit, the later
    // delete to ITS own — where rowDeltas(1) nets k=2's hops to one delete
    assert(perCommit(1L) === Seq(
      (2L, "insert", 4L, "d"),
      (3L, "delete", 2L, "b"), (3L, "insert", 2L, "B"), (3L, "insert", 5L, "e"),
      (5L, "delete", 2L, "B")),
      s"per-commit history wrong: ${perCommit(1L)}")
    // the compaction commit (v4) contributes zero rows above; ranges are
    // (from, to] — "the commits turning snapshot `from` into `to`"
    assert(perCommit(2L, Some(4L)) === Seq(
      (3L, "delete", 2L, "b"), (3L, "insert", 2L, "B"), (3L, "insert", 5L, "e")))
    assert(perCommit(5L, Some(5L)) === Seq.empty, "an empty range has no commits")
    // net-vs-history cross-check: per-commit deltas REPLAYED in order must
    // reproduce rowDeltas' net answer
    val net = GraftCdc.rowDeltas(spark, "gtest", "ns.t40", 1L)
      .collect().map(r => (r.getString(2), r.getLong(0), r.getString(1))).sorted.toSeq
    assert(net === Seq(("delete", 2L, "b"), ("insert", 4L, "d"), ("insert", 5L, "e")))
    val err = intercept[Exception] { GraftCdc.commitDeltas(spark, "gtest", "ns.t40", 7L) }
    assert(err.getMessage.contains("must be <="), err.getMessage)
  }

  test("CDC row deltas on a PARTITIONED table: dynamic overwrite nets exact per-partition rows") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p13")
    sql("CREATE TABLE gtest.ns.p13 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    sql("INSERT INTO gtest.ns.p13 VALUES (1, 'mon'), (2, 'tue'), (3, 'wed')") // snap 1
    spark.createDataFrame(Seq((20L, "tue"), (21L, "tue"))).toDF("k", "day")
      .writeTo("gtest.ns.p13").overwritePartitions()                          // snap 2
    val deltas = GraftCdc.rowDeltas(spark, "gtest", "ns.p13", 1L)
      .collect().map(r => (r.getString(2), r.getLong(0), r.getString(1))).sorted.toSeq
    assert(deltas === Seq(
      ("delete", 2L, "tue"), ("insert", 20L, "tue"), ("insert", 21L, "tue")),
      s"only the overwritten partition's rows may appear: $deltas")
  }

  test("streaming source over a PARTITIONED table: multi-segment commits arrive whole") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p10")
    sql("CREATE TABLE gtest.ns.p10 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    // each append commits SEVERAL partition-pure segments as ONE snapshot: the
    // stream must deliver the whole commit in one batch, never a torn half
    spark.createDataFrame(Seq((1L, "mon"), (2L, "tue"))).toDF("k", "day")
      .writeTo("gtest.ns.p10").append()
    val q = spark.readStream.table("gtest.ns.p10")
      .writeStream.format("memory").queryName("g_stream_p10").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("g_stream_p10").count() === 2L)
      spark.createDataFrame(Seq((3L, "mon"), (4L, "wed"), (5L, "wed"))).toDF("k", "day")
        .writeTo("gtest.ns.p10").append()
      q.processAllAvailable()
      val got = spark.table("g_stream_p10").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(got === Seq((1L, "mon"), (2L, "tue"), (3L, "mon"), (4L, "wed"), (5L, "wed")),
        "every partition segment of every commit exactly once")
    } finally q.stop()
  }

  test("SQL UPDATE/MERGE on a partitioned table rewrite ONLY the touched partitions") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p11")
    sql("""CREATE TABLE gtest.ns.p11 (k BIGINT, day STRING, amt BIGINT)
           USING parquet PARTITIONED BY (day)""")
    sql("""INSERT INTO gtest.ns.p11 VALUES
           (1, 'mon', 10), (2, 'mon', 20), (3, 'tue', 30), (4, 'wed', 40)""")
    val before = segNames("p11").toSet
    assert(before.size === 3)
    // SQL UPDATE takes the row-level (group-based) path; runtime group
    // filtering must confine the rewrite to the tue partition's segment
    sql("UPDATE gtest.ns.p11 SET amt = amt + 1 WHERE day = 'tue'")
    val afterUpdate = segNames("p11").toSet
    assert((before -- afterUpdate).forall(_.endsWith("tue")) &&
      (afterUpdate -- before).forall(_.endsWith("tue")),
      s"UPDATE must swap only the tue segment: before=$before after=$afterUpdate")
    assert(sql("SELECT amt FROM gtest.ns.p11 WHERE k = 3").head.getLong(0) === 31L)
    assert(sql("SELECT CAST(SUM(amt) AS BIGINT) FROM gtest.ns.p11").head.getLong(0) === 101L)
    // MERGE touching tue (update) + thu (insert): mon/wed carry by reference
    val preMerge = segNames("p11").toSet
    sql("""MERGE INTO gtest.ns.p11 t
           USING (SELECT * FROM VALUES (3L, 'tue', 300L), (9L, 'thu', 90L)
                  AS s(k, day, amt)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, day, amt) VALUES (s.k, s.day, s.amt)""")
    val afterMerge = segNames("p11").toSet
    assert((preMerge -- afterMerge).forall(_.endsWith("tue")),
      s"MERGE must not rewrite untouched partitions: removed=${preMerge -- afterMerge}")
    assert((afterMerge -- preMerge).forall(s => s.endsWith("tue") || s.endsWith("thu")),
      s"MERGE added unexpected segments: ${afterMerge -- preMerge}")
    val rows = sql("SELECT k, day, amt FROM gtest.ns.p11 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "mon", 10L), (2L, "mon", 20L), (3L, "tue", 300L),
      (4L, "wed", 40L), (9L, "thu", 90L)))
    // a DELETE that empties a partition removes its segment without a rewrite
    // artifact left behind in the snapshot (complex predicate forces the
    // row-level path — canDeleteWhere rejects the subquery)
    sql("""DELETE FROM gtest.ns.p11
           WHERE day = (SELECT MIN(day) FROM gtest.ns.p11 WHERE day = 'wed')""")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p11 WHERE day = 'wed'").head.getLong(0) === 0L)
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p11").head.getLong(0) === 4L)
  }

  test("streaming foreachBatch ingestion into a PARTITIONED table: exactly-once, pure segments") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p12")
    sql("CREATE TABLE gtest.ns.p12 (v BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("graft_part_ingest").toString
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    def runAvailable(): Unit = {
      val q = source.toDF().toDF("v", "day").writeStream
        .foreachBatch(graft.streaming.EventStreams.appendBatchToGraft("gtest.ns.p12", "ping") _)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
    }
    source.addData((1L, "mon"), (2L, "tue"), (3L, "mon"))
    runAvailable()
    // restart from the same checkpoint: batch ids continue, nothing replays
    source.addData((4L, "wed"))
    runAvailable()
    assert(sql("SELECT CAST(SUM(v) AS BIGINT) FROM gtest.ns.p12").head.getLong(0) === 10L,
      "restart must neither lose nor duplicate rows")
    // every streaming batch landed partition-pure segments
    segmentDirs("p12").foreach { seg =>
      assert(spark.read.parquet(seg.toString).select("day").distinct().count() === 1L,
        s"streaming-ingested segment $seg is not partition-pure")
    }
    assert(segNames("p12").size === 3, "batch 0 → mon+tue segments, batch 1 → wed")
  }

  test("a failed write job leaves the table unchanged (commit atomicity)") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t13")
    sql("CREATE TABLE gtest.ns.t13 AS SELECT id AS k FROM range(5)")
    val boom = org.apache.spark.sql.functions.udf((k: Long) =>
      if (k > 2) throw new RuntimeException("boom") else k)
    intercept[Exception] {
      spark.range(10).toDF("k")
        .select(boom(org.apache.spark.sql.functions.col("k")).as("k"))
        .writeTo("gtest.ns.t13").append()
    }
    assert(sql("SELECT COUNT(*) FROM gtest.ns.t13").head.getLong(0) === 5L,
      "aborted job must not become visible")
  }

  // ------------------------------------------------------------------------
  // identity-partitioned tables: partition-pure segments, pruned scans,
  // partition-as-group copy-on-write DML, dynamic overwrite, maintenance
  // ------------------------------------------------------------------------

  private def segNames(table: String): Seq[String] =
    segmentDirs(table).map(_.getFileName.toString)

  test("partitioned create + insert: one PURE segment per partition value") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p1")
    sql("CREATE TABLE gtest.ns.p1 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    spark.range(0, 30)
      .selectExpr("id AS k", "CASE WHEN id < 10 THEN 'mon' WHEN id < 20 THEN 'tue' ELSE 'wed' END AS day")
      .writeTo("gtest.ns.p1").append()
    val segs = segNames("p1")
    assert(segs.size === 3, s"one segment per partition value, saw $segs")
    assert(segs.forall(_.contains("@")), s"partition suffix missing in $segs")
    // purity: every segment holds exactly one day value, and the partition
    // column is a REGULAR data column in the files (no reconstruction needed)
    segmentDirs("p1").foreach { seg =>
      val days = spark.read.parquet(seg.toString).select("day").distinct().collect()
      assert(days.length === 1, s"segment $seg holds ${days.length} partition values")
    }
    assert(sql("SELECT COUNT(*), CAST(SUM(k) AS BIGINT) FROM gtest.ns.p1").head.toSeq ===
      Seq(30L, (0L until 30L).sum))
    // partitioning is visible in the table description
    assert(spark.table("gtest.ns.p1").schema.fieldNames.toSeq === Seq("k", "day"))
  }

  test("partition-pruned scan: a partition predicate plans 1 of N segments") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p2")
    sql("CREATE TABLE gtest.ns.p2 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    spark.range(0, 300)
      .selectExpr("id AS k", "CASE WHEN id < 100 THEN 'mon' WHEN id < 200 THEN 'tue' ELSE 'wed' END AS day")
      .writeTo("gtest.ns.p2").append()
    val q = sql("SELECT k FROM gtest.ns.p2 WHERE day = 'tue'")
    val segs = plannedFiles(q)
      .map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString).distinct
    assert(segs.size === 1, s"expected exactly the tue partition's segment, saw $segs")
    assert(q.count() === 100L)
  }

  test("dynamic partition overwrite replaces exactly the written partitions") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p3")
    sql("CREATE TABLE gtest.ns.p3 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    spark.createDataFrame(Seq((1L, "mon"), (2L, "tue"), (3L, "wed")))
      .toDF("k", "day").writeTo("gtest.ns.p3").append()
    val monSegBefore = segNames("p3").filter(_.endsWith("mon"))
    // overwrite ONLY tue (new rows), mon/wed must carry by reference
    spark.createDataFrame(Seq((20L, "tue"), (21L, "tue")))
      .toDF("k", "day").writeTo("gtest.ns.p3").overwritePartitions()
    val rows = sql("SELECT k, day FROM gtest.ns.p3 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((1L, "mon"), (3L, "wed"), (20L, "tue"), (21L, "tue")))
    assert(segNames("p3").filter(_.endsWith("mon")) === monSegBefore,
      "untouched partition's segment must carry by reference, not rewrite")
    // history: pre-overwrite snapshot still readable
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p3 VERSION AS OF 1").head.getLong(0) === 3L)
  }

  test("partition-scoped delete_where rewrites one partition, update stays pure") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p4")
    sql("CREATE TABLE gtest.ns.p4 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    spark.range(0, 300)
      .selectExpr("id AS k", "CASE WHEN id < 100 THEN 'mon' WHEN id < 200 THEN 'tue' ELSE 'wed' END AS day")
      .writeTo("gtest.ns.p4").append()
    val before = segNames("p4").toSet
    val del = sql("CALL gtest.system.delete_where('ns.p4', \"day = 'tue' AND k < 150\")").collect()(0)
    assert(del.getInt(0) === 3 && del.getInt(1) === 1,
      s"delete must touch exactly the tue segment (got total=${del.getInt(0)} rewritten=${del.getInt(1)})")
    assert(del.getLong(2) === 50L)
    // untouched partitions carried by reference; the rewritten tue segment is pure
    val after = segNames("p4").toSet
    assert((before -- after).forall(_.endsWith("tue")) && (after -- before).forall(_.endsWith("tue")))
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p4 WHERE day = 'tue'").head.getLong(0) === 50L)
    // update within a partition keeps purity; assigning the partition col is refused
    val upd = sql("CALL gtest.system.update_where('ns.p4', \"day = 'wed'\", 'k = k + 1000')").collect()(0)
    assert(upd.getInt(1) === 1, "update must rewrite exactly the wed segment")
    assert(sql("SELECT MIN(k) FROM gtest.ns.p4 WHERE day = 'wed'").head.getLong(0) === 1200L)
    val err = intercept[Exception] {
      sql("CALL gtest.system.update_where('ns.p4', 'k = 0', \"day = 'xxx'\")").collect()
    }
    assert(err.getMessage.contains("partition column"), err.getMessage)
  }

  test("MERGE INTO a partitioned table keeps segments partition-pure") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p5")
    sql("CREATE TABLE gtest.ns.p5 (k BIGINT, day STRING, amt BIGINT) USING parquet PARTITIONED BY (day)")
    sql("INSERT INTO gtest.ns.p5 VALUES (1, 'mon', 10), (2, 'tue', 20), (3, 'wed', 30)")
    sql("""MERGE INTO gtest.ns.p5 t
           USING (SELECT * FROM VALUES (2L, 'tue', 99L), (4L, 'thu', 40L) AS s(k, day, amt)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET amt = s.amt
           WHEN NOT MATCHED THEN INSERT (k, day, amt) VALUES (s.k, s.day, s.amt)""")
    val rows = sql("SELECT k, day, amt FROM gtest.ns.p5 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, "mon", 10L), (2L, "tue", 99L), (3L, "wed", 30L), (4L, "thu", 40L)))
    segmentDirs("p5").foreach { seg =>
      assert(spark.read.parquet(seg.toString).select("day").distinct().count() === 1L,
        s"post-MERGE segment $seg is not partition-pure")
    }
  }

  test("partitioned compact rewrites within partitions; purity and counts survive") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p6")
    sql("CREATE TABLE gtest.ns.p6 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    (0 until 3).foreach { i =>
      spark.createDataFrame(Seq((i * 10L, "mon"), (i * 10L + 1, "tue")))
        .toDF("k", "day").writeTo("gtest.ns.p6").append()
    }
    assert(segNames("p6").size === 6, "3 appends x 2 partitions")
    sql("CALL gtest.system.compact('ns.p6', 134217728)")
    val live = sql("SELECT segment FROM gtest.ns.p6.segments WHERE in_current").collect()
      .map(_.getString(0))
    assert(live.length === 2, s"compaction must leave one segment per partition, saw ${live.toSeq}")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p6").head.getLong(0) === 6L)
    live.foreach { seg =>
      assert(spark.read.parquet(root.resolve("ns").resolve("p6").resolve(seg).toString)
        .select("day").distinct().count() === 1L, s"post-compact segment $seg not pure")
    }
  }

  test("partitioned: NULL and date partition values round-trip and prune") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p7")
    sql("CREATE TABLE gtest.ns.p7 (k BIGINT, d DATE) USING parquet PARTITIONED BY (d)")
    sql("""INSERT INTO gtest.ns.p7 VALUES
           (1, DATE'2024-01-01'), (2, DATE'2024-01-02'), (3, NULL)""")
    assert(segNames("p7").size === 3, s"3 partition values incl. NULL: ${segNames("p7")}")
    assert(sql("SELECT k FROM gtest.ns.p7 WHERE d IS NULL").head.getLong(0) === 3L)
    val pruned = sql("SELECT k FROM gtest.ns.p7 WHERE d = DATE'2024-01-02'")
    assert(plannedFiles(pruned)
      .map(f => java.nio.file.Paths.get(f).getParent.getFileName.toString).distinct.size === 1)
    assert(pruned.head.getLong(0) === 2L)
    // a second insert into an EXISTING partition appends a second pure segment
    sql("INSERT INTO gtest.ns.p7 VALUES (4, DATE'2024-01-01')")
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p7 WHERE d = DATE'2024-01-01'").head.getLong(0) === 2L)
  }

  test("partitioned guards: non-identity transform, bad type, drop partition col") {
    root
    val e1 = intercept[Exception] {
      sql("CREATE TABLE gtest.ns.p8a (k BIGINT, ts TIMESTAMP) USING parquet PARTITIONED BY (ts)")
    }
    assert(e1.getMessage.contains("unsupported type"), e1.getMessage)
    // bucket(n, col) is first-class since r15 (BucketPartitionSpec) — the
    // guard now rejects temporal transforms and un-hashable bucket sources
    val e2 = intercept[Exception] {
      sql("CREATE TABLE gtest.ns.p8b (k BIGINT, ts TIMESTAMP) USING parquet PARTITIONED BY (days(ts))")
    }
    assert(e2.getMessage.contains("identity") || e2.getMessage.contains("bucket"), e2.getMessage)
    val e2b = intercept[Exception] {
      sql("CREATE TABLE gtest.ns.p8c (k BIGINT, v DOUBLE) USING parquet PARTITIONED BY (bucket(4, v))")
    }
    assert(e2b.getMessage.contains("unsupported type"), e2b.getMessage)
    sql("DROP TABLE IF EXISTS gtest.ns.p8")
    sql("CREATE TABLE gtest.ns.p8 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    val e3 = intercept[Exception] { sql("ALTER TABLE gtest.ns.p8 DROP COLUMN day") }
    assert(e3.getMessage.contains("cannot be dropped"), e3.getMessage)
  }

  test("changes table: batch read matches GraftCdc.commitDeltas over a mixed history") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t45")
    sql("CREATE TABLE gtest.ns.t45 AS SELECT * FROM VALUES " +
      "(1L, 'a'), (2L, 'b'), (3L, 'c') AS v(k, tag)")                    // snap 1
    sql("INSERT INTO gtest.ns.t45 VALUES (4, 'd')")                      // snap 2
    sql("""MERGE INTO gtest.ns.t45 t
           USING (SELECT * FROM VALUES (2L, 'B'), (5L, 'e') AS s(k, tag)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET tag = s.tag
           WHEN NOT MATCHED THEN INSERT (k, tag) VALUES (s.k, s.tag)""") // snap 3 (rewrite)
    sql("CALL gtest.system.compact('ns.t45', 134217728)")                // snap 4 (rewrite)
    sql("CALL gtest.system.delete_where('ns.t45', 'k = 2')")             // snap 5
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1))).sorted.toSeq
    val viaTable = spark.read.option("graft.cdc.from", 1)
      .table("gtest.ns.t45.changes")
    assert(norm(viaTable) === Seq(
      (2L, "insert", 4L, "d"),
      (3L, "delete", 2L, "b"), (3L, "insert", 2L, "B"), (3L, "insert", 5L, "e"),
      (5L, "delete", 2L, "B")),
      s"changes table history wrong: ${norm(viaTable)}")
    // engine-served feed must equal the API computation exactly
    assert(norm(viaTable) === norm(
      GraftCdc.commitDeltas(spark, "gtest", "ns.t45", 1L)))
    // every commit here is time-stamped
    assert(viaTable.collect().forall(!_.isNullAt(4)),
      "_commit_timestamp must be non-null for stamped snapshots")
    // bounded range + pruned projection (one data col + one cdc col)
    val pruned = spark.read.option("graft.cdc.from", 2).option("graft.cdc.to", 3)
      .table("gtest.ns.t45.changes").select("k", "_change_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(pruned === Seq((2L, "delete"), (2L, "insert"), (5L, "insert")))
    // a compaction-only range is empty, never an error
    assert(spark.read.option("graft.cdc.from", 3).option("graft.cdc.to", 4)
      .table("gtest.ns.t45.changes").count() === 0L)
  }

  test("changes stream: rewrite commits stream with attribution, exactly-once across restart") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.t46")
    sql("CREATE TABLE gtest.ns.t46 AS SELECT * FROM VALUES " +
      "(1L, 'a'), (2L, 'b'), (3L, 'c') AS v(k, tag)")                    // snap 1
    sql("INSERT INTO gtest.ns.t46 VALUES (4, 'd')")                      // snap 2
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString
    val batches = scala.collection.mutable.ArrayBuffer
      .empty[Seq[(Long, String, Long, String)]]
    def runAvailable(): Unit = {
      val q = spark.readStream.option("maxSnapshotsPerTrigger", 1)
        .table("gtest.ns.t46.changes")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = df.collect()
            .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1)))
            .sorted.toSeq
          batches.synchronized { batches += rows }
          ()
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runAvailable() // drains commits 1..2, one per batch
    assert(batches.flatten.toSeq.sorted === Seq(
      (1L, "insert", 1L, "a"), (1L, "insert", 2L, "b"), (1L, "insert", 3L, "c"),
      (2L, "insert", 4L, "d")),
      s"initial drain wrong: ${batches.toSeq}")
    assert(batches.count(_.nonEmpty) === 2, "one COMMIT per bounded batch")
    val drained = batches.size
    // rewrites land while the stream is down — the plain source would refuse
    sql("""MERGE INTO gtest.ns.t46 t
           USING (SELECT * FROM VALUES (2L, 'B'), (5L, 'e') AS s(k, tag)) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET tag = s.tag
           WHEN NOT MATCHED THEN INSERT (k, tag) VALUES (s.k, s.tag)""") // snap 3 (rewrite)
    sql("CALL gtest.system.compact('ns.t46', 134217728)")                // snap 4 (rewrite)
    sql("INSERT INTO gtest.ns.t46 VALUES (6, 'f')")                      // snap 5
    runAvailable() // restart resumes at the checkpointed snapshot
    val resumed = batches.drop(drained).flatten.toSeq.sorted
    assert(resumed === Seq(
      (3L, "delete", 2L, "b"), (3L, "insert", 2L, "B"), (3L, "insert", 5L, "e"),
      (5L, "insert", 6L, "f")),
      s"restart must deliver exactly the new commits' deltas: $resumed")
    // the whole stream equals the API's full-history answer: nothing lost,
    // nothing doubled, compaction contributed zero rows
    val api = GraftCdc.commitDeltas(spark, "gtest", "ns.t46", 0L).collect()
      .map(r => (r.getLong(3), r.getString(2), r.getLong(0), r.getString(1))).sorted.toSeq
    assert(batches.flatten.toSeq.sorted === api,
      "stream-over-lifetime must equal commitDeltas(0, current)")
  }

  test("partitioned exactly-once: a replayed named batch stays a no-op") {
    root
    sql("DROP TABLE IF EXISTS gtest.ns.p9")
    sql("CREATE TABLE gtest.ns.p9 (k BIGINT, day STRING) USING parquet PARTITIONED BY (day)")
    def namedAppend(): Unit =
      spark.createDataFrame(Seq((1L, "mon"), (2L, "tue"))).toDF("k", "day")
        .writeTo("gtest.ns.p9").option("graft.segment", "batch.7").append()
    namedAppend()
    namedAppend() // replay: registry key seg-batch.7 already committed
    assert(sql("SELECT COUNT(*) FROM gtest.ns.p9").head.getLong(0) === 2L,
      "replayed named batch must not double rows")
    assert(segNames("p9").count(_.startsWith("seg-batch.7@")) === 2,
      "the one applied batch landed one segment per partition")
  }
}
