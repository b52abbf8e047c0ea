package graft.catalog

import graft.SparkSpec

/** Pins for `CALL system.rewrite_clustered` (GraftDml.rewriteClustered):
  * Z-order clustering into range-partitioned segments whose zone-map bounds
  * are tight on EVERY clustered column — plan-time segment pruning on any of
  * them — plus the refusal matrix and the DV-materializing rewrite contract. */
class ZOrderSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_zorder_spec")
    spark.conf.set("spark.sql.catalog.gzo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gzo.root", d.toString)
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

  test("z-order rewrite prunes selective predicates on EITHER clustered column") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z1")
    sql("CREATE TABLE gzo.ns.z1 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    // both dims pseudo-random: pre-rewrite zone bounds are table-wide, so
    // NO predicate prunes anything
    sql("""INSERT INTO gzo.ns.z1
           SELECT id, (id * 7919) % 1000, (id * 104729) % 1000 FROM range(0, 2000)""")
    sql("""INSERT INTO gzo.ns.z1
           SELECT id, (id * 7919) % 1000, (id * 104729) % 1000 FROM range(2000, 4000)""")
    val before = sql("SELECT * FROM gzo.ns.z1 ORDER BY k").collect()
    // pruning probes are plain scans (an aggregate's AQE wrapper hides the
    // BatchScan from collectLeaves before execution)
    val pa = "SELECT k FROM gzo.ns.z1 WHERE a < 100"
    val pb = "SELECT k FROM gzo.ns.z1 WHERE b < 100"
    val qa = "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM gzo.ns.z1 WHERE a < 100"
    val qb = "SELECT COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS s FROM gzo.ns.z1 WHERE b < 100"
    assert(plannedSegs(sql(pa)).size === 2, "random layout cannot prune")
    val (na, sa) = { val r = sql(qa).collect().head; (r.getLong(0), r.getLong(1)) }
    val (nb, sb) = { val r = sql(qb).collect().head; (r.getLong(0), r.getLong(1)) }

    val out = sql("CALL gzo.system.rewrite_clustered('ns.z1', 'a,b', 16)").collect().head
    assert((out.getInt(0), out.getInt(1), out.getLong(2)) === ((2, 16, 4000L)))

    // content is byte-for-row identical
    assert(sql("SELECT * FROM gzo.ns.z1 ORDER BY k").collect() === before)
    // a 10%-of-domain window on EITHER column keeps only the z-cells whose
    // hypercube overlaps it — a strict subset of the 16 segments (the 4x4
    // top-bit grid puts ~4 cells in each decile band; lexicographic order-by
    // could only ever serve its LEADING column)
    val segsA = plannedSegs(sql(pa))
    val segsB = plannedSegs(sql(pb))
    assert(segsA.size <= 8, s"a-window must prune z-cells, planned ${segsA.size}/16")
    assert(segsB.size <= 8, s"b-window must prune z-cells, planned ${segsB.size}/16")
    // ... and the answers did not move
    assert({ val r = sql(qa).collect().head; (r.getLong(0), r.getLong(1)) } === ((na, sa)))
    assert({ val r = sql(qb).collect().head; (r.getLong(0), r.getLong(1)) } === ((nb, sb)))
  }

  test("delete vectors materialize through the rewrite; NULL keys cluster") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z2")
    sql("""CREATE TABLE gzo.ns.z2 (k BIGINT, a BIGINT, b BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("""INSERT INTO gzo.ns.z2
           SELECT id, CASE WHEN id % 10 = 0 THEN NULL ELSE (id * 13) % 500 END,
                  (id * 29) % 500 FROM range(0, 1000)""")
    sql("DELETE FROM gzo.ns.z2 WHERE k % 4 = 0") // lands a delete vector
    val liveBefore = sql("SELECT * FROM gzo.ns.z2 ORDER BY k").collect()
    assert(liveBefore.length === 750)
    val out = sql("CALL gzo.system.rewrite_clustered('ns.z2', 'a,b', 4)").collect().head
    assert(out.getLong(2) === 750L, "deleted rows must not resurrect")
    assert(sql("SELECT * FROM gzo.ns.z2 ORDER BY k").collect() === liveBefore)
    // vectors dropped with the replaced segments: the zero-IO stats count
    // serves again (the DV composite never offers aggregate pushdown)
    val plan = sql("SELECT COUNT(*) FROM gzo.ns.z2").queryExecution.executedPlan.toString
    assert(plan.contains("graft-stats-agg"),
      s"post-rewrite snapshot must be vector-free:\n$plan")
  }

  test("compaction preserves the z-grid (per-cell groups)") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z3")
    sql("CREATE TABLE gzo.ns.z3 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    sql("INSERT INTO gzo.ns.z3 SELECT id, (id * 7) % 100, (id * 11) % 100 FROM range(0, 1000)")
    sql("CALL gzo.system.rewrite_clustered('ns.z3', 'a,b', 8)")
    val pruned = plannedSegs(sql("SELECT k FROM gzo.ns.z3 WHERE a < 10")).size
    sql("CALL gzo.system.compact('ns.z3')")
    // compact groups by FULL suffix: the 8 zc cells stay separate segments
    // and the pruning bound is unchanged
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z3 WHERE a >= 0")).size === 8)
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z3 WHERE a < 10")).size === pruned)
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z3").collect().head.getLong(0) === 1000L)
  }

  test("COW DML preserves the z-grid: touched rows route back through their cell (r17)") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z6")
    sql("CREATE TABLE gzo.ns.z6 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    sql("INSERT INTO gzo.ns.z6 SELECT id, (id * 7919) % 1000, (id * 104729) % 1000 FROM range(0, 2000)")
    sql("CALL gzo.system.rewrite_clustered('ns.z6', 'a,b', 8)")
    val preSegs = plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a >= 0")).size
    val prePruned = plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a < 100")).size
    assert(preSegs === 8 && prePruned < 8)
    // an UPDATE touching rows across SEVERAL cells (a-range spans the grid):
    // pre-r17 the touched cells collapsed into one wide-bounds segment
    val out = sql(
      "CALL gzo.system.update_where('ns.z6', 'b % 97 = 3', 'k = k + 1000000')").collect().head
    assert(out.getInt(1) >= 2, s"fixture must touch >= 2 cells, touched ${out.getInt(1)}")
    // the grid SURVIVES: same segment count, and the one-dimension probe
    // still plans no more than it did before the update
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a >= 0")).size === preSegs,
      "touched cells must be rewritten in place, not collapsed")
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a < 100")).size <= prePruned,
      "a clustered-column probe must keep its pre-update pruning bound")
    // values are the update's (hash the moved keys)
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z6 WHERE k >= 1000000").collect().head.getLong(0)
      === sql("SELECT COUNT(*) FROM gzo.ns.z6 WHERE b % 97 = 3").collect().head.getLong(0))
    // DELETE likewise: survivors stay in their cells, and a cell whose rows
    // all die vanishes instead of forcing a merged rewrite
    val preCount = sql("SELECT COUNT(*) FROM gzo.ns.z6").collect().head.getLong(0)
    val del = sql("CALL gzo.system.delete_where('ns.z6', 'a % 11 = 5')").collect().head
    assert(del.getInt(1) >= 2)
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a >= 0")).size <= preSegs)
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a < 100")).size <= prePruned)
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z6").collect().head.getLong(0) ===
      preCount - del.getLong(2))
    // updating a CLUSTERED column keeps the row in its OLD cell (bounds
    // widen there; pruning stays correct — verified by value, not by plan)
    val moved = sql("SELECT COUNT(*) FROM gzo.ns.z6 WHERE a < 50").collect().head.getLong(0)
    sql("CALL gzo.system.update_where('ns.z6', 'a >= 950', 'a = a - 940')")
    val after = sql("SELECT COUNT(*) FROM gzo.ns.z6 WHERE a < 50").collect().head.getLong(0)
    assert(after > moved, "re-assigned clustered values must be visible")
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z6 WHERE a >= 0")).size <= preSegs)
  }

  test("SQL row-level DML routes through the persisted spec: the grid SURVIVES (r17)") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z7")
    sql("CREATE TABLE gzo.ns.z7 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    sql("INSERT INTO gzo.ns.z7 SELECT id, (id * 7) % 100, (id * 11) % 100 FROM range(0, 1000)")
    sql("CALL gzo.system.rewrite_clustered('ns.z7', 'a,b', 4)")
    // every current segment is a zc cell: t.partitions shows 4 cell rows,
    // no NULL-partition (unsuffixed) row
    val cells = sql("SELECT partition FROM gzo.ns.z7.partitions").collect()
    assert(cells.length === 4 && cells.forall(!_.isNullAt(0)))
    // SQL UPDATE rides Spark's group-based row-level rewrite; the
    // replacement write routes every surviving row through the PERSISTED
    // routing spec (GraftClusteredWrite), so no unsuffixed segment appears
    // and the cell count holds
    sql("UPDATE gzo.ns.z7 SET k = k + 5000 WHERE b % 13 = 1")
    val after = sql("SELECT partition FROM gzo.ns.z7.partitions").collect()
    assert(after.forall(!_.isNullAt(0)),
      "the row-level replacement must land per-cell segments, not a merged one")
    assert(after.length === 4, s"cell count must hold, got ${after.length}")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z7 WHERE k >= 5000").collect().head.getLong(0)
      === sql("SELECT COUNT(*) FROM gzo.ns.z7 WHERE b % 13 = 1").collect().head.getLong(0))
    // SQL DELETE likewise stays in-grid
    sql("DELETE FROM gzo.ns.z7 WHERE a % 9 = 2")
    assert(sql("SELECT partition FROM gzo.ns.z7.partitions").collect().forall(!_.isNullAt(0)))
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z7 WHERE a % 9 = 2").collect().head.getLong(0) === 0L)
  }

  test("appends route through the persisted spec; compact folds cell generations (r17)") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z8")
    sql("CREATE TABLE gzo.ns.z8 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    sql("INSERT INTO gzo.ns.z8 SELECT id, (id * 7919) % 1000, (id * 104729) % 1000 FROM range(0, 2000)")
    sql("CALL gzo.system.rewrite_clustered('ns.z8', 'a,b', 8)")
    val prePruned = plannedSegs(sql("SELECT k FROM gzo.ns.z8 WHERE a < 100")).size
    assert(prePruned < 8)
    // INGEST AFTER CLUSTERING: the append fans out into per-cell segments
    // (no unsuffixed segment), so pruning on the new rows works immediately
    def parquetFiles(): Int = {
      val dir = root.resolve("ns").resolve("z8")
      val s = java.nio.file.Files.walk(dir)
      try {
        var c = 0
        val it = s.iterator()
        while (it.hasNext) {
          if (it.next().getFileName.toString.endsWith(".parquet")) c += 1
        }
        c
      } finally s.close()
    }
    val filesBefore = parquetFiles()
    sql("INSERT INTO gzo.ns.z8 SELECT id, (id * 7919) % 1000, (id * 104729) % 1000 FROM range(2000, 4000)")
    // the write DECLARES clustered(zcell(...)) — resolved through the
    // catalog's zcell function like the bucket transform — so Spark shuffles
    // each cell's rows to ONE task before the writers open: the append adds
    // at most one file per cell, not cells x source-partitions files (the
    // 4-partition range source would otherwise write up to 32)
    assert(parquetFiles() - filesBefore <= 8,
      s"expected <= 8 appended files (one per cell), got ${parquetFiles() - filesBefore}")
    val segsAfter = plannedSegs(sql("SELECT k FROM gzo.ns.z8 WHERE a >= 0"))
    assert(segsAfter.forall(_.contains("@zc")),
      s"appended rows must land in zc cells, got ${segsAfter.mkString(", ")}")
    // selective probes still prune: the appended generation is cell-pure,
    // so the planned segment set stays a strict subset
    val prunedAfter = plannedSegs(sql("SELECT k FROM gzo.ns.z8 WHERE a < 100"))
    assert(prunedAfter.size < segsAfter.size,
      s"probe must keep pruning: ${prunedAfter.size}/${segsAfter.size}")
    // answers cover BOTH generations
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z8").collect().head.getLong(0) === 4000L)
    val n100 = sql("SELECT COUNT(*) FROM gzo.ns.z8 WHERE a < 100").collect().head.getLong(0)
    assert(n100 === (0L until 4000L).count(i => (i * 7919) % 1000 < 100))
    // compact folds each cell's generations back to ONE segment — the
    // ingest-then-compact maintenance loop, never a full re-cluster
    sql("CALL gzo.system.compact('ns.z8')")
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.z8 WHERE a >= 0")).size === 8)
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z8 WHERE a < 100").collect().head.getLong(0) === n100)
    // the spec is engine-owned state
    intercept[Exception] {
      sql("ALTER TABLE gzo.ns.z8 SET TBLPROPERTIES ('graft.zorder.cols' = 'k')")
    }
    intercept[Exception] { sql("ALTER TABLE gzo.ns.z8 DROP COLUMN a") }
  }

  test("a whole-table UPDATE on a clustered table writes ~one file per cell (r18)") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z9")
    sql("CREATE TABLE gzo.ns.z9 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    // a many-partition source so an undistributed replacement write would fan
    // cells x tasks files
    sql("""INSERT INTO gzo.ns.z9
           SELECT id, (id * 7919) % 1000, (id * 104729) % 1000
           FROM range(0, 4000, 1, 8)""")
    sql("CALL gzo.system.rewrite_clustered('ns.z9', 'a,b', 8)")
    // whole-table UPDATE: the replacement write declares the SAME
    // clustered(zcell(...)) distribution as appends, so the rewrite shuffles
    // once and each cell's rows reach one task — ~one file per cell, not
    // cells x tasks
    sql("UPDATE gzo.ns.z9 SET k = k + 100000 WHERE k >= 0")
    val segs = plannedSegs(sql("SELECT k FROM gzo.ns.z9 WHERE a >= 0"))
    assert(segs.size === 8 && segs.forall(_.contains("@zc")), segs.mkString(", "))
    val tableDir = root.resolve("ns").resolve("z9")
    val files = segs.map { seg =>
      val s = java.nio.file.Files.list(tableDir.resolve(seg))
      try s.filter(_.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }.sum
    assert(files <= 9,
      s"a distributed replacement writes ~one file per cell, got $files for 8 cells")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z9 WHERE k >= 100000").collect()
      .head.getLong(0) === 4000L)
  }

  test("zcell codegen contract: the invoke magic overloads exist and agree with produceResult (r18)") {
    // the v2 resolver looks up `invoke` by the EXACT physical signature of
    // inputTypes(); a drifted signature silently degrades every routed
    // append's shuffle hash to the row-boxed path — pin the lookups Spark
    // performs for the long/long (bigint,bigint) and int/int (date,date)
    // shapes, plus a d=3 shape
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.types.{IntegerType => IT, LongType => LT}
    val u = classOf[UTF8String]
    val fn2 = new GraftZOrder.ZCellScalar(Array(LT, LT))
    Seq[(Array[Class[_]], Unit)](
      (Array[Class[_]](u, u, java.lang.Long.TYPE, java.lang.Long.TYPE), ()),
      (Array[Class[_]](u, u, java.lang.Integer.TYPE, java.lang.Integer.TYPE), ()),
      (Array[Class[_]](u, u, java.lang.Long.TYPE, java.lang.Integer.TYPE, java.lang.Long.TYPE), ())
    ).foreach { case (sig, _) =>
      assert(fn2.getClass.getMethod("invoke", sig: _*) != null)
    }
    // invoke and produceResult assign identical cells
    val splits = UTF8String.fromString("100,200,300")
    val bounds = UTF8String.fromString("0:1000,0:1000")
    val probe = Seq((0L, 0L), (999L, 999L), (17L, 948L), (500L, 3L), (250L, 750L))
    probe.foreach { case (a, b) =>
      val viaInvoke = fn2.invoke(splits, bounds, a, b)
      val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](splits, bounds, a, b))
      val fresh = new GraftZOrder.ZCellScalar(Array(LT, LT))
      assert(viaInvoke === fresh.produceResult(row), s"cell mismatch for ($a, $b)")
    }
  }

  test("a concurrent append fails the rewrite commit loudly; nothing is lost") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.z4")
    sql("CREATE TABLE gzo.ns.z4 (k BIGINT, a BIGINT, b BIGINT) USING parquet")
    sql("INSERT INTO gzo.ns.z4 SELECT id, id % 50, (id * 3) % 50 FROM range(0, 500)")
    // wedge an append between the rewrite's snapshot pin and its commit by
    // racing the rewrite against an insert from another thread; whichever
    // interleaving occurs, the committed state must hold EVERY row exactly
    // once — the expectedCurrent CAS refuses the stale swap rather than
    // silently dropping the concurrent rows
    val insert = new Thread(() =>
      sql("INSERT INTO gzo.ns.z4 SELECT id, id % 50, (id * 3) % 50 FROM range(500, 600)"))
    insert.start()
    val rewriteFailed =
      try { sql("CALL gzo.system.rewrite_clustered('ns.z4', 'a,b', 4)").collect(); false }
      catch { case _: Exception => true }
    insert.join()
    val n = sql("SELECT COUNT(*) FROM gzo.ns.z4").collect().head.getLong(0)
    assert(n === 600L,
      s"every row must survive the race (rewriteFailed=$rewriteFailed), got $n")
    assert(sql("SELECT COUNT(DISTINCT k) FROM gzo.ns.z4").collect().head.getLong(0) === 600L)
    // a clean retry always lands
    sql("CALL gzo.system.rewrite_clustered('ns.z4', 'a,b', 4)")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.z4").collect().head.getLong(0) === 600L)
  }

  test("partitioned tables cluster WITHIN partitions (r18): purity, either-dim pruning, DML, compact, dynamic overwrite") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.zp2")
    sql("""CREATE TABLE gzo.ns.zp2 (k BIGINT, a BIGINT, b BIGINT, p STRING)
           USING parquet PARTITIONED BY (p)""")
    def wave(lo: Int, hi: Int): String =
      s"""SELECT id, (id * 7919) % 1000, (id * 104729) % 1000,
                 CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END
          FROM range($lo, $hi)"""
    sql(s"INSERT INTO gzo.ns.zp2 ${wave(0, 2000)}")
    sql(s"INSERT INTO gzo.ns.zp2 ${wave(2000, 4000)}")
    val before = sql("SELECT * FROM gzo.ns.zp2 ORDER BY k").collect()
    val out = sql("CALL gzo.system.rewrite_clustered('ns.zp2', 'a,b', 4)").collect().head
    // 2 partitions x 4 cells, every row carried
    assert((out.getInt(1), out.getLong(2)) === ((8, 4000L)), out.toString)
    assert(sql("SELECT * FROM gzo.ns.zp2 ORDER BY k").collect() === before)
    // PARTITION PURITY: a partition predicate plans exactly that partition's
    // cell segments, each suffixed <part>~zc<i>
    val segsEu = plannedSegs(sql("SELECT k FROM gzo.ns.zp2 WHERE p = 'eu'"))
    assert(segsEu.size === 4 && segsEu.forall(s => s.contains("eu~zc")),
      s"eu probe must plan eu's 4 cells, got ${segsEu.mkString(", ")}")
    // EITHER-dimension pruning WITHIN the partition
    val segsA = plannedSegs(sql("SELECT k FROM gzo.ns.zp2 WHERE p = 'eu' AND a < 100"))
    val segsB = plannedSegs(sql("SELECT k FROM gzo.ns.zp2 WHERE p = 'eu' AND b < 100"))
    assert(segsA.size < 4, s"a-window must prune cells inside eu, planned ${segsA.size}/4")
    assert(segsB.size < 4, s"b-window must prune cells inside eu, planned ${segsB.size}/4")
    // COW DML preserves (partition, cell): survivors route back through
    // their source suffix — no merged segment, purity intact
    val del = sql("CALL gzo.system.delete_where('ns.zp2', 'k % 7 = 3')").collect().head
    assert(del.getLong(2) > 0)
    val segsAfterDel = plannedSegs(sql("SELECT k FROM gzo.ns.zp2 WHERE p = 'eu'"))
    assert(segsAfterDel.forall(_.contains("eu~zc")),
      s"survivors must stay in their (partition, cell), got ${segsAfterDel.mkString(", ")}")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.zp2 WHERE k % 7 = 3").collect()
      .head.getLong(0) === 0L)
    // STEADY STATE (r18): a plain append after clustering routes through the
    // persisted spec — per-(partition, cell) generations, NOT plain partition
    // segments — and compact folds each (partition, cell) back to one
    // segment, so the grid survives ongoing ingest without a re-cluster
    sql(s"INSERT INTO gzo.ns.zp2 ${wave(4000, 4400)}")
    val segsAppended = plannedSegs(sql("SELECT k FROM gzo.ns.zp2 WHERE p = 'eu'"))
    assert(segsAppended.forall(_.contains("eu~zc")),
      s"appends must stay in the grid, got ${segsAppended.mkString(", ")}")
    sql("CALL gzo.system.compact('ns.zp2')")
    val segsMixed = plannedSegs(sql("SELECT k FROM gzo.ns.zp2 WHERE p = 'eu'"))
    assert(segsMixed.count(_.contains("eu~zc")) === segsMixed.size &&
      segsMixed.size <= 4,
      s"compact must fold per (partition, cell), got ${segsMixed.mkString(", ")}")
    val expectEu = (0L until 4400L).count(i => i % 2 == 0 && !(i % 7 == 3 && i < 4000))
    assert(sql("SELECT COUNT(*) FROM gzo.ns.zp2 WHERE p = 'eu'").collect()
      .head.getLong(0) === expectEu.toLong)
    // DYNAMIC OVERWRITE of one partition must swap out its CELL segments too
    // (baseSuffix matching) — or the overwrite would silently double rows
    val usCount = sql("SELECT COUNT(*) FROM gzo.ns.zp2 WHERE p = 'us'").collect().head.getLong(0)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try sql("INSERT OVERWRITE gzo.ns.zp2 SELECT id, id % 10, id % 10, 'eu' FROM range(100)")
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.zp2 WHERE p = 'eu'").collect()
      .head.getLong(0) === 100L,
      "the overwritten partition's clustered segments must swap out completely")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.zp2 WHERE p = 'us'").collect()
      .head.getLong(0) === usCount, "untouched partitions carry by reference")
  }

  test("partitioned grids are STEADY-STATE (r18): appends and SQL COW declare the composed distribution") {
    root
    sql("DROP TABLE IF EXISTS gzo.ns.zp3")
    sql("""CREATE TABLE gzo.ns.zp3 (k BIGINT, a BIGINT, b BIGINT, p STRING)
           USING parquet PARTITIONED BY (p)""")
    sql("""INSERT INTO gzo.ns.zp3
           SELECT id, (id * 7919) % 1000, (id * 104729) % 1000,
                  CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END
           FROM range(0, 4000, 1, 8)""")
    sql("CALL gzo.system.rewrite_clustered('ns.zp3', 'a,b', 4)")
    def parquetFiles(): Int = {
      val dir = root.resolve("ns").resolve("zp3")
      val s = java.nio.file.Files.walk(dir)
      try {
        var c = 0
        val it = s.iterator()
        while (it.hasNext) {
          if (it.next().getFileName.toString.endsWith(".parquet")) c += 1
        }
        c
      } finally s.close()
    }
    // an 8-task append into the 2x4 (partition, cell) grid: the write
    // declares clustered(partCols ++ zcell(...)), so each (partition, cell)
    // shuffles to one task — at most one file per pair, not pairs x tasks
    val filesBefore = parquetFiles()
    sql("""INSERT INTO gzo.ns.zp3
           SELECT id, (id * 7919) % 1000, (id * 104729) % 1000,
                  CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END
           FROM range(4000, 8000, 1, 8)""")
    assert(parquetFiles() - filesBefore <= 8,
      s"expected <= 8 appended files (one per (partition, cell)), " +
        s"got ${parquetFiles() - filesBefore}")
    // every appended segment is partition-pure AND cell-pure, and a
    // one-dimension probe still prunes inside the partition
    val segsEu = plannedSegs(sql("SELECT k FROM gzo.ns.zp3 WHERE p = 'eu'"))
    assert(segsEu.forall(_.contains("eu~zc")), segsEu.mkString(", "))
    assert(plannedSegs(sql("SELECT k FROM gzo.ns.zp3 WHERE p = 'eu' AND a < 100")).size <
      segsEu.size, "appended generations must keep pruning")
    // SQL row-level COW routes replacements through (partition, cell): a
    // whole-table UPDATE from a multi-task scan writes ~one file per pair
    sql("UPDATE gzo.ns.zp3 SET k = k + 100000 WHERE k >= 0")
    val segsAll = plannedSegs(sql("SELECT k FROM gzo.ns.zp3 WHERE a >= 0"))
    assert(segsAll.forall(s => s.contains("eu~zc") || s.contains("us~zc")),
      segsAll.mkString(", "))
    val tableDir = root.resolve("ns").resolve("zp3")
    val files = segsAll.map { seg =>
      val s = java.nio.file.Files.list(tableDir.resolve(seg))
      try s.filter(_.getFileName.toString.endsWith(".parquet")).count().toInt
      finally s.close()
    }.sum
    assert(files <= 10,
      s"a distributed replacement writes ~one file per (partition, cell), " +
        s"got $files for <= 8 pairs")
    assert(sql("SELECT COUNT(*) FROM gzo.ns.zp3 WHERE k >= 100000").collect()
      .head.getLong(0) === 8000L)
  }

  test("refusal matrix: bucketed/partition-dimension, column count, non-numeric, bad width") {
    root
    // a clustering column that IS a partition column is a wasted dimension
    sql("DROP TABLE IF EXISTS gzo.ns.zp")
    sql("""CREATE TABLE gzo.ns.zp (k BIGINT, a BIGINT, p BIGINT) USING parquet
           PARTITIONED BY (p)""")
    sql("INSERT INTO gzo.ns.zp SELECT id, id, id % 2 FROM range(10)")
    val e1 = intercept[Exception](
      sql("CALL gzo.system.rewrite_clustered('ns.zp', 'p,a', 4)").collect())
    assert(e1.getMessage.contains("partition column"), e1.getMessage)
    // bucket-partitioned tables refuse
    sql("DROP TABLE IF EXISTS gzo.ns.zb")
    sql("""CREATE TABLE gzo.ns.zb (k BIGINT, a BIGINT, b BIGINT) USING parquet
           PARTITIONED BY (bucket(4, k))""")
    sql("INSERT INTO gzo.ns.zb SELECT id, id, id FROM range(10)")
    val e0 = intercept[Exception](
      sql("CALL gzo.system.rewrite_clustered('ns.zb', 'a,b', 4)").collect())
    assert(e0.getMessage.contains("bucket"), e0.getMessage)

    sql("DROP TABLE IF EXISTS gzo.ns.zs")
    sql("CREATE TABLE gzo.ns.zs (k BIGINT, s STRING, a BIGINT) USING parquet")
    sql("INSERT INTO gzo.ns.zs SELECT id, 'v', id FROM range(10)")
    val e2 = intercept[Exception](
      sql("CALL gzo.system.rewrite_clustered('ns.zs', 'k', 4)").collect())
    assert(e2.getMessage.contains("2-3 columns"), e2.getMessage)
    val e3 = intercept[Exception](
      sql("CALL gzo.system.rewrite_clustered('ns.zs', 'k,s', 4)").collect())
    assert(e3.getMessage.contains("z-order normalizes"), e3.getMessage)
    val e4 = intercept[Exception](
      sql("CALL gzo.system.rewrite_clustered('ns.zs', 'k,a', 1)").collect())
    assert(e4.getMessage.contains("[2, 4096]"), e4.getMessage)
  }
}
