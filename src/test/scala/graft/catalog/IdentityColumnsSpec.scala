package graft.catalog

import graft.SparkSpec

/** Pins for IDENTITY columns (`GENERATED ALWAYS AS IDENTITY`, GraftIdentity):
  * allocation on omitted columns, exact dense values for single-partition
  * inserts, START/STEP honored, commit-monotone uniqueness across appends,
  * GENERATED ALWAYS explicit-value refusal, engine-owned allocation state,
  * and the unsupported-surface refusals (BY DEFAULT, partitioned, MOR,
  * streaming/MERGE INSERT documented separately). */
class IdentityColumnsSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_idn")
    spark.conf.set("spark.sql.catalog.gidn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gidn.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("omitted column allocates; single-partition inserts pin exact dense values") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t1")
    sql("""CREATE TABLE gidn.ns.t1
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.t1 (v) VALUES (10), (20), (30)") // VALUES = one partition
    val rows = sql("SELECT id, v FROM gidn.ns.t1 ORDER BY v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((1000L, 10L), (1001L, 20L), (1002L, 30L)),
      "a single-partition insert allocates densely from START")
    // second commit: every new id is strictly above the first commit's max
    sql("INSERT INTO gidn.ns.t1 (v) VALUES (40), (50)")
    val all = sql("SELECT id FROM gidn.ns.t1").collect().map(_.getLong(0))
    assert(all.distinct.length === 5, "ids must be unique across commits")
    assert(sql("SELECT id FROM gidn.ns.t1 WHERE v >= 40").collect()
      .map(_.getLong(0)).forall(_ > 1002L),
      "allocation is commit-monotone: later commits allocate above earlier ones")
  }

  test("START/STEP honored") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t2")
    sql("""CREATE TABLE gidn.ns.t2
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 5),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.t2 (v) VALUES (1), (2)")
    assert(sql("SELECT id FROM gidn.ns.t2 ORDER BY v").collect().map(_.getLong(0)).toSeq
      === Seq(100L, 105L))
  }

  test("negative step DESCENDS and never re-allocates across commits") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t2n")
    sql("""CREATE TABLE gidn.ns.t2n
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY -5),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.t2n (v) VALUES (1), (2), (3)") // one partition: 100,95,90
    assert(sql("SELECT id FROM gidn.ns.t2n ORDER BY v").collect().map(_.getLong(0)).toSeq
      === Seq(100L, 95L, 90L))
    // the high-water must advance from the DIRECTIONAL extreme (min), not the
    // numeric max — otherwise this second commit would re-issue 95 and 90
    sql("INSERT INTO gidn.ns.t2n (v) VALUES (4), (5)")
    val ids = sql("SELECT id FROM gidn.ns.t2n").collect().map(_.getLong(0))
    assert(ids.distinct.length === 5, s"descending ids must stay unique, got ${ids.sorted.toSeq}")
    assert(sql("SELECT id FROM gidn.ns.t2n WHERE v >= 4").collect().map(_.getLong(0))
      .forall(_ < 90L), "later commits allocate strictly below the earlier extreme")
  }

  test("GENERATED ALWAYS: explicit values fail the JOB; nothing commits") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t3")
    sql("""CREATE TABLE gidn.ns.t3
           (id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.t3 (v) VALUES (1)")
    intercept[Exception] { sql("INSERT INTO gidn.ns.t3 VALUES (777, 2)") }
    assert(sql("SELECT COUNT(*) FROM gidn.ns.t3").collect().head.getLong(0) === 1L,
      "the refused batch must publish nothing")
  }

  test("allocation state is engine-owned; identity columns cannot evolve") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t4")
    sql("CREATE TABLE gidn.ns.t4 (id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT) USING parquet")
    intercept[Exception] {
      sql("ALTER TABLE gidn.ns.t4 SET TBLPROPERTIES ('graft.identity.next.id' = '1')")
    }
    intercept[Exception] { sql("ALTER TABLE gidn.ns.t4 RENAME COLUMN id TO id2") }
    intercept[Exception] { sql("ALTER TABLE gidn.ns.t4 DROP COLUMN id") }
    // non-identity columns still evolve freely
    sql("ALTER TABLE gidn.ns.t4 RENAME COLUMN v TO val")
    assert(sql("SELECT * FROM gidn.ns.t4").schema.fieldNames.toSeq === Seq("id", "val"))
  }

  test("merge-on-read surfaces allocate (r19): delta MERGE mints, MOR delete composes") {
    root
    // update-mode=mor: MERGE takes the position-delta path, whose insert
    // writer mints for NULL ids and advances the high-water on the same
    // delta commit (GraftIdentity.RowAllocator inside GraftDeltaWriter)
    sql("DROP TABLE IF EXISTS gidn.ns.t7")
    sql("""CREATE TABLE gidn.ns.t7
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
            k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    sql("INSERT INTO gidn.ns.t7 (k, v) SELECT id, id * 10 FROM range(5)") // ids 10..18
    sql("""MERGE INTO gidn.ns.t7 t
           USING (SELECT 1L AS k, 111L AS v UNION ALL SELECT 100L, 1000L
                  UNION ALL SELECT 101L, 1010L) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val rows = sql("SELECT id, k, v FROM gidn.ns.t7").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 7, rows.sorted.toSeq.toString)
    val ids = rows.map(_._1)
    assert(ids.distinct.length === 7, s"delta-minted ids must be unique: ${ids.sorted.toSeq}")
    assert(ids.forall(i => i >= 10 && (i - 10) % 2 == 0), s"grid: ${ids.sorted.toSeq}")
    // the matched row kept its id (updated IN PLACE via delete+insert of the
    // same carried id) and took the new value
    assert(rows.filter(_._2 == 1L).map(_._3).toSeq === Seq(111L))
    assert(rows.filter(_._2 >= 100L).forall(_._1 >= 20L),
      s"minted ids allocate from the high-water (20): ${rows.sorted.toSeq}")
    // same commit advanced the high-water: a later INSERT cannot collide
    sql("INSERT INTO gidn.ns.t7 (k, v) VALUES (200, 2000)")
    val all = sql("SELECT id FROM gidn.ns.t7").collect().map(_.getLong(0))
    assert(all.distinct.length === 8, s"post-merge insert collided: ${all.sorted.toSeq}")
    // ALWAYS still refuses an explicit at/beyond-water id inside the delta
    val e = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.t7 t USING (SELECT 300L AS k, 1L AS v) s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (99999, s.k, s.v)""")
    }
    assert(e.getMessage != null)
    assert(sql("SELECT COUNT(*) FROM gidn.ns.t7 WHERE k = 300").collect()
      .head.getLong(0) === 0L, "the refused delta merge must publish nothing")
    // delete-mode=mor composes: MOR deletes append nothing
    sql("DROP TABLE IF EXISTS gidn.ns.t7c")
    sql("""CREATE TABLE gidn.ns.t7c
           (id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gidn.ns.t7c (v) VALUES (1), (2)")
    sql("DELETE FROM gidn.ns.t7c WHERE v = 1")
    assert(sql("SELECT COUNT(*) FROM gidn.ns.t7c").collect().head.getLong(0) === 1L)
  }

  test("partitioned tables allocate (r17): per-partition fan-out, global uniqueness, CAS advance") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.pt1")
    sql("""CREATE TABLE gidn.ns.pt1
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
            geo STRING, v BIGINT) USING parquet PARTITIONED BY (geo)""")
    // two append waves across three partition values each
    sql("""INSERT INTO gidn.ns.pt1 (geo, v)
           SELECT CASE id % 3 WHEN 0 THEN 'eu' WHEN 1 THEN 'us' ELSE 'ap' END, id
           FROM range(30)""")
    sql("""INSERT INTO gidn.ns.pt1 (geo, v)
           SELECT CASE id % 3 WHEN 0 THEN 'eu' WHEN 1 THEN 'us' ELSE 'ap' END, 100 + id
           FROM range(30)""")
    val ids = sql("SELECT id FROM gidn.ns.pt1").collect().map(_.getLong(0))
    assert(ids.length === 60 && ids.distinct.length === 60,
      "ids must be globally unique across partitions and waves")
    assert(ids.forall(i => i >= 100L && (i - 100L) % 3L == 0L),
      "every id sits on the start+k*step grid")
    // wave 2 allocates strictly beyond wave 1 (the high-water CAS advanced)
    val w1max = sql("SELECT MAX(id) FROM gidn.ns.pt1 WHERE v < 100").collect().head.getLong(0)
    val w2min = sql("SELECT MIN(id) FROM gidn.ns.pt1 WHERE v >= 100").collect().head.getLong(0)
    assert(w2min > w1max, s"wave 2 min $w2min must exceed wave 1 max $w1max")
    // partition purity survives the identity wrap: one partition value per segment
    val segs = sql("SELECT DISTINCT geo FROM gidn.ns.pt1 WHERE geo = 'eu'").collect()
    assert(segs.length === 1)
    // GENERATED ALWAYS still refuses explicit values on the partitioned path
    intercept[Exception] {
      sql("INSERT INTO gidn.ns.pt1 (id, geo, v) VALUES (9999, 'eu', 1)")
    }
    // partitioned COW UPDATE keeps ids (nullReject path with op-column offset)
    sql("UPDATE gidn.ns.pt1 SET v = v + 1000 WHERE geo = 'eu' AND v = 0")
    assert(sql("SELECT COUNT(DISTINCT id) FROM gidn.ns.pt1").collect()
      .head.getLong(0) === 60L, "COW rewrite must not mint or lose ids")
  }

  test("identity column as the partition column routes on the FILLED id") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.pt2")
    sql("""CREATE TABLE gidn.ns.pt2
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet PARTITIONED BY (id)""")
    sql("INSERT INTO gidn.ns.pt2 (v) VALUES (10), (20)")
    val rows = sql("SELECT id, v FROM gidn.ns.pt2 ORDER BY v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).distinct.length === 2, "ids allocated and routed")
    assert(rows.forall(_._1 >= 1L))
  }

  test("BY DEFAULT: mixed explicit + allocated inserts are unique; explicit advances the high-water") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd1")
    sql("""CREATE TABLE gidn.ns.bd1
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 10 INCREMENT BY 10),
            v BIGINT) USING parquet""")
    // allocated: 10, 20
    sql("INSERT INTO gidn.ns.bd1 (v) VALUES (1), (2)")
    // explicit, BEYOND the high-water (next would be 30): accepted, recorded
    sql("INSERT INTO gidn.ns.bd1 (id, v) VALUES (55, 3)")
    // allocation resumes STRICTLY past the explicit value, back ON the grid
    sql("INSERT INTO gidn.ns.bd1 (v) VALUES (4)")
    val rows = sql("SELECT id, v FROM gidn.ns.bd1 ORDER BY v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq === Seq((10L, 1L), (20L, 2L), (55L, 3L), (60L, 4L)),
      "explicit 55 must advance the high-water to the next grid point (60)")
    assert(rows.map(_._1).distinct.length === 4, "no collision with the explicit id")
  }

  test("BY DEFAULT: explicit values BEHIND the high-water leave allocation untouched") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd2")
    sql("""CREATE TABLE gidn.ns.bd2
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 100 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.bd2 (v) VALUES (1), (2), (3)") // 100..102
    // a backfill carrying an OLD key (the CDC-mirror shape): below high-water
    sql("INSERT INTO gidn.ns.bd2 (id, v) VALUES (5, 4)")
    sql("INSERT INTO gidn.ns.bd2 (v) VALUES (5)")
    val ids = sql("SELECT id FROM gidn.ns.bd2 ORDER BY v").collect().map(_.getLong(0))
    assert(ids.toSeq === Seq(100L, 101L, 102L, 5L, 103L),
      "a behind-the-water explicit value must not move the allocator")
  }

  test("BY DEFAULT: single statement mixing NULL and explicit rows fills only the NULLs") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd3")
    sql("""CREATE TABLE gidn.ns.bd3
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.bd3 (id, v) VALUES (1000, 1), (NULL, 2), (2000, 3)")
    val rows = sql("SELECT id, v FROM gidn.ns.bd3 ORDER BY v").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows(0) === ((1000L, 1L)) && rows(2) === ((2000L, 3L)), "explicit ids kept")
    assert(rows(1)._1 >= 1L, "the NULL row allocated")
    assert(rows.map(_._1).distinct.length === 3)
    // high-water passed 2000: the next allocation must land beyond it
    sql("INSERT INTO gidn.ns.bd3 (v) VALUES (4)")
    assert(sql("SELECT id FROM gidn.ns.bd3 WHERE v = 4").collect().head.getLong(0) > 2000L,
      "the commit advances past the largest explicit value in the same write")
  }

  test("BY DEFAULT: descending step tracks the explicit MIN, stays on grid") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd4")
    sql("""CREATE TABLE gidn.ns.bd4
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 0 INCREMENT BY -10),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.bd4 (v) VALUES (1)")        // 0
    sql("INSERT INTO gidn.ns.bd4 (id, v) VALUES (-35, 2)") // explicit, off-grid, beyond
    sql("INSERT INTO gidn.ns.bd4 (v) VALUES (3)")
    assert(sql("SELECT id FROM gidn.ns.bd4 ORDER BY v").collect().map(_.getLong(0)).toSeq
      === Seq(0L, -35L, -40L),
      "descending: next grid point strictly below the explicit -35 is -40")
  }

  test("BY DEFAULT: row-level rewrites advance the high-water past hoisted ids (r18)") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd5")
    sql("""CREATE TABLE gidn.ns.bd5
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.bd5 (v) VALUES (1), (2)") // ids 1, 2
    // UPDATE keeping existing (behind-water) ids: fine
    sql("UPDATE gidn.ns.bd5 SET v = v + 10 WHERE id = 1")
    assert(sql("SELECT v FROM gidn.ns.bd5 WHERE id = 1").collect().head.getLong(0) === 11L)
    // UPDATE hoisting an id past the allocator: pre-r18 this refused (the
    // rewrite commit had no high-water transaction); the rewrite commit now
    // carries the same propCas rider as appends, so the explicit id lands
    // AND the high-water advances past it — a later allocation cannot collide
    sql("UPDATE gidn.ns.bd5 SET id = 999 WHERE v = 2")
    assert(sql("SELECT COUNT(*) FROM gidn.ns.bd5 WHERE id = 999").collect()
      .head.getLong(0) === 1L)
    sql("INSERT INTO gidn.ns.bd5 (v) VALUES (3)")
    val ids = sql("SELECT id FROM gidn.ns.bd5").collect().map(_.getLong(0))
    assert(ids.distinct.length === 3, s"ids must stay unique, got ${ids.sorted.toSeq}")
    assert(ids.max === 1000L,
      s"the next allocation must sit on the grid past the hoisted 999, got ${ids.sorted.toSeq}")
  }

  test("MERGE INSERT mints identity ids (r18): allocation + high-water CAS ride the rewrite commit") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.m1")
    sql("""CREATE TABLE gidn.ns.m1
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
            k BIGINT, v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.m1 (k, v) SELECT id, id * 10 FROM range(5)") // ids 10..18
    // the canonical CDC surrogate-key load: matched rows update, not-matched
    // rows INSERT with the identity column omitted — the engine mints ids
    sql("""MERGE INTO gidn.ns.m1 t
           USING (SELECT 1L AS k, 111L AS v UNION ALL SELECT 3L, 333L
                  UNION ALL SELECT 100L, 1000L UNION ALL SELECT 101L, 1010L) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val rows = sql("SELECT id, k, v FROM gidn.ns.m1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 7)
    val ids = rows.map(_._1)
    assert(ids.distinct.length === 7, s"minted ids must be globally unique, got ${ids.sorted.toSeq}")
    assert(ids.forall(i => i >= 10 && (i - 10) % 2 == 0),
      s"every id must sit on the start+k*step grid, got ${ids.sorted.toSeq}")
    // matched rows keep their ids; updated values landed
    assert(rows.filter(_._2 == 1L).map(_._3).toSeq === Seq(111L))
    val minted = rows.filter(r => r._2 >= 100L).map(_._1)
    assert(minted.forall(_ >= 20L),
      s"minted ids allocate from the high-water (20), got ${minted.toSeq}")
    // the same commit advanced the high-water: a later INSERT cannot collide
    sql("INSERT INTO gidn.ns.m1 (k, v) VALUES (200, 2000)")
    val all = sql("SELECT id FROM gidn.ns.m1").collect().map(_.getLong(0))
    assert(all.distinct.length === 8, s"post-merge insert must not collide, got ${all.sorted.toSeq}")
    assert(all.max > minted.max, "the merge's propCas must have advanced the high-water")
    // ALWAYS still refuses an explicit id at/beyond the high-water inside a
    // rewrite (only an explicit MERGE INSERT / UPDATE SET can put one there)
    val e = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.m1 t USING (SELECT 300L AS k, 1L AS v) s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (99999, s.k, s.v)""")
    }
    assert(e.getMessage != null)
    assert(sql("SELECT COUNT(*) FROM gidn.ns.m1 WHERE k = 300").collect()
      .head.getLong(0) === 0L, "the refused merge must publish nothing")
  }

  test("MERGE INSERT mints ids on PARTITIONED identity tables (r18)") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.m2")
    sql("""CREATE TABLE gidn.ns.m2
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1 INCREMENT BY 1),
            geo STRING, k BIGINT, v BIGINT) USING parquet PARTITIONED BY (geo)""")
    sql("""INSERT INTO gidn.ns.m2 (geo, k, v)
           SELECT CASE id % 2 WHEN 0 THEN 'eu' ELSE 'us' END, id, id * 10 FROM range(10)""")
    sql("""MERGE INTO gidn.ns.m2 t
           USING (SELECT 'eu' AS geo, 0L AS k, 999L AS v
                  UNION ALL SELECT 'ap', 100L, 1000L
                  UNION ALL SELECT 'eu', 102L, 1020L) s
           ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v
           WHEN NOT MATCHED THEN INSERT (geo, k, v) VALUES (s.geo, s.k, s.v)""")
    val rows = sql("SELECT id, geo, k FROM gidn.ns.m2").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length === 12)
    assert(rows.map(_._1).distinct.length === 12,
      s"ids unique across partitions, got ${rows.map(_._1).sorted.toSeq}")
    // the minted 'ap' row landed partition-pure (a brand-new partition value
    // minted INSIDE the rewrite routes like any insert)
    assert(rows.count(_._2 == "ap") === 1)
    val ids2 = sql("SELECT id FROM gidn.ns.m2 WHERE k >= 100").collect().map(_.getLong(0))
    assert(ids2.forall(_ >= 11L), s"minted ids allocate from the high-water, got ${ids2.toSeq}")
  }

  test("BY DEFAULT: a same-statement explicit id inside the allocated range refuses the commit") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd6")
    sql("""CREATE TABLE gidn.ns.bd6
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    // next=1: the NULL row allocates 2 (rowIdx 1, one partition) — the same
    // value the explicit row carries. Pre-r17 this committed a silent
    // duplicate (the high-water only advances at commit); now the commit
    // refuses before any metadata moves (ADVICE r16 #1).
    val e = intercept[Exception] {
      sql("INSERT INTO gidn.ns.bd6 (id, v) VALUES (2, 1), (NULL, 2)")
    }
    assert(e.getMessage.contains("allocated range") ||
      (e.getCause != null && e.getCause.getMessage.contains("allocated range")),
      e.getMessage)
    assert(sql("SELECT COUNT(*) FROM gidn.ns.bd6").collect().head.getLong(0) === 0L,
      "the refused statement must not commit anything")
    // the well-separated shape (bd3's contract) still commits: explicit ids
    // far beyond what the statement allocates cannot collide
    sql("INSERT INTO gidn.ns.bd6 (id, v) VALUES (1000, 1), (NULL, 2)")
    val ids = sql("SELECT id FROM gidn.ns.bd6").collect().map(_.getLong(0))
    assert(ids.distinct.length === 2 && ids.contains(1000L))
    // explicit ids BEHIND the high-water in an allocating statement are the
    // backfill shape and commit fine (they can never collide with new ids)
    sql("INSERT INTO gidn.ns.bd6 (id, v) VALUES (-5, 3), (NULL, 4)")
    assert(sql("SELECT COUNT(DISTINCT id) FROM gidn.ns.bd6").collect()
      .head.getLong(0) === 4L)
  }

  test("overflow guard: ids near Long.MaxValue refuse loudly instead of wrapping") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.bd7")
    sql("""CREATE TABLE gidn.ns.bd7
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 1 INCREMENT BY 1),
            v BIGINT) USING parquet""")
    // an explicit id AT Long.MaxValue: the high-water advance (next grid
    // point strictly beyond) does not exist in BIGINT — the commit must
    // refuse, not wrap the persisted high-water negative (ADVICE r16 #2)
    val e = intercept[Exception] {
      sql(s"INSERT INTO gidn.ns.bd7 (id, v) VALUES (${Long.MaxValue}, 1)")
    }
    assert(e.getMessage.contains("overflow") ||
      (e.getCause != null && e.getCause.getMessage.contains("overflow")), e.getMessage)
    assert(sql("SELECT COUNT(*) FROM gidn.ns.bd7").collect().head.getLong(0) === 0L)
    // allocation itself is overflow-checked too: a START at the top of the
    // domain cannot silently wrap into issued (low) ids
    sql("DROP TABLE IF EXISTS gidn.ns.bd8")
    sql(s"""CREATE TABLE gidn.ns.bd8
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH ${Long.MaxValue - 5} INCREMENT BY 10),
            v BIGINT) USING parquet""")
    val e2 = intercept[Exception] { sql("INSERT INTO gidn.ns.bd8 (v) VALUES (1), (2)") }
    assert(e2.getMessage.contains("overflow") ||
      (e2.getCause != null && e2.getCause.getMessage.contains("overflow")), e2.getMessage)
    assert(sql("SELECT COUNT(*) FROM gidn.ns.bd8").collect().head.getLong(0) === 0L)
  }

  test("concurrent identity appends: exactly-one-wins CAS, no double allocation") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t9")
    sql("CREATE TABLE gidn.ns.t9 (id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT) USING parquet")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val results = (0 until 2).map { i =>
      Future {
        barrier.await()
        scala.util.Try(sql(s"INSERT INTO gidn.ns.t9 (v) SELECT id + ${i * 100} FROM range(50)"))
      }
    }
    val done = Await.result(Future.sequence(results), 120.seconds)
    val failures = done.filter(_.isFailure)
    // both may serialize cleanly (the table lock covers build→commit in one
    // JVM) — but a loser, if any, must fail LOUDLY with the CAS message
    failures.foreach { f =>
      val msg = f.failed.get.getMessage + Option(f.failed.get.getCause).map(_.getMessage).mkString
      assert(msg.contains("concurrent allocation") || msg.contains("retry the write"),
        s"a losing identity write must name the CAS conflict, got: $msg")
    }
    val ids = sql("SELECT id FROM gidn.ns.t9").collect().map(_.getLong(0))
    assert(ids.length === (2 - failures.size) * 50, "a failed batch publishes nothing")
    assert(ids.distinct.length === ids.length, "ids must be unique across concurrent winners")
    // the documented remediation works: a retry after a loss allocates fresh
    sql("INSERT INTO gidn.ns.t9 (v) VALUES (999)")
    val all = sql("SELECT id FROM gidn.ns.t9").collect().map(_.getLong(0))
    assert(all.distinct.length === all.length)
  }

  test("COW UPDATE/DELETE keep existing ids; ids survive compaction") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.t8")
    sql("CREATE TABLE gidn.ns.t8 (id BIGINT GENERATED ALWAYS AS IDENTITY, v BIGINT) USING parquet")
    sql("INSERT INTO gidn.ns.t8 (v) VALUES (1), (2), (3)")
    val before = sql("SELECT id, v FROM gidn.ns.t8 WHERE v = 2").collect().head.getLong(0)
    sql("UPDATE gidn.ns.t8 SET v = 22 WHERE v = 2")
    assert(sql("SELECT id FROM gidn.ns.t8 WHERE v = 22").collect().head.getLong(0) === before,
      "a COW rewrite must carry the row's allocated id unchanged")
    sql("DELETE FROM gidn.ns.t8 WHERE v = 1")
    sql("CALL gidn.system.compact('ns.t8')")
    val ids = sql("SELECT id FROM gidn.ns.t8").collect().map(_.getLong(0))
    assert(ids.length === 2 && ids.distinct.length === 2)
    // and the allocator still advances past everything ever allocated
    sql("INSERT INTO gidn.ns.t8 (v) VALUES (4)")
    assert(sql("SELECT MAX(id) FROM gidn.ns.t8").collect().head.getLong(0) > ids.max)
  }

  test("MOR upsert mints identity ids (r19): NULL ids allocate, high-water CAS rides the vector+append commit") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.u1")
    sql("""CREATE TABLE gidn.ns.u1
           (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
            k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gidn.ns.u1 (k, v) SELECT id, id * 10 FROM range(5)") // ids 10..18
    // CDC batch, id omitted (NULL) everywhere: one updated key + two new keys
    spark.sql("""SELECT CAST(NULL AS BIGINT) AS id, k, v FROM VALUES
                 (1L, 111L), (100L, 1000L), (101L, 1010L) AS t(k, v)""")
      .createOrReplaceTempView("u1_src")
    val res = sql("CALL gidn.system.upsert('ns.u1', 'u1_src', 'k')").collect().head
    assert((res.getLong(0), res.getLong(1)) === ((1L, 2L)))
    val rows = sql("SELECT id, k, v FROM gidn.ns.u1").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 7, rows.sorted.toSeq.toString) // key 1's old version vectored
    val ids = rows.map(_._1)
    assert(ids.distinct.length === 7, s"minted ids must be unique: ${ids.sorted.toSeq}")
    assert(ids.forall(i => i >= 10 && (i - 10) % 2 == 0),
      s"every id must sit on the start+k*step grid: ${ids.sorted.toSeq}")
    // the matched key's current version is the source row (upsert-as-replace:
    // a NULL-id source row mints a FRESH id even for a matched key — carry
    // the id in the source, or use MERGE, to keep surrogate keys stable)
    assert(rows.filter(_._2 == 1L).map(_._3).toSeq === Seq(111L))
    assert(rows.filter(r => r._2 == 1L || r._2 >= 100L).forall(_._1 >= 20L),
      s"batch ids allocate from the high-water (20): ${rows.sorted.toSeq}")
    // the same commit advanced the high-water: a later INSERT cannot collide
    sql("INSERT INTO gidn.ns.u1 (k, v) VALUES (200, 2000)")
    val all = sql("SELECT id FROM gidn.ns.u1").collect().map(_.getLong(0))
    assert(all.distinct.length === 8, s"post-upsert insert collided: ${all.sorted.toSeq}")
    // GENERATED ALWAYS: a source row carrying an explicit id refuses the
    // whole upsert before anything lands
    spark.sql("SELECT 99999L AS id, 300L AS k, 1L AS v").createOrReplaceTempView("u1_bad")
    intercept[Exception] { sql("CALL gidn.system.upsert('ns.u1', 'u1_bad', 'k')") }
    assert(sql("SELECT COUNT(*) FROM gidn.ns.u1 WHERE k = 300").collect()
      .head.getLong(0) === 0L, "the refused upsert must publish nothing")
    // exactly-once replay stays a no-op (no re-mint, no re-vector)
    spark.sql("""SELECT CAST(NULL AS BIGINT) AS id, 400L AS k, 4L AS v""")
      .createOrReplaceTempView("u1_b2")
    sql("CALL gidn.system.upsert('ns.u1', 'u1_b2', 'k', batch_id => 'e7')")
    val replay = sql("CALL gidn.system.upsert('ns.u1', 'u1_b2', 'k', batch_id => 'e7')")
      .collect().head
    assert((replay.getLong(0), replay.getLong(1)) === ((0L, 0L)))
    assert(sql("SELECT COUNT(*) FROM gidn.ns.u1 WHERE k = 400").collect()
      .head.getLong(0) === 1L)
  }

  test("UPDATE SET id = NULL on GENERATED ALWAYS refuses at analysis (r19)") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.n1")
    sql("""CREATE TABLE gidn.ns.n1
           (id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.n1 (k, v) VALUES (1, 10), (2, 20)")
    val before = sql("SELECT id FROM gidn.ns.n1 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    val e = intercept[Exception] { sql("UPDATE gidn.ns.n1 SET id = NULL WHERE k = 1") }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    // the MERGE UPDATE action refuses the same way
    val e2 = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.n1 t USING (SELECT 1L AS k) s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET id = NULL""")
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"), e2.getMessage)
    assert(sql("SELECT id FROM gidn.ns.n1 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq === before, "a refused statement changes nothing")
    // the DELTA (merge-on-read update-mode) rewrite refuses the same way —
    // its MergeRows ride under WriteDelta, not ReplaceData
    sql("DROP TABLE IF EXISTS gidn.ns.n1d")
    sql("""CREATE TABLE gidn.ns.n1d
           (id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    sql("INSERT INTO gidn.ns.n1d (k, v) VALUES (1, 10)")
    val e3 = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.n1d t USING (SELECT 1L AS k) s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET id = NULL""")
    }
    assert(e3.getMessage.contains("GENERATED ALWAYS"), e3.getMessage)
    // BY DEFAULT keeps the documented mint-on-NULL behavior (the user owns
    // the column; re-keying is an expressible intent there)
    sql("DROP TABLE IF EXISTS gidn.ns.n2")
    sql("""CREATE TABLE gidn.ns.n2
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY, k BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.n2 (k) VALUES (1)")
    sql("UPDATE gidn.ns.n2 SET id = NULL WHERE k = 1")
    assert(sql("SELECT id FROM gidn.ns.n2").collect().head.getLong(0) >= 1L)
  }

  test("MERGE NOT MATCHED INSERT with an explicit ALWAYS id refuses at analysis (r20)") {
    root
    sql("DROP TABLE IF EXISTS gidn.ns.mi1")
    sql("""CREATE TABLE gidn.ns.mi1
           (id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, v BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.mi1 (k, v) SELECT id, id * 10 FROM range(0, 9)")
    // an explicit LITERAL id BELOW the high-water (ids 1..9 exist, 3 is
    // taken): the writer cannot tell it from a carried row — the analysis
    // gate must refuse before it silently duplicates an allocated id
    val e = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.mi1 t USING (SELECT 99L AS k) s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (3, s.k, 0)""")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"), e.getMessage)
    assert(sql("SELECT count(*) FROM gidn.ns.mi1").collect().head.getLong(0) === 9L,
      "a refused MERGE changes nothing")
    assert(sql("SELECT count(DISTINCT id) FROM gidn.ns.mi1").collect().head.getLong(0) === 9L)
    // an EXPRESSION at the id ordinal refuses too (statically visible
    // explicit value, even though its runtime value is unknowable here)
    val e2 = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.mi1 t USING (SELECT 99L AS k) s ON t.k = s.k
             WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (s.k + 1, s.k, 0)""")
    }
    assert(e2.getMessage.contains("GENERATED ALWAYS"), e2.getMessage)
    // inserting NULL stays the legitimate minting path
    sql("""MERGE INTO gidn.ns.mi1 t USING (SELECT 99L AS k) s ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (NULL, s.k, 0)""")
    assert(sql("SELECT count(DISTINCT id) FROM gidn.ns.mi1").collect().head.getLong(0) === 10L)
    // and omitting the column entirely mints as before
    sql("""MERGE INTO gidn.ns.mi1 t USING (SELECT 98L AS k) s ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 0)""")
    assert(sql("SELECT count(DISTINCT id) FROM gidn.ns.mi1").collect().head.getLong(0) === 11L)
    // the MOR (merge-on-read update-mode) WriteDelta path refuses the same way
    sql("DROP TABLE IF EXISTS gidn.ns.mi2")
    sql("""CREATE TABLE gidn.ns.mi2
           (id BIGINT GENERATED ALWAYS AS IDENTITY, k BIGINT, v BIGINT) USING parquet
           TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    sql("INSERT INTO gidn.ns.mi2 (k, v) VALUES (1, 10)")
    val e3 = intercept[Exception] {
      sql("""MERGE INTO gidn.ns.mi2 t USING (SELECT 2L AS k) s ON t.k = s.k
             WHEN MATCHED THEN UPDATE SET v = 0
             WHEN NOT MATCHED THEN INSERT (id, k, v) VALUES (1, s.k, 0)""")
    }
    assert(e3.getMessage.contains("GENERATED ALWAYS"), e3.getMessage)
    // BY DEFAULT keeps accepting explicit inserted ids (the user owns them)
    sql("DROP TABLE IF EXISTS gidn.ns.mi3")
    sql("""CREATE TABLE gidn.ns.mi3
           (id BIGINT GENERATED BY DEFAULT AS IDENTITY, k BIGINT) USING parquet""")
    sql("INSERT INTO gidn.ns.mi3 (k) VALUES (1)")
    sql("""MERGE INTO gidn.ns.mi3 t USING (SELECT 2L AS k) s ON t.k = s.k
           WHEN NOT MATCHED THEN INSERT (id, k) VALUES (500, s.k)""")
    assert(sql("SELECT id FROM gidn.ns.mi3 WHERE k = 2").collect().head.getLong(0) === 500L)
  }
}
