package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for incrementally maintained materialized views
  * (GraftMaterializedView.scala): create_mv materializes a COUNT/SUM
  * group-by at the source's current snapshot; refresh_mv applies only the
  * CDC deltas since the watermark (O(rows changed)), handles group birth,
  * update, and death, commits data + watermark atomically, and replays are
  * no-ops (exactly-once registry). The invariant throughout: after refresh,
  * the MV equals a full recompute of the source. */
class MaterializedViewSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_mv_spec")
    spark.conf.set("spark.sql.catalog.gmv", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmv.root", d.toString)
    // this suite's invariant is "MV == full recompute of the SOURCE"; the
    // transparent rewrite (GraftMvRewrite, its own spec) would serve the
    // recompute FROM the MV and make every comparison circular
    spark.conf.set("spark.graft.mv.rewrite", "false")
    d
  }

  override def afterAll(): Unit = {
    // the session is JVM-shared across suites — restore the default
    spark.conf.unset("spark.graft.mv.rewrite")
    super.afterAll()
  }

  private def sql(q: String) = spark.sql(q)

  private def mvRows(t: String): Seq[(Long, Long, Long)] =
    sql(s"SELECT b, n_rows, sum_amt FROM gmv.ns.$t ORDER BY b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def recompute(src: String): Seq[(Long, Long, Long)] =
    sql(s"SELECT b, COUNT(*) n, SUM(amt) s FROM gmv.ns.$src GROUP BY b ORDER BY b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  private def mk(src: String): Unit = {
    sql(s"DROP TABLE IF EXISTS gmv.ns.$src")
    sql(s"""CREATE TABLE gmv.ns.$src (k BIGINT, b BIGINT, amt BIGINT) USING parquet
            TBLPROPERTIES ('graft.delete-mode'='merge-on-read',
                           'graft.update-mode'='merge-on-read')""")
    val vals = (1L to 30L).map(k => s"($k, ${k % 5}, ${k * 10})").mkString(", ")
    sql(s"INSERT INTO gmv.ns.$src VALUES $vals")
  }

  test("create_mv materializes; refresh after append/delete/update matches full recompute") {
    root
    mk("s1")
    sql("DROP TABLE IF EXISTS gmv.ns.mv1")
    val created = sql(
      "CALL gmv.system.create_mv('ns.mv1', 'ns.s1', keys => 'b', sums => 'amt')")
      .collect().head
    assert(created.getAs[Long]("n_groups") === 5)
    assert(mvRows("mv1") === recompute("s1"))

    // mixed DML: append (group growth), delete (shrink), update (value move)
    sql("INSERT INTO gmv.ns.s1 VALUES (31, 1, 999), (32, 2, 1)")
    sql("DELETE FROM gmv.ns.s1 WHERE k IN (5, 10)") // group 0 shrinks
    sql("UPDATE gmv.ns.s1 SET amt = amt + 7 WHERE k = 3") // group 3 value moves
    val r = sql("CALL gmv.system.refresh_mv('ns.mv1')").collect().head
    assert(r.getAs[Long]("groups_changed") > 0)
    assert(r.getAs[Long]("groups_deleted") === 0)
    assert(mvRows("mv1") === recompute("s1"))
  }

  test("refresh handles group birth and group death") {
    root
    mk("s2")
    sql("DROP TABLE IF EXISTS gmv.ns.mv2")
    sql("CALL gmv.system.create_mv('ns.mv2', 'ns.s2', keys => 'b', sums => 'amt')")
    // birth: a brand-new bucket; death: bucket 4 fully deleted
    sql("INSERT INTO gmv.ns.s2 VALUES (100, 77, 5), (101, 77, 6)")
    sql("DELETE FROM gmv.ns.s2 WHERE b = 4")
    val r = sql("CALL gmv.system.refresh_mv('ns.mv2')").collect().head
    assert(r.getAs[Long]("groups_deleted") === 1)
    assert(mvRows("mv2") === recompute("s2"))
    assert(!mvRows("mv2").exists(_._1 == 4L), "dead group must leave the MV")
    assert(mvRows("mv2").exists(_._1 == 77L), "new group must enter the MV")
  }

  test("refresh is incremental (touched-group appends) and idempotent at the same version") {
    root
    mk("s3")
    sql("DROP TABLE IF EXISTS gmv.ns.mv3")
    sql("CALL gmv.system.create_mv('ns.mv3', 'ns.s3', keys => 'b', sums => 'amt')")
    sql("INSERT INTO gmv.ns.s3 VALUES (200, 1, 1)") // touches ONLY group 1
    val r1 = sql("CALL gmv.system.refresh_mv('ns.mv3')").collect().head
    assert(r1.getAs[Long]("groups_changed") === 1, "only the touched group rewrites")
    // second refresh at the same source version: watermark already there → no-op
    val r2 = sql("CALL gmv.system.refresh_mv('ns.mv3')").collect().head
    assert(r2.getAs[Long]("groups_changed") === 0)
    assert(r2.getAs[Long]("from_version") === r2.getAs[Long]("to_version"))
    assert(mvRows("mv3") === recompute("s3"))
    // the no-op did not commit a new MV snapshot
    val snaps = sql("SELECT count(*) c FROM gmv.ns.mv3.snapshots").collect().head.getLong(0)
    sql("CALL gmv.system.refresh_mv('ns.mv3')")
    assert(sql("SELECT count(*) c FROM gmv.ns.mv3.snapshots")
      .collect().head.getLong(0) === snaps)
  }

  test("refresh survives a MOR upsert on the source (CDC nets update pairs)") {
    root
    mk("s4")
    sql("DROP TABLE IF EXISTS gmv.ns.mv4")
    sql("CALL gmv.system.create_mv('ns.mv4', 'ns.s4', keys => 'b', sums => 'amt')")
    // upsert: k=1 moves value (same group), k=40 is new in group 0
    spark.sql("SELECT * FROM VALUES (1L, 1L, 1000L), (40L, 0L, 7L) AS v(k, b, amt)")
      .createOrReplaceTempView("mv4_src")
    sql("CALL gmv.system.upsert('ns.s4', 'mv4_src', keys => 'k')")
    sql("CALL gmv.system.refresh_mv('ns.mv4')")
    assert(mvRows("mv4") === recompute("s4"))
  }

  test("create_mv refuses non-numeric sums and min/max specs") {
    root
    mk("s5")
    sql("DROP TABLE IF EXISTS gmv.ns.s5str")
    sql("CREATE TABLE gmv.ns.s5str (k BIGINT, tag STRING) USING parquet")
    val e1 = intercept[Exception](sql(
      "CALL gmv.system.create_mv('ns.mv5a', 'ns.s5str', keys => 'k', sums => 'tag')"))
    assert(e1.getMessage.contains("not numeric"))
    val e2 = intercept[Exception](sql(
      "CALL gmv.system.create_mv('ns.mv5b', 'ns.s5', keys => 'b', sums => 'min:amt')"))
    assert(e2.getMessage.contains("mins/maxs parameters"),
      "colon specs point at the dedicated mins/maxs parameters now")
  }

  test("MIN/MAX maintenance: inserts tighten arithmetically, extremum deletes re-aggregate the group") {
    root
    sql("DROP TABLE IF EXISTS gmv.ns.s6")
    sql("CREATE TABLE gmv.ns.s6 (b BIGINT, amt BIGINT) USING parquet")
    sql("INSERT INTO gmv.ns.s6 VALUES (1, 10), (1, 20), (1, 20), (2, 5), (2, 7)")
    sql("CALL gmv.system.create_mv('ns.mv6', 'ns.s6', keys => 'b', " +
      "sums => 'amt', mins => 'amt', maxs => 'amt')")
    def mv: Map[Long, (Long, Long, Long, Long)] =
      sql("SELECT b, n_rows, sum_amt, min_amt, max_amt FROM gmv.ns.mv6")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(mv === Map(1L -> (3L, 50L, 10L, 20L), 2L -> (2L, 12L, 5L, 7L)))
    // insert-only delta: extrema tighten with pure arithmetic (no rescan)
    sql("INSERT INTO gmv.ns.s6 VALUES (1, 3), (2, 100)")
    sql("CALL gmv.system.refresh_mv('ns.mv6')")
    assert(mv === Map(1L -> (4L, 53L, 3L, 20L), 2L -> (3L, 112L, 5L, 100L)))
    // EXTREMUM DEATH: delete BOTH copies of group 1's max (20) — the stored
    // extremum is gone, so the group must re-aggregate from the source
    sql("DELETE FROM gmv.ns.s6 WHERE b = 1 AND amt = 20")
    sql("CALL gmv.system.refresh_mv('ns.mv6')")
    assert(mv === Map(1L -> (2L, 13L, 3L, 10L), 2L -> (3L, 112L, 5L, 100L)))
    // delete a NON-extremum row: arithmetic path, extrema unchanged
    sql("DELETE FROM gmv.ns.s6 WHERE b = 2 AND amt = 7")
    sql("CALL gmv.system.refresh_mv('ns.mv6')")
    assert(mv === Map(1L -> (2L, 13L, 3L, 10L), 2L -> (2L, 105L, 5L, 100L)))
    // UPDATE that moves the min up (delete+insert of the extremum)
    sql("UPDATE gmv.ns.s6 SET amt = 50 WHERE b = 2 AND amt = 5")
    sql("CALL gmv.system.refresh_mv('ns.mv6')")
    assert(mv === Map(1L -> (2L, 13L, 3L, 10L), 2L -> (2L, 150L, 50L, 100L)))
    // group death alongside extremum churn
    sql("DELETE FROM gmv.ns.s6 WHERE b = 1")
    sql("CALL gmv.system.refresh_mv('ns.mv6')")
    assert(mv === Map(2L -> (2L, 150L, 50L, 100L)))
  }

  test("MIN/MAX with duplicate extremum values: deleting one copy keeps the other") {
    root
    sql("DROP TABLE IF EXISTS gmv.ns.s7")
    sql("CREATE TABLE gmv.ns.s7 (b BIGINT, amt BIGINT, tag STRING) USING parquet")
    sql("INSERT INTO gmv.ns.s7 VALUES (1, 10, 'a'), (1, 10, 'b'), (1, 30, 'c')")
    sql("CALL gmv.system.create_mv('ns.mv7', 'ns.s7', keys => 'b', mins => 'amt')")
    // delete ONE of the two min copies: the rescan must find the survivor
    // (pure arithmetic would have no way to know a duplicate remains)
    sql("DELETE FROM gmv.ns.s7 WHERE tag = 'a'")
    sql("CALL gmv.system.refresh_mv('ns.mv7')")
    val m = sql("SELECT b, n_rows, min_amt FROM gmv.ns.mv7").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(m === Seq((1L, 2L, 10L)))
  }

  test("MIN/MAX + COMPUTED keys: the endangered-group rescan groups by the key expr (r20)") {
    root
    sql("DROP TABLE IF EXISTS gmv.ns.s8")
    sql("CREATE TABLE gmv.ns.s8 (k BIGINT, d DATE, amt BIGINT) USING parquet")
    sql("""INSERT INTO gmv.ns.s8 VALUES
           (1, DATE'2024-01-05', 10), (2, DATE'2024-01-20', 30),
           (3, DATE'2024-02-05', 7),  (4, DATE'2024-02-20', 70)""")
    sql("""CALL gmv.system.create_mv('ns.mv8', 'ns.s8',
           keys => 'month(d) AS m', sums => 'amt', mins => 'amt', maxs => 'amt')""")
    // delete month 1's current MIN: the group is ENDANGERED — the bounded
    // rescan must recompute month(d) over the source to find the survivor
    sql("DELETE FROM gmv.ns.s8 WHERE k = 1")
    sql("CALL gmv.system.refresh_mv('ns.mv8')")
    val m = sql("SELECT m, n_rows, sum_amt, min_amt, max_amt FROM gmv.ns.mv8 ORDER BY m")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(m === Seq((1, 1L, 30L, 30L, 30L), (2, 2L, 77L, 7L, 70L)))
    // inserts tighten arithmetically (no rescan needed) with the same keys
    sql("INSERT INTO gmv.ns.s8 VALUES (5, DATE'2024-01-25', 2)")
    sql("CALL gmv.system.refresh_mv('ns.mv8')")
    val m2 = sql("SELECT m, n_rows, min_amt FROM gmv.ns.mv8 ORDER BY m")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(m2 === Seq((1, 2L, 2L), (2, 2L, 7L)))
  }
}
