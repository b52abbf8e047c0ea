package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for CHECK constraints (GraftChecks.scala): declared as
  * `graft.check.*` table properties, validated at CREATE TABLE, evaluated
  * per row in every SQL-surfaced writer; a violation fails the job and the
  * atomic commit publishes nothing. SQL semantics: NULL admits. */
class CheckConstraintSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_check_spec")
    spark.conf.set("spark.sql.catalog.gck", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gck.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)
  private def count(t: String): Long =
    sql(s"SELECT COUNT(*) c FROM gck.ns.$t").collect().head.getLong(0)

  test("violating insert fails the job and publishes nothing; valid rows land") {
    root
    sql("DROP TABLE IF EXISTS gck.ns.t1")
    sql("""CREATE TABLE gck.ns.t1 (k BIGINT, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.check.pos' = 'amt > 0')""")
    sql("INSERT INTO gck.ns.t1 VALUES (1, 10), (2, 20)")
    val e = intercept[Exception](
      sql("INSERT INTO gck.ns.t1 VALUES (3, 30), (4, -1)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CHECK constraint 'pos'")))
    // atomicity: the batch with one bad row contributed NOTHING
    assert(count("t1") === 2)
  }

  test("NULL admits (SQL check semantics); IS NOT NULL expresses NOT NULL") {
    root
    sql("DROP TABLE IF EXISTS gck.ns.t2")
    sql("""CREATE TABLE gck.ns.t2 (k BIGINT, amt BIGINT, tag STRING) USING parquet
           TBLPROPERTIES ('graft.check.pos' = 'amt > 0',
                          'graft.check.tagged' = 'tag IS NOT NULL')""")
    // amt NULL → pos is NULL → admits; tag non-null required
    sql("INSERT INTO gck.ns.t2 VALUES (1, NULL, 'a')")
    assert(count("t2") === 1)
    val e = intercept[Exception](sql("INSERT INTO gck.ns.t2 VALUES (2, 5, NULL)"))
    assert(e.getMessage.contains("tagged") ||
      Option(e.getCause).exists(_.getMessage.contains("tagged")))
  }

  test("checks ride the partitioned writer and branch writes") {
    root
    sql("DROP TABLE IF EXISTS gck.ns.t3")
    sql("""CREATE TABLE gck.ns.t3 (k BIGINT, p STRING, amt BIGINT) USING parquet
           PARTITIONED BY (p)
           TBLPROPERTIES ('graft.check.pos' = 'amt > 0')""")
    sql("INSERT INTO gck.ns.t3 VALUES (1, 'a', 10), (2, 'b', 20)")
    intercept[Exception](sql("INSERT INTO gck.ns.t3 VALUES (3, 'c', 0)"))
    assert(count("t3") === 2)
    // a WAP branch write is still gated — nothing unchecked can even be STAGED
    sql("CALL gck.system.create_branch('ns.t3', 'b')")
    import spark.implicits._
    intercept[Exception](Seq((9L, "z", -5L)).toDF("k", "p", "amt")
      .write.option("graft.branch", "b").mode("append").saveAsTable("gck.ns.t3"))
    assert(spark.read.option("graft.branch", "b").table("gck.ns.t3").count() === 2)
  }

  test("checks gate MERGE-written replacement rows (group-based COW)") {
    root
    sql("DROP TABLE IF EXISTS gck.ns.t4")
    sql("""CREATE TABLE gck.ns.t4 (k BIGINT, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.check.pos' = 'amt > 0')""")
    sql("INSERT INTO gck.ns.t4 VALUES (1, 10), (2, 20)")
    // the UPDATE would drive amt negative → the replacement write must fail
    // and the table must keep its pre-merge state
    val e = intercept[Exception](sql(
      """MERGE INTO gck.ns.t4 t USING (SELECT 1 AS k) s ON t.k = s.k
         WHEN MATCHED THEN UPDATE SET amt = -99"""))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CHECK constraint")))
    assert(sql("SELECT sum(amt) s FROM gck.ns.t4").collect().head.getLong(0) === 30)
  }

  test("CREATE TABLE validates checks up front") {
    root
    val e1 = intercept[Exception](sql(
      """CREATE TABLE gck.ns.bad1 (k BIGINT) USING parquet
         TBLPROPERTIES ('graft.check.x' = 'no_such_col > 0')"""))
    assert(e1.getMessage.contains("does not analyze"))
    val e2 = intercept[Exception](sql(
      """CREATE TABLE gck.ns.bad2 (k BIGINT) USING parquet
         TBLPROPERTIES ('graft.check.x' = 'k +')"""))
    assert(e2.getMessage.contains("cannot parse"))
  }

  test("ALTER ADD CONSTRAINT validates the full existing history; DROP stops gating") {
    root
    sql("DROP TABLE IF EXISTS gck.ns.t9")
    sql("CREATE TABLE gck.ns.t9 (k BIGINT, amt BIGINT) USING parquet")
    sql("INSERT INTO gck.ns.t9 VALUES (1, 10), (2, -5)")
    // a constraint the history violates is refused, with the count named
    val e = intercept[Exception](
      sql("ALTER TABLE gck.ns.t9 SET TBLPROPERTIES('graft.check.pos' = 'amt > 0')"))
    assert(e.getMessage.contains("1 existing row"))
    // clean the violation, re-add: accepted and gates FUTURE writes
    sql("DELETE FROM gck.ns.t9 WHERE amt < 0")
    sql("ALTER TABLE gck.ns.t9 SET TBLPROPERTIES('graft.check.pos' = 'amt > 0')")
    val e2 = intercept[Exception](sql("INSERT INTO gck.ns.t9 VALUES (3, -1)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e2).exists(_.contains("CHECK constraint 'pos'")))
    assert(count("t9") === 1)
    // DROP CONSTRAINT: the same insert now lands
    sql("ALTER TABLE gck.ns.t9 UNSET TBLPROPERTIES('graft.check.pos')")
    sql("INSERT INTO gck.ns.t9 VALUES (3, -1)")
    assert(count("t9") === 2)
    // dropping a constraint that does not exist is a loud error
    val e3 = intercept[Exception](
      sql("ALTER TABLE gck.ns.t9 UNSET TBLPROPERTIES('graft.check.nope')"))
    assert(e3.getMessage.contains("no CHECK constraint"))
  }

  test("ALTER ADD CONSTRAINT validates WAP-branch staged segments too") {
    // fast_forward's only guard is base == current, which ADD CONSTRAINT does
    // not move — so rows staged on a branch BEFORE the constraint must be
    // validated at ADD time or they publish unchecked (ADVICE r11, medium)
    import spark.implicits._
    root
    sql("DROP TABLE IF EXISTS gck.ns.t10")
    sql("CREATE TABLE gck.ns.t10 (k BIGINT, amt BIGINT) USING parquet")
    sql("INSERT INTO gck.ns.t10 VALUES (1, 10)")
    sql("CALL gck.system.create_branch('ns.t10', 'audit')")
    // stage a violating row on the branch; main's own history stays clean
    Seq((2L, -7L)).toDF("k", "amt").write.format("parquet")
      .option("graft.branch", "audit").mode("append").saveAsTable("gck.ns.t10")
    val e = intercept[Exception](
      sql("ALTER TABLE gck.ns.t10 SET TBLPROPERTIES('graft.check.pos' = 'amt > 0')"))
    assert(e.getMessage.contains("WAP branch"), e.getMessage)
    // the refused ALTER left no constraint behind: the branch still publishes
    sql("CALL gck.system.drop_branch('ns.t10', 'audit')")
    // with the offending branch gone, the same ALTER lands; and a fresh
    // branch staging a violating row now fails at WRITE time (branch writes
    // are check-gated), so the unchecked-publish window is fully closed
    sql("ALTER TABLE gck.ns.t10 SET TBLPROPERTIES('graft.check.pos' = 'amt > 0')")
    sql("CALL gck.system.create_branch('ns.t10', 'audit2')")
    val e2 = intercept[Exception](
      Seq((3L, -1L)).toDF("k", "amt").write.format("parquet")
        .option("graft.branch", "audit2").mode("append").saveAsTable("gck.ns.t10"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e2).exists(_.contains("CHECK constraint 'pos'")))
    sql("CALL gck.system.drop_branch('ns.t10', 'audit2')")
    assert(count("t10") === 1)
  }

  test("ADD CONSTRAINT on a base-lagging branch: base residue is NOT re-validated (MOR-deleted rows stay deleted)") {
    // A branch forked at a DV'd snapshot, then main compacts past it: the
    // branch's dirs still carry its BASE segments (no longer current main).
    // Validating those as "staged" — with NO delete vectors — resurrects the
    // MOR-deleted violating row into a spurious refusal (ADVICE r12, medium).
    // staged-only must mean dirs MINUS THE REF'S OWN BASE snapshot segments.
    root
    sql("DROP TABLE IF EXISTS gck.ns.t11")
    sql("""CREATE TABLE gck.ns.t11 (k BIGINT, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gck.ns.t11 VALUES (1, 10), (2, -5)")
    // MOR delete of the would-be violator: delete VECTOR, segment untouched
    sql("CALL gck.system.delete_where('ns.t11', 'amt < 0')")
    sql("CALL gck.system.create_branch('ns.t11', 'lag')")
    // main moves past the fork: compact materializes the DV into NEW
    // segments, so the branch's base segments are no longer in current main
    sql("CALL gck.system.compact('ns.t11', 134217728)")
    // the constraint every LIVE row satisfies must land — the deleted -5 row
    // lives only in the branch's base residue, which is not staged state
    sql("ALTER TABLE gck.ns.t11 SET TBLPROPERTIES('graft.check.pos' = 'amt > 0')")
    val e = intercept[Exception](sql("INSERT INTO gck.ns.t11 VALUES (3, -1)"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("CHECK constraint 'pos'")))
    // and the lagging branch can never publish anyway — the reason its base
    // residue needs no validation
    val ff = intercept[Exception](sql("CALL gck.system.fast_forward('ns.t11', 'lag')"))
    assert(msgs(ff).exists(_.contains("main moved")))
    sql("CALL gck.system.drop_branch('ns.t11', 'lag')")
    assert(count("t11") === 1)
  }

  test("ADD CONSTRAINT still validates TRUE staged appends on a base-lagging branch") {
    // the subtraction is per-ref BASE segments, not "skip lagging branches":
    // a violating row genuinely STAGED on a lagging branch must still refuse
    import spark.implicits._
    root
    sql("DROP TABLE IF EXISTS gck.ns.t12")
    sql("""CREATE TABLE gck.ns.t12 (k BIGINT, amt BIGINT) USING parquet
           TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    sql("INSERT INTO gck.ns.t12 VALUES (1, 10), (2, -5)")
    sql("CALL gck.system.delete_where('ns.t12', 'amt < 0')")
    sql("CALL gck.system.create_branch('ns.t12', 'lag')")
    Seq((7L, -3L)).toDF("k", "amt").write.format("parquet")
      .option("graft.branch", "lag").mode("append").saveAsTable("gck.ns.t12")
    sql("CALL gck.system.compact('ns.t12', 134217728)")
    val e = intercept[Exception](
      sql("ALTER TABLE gck.ns.t12 SET TBLPROPERTIES('graft.check.pos' = 'amt > 0')"))
    assert(e.getMessage.contains("WAP branch"), e.getMessage)
    // exactly ONE violation — the staged append; the base residue's deleted
    // -5 row is not double-counted
    assert(e.getMessage.contains("1 row(s) staged"), e.getMessage)
    sql("CALL gck.system.drop_branch('ns.t12', 'lag')")
  }
}
