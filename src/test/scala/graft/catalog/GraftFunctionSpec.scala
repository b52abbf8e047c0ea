package graft.catalog

import graft.SparkSpec

/** Pins for persisted SQL FUNCTIONS (GraftFunctions + the view extension's
  * DDL/resolution wiring): create/call/compose/drop, the inline calling
  * convention (param/return casts, codegen survival), and the refusal
  * matrix (param-only bodies, recursion, builtin precedence, collisions). */
class GraftFunctionSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_fn_spec")
    spark.conf.set("spark.sql.catalog.gfn", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfn.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("create, call qualified, and the declared-type calling convention") {
    root
    sql("DROP FUNCTION IF EXISTS gfn.ns.cents")
    sql("CREATE FUNCTION gfn.ns.cents(x DOUBLE) RETURNS BIGINT RETURN CAST(FLOOR(x * 100) AS BIGINT)")
    assert(sql("SELECT gfn.ns.cents(12.345) AS c").collect().head.getLong(0) === 1234L)
    // argument cast to the declared param type: an INT argument widens
    assert(sql("SELECT gfn.ns.cents(7) AS c").collect().head.getLong(0) === 700L)
    // return cast: body yielding a narrower type still lands the declared one
    sql("CREATE FUNCTION gfn.ns.flag(x BIGINT) RETURNS STRING RETURN CASE WHEN x > 0 THEN 'pos' ELSE 'neg' END")
    assert(sql("SELECT gfn.ns.flag(-3) AS f").collect().head.getString(0) === "neg")
    // inlined, not interpreted: the call site plans inside WholeStageCodegen
    spark.range(100).createOrReplaceTempView("fn_codegen_probe")
    val df = sql("SELECT SUM(gfn.ns.cents(CAST(id AS DOUBLE))) AS s FROM fn_codegen_probe")
    assert(df.collect().head.getLong(0) === (0L until 100L).map(_ * 100).sum)
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "the inlined body must stay inside whole-stage codegen")
  }

  test("unqualified calls resolve in the current graft catalog; builtins always win one-part names") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.twice(x BIGINT) RETURNS BIGINT RETURN x * 2")
    // a graft function deliberately named like a builtin
    sql("CREATE OR REPLACE FUNCTION gfn.ns.abs(x BIGINT) RETURNS BIGINT RETURN x + 1000")
    val prevCat = spark.catalog.currentCatalog()
    try {
      sql("USE gfn.ns")
      assert(sql("SELECT twice(21) AS t").collect().head.getLong(0) === 42L)
      // builtin abs wins the bare name; qualification reaches the graft one
      assert(sql("SELECT CAST(abs(-5) AS BIGINT) AS a").collect().head.getLong(0) === 5L)
      assert(sql("SELECT gfn.ns.abs(-5) AS a").collect().head.getLong(0) === 995L)
    } finally sql(s"USE $prevCat")
    sql("DROP FUNCTION gfn.ns.abs")
  }

  test("composition expands through nested calls; direct recursion refuses with the chain named") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.cents2(x DOUBLE) RETURNS BIGINT RETURN CAST(FLOOR(x * 100) AS BIGINT)")
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.taxed(x DOUBLE, rate DOUBLE)
           RETURNS BIGINT RETURN gfn.ns.cents2(x * (1.0 + rate))""")
    assert(sql("SELECT gfn.ns.taxed(10.0, 0.1) AS t").collect().head.getLong(0) === 1100L)
    // an unqualified nested call resolves in the HOST's creation namespace
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.taxed2(x DOUBLE)
           RETURNS BIGINT RETURN cents2(x * 2)""")
    assert(sql("SELECT gfn.ns.taxed2(5.0) AS t").collect().head.getLong(0) === 1000L)
    // OR REPLACE into self-reference: the cycle fails the CALL, loudly
    sql("CREATE OR REPLACE FUNCTION gfn.ns.cents2(x DOUBLE) RETURNS BIGINT RETURN gfn.ns.cents2(x)")
    val e = intercept[Exception](sql("SELECT gfn.ns.cents2(1.0)").collect())
    assert(e.getMessage.contains("cents2"), e.getMessage)
    sql("CREATE OR REPLACE FUNCTION gfn.ns.cents2(x DOUBLE) RETURNS BIGINT RETURN CAST(FLOOR(x * 100) AS BIGINT)")
  }

  test("bodies may reference only their parameters; arity and decoration errors are loud") {
    root
    val e1 = intercept[Exception](
      sql("CREATE FUNCTION gfn.ns.bad(x BIGINT) RETURNS BIGINT RETURN x + stray_col"))
    assert(e1.getMessage.contains("parameters"), e1.getMessage)
    val e2 = intercept[Exception](sql("SELECT gfn.ns.twice(1, 2)").collect())
    assert(e2.getMessage.contains("argument"), e2.getMessage)
    val e3 = intercept[Exception](sql("SELECT gfn.ns.twice(DISTINCT 1)").collect())
    assert(e3.getMessage.contains("scalar"), e3.getMessage)
    // a body that cannot cast to the declared return type fails at CREATE
    val e4 = intercept[Exception](
      sql("CREATE FUNCTION gfn.ns.bad2(x BIGINT) RETURNS ARRAY<INT> RETURN x"))
    assert(e4 != null)
  }

  test("persistence: a second catalog instance over the same root serves the function") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.persist_probe(x BIGINT) RETURNS BIGINT RETURN x + 7")
    spark.conf.set("spark.sql.catalog.gfn2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfn2.root", root.toString)
    assert(sql("SELECT gfn2.ns.persist_probe(35) AS p").collect().head.getLong(0) === 42L)
  }

  test("drop semantics and name collisions with tables/views") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.dropme(x BIGINT) RETURNS BIGINT RETURN x")
    sql("DROP FUNCTION gfn.ns.dropme")
    val e1 = intercept[Exception](sql("DROP FUNCTION gfn.ns.dropme"))
    assert(e1.getMessage.toLowerCase.contains("routine") ||
      e1.getMessage.toLowerCase.contains("not found"), e1.getMessage)
    sql("DROP FUNCTION IF EXISTS gfn.ns.dropme") // no-op, no error

    sql("DROP TABLE IF EXISTS gfn.ns.tbl1")
    sql("CREATE TABLE gfn.ns.tbl1 (k BIGINT) USING parquet")
    val e2 = intercept[Exception](
      sql("CREATE FUNCTION gfn.ns.tbl1(x BIGINT) RETURNS BIGINT RETURN x"))
    assert(e2.getMessage.contains("ROUTINE_ALREADY_EXISTS") ||
      e2.getMessage.toLowerCase.contains("exists"), e2.getMessage)

    sql("CREATE OR REPLACE FUNCTION gfn.ns.fcol(x BIGINT) RETURNS BIGINT RETURN x")
    val e3 = intercept[Exception](sql("CREATE TABLE gfn.ns.fcol (k BIGINT) USING parquet"))
    assert(e3.getMessage.contains("FUNCTION"), e3.getMessage)
    val e4 = intercept[Exception](sql("CREATE VIEW gfn.ns.fcol AS SELECT 1 AS one"))
    assert(e4.getMessage.contains("FUNCTION"), e4.getMessage)
    // RETURNS TABLE refuses honestly
    val e5 = intercept[Exception](
      sql("CREATE FUNCTION gfn.ns.tf() RETURNS TABLE (a BIGINT) RETURN SELECT 1"))
    assert(e5.getMessage.contains("RETURNS TABLE"), e5.getMessage)
  }

  test("SHOW FUNCTIONS lists persisted functions; DESCRIBE FUNCTION prints the signature") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.show_probe(x BIGINT) RETURNS BIGINT RETURN x * 3")
    val listed = sql("SHOW FUNCTIONS IN gfn.ns").collect().map(_.getString(0))
    assert(listed.exists(_.endsWith("show_probe")), listed.mkString(", "))
    assert(listed.exists(_.endsWith("bucket")), "the bound bucket builtin lists too")
    val desc = sql("DESCRIBE FUNCTION gfn.ns.show_probe").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("show_probe") && desc.contains("x * 3"), desc)
  }

  test("functions work inside persisted views (abstractions compose)") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.sq(x BIGINT) RETURNS BIGINT RETURN x * x")
    sql("DROP TABLE IF EXISTS gfn.ns.base1")
    sql("CREATE TABLE gfn.ns.base1 USING parquet AS SELECT id AS k FROM range(5)")
    sql("DROP VIEW IF EXISTS gfn.ns.v_sq")
    sql("CREATE VIEW gfn.ns.v_sq AS SELECT k, gfn.ns.sq(k) AS ksq FROM gfn.ns.base1")
    val rows = sql("SELECT ksq FROM gfn.ns.v_sq ORDER BY k").collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(0L, 1L, 4L, 9L, 16L))
  }
}
