package graft.catalog

import graft.SparkSpec

/** Shared executor-visible counter for the call-by-value pins: a Scala
  * object deserializes to the JVM-singleton in local mode, so task closures
  * increment the same AtomicLong the assertions read. */
object FnProbeCounter {
  val n = new java.util.concurrent.atomic.AtomicLong()
}

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
    // RETURNS TABLE is supported since r17 (shares the routine namespace)
    sql("DROP FUNCTION IF EXISTS gfn.ns.tf")
    sql("CREATE FUNCTION gfn.ns.tf() RETURNS TABLE (a BIGINT) RETURN SELECT 1 AS a")
    val e5 = intercept[Exception](sql("CREATE TABLE gfn.ns.tf (k BIGINT) USING parquet"))
    assert(e5.getMessage.contains("FUNCTION"), e5.getMessage)
    sql("DROP FUNCTION gfn.ns.tf")
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

  test("CREATE OR REPLACE never throws ROUTINE_ALREADY_EXISTS under a concurrent-create race") {
    root
    // Two threads CREATE OR REPLACE the same brand-new name concurrently:
    // whichever loses the createExclusive race must fall back to overwrite
    // (the TOCTOU between exists() and createExclusive() — ADVICE r16),
    // never throw. Repeated with fresh names to actually hit the race.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    (1 to 10).foreach { i =>
      val ddl = s"CREATE OR REPLACE FUNCTION gfn.ns.race_$i(x BIGINT) RETURNS BIGINT RETURN x + $i"
      val gate = new java.util.concurrent.CountDownLatch(1)
      val fs = (1 to 2).map { _ =>
        Future { gate.await(); spark.sql(ddl).collect() }
      }
      gate.countDown()
      fs.foreach(Await.result(_, 60.seconds)) // either attempt throwing fails the test
      assert(sql(s"SELECT gfn.ns.race_$i(0) AS r").collect().head.getLong(0) === i.toLong)
      sql(s"DROP FUNCTION gfn.ns.race_$i")
    }
  }

  test("SHOW FUNCTIONS/VIEWS LIKE treats regex metacharacters literally (filterPattern semantics)") {
    root
    sql("CREATE OR REPLACE FUNCTION gfn.ns.like_probe(x BIGINT) RETURNS BIGINT RETURN x")
    // metacharacters must not throw PatternSyntaxException nor mis-match
    assert(sql("SHOW FUNCTIONS IN gfn.ns LIKE 'fn_+'").collect().isEmpty)
    assert(sql("SHOW FUNCTIONS IN gfn.ns LIKE 'a(b'").collect().isEmpty)
    // '*' expands, everything else is literal; '|' separates alternatives
    val starred = sql("SHOW FUNCTIONS IN gfn.ns LIKE 'like*'").collect().map(_.getString(0))
    assert(starred.exists(_.endsWith("like_probe")), starred.mkString(", "))
    val alts = sql("SHOW FUNCTIONS IN gfn.ns LIKE 'nope|like_probe'").collect().map(_.getString(0))
    assert(alts.exists(_.endsWith("like_probe")), alts.mkString(", "))
    // the view twin shares the matcher
    sql("DROP VIEW IF EXISTS gfn.ns.vlike")
    sql("CREATE VIEW gfn.ns.vlike AS SELECT 1 AS one")
    assert(sql("SHOW VIEWS IN gfn.ns LIKE 'v(l'").collect().isEmpty)
    assert(sql("SHOW VIEWS IN gfn.ns LIKE 'vl*|zz'").collect().map(_.getString(1)).contains("vlike"))
    sql("DROP VIEW gfn.ns.vlike")
    sql("DROP FUNCTION gfn.ns.like_probe")
  }

  test("a broken v1 current database does not block graft inlining (narrow probe catch)") {
    root
    // sessionResolvable probes the v1 session catalog for one-part names;
    // that probe throwing NoSuchDatabaseException (current db dropped out
    // from under the session) must read as "not resolvable here" — the graft
    // inline proceeds — while any other probe failure would propagate.
    sql("CREATE OR REPLACE FUNCTION gfn.ns.ncp(x BIGINT) RETURNS BIGINT RETURN x + 1")
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val prevCat = spark.catalog.currentCatalog()
    val prevDb = cs.sessionState.catalog.getCurrentDatabase
    sql("CREATE DATABASE IF NOT EXISTS doomed_db")
    cs.sessionState.catalog.setCurrentDatabase("doomed_db")
    cs.sessionState.catalog.dropDatabase("doomed_db", ignoreIfNotExists = false, cascade = true)
    try {
      sql("USE gfn.ns")
      assert(sql("SELECT ncp(41) AS r").collect().head.getLong(0) === 42L)
    } finally {
      cs.sessionState.catalog.setCurrentDatabase(prevDb)
      sql(s"USE $prevCat")
    }
    sql("DROP FUNCTION gfn.ns.ncp")
  }

  // Spark's parser REFUSES qualified table-valued-function names in FROM
  // (INVALID_TABLE_VALUED_FUNC_NAME, AstBuilder.visitTableValuedFunction), so
  // graft table functions are callable by their ONE-PART name under
  // `USE <cat>.<ns>` — the same reach-it-by-current-catalog rule one-part
  // scalar names follow; builtin TVFs (range, explode) always win the name.
  private def inNs[A](body: => A): A = {
    val prevCat = spark.catalog.currentCatalog()
    try { sql("USE gfn.ns"); body } finally sql(s"USE $prevCat")
  }

  test("RETURNS TABLE: create, call in FROM, params in WHERE, join of inlined twins") {
    root
    sql("DROP TABLE IF EXISTS gfn.ns.tf_base")
    sql("CREATE TABLE gfn.ns.tf_base USING parquet AS SELECT id AS k, id * 10 AS v FROM range(20)")
    // one-part table name in the body: resolves in the function's OWN namespace
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.top_v(lo BIGINT)
           RETURNS TABLE (k BIGINT, v BIGINT)
           RETURN SELECT k, v FROM tf_base WHERE k >= lo""")
    inNs {
      val rows = sql("SELECT k, v FROM top_v(17) ORDER BY k").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.toSeq === Seq((17L, 170L), (18L, 180L), (19L, 190L)))
      // two inlined instances join like any relations
      val j = sql("""SELECT a.k AS k, b.v AS v2 FROM top_v(15) a
                     JOIN top_v(18) b ON a.k = b.k ORDER BY a.k""").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(j.toSeq === Seq((18L, 180L), (19L, 190L)))
      // a builtin TVF name always wins: range() stays Spark's
      assert(sql("SELECT COUNT(*) FROM range(5)").collect().head.getLong(0) === 5L)
      // shadow-free params substitute DIRECTLY (recorded at CREATE), so the
      // param predicate constant-folds and PUSHES into the parquet scan —
      // at 100 TB the call prunes instead of scanning under a join
      val plan = sql("SELECT k FROM top_v(17)").queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(k,17)"),
        s"the param filter must reach PushedFilters:\n${plan.take(900)}")
    }
    // zero-parameter form
    sql("CREATE OR REPLACE FUNCTION gfn.ns.tf0() RETURNS TABLE (one BIGINT) RETURN SELECT 1 AS one")
    inNs { assert(sql("SELECT one FROM tf0()").collect().head.getLong(0) === 1L) }
    // table + column aliases at the call site survive the inline
    inNs {
      assert(sql("SELECT t.x FROM tf0() AS t(x)").collect().head.getLong(0) === 1L)
      assert(sql("SELECT t.one FROM tf0() t").collect().head.getLong(0) === 1L)
    }
    // composition: the body calls a persisted SCALAR function
    sql("CREATE OR REPLACE FUNCTION gfn.ns.sc2(x BIGINT) RETURNS BIGINT RETURN x * 2")
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.tf2(n BIGINT) RETURNS TABLE (kk BIGINT)
           RETURN SELECT sc2(k) AS kk FROM tf_base WHERE k < n""")
    inNs {
      assert(sql("SELECT kk FROM tf2(3) ORDER BY kk").collect().map(_.getLong(0)).toSeq
        === Seq(0L, 2L, 4L))
    }
    // SHOW/DESCRIBE carry the table form
    val desc = sql("DESCRIBE FUNCTION gfn.ns.top_v").collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("TABLE") && desc.contains("top_v"), desc)
  }

  test("RETURNS TABLE: shadowing, cycle refusal, cross-call and validation refusals") {
    root
    sql("DROP TABLE IF EXISTS gfn.ns.tf_base2")
    sql("CREATE TABLE gfn.ns.tf_base2 USING parquet AS SELECT id AS k FROM range(20)")
    // a body table column SHADOWS a same-named parameter (innermost scope —
    // the SQL-standard rule; params live in the lateral OUTER scope)
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.tf_shadow(k BIGINT)
           RETURNS TABLE (r BIGINT) RETURN SELECT MAX(k) AS r FROM tf_base2""")
    inNs {
      assert(sql("SELECT r FROM tf_shadow(1000)").collect().head.getLong(0) === 19L,
        "the body's k must bind the TABLE column, not the parameter")
    }
    // OR REPLACE into self-reference: the cycle fails the CALL with the chain
    sql("CREATE OR REPLACE FUNCTION gfn.ns.tfr(n BIGINT) RETURNS TABLE (a BIGINT) RETURN SELECT 1 AS a")
    sql("CREATE OR REPLACE FUNCTION gfn.ns.tfr(n BIGINT) RETURNS TABLE (a BIGINT) RETURN SELECT a FROM tfr(n)")
    inNs {
      val e = intercept[Exception](sql("SELECT * FROM tfr(1)").collect())
      assert(e.getMessage.contains("tfr"), e.getMessage)
    }
    // a table function is not a scalar; a scalar is not a table
    sql("CREATE OR REPLACE FUNCTION gfn.ns.sc3(x BIGINT) RETURNS BIGINT RETURN x")
    val e2 = intercept[Exception](sql("SELECT gfn.ns.tf_shadow(1)").collect())
    assert(e2.getMessage.contains("FROM"), e2.getMessage)
    inNs {
      val e3 = intercept[Exception](sql("SELECT * FROM sc3(1)").collect())
      assert(e3.getMessage.contains("scalar"), e3.getMessage)
    }
    // arity mismatch between the body and the declared columns fails at CREATE
    val e4 = intercept[Exception](sql(
      "CREATE FUNCTION gfn.ns.tf_bad(n BIGINT) RETURNS TABLE (a BIGINT, b BIGINT) RETURN SELECT 1 AS a"))
    assert(e4.getMessage.contains("declares"), e4.getMessage)
    // a parameter colliding with a declared output column fails at CREATE
    val e5 = intercept[Exception](sql(
      "CREATE FUNCTION gfn.ns.tf_bad2(a BIGINT) RETURNS TABLE (a BIGINT) RETURN SELECT 1 AS a"))
    assert(e5.getMessage.contains("collides"), e5.getMessage)
    // a stray column in the body fails at CREATE (real scopes, loud failure)
    intercept[Exception](sql(
      "CREATE FUNCTION gfn.ns.tf_bad3(n BIGINT) RETURNS TABLE (a BIGINT) RETURN SELECT stray FROM tf_base2"))
  }

  test("call-by-value: a non-deterministic scalar argument evaluates ONCE per row") {
    root
    import org.apache.spark.sql.functions.udf
    spark.udf.register("gfn_probe",
      udf((x: Double) => { FnProbeCounter.n.incrementAndGet(); x }).asNondeterministic())
    sql("CREATE OR REPLACE FUNCTION gfn.ns.sqcbv(x DOUBLE) RETURNS DOUBLE RETURN x * x")
    FnProbeCounter.n.set(0)
    val rows = sql(
      "SELECT gfn.ns.sqcbv(gfn_probe(CAST(id AS DOUBLE) + 1.0)) AS r FROM range(64)")
      .collect().map(_.getDouble(0))
    assert(FnProbeCounter.n.get === 64L,
      "substitution is call-by-name; the gate must bind the argument ONCE per row")
    assert(rows.sorted.toSeq === (1 to 64).map(i => (i.toDouble * i)).sorted)
    // rand(): the body must square ONE sample (x*x ~ uniform^2, mean 1/3),
    // not multiply two independent draws (mean 1/4) — 1000 samples puts the
    // two means ~8 sigma apart
    val mean = sql(
      "SELECT AVG(r) AS m FROM (SELECT gfn.ns.sqcbv(rand(7)) AS r FROM range(1000))")
      .collect().head.getDouble(0)
    assert(mean > 0.30 && mean < 0.37,
      s"mean $mean: f(rand()) must evaluate rand() once per row (E[u^2]=1/3), " +
        "not per occurrence (E[u1*u2]=1/4)")
    // a deterministic expensive-looking argument (scalar subquery) also
    // binds once and still computes correctly through the With shape
    assert(sql("SELECT gfn.ns.sqcbv((SELECT 3.0)) AS r").collect().head.getDouble(0) === 9.0)
    // deterministic arguments keep the plain substitution: still codegen
    val df = sql("SELECT SUM(gfn.ns.sqcbv(CAST(id AS DOUBLE))) AS s FROM range(10)")
    assert(df.collect().head.getDouble(0) === (0 until 10).map(i => i.toDouble * i).sum)
    assert(df.queryExecution.executedPlan.toString.contains("*("))
  }

  test("call-by-value: a non-deterministic table-function argument keeps the lateral (ONE evaluation)") {
    root
    import org.apache.spark.sql.functions.udf
    sql("DROP TABLE IF EXISTS gfn.ns.tf_cbv_base")
    sql("CREATE TABLE gfn.ns.tf_cbv_base USING parquet AS SELECT id AS k FROM range(20)")
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.tf_cbv(lo BIGINT)
           RETURNS TABLE (k BIGINT) RETURN SELECT k FROM tf_cbv_base WHERE k >= lo""")
    spark.udf.register("gfn_probe2",
      udf((x: Long) => { FnProbeCounter.n.incrementAndGet(); x }).asNondeterministic())
    inNs {
      FnProbeCounter.n.set(0)
      val rows = sql("SELECT k FROM tf_cbv(gfn_probe2(17)) ORDER BY k")
        .collect().map(_.getLong(0))
      assert(rows.toSeq === Seq(17L, 18L, 19L))
      assert(FnProbeCounter.n.get === 1L,
        "direct substitution would re-evaluate the argument per body reference; " +
          "a non-deterministic argument must ride the one-row lateral")
      // a deterministic scalar-subquery argument also refuses direct
      // substitution (it would re-execute inside the body's scope)
      val sq = sql("SELECT k FROM tf_cbv((SELECT MAX(k) FROM tf_cbv_base))")
        .collect().map(_.getLong(0))
      assert(sq.toSeq === Seq(19L))
      // literal arguments still take the direct path: the param predicate
      // constant-folds and reaches the parquet scan's PushedFilters
      val plan = sql("SELECT k FROM tf_cbv(17)").queryExecution.executedPlan.toString
      assert(plan.contains("GreaterThanOrEqual(k,17)"), plan.take(900))
    }
  }

  test("CTE names suppress qualification only in their own scope; CTE bodies rewrite too") {
    root
    sql("DROP TABLE IF EXISTS gfn.ns.cte_base")
    sql("CREATE TABLE gfn.ns.cte_base USING parquet AS SELECT id AS k FROM range(10)")
    // one-part table names INSIDE a CTE definition must resolve in the
    // function's own namespace (CTE defs are innerChildren on a parsed plan —
    // a plain transform misses them entirely)
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.tf_cte(lo BIGINT)
           RETURNS TABLE (n BIGINT)
           RETURN WITH big AS (SELECT k FROM cte_base WHERE k >= lo)
                  SELECT COUNT(*) AS n FROM big""")
    inNs {
      assert(sql("SELECT n FROM tf_cte(7)").collect().head.getLong(0) === 3L)
    }
    // a CTE name in one scope must not suppress qualification of the same
    // name used as a real table elsewhere: `cte_base` here is BOTH a CTE
    // (inside the subquery) and the real table (outer) — the outer reference
    // must still qualify to the function's namespace
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.tf_cte2()
           RETURNS TABLE (total BIGINT, sub BIGINT)
           RETURN SELECT (SELECT COUNT(*) FROM cte_base) AS total,
                         (WITH cte_base AS (SELECT 1 AS one) SELECT COUNT(*) FROM cte_base) AS sub""")
    inNs {
      val r = sql("SELECT total, sub FROM tf_cte2()").collect().head
      assert(r.getLong(0) === 10L, "the real table reference must qualify despite a sibling CTE of the same name")
      assert(r.getLong(1) === 1L, "the in-scope CTE name must NOT qualify")
    }
  }

  test("schema evolution re-checks shadow-freedom: a later ADD COLUMN shadows the param (r18)") {
    root
    sql("DROP TABLE IF EXISTS gfn.ns.tf_evo")
    sql("CREATE TABLE gfn.ns.tf_evo USING parquet AS SELECT id AS k FROM range(10)")
    sql("""CREATE OR REPLACE FUNCTION gfn.ns.tf_ev(lo BIGINT)
           RETURNS TABLE (n BIGINT) RETURN SELECT COUNT(*) AS n FROM tf_evo WHERE k >= lo""")
    inNs {
      assert(sql("SELECT n FROM tf_ev(7)").collect().head.getLong(0) === 3L)
    }
    // the table gains a column carrying the PARAM's name: SQL's innermost
    // scope says the COLUMN now binds inside the body — substParams was
    // recorded shadow-free at CREATE, so the call-time re-check must drop to
    // the lateral and read the column (all-NULL -> k >= NULL -> 0 rows), not
    // keep substituting the stale literal (which would answer 3)
    sql("ALTER TABLE gfn.ns.tf_evo ADD COLUMN lo BIGINT")
    inNs {
      assert(sql("SELECT n FROM tf_ev(7)").collect().head.getLong(0) === 0L,
        "the new column must shadow the parameter")
    }
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
