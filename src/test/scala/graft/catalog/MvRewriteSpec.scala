package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Pins for the TRANSPARENT materialized-view rewrite (GraftMvRewrite): a
  * COUNT/SUM/MIN/MAX GROUP BY over a graft table with a registered FRESH MV
  * is served from the MV — same answer, O(groups) scan — and every
  * staleness / coverage / addressing hazard refuses the rewrite instead of
  * serving a wrong answer. */
class MvRewriteSpec extends SparkSpec {

  private lazy val root = {
    val d = Files.createTempDirectory("graft_mvr_spec")
    spark.conf.set("spark.sql.catalog.gmr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gmr.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  /** Does the executed plan scan table `t`? (plan-string match — AQE wraps
    * the BatchScan away from collectLeaves before execution) */
  private def scans(df: org.apache.spark.sql.DataFrame, t: String): Boolean =
    df.queryExecution.executedPlan.toString.contains(s"gmr.ns.$t[")

  private def rows(q: String): Seq[Seq[Any]] =
    sql(q).collect().toSeq.map(_.toSeq)

  /** The control: same query with the rewrite off. */
  private def control(q: String): Seq[Seq[Any]] = {
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try rows(q) finally spark.conf.set("spark.graft.mv.rewrite", "true")
  }

  private def mk(): Unit = {
    root
    sql("DROP TABLE IF EXISTS gmr.ns.mv1")
    sql("DROP TABLE IF EXISTS gmr.ns.s1")
    sql("CREATE TABLE gmr.ns.s1 (k BIGINT, b BIGINT, m BIGINT, amt BIGINT) USING parquet")
    sql("""INSERT INTO gmr.ns.s1
           SELECT id, id % 5, id % 3, id * 10 FROM range(0, 300)""")
    sql("""CALL gmr.system.create_mv('ns.mv1', 'ns.s1', keys => 'b,m',
           sums => 'amt', mins => 'amt', maxs => 'amt')""")
  }

  test("a fresh covered aggregate is served FROM the MV; answers identical") {
    mk()
    val q = """SELECT b, m, COUNT(*) AS n, SUM(amt) AS s, MIN(amt) AS mn, MAX(amt) AS mx
               FROM gmr.ns.s1 GROUP BY b, m ORDER BY b, m"""
    val df = sql(q)
    assert(scans(df, "mv1"), "fresh + covered must serve from the MV:\n" +
      df.queryExecution.executedPlan)
    assert(!scans(df, "s1"), "the source must not be scanned")
    assert(rows(q) === control(q))
  }

  test("rollup to a KEY SUBSET with a key predicate re-aggregates the MV") {
    mk()
    val q = """SELECT b, COUNT(*) AS n, SUM(amt) AS s, MAX(amt) AS mx
               FROM gmr.ns.s1 WHERE m = 1 GROUP BY b ORDER BY b"""
    val df = sql(q)
    assert(scans(df, "mv1") && !scans(df, "s1"),
      s"subset rollup must serve from the MV:\n${df.queryExecution.executedPlan}")
    assert(rows(q) === control(q))
    // global (no GROUP BY) over a key filter too
    val g = "SELECT COUNT(*) AS n, MIN(amt) AS mn FROM gmr.ns.s1 WHERE b = 2"
    assert(scans(sql(g), "mv1"))
    assert(rows(g) === control(g))
  }

  test("an empty global COUNT answers 0 through the MV, never NULL") {
    root
    sql("DROP TABLE IF EXISTS gmr.ns.mve")
    sql("DROP TABLE IF EXISTS gmr.ns.se")
    sql("CREATE TABLE gmr.ns.se (k BIGINT, b BIGINT, amt BIGINT) USING parquet")
    sql("CALL gmr.system.create_mv('ns.mve', 'ns.se', keys => 'b', sums => 'amt')")
    val q = "SELECT COUNT(*) AS n FROM gmr.ns.se"
    val df = sql(q)
    assert(scans(df, "mve"), df.queryExecution.executedPlan.toString)
    assert(df.collect().head.getLong(0) === 0L)
  }

  test("STALENESS gates: DML un-serves, refresh_mv re-serves") {
    mk()
    val q = "SELECT b, m, COUNT(*) AS n, SUM(amt) AS s FROM gmr.ns.s1 GROUP BY b, m ORDER BY b, m"
    assert(scans(sql(q), "mv1"))
    sql("INSERT INTO gmr.ns.s1 VALUES (1000, 1, 1, 77)")
    val stale = sql(q)
    assert(scans(stale, "s1") && !scans(stale, "mv1"),
      "a stale MV must NEVER serve")
    assert(rows(q) === control(q)) // and the source answer includes the new row
    sql("CALL gmr.system.refresh_mv('ns.mv1')")
    assert(scans(sql(q), "mv1"), "refresh restores serving")
    assert(rows(q) === control(q))
  }

  test("COUNT(col) and AVG(col) serve through the non-null counts — null semantics exact") {
    root
    sql("DROP TABLE IF EXISTS gmr.ns.mvn")
    sql("DROP TABLE IF EXISTS gmr.ns.sn")
    sql("CREATE TABLE gmr.ns.sn (k BIGINT, b BIGINT, amt BIGINT) USING parquet")
    // every third amt is NULL: AVG/COUNT(col) must skip them, n_rows cannot
    sql("""INSERT INTO gmr.ns.sn
           SELECT id, id % 4, CASE WHEN id % 3 = 0 THEN NULL ELSE id * 10 END
           FROM range(0, 200)""")
    sql("CALL gmr.system.create_mv('ns.mvn', 'ns.sn', keys => 'b', sums => 'amt')")
    val q = """SELECT b, COUNT(*) AS n, COUNT(amt) AS nn, ROUND(AVG(amt), 2) AS a
               FROM gmr.ns.sn GROUP BY b ORDER BY b"""
    def served = sql(q)
    assert(served.queryExecution.executedPlan.toString.contains("gmr.ns.mvn["),
      served.queryExecution.executedPlan.toString)
    assert(rows(q) === control(q))
    // nn maintenance through a refresh: insert nulls + non-nulls, delete both kinds
    sql("INSERT INTO gmr.ns.sn VALUES (1000, 1, NULL), (1001, 1, 333), (1002, 2, NULL)")
    sql("DELETE FROM gmr.ns.sn WHERE k IN (3, 4)") // k=3 null amt, k=4 non-null
    sql("CALL gmr.system.refresh_mv('ns.mvn')")
    assert(served.queryExecution.executedPlan.toString.contains("gmr.ns.mvn["))
    assert(rows(q) === control(q))
  }

  test("coverage refusals: non-key predicate, DISTINCT, unregistered column, grouped expression") {
    mk()
    def notServed(q: String): Unit = {
      val df = sql(q)
      assert(scans(df, "s1") && !scans(df, "mv1"),
        s"must not serve: $q\n${df.queryExecution.executedPlan}")
      assert(rows(q) === control(q))
    }
    notServed("SELECT b, COUNT(*) n FROM gmr.ns.s1 WHERE amt > 50 GROUP BY b ORDER BY b")
    notServed("SELECT b, COUNT(DISTINCT m) n FROM gmr.ns.s1 GROUP BY b ORDER BY b")
    notServed("SELECT b, SUM(k) s FROM gmr.ns.s1 GROUP BY b ORDER BY b")
    notServed("SELECT k, COUNT(*) n FROM gmr.ns.s1 GROUP BY k ORDER BY k LIMIT 1")
    notServed("SELECT b + 1 AS b1, COUNT(*) n FROM gmr.ns.s1 GROUP BY b + 1 ORDER BY b1")
  }

  test("FILTER-clause aggregates refuse — per-source-row counts are unservable from group summaries") {
    mk()
    // without the explicit aggregate-shape bail this served COUNT(*) FILTER
    // (WHERE b = 1) as a count over MV GROUP ROWS (one per key combo)
    // instead of source rows — silently wrong
    val q = """SELECT m, COUNT(*) FILTER (WHERE b = 1) AS n
               FROM gmr.ns.s1 GROUP BY m ORDER BY m"""
    val df = sql(q)
    assert(scans(df, "s1") && !scans(df, "mv1"),
      s"a FILTER-clause aggregate must not serve:\n${df.queryExecution.executedPlan}")
    assert(rows(q) === control(q))
    // sanity: per-group counts are 60 source rows each, not 3 key combos
    assert(rows(q).map(_(1)) === Seq(20L, 20L, 20L))
  }

  test("star shape: fact ⋈ dim GROUP BY dim attr serves from the fact MV") {
    mk()
    sql("DROP TABLE IF EXISTS gmr.ns.dimb")
    sql("CREATE TABLE gmr.ns.dimb (b BIGINT, name STRING, w BIGINT) USING parquet")
    sql("""INSERT INTO gmr.ns.dimb
           SELECT id, concat('seg_', CAST(id AS STRING)), id * 7 FROM range(0, 4)""")
    // dim keeps only 4 of the 5 b values: the INNER join multiplicity is
    // what the re-roll must reproduce exactly
    val q = """SELECT d.name, COUNT(*) AS n, SUM(f.amt) AS s, MIN(f.amt) AS mn
               FROM gmr.ns.s1 f JOIN gmr.ns.dimb d ON f.b = d.b
               GROUP BY d.name ORDER BY d.name"""
    val df = sql(q)
    assert(scans(df, "mv1") && !scans(df, "s1"),
      s"join-covered rollup must serve from the MV:\n${df.queryExecution.executedPlan}")
    assert(rows(q) === control(q))
    // mixed grouping (dim attr + fact key) and a fact-key WHERE compose
    val q2 = """SELECT d.name, f.m, COUNT(*) AS n, ROUND(AVG(f.amt), 2) AS a
                FROM gmr.ns.s1 f JOIN gmr.ns.dimb d ON f.b = d.b
                WHERE f.m = 1 GROUP BY d.name, f.m ORDER BY d.name"""
    val df2 = sql(q2)
    assert(scans(df2, "mv1") && !scans(df2, "s1"),
      s"mixed grouping + key WHERE must serve:\n${df2.queryExecution.executedPlan}")
    assert(rows(q2) === control(q2))
    // a dim row matching MANY fact rows and a dim value appearing twice:
    // duplicate dim keys multiply fact groups — still exact
    sql("INSERT INTO gmr.ns.dimb VALUES (2, 'dup_of_2', 14)")
    val q3 = """SELECT d.name, COUNT(*) AS n, SUM(f.amt) AS s
                FROM gmr.ns.s1 f JOIN gmr.ns.dimb d ON f.b = d.b
                GROUP BY d.name ORDER BY d.name"""
    assert(scans(sql(q3), "mv1"))
    assert(rows(q3) === control(q3))
  }

  test("multi-dim star and snowflake serve from the fact MV (r19)") {
    mk() // s1 with mv1, keys (b, m)
    sql("DROP TABLE IF EXISTS gmr.ns.dim1")
    sql("CREATE TABLE gmr.ns.dim1 (b BIGINT, name STRING, w BIGINT) USING parquet")
    sql("INSERT INTO gmr.ns.dim1 SELECT id, concat('b', CAST(id AS STRING)), id % 3 FROM range(0, 4)")
    sql("DROP TABLE IF EXISTS gmr.ns.dim2")
    sql("CREATE TABLE gmr.ns.dim2 (m BIGINT, label STRING) USING parquet")
    sql("INSERT INTO gmr.ns.dim2 SELECT id, concat('m', CAST(id AS STRING)) FROM range(0, 2)")
    // star: both fact join keys are MV keys
    val q = """SELECT d1.name, d2.label, COUNT(*) AS n, SUM(f.amt) AS s
               FROM gmr.ns.s1 f
               JOIN gmr.ns.dim1 d1 ON f.b = d1.b
               JOIN gmr.ns.dim2 d2 ON f.m = d2.m
               GROUP BY d1.name, d2.label ORDER BY d1.name, d2.label"""
    val df = sql(q)
    assert(scans(df, "mv1") && !scans(df, "s1"),
      s"two-dim star must serve from the MV:\n${df.queryExecution.executedPlan}")
    assert(rows(q) === control(q))
    // snowflake: dim2 hangs off dim1 (a dim-dim equality never touches the
    // fact — it rides through the rewrite untouched)
    val q2 = """SELECT d2.label, COUNT(*) AS n, SUM(f.amt) AS s
                FROM gmr.ns.s1 f
                JOIN gmr.ns.dim1 d1 ON f.b = d1.b
                JOIN gmr.ns.dim2 d2 ON d1.w = d2.m
                GROUP BY d2.label ORDER BY d2.label"""
    val df2 = sql(q2)
    assert(scans(df2, "mv1") && !scans(df2, "s1"),
      s"snowflake must serve from the MV:\n${df2.queryExecution.executedPlan}")
    assert(rows(q2) === control(q2))
    // one NON-key fact join in the tree refuses the whole candidate
    val q3 = """SELECT d1.name, COUNT(*) AS n
                FROM gmr.ns.s1 f
                JOIN gmr.ns.dim1 d1 ON f.b = d1.b
                JOIN gmr.ns.dim2 d2 ON f.k = d2.m
                GROUP BY d1.name ORDER BY d1.name"""
    val df3 = sql(q3)
    assert(scans(df3, "s1") && !scans(df3, "mv1"),
      s"a non-key fact join anywhere must refuse:\n${df3.queryExecution.executedPlan}")
    assert(rows(q3) === control(q3))
  }

  test("star-shape refusals: non-key join, dim-side aggregate, outer join") {
    mk()
    sql("DROP TABLE IF EXISTS gmr.ns.dimr")
    sql("CREATE TABLE gmr.ns.dimr (b BIGINT, w BIGINT) USING parquet")
    sql("INSERT INTO gmr.ns.dimr SELECT id, id * 7 FROM range(0, 4)")
    def notServed(q: String): Unit = {
      val df = sql(q)
      assert(scans(df, "s1") && !scans(df, "mv1"),
        s"must not serve: $q\n${df.queryExecution.executedPlan}")
      assert(rows(q) === control(q))
    }
    // join on a NON-key fact column: group rows have mixed join keys, the
    // multiplicity argument collapses
    notServed("""SELECT d.w, COUNT(*) AS n FROM gmr.ns.s1 f
                 JOIN gmr.ns.dimr d ON f.k = d.b GROUP BY d.w ORDER BY d.w""")
    // SUM over a DIM column repeats per fact row — unservable
    notServed("""SELECT f.b, SUM(d.w) AS s FROM gmr.ns.s1 f
                 JOIN gmr.ns.dimr d ON f.b = d.b GROUP BY f.b ORDER BY f.b""")
    // outer join: null-padded rows have multiplicities the MV cannot see
    notServed("""SELECT f.b, COUNT(*) AS n FROM gmr.ns.s1 f
                 LEFT JOIN gmr.ns.dimr d ON f.b = d.b GROUP BY f.b ORDER BY f.b""")
  }

  test("addressing refusals: time travel and clones never serve from the original's MV") {
    mk()
    // time travel: a pinned read addresses its own snapshot, not "current" —
    // even when the numbers coincide the rewrite conservatively refuses
    val tt = sql("SELECT b, COUNT(*) n FROM gmr.ns.s1 VERSION AS OF 1 GROUP BY b")
    assert(!scans(tt, "mv1"), "time travel must not serve from the MV")
    // a zero-copy clone carries the source's props (incl. the MV registry);
    // the back-check (mv.source resolves to the CLONE's dir? no) refuses
    sql("DROP TABLE IF EXISTS gmr.ns.s1c")
    sql("CALL gmr.system.clone_table('ns.s1', 'ns.s1c')")
    val qc = "SELECT b, m, COUNT(*) AS n FROM gmr.ns.s1c GROUP BY b, m ORDER BY b, m"
    val dfc = sql(qc)
    assert(scans(dfc, "s1c") && !scans(dfc, "mv1"),
      s"a clone must not serve from the original's MV:\n${dfc.queryExecution.executedPlan}")
    assert(rows(qc) === control(qc))
  }

  test("COMPUTED keys (r20): month(d) rollups serve, non-matching exprs refuse") {
    root
    sql("DROP TABLE IF EXISTS gmr.ns.mvm")
    sql("DROP TABLE IF EXISTS gmr.ns.sm")
    sql("CREATE TABLE gmr.ns.sm (k BIGINT, d DATE, amt BIGINT) USING parquet")
    sql("""INSERT INTO gmr.ns.sm
           SELECT id, date_add(DATE'2024-01-01', CAST(id % 300 AS INT)), id * 10
           FROM range(0, 600)""")
    sql("""CALL gmr.system.create_mv('ns.mvm', 'ns.sm',
           keys => 'month(d) AS m, year(d) AS y', sums => 'amt')""")
    val q = """SELECT month(d) AS m, COUNT(*) AS n, SUM(amt) AS s,
                      ROUND(AVG(amt), 2) AS a
               FROM gmr.ns.sm GROUP BY month(d) ORDER BY m"""
    val df = sql(q)
    assert(scans(df, "mvm") && !scans(df, "sm"),
      s"the month rollup must serve from the MV:\n${df.queryExecution.executedPlan}")
    assert(rows(q) === control(q))
    // predicate ON the computed key rebinds to the MV key column
    val qp = """SELECT month(d) AS m, COUNT(*) AS n FROM gmr.ns.sm
                WHERE month(d) >= 6 AND year(d) = 2024 GROUP BY month(d) ORDER BY m"""
    val dfp = sql(qp)
    assert(scans(dfp, "mvm") && !scans(dfp, "sm"),
      s"computed-key predicates must serve:\n${dfp.queryExecution.executedPlan}")
    assert(rows(qp) === control(qp))
    // a DIFFERENT expression over the same column refuses (no structural match)
    val qr = """SELECT dayofmonth(d) AS dd, COUNT(*) AS n FROM gmr.ns.sm
                GROUP BY dayofmonth(d) ORDER BY dd"""
    val dfr = sql(qr)
    assert(scans(dfr, "sm") && !scans(dfr, "mvm"),
      s"a non-matching expr must refuse:\n${dfr.queryExecution.executedPlan}")
    assert(rows(qr) === control(qr))
    // a predicate on the RAW column (not the key expr) refuses too
    val qr2 = """SELECT month(d) AS m, COUNT(*) AS n FROM gmr.ns.sm
                 WHERE d >= DATE'2024-06-01' GROUP BY month(d) ORDER BY m"""
    assert(scans(sql(qr2), "sm") && !scans(sql(qr2), "mvm"))
    assert(rows(qr2) === control(qr2))
    // staleness + refresh: the delta path recomputes the SAME key exprs
    sql("INSERT INTO gmr.ns.sm VALUES (9000, DATE'2024-03-03', 777), (9001, NULL, 5)")
    sql("DELETE FROM gmr.ns.sm WHERE k IN (10, 11)")
    val stale = sql(q)
    assert(scans(stale, "sm") && !scans(stale, "mvm"), "stale must not serve")
    sql("CALL gmr.system.refresh_mv('ns.mvm')")
    assert(scans(sql(q), "mvm"), "refresh restores computed-key serving")
    assert(rows(q) === control(q))
    // creation-time validation: nondeterministic keys refuse at the door
    val e = intercept[Exception] {
      sql("""CALL gmr.system.create_mv('ns.mvbad', 'ns.sm',
             keys => 'rand() AS r', sums => 'amt')""")
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
    // TZ pinning: a computed-key MV refuses refresh AND serve under a
    // DIFFERENT session timezone (the exprs could group differently there)
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try {
      sql("INSERT INTO gmr.ns.sm VALUES (9100, DATE'2024-07-07', 1)")
      val eTz = intercept[Exception] { sql("CALL gmr.system.refresh_mv('ns.mvm')") }
      assert(eTz.getMessage.contains("timezone"), eTz.getMessage)
      val dfTz = sql(q)
      assert(scans(dfTz, "sm") && !scans(dfTz, "mvm"),
        s"a TZ-mismatched computed-key MV must not serve:\n${dfTz.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
    sql("CALL gmr.system.refresh_mv('ns.mvm')") // back home: refresh + serve again
    assert(scans(sql(q), "mvm"))
    assert(rows(q) === control(q))
  }

  test("COMPUTED keys through the STAR shape (r20): monthly revenue by region serves") {
    root
    sql("DROP TABLE IF EXISTS gmr.ns.mvs")
    sql("DROP TABLE IF EXISTS gmr.ns.ss")
    sql("CREATE TABLE gmr.ns.ss (k BIGINT, region BIGINT, d DATE, amt BIGINT) USING parquet")
    sql("""INSERT INTO gmr.ns.ss
           SELECT id, id % 4, date_add(DATE'2024-01-01', CAST(id % 200 AS INT)), id * 10
           FROM range(0, 500)""")
    sql("""CALL gmr.system.create_mv('ns.mvs', 'ns.ss',
           keys => 'region, month(d) AS m', sums => 'amt')""")
    sql("DROP TABLE IF EXISTS gmr.ns.dimreg")
    sql("CREATE TABLE gmr.ns.dimreg (region BIGINT, name STRING) USING parquet")
    sql("INSERT INTO gmr.ns.dimreg SELECT id, concat('r', CAST(id AS STRING)) FROM range(0, 3)")
    // THE dashboard query: monthly revenue by region name — computed fact
    // key + dim attr grouping through an inner join
    val q = """SELECT dr.name, month(f.d) AS m, COUNT(*) AS n, SUM(f.amt) AS s
               FROM gmr.ns.ss f JOIN gmr.ns.dimreg dr ON f.region = dr.region
               GROUP BY dr.name, month(f.d) ORDER BY dr.name, m"""
    val df = sql(q)
    assert(scans(df, "mvs") && !scans(df, "ss"),
      s"the star month rollup must serve from the MV:\n${df.queryExecution.executedPlan}")
    assert(rows(q) === control(q))
    // a computed expr over a DIM column must refuse (the resolved key expr
    // binds fact attributes; a dim-side month never matches)
    sql("ALTER TABLE gmr.ns.dimreg ADD COLUMN est DATE")
    val qr = """SELECT month(dr.est) AS m, COUNT(*) AS n
                FROM gmr.ns.ss f JOIN gmr.ns.dimreg dr ON f.region = dr.region
                GROUP BY month(dr.est) ORDER BY m"""
    val dfr = sql(qr)
    assert(scans(dfr, "ss") && !scans(dfr, "mvs"),
      s"a dim-side computed expr must refuse:\n${dfr.queryExecution.executedPlan}")
    assert(rows(qr) === control(qr))
    // staleness still gates the star + computed shape
    sql("INSERT INTO gmr.ns.ss VALUES (9000, 1, DATE'2024-05-05', 777)")
    val stale = sql(q)
    assert(scans(stale, "ss") && !scans(stale, "mvs"), "stale must not serve")
    sql("CALL gmr.system.refresh_mv('ns.mvs')")
    assert(scans(sql(q), "mvs"))
    assert(rows(q) === control(q))
  }

  test("alias shadowing refuses (r21): a Project alias named like an MV column never serves by name") {
    mk()
    // END-TO-END: `k AS amt` shadows the registered sum column — SUM(amt)
    // here is SUM(k), which the MV cannot serve; the answer must come from
    // the source and match the rewrite-off control
    val qAgg = """SELECT b, SUM(amt) AS s
                  FROM (SELECT b, k AS amt FROM gmr.ns.s1) GROUP BY b ORDER BY b"""
    val dfAgg = sql(qAgg)
    assert(!scans(dfAgg, "mv1"),
      s"shadowed SUM must not serve:\n${dfAgg.queryExecution.executedPlan}")
    assert(rows(qAgg) === control(qAgg))
    // and a WHERE on `k AS b` (shadowing key b) must not filter the MV's b
    val qCond = """SELECT m, SUM(amt) AS s
                   FROM (SELECT k AS b, m, amt FROM gmr.ns.s1)
                   WHERE b = 1 GROUP BY m ORDER BY m"""
    val dfCond = sql(qCond)
    assert(!scans(dfCond, "mv1"),
      s"shadowed predicate must not serve:\n${dfCond.queryExecution.executedPlan}")
    assert(rows(qCond) === control(qCond))
  }

  test("alias shadowing refuses (r21): the rule-level guard, pinned on a constructed plan") {
    // The optimizer may collapse subquery Projects before GraftMvRewrite
    // runs, so the e2e queries above can refuse for other reasons; this
    // applies the rule DIRECTLY to the dangerous shape (Aggregate over an
    // alias-carrying Project) to pin the sub-guard itself.
    mk()
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val rel = spark.table("gmr.ns.s1").queryExecution.analyzed
      .collectFirst { case r: DataSourceV2Relation => r }.get
    def attr(n: String) = rel.output.find(_.name == n).get
    def sumOf(a: Attribute) = Alias(AggregateExpression(
      Sum(a), Complete, isDistinct = false), "s")()
    val rule = new GraftMvRewrite(spark)
    def servesMv(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      rule.apply(p).collectFirst {
        case r: DataSourceV2Relation if r.table.name.contains("mv1") => r
      }.isDefined
    // CONTROL: an identity rename (`amt AS x`) resolves through the alias
    // and serves — proving this constructed shape reaches serveFrom at all
    val rename = Alias(attr("amt"), "x")()
    val okAgg = Aggregate(Seq(attr("b")),
      Seq(attr("b"), sumOf(rename.toAttribute)),
      Project(Seq(attr("b"), rename), rel))
    assert(servesMv(okAgg), "identity rename must still serve:\n" + rule.apply(okAgg))
    // GUARD 1 (rewriteFn): `k AS amt` shadows sum column amt — must refuse
    val shadowSum = Alias(attr("k"), "amt")()
    val badAgg = Aggregate(Seq(attr("b")),
      Seq(attr("b"), sumOf(shadowSum.toAttribute)),
      Project(Seq(attr("b"), shadowSum), rel))
    assert(!servesMv(badAgg),
      "SUM over an alias shadowing a registered sum column must refuse:\n" + rule.apply(badAgg))
    // GUARD 2 (rebindCond): WHERE on `k AS b` shadowing key b — must refuse
    val shadowKey = Alias(attr("k"), "b")()
    val badCond = Aggregate(Seq(attr("m")),
      Seq(attr("m"), sumOf(attr("amt"))),
      Filter(EqualTo(shadowKey.toAttribute, Literal(1L)),
        Project(Seq(shadowKey, attr("m"), attr("amt")), rel)))
    assert(!servesMv(badCond),
      "a predicate on an alias shadowing a key must refuse:\n" + rule.apply(badCond))
    // and the rebindCond identity-rename positive: WHERE on `m AS mm` serves
    val renameKey = Alias(attr("m"), "mm")()
    val okCond = Aggregate(Seq(attr("b")),
      Seq(attr("b"), sumOf(attr("amt"))),
      Filter(EqualTo(renameKey.toAttribute, Literal(1L)),
        Project(Seq(attr("b"), renameKey, attr("amt")), rel)))
    assert(servesMv(okCond),
      "an identity-renamed key predicate must still serve:\n" + rule.apply(okCond))
  }

  test("DROP TABLE of the MV deregisters; the conf kill-switch works") {
    mk()
    val q = "SELECT b, m, COUNT(*) AS n FROM gmr.ns.s1 GROUP BY b, m ORDER BY b, m"
    assert(scans(sql(q), "mv1"))
    // kill switch
    spark.conf.set("spark.graft.mv.rewrite", "false")
    try assert(scans(sql(q), "s1") && !scans(sql(q), "mv1"))
    finally spark.conf.set("spark.graft.mv.rewrite", "true")
    // drop deregisters (prop removed from the source) and the query still runs
    sql("DROP TABLE gmr.ns.mv1")
    val after = sql(q)
    assert(scans(after, "s1"))
    assert(after.collect().nonEmpty)
    val props = GraftMeta.read(root.resolve("ns").resolve("s1")).props
    assert(!props.contains(GraftMvRewrite.MvsProp),
      s"drop must deregister, got ${props.get(GraftMvRewrite.MvsProp)}")
  }
}
