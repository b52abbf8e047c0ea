package graft.catalog

import graft.SparkSpec

/** Pins for catalog-persisted SQL views (ViewCatalog/GraftViews): create /
  * read-through / composition / replace / rename / drop, the re-analysis
  * contract (underlying data changes flow through), and the name-collision
  * guards against tables. */
class GraftViewSpec extends SparkSpec {

  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_view_spec")
    spark.conf.set("spark.sql.catalog.gvw", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvw.root", d.toString)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("CREATE VIEW persists; reads re-analyze so new data flows through") {
    root
    sql("DROP VIEW IF EXISTS gvw.ns.v1")
    sql("DROP TABLE IF EXISTS gvw.ns.t1")
    sql("CREATE TABLE gvw.ns.t1 (k BIGINT, amt BIGINT) USING parquet")
    sql("INSERT INTO gvw.ns.t1 VALUES (1, 10), (2, 20)")
    sql("CREATE VIEW gvw.ns.v1 AS SELECT k, amt * 2 AS dbl FROM gvw.ns.t1 WHERE amt > 5")
    assert(sql("SELECT SUM(dbl) FROM gvw.ns.v1").head.getLong(0) === 60L)
    // the view is TEXT: post-create inserts flow through on the next read
    sql("INSERT INTO gvw.ns.t1 VALUES (3, 30)")
    assert(sql("SELECT SUM(dbl) FROM gvw.ns.v1").head.getLong(0) === 120L)
    // SHOW VIEWS lists it
    val shown = sql("SHOW VIEWS IN gvw.ns").collect().map(_.getString(1))
    assert(shown.contains("v1"))
  }

  test("views compose; CREATE OR REPLACE swaps the definition") {
    root
    sql("DROP VIEW IF EXISTS gvw.ns.v2a")
    sql("DROP VIEW IF EXISTS gvw.ns.v2b")
    sql("DROP TABLE IF EXISTS gvw.ns.t2")
    sql("CREATE TABLE gvw.ns.t2 AS SELECT * FROM VALUES (1L, 5L), (2L, 15L) AS v(k, x)")
    sql("CREATE VIEW gvw.ns.v2a AS SELECT k, x + 1 AS x1 FROM gvw.ns.t2")
    sql("CREATE VIEW gvw.ns.v2b AS SELECT SUM(x1) AS s FROM gvw.ns.v2a")
    assert(sql("SELECT s FROM gvw.ns.v2b").head.getLong(0) === 22L)
    sql("CREATE OR REPLACE VIEW gvw.ns.v2a AS SELECT k, x * 10 AS x1 FROM gvw.ns.t2")
    assert(sql("SELECT s FROM gvw.ns.v2b").head.getLong(0) === 200L,
      "the composed view must see the replaced inner definition")
  }

  test("ALTER VIEW properties; RENAME VIEW; DROP VIEW") {
    root
    sql("DROP VIEW IF EXISTS gvw.ns.v3")
    sql("DROP VIEW IF EXISTS gvw.ns.v3r")
    sql("DROP TABLE IF EXISTS gvw.ns.t3")
    sql("CREATE TABLE gvw.ns.t3 AS SELECT * FROM VALUES (1L) AS v(k)")
    sql("CREATE VIEW gvw.ns.v3 AS SELECT k FROM gvw.ns.t3")
    sql("ALTER VIEW gvw.ns.v3 SET TBLPROPERTIES ('note' = 'audited')")
    val d = GraftViews.read(root.resolve("ns").resolve("v3"))
    assert(d.props.get("note").contains("audited"))
    sql("ALTER VIEW gvw.ns.v3 RENAME TO gvw.ns.v3r")
    assert(sql("SELECT k FROM gvw.ns.v3r").head.getLong(0) === 1L)
    intercept[Exception] { sql("SELECT k FROM gvw.ns.v3") }
    assert(sql("DROP VIEW gvw.ns.v3r").collect() != null)
    intercept[Exception] { sql("SELECT k FROM gvw.ns.v3r") }
  }

  test("ALTER VIEW ... AS swaps the definition and recaptures the schema") {
    root
    sql("DROP VIEW IF EXISTS gvw.ns.v5")
    sql("DROP TABLE IF EXISTS gvw.ns.t5")
    sql("CREATE TABLE gvw.ns.t5 AS SELECT * FROM VALUES (1L, 4L), (2L, 6L) AS v(k, x)")
    sql("CREATE VIEW gvw.ns.v5 AS SELECT k, x FROM gvw.ns.t5")
    sql("ALTER VIEW gvw.ns.v5 AS SELECT k, x * 100 AS c FROM gvw.ns.t5 WHERE x > 4")
    val rows = sql("SELECT k, c FROM gvw.ns.v5").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((2L, 600L)))
    // altering a missing view still errors
    intercept[Exception] { sql("ALTER VIEW gvw.ns.v5_missing AS SELECT 1 AS one") }
  }

  test("name collisions: a view cannot shadow a table and vice versa; broken deps fail the READ") {
    root
    sql("DROP TABLE IF EXISTS gvw.ns.t4")
    sql("DROP VIEW IF EXISTS gvw.ns.v4")
    sql("CREATE TABLE gvw.ns.t4 AS SELECT * FROM VALUES (1L) AS v(k)")
    intercept[Exception] { sql("CREATE VIEW gvw.ns.t4 AS SELECT 1 AS one") }
    sql("CREATE VIEW gvw.ns.v4 AS SELECT k FROM gvw.ns.t4")
    intercept[Exception] { sql("CREATE TABLE gvw.ns.v4 (k BIGINT) USING parquet") }
    // dropping the underlying table breaks the view at READ time, loudly
    sql("DROP TABLE gvw.ns.t4")
    intercept[Exception] { sql("SELECT * FROM gvw.ns.v4").collect() }
  }
}
