package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-18 operators: catalog-persisted SQL VIEWs (GraftViews +
  * GraftViewExtension) — CREATE/read-through/composition as an oracle-gated
  * query. DDL routing and text substitution ride the session extensions
  * (Spark 4.1 has no native v2 ViewCatalog SQL path); GraftViewSpec pins
  * replace/rename/drop/collision/broken-dep semantics.
  *
  * Oracle strategy unchanged (SURVEY.md §2b): deterministic relational
  * replays in DuckDB over the same parquet inputs, integer-cents money,
  * trailing total-order sorts. */
object Round18Queries {

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  private def customerView(s: SparkSession, d: String): String = {
    val v = s"r18_customer_${sfTag(d)}"
    T.customer(s, d).createOrReplaceTempView(v)
    v
  }

  // --------------------------------------------------------------------------
  // q279: PERSISTED SQL VIEWS over a graft table. A filtered/derived-column
  // view is created BEFORE the second era of rows lands, so the readout only
  // hash-matches if the view is stored TEXT re-analyzed per read (a
  // materialized snapshot would miss era 2). A second view composes the
  // first (aggregate-over-view), probing recursive substitution. The oracle
  // replays both view bodies relationally over the full union of rows.
  // --------------------------------------------------------------------------
  private def q279(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r279_${sfTag(d)}"
    s.sql(s"DROP VIEW IF EXISTS graft.lake.${t}_v2")
    s.sql(s"DROP VIEW IF EXISTS graft.lake.${t}_v")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, nat BIGINT, bal_c BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, c_nationkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 0""")                    // era 1 (pre-view)
    s.sql(s"""CREATE VIEW graft.lake.${t}_v AS
      SELECT nat, bal_c, bal_c * 2 AS dbl_c
      FROM graft.lake.$t WHERE bal_c > 0""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, c_nationkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 1""")                    // era 2 flows through
    s.sql(s"""CREATE VIEW graft.lake.${t}_v2 AS
      SELECT nat, COUNT(*) AS n, CAST(SUM(dbl_c) AS BIGINT) AS total_c
      FROM graft.lake.${t}_v GROUP BY nat""")
    s.sql(s"SELECT nat, n, total_c FROM graft.lake.${t}_v2 ORDER BY nat")
  }

  private val q279Sql =
    """WITH t AS (
         SELECT c_nationkey AS nat, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
         FROM customer),
       v AS (SELECT nat, bal_c, bal_c * 2 AS dbl_c FROM t WHERE bal_c > 0)
       SELECT nat, COUNT(*) AS n, CAST(SUM(dbl_c) AS BIGINT) AS total_c
       FROM v GROUP BY nat ORDER BY nat"""

  // --------------------------------------------------------------------------
  // q280: NESTED SCHEMA EVOLUTION via recursive field ids (the Iceberg v2
  // contract down into structs): a struct member is RENAMED (old segments
  // serve it BY ID), then WIDENED int->bigint (era 2 holds values impossible
  // before the widen), then a NEW member lands (era 1-2 rows null-fill it) —
  // all metadata-only, zero segments rewritten. The readout filters and
  // aggregates member fields across all three eras through the evolved
  // names; the oracle replays the era arithmetic relationally. A broken
  // member rename would null-fill era 1 and miss the hash.
  // --------------------------------------------------------------------------
  private def q280(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r280_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, info STRUCT<bal_c: INT, nat: BIGINT>) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, named_struct(
        'bal_c', CAST(FLOOR(c_acctbal * 100) AS INT), 'nat', c_nationkey)
      FROM $src WHERE c_custkey % 3 = 0""")                    // era 1 (narrow, old name)
    s.sql(s"ALTER TABLE graft.lake.$t RENAME COLUMN info.bal_c TO balance_c")
    s.sql(s"ALTER TABLE graft.lake.$t ALTER COLUMN info.balance_c TYPE BIGINT")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, named_struct(
        'balance_c', CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 5000000000,
        'nat', c_nationkey)
      FROM $src WHERE c_custkey % 3 = 1""")                    // era 2 (wide, > Int.Max)
    s.sql(s"ALTER TABLE graft.lake.$t ADD COLUMNS (info.tier BIGINT)")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, named_struct(
        'balance_c', CAST(FLOOR(c_acctbal * 100) AS BIGINT),
        'nat', c_nationkey, 'tier', c_nationkey % 4)
      FROM $src WHERE c_custkey % 3 = 2""")                    // era 3 (new member)
    s.sql(s"""SELECT COALESCE(info.tier, -1) AS tier, COUNT(*) AS n,
                     CAST(SUM(info.balance_c) AS BIGINT) AS total_c,
                     MIN(info.balance_c) AS min_c, MAX(info.balance_c) AS max_c
              FROM graft.lake.$t WHERE info.balance_c > -99000
              GROUP BY COALESCE(info.tier, -1) ORDER BY tier""")
  }

  private val q280Sql =
    """WITH t AS (
         SELECT CAST(NULL AS BIGINT) AS tier,
                CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS balance_c
         FROM customer WHERE c_custkey % 3 = 0
         UNION ALL
         SELECT NULL, CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 5000000000
         FROM customer WHERE c_custkey % 3 = 1
         UNION ALL
         SELECT c_nationkey % 4, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
         FROM customer WHERE c_custkey % 3 = 2)
       SELECT COALESCE(tier, -1) AS tier, COUNT(*) AS n,
              CAST(SUM(balance_c) AS BIGINT) AS total_c,
              MIN(balance_c) AS min_c, MAX(balance_c) AS max_c
       FROM t WHERE balance_c > -99000
       GROUP BY COALESCE(tier, -1) ORDER BY tier"""

  val defs: Seq[QDef] = Seq(
    QDef("q279_sql_views", q279, Some(q279Sql)),
    QDef("q280_nested_evolution", q280, Some(q280Sql)))
}
