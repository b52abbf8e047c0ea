package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-20 declared queries: top-k segment pruning generalized — zone
  * containment of NON-sort-column predicates (the real curation query) and
  * STRING sort columns — plus the computed-key materialized-view rewrite.
  * TopKPruneSpec / MvRewriteSpec own the plan shapes (which segments plan,
  * which relation serves); these oracle gates own the answers. */
object Round22Queries {

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  // --------------------------------------------------------------------------
  // q312: CURATION TOP-K — `WHERE lang = 'en' AND n_chars >= 60 ORDER BY
  // score DESC LIMIT k` over a lang-PARTITIONED, score-banded corpus table:
  // the daily training-data pick. Partition-pure segments are fully
  // contained under the lang equality (zone containment, r20), so they
  // vouch for τ minus their null counts; the n_chars floor composes the
  // same way per band. The injected τ bound then zone-prunes every segment
  // whose score range can't reach the cut — at 100 TB the query reads a few
  // segments of one language instead of the corpus. The filter covers two
  // NON-sort columns plus the sort column: exactly the shape r19 refused.
  // --------------------------------------------------------------------------
  private def q312(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r22_docs_${sfTag(d)}"
    T.documents(s, d).createOrReplaceTempView(src)
    val t = s"r312_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (doc_id BIGINT, lang STRING, n_chars BIGINT, score BIGINT)
              USING parquet PARTITIONED BY (lang)""")
    // three score bands x one segment per lang value (the partition router):
    // a clustered/banded score layout inside each language
    Seq("n_chars < 150", "n_chars >= 150 AND n_chars < 300", "n_chars >= 300")
      .foreach { band =>
        s.sql(s"""INSERT INTO graft.lake.$t
          SELECT doc_id, lang, n_chars,
                 n_chars * 1000 + doc_id % 1000 AS score
          FROM $src WHERE $band""")
      }
    s.sql(s"""SELECT doc_id, score FROM graft.lake.$t
              WHERE lang = 'en' AND n_chars >= 60
              ORDER BY score DESC, doc_id LIMIT 50""")
  }

  private val q312Sql =
    """SELECT doc_id, n_chars * 1000 + doc_id % 1000 AS score
       FROM documents WHERE lang = 'en' AND n_chars >= 60
       ORDER BY score DESC, doc_id LIMIT 50"""

  // --------------------------------------------------------------------------
  // q313: STRING TOP-K SEGMENT PRUNING (r20) — `ORDER BY url DESC LIMIT k`
  // with a STRING sort column: τ is built from the segments' exactness-
  // flagged ASCII string bounds (self-written footers; foreign add_files
  // brackets never vouch — TopKPruneSpec pins that) and injected as a
  // string comparison, so collation top-k ("last k URLs") prunes exactly
  // like an integer score. Layout: one segment per source prefix, giving
  // disjoint collation bands.
  // --------------------------------------------------------------------------
  private def q313(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r22_docs_${sfTag(d)}"
    T.documents(s, d).createOrReplaceTempView(src)
    val t = s"r313_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (doc_id BIGINT, url STRING) USING parquet")
    // collation bands by source id parity-ish split: three inserts, three
    // segments with disjoint [min,max] url ranges (src1* < src2-or-less... the
    // bands are the lexicographic thirds of the source space)
    Seq("source < 'src2'", "source >= 'src2' AND source < 'src6'", "source >= 'src6'")
      .foreach { band =>
        s.sql(s"""INSERT INTO graft.lake.$t
          SELECT doc_id, concat(source, '/', lpad(CAST(doc_id AS STRING), 8, '0')) AS url
          FROM $src WHERE $band""")
      }
    s.sql(s"SELECT doc_id, url FROM graft.lake.$t ORDER BY url DESC LIMIT 50")
  }

  private val q313Sql =
    """SELECT doc_id, source || '/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url
       FROM documents ORDER BY url DESC LIMIT 50"""

  // --------------------------------------------------------------------------
  // q314: COMPUTED-KEY MV REWRITE (r20) — `create_mv(keys => 'year(d) AS y,
  // month(d) AS m')` materializes the time-bucketed rollup, THE dashboard
  // GROUP BY shape, and `SELECT year(d), month(d), COUNT/SUM/AVG ... GROUP
  // BY year(d), month(d)` is served from it by STRUCTURAL expression match
  // (the analyzer's pulled-out grouping expressions are inlined and compared
  // semantically; MvRewriteSpec pins the plan scans the MV). Same stale-era
  // freshness gating as q304/q308: the pre-refresh era runs after a DML wave
  // and MUST reflect it — a stale serve would hash-mismatch — then
  // refresh_mv (which recomputes the SAME key exprs over the CDC deltas)
  // re-enables serving for the post era. A predicate on the computed key
  // (year(d) = ...) rebinds onto the MV key column.
  // --------------------------------------------------------------------------
  private def q314(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r22_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r314_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_mv")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, d DATE, cents BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderdate, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 <> 0""")
    s.sql(s"CALL graft.system.create_mv('lake.${t}_mv', 'lake.$t', " +
      "keys => 'year(d) AS y, month(d) AS m', sums => 'cents')")
    // the wave: stale until refresh_mv
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderdate, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 0""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 13 = 0")
    val agg =
      s"""SELECT year(d) AS y, month(d) AS m, COUNT(*) AS n,
                 CAST(SUM(cents) AS BIGINT) AS total_c, ROUND(AVG(cents), 2) AS avg_c
          FROM graft.lake.$t WHERE year(d) >= 1995 GROUP BY year(d), month(d)"""
    import s.implicits._
    val pre = s.sql(agg).collect().toSeq
      .map(r => ("pre_refresh", r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
      .toDF("era", "y", "m", "n", "total_c", "avg_c")
    s.sql(s"CALL graft.system.refresh_mv('lake.${t}_mv')")
    val post = s.sql(s"SELECT 'post_refresh' AS era, * FROM ($agg)")
    pre.unionByName(post).orderBy("era", "y", "m")
  }

  private val q314Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderdate AS d,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
       final AS (SELECT * FROM base WHERE k % 13 <> 0),
       agg AS (
         SELECT CAST(year(d) AS INT) AS y, CAST(month(d) AS INT) AS m,
                COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total_c,
                ROUND(AVG(cents), 2) AS avg_c
         FROM final WHERE year(d) >= 1995 GROUP BY 1, 2)
       SELECT eras.era, a.y, a.m, a.n, a.total_c, a.avg_c
       FROM (SELECT 'pre_refresh' AS era UNION ALL SELECT 'post_refresh') eras
       CROSS JOIN agg a
       ORDER BY eras.era, a.y, a.m"""

  // --------------------------------------------------------------------------
  // q315: PAGINATED TOP-K PRUNING (r20) — `ORDER BY cents DESC LIMIT k
  // OFFSET m` over a banded graft table: the pagination window (rows m+1..
  // m+k of the sorted stream) prunes with τ built for k+m — page N of a
  // leaderboard/curation listing reads the same few segments as page 1
  // instead of re-scanning the corpus per page. TopKPruneSpec pins the
  // planned-segment counts; this gate owns the page content.
  // --------------------------------------------------------------------------
  private def q315(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r22_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r315_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, cents BIGINT) USING parquet")
    Seq("o_totalprice < 100000",
        "o_totalprice >= 100000 AND o_totalprice < 300000",
        "o_totalprice >= 300000").foreach { band =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src WHERE $band""")
    }
    s.sql(s"SELECT k, cents FROM graft.lake.$t ORDER BY cents DESC, k LIMIT 50 OFFSET 100")
  }

  private val q315Sql =
    """SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
       FROM orders ORDER BY cents DESC, k LIMIT 50 OFFSET 100"""

  val defs: Seq[QDef] = Seq(
    QDef("q312_curation_topk_containment", q312, Some(q312Sql)),
    QDef("q313_string_topk_pruning", q313, Some(q313Sql)),
    QDef("q314_computed_key_mv", q314, Some(q314Sql)),
    QDef("q315_paginated_topk", q315, Some(q315Sql)),
  )
}
