package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-19 declared queries: the top-k pruning mirrors (bottom-k via ASC
  * NULLS LAST, WHERE-composed top-k), the star-schema MV join rewrite, and
  * identity minting on the merge-on-read upsert. Each is the oracle-gated
  * twin of a plan-pinned rule (TopKPruneSpec / MvRewriteSpec /
  * IdentityColumnsSpec own the plan shapes; these gates own the answers). */
object Round21Queries {

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  /** Shared fixture for q306/q307: cents from orders landed in three
    * RANGE-STACKED segments (price bands), so segment zone ranges separate
    * and the τ cut really skips segments — the layout a clustered score
    * column has at 100 TB. */
  private def mkBanded(s: SparkSession, d: String, t: String): Unit = {
    val src = s"r21_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, cents BIGINT) USING parquet")
    Seq("o_totalprice < 100000",
        "o_totalprice >= 100000 AND o_totalprice < 300000",
        "o_totalprice >= 300000").foreach { band =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src WHERE $band""")
    }
  }

  // --------------------------------------------------------------------------
  // q306: BOTTOM-K SEGMENT PRUNING (GraftTopKPrune, r19 ASC mirror) —
  // `ORDER BY cents ASC NULLS LAST LIMIT k` accumulates segment MAX bounds
  // ascending into a sound τ (≥ k non-null values provably ≤ τ) and injects
  // `cents <= τ`, so zone pruning reads only the cheapest band — "the k
  // cheapest offers" over a clustered price column at plan time. ASC's
  // NULLS FIRST default still refuses (nulls belong at the top there);
  // the explicit NULLS LAST is the opt-in. Content is rewrite-independent
  // (the filter keeps a superset of the bottom k); the hash gate proves τ
  // never cuts a bottom-k row.
  // --------------------------------------------------------------------------
  private def q306(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val t = s"r306_${sfTag(d)}"
    mkBanded(s, d, t)
    s.sql(s"SELECT k, cents FROM graft.lake.$t ORDER BY cents ASC NULLS LAST, k LIMIT 100")
  }

  private val q306Sql =
    """SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
       FROM orders ORDER BY cents ASC, k LIMIT 100"""

  // --------------------------------------------------------------------------
  // q307: WHERE-COMPOSED TOP-K PRUNING (r19) — a range predicate on the SORT
  // COLUMN ITSELF tightens instead of voiding the zone-stat guarantee: only
  // segments whose whole range sits INSIDE the filter interval vouch for τ
  // (they keep every non-null row through the filter), and the injected
  // bound composes with the user WHERE. "The best k above a floor" — the
  // filter alone already zone-prunes the cheap bands; τ then cuts within
  // the top band. A predicate on ANY OTHER column still falls back (pinned
  // in TopKPruneSpec).
  // --------------------------------------------------------------------------
  private def q307(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val t = s"r307_${sfTag(d)}"
    mkBanded(s, d, t)
    s.sql(s"""SELECT k, cents FROM graft.lake.$t
              WHERE cents >= 10000000 ORDER BY cents DESC, k LIMIT 100""")
  }

  private val q307Sql =
    """SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
       FROM orders WHERE CAST(FLOOR(o_totalprice * 100) AS BIGINT) >= 10000000
       ORDER BY cents DESC, k LIMIT 100"""

  // --------------------------------------------------------------------------
  // q308: STAR-SCHEMA MV REWRITE (GraftMvRewrite join serving, r19) — the
  // canonical dashboard rollup `fact ⋈ dim1 ⋈ dim2 GROUP BY dim attrs` served from a
  // FACT-side MV: the fact join key is an MV key, so each MV group row joins
  // with exactly the multiplicity its source rows had and COUNT/SUM/AVG/MIN
  // re-roll exactly (MvRewriteSpec pins the plan scans the MV, not the
  // fact). Same stale-era freshness gating as q304: the pre-refresh era runs
  // after a DML wave and MUST reflect it (a stale serve would hash-mismatch);
  // refresh_mv then re-enables serving for the post era. The dim keeps only
  // 15 of 17 buckets — the INNER-join multiplicity drop is part of the gate.
  // --------------------------------------------------------------------------
  private def q308(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r21_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r308_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_mv")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, b BIGINT, m BIGINT, cents BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey % 17, o_orderkey % 5,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 <> 0""")
    s.sql(s"CALL graft.system.create_mv('lake.${t}_mv', 'lake.$t', " +
      "keys => 'b,m', sums => 'cents', mins => 'cents', maxs => 'cents')")
    // the wave: stale until refresh_mv
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey % 17, o_orderkey % 5,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 0""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 13 = 0")
    s.sql(s"SELECT id AS b, concat('d', CAST(id AS STRING)) AS name FROM range(0, 15)")
      .createOrReplaceTempView(s"r308_dim_${sfTag(d)}")
    // second dim on the OTHER MV key (4 of 5 m values): the two-dim star is
    // the real dashboard shape, and the extra INNER multiplicity drop is
    // part of the gate
    s.sql(s"SELECT id AS m, concat('lbl', CAST(id AS STRING)) AS label FROM range(0, 4)")
      .createOrReplaceTempView(s"r308_dim2_${sfTag(d)}")
    val agg =
      s"""SELECT dd.name, d2.label, COUNT(*) AS n,
                 CAST(SUM(f.cents) AS BIGINT) AS total_c,
                 ROUND(AVG(f.cents), 2) AS avg_c, MIN(f.cents) AS min_c
          FROM graft.lake.$t f
          JOIN r308_dim_${sfTag(d)} dd ON f.b = dd.b
          JOIN r308_dim2_${sfTag(d)} d2 ON f.m = d2.m
          WHERE f.m >= 2 GROUP BY dd.name, d2.label"""
    import s.implicits._
    val pre = s.sql(agg).collect().toSeq
      .map(r => ("pre_refresh", r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5)))
      .toDF("era", "name", "label", "n", "total_c", "avg_c", "min_c")
    s.sql(s"CALL graft.system.refresh_mv('lake.${t}_mv')")
    val post = s.sql(s"SELECT 'post_refresh' AS era, * FROM ($agg)")
    pre.unionByName(post).orderBy("era", "name", "label")
  }

  private val q308Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey % 17 AS b, o_orderkey % 5 AS m,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
       final AS (SELECT * FROM base WHERE k % 13 <> 0),
       dim AS (SELECT b, 'd' || CAST(b AS VARCHAR) AS name
               FROM (SELECT UNNEST(RANGE(0, 15)) AS b)),
       dim2 AS (SELECT m, 'lbl' || CAST(m AS VARCHAR) AS label
                FROM (SELECT UNNEST(RANGE(0, 4)) AS m)),
       agg AS (
         SELECT d.name, d2.label, COUNT(*) AS n,
                CAST(SUM(f.cents) AS BIGINT) AS total_c,
                ROUND(AVG(f.cents), 2) AS avg_c, MIN(f.cents) AS min_c
         FROM final f JOIN dim d ON f.b = d.b JOIN dim2 d2 ON f.m = d2.m
         WHERE f.m >= 2 GROUP BY d.name, d2.label)
       SELECT eras.era, a.name, a.label, a.n, a.total_c, a.avg_c, a.min_c
       FROM (SELECT 'pre_refresh' AS era UNION ALL SELECT 'post_refresh') eras
       CROSS JOIN agg a
       ORDER BY eras.era, a.name, a.label"""

  // --------------------------------------------------------------------------
  // q309: MOR UPSERT MINTS IDENTITY IDS (r19) — the continuous CDC-apply
  // primitive completed: an identity table under merge-on-read delete-mode
  // takes `CALL upsert` batches whose NULL identity values allocate off the
  // committed high-water (GraftIdentity.fillDataFrame), with the advance
  // riding the SAME vector+append commit (propCas). Wave 0 seeds two thirds
  // of the customers; the upsert batch covers every fifth customer (some
  // matched — superseded via delete vector, re-minted per upsert-as-replace
  // — some new) with id NULL and bal+11. Readout gates the invariants, not
  // raw ids: global uniqueness, grid membership, batch ids strictly above
  // the untouched rows' maximum (allocation started at the high-water), and
  // a post-upsert sentinel strictly above everything (the propCas advanced).
  // --------------------------------------------------------------------------
  private def q309(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r21_customer_${sfTag(d)}"
    T.customer(s, d).createOrReplaceTempView(src)
    val t = s"r309_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
               k BIGINT, seg STRING, bal_c BIGINT) USING parquet
              TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t (k, seg, bal_c)
      SELECT c_custkey, c_mktsegment, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 3 <> 0""")                     // wave 0
    s.sql(s"""SELECT CAST(NULL AS BIGINT) AS id, c_custkey AS k,
                     c_mktsegment AS seg,
                     CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 11 AS bal_c
              FROM $src WHERE c_custkey % 5 = 0""")
      .createOrReplaceTempView(s"r309_batch_${sfTag(d)}")
    s.sql(s"CALL graft.system.upsert('lake.$t', 'r309_batch_${sfTag(d)}', 'k')")
    s.sql(s"INSERT INTO graft.lake.$t (k, seg, bal_c) VALUES (-1, 'S', 0), (-2, 'S', 0)")
    s.sql(s"""WITH g AS (SELECT id, k, seg, bal_c FROM graft.lake.$t),
         m AS (SELECT MAX(CASE WHEN k >= 0 THEN id END) AS data_max,
                      MIN(CASE WHEN k < 0 THEN id END) AS sent_min,
                      MAX(CASE WHEN k >= 0 AND k % 5 <> 0 THEN id END) AS untouched_max,
                      MIN(CASE WHEN k >= 0 AND k % 5 = 0 THEN id END) AS batch_min
               FROM g)
       SELECT seg, COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids,
              SUM(CASE WHEN id >= 100 AND (id - 100) % 3 = 0 THEN 1 ELSE 0 END) AS on_grid,
              CAST(SUM(bal_c) AS BIGINT) AS total_c,
              (SELECT COUNT(DISTINCT id) FROM g) AS all_distinct,
              (SELECT batch_min > untouched_max FROM m) AS batch_monotone,
              (SELECT sent_min > data_max FROM m) AS post_monotone
       FROM g WHERE k >= 0 GROUP BY seg ORDER BY seg""")
  }

  private val q309Sql =
    """WITH live AS (
         SELECT c_mktsegment AS seg,
                CASE WHEN c_custkey % 5 = 0
                     THEN CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 11
                     ELSE CAST(FLOOR(c_acctbal * 100) AS BIGINT) END AS bal_c
         FROM customer WHERE c_custkey % 3 <> 0 OR c_custkey % 5 = 0)
       SELECT seg, COUNT(*) AS n, COUNT(*) AS n_ids, COUNT(*) AS on_grid,
              CAST(SUM(bal_c) AS BIGINT) AS total_c,
              (SELECT COUNT(*) + 2 FROM live) AS all_distinct,
              TRUE AS batch_monotone, TRUE AS post_monotone
       FROM live GROUP BY 1 ORDER BY seg"""


  // --------------------------------------------------------------------------
  // q310: DELTA MERGE MINTS IDENTITY IDS (r19) — the q302 invariants on the
  // MERGE-ON-READ UPDATE-MODE path: MERGE routes through the position-delta
  // writer (GraftDeltaMerge), whose insert path allocates NULL identity ids
  // (GraftIdentity.RowAllocator) and whose ONE delta commit (vector +
  // append) advances the high-water via propCas. Updated rows carry their
  // ids (delete+insert of the same carried value); inserted rows mint from
  // the high-water; a post-merge sentinel proves the CAS advanced. Same
  // invariant gating as q302 — uniqueness, grid, monotonicity — but the
  // write volume is O(rows touched), not O(groups rewritten).
  // --------------------------------------------------------------------------
  private def q310(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r21_customer2_${sfTag(d)}"
    T.customer(s, d).createOrReplaceTempView(src)
    val t = s"r310_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
               k BIGINT, seg STRING, bal_c BIGINT) USING parquet
              TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t (k, seg, bal_c)
      SELECT c_custkey, c_mktsegment, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 3 <> 0""")                     // wave 0
    s.sql(s"""MERGE INTO graft.lake.$t tt
      USING (SELECT c_custkey AS k, c_mktsegment AS seg,
                    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c FROM $src) ss
      ON tt.k = ss.k
      WHEN MATCHED THEN UPDATE SET bal_c = ss.bal_c + 11
      WHEN NOT MATCHED THEN INSERT (k, seg, bal_c) VALUES (ss.k, ss.seg, ss.bal_c)""")
    s.sql(s"INSERT INTO graft.lake.$t (k, seg, bal_c) VALUES (-1, 'S', 0), (-2, 'S', 0)")
    s.sql(s"""WITH g AS (SELECT id, k, seg, bal_c FROM graft.lake.$t),
         m AS (SELECT MAX(CASE WHEN k >= 0 THEN id END) AS data_max,
                      MIN(CASE WHEN k < 0 THEN id END) AS sent_min,
                      MAX(CASE WHEN k >= 0 AND k % 3 <> 0 THEN id END) AS wave0_max,
                      MIN(CASE WHEN k >= 0 AND k % 3 = 0 THEN id END) AS minted_min
               FROM g)
       SELECT seg, COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids,
              SUM(CASE WHEN id >= 100 AND (id - 100) % 3 = 0 THEN 1 ELSE 0 END) AS on_grid,
              CAST(SUM(bal_c) AS BIGINT) AS total_c,
              (SELECT COUNT(DISTINCT id) FROM g) AS all_distinct,
              (SELECT minted_min > wave0_max FROM m) AS minted_monotone,
              (SELECT sent_min > data_max FROM m) AS post_monotone
       FROM g WHERE k >= 0 GROUP BY seg ORDER BY seg""")
  }

  private val q310Sql =
    """SELECT c_mktsegment AS seg, COUNT(*) AS n, COUNT(*) AS n_ids,
              COUNT(*) AS on_grid,
              CAST(SUM(CASE WHEN c_custkey % 3 <> 0
                            THEN CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 11
                            ELSE CAST(FLOOR(c_acctbal * 100) AS BIGINT) END)
                   AS BIGINT) AS total_c,
              (SELECT COUNT(*) + 2 FROM customer) AS all_distinct,
              TRUE AS minted_monotone, TRUE AS post_monotone
       FROM customer GROUP BY 1 ORDER BY seg"""


  // --------------------------------------------------------------------------
  // q311: DV-AWARE TOP-K PRUNING (r19) — `ORDER BY cents DESC LIMIT k` on a
  // MERGE-ON-READ table AFTER a delete wave: delete vectors now WEAKEN the
  // zone-stat guarantees (each dv's footer-only row count subtracts from
  // every segment it touches) instead of disabling the rewrite, so the τ
  // cut keeps working on a continuously-curated corpus — "the k best
  // documents, deletions applied" without a full scan. The delete guts the
  // top price band, so the correct top-k CROSSES segments: the hash gate
  // proves the weakened τ never cuts a surviving top-k row.
  // --------------------------------------------------------------------------
  private def q311(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r21_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r311_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, cents BIGINT) USING parquet
              TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    Seq("o_totalprice < 100000",
        "o_totalprice >= 100000 AND o_totalprice < 300000",
        "o_totalprice >= 300000").foreach { band =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src WHERE $band""")
    }
    // gut most of the top band: the true top-100 now crosses into band 2
    s.sql(s"DELETE FROM graft.lake.$t WHERE cents >= 31000000 OR k % 7 = 0")
    s.sql(s"SELECT k, cents FROM graft.lake.$t ORDER BY cents DESC, k LIMIT 100")
  }

  private val q311Sql =
    """SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
       FROM orders
       WHERE NOT (CAST(FLOOR(o_totalprice * 100) AS BIGINT) >= 31000000
                  OR o_orderkey % 7 = 0)
       ORDER BY cents DESC, k LIMIT 100"""

  val defs: Seq[QDef] = Seq(
    QDef("q306_bottomk_segment_pruning", q306, Some(q306Sql)),
    QDef("q307_filtered_topk_pruning", q307, Some(q307Sql)),
    QDef("q308_mv_join_rewrite", q308, Some(q308Sql)),
    QDef("q309_mor_upsert_identity", q309, Some(q309Sql)),
    QDef("q310_mor_merge_identity", q310, Some(q310Sql)),
    QDef("q311_topk_under_deletes", q311, Some(q311Sql)),
  )
}
