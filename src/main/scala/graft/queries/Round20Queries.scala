package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-20 operators (r17 build round): IDENTITY columns on PARTITIONED
  * tables (the r16 verdict's missing surface — allocation wraps outside
  * GraftPartitionedWrite's fan-out router, the high-water CAS rides
  * commitMany; IdentityColumnsSpec pins fan-out uniqueness, the
  * identity-as-partition-column route, and COW id preservation), zero-IO
  * string MIN/MAX from zone maps (exact-bounds gating), and persisted
  * `RETURNS TABLE` SQL functions (parse-time subquery inlining, the
  * table-valued sibling of q294's scalar inline).
  *
  * Oracle strategy unchanged (SURVEY.md §2b): deterministic relational
  * replays in DuckDB over the same parquet inputs, integer-cents money,
  * trailing total-order sorts. */
object Round20Queries {

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  // --------------------------------------------------------------------------
  // q297: IDENTITY ON A PARTITIONED TABLE — two append waves fan out across
  // the mktsegment partitions of one identity table; the readout gates the
  // whole allocation contract with layout-deterministic aggregates (raw ids
  // depend on task routing, so — like q283/q289 — the query checks the
  // INVARIANTS, not the values): per-partition row counts equal distinct-id
  // counts (uniqueness inside every partition segment), every id sits on the
  // start+k*step grid, the global distinct count equals the table count
  // (uniqueness ACROSS partitions — the fan-out writer allocates from one
  // round-robin sequence, no per-partition restart), and wave 2's minimum id
  // strictly exceeds wave 1's maximum (the commit-time high-water CAS
  // advanced between statements). At 100 TB this is the "ingest with
  // engine-assigned surrogate keys into a date/source-partitioned table"
  // shape — one job, no shuffle added by allocation, no coordination beyond
  // the one CAS at commit.
  // --------------------------------------------------------------------------
  private def q297(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_customer_${sfTag(d)}"
    T.customer(s, d).createOrReplaceTempView(src)
    val t = s"r297_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 500 INCREMENT BY 7),
               seg STRING, k BIGINT, bal_c BIGINT) USING parquet
              PARTITIONED BY (seg)""")
    s.sql(s"""INSERT INTO graft.lake.$t (seg, k, bal_c)
      SELECT c_mktsegment, c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 0""")                    // wave 0
    s.sql(s"""INSERT INTO graft.lake.$t (seg, k, bal_c)
      SELECT c_mktsegment, c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 1""")                    // wave 1
    s.sql(s"""WITH g AS (SELECT id, seg, k % 2 AS wave, bal_c FROM graft.lake.$t),
         w AS (SELECT MAX(CASE WHEN wave = 0 THEN id END) AS w0max,
                      MIN(CASE WHEN wave = 1 THEN id END) AS w1min FROM g)
       SELECT seg, COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids,
              SUM(CASE WHEN id >= 500 AND (id - 500) % 7 = 0 THEN 1 ELSE 0 END) AS on_grid,
              CAST(SUM(bal_c) AS BIGINT) AS total_c,
              (SELECT COUNT(DISTINCT id) FROM g) AS all_distinct,
              (SELECT w1min > w0max FROM w) AS wave_monotone
       FROM g GROUP BY seg ORDER BY seg""")
  }

  private val q297Sql =
    """SELECT c_mktsegment AS seg, COUNT(*) AS n, COUNT(*) AS n_ids,
              COUNT(*) AS on_grid,
              CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_c,
              (SELECT COUNT(*) FROM customer) AS all_distinct,
              TRUE AS wave_monotone
       FROM customer GROUP BY 1 ORDER BY seg"""

  // --------------------------------------------------------------------------
  // q298: ZERO-IO STRING MIN/MAX from zone maps (r17) — the string sibling of
  // q221/q290's scan-less audits. Engine-written segments carry EXACT string
  // bounds (parquet-mr stores binary statistics untruncated or not at all, so
  // a bound harvested from a self-written footer IS a row value — flagged
  // 'S' at harvest; add_files imports stay bracket-only and refuse), and the
  // stats-agg merges them in UTF8String BINARY order, the same total order
  // the row-reading plan uses. The query groups by the partition column (the
  // partition-pure constancy gate) and answers MIN/MAX over a derived string
  // and the key — per group AND with planted NULLs — entirely from metadata:
  // on a 100 TB table this is "lexicographic id range per source" with zero
  // tasks reading data. StatsAggSpec pins the plan shape (graft-stats-agg, no
  // parquet scan), the UTF-8-vs-UTF-16 merge-order trap, and the
  // imported-bounds refusal; this query pins VALUES against the relational
  // replay.
  // --------------------------------------------------------------------------
  private def q298(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r298_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, pri STRING, tag STRING)
              USING parquet PARTITIONED BY (pri)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderpriority,
             o_orderstatus || '-' || CAST(o_orderkey % 97 AS STRING)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 19 = 0 THEN NULL ELSE o_orderpriority END,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderstatus || '-' || CAST(o_orderkey % 97 AS STRING) END
      FROM $src WHERE o_orderkey % 2 = 1""")
    s.sql(s"""SELECT pri, COUNT(*) AS n, COUNT(tag) AS n_tags,
                     MIN(tag) AS min_tag, MAX(tag) AS max_tag,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY pri ORDER BY pri NULLS FIRST""")
  }

  private val q298Sql =
    """WITH base AS (
         SELECT o_orderkey AS k,
                CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 19 = 0 THEN NULL
                     ELSE o_orderpriority END AS pri,
                CASE WHEN o_orderkey % 2 = 1 AND o_orderkey % 7 = 0 THEN NULL
                     ELSE o_orderstatus || '-' || CAST(o_orderkey % 97 AS VARCHAR) END AS tag
         FROM orders)
       SELECT pri, COUNT(*) AS n, COUNT(tag) AS n_tags,
              MIN(tag) AS min_tag, MAX(tag) AS max_tag,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM base GROUP BY pri ORDER BY pri NULLS FIRST"""

  // --------------------------------------------------------------------------
  // q299: persisted RETURNS TABLE functions (r17) — the table-valued sibling
  // of q294's scalar inline. A parameterized table function over the lineitem
  // mirror (`big_items(minq)`: the rows at/above a quantity floor, with a
  // persisted SCALAR function composed inside its body) is called TWICE with
  // different arguments and the two inlined instances JOIN on the line key —
  // proving each call site expands to an independent lateral subquery that
  // Catalyst plans like any relation (filter pushdown, join reorder, codegen
  // — zero interpretation overhead, the whole point of inlining). Spark's
  // parser refuses catalog-qualified TVF names, so calls ride the one-part
  // name under USE (restored after planning). The readout re-aggregates the
  // join (intersection = the higher floor) and the DuckDB oracle replays it
  // relationally from the source parquet.
  // --------------------------------------------------------------------------
  private def q299(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_lineitem_${sfTag(d)}"
    T.lineitem(s, d).createOrReplaceTempView(src)
    val t = s"r299_li_${sfTag(d)}"
    val fn = s"big_items_${sfTag(d)}"
    val qb = s"qbucket_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    // the synthetic lineitem's (orderkey, linenumber) is NOT unique, so the
    // mirror dedupes to unique tuples carrying their multiplicity — the twin
    // join then keys on the full tuple (a genuine row identity)
    s.sql(s"""CREATE TABLE graft.lake.$t USING parquet AS
      SELECT l_orderkey AS k, l_linenumber AS ln,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_c,
             COUNT(*) AS cnt
      FROM $src GROUP BY 1, 2, 3, 4""")
    s.sql(s"CREATE OR REPLACE FUNCTION graft.lake.$qb(x BIGINT) RETURNS BIGINT RETURN x DIV 10")
    // the body composes the scalar function and names its table ONE-PART —
    // resolved in the function's own namespace, frozen at CREATE
    s.sql(s"""CREATE OR REPLACE FUNCTION graft.lake.$fn(minq BIGINT)
      RETURNS TABLE (k BIGINT, ln BIGINT, qb BIGINT, qty BIGINT, price_c BIGINT, cnt BIGINT)
      RETURN SELECT k, ln, $qb(qty) AS qb, qty, price_c, cnt FROM $t WHERE qty >= minq""")
    val prevCat = s.catalog.currentCatalog()
    try {
      s.sql("USE graft.lake")
      s.sql(s"""SELECT qb, qty, CAST(SUM(cnt) AS BIGINT) AS n,
                       CAST(SUM(price_c * cnt) AS BIGINT) AS tot_c
        FROM (SELECT a.qb AS qb, a.qty AS qty, a.price_c AS price_c, a.cnt AS cnt
              FROM $fn(40) a JOIN $fn(45) b
                ON a.k = b.k AND a.ln = b.ln AND a.qty = b.qty AND a.price_c = b.price_c)
        GROUP BY qb, qty ORDER BY qty""")
    } finally s.sql(s"USE $prevCat")
  }

  private val q299Sql =
    """WITH li AS (SELECT CAST(l_quantity AS BIGINT) AS qty,
                          CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS price_c
                   FROM lineitem)
       SELECT qty // 10 AS qb, qty, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS tot_c
       FROM li WHERE qty >= 45 GROUP BY qty ORDER BY qty"""

  // --------------------------------------------------------------------------
  // q300: KLL QUANTILE SKETCH STATS (`graft.stats.kll` + `t.column_stats`,
  // r17 — the quantile sibling of q262's NDV sketches): per-segment KLL
  // sketches (k=200) harvested at commit and MERGED zero-IO in
  // `t.column_stats` — per-segment exact medians can never compose
  // (quantiles do not sum), mergeable sketches are the only structure that
  // answers "p50/p90/p99 of a 100 TB column" without a scan. The gate is
  // q262's rank-check shape: the estimate's RANK (count of values at/below
  // it, computed relationally over the table) must sit within KLL's
  // published rank-error bound of the target rank — a property the DuckDB
  // oracle replays as the expected-TRUE row alongside exact counts, so the
  // hash pins the sketch to its contract, not to its internal layout.
  // --------------------------------------------------------------------------
  private def q300(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_orders2_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r300_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, cents BIGINT) USING parquet
              TBLPROPERTIES ('graft.stats.kll' = '*')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 1""")
    s.sql(s"SELECT * FROM graft.lake.$t.column_stats").createOrReplaceTempView(s"${t}_cs")
    s.sql(s"""
      WITH est AS (SELECT p50_estimate AS p50, p90_estimate AS p90,
                          p99_estimate AS p99
                   FROM ${t}_cs WHERE `column` = 'cents'),
           r AS (SELECT (SELECT COUNT(*) FROM graft.lake.$t) AS n,
                        (SELECT COUNT(*) FROM graft.lake.$t
                         WHERE cents <= (SELECT p50 FROM est)) AS le50,
                        (SELECT COUNT(*) FROM graft.lake.$t
                         WHERE cents <= (SELECT p90 FROM est)) AS le90,
                        (SELECT COUNT(*) FROM graft.lake.$t
                         WHERE cents <= (SELECT p99 FROM est)) AS le99)
      SELECT n,
             CAST(le50 BETWEEN CAST(0.47 * n AS BIGINT) AND CAST(0.53 * n AS BIGINT) AS INT) AS p50_ok,
             CAST(le90 BETWEEN CAST(0.87 * n AS BIGINT) AND CAST(0.93 * n AS BIGINT) AS INT) AS p90_ok,
             CAST(le99 >= CAST(0.96 * n AS BIGINT) AS INT) AS p99_ok
      FROM r ORDER BY n""")
  }

  private val q300Sql =
    """SELECT COUNT(*) AS n, 1 AS p50_ok, 1 AS p90_ok, 1 AS p99_ok FROM orders ORDER BY n"""

  // --------------------------------------------------------------------------
  // q301: STEADY-STATE CLUSTERING (GraftZOrder + GraftClusteredWrite, r17) —
  // the lifecycle the persisted routing spec exists for, hash-gated end to
  // end: cluster wave 0 (rewrite_clustered persists the split points), THEN
  // ingest wave 1 (the append fans out into cells through the spec), THEN a
  // SQL UPDATE (the group-based row-level COW rewrite routes survivors into
  // cells — including rows the update moved in key space), THEN ingest wave
  // 2. Every row of every wave flowed through GraftClusteredWrite at least
  // once, so the readout's per-band rollup + global distinct-count gates the
  // router's CONTENT preservation against a relational DuckDB replay (the
  // grid's physical properties — per-cell segments, pruning, compact folding
  // — are ZOrderSpec's pins; this query pins that no row was lost, doubled,
  // or mis-valued on the way through the cells).
  // --------------------------------------------------------------------------
  private def q301(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_orders3_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r301_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, a BIGINT, b BIGINT, cents BIGINT) USING parquet")
    def wave(m: Int): String =
      s"""SELECT o_orderkey, o_custkey % 1000, o_orderkey % 997,
                 CAST(FLOOR(o_totalprice * 100) AS BIGINT)
          FROM $src WHERE o_orderkey % 3 = $m"""
    s.sql(s"INSERT INTO graft.lake.$t ${wave(0)}")
    s.sql(s"CALL graft.system.rewrite_clustered('lake.$t', 'a,b', 8)")
    s.sql(s"INSERT INTO graft.lake.$t ${wave(1)}")               // routed append
    s.sql(s"UPDATE graft.lake.$t SET cents = cents + 100 WHERE k % 10 = 0") // routed COW
    s.sql(s"INSERT INTO graft.lake.$t ${wave(2)}")               // routed append
    s.sql(s"""SELECT CAST(a DIV 100 AS BIGINT) AS band, COUNT(*) AS n,
                     COUNT(DISTINCT k) AS n_keys,
                     CAST(SUM(cents) AS BIGINT) AS total_c,
                     MIN(b) AS min_b, MAX(b) AS max_b
              FROM graft.lake.$t GROUP BY 1 ORDER BY band""")
  }

  private val q301Sql =
    """WITH g AS (
         SELECT o_orderkey AS k, o_custkey % 1000 AS a, o_orderkey % 997 AS b,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) +
                  CASE WHEN o_orderkey % 3 <> 2 AND o_orderkey % 10 = 0
                       THEN 100 ELSE 0 END AS cents
         FROM orders)
       SELECT CAST(a // 100 AS BIGINT) AS band, COUNT(*) AS n,
              COUNT(DISTINCT k) AS n_keys,
              CAST(SUM(cents) AS BIGINT) AS total_c,
              MIN(b) AS min_b, MAX(b) AS max_b
       FROM g GROUP BY 1 ORDER BY band"""

  // --------------------------------------------------------------------------
  // q302: MERGE INSERT MINTS IDENTITY IDS (r18) — the canonical CDC
  // surrogate-key dimension load: wave 0 seeds two thirds of the customers
  // into an identity table, then ONE MERGE updates every matched row and
  // INSERTS the missing third with the identity column omitted — the engine
  // allocates inside the group rewrite and advances the high-water in the
  // SAME commitReplaceSegments CAS that swaps the segments
  // (GraftIdentity.rowLevelWrap). Like q297, the readout gates the
  // INVARIANTS, not raw ids (ids depend on task routing): per-segment
  // uniqueness, grid membership, global distinct = row count, the minted
  // ids' minimum strictly above wave 0's maximum (allocation started at the
  // high-water), and a post-merge sentinel insert strictly above everything
  // (the merge's propCas really advanced the water). At 100 TB this is the
  // nightly CDC upsert into a billion-row dimension — O(touched groups)
  // write volume, key minting with zero extra coordination.
  // --------------------------------------------------------------------------
  private def q302(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_customer2_${sfTag(d)}"
    T.customer(s, d).createOrReplaceTempView(src)
    val t = s"r302_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 100 INCREMENT BY 3),
               k BIGINT, seg STRING, bal_c BIGINT) USING parquet""")
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

  private val q302Sql =
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
  // q303: PER-PARTITION Z-ORDER (r18) — rewrite_clustered on a PARTITIONED
  // table lands `<part>~zc<i>` segments: every partition keeps its purity
  // (pruned scans, partition-scoped DML, dynamic overwrite via baseSuffix
  // matching) while gaining a cell grid with tight bounds on BOTH clustered
  // columns — the Iceberg sort-order-within-partition shape, expressed on
  // the graft segment layer. A SQL DELETE then rides the cell-preserving COW
  // path (survivors route back through their (partition, cell) suffix). The
  // per-(partition, band) rollup hash-gates content preservation through the
  // whole lifecycle; the physical grid properties (purity, either-dimension
  // pruning within a partition, per-(partition,cell) compaction, overwrite
  // swap) are ZOrderSpec's pins. At 100 TB: a date-partitioned corpus whose
  // every day prunes on two more dimensions at plan time.
  // --------------------------------------------------------------------------
  private def q303(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_orders4_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r303_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (k BIGINT, a BIGINT, b BIGINT, cents BIGINT, pri STRING)
              USING parquet PARTITIONED BY (pri)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey % 1000, o_orderkey % 997,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT), o_orderpriority
      FROM $src""")
    s.sql(s"CALL graft.system.rewrite_clustered('lake.$t', 'a,b', 4)")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 11 = 7") // cell-preserving COW
    s.sql(s"""SELECT pri, CAST(a DIV 100 AS BIGINT) AS band, COUNT(*) AS n,
                     COUNT(DISTINCT k) AS n_keys,
                     CAST(SUM(cents) AS BIGINT) AS total_c,
                     MIN(b) AS min_b, MAX(b) AS max_b
              FROM graft.lake.$t GROUP BY 1, 2 ORDER BY pri, band""")
  }

  private val q303Sql =
    """WITH g AS (
         SELECT o_orderkey AS k, o_custkey % 1000 AS a, o_orderkey % 997 AS b,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
                o_orderpriority AS pri
         FROM orders WHERE o_orderkey % 11 <> 7)
       SELECT pri, CAST(a // 100 AS BIGINT) AS band, COUNT(*) AS n,
              COUNT(DISTINCT k) AS n_keys,
              CAST(SUM(cents) AS BIGINT) AS total_c,
              MIN(b) AS min_b, MAX(b) AS max_b
       FROM g GROUP BY 1, 2 ORDER BY pri, band"""

  // --------------------------------------------------------------------------
  // q304: TRANSPARENT MATERIALIZED-VIEW SERVING (GraftMvRewrite) — the
  // serving half of q236/q276's incremental-MV machinery: a COUNT/SUM/MIN/MAX
  // GROUP BY over the SOURCE table is answered FROM a registered fresh MV by
  // a Catalyst rewrite the query never mentions. The lifecycle gates the
  // FRESHNESS rule with content: create table → create_mv → a DML wave
  // (append + DELETE + UPDATE) makes the MV STALE → the 'pre_refresh' era
  // aggregates the source and MUST reflect the wave (a rewrite that served
  // the stale MV would hash-mismatch here — this era is materialized before
  // refresh runs) → refresh_mv advances the watermark → the 'post_refresh'
  // era runs the SAME aggregate, now served from the MV (plan pinned in
  // MvRewriteSpec; values necessarily identical). Both eras replay
  // relationally in DuckDB. At 100 TB: dashboards GROUP BY the fact table
  // and pay O(groups), without knowing the MV exists.
  // --------------------------------------------------------------------------
  private def q304(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r304_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_mv")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, b BIGINT, m BIGINT, cents BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey % 17, o_orderkey % 5,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 <> 0""")
    s.sql(s"CALL graft.system.create_mv('lake.${t}_mv', 'lake.$t', " +
      "keys => 'b,m', sums => 'cents', mins => 'cents', maxs => 'cents')")
    // the wave: the MV is now STALE until refresh_mv
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey % 17, o_orderkey % 5,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 0""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 13 = 0")
    s.sql(s"UPDATE graft.lake.$t SET cents = cents * 2 WHERE k % 29 = 0")
    val agg =
      s"""SELECT b, COUNT(*) AS n, COUNT(cents) AS nn,
                 CAST(SUM(cents) AS BIGINT) AS total_c,
                 ROUND(AVG(cents), 2) AS avg_c,
                 MIN(cents) AS min_c, MAX(cents) AS max_c
          FROM graft.lake.$t WHERE m = 2 GROUP BY b"""
    // materialize the stale-era readout NOW (collect — group-count-sized):
    // the freshness gate must route it to the SOURCE, so it reflects the wave
    import s.implicits._
    val pre = s.sql(agg).collect().toSeq
      .map(r => ("pre_refresh", r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6)))
      .toDF("era", "b", "n", "nn", "total_c", "avg_c", "min_c", "max_c")
    s.sql(s"CALL graft.system.refresh_mv('lake.${t}_mv')")
    val post = s.sql(s"SELECT 'post_refresh' AS era, * FROM ($agg)")
    pre.unionByName(post).orderBy("era", "b")
  }

  private val q304Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey % 17 AS b, o_orderkey % 5 AS m,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
         FROM orders),
       final AS (
         SELECT b, m, CASE WHEN k % 29 = 0 THEN cents * 2 ELSE cents END AS cents
         FROM base WHERE k % 13 <> 0),
       agg AS (
         SELECT b, COUNT(*) AS n, COUNT(cents) AS nn,
                CAST(SUM(cents) AS BIGINT) AS total_c,
                ROUND(AVG(cents), 2) AS avg_c,
                MIN(cents) AS min_c, MAX(cents) AS max_c
         FROM final WHERE m = 2 GROUP BY b)
       SELECT eras.era, a.b, a.n, a.nn, a.total_c, a.avg_c, a.min_c, a.max_c
       FROM (SELECT 'pre_refresh' AS era UNION ALL SELECT 'post_refresh') eras
       CROSS JOIN agg a
       ORDER BY eras.era, a.b"""

  // --------------------------------------------------------------------------
  // q305: TOP-K SEGMENT PRUNING (GraftTopKPrune) — `ORDER BY score DESC
  // LIMIT k` over a graft table derives a sound threshold from committed
  // zone stats (>= k non-null values provably >= tau) and injects
  // `score >= tau`, so zone pruning skips every segment that cannot reach
  // the top k — the "k best-scoring documents" curation query at plan time,
  // zero IO. Content is rewrite-independent by construction (the filter
  // keeps a superset of the top k); the hash gate proves the injected
  // threshold never cuts a top-k row, TopKPruneSpec pins the plan (one
  // segment planned for a stacked layout; DV/ASC/WHERE gates fall back).
  // --------------------------------------------------------------------------
  private def q305(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = s"r20_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(src)
    val t = s"r305_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, cents BIGINT) USING parquet")
    (0 until 3).foreach { w =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src WHERE o_orderkey % 3 = $w""")
    }
    s.sql(s"SELECT k, cents FROM graft.lake.$t ORDER BY cents DESC, k LIMIT 100")
  }

  private val q305Sql =
    """SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents
       FROM orders ORDER BY cents DESC, k LIMIT 100"""

  val defs: Seq[QDef] = Seq(
    QDef("q297_identity_partitioned", q297, Some(q297Sql)),
    QDef("q298_string_minmax_zero_io", q298, Some(q298Sql)),
    QDef("q299_table_function_inline", q299, Some(q299Sql)),
    QDef("q300_kll_quantile_stats", q300, Some(q300Sql)),
    QDef("q301_clustered_steady_state", q301, Some(q301Sql)),
    QDef("q302_merge_identity_minting", q302, Some(q302Sql)),
    QDef("q303_partitioned_zorder", q303, Some(q303Sql)),
    QDef("q304_transparent_mv_rewrite", q304, Some(q304Sql)),
    QDef("q305_topk_segment_pruning", q305, Some(q305Sql)),
  )
}
