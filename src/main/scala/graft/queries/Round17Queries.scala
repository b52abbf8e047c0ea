package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-17 operators: lakehouse schema-evolution and maintenance surfaces
  * the judge's round-12 plan names next — column RENAME over stable field
  * ids, the `t.partitions` metadata table, and MIN/MAX materialized-view
  * refresh via bounded re-aggregation.
  *
  * Oracle strategy unchanged (SURVEY.md §2b): deterministic relational
  * replays in DuckDB over the same parquet inputs, integer-cents money,
  * trailing total-order sorts. */
object Round17Queries {

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  private def customerView(s: SparkSession, d: String): String = {
    val v = s"r17_customer_${sfTag(d)}"
    T.customer(s, d).createOrReplaceTempView(v)
    v
  }

  // --------------------------------------------------------------------------
  // q274: COLUMN RENAME via stable field ids (Iceberg v2 schema evolution on
  // Spark's native parquet field-id machinery — GraftFieldIds). The table is
  // loaded, a money column is RENAMED (metadata-only: zero segments
  // rewritten; the table flips to id resolution and pre-rename footers serve
  // the column BY ID), a second era of rows lands under the new name, and the
  // readout filters + aggregates across BOTH eras through the new name — the
  // single most common schema change a curated corpus table sees after
  // add-column, now first-class instead of honestly refused. The oracle
  // replays the union relationally; a broken rename would null-fill or drop
  // the pre-rename era and miss the hash.
  // --------------------------------------------------------------------------
  private def q274(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r274_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT c_custkey AS k, c_nationkey AS nat,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM $src WHERE c_custkey % 2 = 0""")
    s.sql(s"ALTER TABLE graft.lake.$t RENAME COLUMN bal_c TO balance_c")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, c_nationkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 1""")
    // the filter probes id-resolved pushdown into PRE-rename segments; the
    // aggregate must see both eras under the renamed column
    s.sql(s"""SELECT nat, COUNT(*) AS n, CAST(SUM(balance_c) AS BIGINT) AS total_c,
                     MIN(balance_c) AS min_c, MAX(balance_c) AS max_c
              FROM graft.lake.$t WHERE balance_c > 0
              GROUP BY nat ORDER BY nat""")
  }

  private val q274Sql =
    """WITH t AS (
         SELECT c_custkey AS k, c_nationkey AS nat,
                CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS balance_c
         FROM customer)
       SELECT nat, COUNT(*) AS n, CAST(SUM(balance_c) AS BIGINT) AS total_c,
              MIN(balance_c) AS min_c, MAX(balance_c) AS max_c
       FROM t WHERE balance_c > 0
       GROUP BY nat ORDER BY nat"""

  // --------------------------------------------------------------------------
  // q275: `t.partitions` METADATA TABLE (Iceberg convention, beside
  // snapshots/segments/refs/tags/column_stats) — per-partition-value
  // segment/row rollups decoded from segment suffixes + committed zone
  // stats. Plans as a LocalScan: zero file IO, zero jobs — the first
  // question an operator asks a skewed 100 TB table ("which partition is
  // fat?") answered from the meta file alone. Two INSERTs land one segment
  // per touched partition value each, so n_segments is deterministic (2 for
  // values present in both eras, 1 for the second-era-only 'P' slice); the
  // oracle recomputes the same rollup relationally from `orders`.
  // --------------------------------------------------------------------------
  private def q275(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = {
      val v = s"r17_orders_${sfTag(d)}"
      T.orders(s, d).createOrReplaceTempView(v)
      v
    }
    val t = s"r275_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
              USING parquet PARTITIONED BY (st)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderstatus != 'P'""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"""SELECT partition AS st, n_segments, n_rows
              FROM graft.lake.$t.partitions ORDER BY st""")
  }

  private val q275Sql =
    """WITH ins1 AS (SELECT o_orderstatus AS st FROM orders WHERE o_orderstatus != 'P'),
         ins2 AS (SELECT o_orderstatus AS st FROM orders WHERE o_orderkey % 2 = 0),
         eras AS (SELECT st, 1 AS era FROM ins1 UNION ALL SELECT st, 2 FROM ins2)
       SELECT st, CAST(COUNT(DISTINCT era) AS INT) AS n_segments,
              COUNT(*) AS n_rows
       FROM eras GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q276: MATERIALIZED-VIEW MIN/MAX maintenance (GraftMaterializedView) —
  // q236's incremental-MV contract extended to the non-delta-commutative
  // aggregates the engine used to refuse. create_mv materializes
  // COUNT/SUM/MIN/MAX once; a DML wave then appends (extrema tighten with
  // pure arithmetic — no rescan), DELETEs rows INCLUDING group extrema, and
  // UPDATEs rows past old maxima; refresh_mv applies CDC deltas and
  // re-aggregates ONLY the endangered groups (deleted extremum == stored
  // extremum) from the source via a broadcast semi-join — the counting
  // algorithm's bounded fallback, never a full regroup. The oracle
  // recomputes the refreshed MV from a relational replay of the final
  // source state: the hash gates incremental extrema ≡ full recompute.
  // --------------------------------------------------------------------------
  private def q276(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = {
      val v = s"r17_orders_${sfTag(d)}"
      T.orders(s, d).createOrReplaceTempView(v)
      v
    }
    val t = s"m276_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_mv")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, b BIGINT, price_c BIGINT)
      USING parquet
      TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read',
                     'graft.update-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderkey % 23, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"CALL graft.system.create_mv('lake.${t}_mv', 'lake.$t', " +
      "keys => 'b', sums => 'price_c', mins => 'price_c', maxs => 'price_c')")
    // the wave: appends tighten; the % 14 DELETE reaps rows including group
    // extrema (endangered-group rescans); the UPDATE moves rows ABOVE old
    // maxima (delete+insert pairs through CDC)
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderkey % 23, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 1""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 14 = 0")
    s.sql(s"UPDATE graft.lake.$t SET price_c = price_c * 3 WHERE k % 19 = 0")
    s.sql(s"CALL graft.system.refresh_mv('lake.${t}_mv')")
    s.sql(s"""SELECT b, n_rows, CAST(sum_price_c AS BIGINT) AS sum_price_c,
                     min_price_c, max_price_c
              FROM graft.lake.${t}_mv ORDER BY b""")
  }

  private val q276Sql =
    """WITH final AS (
         SELECT o_orderkey % 23 AS b,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                  * CASE WHEN o_orderkey % 19 = 0 THEN 3 ELSE 1 END AS price_c
         FROM orders WHERE o_orderkey % 14 <> 0)
       SELECT b, COUNT(*) AS n_rows, CAST(SUM(price_c) AS BIGINT) AS sum_price_c,
              MIN(price_c) AS min_price_c, MAX(price_c) AS max_price_c
       FROM final GROUP BY b ORDER BY b"""

  // --------------------------------------------------------------------------
  // q277: COLUMN DEFAULT VALUES (TableCatalogCapability
  // .SUPPORT_COLUMN_DEFAULT_VALUE) — the OTHER most common schema change
  // beside rename: ADD COLUMN ... DEFAULT stays metadata-only (EXISTS_DEFAULT
  // frozen at ADD fills every pre-ADD segment at read time through Spark's
  // native parquet default machinery — zero segments rewritten), the
  // analyzer fills CURRENT_DEFAULT into column-list INSERTs, and SET DEFAULT
  // moves only future writes. The readout groups a filtered aggregate by the
  // defaulted column across all three eras (pre-ADD / default-filled /
  // explicit); the oracle replays the era arithmetic relationally.
  // --------------------------------------------------------------------------
  private def q277(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r277_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, bal_c BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 3 = 0""")                       // pre-ADD era
    s.sql(s"ALTER TABLE graft.lake.$t ADD COLUMNS (tier BIGINT DEFAULT 3)")
    s.sql(s"""INSERT INTO graft.lake.$t (k, bal_c)
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 3 = 1""")                       // filled era
    s.sql(s"ALTER TABLE graft.lake.$t ALTER COLUMN tier SET DEFAULT 9")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT),
             c_nationkey % 4
      FROM $src WHERE c_custkey % 3 = 2""")                       // explicit era
    s.sql(s"""INSERT INTO graft.lake.$t (k, bal_c)
      SELECT c_custkey + 1000000, 0 FROM $src WHERE c_custkey % 50 = 0""") // new default era
    s.sql(s"""SELECT tier, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS total_c
              FROM graft.lake.$t WHERE bal_c >= 0
              GROUP BY tier ORDER BY tier""")
  }

  private val q277Sql =
    """WITH t AS (
         SELECT 3 AS tier, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
         FROM customer WHERE c_custkey % 3 = 0
         UNION ALL
         SELECT 3, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
         FROM customer WHERE c_custkey % 3 = 1
         UNION ALL
         SELECT c_nationkey % 4, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
         FROM customer WHERE c_custkey % 3 = 2
         UNION ALL
         SELECT 9, 0 FROM customer WHERE c_custkey % 50 = 0)
       SELECT tier, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS total_c
       FROM t WHERE bal_c >= 0
       GROUP BY tier ORDER BY tier"""

  // --------------------------------------------------------------------------
  // q278: ALTER COLUMN TYPE WIDENING (the Delta/Iceberg type-widening
  // contract, metadata-only): an INT money column is widened to BIGINT;
  // pre-widen segments keep their narrow physical columns and upcast at
  // read time through Spark's native parquet widening (probe-pinned);
  // post-widen rows exceed Int.MaxValue (impossible before the widen), and
  // the readout filters + aggregates across both eras. The oracle replays
  // with plain casts; a rewrite-based (or broken) widen would hash-diverge.
  // --------------------------------------------------------------------------
  private def q278(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r278_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, nat BIGINT, bal_c INT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, c_nationkey, CAST(FLOOR(c_acctbal * 100) AS INT)
      FROM $src WHERE c_custkey % 2 = 0""")                    // narrow era
    s.sql(s"ALTER TABLE graft.lake.$t ALTER COLUMN bal_c TYPE BIGINT")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, c_nationkey,
             CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 5000000000
      FROM $src WHERE c_custkey % 2 = 1""")                    // wide era (> Int.Max)
    s.sql(s"""SELECT nat, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS total_c,
                     MIN(bal_c) AS min_c, MAX(bal_c) AS max_c
              FROM graft.lake.$t WHERE bal_c > -99000
              GROUP BY nat ORDER BY nat""")
  }

  private val q278Sql =
    """WITH t AS (
         SELECT c_nationkey AS nat, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
         FROM customer WHERE c_custkey % 2 = 0
         UNION ALL
         SELECT c_nationkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 5000000000
         FROM customer WHERE c_custkey % 2 = 1)
       SELECT nat, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS total_c,
              MIN(bal_c) AS min_c, MAX(bal_c) AS max_c
       FROM t WHERE bal_c > -99000
       GROUP BY nat ORDER BY nat"""

  val defs: Seq[QDef] = Seq(
    QDef("q274_column_rename", q274, Some(q274Sql)),
    QDef("q275_partitions_metadata", q275, Some(q275Sql)),
    QDef("q276_mv_minmax", q276, Some(q276Sql)),
    QDef("q277_column_defaults", q277, Some(q277Sql)),
    QDef("q278_type_widening", q278, Some(q278Sql)))
}
