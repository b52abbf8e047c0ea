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

  // --------------------------------------------------------------------------
  // q281: MERGE WITH SCHEMA EVOLUTION (TableCapability
  // .AUTOMATIC_SCHEMA_EVOLUTION): an upsert source carrying a column the
  // target never declared evolves the target MID-MERGE through the
  // catalog's own AddColumn arm — pre-merge rows null-fill the new column,
  // matched rows update through it, unmatched rows insert with it, all in
  // the ONE group-based merge pass. The readout aggregates by the evolved
  // column across the pre-merge / updated / inserted populations; the
  // oracle replays the upsert relationally.
  // --------------------------------------------------------------------------
  private def q281(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r281_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, bal_c BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 3 <> 0""")                  // pre-merge population
    val v = s"r281_src_${sfTag(d)}"
    s.sql(s"""SELECT c_custkey AS k,
                     CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 1000000 AS bal_c,
                     c_nationkey % 5 AS tier
              FROM $src WHERE c_custkey % 2 = 0""").createOrReplaceTempView(v)
    s.sql(s"""MERGE WITH SCHEMA EVOLUTION INTO graft.lake.$t t USING $v s ON t.k = s.k
              WHEN MATCHED THEN UPDATE SET *
              WHEN NOT MATCHED THEN INSERT *""")
    s.sql(s"""SELECT COALESCE(tier, -1) AS tier, COUNT(*) AS n,
                     CAST(SUM(bal_c) AS BIGINT) AS total_c,
                     MIN(bal_c) AS min_c, MAX(bal_c) AS max_c
              FROM graft.lake.$t WHERE bal_c > -99000000
              GROUP BY COALESCE(tier, -1) ORDER BY tier""")
  }

  private val q281Sql =
    """WITH pre AS (
         SELECT c_custkey AS k, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
         FROM customer WHERE c_custkey % 3 <> 0),
       src AS (
         SELECT c_custkey AS k,
                CAST(FLOOR(c_acctbal * 100) AS BIGINT) + 1000000 AS bal_c,
                c_nationkey % 5 AS tier
         FROM customer WHERE c_custkey % 2 = 0),
       merged AS (
         SELECT p.k,
                COALESCE(s.bal_c, p.bal_c) AS bal_c,
                s.tier AS tier
         FROM pre p LEFT JOIN src s ON p.k = s.k
         UNION ALL
         SELECT s.k, s.bal_c, s.tier FROM src s
         WHERE s.k NOT IN (SELECT k FROM pre))
       SELECT COALESCE(tier, -1) AS tier, COUNT(*) AS n,
              CAST(SUM(bal_c) AS BIGINT) AS total_c,
              MIN(bal_c) AS min_c, MAX(bal_c) AS max_c
       FROM merged WHERE bal_c > -99000000
       GROUP BY COALESCE(tier, -1) ORDER BY tier"""

  // --------------------------------------------------------------------------
  // q282: NESTED data skipping (dot-path zone maps, r15): struct-member
  // leaves harvest per-segment min/max at commit, and predicates on
  // `meta.k` / `meta.st` — GetStructField chains, not top-level columns —
  // prune whole segments at plan time exactly like q164's flat form. The
  // fixture appends four key-range-ordered batches (four segments with
  // disjoint nested zones); both readout predicates land inside one
  // segment's zone, so the scan plans 1/4 of the files with zero IO on the
  // rest (NestedZoneStatsSpec pins the planned-segment count; this query
  // hash-gates the values and benches the shape).
  // --------------------------------------------------------------------------
  private def q282(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"r282_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (meta STRUCT<k: BIGINT, st: STRING>, price_c BIGINT)
              USING parquet TBLPROPERTIES ('write.order-by'='price_c')""")
    (0 until 4).foreach { q =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT named_struct('k', o_orderkey, 'st', o_orderstatus),
               CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src
        WHERE o_orderkey * 4 >= (SELECT MAX(o_orderkey) FROM $src) * $q
          AND o_orderkey * 4 <  (SELECT MAX(o_orderkey) FROM $src) * ${q + 1}
           OR ($q = 3 AND o_orderkey = (SELECT MAX(o_orderkey) FROM $src))""")
    }
    s.sql(s"""SELECT 'point' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t WHERE meta.k = 32
              UNION ALL
              SELECT 'range' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t WHERE meta.k BETWEEN 100 AND 999 AND meta.st <> 'Z'
              ORDER BY kind""")
  }

  private def ordersView(s: SparkSession, d: String): String = {
    val v = s"r18_orders_${sfTag(d)}"
    T.orders(s, d).createOrReplaceTempView(v)
    v
  }

  private val q282Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders)
       SELECT 'point' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base WHERE k = 32
       UNION ALL
       SELECT 'range' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base WHERE k BETWEEN 100 AND 999 AND st <> 'Z'
       ORDER BY kind"""

  // --------------------------------------------------------------------------
  // q283: IDENTITY COLUMNS (`GENERATED ALWAYS AS IDENTITY`, GraftIdentity):
  // two append commits against an identity table allocate surrogate keys
  // with NO coordination (round-robin interleaving per task) — so the raw
  // ids are partitioning-dependent, and the readout gates the CONTRACT
  // instead: per-era row counts, id uniqueness (count distinct == count),
  // grid membership (every id on the start+k*step lattice), and commit
  // monotonicity (era 2's minimum id above era 1's maximum — the high-water
  // CAS advanced). Each of those aggregates is deterministic under any task
  // layout, so the DuckDB oracle replays them exactly. IdentityColumnsSpec
  // pins the dense single-partition values, refusals, and COW id carry.
  // --------------------------------------------------------------------------
  private def q283(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val src = customerView(s, d)
    val t = s"r283_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 1000 INCREMENT BY 2),
               k BIGINT, bal_c BIGINT) USING parquet""")
    s.sql(s"""INSERT INTO graft.lake.$t (k, bal_c)
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 0""")                    // era 0 commit
    s.sql(s"""INSERT INTO graft.lake.$t (k, bal_c)
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $src WHERE c_custkey % 2 = 1""")                    // era 1 commit
    s.sql(s"""WITH g AS (SELECT id, k % 2 AS era, bal_c FROM graft.lake.$t),
         b AS (SELECT era, COUNT(*) AS n, COUNT(DISTINCT id) AS n_ids,
                      SUM(CASE WHEN id >= 1000 AND (id - 1000) % 2 = 0
                               THEN 1 ELSE 0 END) AS on_grid,
                      CAST(SUM(bal_c) AS BIGINT) AS total_c,
                      MIN(id) AS mn, MAX(id) AS mx
               FROM g GROUP BY era)
       SELECT era, n, n_ids, on_grid, total_c,
              CASE WHEN era = 1 THEN mn > (SELECT mx FROM b WHERE era = 0)
                   ELSE TRUE END AS monotone
       FROM b ORDER BY era""")
  }

  private val q283Sql =
    """SELECT c_custkey % 2 AS era, COUNT(*) AS n, COUNT(*) AS n_ids,
              COUNT(*) AS on_grid,
              CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_c,
              TRUE AS monotone
       FROM customer GROUP BY c_custkey % 2 ORDER BY era"""

  // --------------------------------------------------------------------------
  // q284: STORAGE-PARTITIONED JOIN (GraftSpj): two graft tables identity-
  // partitioned by nation are joined AND aggregated on the partition key —
  // the scans report KeyGroupedPartitioning from the partition-pure segment
  // layout, so the whole pipeline plans with ZERO hash exchange on either
  // side (PlanSpec pins the exchange-free plan; StoragePartitionedJoinSpec
  // pins value alignment, NULL keys, and the fallbacks). The readout is a
  // per-nation fanout join (customers x suppliers within a nation) whose
  // aggregate hash-matches a relational replay — grouped execution must
  // produce exactly the shuffled plan's answer.
  // --------------------------------------------------------------------------
  private def q284(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val cust = customerView(s, d)
    val supp = s"r18_supplier_${sfTag(d)}"
    T.supplier(s, d).createOrReplaceTempView(supp)
    val t = s"r284_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_c")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_s")
    s.sql(s"""CREATE TABLE graft.lake.${t}_c (cust BIGINT, bal_c BIGINT, nat BIGINT)
              USING parquet PARTITIONED BY (nat)""")
    s.sql(s"""CREATE TABLE graft.lake.${t}_s (supp BIGINT, acct_c BIGINT, nat BIGINT)
              USING parquet PARTITIONED BY (nat)""")
    s.sql(s"""INSERT INTO graft.lake.${t}_c
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT), c_nationkey FROM $cust""")
    s.sql(s"""INSERT INTO graft.lake.${t}_s
      SELECT s_suppkey, CAST(FLOOR(s_acctbal * 100) AS BIGINT), s_nationkey FROM $supp""")
    s.sql(s"""SELECT c.nat, COUNT(*) AS n,
                     CAST(SUM(c.bal_c + s.acct_c) AS BIGINT) AS total_c
              FROM graft.lake.${t}_c c JOIN graft.lake.${t}_s s ON c.nat = s.nat
              GROUP BY c.nat ORDER BY c.nat""")
  }

  private val q284Sql =
    """SELECT c.c_nationkey AS nat, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(c.c_acctbal * 100) AS BIGINT) +
                       CAST(FLOOR(s.s_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_c
       FROM customer c JOIN supplier s ON c.c_nationkey = s.s_nationkey
       GROUP BY c.c_nationkey ORDER BY nat"""

  // --------------------------------------------------------------------------
  // q285: BUCKETED storage-partitioned join — the HIGH-CARDINALITY completion
  // of q284. The orderkey join key is far too wide to identity-partition, so
  // both fact tables partition by the derived bucket column
  // bkt = pmod(xxhash64(k), 16) (the explicit-column rendering of Iceberg's
  // bucket(16, k) transform) and the join carries the bucket conjunct
  // (equal k implies equal bkt, so it never changes the result). The scans
  // report KeyGroupedPartitioning(bkt); with co-partitioning allowed on the
  // clustering SUBSET, the orders x lineitem join plans with ZERO hash
  // exchange on either side — the 100 TB fact-fact shape. The oracle replays
  // the plain k-join; buckets must be invisible in the answer.
  // --------------------------------------------------------------------------
  private def q285(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val ord = ordersView(s, d)
    val li = s"r18_lineitem_${sfTag(d)}"
    T.lineitem(s, d).createOrReplaceTempView(li)
    val t = s"r285_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_o")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_l")
    s.sql(s"""CREATE TABLE graft.lake.${t}_o (k BIGINT, price_c BIGINT, bkt INT)
              USING parquet PARTITIONED BY (bkt)""")
    s.sql(s"""CREATE TABLE graft.lake.${t}_l (k BIGINT, flag STRING, ext_c BIGINT, bkt INT)
              USING parquet PARTITIONED BY (bkt)""")
    s.sql(s"""INSERT INTO graft.lake.${t}_o
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT),
             CAST(pmod(xxhash64(o_orderkey), 16) AS INT) FROM $ord""")
    s.sql(s"""INSERT INTO graft.lake.${t}_l
      SELECT l_orderkey, l_returnflag, CAST(FLOOR(l_extendedprice * 100) AS BIGINT),
             CAST(pmod(xxhash64(l_orderkey), 16) AS INT) FROM $li""")
    s.sql(s"""SELECT l.flag, COUNT(*) AS n,
                     CAST(SUM(l.ext_c) AS BIGINT) AS ext_total_c,
                     CAST(SUM(o.price_c) AS BIGINT) AS price_total_c
              FROM graft.lake.${t}_o o JOIN graft.lake.${t}_l l
                ON o.bkt = l.bkt AND o.k = l.k
              GROUP BY l.flag ORDER BY l.flag""")
  }

  private val q285Sql =
    """SELECT l.l_returnflag AS flag, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ext_total_c,
              CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_total_c
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY l.l_returnflag ORDER BY flag"""

  // --------------------------------------------------------------------------
  // q286: ATOMIC CTAS + CREATE OR REPLACE TABLE AS SELECT (GraftStaging,
  // StagingTableCatalog). A table is CTAS'd from customers and grows a second
  // commit; then RTAS atomically redefines it — different schema, different
  // source — while the old definition keeps serving until the single-mutate
  // swap. The readout aggregates the POST-replace state; the hash only
  // matches if the replacement fully displaced both pre-replace commits
  // (schema and rows) and the RTAS write went through the normal gated path.
  // StagedTableSpec pins failure atomicity, invisibility, and reclaim.
  // --------------------------------------------------------------------------
  private def q286(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val cust = customerView(s, d)
    val supp = s"r18_supplier2_${sfTag(d)}"
    T.supplier(s, d).createOrReplaceTempView(supp)
    val t = s"r286_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t USING parquet AS
      SELECT c_custkey AS k, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_c
      FROM $cust WHERE c_custkey % 2 = 0""")                     // CTAS era 1
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
      FROM $cust WHERE c_custkey % 2 = 1""")                     // era 2
    s.sql(s"""CREATE OR REPLACE TABLE graft.lake.$t USING parquet AS
      SELECT s_nationkey AS nat, COUNT(*) AS n_supp,
             CAST(SUM(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acct_total_c
      FROM $supp GROUP BY s_nationkey""")                        // atomic redefinition
    s.sql(s"""SELECT nat, n_supp, acct_total_c,
                     CAST(n_supp * 1000000 + nat AS BIGINT) AS order_probe
              FROM graft.lake.$t ORDER BY nat""")
  }

  private val q286Sql =
    """WITH r AS (
         SELECT s_nationkey AS nat, COUNT(*) AS n_supp,
                CAST(SUM(CAST(FLOOR(s_acctbal * 100) AS BIGINT)) AS BIGINT) AS acct_total_c
         FROM supplier GROUP BY s_nationkey)
       SELECT nat, n_supp, acct_total_c,
              CAST(n_supp * 1000000 + nat AS BIGINT) AS order_probe
       FROM r ORDER BY nat"""

  // --------------------------------------------------------------------------
  // q287: SQL SCRIPTING (Spark 4's BEGIN..END procedural surface, the third
  // leg beside session variables q219 and EXECUTE IMMEDIATE q220) driving
  // ENGINE DML: a WHILE loop lands one graft commit per customer shard, an
  // IF gate skips one shard entirely, and scripted variables thread the loop
  // state — the backfill-driver shape operators actually write. The script's
  // final SELECT aggregates the table; the oracle replays the three admitted
  // shards relationally (a wrong loop count, a mis-gated IF, or a lost
  // commit all miss the hash).
  // --------------------------------------------------------------------------
  private def q287(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    s.conf.set("spark.sql.scripting.enabled", "true")
    val cust = customerView(s, d)
    val t = s"r287_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, nat BIGINT, bal_c BIGINT) USING parquet")
    s.sql(
      s"""BEGIN
         |  DECLARE shard INT DEFAULT 0;
         |  DECLARE landed BIGINT DEFAULT 0;
         |  WHILE shard < 4 DO
         |    IF shard <> 2 THEN
         |      INSERT INTO graft.lake.$t
         |      SELECT c_custkey, c_nationkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT)
         |      FROM $cust WHERE c_custkey % 4 = shard;
         |      SET landed = landed + 1;
         |    END IF;
         |    SET shard = shard + 1;
         |  END WHILE;
         |  SELECT nat, COUNT(*) AS n, CAST(SUM(bal_c) AS BIGINT) AS total_c,
         |         landed AS commits
         |  FROM graft.lake.$t GROUP BY nat ORDER BY nat;
         |END""".stripMargin)
  }

  private val q287Sql =
    """SELECT c_nationkey AS nat, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_c,
              CAST(3 AS BIGINT) AS commits
       FROM customer WHERE c_custkey % 4 <> 2
       GROUP BY c_nationkey ORDER BY nat"""

  // --------------------------------------------------------------------------
  // q288: NATIVE BUCKET PARTITIONING (`PARTITIONED BY (bucket(16, k))`,
  // GraftBucket + FunctionCatalog) — q285's recipe promoted to first-class
  // DDL: the writer routes rows by the engine-owned bucket function into
  // bucket-pure segments, the scans report the bucket(16, k) transform
  // (resolved through the catalog's own FunctionCatalog), and the
  // orders x lineitem join needs ONLY `ON o.k = l.k` — no derived column,
  // no bucket conjunct — to plan with zero exchange on either fact side.
  // The oracle replays the plain k-join; buckets are invisible in the answer.
  // --------------------------------------------------------------------------
  private def q288(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val ord = ordersView(s, d)
    val li = s"r18_lineitem2_${sfTag(d)}"
    T.lineitem(s, d).createOrReplaceTempView(li)
    val t = s"r288_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_o")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_l")
    s.sql(s"""CREATE TABLE graft.lake.${t}_o (k BIGINT, status STRING, price_c BIGINT)
              USING parquet PARTITIONED BY (bucket(16, k))""")
    s.sql(s"""CREATE TABLE graft.lake.${t}_l (k BIGINT, qty BIGINT, ext_c BIGINT)
              USING parquet PARTITIONED BY (bucket(16, k))""")
    s.sql(s"""INSERT INTO graft.lake.${t}_o
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT) FROM $ord""")
    s.sql(s"""INSERT INTO graft.lake.${t}_l
      SELECT l_orderkey, CAST(l_quantity AS BIGINT),
             CAST(FLOOR(l_extendedprice * 100) AS BIGINT) FROM $li""")
    s.sql(s"""SELECT o.status, COUNT(*) AS n, CAST(SUM(l.qty) AS BIGINT) AS qty_total,
                     CAST(SUM(l.ext_c) AS BIGINT) AS ext_total_c
              FROM graft.lake.${t}_o o JOIN graft.lake.${t}_l l ON o.k = l.k
              GROUP BY o.status ORDER BY o.status""")
  }

  private val q288Sql =
    """SELECT o.o_orderstatus AS status, COUNT(*) AS n,
              CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_total,
              CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS ext_total_c
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_orderstatus ORDER BY status"""

  val defs: Seq[QDef] = Seq(
    QDef("q279_sql_views", q279, Some(q279Sql)),
    QDef("q280_nested_evolution", q280, Some(q280Sql)),
    QDef("q281_merge_evolution", q281, Some(q281Sql)),
    QDef("q282_nested_skipping", q282, Some(q282Sql)),
    QDef("q283_identity_columns", q283, Some(q283Sql)),
    QDef("q284_storage_partitioned_join", q284, Some(q284Sql)),
    QDef("q285_bucketed_spj", q285, Some(q285Sql)),
    QDef("q286_atomic_replace_table", q286, Some(q286Sql)),
    QDef("q287_sql_scripting_driver", q287, Some(q287Sql)),
    QDef("q288_native_bucket_join", q288, Some(q288Sql)))
}
