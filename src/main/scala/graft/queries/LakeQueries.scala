package graft.queries

import graft.QDef
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lakehouse surface over the graft snapshot catalog
  * (graft/catalog/GraftCatalog.scala): SQL `MERGE INTO` with the full clause
  * surface, row-level `UPDATE`/`DELETE`, and `VERSION AS OF` time travel over
  * copy-on-write snapshots.
  *
  * This closes the loop that q75 (compositional CDC changeset merge) opens:
  * q75 computes a merged state as a plain query; these queries have the engine
  * OWN the table, so the merge is a catalog operation against a persisted,
  * snapshot-versioned target — the shape a 100 TB ingestion pipeline actually
  * runs (upsert batch in, old snapshots retained for audit/rollback).
  *
  * Oracle strategy: row-level DML is deterministic relational algebra, so each
  * query's DuckDB twin reconstructs the post-DML state with joins/filters over
  * the same `orders` projection and aggregates identically (FLOOR(x*100) cents
  * convention, BIGINT casts, trailing total-order sort).
  */
object LakeQueries {

  /** One catalog root per JVM (pid-scoped, like the SinkQueries scratch dirs);
    * table names additionally carry the scale-factor hash so concurrent SFs
    * never collide inside one catalog. */
  private[queries] def ensureCatalog(s: SparkSession): Unit =
    if (s.conf.getOption("spark.sql.catalog.graft").isEmpty) {
      val root = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_lake_p${ProcessHandle.current().pid()}").getAbsolutePath
      s.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      s.conf.set("spark.sql.catalog.graft.root", root)
      // storage-partitioned joins (GraftSpj): let Spark exploit the
      // KeyGroupedPartitioning graft's partition-pure scans report — joins
      // and aggregations keyed on partition columns then plan with ZERO
      // exchange; pushPartValues aligns mismatched partition-value sets
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // a join clustered on (bucket, key) must co-partition on the SUBSET the
      // layout groups by (the Iceberg SPJ recommendation) — q285's shape
      s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
      // one split per partition value + the scan-reported partition-key sort
      // order drop the SMJ Sort nodes as well (GraftStreamableScan
      // .outputOrdering; Spark re-validates against its own grouping)
      s.conf.set("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
    }

  private def sfTag(sfDir: String): String = Integer.toHexString(sfDir.hashCode)

  /** Stable integer-cents projection of `orders`, registered as a temp view so
    * the DDL below can reference it by name. */
  private def ordersView(s: SparkSession, d: String): String = {
    val v = s"lake_orders_${sfTag(d)}"
    graft.Tables.orders(s, d).createOrReplaceTempView(v)
    v
  }

  // --------------------------------------------------------------------------
  // q152: MERGE INTO with the full clause surface — matched-and DELETE, matched
  // UPDATE, not-matched INSERT, and not-matched-BY-SOURCE DELETE — against a
  // graft catalog table. Spark rewrites this into ONE scan + surviving-rows
  // plan + ONE replacement-snapshot write (group-based copy-on-write); there
  // is no per-row RPC, no driver loop — the merge is a distributed join, which
  // is the only shape that survives a 100 TB target. The oracle reconstructs
  // the post-merge state with the textbook three-way split (kept / updated /
  // inserted) and aggregates it.
  // --------------------------------------------------------------------------
  private def q152(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m152_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_custkey AS cust, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 3 != 0""")
    s.sql(s"""MERGE INTO graft.lake.$t t
      USING (SELECT o_orderkey AS k, o_custkey AS cust, 'U' AS st,
                    CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 2 AS price_c
             FROM $src WHERE o_orderkey % 2 = 0) s
      ON t.k = s.k
      WHEN MATCHED AND s.k % 10 = 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET st = s.st, price_c = s.price_c, cust = s.cust
      WHEN NOT MATCHED THEN INSERT (k, cust, st, price_c) VALUES (s.k, s.cust, s.st, s.price_c)
      WHEN NOT MATCHED BY SOURCE AND t.k % 97 = 0 THEN DELETE""")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     COUNT(DISTINCT cust) AS n_cust,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q152Sql =
    """WITH tgt AS (
         SELECT o_orderkey AS k, o_custkey AS cust, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders WHERE o_orderkey % 3 != 0),
       src AS (
         SELECT o_orderkey AS k, o_custkey AS cust, 'U' AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 2 AS price_c
         FROM orders WHERE o_orderkey % 2 = 0),
       merged AS (
         SELECT t.k, t.cust, t.st, t.price_c FROM tgt t LEFT JOIN src s ON t.k = s.k
         WHERE s.k IS NULL AND NOT (t.k % 97 = 0)
         UNION ALL
         SELECT s.k, s.cust, s.st, s.price_c FROM tgt t JOIN src s ON t.k = s.k
         WHERE NOT (s.k % 10 = 0)
         UNION ALL
         SELECT s.k, s.cust, s.st, s.price_c FROM src s LEFT JOIN tgt t ON s.k = t.k
         WHERE t.k IS NULL)
       SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              COUNT(DISTINCT cust) AS n_cust, MIN(k) AS min_k, MAX(k) AS max_k
       FROM merged GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q153: row-level UPDATE and DELETE statements against the catalog table —
  // each rewritten by Spark into scan → surviving/updated-rows plan → one
  // replacement snapshot (two commits total, both full-scan + full-write: the
  // copy-on-write cost model, amortized at scale by partition-level groups).
  // --------------------------------------------------------------------------
  private def q153(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m153_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE st = 'F' AND k % 7 = 0")
    s.sql(s"UPDATE graft.lake.$t SET price_c = price_c + 555 WHERE st = 'O'")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q153Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       surv AS (
         SELECT k, st,
                price_c + CASE WHEN st = 'O' THEN 555 ELSE 0 END AS price_c
         FROM base WHERE NOT (st = 'F' AND k % 7 = 0))
       SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM surv GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q154: snapshot history + VERSION AS OF time travel. CTAS lands snapshot 1,
  // INSERT INTO appends snapshot 2 (the old segment is SHARED, not copied),
  // DELETE lands snapshot 3; the query then reads all three versions. Reading
  // an old snapshot is a metadata lookup — segment lists are immutable — which
  // is what makes audit/rollback/reproducible-training-set reads free at
  // 100 TB (the Iceberg/Delta snapshot recipe, re-derived on the public
  // connector API).
  // --------------------------------------------------------------------------
  private def q154(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m154_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 2 = 1""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 5 = 0")
    s.sql(s"""SELECT 1 AS snap, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t VERSION AS OF 1
              UNION ALL
              SELECT 2 AS snap, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t VERSION AS OF 2
              UNION ALL
              SELECT 3 AS snap, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t
              ORDER BY snap""")
  }

  private val q154Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders)
       SELECT 1 AS snap, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base WHERE k % 2 = 1
       UNION ALL
       SELECT 2 AS snap, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base
       UNION ALL
       SELECT 3 AS snap, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base WHERE NOT (k % 5 = 0)
       ORDER BY snap"""

  // --------------------------------------------------------------------------
  // q161: table maintenance via catalog procedures — Spark 4's CALL surface
  // (SPARK-44167) against the graft ProcedureCatalog. Three appends land three
  // small segments (the small-files problem in miniature: scan task count
  // grows with SEGMENT count, not data size); `CALL graft.system.compact`
  // rewrites the current snapshot into size-targeted files (read→coalesce→
  // write, no shuffle) as a NEW snapshot; `CALL graft.system.expire_snapshots`
  // then drops pre-compaction history and deletes the dead segments from disk.
  // The final aggregate hash-matching the plain-orders oracle is the whole
  // point: maintenance must be perfectly content-preserving while the physical
  // layout and history change underneath. GraftCatalogSpec pins the physical
  // side (file counts, deleted dirs, expired-version failure).
  // --------------------------------------------------------------------------
  private def q161(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m161_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 3 = 0""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 1""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 2""")
    s.sql(s"CALL graft.system.compact('lake.$t', ${128L * 1024 * 1024})")
    s.sql(s"CALL graft.system.expire_snapshots('lake.$t', 1)")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q161Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
              MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
       FROM orders GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q162: schema evolution — ALTER TABLE ADD COLUMNS is a METADATA-ONLY commit
  // (no segment rewritten; at 100 TB that is the difference between a schema
  // change being free and being a full-table job). Rows written before the
  // ALTER read the new column as NULL because the scan always projects the
  // TABLE schema and the old parquet footers simply lack the column — the
  // Delta/Iceberg add-column contract. The aggregate groups by
  // COALESCE(chan, 'legacy'), so the hash proves exactly which rows null-fill.
  // --------------------------------------------------------------------------
  private def q162(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m162_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 2 = 1""")
    s.sql(s"ALTER TABLE graft.lake.$t ADD COLUMNS (chan STRING)")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT),
             CASE WHEN o_orderkey % 4 = 0 THEN 'web' ELSE 'app' END
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"""SELECT COALESCE(chan, 'legacy') AS chan, COUNT(*) AS n,
                     CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY COALESCE(chan, 'legacy') ORDER BY chan""")
  }

  private val q162Sql =
    """WITH evolved AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c,
                CASE WHEN o_orderkey % 2 = 1 THEN NULL
                     WHEN o_orderkey % 4 = 0 THEN 'web' ELSE 'app' END AS chan
         FROM orders)
       SELECT COALESCE(chan, 'legacy') AS chan, COUNT(*) AS n,
              CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM evolved GROUP BY COALESCE(chan, 'legacy') ORDER BY chan"""

  // --------------------------------------------------------------------------
  // q163: segment-level copy-on-write delete — `CALL graft.system.delete_where`
  // discovers the segments holding matching rows (one pushdown-pruned scan over
  // `_metadata.file_path`), rewrites ONLY those, and commits current − touched
  // + rewritten. Here the matches live entirely in the third append's segment,
  // so two of three segments carry over by reference — at 1000 segments a
  // delete like this reads and writes 1/1000th of what SQL DELETE's whole-table
  // group rewrite (q153) pays. GraftCatalogSpec pins the physical claim
  // (untouched files byte-stable via mtimes); the oracle hash pins the rows.
  // --------------------------------------------------------------------------
  private def q163(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m163_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 4 IN (0, 1)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 4 = 2""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 4 = 3""")
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 4 = 3 AND k % 100 < 50')")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q163Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
              MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
       FROM orders
       WHERE NOT (o_orderkey % 4 = 3 AND o_orderkey % 100 < 50)
       GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q164: end-to-end data skipping — ingestion appends land ORDERED batches
  // (the streaming-epoch shape: each append covers a key range), every commit
  // records the segment's min/max in the table meta, and the range query's
  // scan DROPS the non-overlapping segments at plan time with zero file IO
  // (GraftPruningScanBuilder; GraftCatalogSpec pins the planned-file counts).
  // At 100 TB this is the difference between a dashboard query planning 3
  // segments or 3000. The oracle reproduces the same rows from raw `orders`,
  // so the hash proves skipping never drops a row it shouldn't.
  // --------------------------------------------------------------------------
  private def q164(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m164_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
              USING parquet TBLPROPERTIES ('write.order-by'='k')""")
    // four KEY-RANGE appends — four segments with disjoint [min,max] zones,
    // the shape time-ordered ingestion produces naturally
    (0 until 4).foreach { q =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src
        WHERE o_orderkey * 4 >= (SELECT MAX(o_orderkey) FROM $src) * $q
          AND o_orderkey * 4 <  (SELECT MAX(o_orderkey) FROM $src) * ${q + 1}
           OR ($q = 3 AND o_orderkey = (SELECT MAX(o_orderkey) FROM $src))""")
    }
    // both predicates land inside the FIRST segment's zone: the scan plans one
    // segment of four, with zero file IO on the rest
    s.sql(s"""SELECT 'point' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t WHERE k = 32
              UNION ALL
              SELECT 'range' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
              FROM graft.lake.$t WHERE k BETWEEN 100 AND 999
              ORDER BY kind""")
  }

  private val q164Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders)
       SELECT 'point' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base WHERE k = 32
       UNION ALL
       SELECT 'range' AS kind, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
       FROM base WHERE k BETWEEN 100 AND 999
       ORDER BY kind"""

  // --------------------------------------------------------------------------
  // q167: segment-level copy-on-write UPDATE — `CALL graft.system.update_where`
  // completes the pruned-DML trio (q163 delete, q164 skipping reads): matching
  // rows confined to one of three segments get a price adjustment applied in
  // ONE projection (every right-hand side sees the PRE-update values, the SQL
  // UPDATE contract — note the two assignments swap-read each other's
  // columns), untouched segments carry over by reference. Spark core has no
  // SupportsUpdate pushdown API, so the procedure IS the segment-level path;
  // SQL UPDATE (q153) remains the whole-table group rewrite.
  // --------------------------------------------------------------------------
  private def q167(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m167_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_custkey AS cust, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 4 IN (0, 1)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 4 = 2""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_custkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 4 = 3""")
    // pre-update-value semantics made visible: cust and price_c swap-read
    s.sql(s"""CALL graft.system.update_where('lake.$t',
      'k % 4 = 3 AND st = ''O''', 'price_c = cust, cust = price_c')""")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     CAST(SUM(cust) AS BIGINT) AS total_cust,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q167Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_custkey AS cust, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       updated AS (
         SELECT k, st,
                CASE WHEN k % 4 = 3 AND st = 'O' THEN price_c ELSE cust END AS cust,
                CASE WHEN k % 4 = 3 AND st = 'O' THEN cust ELSE price_c END AS price_c
         FROM base)
       SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              CAST(SUM(cust) AS BIGINT) AS total_cust,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM updated GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q177: TIMESTAMP AS OF time travel — the wall-clock twin of q154's
  // VERSION AS OF. Two appends land as two snapshots with COMMIT-STAMPED
  // times; an instant captured between them must resolve to snapshot 1 (the
  // Delta/Iceberg as-of-timestamp contract: newest snapshot committed at or
  // before the instant), and an instant after both to the full table. Same
  // zero-cost metadata lookup as the version form — no restore, no file IO
  // beyond the pinned snapshot's segments. The oracle recomputes both
  // populations from the raw table, so the hash proves the instant→snapshot
  // resolution picked EXACTLY the first batch.
  // --------------------------------------------------------------------------
  private def q177(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m177_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    Thread.sleep(20) // commit stamps are millisecond wall clock: separate them
    val between = System.currentTimeMillis()
    Thread.sleep(20)
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 1""")
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val asOf = fmt.format(new java.util.Date(between))
    s.sql(s"""SELECT 'as_of' AS src, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t TIMESTAMP AS OF '$asOf'
              UNION ALL
              SELECT 'current', COUNT(*), CAST(SUM(price_c) AS BIGINT), MIN(k), MAX(k)
              FROM graft.lake.$t
              ORDER BY src""")
  }

  private val q177Sql =
    """WITH c AS (SELECT o_orderkey AS k,
                  CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c FROM orders)
       SELECT 'as_of' AS src, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM c WHERE k % 2 = 0
       UNION ALL
       SELECT 'current', COUNT(*), CAST(SUM(price_c) AS BIGINT), MIN(k), MAX(k)
       FROM c
       ORDER BY src"""

  // --------------------------------------------------------------------------
  // q178: incremental CHANGES read — "the rows appended since snapshot N",
  // the CDC-consumer shape every downstream incremental pipeline runs (sync
  // jobs, streaming backfills, audit diffs). Three appends land three
  // snapshots; reading `graft.changes.from=1` plans ONLY the segments
  // committed after snapshot 1 — segment-list set difference at PLAN time,
  // zero file IO on the base data, cost proportional to the DELTA not the
  // table (the Iceberg incremental-append-scan contract; a replace/rewrite
  // inside the range fails loudly, pinned by spec). The oracle recomputes the
  // same population from the raw table's key ranges.
  // --------------------------------------------------------------------------
  private def q178(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m178_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT) USING parquet")
    Seq(0, 1, 2).foreach { m =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM $src WHERE o_orderkey % 3 = $m""")
    }
    s.read.option("graft.changes.from", 1).table(s"graft.lake.$t")
      .createOrReplaceTempView(s"changes_$t")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM changes_$t GROUP BY st ORDER BY st""")
  }

  private val q178Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
              MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
       FROM orders WHERE o_orderkey % 3 IN (1, 2)
       GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q181: identity-PARTITIONED graft table, full lifecycle — the single most
  // common lakehouse layout, exercised end-to-end: CREATE ... PARTITIONED BY
  // (st) lands every write as PARTITION-PURE segments (one per status value,
  // GraftPartitionedWrite's manifest commit); a DYNAMIC partition overwrite
  // replaces exactly the 'P' partition (rest carry by reference — Iceberg's
  // replace-partitions commit); a partition-scoped delete_where rewrites only
  // the 'F' partition; and the final per-partition aggregate scans a table
  // whose every segment zone-maps min=max on st, so a partition predicate
  // plans 1-of-N segments with zero file IO (GraftCatalogSpec pins the
  // planned-file count; at 100 TB partition pruning IS the difference between
  // a day-scoped query reading one day or three years). The oracle replays
  // the same overwrite+delete algebra over raw `orders`.
  // --------------------------------------------------------------------------
  private def q181(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m181_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
              USING parquet PARTITIONED BY (st)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src""")
    // dynamic overwrite: only the 'P' partition is present in the new data,
    // so only it swaps; 'F'/'O' segments carry by reference
    s.sql(s"""SELECT o_orderkey AS k, o_orderstatus AS st,
                     CAST(FLOOR(o_totalprice * 100) AS BIGINT) * 2 AS price_c
              FROM $src WHERE o_orderstatus = 'P'""")
      .writeTo(s"graft.lake.$t").overwritePartitions()
    // partition-scoped copy-on-write delete: rewrites ONLY the 'F' segment
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'st = ''F'' AND k % 10 = 0')")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q181Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       final AS (
         SELECT k, st, CASE WHEN st = 'P' THEN price_c * 2 ELSE price_c END AS price_c
         FROM base WHERE NOT (st = 'F' AND k % 10 = 0))
       SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM final GROUP BY st ORDER BY st"""

  // --------------------------------------------------------------------------
  // q182: NET row-level CDC between snapshots — the increment q178's
  // append-only changes feed honestly refuses once a REWRITE commit is in the
  // range. GraftCdc derives true (op, row) deltas from pure segment-list
  // algebra: only segments present on ONE side of the range are read, and a
  // bidirectional EXCEPT ALL cancels the survivor rows a copy-on-write
  // rewrite copies forward (compaction in the range nets to zero). The range
  // here spans an append, a copy-on-write UPDATE, a copy-on-write DELETE, and
  // a compaction; the oracle replays the same state algebra in DuckDB with
  // EXCEPT ALL over the reconstructed before/after states, so the hash proves
  // the segment-diff derivation emits exactly the rows that changed — at
  // 100 TB the cost is the CHANGED segments, never the table.
  // --------------------------------------------------------------------------
  private def q182(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m182_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 3 = 0""")                         // snapshot 1
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 1""")                         // snapshot 2
    s.sql(s"CALL graft.system.update_where('lake.$t', 'k % 10 = 1', 'price_c = price_c + 7')")
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 10 = 2')")
    s.sql(s"CALL graft.system.compact('lake.$t', ${128L * 1024 * 1024})")
    graft.catalog.GraftCdc.rowDeltas(s, "graft", s"lake.$t", from = 1L)
      .createOrReplaceTempView(s"deltas_$t")
    s.sql(s"""SELECT _change_type AS op, st, COUNT(*) AS n,
                     CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM deltas_$t GROUP BY op, st ORDER BY op, st""")
  }

  private val q182Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       state1 AS (SELECT * FROM base WHERE k % 3 = 0),
       state_now AS (
         SELECT k, st,
                CASE WHEN k % 10 = 1 THEN price_c + 7 ELSE price_c END AS price_c
         FROM base WHERE k % 3 IN (0, 1) AND k % 10 <> 2),
       deltas AS (
         SELECT 'insert' AS op, * FROM (SELECT * FROM state_now EXCEPT ALL SELECT * FROM state1)
         UNION ALL
         SELECT 'delete' AS op, * FROM (SELECT * FROM state1 EXCEPT ALL SELECT * FROM state_now))
       SELECT op, st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM deltas GROUP BY op, st ORDER BY op, st"""

  // --------------------------------------------------------------------------
  // q200: the lakehouse CAPSTONE — a training-data corpus pipeline composed
  // entirely of engine-owned operations on ONE identity-partitioned graft
  // table (PARTITIONED BY lang, write.order-by doc_id):
  //
  //   1. gated ingestion (length-window quality filter) lands partition-pure
  //      per-lang segments;
  //   2. an OVERLAPPING second batch deduplicates incrementally via
  //      MERGE ... WHEN NOT MATCHED INSERT — the runtime-group-filtered SQL
  //      path, so only partitions with genuinely new docs rewrite;
  //   3. a curation sweep (`delete_where`) drops one language's short docs —
  //      a one-partition copy-on-write rewrite;
  //   4. the serving query aggregates per language.
  //
  // Every stage is the partition-as-group cost shape a 100 TB corpus needs
  // (ingestion appends, dedup rewrites only affected partitions, curation
  // rewrites one), and the whole composition still hash-matches a purely
  // relational DuckDB replay — the lakehouse adds durability and incremental
  // cost, never different answers.
  // --------------------------------------------------------------------------
  private def q200(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    graft.Tables.documents(s, d).createOrReplaceTempView("lake_docs")
    val t = s"m200_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
              (doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT)
              USING parquet PARTITIONED BY (lang)
              TBLPROPERTIES ('write.order-by'='doc_id')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT doc_id, lang, source, n_chars FROM lake_docs
      WHERE n_chars BETWEEN 50 AND 545 AND doc_id % 3 IN (0, 1)""")
    s.sql(s"""MERGE INTO graft.lake.$t c
      USING (SELECT doc_id, lang, source, n_chars FROM lake_docs
             WHERE n_chars BETWEEN 50 AND 545 AND doc_id % 3 IN (1, 2)) b
      ON c.doc_id = b.doc_id
      WHEN NOT MATCHED THEN INSERT (doc_id, lang, source, n_chars)
        VALUES (b.doc_id, b.lang, b.source, b.n_chars)""")
    s.sql(s"CALL graft.system.delete_where('lake.$t', \"lang = 'de' AND n_chars < 200\")")
    s.sql(s"""SELECT lang, COUNT(*) AS n_docs,
                     CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                     COUNT(DISTINCT source) AS n_sources,
                     MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
              FROM graft.lake.$t GROUP BY lang ORDER BY lang""")
  }

  private val q200Sql =
    """WITH gated AS (
         SELECT doc_id, lang, source, n_chars FROM documents
         WHERE n_chars BETWEEN 50 AND 545),
       corpus AS (
         SELECT * FROM gated
         WHERE NOT (lang = 'de' AND n_chars < 200))
       SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              COUNT(DISTINCT source) AS n_sources,
              MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       FROM corpus GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------------------
  // q201: PER-COMMIT CDC attribution — the increment q182's range-level net
  // deltas leave on the table. GraftCdc.commitDeltas diffs every CONSECUTIVE
  // snapshot pair in the range independently, tagging each delta row with the
  // `_commit_version` that produced it (Delta CDF `table_changes` / Iceberg
  // changelog shape). The history here is initial load → append → copy-on-
  // write UPDATE → copy-on-write DELETE → compaction; attribution is exact
  // per commit (the UPDATE shows as delete+insert AT ITS COMMIT, not netted),
  // and the trailing compaction contributes ZERO rows — segment churn without
  // row change is invisible, the property that makes the feed trustworthy.
  // The oracle replays the same per-commit state algebra in DuckDB: each
  // commit's deltas are EXCEPT ALL over the reconstructed consecutive states.
  // Cost per commit is that commit's CHANGED segments only — at 100 TB a
  // 5-commit history over one partition reads five partitions' worth, never
  // the table.
  // --------------------------------------------------------------------------
  private def q201(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m201_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 3 = 0""")                         // commit 1
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 3 = 1""")                         // commit 2
    s.sql(s"CALL graft.system.update_where('lake.$t', 'k % 10 = 1', 'price_c = price_c + 7')") // 3
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 10 = 2')")                          // 4
    s.sql(s"CALL graft.system.compact('lake.$t', ${128L * 1024 * 1024})")                      // 5
    graft.catalog.GraftCdc.commitDeltas(s, "graft", s"lake.$t", from = 0L)
      .createOrReplaceTempView(s"commit_deltas_$t")
    s.sql(s"""SELECT _commit_version AS v, _change_type AS op, COUNT(*) AS n,
                     CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM commit_deltas_$t GROUP BY v, op ORDER BY v, op""")
  }

  private val q201Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       s1 AS (SELECT * FROM base WHERE k % 3 = 0),
       s2 AS (SELECT * FROM base WHERE k % 3 IN (0, 1)),
       s3 AS (SELECT k, st,
                     CASE WHEN k % 10 = 1 THEN price_c + 7 ELSE price_c END AS price_c
              FROM s2),
       s4 AS (SELECT * FROM s3 WHERE k % 10 <> 2),
       deltas AS (
         SELECT CAST(1 AS BIGINT) AS v, 'insert' AS op, * FROM s1
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'insert', * FROM (SELECT * FROM s2 EXCEPT ALL SELECT * FROM s1)
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'delete', * FROM (SELECT * FROM s1 EXCEPT ALL SELECT * FROM s2)
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'insert', * FROM (SELECT * FROM s3 EXCEPT ALL SELECT * FROM s2)
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'delete', * FROM (SELECT * FROM s2 EXCEPT ALL SELECT * FROM s3)
         UNION ALL
         SELECT CAST(4 AS BIGINT), 'insert', * FROM (SELECT * FROM s4 EXCEPT ALL SELECT * FROM s3)
         UNION ALL
         SELECT CAST(4 AS BIGINT), 'delete', * FROM (SELECT * FROM s3 EXCEPT ALL SELECT * FROM s4))
       SELECT v, op, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM deltas GROUP BY v, op ORDER BY v, op"""

  // --------------------------------------------------------------------------
  // q213: MERGE-ON-READ point deletes via positional DELETE VECTORS
  // (catalog/GraftDeleteVectors.scala) — the O(rows-deleted) DML path. The
  // table declares `graft.delete-mode`='merge-on-read'; both the procedure
  // and SQL `DELETE FROM` then record (file, row-index) vectors instead of
  // rewriting segments (snap 2, then an OVERLAPPING snap-3 delete that must
  // count each row once), and `rewrite_deletes` (snap 4) materializes the
  // vectors back into pure segments without changing content. Reading every
  // snapshot back via VERSION AS OF pins: the row-index merge filter, vector
  // composition across commits, time travel over vectored snapshots, and
  // materialization equivalence — all hash-matched against a relational
  // replay of the four states.
  // --------------------------------------------------------------------------
  private def q213(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m213_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src""")
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 7 = 0')")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 7 IN (0, 1)")
    s.sql(s"CALL graft.system.rewrite_deletes('lake.$t')")
    s.sql(s"""
      WITH per_v AS (
        SELECT 1 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 1
        UNION ALL SELECT 2 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 2
        UNION ALL SELECT 3 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 3
        UNION ALL SELECT 4 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 4)
      SELECT v, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM per_v GROUP BY v ORDER BY v""")
  }

  private val q213Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       per_v AS (
         SELECT 1 AS v, k, price_c FROM base
         UNION ALL SELECT 2 AS v, k, price_c FROM base WHERE k % 7 <> 0
         UNION ALL SELECT 3 AS v, k, price_c FROM base WHERE k % 7 NOT IN (0, 1)
         UNION ALL SELECT 4 AS v, k, price_c FROM base WHERE k % 7 NOT IN (0, 1))
       SELECT v, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM per_v GROUP BY v ORDER BY v"""

  // --------------------------------------------------------------------------
  // q214: row-level CDC ACROSS delete-vector commits — a merge-on-read DELETE
  // changes a table's live rows while keeping its segment list byte-identical,
  // so segment-list algebra alone would see "no change"; GraftCdc diffs
  // DV-changed segments on both sides, each merged against its own snapshot's
  // vectors, leaving exactly the newly-deleted rows. Two overlapping MOR
  // deletes → per-commit attribution must charge each row to the commit that
  // actually deleted it (k%7=0 to v2; only k%7=1 to v3).
  // --------------------------------------------------------------------------
  private def q214(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m214_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src""")
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 7 = 0')")
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 7 IN (0, 1)')")
    graft.catalog.GraftCdc.commitDeltas(s, "graft", s"lake.$t", from = 1, to = Some(3))
      .createOrReplaceTempView(s"dv_cdc_$t")
    s.sql(s"""SELECT _commit_version AS v, _change_type AS op, COUNT(*) AS n,
                     CAST(SUM(price_c) AS BIGINT) AS total_c,
                     MIN(k) AS min_k, MAX(k) AS max_k
              FROM dv_cdc_$t GROUP BY v, op ORDER BY v, op""")
  }

  private val q214Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
         FROM orders),
       deltas AS (
         SELECT CAST(2 AS BIGINT) AS v, 'delete' AS op, k, price_c
         FROM base WHERE k % 7 = 0
         UNION ALL
         SELECT CAST(3 AS BIGINT) AS v, 'delete' AS op, k, price_c
         FROM base WHERE k % 7 = 1)
       SELECT v, op, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM deltas GROUP BY v, op ORDER BY v, op"""

  // --------------------------------------------------------------------------
  // q221: METADATA-ONLY aggregate pushdown (catalog/GraftStatsAggregate.scala)
  // — COUNT(*)/COUNT(col)/MIN/MAX served from the committed segment zone maps
  // with zero file IO: the scan-less count every lakehouse runs constantly on
  // 100 TB tables ("how many rows landed today?"). The fixture writes THREE
  // segments (one with planted NULLs so COUNT(col) < COUNT(*)), and the
  // audit aggregate answers from 3 zone-map entries — no task reads a row.
  // SUM(k) joins the class via the `graft.stats.sums` opt-in: footers carry
  // no sums, so the table pays one projected aggregate read per commit to
  // answer SUM audits with zero IO forever (the explicit trade the default
  // zero-read commit path must not inherit). PlanSpec pins the physical
  // shape (graft-stats-agg scan, no parquet); this query pins the VALUES
  // against a full relational replay.
  // --------------------------------------------------------------------------
  private def q221(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m221_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, od DATE, st STRING) USING parquet
      TBLPROPERTIES ('graft.stats.sums' = 'k')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderdate, o_orderstatus FROM $src WHERE o_orderkey % 3 = 0""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderdate, o_orderstatus FROM $src WHERE o_orderkey % 3 = 1""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderdate,
             CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderstatus END
      FROM $src WHERE o_orderkey % 3 = 2""")
    s.sql(s"""SELECT COUNT(*) AS n_rows, COUNT(st) AS n_status,
                     MIN(k) AS min_k, MAX(k) AS max_k,
                     CAST(SUM(k) AS BIGINT) AS sum_k,
                     CAST(MIN(od) AS STRING) AS min_day,
                     CAST(MAX(od) AS STRING) AS max_day
              FROM graft.lake.$t ORDER BY 1""")
  }

  private val q221Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(o_orderdate AS DATE) AS od,
                CASE WHEN o_orderkey % 3 = 2 AND o_orderkey % 2 = 0 THEN NULL
                     ELSE o_orderstatus END AS st
         FROM orders)
       SELECT COUNT(*) AS n_rows, COUNT(st) AS n_status,
              MIN(k) AS min_k, MAX(k) AS max_k,
              CAST(SUM(k) AS BIGINT) AS sum_k,
              CAST(MIN(od) AS STRING) AS min_day, CAST(MAX(od) AS STRING) AS max_day
       FROM base ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q222: MERGE-ON-READ UPDATE (`graft.update-mode`='merge-on-read',
  // GraftDml.updateWhereMor) — the matched rows' OLD positions go into a
  // delete vector and their NEW versions append, in ONE atomic commit; no
  // untouched row is rewritten, cost is O(rows updated). Two OVERLAPPING
  // updates (k%11 then k%13 — keys divisible by both carry BOTH edits,
  // proving the second update's scan read through the first's vector), each
  // snapshot read back via VERSION AS OF and hash-matched against a
  // relational replay of the three states.
  // --------------------------------------------------------------------------
  private def q222(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m222_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read',
                                   'graft.update-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src""")
    s.sql(s"CALL graft.system.update_where('lake.$t', 'k % 11 = 0', 'price_c = price_c + 7')")
    s.sql(s"CALL graft.system.update_where('lake.$t', 'k % 13 = 0', 'price_c = -price_c')")
    s.sql(s"""
      WITH per_v AS (
        SELECT 1 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 1
        UNION ALL SELECT 2 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 2
        UNION ALL SELECT 3 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 3)
      SELECT v, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM per_v GROUP BY v ORDER BY v""")
  }

  private val q222Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       v2 AS (SELECT k, CASE WHEN k % 11 = 0 THEN p + 7 ELSE p END AS p FROM base),
       v3 AS (SELECT k, CASE WHEN k % 13 = 0 THEN -p ELSE p END AS p FROM v2),
       per_v AS (
         SELECT 1 AS v, k, p FROM base
         UNION ALL SELECT 2 AS v, k, p FROM v2
         UNION ALL SELECT 3 AS v, k, p FROM v3)
       SELECT v, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM per_v GROUP BY v ORDER BY v"""

  // --------------------------------------------------------------------------
  // q223: MERGE-ON-READ UPSERT (`CALL graft.system.upsert`) — the
  // continuous-CDC-apply primitive: each batch's matched keys have their old
  // positions vectored and the WHOLE batch appends as the keys' current
  // versions, one atomic commit per batch, no existing segment rewritten.
  // Batch 1 updates half the even keys (+1 cent) and inserts the k%8=1 odds;
  // batch 2 OVERLAPS both groups (negates k%8 IN (0,1,3) — reading through
  // batch 1's vector) and inserts the k%8=3 odds. Per-version VERSION AS OF
  // aggregates hash-match a three-state relational replay.
  // --------------------------------------------------------------------------
  private def q223(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m223_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"""CREATE OR REPLACE TEMP VIEW ups1_$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) +
               CASE WHEN o_orderkey % 4 = 0 THEN 1 ELSE 0 END AS price_c
      FROM $src WHERE o_orderkey % 4 = 0 OR o_orderkey % 8 = 1""")
    s.sql(s"CALL graft.system.upsert('lake.$t', 'ups1_$t', 'k')")
    s.sql(s"""CREATE OR REPLACE TEMP VIEW ups2_$t AS
      SELECT o_orderkey AS k, o_orderstatus AS st,
             -CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
      FROM $src WHERE o_orderkey % 8 IN (0, 1, 3)""")
    s.sql(s"CALL graft.system.upsert('lake.$t', 'ups2_$t', 'k')")
    s.sql(s"""
      WITH per_v AS (
        SELECT 1 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 1
        UNION ALL SELECT 2 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 2
        UNION ALL SELECT 3 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 3)
      SELECT v, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM per_v GROUP BY v ORDER BY v""")
  }

  private val q223Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       v1 AS (SELECT k, p FROM base WHERE k % 2 = 0),
       v2 AS (SELECT k, CASE WHEN k % 4 = 0 THEN p + 1 ELSE p END AS p FROM v1
              UNION ALL SELECT k, p FROM base WHERE k % 8 = 1),
       v3 AS (SELECT k, p FROM v2 WHERE k % 8 NOT IN (0, 1)
              UNION ALL SELECT k, -p AS p FROM base WHERE k % 8 IN (0, 1, 3)),
       per_v AS (
         SELECT 1 AS v, k, p FROM v1
         UNION ALL SELECT 2 AS v, k, p FROM v2
         UNION ALL SELECT 3 AS v, k, p FROM v3)
       SELECT v, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM per_v GROUP BY v ORDER BY v"""

  // --------------------------------------------------------------------------
  // q224: SQL MERGE routed through MERGE-ON-READ (`graft.update-mode` =
  // 'merge-on-read' + SupportsDelta): the full MERGE clause surface —
  // conditional WHEN MATCHED DELETE, WHEN MATCHED UPDATE, WHEN NOT MATCHED
  // INSERT — committed as ONE delete-vector + partition-pure appends, no
  // touched segment rewritten (q152 is the copy-on-write twin; the
  // byte-identity / CDC-pair pins live in DeleteVectorSpec). The oracle
  // replays the MERGE relationally and compares BOTH versions through time
  // travel, so the hash gates the vectors' exact row content.
  // --------------------------------------------------------------------------
  private def q224(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m224_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet
      TBLPROPERTIES ('graft.update-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"""MERGE INTO graft.lake.$t t
      USING (SELECT o_orderkey AS k, o_orderstatus AS st,
                    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
             FROM $src WHERE o_orderkey % 3 = 0) s
      ON t.k = s.k
      WHEN MATCHED AND s.k % 12 = 0 THEN DELETE
      WHEN MATCHED THEN UPDATE SET price_c = s.price_c + 1, st = s.st
      WHEN NOT MATCHED THEN INSERT (k, st, price_c) VALUES (s.k, s.st, -s.price_c)""")
    s.sql(s"""
      WITH per_v AS (
        SELECT 1 AS v, k, price_c FROM graft.lake.$t VERSION AS OF 1
        UNION ALL SELECT 2 AS v, k, price_c FROM graft.lake.$t)
      SELECT v, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
             MIN(k) AS min_k, MAX(k) AS max_k
      FROM per_v GROUP BY v ORDER BY v""")
  }

  private val q224Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       v1 AS (SELECT k, p FROM base WHERE k % 2 = 0),
       v2 AS (SELECT k,
                     CASE WHEN k % 6 = 0 THEN p + 1 ELSE p END AS p
              FROM v1 WHERE k % 12 <> 0
              UNION ALL
              SELECT k, -p AS p FROM base WHERE k % 3 = 0 AND k % 2 <> 0),
       per_v AS (
         SELECT 1 AS v, k, p FROM v1
         UNION ALL SELECT 2 AS v, k, p FROM v2)
       SELECT v, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS total_c,
              MIN(k) AS min_k, MAX(k) AS max_k
       FROM per_v GROUP BY v ORDER BY v"""

  // --------------------------------------------------------------------------
  // q235: WRITE-AUDIT-PUBLISH via branch refs (GraftRefs.scala) — the Iceberg
  // WAP pattern: stage a batch on a branch (main's lineage untouched), run the
  // audit query against the branch (`VERSION AS OF 'branch'` sees base+staged,
  // exactly what publishing would make current), REJECT the dirty batch
  // (drop_branch deletes its staged segments), re-stage the cleaned batch,
  // and fast_forward publishes it as ONE main commit. The audit rule here:
  // no pending-status ('P') orders may enter the serving table. The target is
  // PARTITIONED, so staged segments are partition-pure and pruning survives
  // publication. The oracle replays all three phases relationally; the hash
  // gates that rejected rows NEVER surface and published rows all do.
  // --------------------------------------------------------------------------
  private def q235(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m235_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet PARTITIONED BY (st)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 4 = 0""")
    val batch = s.sql(s"""SELECT o_orderkey AS k, o_orderstatus AS st,
                                 CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c
                          FROM $src WHERE o_orderkey % 4 = 1""")
    // stage the raw batch; the audit query finds 'P' rows → REJECT
    s.sql(s"CALL graft.system.create_branch('lake.$t', 'wap')")
    batch.write.option("graft.branch", "wap").mode("append")
      .saveAsTable(s"graft.lake.$t")
    val audit = s.sql(
      s"""SELECT COUNT(*) FROM graft.lake.$t VERSION AS OF 'wap'
          WHERE st = 'P' AND k % 4 = 1""")
      .collect()(0).getLong(0)
    s.sql(s"CALL graft.system.drop_branch('lake.$t', 'wap')")
    // re-stage cleaned; audit passes → PUBLISH as one main commit
    s.sql(s"CALL graft.system.create_branch('lake.$t', 'wap')")
    batch.where("st <> 'P'").write.option("graft.branch", "wap").mode("append")
      .saveAsTable(s"graft.lake.$t")
    s.sql(s"CALL graft.system.fast_forward('lake.$t', 'wap')")
    s.sql(s"""
      SELECT '1_base' AS phase, COUNT(*) AS n,
             CAST(SUM(price_c) AS BIGINT) AS total_c
      FROM graft.lake.$t VERSION AS OF 1
      UNION ALL
      SELECT '2_audit_rejected', CAST($audit AS BIGINT), CAST(NULL AS BIGINT)
      UNION ALL
      SELECT '3_published', COUNT(*), CAST(SUM(price_c) AS BIGINT)
      FROM graft.lake.$t
      ORDER BY phase""")
  }

  private val q235Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       v1 AS (SELECT k, p FROM base WHERE k % 4 = 0),
       staged AS (SELECT k, st, p FROM base WHERE k % 4 = 1),
       published AS (
         SELECT k, p FROM v1
         UNION ALL SELECT k, p FROM staged WHERE st <> 'P')
       SELECT '1_base' AS phase, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS total_c FROM v1
       UNION ALL
       SELECT '2_audit_rejected', COUNT(*), CAST(NULL AS BIGINT)
       FROM staged WHERE st = 'P'
       UNION ALL
       SELECT '3_published', COUNT(*), CAST(SUM(p) AS BIGINT) FROM published
       ORDER BY phase"""

  // --------------------------------------------------------------------------
  // q236: incrementally maintained MATERIALIZED VIEW (GraftMaterializedView
  // .scala) — create_mv materializes a 97-bucket COUNT/SUM group-by once;
  // a mixed DML wave (append + merge-on-read DELETE + merge-on-read UPDATE)
  // lands on the source; refresh_mv applies ONLY the CDC deltas since the
  // watermark (O(rows changed), the MV is probed with a broadcast of the
  // touched groups and never shuffled) and commits data + watermark in one
  // serializable snapshot. The output is the refreshed MV itself; the oracle
  // recomputes the same aggregate from a relational replay of the final
  // source state — the hash gates that incremental maintenance ≡ full
  // recompute. Spec pins (MaterializedViewSpec): group birth/death, touched-
  // group-only rewrites, idempotent replay, upsert-source composition.
  // --------------------------------------------------------------------------
  private def q236(s: SparkSession, d: String): DataFrame = {
    ensureCatalog(s)
    val src = ordersView(s, d)
    val t = s"m236_${sfTag(d)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_mv")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, b BIGINT, price_c BIGINT)
      USING parquet
      TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read',
                     'graft.update-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderkey % 97, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 0""")
    s.sql(s"CALL graft.system.create_mv('lake.${t}_mv', 'lake.$t', " +
      "keys => 'b', sums => 'price_c')")
    // the DML wave the refresh must absorb: append + MOR delete + MOR update
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderkey % 97, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM $src WHERE o_orderkey % 2 = 1""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 14 = 0")
    s.sql(s"UPDATE graft.lake.$t SET price_c = price_c + 5 WHERE k % 11 = 0")
    s.sql(s"CALL graft.system.refresh_mv('lake.${t}_mv')")
    s.sql(s"""SELECT b, n_rows, CAST(sum_price_c AS BIGINT) AS sum_price_c
              FROM graft.lake.${t}_mv ORDER BY b""")
  }

  private val q236Sql =
    """WITH final AS (
         SELECT o_orderkey AS k, o_orderkey % 97 AS b,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT)
                  + CASE WHEN o_orderkey % 11 = 0 THEN 5 ELSE 0 END AS price_c
         FROM orders WHERE o_orderkey % 14 <> 0)
       SELECT b, COUNT(*) AS n_rows, CAST(SUM(price_c) AS BIGINT) AS sum_price_c
       FROM final GROUP BY b ORDER BY b"""

  val defs: Seq[QDef] = Seq(
    QDef("q152_lake_merge", q152, Some(q152Sql)),
    QDef("q153_lake_update_delete", q153, Some(q153Sql)),
    QDef("q154_lake_time_travel", q154, Some(q154Sql)),
    QDef("q161_lake_compaction", q161, Some(q161Sql)),
    QDef("q162_lake_schema_evolution", q162, Some(q162Sql)),
    QDef("q163_lake_selective_delete", q163, Some(q163Sql)),
    QDef("q164_lake_data_skipping", q164, Some(q164Sql)),
    QDef("q167_lake_selective_update", q167, Some(q167Sql)),
    QDef("q177_lake_timestamp_travel", q177, Some(q177Sql)),
    QDef("q178_lake_changes_feed", q178, Some(q178Sql)),
    QDef("q181_lake_partitioned_table", q181, Some(q181Sql)),
    QDef("q182_lake_cdc_row_deltas", q182, Some(q182Sql)),
    QDef("q200_lakehouse_pipeline", q200, Some(q200Sql)),
    QDef("q201_lake_cdc_per_commit", q201, Some(q201Sql)),
    QDef("q213_lake_delete_vectors", q213, Some(q213Sql)),
    QDef("q214_lake_dv_cdc", q214, Some(q214Sql)),
    QDef("q221_lake_stats_aggregate", q221, Some(q221Sql)),
    QDef("q222_lake_mor_update", q222, Some(q222Sql)),
    QDef("q223_lake_mor_upsert", q223, Some(q223Sql)),
    QDef("q224_lake_mor_merge", q224, Some(q224Sql)),
    QDef("q235_lake_wap_branch", q235, Some(q235Sql)),
    QDef("q236_lake_incremental_mv", q236, Some(q236Sql)))
}
