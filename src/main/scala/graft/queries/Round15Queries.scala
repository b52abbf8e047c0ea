package graft.queries

import graft.QDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 surface: SCD Type-2 dimension build from the CDC feed, and the
  * segment-level BLOOM index (high-cardinality point-lookup pruning).
  *
  * All queries follow the SURVEY.md §2b determinism conventions. */
object Round15Queries {

  // --------------------------------------------------------------------------
  // q243: SCD TYPE-2 dimension build from PER-COMMIT CDC — the classic
  // warehouse operator: replay a key-versioned table's change history into
  // validity intervals (k, attrs, valid_from, valid_to). The source table
  // evolves through the engine's own CDC-apply primitive (MOR upsert) plus a
  // MOR delete; `GraftCdc.commitDeltas` yields every row's insert/delete
  // tagged with its commit version, and the interval pairing is pure
  // relational algebra: per key, the r-th delete (by version) closes the
  // r-th insert (by version) — correct because upsert maintains at most one
  // live version per key, so opens and closes interleave strictly. No
  // per-key iteration, no driver loop: two ranked windows (partitioned by
  // key) and one equi-join, the 100 TB shape. The ORACLE rebuilds the same
  // deltas independently with per-phase state CTEs and EXCEPT set algebra,
  // then runs the same pairing — it gates both the CDC feed's content and
  // the interval construction.
  // --------------------------------------------------------------------------
  private def q243(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("scd_orders")
    val t = s"m243_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet
      TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read',
                     'graft.update-mode' = 'merge-on-read')""")
    // v1: seed — every k % 3 = 0 order at its base price
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM scd_orders WHERE o_orderkey % 3 = 0""")
    // v2: CDC batch — k % 6 = 0 re-priced (+7), k % 3 = 1 born
    s.sql(s"""SELECT o_orderkey AS k, o_orderstatus AS st,
                     CAST(FLOOR(o_totalprice * 100) AS BIGINT) +
                       CASE WHEN o_orderkey % 6 = 0 THEN 7 ELSE 0 END AS price_c
              FROM scd_orders WHERE o_orderkey % 6 = 0 OR o_orderkey % 3 = 1""")
      .createOrReplaceTempView(s"${t}_b1")
    s.sql(s"CALL graft.system.upsert('lake.$t', '${t}_b1', keys => 'k')")
    // v3: retirement — every k % 9 = 0 key leaves
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 9 = 0")
    val deltas = graft.catalog.GraftCdc.commitDeltas(s, "graft", s"lake.$t", 0L)
    deltas.createOrReplaceTempView(s"${t}_deltas")
    s.sql(s"""
      WITH ins AS (
        SELECT k, st, price_c, _commit_version AS v,
               ROW_NUMBER() OVER (PARTITION BY k ORDER BY _commit_version) AS r
        FROM ${t}_deltas WHERE _change_type = 'insert'),
      del AS (
        SELECT k, _commit_version AS v,
               ROW_NUMBER() OVER (PARTITION BY k ORDER BY _commit_version) AS r
        FROM ${t}_deltas WHERE _change_type = 'delete')
      SELECT i.k, i.st, i.price_c,
             i.v AS valid_from, d.v AS valid_to,
             CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_current
      FROM ins i LEFT JOIN del d ON i.k = d.k AND i.r = d.r
      ORDER BY i.k, valid_from""")
  }

  private val q243Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       s1 AS (SELECT k, st, p FROM base WHERE k % 3 = 0),
       b1 AS (SELECT k, st, p + CASE WHEN k % 6 = 0 THEN 7 ELSE 0 END AS p
              FROM base WHERE k % 6 = 0 OR k % 3 = 1),
       s2 AS (SELECT k, st, p FROM s1 WHERE k NOT IN (SELECT k FROM b1)
              UNION ALL SELECT k, st, p FROM b1),
       s3 AS (SELECT k, st, p FROM s2 WHERE k % 9 <> 0),
       deltas AS (
         SELECT k, st, p, 'insert' AS ct, 1 AS v FROM s1
         UNION ALL
         SELECT k, st, p, 'insert', 2 FROM (SELECT * FROM s2 EXCEPT SELECT * FROM s1)
         UNION ALL
         SELECT k, st, p, 'delete', 2 FROM (SELECT * FROM s1 EXCEPT SELECT * FROM s2)
         UNION ALL
         SELECT k, st, p, 'insert', 3 FROM (SELECT * FROM s3 EXCEPT SELECT * FROM s2)
         UNION ALL
         SELECT k, st, p, 'delete', 3 FROM (SELECT * FROM s2 EXCEPT SELECT * FROM s3)),
       ins AS (
         SELECT k, st, p AS price_c, v,
                ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS r
         FROM deltas WHERE ct = 'insert'),
       del AS (
         SELECT k, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY v) AS r
         FROM deltas WHERE ct = 'delete')
       SELECT i.k, i.st, i.price_c,
              CAST(i.v AS BIGINT) AS valid_from, CAST(d.v AS BIGINT) AS valid_to,
              CASE WHEN d.v IS NULL THEN 1 ELSE 0 END AS is_current
       FROM ins i LEFT JOIN del d ON i.k = d.k AND i.r = d.r
       ORDER BY i.k, valid_from"""

  // --------------------------------------------------------------------------
  // q244: segment-level BLOOM INDEX point lookup (GraftBloom.scala) — four
  // interleaved inserts (k % 4 routing) make every segment's min/max span
  // the whole key domain, so ZONE MAPS CAN PRUNE NOTHING; the bloom probe
  // keeps exactly the one segment that can hold the key. The number of
  // PLANNED SEGMENTS is emitted as an output column, so the pruning claim
  // itself is oracle-gated (1 for a present key whose residue class lives in
  // one segment, 0 for an absent key), alongside the looked-up values.
  // fpp 1e-5 so the planned counts are deterministic at every SF.
  // --------------------------------------------------------------------------
  private def q244(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("blm_orders")
    val t = s"m244_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, price_c BIGINT) USING parquet
      TBLPROPERTIES ('graft.index.bloom' = 'k',
                     'graft.index.bloom.fpp' = '0.00001')""")
    (0 to 3).foreach { m =>
      s.sql(s"""INSERT INTO graft.lake.$t
        SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
        FROM blm_orders WHERE o_orderkey % 4 = $m""")
    }
    def plannedSegments(df: DataFrame): Long =
      df.queryExecution.executedPlan.collectLeaves().collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.toBatch.planInputPartitions().toSeq.flatMap {
            case f: org.apache.spark.sql.execution.datasources.FilePartition =>
              f.files.map(x => java.nio.file.Paths.get(x.filePath.toString)
                .getParent.getFileName.toString)
            case _ => Nil
          }
      }.flatten.toSet.size.toLong
    val hit = s.sql(s"SELECT k, price_c FROM graft.lake.$t WHERE k = 1")
    val miss = s.sql(s"SELECT k, price_c FROM graft.lake.$t WHERE k = -1")
    val hitSegs = plannedSegments(hit)
    val missSegs = plannedSegments(miss)
    hit.createOrReplaceTempView(s"${t}_hit")
    s.sql(s"""
      SELECT 'hit' AS probe, COUNT(*) AS n,
             CAST(SUM(price_c) AS BIGINT) AS price_c,
             CAST($hitSegs AS BIGINT) AS segments_planned
      FROM ${t}_hit
      UNION ALL
      SELECT 'miss', 0, CAST(NULL AS BIGINT), CAST($missSegs AS BIGINT)
      ORDER BY probe""")
  }

  private val q244Sql =
    """SELECT 'hit' AS probe, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_c,
              CAST(1 AS BIGINT) AS segments_planned
       FROM orders WHERE o_orderkey = 1
       UNION ALL
       SELECT 'miss', 0, CAST(NULL AS BIGINT), CAST(0 AS BIGINT)
       ORDER BY probe"""

  val defs: Seq[QDef] = Seq(
    QDef("q243_scd2_from_cdc", q243, Some(q243Sql)),
    QDef("q244_bloom_index_lookup", q244, Some(q244Sql)))
}
