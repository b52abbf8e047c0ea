package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 surface: set-similarity JOIN with prefix filtering (the PPJoin
  * candidate-pruning shape — published algorithm, re-derived, no code) and
  * the CHECK-constraint write gate (GraftChecks.scala).
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts). */
object Round14Queries {

  // --------------------------------------------------------------------------
  // q237: SET-SIMILARITY JOIN with PREFIX FILTERING — find all document pairs
  // with bigram-shingle Jaccard >= 0.6, WITHOUT the all-pairs cross join:
  //   1. shingle: distinct word bigrams per doc;
  //   2. rank every shingle by global rarity (document frequency, then the
  //      token itself — a total order, no global window needed: the (df,tok)
  //      pair IS the sort key);
  //   3. PREFIX FILTER: two sets with Jaccard >= t MUST share a token within
  //      the first n - ceil(t*n) + 1 of their rarity-sorted tokens — so
  //      candidates come from an EQUI-join on prefix tokens only (the rarest
  //      tokens, so candidate lists stay short);
  //   4. verify candidates exactly (array_intersect), emit pairs >= t.
  // The ORACLE is the brute-force all-pairs join in DuckDB — it gates that
  // the pruned join finds EXACTLY the same pairs (no recall loss), which is
  // the whole claim of prefix filtering. Scale shape: everything is equi-join
  // + aggregation; the only quadratic work is within candidate buckets of
  // RARE tokens. PlanSpec's corpus-wide no-cartesian guard covers the plan.
  // --------------------------------------------------------------------------
  private def q237(s: SparkSession, d: String): DataFrame = {
    T.documents(s, d).createOrReplaceTempView("ssj_docs")
    s.sql("""
      WITH base AS (
        SELECT doc_id, filter(split(lower(trim(text)), ' '), x -> x <> '') AS w
        FROM ssj_docs),
      toks AS (
        SELECT doc_id,
               array_distinct(transform(sequence(0, size(w) - 2),
                 i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2)))) AS t
        FROM base WHERE size(w) >= 2),
      exploded AS (
        SELECT doc_id, tok FROM toks LATERAL VIEW explode(t) ex AS tok),
      df AS (
        SELECT tok, COUNT(*) AS dfreq FROM exploded GROUP BY tok),
      ranked AS (
        SELECT e.doc_id,
               transform(
                 array_sort(collect_list(struct(d.dfreq, e.tok))),
                 p -> p.tok) AS sorted_t
        FROM exploded e JOIN df d ON e.tok = d.tok
        GROUP BY e.doc_id),
      prefixes AS (
        SELECT doc_id, ptok
        FROM ranked
        LATERAL VIEW explode(
          slice(sorted_t, 1,
                size(sorted_t) - CAST(ceil(0.6 * size(sorted_t)) AS INT) + 1)) AS ptok),
      cands AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM prefixes a JOIN prefixes b
          ON a.ptok = b.ptok AND a.doc_id < b.doc_id),
      verified AS (
        SELECT c.da, c.db,
               size(array_intersect(ta.t, tb.t)) AS i,
               size(ta.t) AS na, size(tb.t) AS nb
        FROM cands c
        JOIN toks ta ON ta.doc_id = c.da
        JOIN toks tb ON tb.doc_id = c.db)
      SELECT da, db, ROUND(CAST(i AS DOUBLE) / (na + nb - i), 2) AS jaccard
      FROM verified
      WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.6
      ORDER BY da, db""")
  }

  private val q237Sql =
    """WITH base AS (
         SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '),
                                    x -> x <> '') AS w
         FROM documents),
       toks AS (
         SELECT doc_id,
                list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS t
         FROM base WHERE len(w) >= 2),
       pairs AS (
         SELECT a.doc_id AS da, b.doc_id AS db,
                len(list_intersect(a.t, b.t)) AS i,
                len(a.t) AS na, len(b.t) AS nb
         FROM toks a JOIN toks b ON a.doc_id < b.doc_id)
       SELECT da, db, ROUND(CAST(i AS DOUBLE) / (na + nb - i), 2) AS jaccard
       FROM pairs WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.6
       ORDER BY da, db"""

  // --------------------------------------------------------------------------
  // q238: CHECK CONSTRAINTS as a write gate (GraftChecks.scala) — the table
  // declares `graft.check.*` boolean predicates; every SQL-surfaced writer
  // (partitioned INSERT here) evaluates them per row inside the codegen'd
  // writer, and a violating row fails the JOB before the atomic commit, so
  // the table can never hold a row that fails its checks. SQL semantics:
  // NULL admits (so `st IS NOT NULL` is exactly NOT NULL). The query proves
  // the lifecycle: valid inserts land, a violating insert fails AND leaves
  // the table byte-identical (snapshot count unchanged), and the final state
  // hashes against a relational replay of only the accepted writes.
  // --------------------------------------------------------------------------
  private def q238(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("chk_orders")
    val t = s"m238_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet PARTITIONED BY (st)
      TBLPROPERTIES ('graft.check.positive_price' = 'price_c > 0',
                     'graft.check.status_known' = 'st IN (''O'', ''F'', ''P'')')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM chk_orders WHERE o_orderkey % 3 = 0""")
    val snapsBefore = s.sql(s"SELECT COUNT(*) FROM graft.lake.$t.snapshots")
      .collect()(0).getLong(0)
    val rejected =
      try {
        s.sql(s"""INSERT INTO graft.lake.$t
          SELECT o_orderkey, o_orderstatus, -1
          FROM chk_orders WHERE o_orderkey % 3 = 1""")
        0L
      } catch { case e: Exception
          if e.getMessage != null && e.getMessage.contains("CHECK") ||
             Option(e.getCause).exists(c => c.getMessage != null &&
               c.getMessage.contains("CHECK")) => 1L
      }
    val snapsAfter = s.sql(s"SELECT COUNT(*) FROM graft.lake.$t.snapshots")
      .collect()(0).getLong(0)
    val unchanged = if (snapsAfter == snapsBefore) 1L else 0L
    s.sql(s"""
      SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
             CAST($rejected AS BIGINT) AS rejected_write_failed,
             CAST($unchanged AS BIGINT) AS no_partial_commit
      FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q238Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
              CAST(1 AS BIGINT) AS rejected_write_failed,
              CAST(1 AS BIGINT) AS no_partial_commit
       FROM orders WHERE o_orderkey % 3 = 0
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q239: ZERO-COPY TABLE CLONE (GraftClone.scala) — clone_table hard-links
  // the source snapshot's files (O(#files) metadata, zero data bytes; spec
  // pins same-inode sharing and survival of source maintenance), then the two
  // tables DIVERGE independently: the source takes an append, the clone takes
  // a merge-on-read DELETE, and neither sees the other's change. The oracle
  // replays both lineages relationally; the hash gates full isolation.
  // --------------------------------------------------------------------------
  private def q239(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("cl_orders")
    val t = s"m239_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.${t}_clone")
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, price_c BIGINT) USING parquet
      TBLPROPERTIES ('graft.delete-mode' = 'merge-on-read')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM cl_orders WHERE o_orderkey % 5 = 0""")
    s.sql(s"CALL graft.system.clone_table('lake.$t', 'lake.${t}_clone')")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM cl_orders WHERE o_orderkey % 5 = 1""")
    s.sql(s"DELETE FROM graft.lake.${t}_clone WHERE k % 10 = 0")
    s.sql(s"""
      SELECT 'source' AS side, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
      FROM graft.lake.$t
      UNION ALL
      SELECT 'clone', COUNT(*), CAST(SUM(price_c) AS BIGINT)
      FROM graft.lake.${t}_clone
      ORDER BY side""")
  }

  private val q239Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       src AS (SELECT k, p FROM base WHERE k % 5 = 0 OR k % 5 = 1),
       cl AS (SELECT k, p FROM base WHERE k % 5 = 0 AND k % 10 <> 0)
       SELECT 'source' AS side, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS total_c FROM src
       UNION ALL
       SELECT 'clone', COUNT(*), CAST(SUM(p) AS BIGINT) FROM cl
       ORDER BY side"""

  // --------------------------------------------------------------------------
  // q240: NATIVE STREAMING SINK (GraftStreamingWrite) — `writeStream.toTable`
  // straight into a partitioned graft table, no foreachBatch glue: a
  // file-replayed stream of orders drains under AvailableNow, each micro-
  // batch committing as ONE registry-named segment set (exactly-once — the
  // restart-replay no-op and CHECK gating are pinned in StreamingSinkSpec),
  // and the query aggregates the landed table. The oracle aggregates the
  // same rows relationally: streamed ingestion ≡ batch ingestion.
  // --------------------------------------------------------------------------
  private def q240(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    val t = s"m240_${Integer.toHexString(d.hashCode)}"
    val tmp = java.nio.file.Files.createTempDirectory(s"q240_${t}").toString
    val src = graft.Tables.orders(s, d)
      .where("o_orderkey % 4 = 2")
      .selectExpr("o_orderkey AS k", "o_orderstatus AS st",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS price_c")
    src.coalesce(4).write.mode("overwrite").parquet(tmp)
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, price_c BIGINT)
      USING parquet PARTITIONED BY (st)""")
    val q = s.readStream.schema(src.schema)
      .option("maxFilesPerTrigger", "2") // several epochs, not one
      .parquet(tmp)
      .writeStream
      .option("checkpointLocation", s"$tmp/_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"graft.lake.$t")
    require(q.awaitTermination(300000), s"q240: stream into $t did not drain")
    s.sql(s"""SELECT st, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c,
                     COUNT(DISTINCT k) AS n_keys
              FROM graft.lake.$t GROUP BY st ORDER BY st""")
  }

  private val q240Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
              CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c,
              COUNT(DISTINCT o_orderkey) AS n_keys
       FROM orders WHERE o_orderkey % 4 = 2
       GROUP BY 1 ORDER BY 1"""

  val defs: Seq[QDef] = Seq(
    QDef("q237_similarity_join_prefix_filter", q237, Some(q237Sql)),
    QDef("q238_check_constraints", q238, Some(q238Sql)),
    QDef("q239_lake_zero_copy_clone", q239, Some(q239Sql)),
    QDef("q240_lake_streaming_sink", q240, Some(q240Sql)))
}
