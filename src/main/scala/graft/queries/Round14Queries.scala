package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 surface: set-similarity JOIN with prefix filtering (the PPJoin
  * candidate-pruning shape — published algorithm, re-derived, no code), the
  * CHECK-constraint write gate (GraftChecks.scala), zero-copy table clone
  * (GraftClone.scala), the native exactly-once streaming sink
  * (GraftStreamingWrite.scala), a trained trigram language classifier
  * (Cavnar–Trenkle profile shape), and a one-pass column profiler.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts). */
object Round14Queries {

  // --------------------------------------------------------------------------
  // q237: SET-SIMILARITY JOIN with PREFIX FILTERING — find all document pairs
  // with 4-gram-shingle Jaccard >= 0.6, WITHOUT the all-pairs cross join:
  //   1. shingle: distinct word 4-grams per doc. Shingle WIDTH is the prefix
  //      filter's selectivity dial: over this corpus's small vocabulary,
  //      BIGRAMS behave like stop words (every doc shares its prefix tokens
  //      with thousands of others — measured 7.0M candidate pairs among 5k
  //      docs at sf0.1, i.e. the filter pruned nothing and the join
  //      degenerated to brute force at 44 s); 4-grams are rare enough that
  //      the same filter yields 256 candidates. Same rule as production
  //      near-dup pipelines: shingle until df is selective.
  //   2. rank every shingle by global rarity (document frequency, then the
  //      token itself — a total order, no global window needed: the (df,tok)
  //      pair IS the sort key);
  //   3. PREFIX FILTER: two sets with Jaccard >= t MUST share a token within
  //      the first n - ceil(t*n) + 1 of their rarity-sorted tokens — so
  //      candidates come from an EQUI-join on prefix tokens only (the rarest
  //      tokens, so candidate lists stay short);
  //   3b. LENGTH FILTER (PPJoin's companion bound): J(A,B) >= t implies
  //      |A∩B| >= t·(|A|+|B|-|A∩B|) and |A∩B| <= min(|A|,|B|), which gives
  //      min(|A|,|B|) >= t·max(|A|,|B|) — evaluated INSIDE the prefix
  //      equi-join as a cheap integer predicate, so size-mismatched pairs
  //      never reach DISTINCT or the exact verify. This is the prune that
  //      holds up at scale: candidate density grows superlinearly with
  //      near-dup density (the measured sf1 pattern), but candidates that
  //      differ in cardinality by more than 1/t can never pass and now cost
  //      one comparison instead of an array_intersect.
  //   4. verify candidates exactly (array_intersect), emit pairs >= t.
  // The ORACLE is the brute-force all-pairs join in DuckDB — it gates that
  // the pruned join finds EXACTLY the same pairs (no recall loss), which is
  // the whole claim of prefix filtering. Scale shape: everything is equi-join
  // + aggregation; the only quadratic work is within candidate buckets of
  // RARE tokens. PlanSpec's corpus-wide no-cartesian guard covers the plan.
  // --------------------------------------------------------------------------
  private def q237(s: SparkSession, d: String): DataFrame = {
    T.documents(s, d).createOrReplaceTempView("ssj_docs")
    // The shingle table is consumed THREE times (df counting, prefix ranking,
    // exact verification) and Spark INLINES `WITH` CTEs — left in one SQL the
    // split+4gram+distinct pipeline re-ran per consumer (measured 5× cost,
    // Q237Probe). Materialize it once; every consumer reads the cached
    // relation. At cluster scale this is "shingle once, reuse" — the standard
    // similarity-join staging table.
    val toks = s.sql("""
      SELECT doc_id,
             array_distinct(transform(sequence(0, size(w) - 4),
               i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2), ' ',
                           element_at(w, i + 3), ' ', element_at(w, i + 4)))) AS t
      FROM (SELECT doc_id, filter(split(lower(trim(text)), ' '), x -> x <> '') AS w
            FROM ssj_docs)
      WHERE size(w) >= 4""").persist()
    toks.createOrReplaceTempView("ssj_toks")
    val out = s.sql("""
      WITH exploded AS (
        SELECT doc_id, tok FROM ssj_toks LATERAL VIEW explode(t) ex AS tok),
      df AS (
        SELECT tok, COUNT(*) AS dfreq FROM exploded GROUP BY tok),
      ranked AS (
        -- prefix membership = rank within the doc by (global rarity, token):
        -- a rank window over the exploded rows replaces the previous
        -- collect_list + array_sort + slice + re-explode round trip
        SELECT e.doc_id, e.tok,
               ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.dfreq, e.tok) AS rk,
               COUNT(*) OVER (PARTITION BY e.doc_id) AS n
        FROM exploded e JOIN df d ON e.tok = d.tok),
      prefixes AS (
        SELECT doc_id, tok AS ptok, n FROM ranked
        WHERE rk <= n - CAST(ceil(0.6 * n) AS INT) + 1),
      cands AS (
        -- the length bound rides the equi-join condition: Jaccard >= 0.6
        -- forces least(na,nb) >= 0.6 * greatest(na,nb), so the DISTINCT and
        -- the exact verify below only ever see length-compatible pairs
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM prefixes a JOIN prefixes b
          ON a.ptok = b.ptok AND a.doc_id < b.doc_id
         AND least(a.n, b.n) >= 0.6 * greatest(a.n, b.n)),
      verified AS (
        SELECT c.da, c.db,
               size(array_intersect(ta.t, tb.t)) AS i,
               size(ta.t) AS na, size(tb.t) AS nb
        FROM cands c
        JOIN ssj_toks ta ON ta.doc_id = c.da
        JOIN ssj_toks tb ON tb.doc_id = c.db)
      SELECT da, db, ROUND(CAST(i AS DOUBLE) / (na + nb - i), 2) AS jaccard
      FROM verified
      WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.6
      ORDER BY da, db""")
      // materialize-then-release (the q249/Round5/Round7 convention):
      // localCheckpoint(true) computes the result while the shingle cache is
      // hot and truncates lineage, so the persist never leaks executor
      // storage into the rest of the suite
      .localCheckpoint(true)
    toks.unpersist()
    out
  }

  private val q237Sql =
    """WITH base AS (
         SELECT doc_id, list_filter(string_split(lower(trim(text)), ' '),
                                    x -> x <> '') AS w
         FROM documents),
       toks AS (
         SELECT doc_id,
                list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                               for i in range(1, len(w) - 2)]) AS t
         FROM base WHERE len(w) >= 4),
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

  // --------------------------------------------------------------------------
  // q241: TRAINED n-gram LANGUAGE CLASSIFIER (Cavnar–Trenkle profile shape,
  // published method re-derived) — upgrade over q33's stopword heuristic: a
  // deterministic 80/20 hash split trains per-language char-TRIGRAM profiles
  // (top-40 by count, (count DESC, trigram ASC) total order so rank cutoff is
  // engine-independent), test docs score by profile overlap, argmax with
  // lexicographic tie-break, and the output is the full CONFUSION MATRIX.
  // The synthetic corpus's text is label-independent, so accuracy is
  // uninformative BY CONSTRUCTION — what the oracle hash gates is the whole
  // train→profile→classify pipeline being exactly reproducible relational
  // algebra. Scale shape: one groupBy per stage, windows partitioned by
  // lang / doc_id (never global).
  // --------------------------------------------------------------------------
  private def q241(s: SparkSession, d: String): DataFrame = {
    T.documents(s, d).createOrReplaceTempView("lid_docs")
    // r21 (guide §1.2 per-task work + the q237 CTE lesson): the trigram CTE
    // had `lower(text)` INSIDE the transform lambda — re-lowercasing the
    // whole document for EVERY trigram position, O(len²) characters per doc —
    // and was consumed twice (train profile + test tokens), so the explode
    // pipeline ran twice. `lower` now hoists to a projection evaluated once
    // per doc (kept un-collapsible by the persist boundary), and the trigram
    // table materializes once for both consumers — the q237
    // persist/localCheckpoint/unpersist convention, so the cache never leaks
    // past this query. Measured: 4.5 s → ~1.5 s at sf0.1.
    val tg = s.sql("""
      SELECT doc_id, lang, lower(text) AS lo
      FROM lid_docs WHERE length(text) >= 3""").persist()
    tg.createOrReplaceTempView("lid_lo")
    val out = s.sql("""
      WITH tg AS (
        SELECT doc_id, lang, explode(transform(
                 sequence(1, length(lo) - 2),
                 i -> substring(lo, i, 3))) AS t
        FROM lid_lo),
      profile AS (
        SELECT lang, t FROM (
          SELECT lang, t,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY COUNT(*) DESC, t ASC) AS r
          FROM tg WHERE doc_id % 5 <> 0
          GROUP BY lang, t)
        WHERE r <= 40),
      test_toks AS (
        SELECT DISTINCT doc_id, lang AS labeled, t
        FROM tg WHERE doc_id % 5 = 0),
      scored AS (
        SELECT tt.doc_id, tt.labeled, p.lang AS guess, COUNT(*) AS score
        FROM test_toks tt JOIN profile p ON tt.t = p.t
        GROUP BY tt.doc_id, tt.labeled, p.lang),
      best AS (
        SELECT doc_id, labeled, guess FROM (
          SELECT doc_id, labeled, guess,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, guess ASC) AS rn
          FROM scored)
        WHERE rn = 1)
      SELECT labeled, guess, COUNT(*) AS n
      FROM best GROUP BY labeled, guess ORDER BY labeled, guess""")
      // materialize-then-release (q237 convention): compute while the trigram
      // cache is hot, truncate lineage, never leak storage into the suite
      .localCheckpoint(true)
    tg.unpersist()
    out
  }

  private val q241Sql =
    """WITH tg AS (
         SELECT doc_id, lang, unnest([substring(lower(text), i, 3)
                                      for i in range(1, length(lower(text)) - 1)]) AS t
         FROM documents WHERE length(text) >= 3),
       profile AS (
         SELECT lang, t FROM (
           SELECT lang, t,
                  ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY COUNT(*) DESC, t ASC) AS r
           FROM tg WHERE doc_id % 5 <> 0
           GROUP BY lang, t)
         WHERE r <= 40),
       test_toks AS (
         SELECT DISTINCT doc_id, lang AS labeled, t
         FROM tg WHERE doc_id % 5 = 0),
       scored AS (
         SELECT tt.doc_id, tt.labeled, p.lang AS guess, COUNT(*) AS score
         FROM test_toks tt JOIN profile p ON tt.t = p.t
         GROUP BY tt.doc_id, tt.labeled, p.lang),
       best AS (
         SELECT doc_id, labeled, guess FROM (
           SELECT doc_id, labeled, guess,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, guess ASC) AS rn
           FROM scored)
         WHERE rn = 1)
       SELECT labeled, guess, COUNT(*) AS n
       FROM best GROUP BY labeled, guess ORDER BY labeled, guess"""

  // --------------------------------------------------------------------------
  // q242: one-pass COLUMN PROFILER — the data-quality summary every curation
  // pipeline runs first (rows, nulls, exact distincts, min/max) for a column
  // set, computed in ONE aggregate over the table and reshaped with stack
  // (never N per-column scans). String and numeric min/max are emitted in
  // SEPARATE typed columns: cross-engine numeric-to-string formatting is not
  // canonical, typed values are.
  // --------------------------------------------------------------------------
  private def q242(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("prof_src")
    // r21 (guide §2.3 "aggregate before you shuffle"): the naive one-shot
    // aggregate put four COUNT(DISTINCT)s plus STRING MIN/MAX in one global
    // aggregate — Spark plans that as Expand x5 over every row and, because
    // var-length (string) aggregate buffers disqualify HashAggregate, a full
    // SORT of the 5x-expanded table (SortAggregate). The pre-aggregate below
    // collapses the table to the distinct 4-column combinations FIRST — a
    // plain HashAggregate with a long buffer, partial map-side — and runs the
    // distinct/min/max machinery over |combinations| rows. Equivalence:
    // per-column distincts/extrema survive a group-by over the column set,
    // and counts re-weight by cnt. The combination count is bounded by the
    // columns' value products (flags x flags x 50 quantities x 11 discounts),
    // which is the scale-safety condition at 100 TB too. Measured: the
    // Expand/SortAggregate plan carried ~4.3 s warm; the pre-agg shape ~1 s.
    s.sql("""
      WITH pre AS (
        SELECT l_linestatus, l_returnflag, l_quantity, l_discount, COUNT(*) AS cnt
        FROM prof_src
        GROUP BY l_linestatus, l_returnflag, l_quantity, l_discount),
      agg AS (
        SELECT COALESCE(SUM(cnt), 0) AS n,
               SUM(CASE WHEN l_linestatus IS NULL THEN cnt ELSE 0 END) AS null_sm,
               COUNT(DISTINCT l_linestatus) AS d_sm,
               MIN(l_linestatus) AS min_sm, MAX(l_linestatus) AS max_sm,
               SUM(CASE WHEN l_returnflag IS NULL THEN cnt ELSE 0 END) AS null_rf,
               COUNT(DISTINCT l_returnflag) AS d_rf,
               MIN(l_returnflag) AS min_rf, MAX(l_returnflag) AS max_rf,
               SUM(CASE WHEN l_quantity IS NULL THEN cnt ELSE 0 END) AS null_q,
               COUNT(DISTINCT l_quantity) AS d_q,
               ROUND(MIN(l_quantity), 2) AS min_q, ROUND(MAX(l_quantity), 2) AS max_q,
               SUM(CASE WHEN l_discount IS NULL THEN cnt ELSE 0 END) AS null_di,
               COUNT(DISTINCT l_discount) AS d_di,
               ROUND(MIN(l_discount), 2) AS min_di, ROUND(MAX(l_discount), 2) AS max_di
        FROM pre)
      SELECT col, n, n_null, n_distinct, min_s, max_s, min_n, max_n
      FROM (
        SELECT n, stack(4,
          'l_linestatus', null_sm, d_sm, min_sm, max_sm, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
          'l_returnflag', null_rf, d_rf, min_rf, max_rf, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
          'l_quantity',   null_q,  d_q,  CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(min_q AS DOUBLE), CAST(max_q AS DOUBLE),
          'l_discount',   null_di, d_di, CAST(NULL AS STRING), CAST(NULL AS STRING), CAST(min_di AS DOUBLE), CAST(max_di AS DOUBLE))
          AS (col, n_null, n_distinct, min_s, max_s, min_n, max_n)
        FROM agg)
      ORDER BY col""")
  }

  private val q242Sql =
    """WITH agg AS (
         SELECT COUNT(*) AS n,
                SUM(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS null_sm,
                COUNT(DISTINCT l_linestatus) AS d_sm,
                MIN(l_linestatus) AS min_sm, MAX(l_linestatus) AS max_sm,
                SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS null_rf,
                COUNT(DISTINCT l_returnflag) AS d_rf,
                MIN(l_returnflag) AS min_rf, MAX(l_returnflag) AS max_rf,
                SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS null_q,
                COUNT(DISTINCT l_quantity) AS d_q,
                ROUND(MIN(l_quantity), 2) AS min_q, ROUND(MAX(l_quantity), 2) AS max_q,
                SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS null_di,
                COUNT(DISTINCT l_discount) AS d_di,
                ROUND(MIN(l_discount), 2) AS min_di, ROUND(MAX(l_discount), 2) AS max_di
         FROM lineitem),
       u AS (
         SELECT 'l_linestatus' AS col, CAST(n AS BIGINT) AS n, CAST(null_sm AS BIGINT) AS n_null,
                CAST(d_sm AS BIGINT) AS n_distinct, min_sm AS min_s, max_sm AS max_s,
                CAST(NULL AS DOUBLE) AS min_n, CAST(NULL AS DOUBLE) AS max_n FROM agg
         UNION ALL
         SELECT 'l_returnflag', CAST(n AS BIGINT), CAST(null_rf AS BIGINT),
                CAST(d_rf AS BIGINT), min_rf, max_rf,
                CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM agg
         UNION ALL
         SELECT 'l_quantity', CAST(n AS BIGINT), CAST(null_q AS BIGINT),
                CAST(d_q AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                CAST(min_q AS DOUBLE), CAST(max_q AS DOUBLE) FROM agg
         UNION ALL
         SELECT 'l_discount', CAST(n AS BIGINT), CAST(null_di AS BIGINT),
                CAST(d_di AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
                CAST(min_di AS DOUBLE), CAST(max_di AS DOUBLE) FROM agg)
       SELECT col, n, n_null, n_distinct, min_s, max_s, min_n, max_n
       FROM u ORDER BY col"""

  val defs: Seq[QDef] = Seq(
    QDef("q237_similarity_join_prefix_filter", q237, Some(q237Sql)),
    QDef("q238_check_constraints", q238, Some(q238Sql)),
    QDef("q239_lake_zero_copy_clone", q239, Some(q239Sql)),
    QDef("q240_lake_streaming_sink", q240, Some(q240Sql)),
    QDef("q241_trigram_language_classifier", q241, Some(q241Sql)),
    QDef("q242_column_profiler", q242, Some(q242Sql)))
}
