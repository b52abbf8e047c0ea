package graft.queries

import graft.QDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 surface (q243–q263): the SCD Type-2 dimension build and the
  * segment-level BLOOM index; the analytics completions (autocorrelation,
  * Benford audit, rolling distinct users, Kaplan–Meier survival, RFM
  * segmentation, Shannon entropy, per-nation Gini, chi-square independence);
  * the text/tokenizer operators (Unicode normalization, BPE merge training,
  * Flesch readability, Jaro–Winkler — the latter two as native codegen
  * Expressions); the similarity-search memory tier (product quantization);
  * the ingestion-robustness surface (CSV malformed-row modes); and the
  * round's lakehouse features under oracle (tags q251, partition evolution
  * q254, zero-copy add_files q256, generated columns q258, NDV column stats
  * q262).
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

  // --------------------------------------------------------------------------
  // q245: AUTOCORRELATION FUNCTION (ACF lags 1–7) of the daily revenue
  // series — the time-series diagnostic (seasonality detection) the resample
  // (q168) / EWMA (q175) family was missing. The lag shift is expressed as a
  // self-join of the daily series against a 7-row lag spine rather than 7
  // LAG() windows: the series is date-keyed so the join is an equi-join on
  // (day - k), every engine plans it identically, and adding lags is O(1).
  // At scale the daily series is |days| rows (tiny) regardless of input
  // size — the heavy aggregation is the one groupBy day. corr is emitted in
  // basis points per the q89 convention.
  // --------------------------------------------------------------------------
  private def q245(s: SparkSession, d: String): DataFrame = {
    graft.Tables.orders(s, d).createOrReplaceTempView("acf_orders")
    s.sql("""
      WITH series AS (
        SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS rev
        FROM acf_orders GROUP BY 1),
      lags AS (SELECT explode(sequence(1, 7)) AS k)
      SELECT l.k AS lag, COUNT(*) AS n_pairs,
             CAST(ROUND(corr(a.rev, b.rev) * 10000) AS BIGINT) AS acf_bp
      FROM series a
      JOIN lags l
      JOIN series b ON b.day = date_sub(a.day, l.k)
      GROUP BY l.k ORDER BY l.k""")
  }

  private val q245Sql =
    """WITH series AS (
         SELECT CAST(o_orderdate AS DATE) AS day, SUM(o_totalprice) AS rev
         FROM orders GROUP BY 1),
       lags AS (SELECT k FROM generate_series(1, 7) t(k))
       SELECT CAST(l.k AS INT) AS lag, COUNT(*) AS n_pairs,
              CAST(ROUND(corr(a.rev, b.rev) * 10000) AS BIGINT) AS acf_bp
       FROM series a, lags l, series b
       WHERE b.day = a.day - CAST(l.k AS INT)
       GROUP BY l.k ORDER BY lag"""

  // --------------------------------------------------------------------------
  // q246: BENFORD FIRST-DIGIT AUDIT — the data-quality / fraud-screen
  // profile: distribution of leading significant digits vs Benford's
  // log10(1 + 1/d) expectation, deviation in basis points. One scan, one
  // 9-group aggregate, a window total — fully codegen'd, embarrassingly
  // parallel at 100 TB. dev_bp is computed from the two ALREADY-ROUNDED
  // integer columns so the output is exact integer arithmetic.
  // --------------------------------------------------------------------------
  private def q246(s: SparkSession, d: String): DataFrame = {
    graft.Tables.orders(s, d).createOrReplaceTempView("ben_orders")
    s.sql("""
      WITH digits AS (
        SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING), 1, 1)
                 AS INT) AS d1
        FROM ben_orders WHERE o_totalprice >= 1.0),
      freq AS (
        SELECT d1, COUNT(*) AS n,
               CAST(ROUND(COUNT(*) * 10000.0 / SUM(COUNT(*)) OVER ()) AS BIGINT) AS pct_bp,
               CAST(ROUND(LOG10(1.0 + 1.0 / d1) * 10000) AS BIGINT) AS benford_bp
        FROM digits GROUP BY d1)
      SELECT d1, n, pct_bp, benford_bp, pct_bp - benford_bp AS dev_bp
      FROM freq ORDER BY d1""")
  }

  private val q246Sql =
    """WITH digits AS (
         SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INT) AS d1
         FROM orders WHERE o_totalprice >= 1.0),
       freq AS (
         SELECT d1, COUNT(*) AS n,
                CAST(ROUND(COUNT(*) * 10000.0 / SUM(COUNT(*)) OVER ()) AS BIGINT) AS pct_bp,
                CAST(ROUND(LOG10(1.0 + 1.0 / d1) * 10000) AS BIGINT) AS benford_bp
         FROM digits GROUP BY d1)
       SELECT d1, n, pct_bp, benford_bp, pct_bp - benford_bp AS dev_bp
       FROM freq ORDER BY d1"""

  // --------------------------------------------------------------------------
  // q247: ROLLING DISTINCT USERS (trailing-7-day active users) — the DAU/WAU
  // shape. Spark has no COUNT(DISTINCT) OVER, and the naive fix (self-join
  // every row against a 7-day band) re-scans the fact table 7×. The scalable
  // decomposition: ONE groupBy collapses the fact table to |days| rows of
  // per-day user SETS, then the window unions 7 tiny sets per day —
  // the post-aggregate state is days × daily-distinct, independent of event
  // count. The frame orders by epoch-day RANGE so calendar gaps (if any)
  // are handled correctly, not positionally. Oracle computes the same
  // number the obvious way (correlated distinct count over a date band).
  // --------------------------------------------------------------------------
  private def q247(s: SparkSession, d: String): DataFrame = {
    graft.Tables.events(s, d).createOrReplaceTempView("rdu_events")
    s.sql("""
      WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               DATEDIFF(CAST(ts AS DATE), DATE'1970-01-01') AS day_num,
               collect_set(user_id) AS us
        FROM rdu_events GROUP BY 1, 2)
      SELECT CAST(day AS STRING) AS day,
             size(us) AS u1,
             size(array_distinct(flatten(collect_list(us) OVER (
               ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)))) AS u7
      FROM daily ORDER BY day""")
  }

  private val q247Sql =
    """WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events)
       SELECT CAST(day AS VARCHAR) AS day,
              (SELECT COUNT(DISTINCT e.user_id) FROM events e
               WHERE CAST(e.ts AS DATE) = day) AS u1,
              (SELECT COUNT(DISTINCT e.user_id) FROM events e
               WHERE CAST(e.ts AS DATE) BETWEEN day - 6 AND day) AS u7
       FROM days ORDER BY day"""

  // --------------------------------------------------------------------------
  // q248: UNICODE NORMALIZATION as a native codegen Expression
  // (functions/UnicodeNormalize.scala: graft_normalize(str, form) +
  // graft_strip_accents) — canonicalize-before-hash. The corpus text is
  // ASCII (normalization-invariant), so the test plants the classes that
  // matter: a DECOMPOSED accent ('e' + U+0301 combining acute — NFC composes
  // it to 'é', shortening the string by one code point and changing its
  // md5), and NFKC compatibility folds (U+FB01 'ﬁ' ligature → "fi",
  // U+2116 '№' → "No") that NFC alone leaves in place. The oracle uses
  // DuckDB's nfc_normalize/strip_accents for the NFC path and rebuilds the
  // NFKC folds from the planted constants (DuckDB has no NFKC) — so the
  // Expression is gated against an INDEPENDENT normalizer, not itself.
  // --------------------------------------------------------------------------
  private def q248(s: SparkSession, d: String): DataFrame = {
    graft.functions.UnicodeFunctions.register(s)
    graft.Tables.documents(s, d).createOrReplaceTempView("uni_docs")
    // NOTE: the \u escapes below are substituted by the Scala compiler, so the
    // SQL literals contain the actual code points.
    s.sql("""
      WITH planted AS (
        SELECT doc_id,
               CONCAT('Cafe', '́', ' ', SUBSTRING(text, 1, 40)) AS raw,
               CONCAT('résumé ', 'ﬁle ', '№ ',
                      CAST(doc_id AS STRING)) AS kraw
        FROM uni_docs WHERE doc_id % 5 = 0)
      SELECT doc_id,
             CAST(LENGTH(raw) AS BIGINT) AS len_raw,
             CAST(LENGTH(graft_normalize(raw, 'NFC')) AS BIGINT) AS len_nfc,
             MD5(graft_normalize(raw, 'NFC')) AS md5_nfc,
             MD5(graft_strip_accents(raw)) AS md5_stripped,
             graft_normalize(kraw, 'NFKC') AS folded
      FROM planted ORDER BY doc_id""")
  }

  private val q248Sql =
    """WITH planted AS (
         SELECT doc_id,
                'Cafe' || chr(769) || ' ' || SUBSTRING(text, 1, 40) AS raw,
                'r' || chr(233) || 'sum' || chr(233) || ' ' || chr(64257) || 'le ' ||
                  chr(8470) || ' ' || CAST(doc_id AS VARCHAR) AS kraw
         FROM documents WHERE doc_id % 5 = 0)
       SELECT doc_id,
              CAST(LENGTH(raw) AS BIGINT) AS len_raw,
              CAST(LENGTH(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
              MD5(nfc_normalize(raw)) AS md5_nfc,
              MD5(strip_accents(nfc_normalize(raw))) AS md5_stripped,
              REPLACE(REPLACE(kraw, chr(64257), 'fi'), chr(8470), 'No') AS folded
       FROM planted ORDER BY doc_id"""

  // --------------------------------------------------------------------------
  // q249: DISTRIBUTED BPE MERGE TRAINING — the byte-pair-encoding trainer
  // loop that produces an LLM tokenizer's merge table, as a Spark-first
  // pipeline: corpus → word-frequency table (ONE shuffle collapses the corpus
  // to vocab size — everything after is vocab-sized, the property that makes
  // BPE trainable on a 100 TB corpus) → per-iteration adjacent-pair counts
  // (explode + hash agg, map-side combined) → argmax merge → simultaneous
  // in-array merge via higher-order functions. Only the 1-row argmax crosses
  // to the driver per iteration (the standard trainer structure; 3 iterations
  // here, the loop is N by construction). Self-adjacent pairs (a = b) are
  // excluded from merge selection so the simultaneous HOF merge is EXACTLY
  // greedy left-to-right (a ≠ b makes overlapping matches impossible) — the
  // documented variant, enforced identically in the oracle's unrolled CTEs.
  // --------------------------------------------------------------------------
  /** Shared BPE trainer (q249's loop): 3 greedy merges over the corpus
    * word-frequency table. Returns (merge table, trained word→symbols
    * frame); the CALLER unpersists the returned syms after materializing. */
  private def bpeTrain(s: SparkSession, d: String)
    : (Seq[(Int, String, String, Long)], DataFrame) = {
    val words = graft.Tables.documents(s, d)
      .select(explode(expr("filter(split(lower(text), '[^a-z]+'), t -> t <> '')"))
        .as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    // The symbol table is PERSISTED after every merge: chained higher-order
    // transforms otherwise collapse into ONE nested expression where each
    // element_at(arr, i) re-evaluates the whole previous iteration's lambda
    // chain per element — multiplicative blowup per iteration (measured 55 s
    // at sf0.1; materialized, the loop is sub-second per round). The cached
    // state is vocab-sized, the exact reason BPE training scales at all.
    var syms = words.selectExpr("word", "freq",
      "transform(sequence(1, length(word)), i -> substring(word, i, 1)) AS arr")
      .persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (it <- 1 to 3) {
      val top = syms.where(expr("size(arr) >= 2"))
        .selectExpr("freq",
          """explode(transform(sequence(1, size(arr) - 1),
            |  i -> struct(element_at(arr, i) AS a, element_at(arr, i + 1) AS b)))
            |  AS pr""".stripMargin)
        .where(expr("pr.a <> pr.b"))
        .groupBy(expr("pr.a").as("a"), expr("pr.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1).collect()(0)
      val (a, b, cnt) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((it, a, b, cnt))
      // simultaneous merge: drop every position that is the RIGHT half of a
      // match, rewrite every position that is the LEFT half to the merged
      // symbol — exact because a != b forbids overlapping matches
      val prev = syms
      syms = syms.selectExpr("word", "freq",
        s"""transform(
           |  filter(sequence(1, size(arr)),
           |    i -> NOT (i > 1 AND element_at(arr, i - 1) = '$a'
           |              AND element_at(arr, i) = '$b')),
           |  i -> CASE WHEN element_at(arr, i) = '$a' AND i < size(arr)
           |                 AND element_at(arr, i + 1) = '$b'
           |            THEN concat(element_at(arr, i), element_at(arr, i + 1))
           |            ELSE element_at(arr, i) END) AS arr""".stripMargin)
        .persist()
      syms.count() // materialize, then release the previous generation
      prev.unpersist()
    }
    (merges.result(), syms)
  }

  private def q249(s: SparkSession, d: String): DataFrame = {
    val (merges, syms) = bpeTrain(s, d)
    syms.unpersist()
    import s.implicits._
    merges.toDF("it", "left_sym", "right_sym", "cnt")
      .selectExpr("it", "left_sym", "right_sym",
        "concat(left_sym, right_sym) AS merged", "cnt")
      .orderBy("it")
  }

  // --------------------------------------------------------------------------
  // q271: BPE ENCODING via the trained vocabulary — the SERVE half of the
  // tokenizer story (q249 trains the merge table; this applies it to the
  // corpus). The scale-right design is NOT per-document merge replay
  // (n_merges passes over the full corpus): the trainer's word→symbols table
  // IS the tokenizer — encoding is docs → words → ONE equi-join to the
  // vocab-sized table, so a 100 TB corpus encodes in a single pass no matter
  // how many merges were trained (production tokenizers do exactly this:
  // word-level caching in front of merge replay). Out-of-vocabulary words
  // (none here — trained on the same corpus; real at serve time) fall back
  // to character count via the LEFT join. Output: per-doc word/char/token
  // counts + compression in basis points, all integer.
  // --------------------------------------------------------------------------
  private def q271(s: SparkSession, d: String): DataFrame = {
    val (_, syms) = bpeTrain(s, d)
    val words = graft.Tables.documents(s, d)
      .select(col("doc_id"),
        explode(expr("filter(split(lower(text), '[^a-z]+'), t -> t <> '')")).as("word"))
    val out = words
      .join(syms.selectExpr("word", "size(arr) AS n_sym"), Seq("word"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum(coalesce(col("n_sym"), length(col("word")))).cast("long").as("n_tokens"))
      .withColumn("compression_bp", expr("n_chars * 10000L DIV n_tokens"))
      .orderBy(col("doc_id"))
      .localCheckpoint(true)
    syms.unpersist()
    out
  }

  private val q271Sql =
    s"""WITH w AS (
       |  SELECT t AS word, COUNT(*) AS freq
       |  FROM (SELECT UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
       |                                  t -> t <> '')) AS t
       |        FROM documents)
       |  GROUP BY 1),
       |s0 AS (SELECT word, freq,
       |              list_transform(generate_series(1, length(word)), i -> word[i]) AS arr
       |       FROM w),
       |p1 AS (${q249PairsSql("s0")}),
       |t1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
       |s1 AS (${q249MergeSql("s0", "t1")}),
       |p2 AS (${q249PairsSql("s1")}),
       |t2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
       |s2 AS (${q249MergeSql("s1", "t2")}),
       |p3 AS (${q249PairsSql("s2")}),
       |t3 AS (SELECT a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1),
       |s3 AS (${q249MergeSql("s2", "t3")}),
       |dw AS (
       |  SELECT doc_id,
       |         UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
       |                            t -> t <> '')) AS word
       |  FROM documents),
       |enc AS (
       |  SELECT dw.doc_id, length(dw.word) AS n_chr,
       |         COALESCE(len(s3.arr), length(dw.word)) AS n_sym
       |  FROM dw LEFT JOIN s3 ON dw.word = s3.word)
       |SELECT doc_id, COUNT(*) AS n_words,
       |       CAST(SUM(n_chr) AS BIGINT) AS n_chars,
       |       CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       |       CAST(SUM(n_chr) * 10000 // SUM(n_sym) AS BIGINT) AS compression_bp
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def q249MergeSql(src: String, top: String): String =
    s"""SELECT word, freq,
       |       list_transform(
       |         list_filter(generate_series(1, len(arr)),
       |           i -> NOT (i > 1 AND arr[i-1] = $top.a AND arr[i] = $top.b)),
       |         i -> CASE WHEN arr[i] = $top.a AND i < len(arr) AND arr[i+1] = $top.b
       |                   THEN arr[i] || arr[i+1] ELSE arr[i] END) AS arr
       |FROM $src CROSS JOIN $top""".stripMargin

  private def q249PairsSql(src: String): String =
    s"""SELECT pr[1] AS a, pr[2] AS b, CAST(SUM(freq) AS BIGINT) AS cnt
       |FROM (SELECT freq, UNNEST(list_transform(generate_series(1, len(arr) - 1),
       |               i -> [arr[i], arr[i+1]])) AS pr
       |      FROM $src WHERE len(arr) >= 2)
       |WHERE pr[1] <> pr[2] GROUP BY 1, 2""".stripMargin

  private val q249Sql =
    s"""WITH w AS (
       |  SELECT t AS word, COUNT(*) AS freq
       |  FROM (SELECT UNNEST(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
       |                                  t -> t <> '')) AS t
       |        FROM documents)
       |  GROUP BY 1),
       |s0 AS (SELECT word, freq,
       |              list_transform(generate_series(1, length(word)), i -> word[i]) AS arr
       |       FROM w),
       |p1 AS (${q249PairsSql("s0")}),
       |t1 AS (SELECT a, b, cnt FROM p1 ORDER BY cnt DESC, a, b LIMIT 1),
       |s1 AS (${q249MergeSql("s0", "t1")}),
       |p2 AS (${q249PairsSql("s1")}),
       |t2 AS (SELECT a, b, cnt FROM p2 ORDER BY cnt DESC, a, b LIMIT 1),
       |s2 AS (${q249MergeSql("s1", "t2")}),
       |p3 AS (${q249PairsSql("s2")}),
       |t3 AS (SELECT a, b, cnt FROM p3 ORDER BY cnt DESC, a, b LIMIT 1)
       |SELECT CAST(1 AS INT) AS it, a AS left_sym, b AS right_sym, a || b AS merged, cnt FROM t1
       |UNION ALL SELECT 2, a, b, a || b, cnt FROM t2
       |UNION ALL SELECT 3, a, b, a || b, cnt FROM t3
       |ORDER BY it""".stripMargin

  // --------------------------------------------------------------------------
  // q250: PRODUCT QUANTIZATION (PQ) ANN — the memory-side scale path the
  // similarity-search family (q42 brute / q43 sign-LSH / q60 IVF) was
  // missing: 64 floats/vector (256 B) compress to 4 codebook ids (4 B), and
  // search runs over codes with a PROBE-LOCAL distance table (ADC —
  // asymmetric distance computation). m=4 subspaces × 16 dims, k=4 centroids
  // per subspace, 2 Lloyd rounds. Everything is relational: assignment is a
  // subvector × centroid broadcast join (16 rows) + argmin window; the
  // centroid update is an ELEMENT-WISE DISCRETE MEDIAN (row_number selection
  // at position (n+1) div 2) instead of a mean — medians SELECT an existing
  // float, so the codebook is bit-identical across engines with no
  // summation-order hazard (means are order-dependent in fp); distances fold
  // left-to-right in DOUBLE (Spark `aggregate` ≡ DuckDB `list_reduce`, the
  // q42 convention) so every ADC value hash-matches exactly. At 100 TB the
  // shape holds: codes are a 4-byte-per-vector scan, the per-probe distance
  // table is 16 entries broadcast, and the only big shuffle is the one
  // groupBy(vec_id) behind encoding. Empty clusters keep their previous
  // centroid (COALESCE over the codebook spine) — same rule both engines.
  // --------------------------------------------------------------------------
  private def q250(s: SparkSession, d: String): DataFrame = {
    graft.Tables.embeddings(s, d).createOrReplaceTempView("pq_emb")
    def fold(a: String, b: String): String =
      s"""aggregate(transform(sequence(1, 16),
         |  i -> (element_at($a, i) - element_at($b, i)) * (element_at($a, i) - element_at($b, i))),
         |  CAST(0.0 AS DOUBLE), (x, y) -> x + y)""".stripMargin
    def assign(cent: String): String =
      s"""SELECT vec_id, j, r, d, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, r) AS rn
         |FROM (SELECT s.vec_id, s.j, c.r, ${fold("s.sub", "c.c")} AS d
         |      FROM subs s JOIN $cent c ON s.j = c.j)""".stripMargin
    def update(a: String, mem: String, vals: String, med: String, upd: String): String =
      s"""$mem AS (SELECT a.j, a.r, s.sub
         |          FROM (SELECT vec_id, j, r FROM $a WHERE rn = 1) a
         |          JOIN subs s ON s.vec_id = a.vec_id AND s.j = a.j),
         |$vals AS (SELECT j, r, dim, element_at(sub, dim) AS v
         |          FROM $mem LATERAL VIEW explode(sequence(1, 16)) t AS dim),
         |$med AS (SELECT j, r, dim, v AS med
         |         FROM (SELECT j, r, dim, v,
         |                 ROW_NUMBER() OVER (PARTITION BY j, r, dim ORDER BY v) AS vr,
         |                 COUNT(*) OVER (PARTITION BY j, r, dim) AS n
         |               FROM $vals)
         |         WHERE vr = (n + 1) DIV 2),
         |$upd AS (SELECT j, r,
         |                transform(array_sort(collect_list(struct(dim, med))), x -> x.med) AS c
         |         FROM $med GROUP BY j, r)""".stripMargin
    s.sql(s"""
      WITH e AS (SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
                 FROM pq_emb),
      subs AS (SELECT vec_id, j,
                      transform(sequence(1, 16), i -> element_at(emb, j * 16 + i)) AS sub
               FROM e LATERAL VIEW explode(sequence(0, 3)) t AS j),
      c0 AS (SELECT j, vec_id AS r, sub AS c FROM subs WHERE vec_id < 4),
      a1 AS (${assign("c0")}),
      ${update("a1", "mem1", "vals1", "med1", "u1")},
      c1 AS (SELECT c0.j, c0.r, COALESCE(u1.c, c0.c) AS c
             FROM c0 LEFT JOIN u1 ON c0.j = u1.j AND c0.r = u1.r),
      a2 AS (${assign("c1")}),
      ${update("a2", "mem2", "vals2", "med2", "u2")},
      c2 AS (SELECT c1.j, c1.r, COALESCE(u2.c, c1.c) AS c
             FROM c1 LEFT JOIN u2 ON c1.j = u2.j AND c1.r = u2.r),
      codes AS (SELECT vec_id, j, r FROM (${assign("c2")}) WHERE rn = 1),
      dtab AS (SELECT s.vec_id AS pid, s.j, c.r, ${fold("s.sub", "c.c")} AS d
               FROM subs s JOIN c2 c ON s.j = c.j WHERE s.vec_id < 3),
      adc AS (SELECT d.pid, k.vec_id AS cand,
                     MAX(CASE WHEN d.j = 0 THEN d.d END) AS d0,
                     MAX(CASE WHEN d.j = 1 THEN d.d END) AS d1,
                     MAX(CASE WHEN d.j = 2 THEN d.d END) AS d2,
                     MAX(CASE WHEN d.j = 3 THEN d.d END) AS d3
              FROM codes k JOIN dtab d ON d.j = k.j AND d.r = k.r
              WHERE k.vec_id <> d.pid
              GROUP BY d.pid, k.vec_id),
      ranked AS (SELECT pid, cand, ((d0 + d1) + d2) + d3 AS adc_d,
                        ROW_NUMBER() OVER (PARTITION BY pid
                          ORDER BY ((d0 + d1) + d2) + d3, cand) AS rn
                 FROM adc)
      SELECT pid, CAST(rn AS INT) AS rn, cand,
             CAST(ROUND(adc_d * 10000) AS BIGINT) AS adc_bp
      FROM ranked WHERE rn <= 10 ORDER BY pid, rn""")
  }

  private val q250Sql = {
    def fold(a: String, b: String): String =
      s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |  list_transform(generate_series(1,16), i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))),
         |  (x, y) -> x + y)""".stripMargin
    def assign(cent: String): String =
      s"""SELECT vec_id, j, r, d, ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d, r) AS rn
         |FROM (SELECT s.vec_id, s.j, c.r, ${fold("s.sub", "c.c")} AS d
         |      FROM subs s JOIN $cent c ON s.j = c.j)""".stripMargin
    def update(a: String, mem: String, vals: String, med: String, upd: String): String =
      s"""$mem AS (SELECT a.j, a.r, s.sub
         |          FROM (SELECT vec_id, j, r FROM $a WHERE rn = 1) a
         |          JOIN subs s ON s.vec_id = a.vec_id AND s.j = a.j),
         |$vals AS (SELECT j, r, dim, sub[dim] AS v FROM $mem, generate_series(1,16) AS t(dim)),
         |$med AS (SELECT j, r, dim, v AS med
         |         FROM (SELECT j, r, dim, v,
         |                 ROW_NUMBER() OVER (PARTITION BY j, r, dim ORDER BY v) AS vr,
         |                 COUNT(*) OVER (PARTITION BY j, r, dim) AS n
         |               FROM $vals)
         |         WHERE vr = (n + 1) // 2),
         |$upd AS (SELECT j, r, array_agg(med ORDER BY dim) AS c FROM $med GROUP BY j, r)""".stripMargin
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |           FROM embeddings),
       |subs AS (SELECT vec_id, j,
       |                list_transform(generate_series(1, 16), i -> emb[j * 16 + i]) AS sub
       |         FROM e, generate_series(0, 3) AS t(j)),
       |c0 AS (SELECT j, vec_id AS r, sub AS c FROM subs WHERE vec_id < 4),
       |a1 AS (${assign("c0")}),
       |${update("a1", "mem1", "vals1", "med1", "u1")},
       |c1 AS (SELECT c0.j, c0.r, COALESCE(u1.c, c0.c) AS c
       |       FROM c0 LEFT JOIN u1 ON c0.j = u1.j AND c0.r = u1.r),
       |a2 AS (${assign("c1")}),
       |${update("a2", "mem2", "vals2", "med2", "u2")},
       |c2 AS (SELECT c1.j, c1.r, COALESCE(u2.c, c1.c) AS c
       |       FROM c1 LEFT JOIN u2 ON c1.j = u2.j AND c1.r = u2.r),
       |codes AS (SELECT vec_id, j, r FROM (${assign("c2")}) WHERE rn = 1),
       |dtab AS (SELECT s.vec_id AS pid, s.j, c.r, ${fold("s.sub", "c.c")} AS d
       |         FROM subs s JOIN c2 c ON s.j = c.j WHERE s.vec_id < 3),
       |adc AS (SELECT d.pid, k.vec_id AS cand,
       |               MAX(CASE WHEN d.j = 0 THEN d.d END) AS d0,
       |               MAX(CASE WHEN d.j = 1 THEN d.d END) AS d1,
       |               MAX(CASE WHEN d.j = 2 THEN d.d END) AS d2,
       |               MAX(CASE WHEN d.j = 3 THEN d.d END) AS d3
       |        FROM codes k JOIN dtab d ON d.j = k.j AND d.r = k.r
       |        WHERE k.vec_id <> d.pid
       |        GROUP BY d.pid, k.vec_id),
       |ranked AS (SELECT pid, cand, ((d0 + d1) + d2) + d3 AS adc_d,
       |                  ROW_NUMBER() OVER (PARTITION BY pid
       |                    ORDER BY ((d0 + d1) + d2) + d3, cand) AS rn
       |           FROM adc)
       |SELECT pid, CAST(rn AS INT) AS rn, cand,
       |       CAST(ROUND(adc_d * 10000) AS BIGINT) AS adc_bp
       |FROM ranked WHERE rn <= 10 ORDER BY pid, rn""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q251: TAG REFS — immutable named snapshots (`create_tag` → `VERSION AS OF
  // '<tag>'`), the release-pointer sibling of q235's WAP branches. The
  // lifecycle under oracle: seed → TAG 'v1' → more inserts → DELETE →
  // `expire_snapshots(keep_last => 1)` — and the tagged read STILL serves the
  // exact v1 content, because expiry retains tagged snapshots (the whole
  // point: a release pin survives maintenance that would otherwise eat its
  // history). Both the pinned read and the current read are hash-gated
  // against independent relational replays. TagSpec pins the rest of the
  // contract (structural immutability, drop_tag frees retention, namespace
  // exclusivity vs branches, t.tags, clone stripping).
  // --------------------------------------------------------------------------
  private def q251(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("tag_orders")
    val t = s"m251_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, price_c BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM tag_orders WHERE o_orderkey % 3 = 0""")
    s.sql(s"CALL graft.system.create_tag('lake.$t', 'v1')")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM tag_orders WHERE o_orderkey % 3 = 1""")
    s.sql(s"DELETE FROM graft.lake.$t WHERE k % 9 = 0")
    s.sql(s"CALL graft.system.expire_snapshots('lake.$t', keep_last => 1)")
    s.sql(s"""
      SELECT 'tagged' AS state, COUNT(*) AS n, CAST(SUM(price_c) AS BIGINT) AS total_c
      FROM graft.lake.$t VERSION AS OF 'v1'
      UNION ALL
      SELECT 'current', COUNT(*), CAST(SUM(price_c) AS BIGINT)
      FROM graft.lake.$t
      ORDER BY state""")
  }

  private val q251Sql =
    """WITH base AS (
         SELECT o_orderkey AS k, CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS p
         FROM orders),
       v1 AS (SELECT k, p FROM base WHERE k % 3 = 0),
       cur AS (SELECT k, p FROM base WHERE (k % 3 = 0 OR k % 3 = 1) AND k % 9 <> 0)
       SELECT 'current' AS state, COUNT(*) AS n, CAST(SUM(p) AS BIGINT) AS total_c FROM cur
       UNION ALL
       SELECT 'tagged', COUNT(*), CAST(SUM(p) AS BIGINT) FROM v1
       ORDER BY state"""

  // --------------------------------------------------------------------------
  // q252: KAPLAN–MEIER SURVIVAL ESTIMATOR — the censored-durations analytics
  // staple (retention/churn studies). Subjects = customers; duration = the
  // 30-day-bucketed span between first and last order; event = any final
  // ('F') order observed, else right-censored. The estimator is pure
  // relational algebra over the AGGREGATED time table (≤ ~25 rows at any
  // scale — 100 TB of orders still collapses to one groupBy(custkey) +
  // one groupBy(bucket)): at-risk counts via a cumulative window over prior
  // (deaths + censored), survival via the exp∘cumsum∘ln spelling of the
  // running product — the cumulative frame fixes the summation ORDER (time
  // ascending) identically in both engines, so values match to the bp after
  // rounding. Times with d=0 contribute ln(1)=0, exactly a factor of 1.
  // --------------------------------------------------------------------------
  private def q252(s: SparkSession, d: String): DataFrame = {
    graft.Tables.orders(s, d).createOrReplaceTempView("km_orders")
    s.sql("""
      WITH cust AS (
        SELECT o_custkey,
               CAST(FLOOR(DATEDIFF(CAST(MAX(o_orderdate) AS DATE),
                                   CAST(MIN(o_orderdate) AS DATE)) / 30.0) AS INT) AS t,
               MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev
        FROM km_orders GROUP BY o_custkey),
      agg AS (SELECT t, SUM(ev) AS d, SUM(1 - ev) AS c FROM cust GROUP BY t),
      risk AS (
        SELECT t, d,
               (SELECT COUNT(*) FROM cust) -
                 COALESCE(SUM(d + c) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
        FROM agg),
      km AS (
        -- the terminal bucket can have d = n (everyone remaining dies):
        -- survival is EXACTLY 0 from there on, and ln(0) must never be
        -- evaluated (Spark yields NULL, DuckDB raises) — the absorbing
        -- state is carried by a cumulative flag instead
        SELECT t, n, d,
               MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (
                 ORDER BY t ROWS UNBOUNDED PRECEDING) AS absorbed,
               EXP(SUM(CASE WHEN d >= n THEN 0.0
                            ELSE LN(1.0 - CAST(d AS DOUBLE) / n) END) OVER (
                 ORDER BY t ROWS UNBOUNDED PRECEDING)) AS surv
        FROM risk)
      SELECT t, n, d,
             CAST(ROUND(CASE WHEN absorbed = 1 THEN 0.0 ELSE surv END * 10000)
               AS BIGINT) AS surv_bp
      FROM km ORDER BY t""")
  }

  private val q252Sql =
    """WITH cust AS (
         SELECT o_custkey,
                CAST(FLOOR(DATE_DIFF('day', CAST(MIN(o_orderdate) AS DATE),
                                     CAST(MAX(o_orderdate) AS DATE)) / 30.0) AS INT) AS t,
                MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS ev
         FROM orders GROUP BY o_custkey),
       agg AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
                      CAST(SUM(1 - ev) AS BIGINT) AS c FROM cust GROUP BY t),
       risk AS (
         SELECT t, d,
                (SELECT COUNT(*) FROM cust) -
                  COALESCE(SUM(d + c) OVER (ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n
         FROM agg),
       km AS (
         SELECT t, n, d,
                MAX(CASE WHEN d >= n THEN 1 ELSE 0 END) OVER (
                  ORDER BY t ROWS UNBOUNDED PRECEDING) AS absorbed,
                EXP(SUM(CASE WHEN d >= n THEN 0.0
                             ELSE LN(1.0 - CAST(d AS DOUBLE) / n) END) OVER (
                  ORDER BY t ROWS UNBOUNDED PRECEDING)) AS surv
         FROM risk)
       SELECT t, CAST(n AS BIGINT) AS n, d,
              CAST(ROUND(CASE WHEN absorbed = 1 THEN 0.0 ELSE surv END * 10000)
                AS BIGINT) AS surv_bp
       FROM km ORDER BY t"""

  // --------------------------------------------------------------------------
  // q253: FLESCH READING-EASE SCORING — the classic text-quality heuristic
  // (quality classifiers like q117 routinely take it as a feature). The
  // corpus has no punctuation, so sentence boundaries are PLANTED
  // deterministically (every standalone 'table' ends a sentence) and the
  // declared sentence count = period count floored at 1 — documented
  // simplification, mirrored in the oracle. Syllables = vowel-run count
  // (the standard cheap approximation). The score is one fixed double
  // expression over three integer counts — identical operation order in
  // both engines, emitted ×100 rounded. Pure per-row map work: no shuffle,
  // no window, embarrassingly parallel at any scale.
  // --------------------------------------------------------------------------
  private def q253(s: SparkSession, d: String): DataFrame = {
    graft.Tables.documents(s, d).createOrReplaceTempView("fl_docs")
    s.sql("""
      WITH planted AS (
        SELECT doc_id, regexp_replace(lower(text), '\\btable\\b', 'table.') AS tx
        FROM fl_docs WHERE doc_id % 7 = 0),
      counts AS (
        SELECT doc_id,
               size(filter(split(tx, ' '), x -> x <> '')) AS words,
               GREATEST(1, size(regexp_extract_all(tx, '\\.', 0))) AS sentences,
               size(regexp_extract_all(tx, '[aeiouy]+', 0)) AS syllables
        FROM planted)
      SELECT doc_id, words, sentences, syllables,
             CAST(ROUND((206.835
               - 1.015 * (CAST(words AS DOUBLE) / sentences)
               - 84.6 * (CAST(syllables AS DOUBLE) / words)) * 100) AS BIGINT)
               AS flesch_x100
      FROM counts ORDER BY doc_id""")
  }

  private val q253Sql =
    """WITH planted AS (
         SELECT doc_id, regexp_replace(lower(text), '\btable\b', 'table.', 'g') AS tx
         FROM documents WHERE doc_id % 7 = 0),
       counts AS (
         SELECT doc_id,
                CAST(len(list_filter(str_split(tx, ' '), x -> x <> '')) AS INT) AS words,
                CAST(GREATEST(1, len(regexp_extract_all(tx, '\.'))) AS INT) AS sentences,
                CAST(len(regexp_extract_all(tx, '[aeiouy]+')) AS INT) AS syllables
         FROM planted)
       SELECT doc_id, words, sentences, syllables,
              CAST(ROUND((206.835
                - 1.015 * (CAST(words AS DOUBLE) / sentences)
                - 84.6 * (CAST(syllables AS DOUBLE) / words)) * 100) AS BIGINT)
                AS flesch_x100
       FROM counts ORDER BY doc_id"""

  // --------------------------------------------------------------------------
  // q254: PARTITION EVOLUTION lifecycle under oracle — create partitioned by
  // STATUS, ingest, `ALTER TABLE SET ('graft.partition-by'='prio')`, ingest
  // more (new segments partition-pure by the NEW spec, spec-qualified
  // suffixes), then a COW delete that touches BOTH generations (its rewrite
  // re-routes surviving rows under the current spec — incremental
  // migration). The final content is hash-gated against a pure relational
  // replay grouped by both generations' partition columns — evolution must
  // be invisible to query results. PartitionEvolutionSpec pins the physical
  // side (spec-qualified suffixes, mixed-layout dynamic-overwrite refusal,
  // zone-map pruning on either column, UNSET, validation).
  // --------------------------------------------------------------------------
  private def q254(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("pevo_orders")
    val t = s"m254_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, prio STRING, amt BIGINT)
      USING parquet PARTITIONED BY (st)""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM pevo_orders WHERE o_orderkey % 3 = 0""")
    s.sql(s"ALTER TABLE graft.lake.$t SET TBLPROPERTIES('graft.partition-by'='prio')")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, o_orderpriority,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM pevo_orders WHERE o_orderkey % 3 = 1""")
    s.sql(s"CALL graft.system.delete_where('lake.$t', 'k % 9 = 0')")
    s.sql(s"""
      SELECT 'by_status' AS grp, st AS key, COUNT(*) AS n,
             CAST(SUM(amt) AS BIGINT) AS total_c
      FROM graft.lake.$t GROUP BY st
      UNION ALL
      SELECT 'by_priority', prio, COUNT(*), CAST(SUM(amt) AS BIGINT)
      FROM graft.lake.$t GROUP BY prio
      ORDER BY grp, key""")
  }

  private val q254Sql =
    """WITH live AS (
         SELECT o_orderkey AS k, o_orderstatus AS st, o_orderpriority AS prio,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amt
         FROM orders
         WHERE (o_orderkey % 3 = 0 OR o_orderkey % 3 = 1) AND o_orderkey % 9 <> 0)
       SELECT 'by_status' AS grp, st AS key, COUNT(*) AS n,
              CAST(SUM(amt) AS BIGINT) AS total_c
       FROM live GROUP BY st
       UNION ALL
       SELECT 'by_priority', prio, COUNT(*), CAST(SUM(amt) AS BIGINT)
       FROM live GROUP BY prio
       ORDER BY grp, key"""

  // --------------------------------------------------------------------------
  // q255: RFM CUSTOMER SEGMENTATION — recency/frequency/monetary quintiles,
  // the classic marketing-analytics operator. ONE groupBy(custkey) collapses
  // orders to integer customer metrics (days since last order, order count,
  // monetary CENTS — all exact integers, no fp summation hazard); quintile
  // BOUNDARIES are percentile_disc-style rank SELECTIONS over each metric
  // (actual data values, never interpolation — bit-identical across
  // engines); each customer then buckets by four integer comparisons, and
  // the SERVING path (bucket + re-aggregate) has no global sort. The
  // boundary pass itself ranks the customer aggregate in one task —
  // allowlisted and stated honestly: exact oracle-matchable quantiles need
  // a rank; the 100 TB drop-in is approx_percentile boundaries (mergeable
  // t-digest), same downstream bucketing.
  // --------------------------------------------------------------------------
  private def q255(s: SparkSession, d: String): DataFrame = {
    graft.Tables.orders(s, d).createOrReplaceTempView("rfm_orders")
    def boundaries(metric: String): String =
      s"""SELECT v AS b FROM (
         |  SELECT $metric AS v,
         |         ROW_NUMBER() OVER (ORDER BY $metric, o_custkey) AS rk,
         |         COUNT(*) OVER () AS n
         |  FROM cust)
         |WHERE rk IN ((n * 1) DIV 5, (n * 2) DIV 5, (n * 3) DIV 5, (n * 4) DIV 5)""".stripMargin
    s.sql(s"""
      WITH cust AS (
        SELECT o_custkey,
               DATEDIFF((SELECT CAST(MAX(o_orderdate) AS DATE) FROM rfm_orders),
                        CAST(MAX(o_orderdate) AS DATE)) AS r_days,
               COUNT(*) AS freq,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_c
        FROM rfm_orders GROUP BY o_custkey),
      rb AS (${boundaries("r_days")}),
      fb AS (${boundaries("freq")}),
      mb AS (${boundaries("mon_c")}),
      scored AS (
        SELECT c.o_custkey, c.mon_c,
               1 + (SELECT COUNT(*) FROM rb WHERE c.r_days > rb.b) AS r_q,
               1 + (SELECT COUNT(*) FROM fb WHERE c.freq   > fb.b) AS f_q,
               1 + (SELECT COUNT(*) FROM mb WHERE c.mon_c  > mb.b) AS m_q
        FROM cust c)
      SELECT r_q, f_q, m_q, COUNT(*) AS n_customers,
             CAST(SUM(mon_c) AS BIGINT) AS monetary_c
      FROM scored GROUP BY r_q, f_q, m_q
      ORDER BY r_q, f_q, m_q""")
  }

  private val q255Sql = {
    def boundaries(metric: String): String =
      s"""SELECT v AS b FROM (
         |  SELECT $metric AS v,
         |         ROW_NUMBER() OVER (ORDER BY $metric, o_custkey) AS rk,
         |         COUNT(*) OVER () AS n
         |  FROM cust) t
         |WHERE rk IN ((n * 1) // 5, (n * 2) // 5, (n * 3) // 5, (n * 4) // 5)""".stripMargin
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |         DATE_DIFF('day', CAST(MAX(o_orderdate) AS DATE),
       |                   (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders)) AS r_days,
       |         COUNT(*) AS freq,
       |         CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_c
       |  FROM orders GROUP BY o_custkey),
       |rb AS (${boundaries("r_days")}),
       |fb AS (${boundaries("freq")}),
       |mb AS (${boundaries("mon_c")}),
       |scored AS (
       |  SELECT c.o_custkey, c.mon_c,
       |         1 + (SELECT COUNT(*) FROM rb WHERE c.r_days > rb.b) AS r_q,
       |         1 + (SELECT COUNT(*) FROM fb WHERE c.freq   > fb.b) AS f_q,
       |         1 + (SELECT COUNT(*) FROM mb WHERE c.mon_c  > mb.b) AS m_q
       |  FROM cust c)
       |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
       |       CAST(m_q AS BIGINT) AS m_q, COUNT(*) AS n_customers,
       |       CAST(SUM(mon_c) AS BIGINT) AS monetary_c
       |FROM scored GROUP BY r_q, f_q, m_q
       |ORDER BY r_q, f_q, m_q""".stripMargin
  }

  // --------------------------------------------------------------------------
  // q256: ZERO-COPY PARQUET IMPORT (`CALL graft.system.add_files`) — raw
  // parquet written OUTSIDE the engine (a plain spark.write, the onboarding
  // scenario) is imported by hard-linking the files into a segment: no read,
  // no rewrite, O(#files) metadata, zone maps harvested from footers like
  // any write. The oracle replays the union relationally, so the hash gates
  // that imported bytes serve queries exactly like inserted ones. r19 adds
  // the PARTITIONED leg: a flat per-status export (each file partition-pure)
  // imports onto an identity-partitioned table under
  // `validate_partitions => true` — one check scan proves purity, each tuple
  // lands a correctly-suffixed segment, and partition-scoped reads/DML see
  // the imported layout as native. AddFilesSpec pins the physical side
  // (same-inode sharing, schema / purity / CHECK gates, suffix layout).
  // --------------------------------------------------------------------------
  private def q256(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("addf_orders")
    val t = s"m256_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"CREATE TABLE graft.lake.$t (k BIGINT, st STRING, amt BIGINT) USING parquet")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM addf_orders WHERE o_orderkey % 5 = 0""")
    val raw = java.nio.file.Files.createTempDirectory("graft_q256_raw")
    s.sql("""SELECT o_orderkey AS k, o_orderstatus AS st,
                    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amt
             FROM addf_orders WHERE o_orderkey % 5 = 1""")
      .write.mode("overwrite").parquet(raw.toString)
    s.sql(s"CALL graft.system.add_files('lake.$t', '$raw')")
    // partitioned leg: flat pure-per-file export, validated import
    val tp = s"m256p_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$tp")
    s.sql(s"""CREATE TABLE graft.lake.$tp (k BIGINT, st STRING, amt BIGINT)
              USING parquet PARTITIONED BY (st)""")
    s.sql(s"""INSERT INTO graft.lake.$tp
      SELECT o_orderkey, o_orderstatus, CAST(FLOOR(o_totalprice * 100) AS BIGINT)
      FROM addf_orders WHERE o_orderkey % 5 = 2""")
    val rawP = java.nio.file.Files.createTempDirectory("graft_q256_rawp")
    val statuses = s.sql(
      "SELECT DISTINCT o_orderstatus FROM addf_orders WHERE o_orderkey % 5 = 3")
      .collect().map(_.getString(0)).sorted
    statuses.foreach { st =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_q256_one")
      s.sql(s"""SELECT o_orderkey AS k, o_orderstatus AS st,
                       CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amt
                FROM addf_orders WHERE o_orderkey % 5 = 3 AND o_orderstatus = '$st'""")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listed = java.nio.file.Files.list(tmp)
      try {
        val it = listed.iterator()
        var i = 0
        while (it.hasNext) {
          val p = it.next()
          if (p.getFileName.toString.endsWith(".parquet")) {
            java.nio.file.Files.move(p, rawP.resolve(s"export_${st}_$i.parquet"))
            i += 1
          }
        }
      } finally listed.close()
    }
    s.sql(s"CALL graft.system.add_files('lake.$tp', '$rawP', validate_partitions => true)")
    s.sql(s"""
      SELECT leg, st, n, total_c FROM (
        SELECT 'flat' AS leg, st, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS total_c
        FROM graft.lake.$t GROUP BY st
        UNION ALL
        SELECT 'part' AS leg, st, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS total_c
        FROM graft.lake.$tp GROUP BY st)
      ORDER BY leg, st""")
  }

  private val q256Sql =
    """WITH cents AS (
         SELECT o_orderkey AS k, o_orderstatus AS st,
                CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amt
         FROM orders)
       SELECT leg, st, n, total_c FROM (
         SELECT 'flat' AS leg, st, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS total_c
         FROM cents WHERE k % 5 = 0 OR k % 5 = 1 GROUP BY st
         UNION ALL
         SELECT 'part' AS leg, st, COUNT(*) AS n, CAST(SUM(amt) AS BIGINT) AS total_c
         FROM cents WHERE k % 5 = 2 OR k % 5 = 3 GROUP BY st)
       ORDER BY leg, st"""

  // --------------------------------------------------------------------------
  // q257: JARO–WINKLER similarity as a native codegen Expression
  // (functions/JaroWinkler.scala) — the entity-resolution metric Spark lacks
  // (levenshtein is the only built-in string distance; JW is the
  // length-normalized, prefix-weighted one record-linkage uses). Gated
  // against DuckDB's INDEPENDENT jaro_similarity/jaro_winkler_similarity on
  // three planted comparison classes per part: a deterministic 2-char-swap
  // typo (high similarity, transposition arm), the brand string (low
  // similarity, threshold/no-boost arm), and the reversed name (adversarial
  // arm). Basis-point rounding per the q89 convention. Per-row scalar work
  // inside WholeStageCodegen — the fuzzy-join surface is q135's.
  // --------------------------------------------------------------------------
  private def q257(s: SparkSession, d: String): DataFrame = {
    graft.functions.JaroFunctions.register(s)
    graft.Tables.part(s, d).createOrReplaceTempView("jw_part")
    s.sql("""
      WITH planted AS (
        SELECT p_partkey, p_name, p_brand,
               CONCAT(SUBSTRING(p_name, 1, 1), SUBSTRING(p_name, 3, 1),
                      SUBSTRING(p_name, 2, 1), SUBSTRING(p_name, 4)) AS typo,
               REVERSE(p_name) AS rev
        FROM jw_part WHERE p_partkey % 3 = 0)
      SELECT p_partkey,
             CAST(ROUND(graft_jaro(p_name, typo) * 10000) AS BIGINT) AS jaro_typo_bp,
             CAST(ROUND(graft_jaro_winkler(p_name, typo) * 10000) AS BIGINT) AS jw_typo_bp,
             CAST(ROUND(graft_jaro_winkler(p_name, p_brand) * 10000) AS BIGINT) AS jw_brand_bp,
             CAST(ROUND(graft_jaro_winkler(p_name, rev) * 10000) AS BIGINT) AS jw_rev_bp
      FROM planted ORDER BY p_partkey""")
  }

  private val q257Sql =
    """WITH planted AS (
         SELECT p_partkey, p_name, p_brand,
                CONCAT(SUBSTRING(p_name, 1, 1), SUBSTRING(p_name, 3, 1),
                       SUBSTRING(p_name, 2, 1), SUBSTRING(p_name, 4)) AS typo,
                REVERSE(p_name) AS rev
         FROM part WHERE p_partkey % 3 = 0)
       SELECT p_partkey,
              CAST(ROUND(jaro_similarity(p_name, typo) * 10000) AS BIGINT) AS jaro_typo_bp,
              CAST(ROUND(jaro_winkler_similarity(p_name, typo) * 10000) AS BIGINT) AS jw_typo_bp,
              CAST(ROUND(jaro_winkler_similarity(p_name, p_brand) * 10000) AS BIGINT) AS jw_brand_bp,
              CAST(ROUND(jaro_winkler_similarity(p_name, rev) * 10000) AS BIGINT) AS jw_rev_bp
       FROM planted ORDER BY p_partkey"""

  // --------------------------------------------------------------------------
  // q258: GENERATED COLUMNS + DERIVED PARTITIONING under oracle — the
  // lakehouse recipe for time-partitioned tables: `PARTITIONED BY (day)`
  // with `'graft.generate.day' = 'CAST(ts AS DATE)'`; writers insert NULL
  // and the engine fills/validates (GraftGenerate.scala), with the fill
  // running BEFORE the partition router so segments are partition-pure by
  // the DERIVED value. The per-day aggregate over the table is hash-gated
  // against a replay that derives the day in SQL — generation must be
  // exactly CAST(ts AS DATE), not approximately. GeneratedColumnsSpec pins
  // the contract (fill, explicit-mismatch refusal, streaming, validation,
  // add_files refusal).
  // --------------------------------------------------------------------------
  private def q258(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.events(s, d).createOrReplaceTempView("gen_events")
    val t = s"m258_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t
      (ts TIMESTAMP, user_id BIGINT, value DOUBLE, day DATE) USING parquet
      PARTITIONED BY (day)
      TBLPROPERTIES ('graft.generate.day' = 'CAST(ts AS DATE)')""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT ts, user_id, value, CAST(NULL AS DATE) FROM gen_events
      WHERE event_id % 4 = 0""")
    s.sql(s"""
      SELECT CAST(day AS STRING) AS day, COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS users,
             CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_c
      FROM graft.lake.$t GROUP BY day ORDER BY day""")
  }

  private val q258Sql =
    """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, COUNT(*) AS n,
              COUNT(DISTINCT user_id) AS users,
              CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS value_c
       FROM events WHERE event_id % 4 = 0
       GROUP BY 1 ORDER BY day"""

  // --------------------------------------------------------------------------
  // q259: CSV MALFORMED-ROW MODES — the ingestion-robustness surface
  // (PERMISSIVE / DROPMALFORMED / FAILFAST + columnNameOfCorruptRecord).
  // Fixture: a distributed CSV export of an orders slice plus one extra
  // driver-written part file holding exactly TWO malformed lines (a
  // truncated row and a type-garbage row) — the constant-size corruption a
  // real feed produces. PERMISSIVE must land good+2 rows with the corrupt
  // ones null-filled and captured in the corrupt-record column (counted
  // through the documented cache workaround — Spark refuses corrupt-only
  // projections on an uncached parse); DROPMALFORMED lands exactly the good
  // rows; FAILFAST fails the job (reported as a null-row in the output).
  // The oracle derives every count from the orders table relationally.
  // --------------------------------------------------------------------------
  private def q259(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_q259_csv")
    graft.Tables.orders(s, d).where(col("o_orderkey") % 7 === 0)
      .selectExpr("o_orderkey AS k", "o_orderstatus AS st",
        "CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS amt")
      .write.mode("overwrite").option("header", "false").csv(dir.toString)
    // both planted lines are FULL-WIDTH type garbage: truncated lines are
    // deliberately excluded — whether a short row is malformed depends on
    // which columns the pruned parse requires (observed: kept under a
    // {k}-only parse, dropped under full-width), so they are not a stable
    // cross-mode fixture; unparseable typed fields are malformed in every
    // pruning regime
    java.nio.file.Files.write(dir.resolve("part-malformed.csv"),
      java.util.Arrays.asList("99,X,notanumber", "12,F,alsobad"))
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("st", StringType),
      StructField("amt", LongType), StructField("_bad", StringType)))
    def read(mode: String) = s.read.schema(schema)
      .option("mode", mode).option("columnNameOfCorruptRecord", "_bad")
      .csv(dir.toString)
    val perm = read("PERMISSIVE").cache()
    val permRows = perm.count()
    val permCorrupt = perm.where(col("_bad").isNotNull).count()
    perm.unpersist()
    // two parser fast paths would silently skip the semantics under test:
    // a bare count() takes the CSV count-only path (raw line count, NO
    // parsing), and referencing a prefix of the columns lets COLUMN PRUNING
    // judge malformedness against the pruned schema only (the truncated
    // "99" line parses fine as just `k`). Referencing the LAST data column
    // forces the full-width parse both modes are defined over.
    val dropRows = read("DROPMALFORMED")
      .agg(count(lit(1)).as("c"), sum("amt")).head().getLong(0)
    val failed =
      try { read("FAILFAST").agg(count(lit(1)), sum("amt")).head(); 0L }
      catch { case _: Exception => 1L }
    import s.implicits._
    Seq(
      ("dropmalformed", Some(dropRows), Some(0L)),
      ("failfast", None: Option[Long], None: Option[Long]),
      ("permissive", Some(permRows), Some(permCorrupt)))
      .toDF("mode", "n_rows", "n_corrupt")
      .withColumn("job_failed", when(col("mode") === "failfast", lit(failed)).otherwise(lit(0L)))
      .orderBy("mode")
  }

  private val q259Sql =
    """WITH good AS (SELECT COUNT(*) AS g FROM orders WHERE o_orderkey % 7 = 0)
       SELECT 'dropmalformed' AS mode, g AS n_rows, CAST(0 AS BIGINT) AS n_corrupt,
              CAST(0 AS BIGINT) AS job_failed FROM good
       UNION ALL
       SELECT 'failfast', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), 1
       UNION ALL
       SELECT 'permissive', g + 2, 2, 0 FROM good
       ORDER BY mode"""

  // --------------------------------------------------------------------------
  // q260: SHANNON ENTROPY of the per-day event-type mix — the
  // distribution-drift signal (a day whose type mix collapses has low
  // entropy). Contributions are folded in a FIXED ORDER: per-day per-type
  // counts collect into a type-sorted array and reduce left-to-right (the
  // q42 aggregate ≡ list_reduce convention) — a bare SUM over double
  // contributions would be partition-order-dependent and could flip the
  // rounded output between engines. Emitted in millibits.
  // --------------------------------------------------------------------------
  private def q260(s: SparkSession, d: String): DataFrame = {
    graft.Tables.events(s, d).createOrReplaceTempView("ent_events")
    s.sql("""
      WITH counts AS (
        SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
        FROM ent_events GROUP BY 1, 2),
      perday AS (
        SELECT day,
               COUNT(*) AS n_types,
               SUM(n) AS total,
               array_sort(collect_list(struct(event_type, n))) AS tn
        FROM counts GROUP BY day)
      SELECT CAST(day AS STRING) AS day, n_types,
             CAST(ROUND(aggregate(tn, CAST(0.0 AS DOUBLE),
               (acc, x) -> acc - (CAST(x.n AS DOUBLE) / total)
                 * (LOG2(CAST(x.n AS DOUBLE) / total))) * 1000) AS BIGINT)
               AS entropy_mbit
      FROM perday ORDER BY day""")
  }

  private val q260Sql =
    """WITH counts AS (
         SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2),
       perday AS (
         SELECT day,
                COUNT(*) AS n_types,
                SUM(n) AS total,
                list_sort(list([event_type, CAST(n AS VARCHAR)])) AS tn
         FROM counts GROUP BY day)
       SELECT CAST(day AS VARCHAR) AS day, n_types,
              CAST(ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(tn, x -> CAST(x[2] AS DOUBLE))),
                (acc, v) -> acc - (v / total) * LOG2(v / total)) * 1000) AS BIGINT)
                AS entropy_mbit
       FROM perday ORDER BY day"""

  // --------------------------------------------------------------------------
  // q261: GINI COEFFICIENT of customer spend, per nation — the inequality
  // measure (concentration of spend/tokens/contributions). Rank-based
  // formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending integer CENTS;
  // the rank window partitions BY NATION, so the shape is scalable (no
  // global sort — each nation ranks independently; at 100 TB nations are
  // the natural shards). Σ(i·x) accumulates in DECIMAL(38,0) — BIGINT would
  // overflow around 10⁸ customers (rank × cents × n), and DOUBLE would be
  // partition-order-dependent; both engines sum decimals exactly, and the
  // single final division runs in one fixed expression.
  // --------------------------------------------------------------------------
  private def q261(s: SparkSession, d: String): DataFrame = {
    graft.Tables.orders(s, d).createOrReplaceTempView("gini_orders")
    graft.Tables.customer(s, d).createOrReplaceTempView("gini_cust")
    graft.Tables.nation(s, d).createOrReplaceTempView("gini_nation")
    s.sql("""
      WITH cust AS (
        SELECT c.c_custkey, c.c_nationkey,
               CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_c
        FROM gini_cust c JOIN gini_orders o ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_nationkey),
      ranked AS (
        SELECT c_nationkey, mon_c,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                 ORDER BY mon_c, c_custkey) AS i
        FROM cust),
      pernation AS (
        SELECT c_nationkey, COUNT(*) AS n,
               SUM(CAST(mon_c AS DECIMAL(38, 0))) AS sx,
               SUM(CAST(i AS DECIMAL(38, 0)) * CAST(mon_c AS DECIMAL(38, 0))) AS six
        FROM ranked GROUP BY c_nationkey)
      SELECT n.n_name AS nation, p.n AS n_customers,
             CAST(p.sx AS BIGINT) AS total_c,
             CAST(ROUND((2.0 * CAST(p.six AS DOUBLE)
                          / (CAST(p.n AS DOUBLE) * CAST(p.sx AS DOUBLE))
                         - (CAST(p.n AS DOUBLE) + 1.0) / CAST(p.n AS DOUBLE))
                        * 10000) AS BIGINT) AS gini_bp
      FROM pernation p JOIN gini_nation n ON n.n_nationkey = p.c_nationkey
      ORDER BY nation""")
  }

  private val q261Sql =
    """WITH cust AS (
         SELECT c.c_custkey, c.c_nationkey,
                CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS mon_c
         FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
         GROUP BY c.c_custkey, c.c_nationkey),
       ranked AS (
         SELECT c_nationkey, mon_c,
                ROW_NUMBER() OVER (PARTITION BY c_nationkey
                  ORDER BY mon_c, c_custkey) AS i
         FROM cust),
       pernation AS (
         SELECT c_nationkey, COUNT(*) AS n,
                SUM(CAST(mon_c AS DECIMAL(38, 0))) AS sx,
                SUM(CAST(i AS DECIMAL(38, 0)) * CAST(mon_c AS DECIMAL(38, 0))) AS six
         FROM ranked GROUP BY c_nationkey)
       SELECT n.n_name AS nation, p.n AS n_customers,
              CAST(p.sx AS BIGINT) AS total_c,
              CAST(ROUND((2.0 * CAST(p.six AS DOUBLE)
                           / (CAST(p.n AS DOUBLE) * CAST(p.sx AS DOUBLE))
                          - (CAST(p.n AS DOUBLE) + 1.0) / CAST(p.n AS DOUBLE))
                         * 10000) AS BIGINT) AS gini_bp
       FROM pernation p JOIN nation n ON n.n_nationkey = p.c_nationkey
       ORDER BY nation"""

  // --------------------------------------------------------------------------
  // q262: NDV SKETCH STATS (`graft.stats.ndv` + `t.column_stats`) — per-column
  // DISTINCT-COUNT estimates served with ZERO file IO: each commit harvests a
  // mergeable HLL per column (Spark's own hll_sketch_agg, lgK=12), and the
  // metadata table UNIONS the current snapshot's sketches — the operation
  // per-segment exact counts cannot do (distincts don't sum; the fixture's
  // two inserts overlap on purpose). rows/nulls are EXACT zone-map sums and
  // hash-gate against the oracle; the estimate's accuracy is itself an
  // output column, computed against an exact COUNT(DISTINCT) — so the 2%
  // claim is oracle-gated, not asserted. NdvStatsSpec pins the physical side
  // (LocalTableScan, coverage honesty, compaction re-harvest).
  // --------------------------------------------------------------------------
  private def q262(s: SparkSession, d: String): DataFrame = {
    LakeQueries.ensureCatalog(s)
    graft.Tables.orders(s, d).createOrReplaceTempView("ndv_orders")
    val t = s"m262_${Integer.toHexString(d.hashCode)}"
    s.sql(s"DROP TABLE IF EXISTS graft.lake.$t")
    s.sql(s"""CREATE TABLE graft.lake.$t (k BIGINT, st STRING, cust BIGINT)
      USING parquet TBLPROPERTIES ('graft.stats.ndv' = '*')""")
    // two OVERLAPPING halves: k%2=0 then k%3=0 (k%6=0 lands twice) — the
    // union must not double-count the overlap
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, o_custkey FROM ndv_orders WHERE o_orderkey % 2 = 0""")
    s.sql(s"""INSERT INTO graft.lake.$t
      SELECT o_orderkey, o_orderstatus, o_custkey FROM ndv_orders WHERE o_orderkey % 3 = 0""")
    s.sql(s"SELECT * FROM graft.lake.$t.column_stats").createOrReplaceTempView(s"${t}_cs")
    s.sql(s"""
      WITH exact AS (
        SELECT 'k' AS column, COUNT(DISTINCT k) AS x FROM graft.lake.$t
        UNION ALL SELECT 'st', COUNT(DISTINCT st) FROM graft.lake.$t
        UNION ALL SELECT 'cust', COUNT(DISTINCT cust) FROM graft.lake.$t)
      SELECT c.column, c.rows, c.nulls,
             CAST(ABS(c.ndv_estimate - e.x) <= CAST(0.02 * e.x AS BIGINT) + 1 AS INT)
               AS ndv_within_2pct
      FROM ${t}_cs c JOIN exact e ON c.column = e.column
      ORDER BY c.column""")
  }

  private val q262Sql =
    """WITH u2 AS (
         SELECT o_orderkey AS k FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL
         SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0)
       SELECT c."column", (SELECT COUNT(*) FROM u2) AS rows,
              CAST(0 AS BIGINT) AS nulls, 1 AS ndv_within_2pct
       FROM (SELECT 'cust' AS "column" UNION ALL SELECT 'k' UNION ALL SELECT 'st') c
       ORDER BY c."column""""

  // --------------------------------------------------------------------------
  // q263: CHI-SQUARE TEST OF INDEPENDENCE + CRAMÉR'S V between two
  // categorical columns (returnflag × linestatus) — the categorical sibling
  // of q89's numeric correlation family. All inputs are exact integer
  // counts; the χ² statistic sums per-cell (O−E)²/E contributions in a
  // FIXED (rf, ls)-sorted fold (the q260/q42 convention — a bare double SUM
  // over cells is partition-order-dependent), and Cramér's V normalizes by
  // min(r−1, c−1). Contingency table is one groupBy; marginals broadcast.
  // --------------------------------------------------------------------------
  private def q263(s: SparkSession, d: String): DataFrame = {
    graft.Tables.lineitem(s, d).createOrReplaceTempView("chi_li")
    s.sql("""
      WITH cells AS (
        SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS n
        FROM chi_li GROUP BY 1, 2),
      rm AS (SELECT rf, SUM(n) AS nr FROM cells GROUP BY rf),
      cm AS (SELECT ls, SUM(n) AS nc FROM cells GROUP BY ls),
      tot AS (SELECT SUM(n) AS nt, COUNT(DISTINCT rf) AS r, COUNT(DISTINCT ls) AS c
              FROM cells),
      contrib AS (
        SELECT cells.rf, cells.ls,
               POW(CAST(cells.n AS DOUBLE)
                   - CAST(rm.nr AS DOUBLE) * CAST(cm.nc AS DOUBLE) / CAST(tot.nt AS DOUBLE), 2)
                 / (CAST(rm.nr AS DOUBLE) * CAST(cm.nc AS DOUBLE) / CAST(tot.nt AS DOUBLE))
                 AS x2
        FROM cells JOIN rm ON cells.rf = rm.rf
                   JOIN cm ON cells.ls = cm.ls
                   CROSS JOIN tot),
      folded AS (
        SELECT aggregate(
                 transform(array_sort(collect_list(struct(rf, ls, x2))), p -> p.x2),
                 CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS chi2
        FROM contrib)
      SELECT tot.nt AS n, tot.r, tot.c,
             CAST(ROUND(folded.chi2 * 100) AS BIGINT) AS chi2_x100,
             CAST(ROUND(SQRT(folded.chi2 / (CAST(tot.nt AS DOUBLE)
               * CAST(LEAST(tot.r - 1, tot.c - 1) AS DOUBLE))) * 10000) AS BIGINT)
               AS cramers_v_bp
      FROM folded CROSS JOIN tot
      ORDER BY n""")
  }

  private val q263Sql =
    """WITH cells AS (
         SELECT l_returnflag AS rf, l_linestatus AS ls, COUNT(*) AS n
         FROM lineitem GROUP BY 1, 2),
       rm AS (SELECT rf, SUM(n) AS nr FROM cells GROUP BY rf),
       cm AS (SELECT ls, SUM(n) AS nc FROM cells GROUP BY ls),
       tot AS (SELECT SUM(n) AS nt, COUNT(DISTINCT rf) AS r, COUNT(DISTINCT ls) AS c
               FROM cells),
       contrib AS (
         SELECT cells.rf, cells.ls,
                POW(CAST(cells.n AS DOUBLE)
                    - CAST(rm.nr AS DOUBLE) * CAST(cm.nc AS DOUBLE) / CAST(tot.nt AS DOUBLE), 2)
                  / (CAST(rm.nr AS DOUBLE) * CAST(cm.nc AS DOUBLE) / CAST(tot.nt AS DOUBLE))
                  AS x2
         FROM cells JOIN rm ON cells.rf = rm.rf
                    JOIN cm ON cells.ls = cm.ls
                    CROSS JOIN tot),
       folded AS (
         SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(list_sort(list([rf, ls, CAST(x2 AS VARCHAR)])),
                                 p -> CAST(p[3] AS DOUBLE))),
                  (acc, v) -> acc + v) AS chi2
         FROM contrib)
       SELECT CAST(tot.nt AS BIGINT) AS n, CAST(tot.r AS BIGINT) AS r,
              CAST(tot.c AS BIGINT) AS c,
              CAST(ROUND(folded.chi2 * 100) AS BIGINT) AS chi2_x100,
              CAST(ROUND(SQRT(folded.chi2 / (CAST(tot.nt AS DOUBLE)
                * CAST(LEAST(tot.r - 1, tot.c - 1) AS DOUBLE))) * 10000) AS BIGINT)
                AS cramers_v_bp
       FROM folded CROSS JOIN tot
       ORDER BY n"""

  // --------------------------------------------------------------------------
  // q264: TWO-PROPORTION Z-TEST — the A/B experiment readout: users split
  // into deterministic arms (user_id parity — the hash-split q84 shape),
  // conversion = any HIGH-VALUE purchase (value > 120 — a plain 'any
  // purchase' converts ~every synthetic user, making the pooled variance 0
  // and the statistic undefined); the pooled-variance z statistic is
  // one fixed double expression over four exact integer counts, identical
  // operation order in both engines, emitted ×1000. Everything before the
  // formula is ONE user-level aggregate + one 2-group rollup — the
  // experimentation readout at 100 TB is exactly this shape.
  // --------------------------------------------------------------------------
  private def q264(s: SparkSession, d: String): DataFrame = {
    graft.Tables.events(s, d).createOrReplaceTempView("ab_events")
    s.sql("""
      WITH users AS (
        SELECT user_id,
               CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' AND value > 120.0 THEN 1 ELSE 0 END) AS conv
        FROM ab_events GROUP BY user_id),
      g AS (SELECT arm, COUNT(*) AS n, SUM(conv) AS c FROM users GROUP BY arm),
      w AS (SELECT
        MAX(CASE WHEN arm = 'A' THEN n END) AS na,
        MAX(CASE WHEN arm = 'A' THEN c END) AS ca,
        MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
        MAX(CASE WHEN arm = 'B' THEN c END) AS cb
        FROM g)
      SELECT na, ca, nb, cb,
             CAST(ROUND(CAST(ca AS DOUBLE) / na * 10000) AS BIGINT) AS rate_a_bp,
             CAST(ROUND(CAST(cb AS DOUBLE) / nb * 10000) AS BIGINT) AS rate_b_bp,
             CAST(ROUND(
               (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
               / SQRT((CAST(ca + cb AS DOUBLE) / (na + nb))
                      * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                      * (1.0 / na + 1.0 / nb)) * 1000) AS BIGINT) AS z_x1000
      FROM w ORDER BY na""")
  }

  private val q264Sql =
    """WITH users AS (
         SELECT user_id,
                CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm,
                MAX(CASE WHEN event_type = 'purchase' AND value > 120.0 THEN 1 ELSE 0 END) AS conv
         FROM events GROUP BY user_id),
       g AS (SELECT arm, COUNT(*) AS n, CAST(SUM(conv) AS BIGINT) AS c FROM users GROUP BY arm),
       w AS (SELECT
         MAX(CASE WHEN arm = 'A' THEN n END) AS na,
         MAX(CASE WHEN arm = 'A' THEN c END) AS ca,
         MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
         MAX(CASE WHEN arm = 'B' THEN c END) AS cb
         FROM g)
       SELECT na, ca, nb, cb,
              CAST(ROUND(CAST(ca AS DOUBLE) / na * 10000) AS BIGINT) AS rate_a_bp,
              CAST(ROUND(CAST(cb AS DOUBLE) / nb * 10000) AS BIGINT) AS rate_b_bp,
              CAST(ROUND(
                (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
                / SQRT((CAST(ca + cb AS DOUBLE) / (na + nb))
                       * (1.0 - CAST(ca + cb AS DOUBLE) / (na + nb))
                       * (1.0 / na + 1.0 / nb)) * 1000) AS BIGINT) AS z_x1000
       FROM w ORDER BY na"""

  val defs: Seq[QDef] = Seq(
    QDef("q243_scd2_from_cdc", q243, Some(q243Sql)),
    QDef("q244_bloom_index_lookup", q244, Some(q244Sql)),
    QDef("q245_autocorrelation", q245, Some(q245Sql)),
    QDef("q246_benford_profile", q246, Some(q246Sql)),
    QDef("q247_rolling_distinct_users", q247, Some(q247Sql)),
    QDef("q248_unicode_normalize", q248, Some(q248Sql)),
    QDef("q249_bpe_merge_training", q249, Some(q249Sql)),
    QDef("q250_product_quantization", q250, Some(q250Sql)),
    QDef("q251_lake_tags", q251, Some(q251Sql)),
    QDef("q252_kaplan_meier", q252, Some(q252Sql)),
    QDef("q253_flesch_readability", q253, Some(q253Sql)),
    QDef("q254_partition_evolution", q254, Some(q254Sql)),
    QDef("q255_rfm_segmentation", q255, Some(q255Sql)),
    QDef("q256_lake_add_files", q256, Some(q256Sql)),
    QDef("q257_jaro_winkler", q257, Some(q257Sql)),
    QDef("q258_generated_columns", q258, Some(q258Sql)),
    QDef("q259_csv_malformed_modes", q259, Some(q259Sql)),
    QDef("q260_shannon_entropy", q260, Some(q260Sql)),
    QDef("q261_gini_coefficient", q261, Some(q261Sql)),
    QDef("q262_ndv_column_stats", q262, Some(q262Sql)),
    QDef("q263_chi_square_independence", q263, Some(q263Sql)),
    QDef("q264_ab_test_ztest", q264, Some(q264Sql)),
    QDef("q271_bpe_encode", q271, Some(q271Sql)))
}
