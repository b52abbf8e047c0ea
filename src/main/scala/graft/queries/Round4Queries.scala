package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 surface: batch sessionization, deterministic weighted sampling,
  * vocabulary coverage, URL profiling, PII redaction, range-partitioned write
  * layout, typed mapGroups, and the stack/inline generator family.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (ORDER BY unique
  * keys, floats as ×100/×10000 scaled integers, portable md5-derived hashes).
  */
object Round4Queries {

  /** DuckDB-side CTE matching Tables.events' µs view of the ns ts column. */
  private val evCte =
    "WITH ev AS (SELECT event_id, ts, user_id, event_type, value FROM events)"

  /** Scratch path unique per (query, SF, JVM): the pid suffix keeps a spec run
    * racing Verify — or two Verify invocations at the same SF — from sharing a
    * path (one JVM's Overwrite would delete files under the other's scan). */
  private def tmp(name: String, sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_r4_${name}_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}" +
        s"_p${ProcessHandle.current().pid()}").getAbsolutePath

  /** Per-language keep thresholds out of 2^56 (en 25%, fr 60%, de 70%, es 80%,
    * zh 90%) — ONE definition shared by q97 and q112 on both the Spark and the
    * oracle side, so a rate retune cannot silently diverge the coupled queries.
    * Valid in both engines' SQL dialects. */
  private val langThresholdCase =
    """CASE lang WHEN 'en' THEN 18014398509481984
       WHEN 'fr' THEN 43234556422756762 WHEN 'de' THEN 50440315826549555
       WHEN 'es' THEN 57646075230342349 ELSE 64851834634135142 END"""

  // --------------------------------------------------------------------------
  // q96: batch sessionization (gaps-and-islands) — the batch twin of q29's
  // session_window, built from primitives the way warehouse pipelines spell it:
  // lag() flags a >30 min gap, a running sum of flags numbers the sessions,
  // then one hash agg per (user, session). Scale shape: both windows share ONE
  // partitioning (user_id) and ONE ordering (ts, event_id), so Spark plans a
  // single exchange + single sort for the whole chain; the final agg is keyed
  // on a superset of the window key and needs no further shuffle.
  // --------------------------------------------------------------------------
  private def q96(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    T.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("gap_s",
        unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w)))
      .withColumn("new_s",
        when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("span_s"),
        expr("CAST(ROUND(SUM(value) * 100) AS BIGINT)").as("value_x100"))
      .orderBy(col("user_id"), col("session_id"))
  }

  private val q96Sql =
    s"""$evCte,
       flagged AS (
         SELECT user_id, event_id, ts, value,
           CASE WHEN LAG(ts, 1) OVER w IS NULL
                  OR DATE_DIFF('second', LAG(ts, 1) OVER w, ts) > 1800
                THEN 1 ELSE 0 END AS new_s
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, ts, value,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_id
         FROM flagged)
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         DATE_DIFF('second', MIN(ts), MAX(ts)) AS span_s,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_x100
       FROM sess GROUP BY user_id, session_id
       ORDER BY user_id, session_id"""

  // --------------------------------------------------------------------------
  // q97: quality/language-weighted DETERMINISTIC sampling — the data-mixing op
  // (downsample the dominant language, keep most of the rest). Instead of
  // rand() (irreproducible across runs/cluster sizes) the keep decision hashes
  // the CONTENT: u = first 56 bits of md5(text), keep iff u < per-language
  // threshold. Reproducible on any engine, any partitioning — the reason real
  // pipelines sample by hash, and exactly oracle-checkable (thresholds are
  // exact integers, not float rates). Linear scan + hash agg, no shuffle
  // beyond the final tiny agg.
  // --------------------------------------------------------------------------
  private def q97(s: SparkSession, d: String): DataFrame = {
    val thr = langThresholdCase
    T.documents(s, d)
      .withColumn("u56",
        expr("CAST(conv(substring(md5(text), 1, 14), 16, 10) AS BIGINT)"))
      .withColumn("keep", expr(s"u56 < $thr"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("lang"))
  }

  private val q97Sql =
    s"""WITH u AS (
         SELECT lang, n_chars,
           CAST(('0x' || substring(md5(text), 1, 14)) AS BIGINT) <
             $langThresholdCase AS keep
         FROM documents)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
       FROM u GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------------------
  // q98: vocabulary coverage curve (Zipf profile) — for tokenizer/vocab design:
  // rank tokens by corpus frequency and compute each rank's CUMULATIVE share of
  // all token occurrences, in basis points via exact integer arithmetic
  // (cum*10000 DIV total — no float summation anywhere). The explode+count agg
  // is the linear corpus pass; the ranking window runs over the VOCABULARY
  // (orders of magnitude smaller than the corpus), where a single-partition
  // window is the correct shape even at 100 TB corpus scale.
  // --------------------------------------------------------------------------
  private def q98(s: SparkSession, d: String): DataFrame = {
    val counts = T.documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").desc, col("token"))
    counts
      .withColumn("rank", row_number().over(w))
      .withColumn("cum",
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt")).over(
        Window.orderBy().rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("rank"), col("token"), col("cnt"),
        expr("CAST(cum * 10000 DIV total AS BIGINT)").as("cum_share_bp"))
      .orderBy(col("rank"))
  }

  private val q98Sql =
    """WITH counts AS (
         SELECT t.token, CAST(COUNT(*) AS BIGINT) AS cnt
         FROM documents, UNNEST(string_split(trim(text), ' ')) AS t(token)
         WHERE length(t.token) > 0
         GROUP BY t.token),
       ranked AS (
         SELECT token, cnt,
           ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank,
           SUM(cnt) OVER (ORDER BY cnt DESC, token ROWS UNBOUNDED PRECEDING) AS cum,
           SUM(cnt) OVER () AS total
         FROM counts)
       SELECT rank, token, cnt, CAST(cum * 10000 // total AS BIGINT) AS cum_share_bp
       FROM ranked ORDER BY rank"""

  // --------------------------------------------------------------------------
  // q99: URL parsing + per-domain profiling — the provenance-analysis op every
  // web-corpus pipeline runs (docs per domain, source diversity, crawl-page
  // stats). URLs are derived deterministically from the documents table so the
  // parse surface (HOST / PATH / QUERY key) is exercised against a DuckDB twin
  // that re-derives the same fields with regexes. Spark side uses the native
  // parse_url expression (codegen'd, no UDF). Narrow projection + one hash agg.
  // --------------------------------------------------------------------------
  private def q99(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("url", concat(
        lit("https://"), col("lang"), lit(".example.org/"), col("source"),
        lit("/"), col("doc_id").cast("string"),
        lit("?ref="), col("source"), lit("&page="), (col("doc_id") % 7).cast("string")))
      .select(
        expr("parse_url(url, 'HOST')").as("host"),
        element_at(split(expr("parse_url(url, 'PATH')"), "/"), 2).as("src_seg"),
        expr("CAST(parse_url(url, 'QUERY', 'page') AS BIGINT)").as("page"))
      .groupBy(col("host"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("src_seg")).as("n_sources"),
        sum(col("page")).as("pages_sum"))
      .orderBy(col("host"))

  private val q99Sql =
    """WITH u AS (
         SELECT 'https://' || lang || '.example.org/' || source || '/' || doc_id
                || '?ref=' || source || '&page=' || (doc_id % 7) AS url
         FROM documents),
       parsed AS (
         SELECT regexp_extract(url, '^https://([^/]+)', 1) AS host,
           regexp_extract(url, '^https://[^/]+/([^/]+)/', 1) AS src_seg,
           CAST(regexp_extract(url, 'page=([0-9]+)', 1) AS BIGINT) AS page
         FROM u)
       SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT src_seg) AS BIGINT) AS n_sources,
         CAST(SUM(page) AS BIGINT) AS pages_sum
       FROM parsed GROUP BY host ORDER BY host"""

  // --------------------------------------------------------------------------
  // q100: PII redaction — scrub email addresses and report per-language scrub
  // stats (docs touched, characters removed), the compliance pass before
  // training-data release. Emails are planted on even doc_ids only, so BOTH
  // paths (redacted and untouched) are exercised rather than vacuously
  // matching everything. The pattern avoids lookarounds/backrefs so Java
  // regex (Spark) and RE2 (DuckDB) agree. Pure per-row projection + hash agg.
  // --------------------------------------------------------------------------
  private def q100(s: SparkSession, d: String): DataFrame = {
    val emailRe = "[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    T.documents(s, d)
      .withColumn("base", concat(col("text"),
        when(col("doc_id") % 2 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail-"), col("lang"), lit(".org asap")))
          .otherwise(lit(""))))
      .withColumn("red", regexp_replace(col("base"), emailRe, "<EMAIL>"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("red") =!= col("base"), 1L).otherwise(0L)).as("n_redacted"),
        sum(length(col("base")) - length(col("red"))).cast("long").as("chars_removed"))
      .orderBy(col("lang"))
  }

  private val q100Sql =
    """WITH base AS (
         SELECT lang, text ||
           CASE WHEN doc_id % 2 = 0
             THEN ' contact user' || doc_id || '@mail-' || lang || '.org asap'
             ELSE '' END AS base
         FROM documents),
       red AS (
         SELECT lang, base,
           regexp_replace(base, '[A-Za-z0-9._%-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                          '<EMAIL>', 'g') AS red
         FROM base)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN red <> base THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted,
         CAST(SUM(length(base) - length(red)) AS BIGINT) AS chars_removed
       FROM red GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------------------
  // q101: range-partitioned, sorted write layout — the ordered-layout
  // counterpart of q69/q88's hash bucketing: repartitionByRange clusters rows
  // by sort key into non-overlapping key ranges per file, sortWithinPartitions
  // orders them inside each file, so parquet min/max zone maps prune
  // time-range scans to a file subset (THE layout for time-series at 100 TB —
  // a date-range query touches only the files whose range intersects).
  // Correctness gate: read back, range-filter, aggregate — must equal the same
  // aggregate over the original table.
  // --------------------------------------------------------------------------
  private def q101(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("orders_range", d)
    T.orders(s, d)
      .repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
    s.read.parquet(dir)
      .filter(col("o_orderdate") >= lit("1995-06-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        expr("CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT)").as("total_x100"))
      .orderBy(col("o_orderstatus"))
  }

  private val q101Sql =
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS total_x100
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1995-06-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // --------------------------------------------------------------------------
  // q102: typed groupByKey + mapGroups — the one-sided typed-API counterpart of
  // q87's cogroup: arbitrary per-key Scala logic over all of a key's rows in
  // one call (here: sort a user's events by time and derive a profile whose
  // first/last fields a plain agg would need min_by/max_by for). The group
  // iterator is materialized per key only — state is bounded by the largest
  // single key, the same contract as any mapGroups at scale. Sum is computed
  // in deterministic sorted order and emitted ×100-scaled.
  // --------------------------------------------------------------------------
  private def q102(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    T.events(s, d)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)]
      .groupByKey(_._2)
      .mapGroups { (uid, it) =>
        val evs = it.toArray.sortBy(e => (e._3, e._1))
        val sum = evs.iterator.map(_._5).sum
        (uid, evs.length.toLong, evs.head._4, evs.last._4, math.round(sum * 100))
      }
      .toDF("user_id", "n", "first_type", "last_type", "value_x100")
      .orderBy(col("user_id"))
  }

  private val q102Sql =
    s"""$evCte,
       o AS (
         SELECT user_id, event_type, value,
           ROW_NUMBER() OVER w AS rn,
           COUNT(*) OVER (PARTITION BY user_id) AS n
         FROM ev
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN rn = 1 THEN event_type END) AS first_type,
         MIN(CASE WHEN rn = n THEN event_type END) AS last_type,
         CAST(ROUND(SUM(value) * 100) AS BIGINT) AS value_x100
       FROM o GROUP BY user_id ORDER BY user_id"""

  // --------------------------------------------------------------------------
  // q103: stack + inline generators — the remaining members of the generator
  // family (explode q25, posexplode q73, posexplode_outer q86): stack() turns
  // N (label, value) pairs into N rows without building an intermediate array;
  // inline() explodes an array of structs into columns directly. Both are
  // Generate-planned (no shuffle, no UDF). The union'd long form is checked
  // against the portable UNION ALL spelling.
  // --------------------------------------------------------------------------
  private def q103(s: SparkSession, d: String): DataFrame = {
    val base = T.orders(s, d).filter(col("o_orderkey") < 200)
    val stacked = base.selectExpr("o_orderkey",
      """stack(2,
           'total_x100', CAST(ROUND(o_totalprice * 100) AS BIGINT),
           'custkey',    CAST(o_custkey AS BIGINT)) AS (metric, v)""")
    val inlined = base.selectExpr("o_orderkey",
      """inline(array(named_struct(
           'metric', 'prio_len',
           'v', CAST(length(o_orderpriority) AS BIGINT))))""")
    stacked.union(inlined).orderBy(col("o_orderkey"), col("metric"))
  }

  private val q103Sql =
    """SELECT o_orderkey, metric, v FROM (
         SELECT o_orderkey, 'total_x100' AS metric,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v FROM orders
         UNION ALL
         SELECT o_orderkey, 'custkey', CAST(o_custkey AS BIGINT) FROM orders
         UNION ALL
         SELECT o_orderkey, 'prio_len', CAST(length(o_orderpriority) AS BIGINT)
         FROM orders)
       WHERE o_orderkey < 200
       ORDER BY o_orderkey, metric"""

  // --------------------------------------------------------------------------
  // q104: embedding int8 quantization — the storage/serving compression op
  // (float32 → int8 with a per-vector scale, 4× smaller). Entirely per-row
  // higher-order functions (no shuffle, no UDF): maxabs via an order-
  // independent max fold, each element CAST to DOUBLE before the *127/maxabs
  // arithmetic so Spark and DuckDB run the identical IEEE ops, then ROUND
  // before the integer cast (Spark truncates double→int, DuckDB rounds — the
  // ROUND-first idiom sidesteps that divergence). Integer sums of the
  // quantized values are order-independent, hence exactly comparable.
  // --------------------------------------------------------------------------
  private def q104(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .filter(col("vec_id") < 300)
      .withColumn("maxabs", expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
      .withColumn("qs", expr(
        """CASE WHEN maxabs = 0.0 THEN transform(embedding, x -> CAST(0 AS BIGINT))
           ELSE transform(embedding,
             x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT)) END"""))
      .select(
        col("vec_id"),
        expr("CAST(ROUND(maxabs * 1000000) AS BIGINT)").as("scale_x1e6"),
        expr("aggregate(qs, CAST(0 AS BIGINT), (a, b) -> a + b)").as("q_sum"),
        expr("aggregate(qs, CAST(0 AS BIGINT), (a, b) -> a + b * b)").as("q_sumsq"))
      .orderBy(col("vec_id"))

  private val q104Sql =
    """WITH m AS (
         SELECT vec_id, embedding,
           COALESCE(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
                    0.0) AS maxabs
         FROM embeddings WHERE vec_id < 300),
       q AS (
         SELECT vec_id, maxabs,
           CASE WHEN maxabs = 0.0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
             ELSE list_transform(embedding,
               x -> CAST(ROUND(CAST(x AS DOUBLE) * 127.0 / maxabs) AS BIGINT)) END AS qs
         FROM m)
       SELECT vec_id,
         CAST(ROUND(maxabs * 1000000) AS BIGINT) AS scale_x1e6,
         CAST(list_aggregate(qs, 'sum') AS BIGINT) AS q_sum,
         CAST(list_aggregate(list_transform(qs, x -> x * x), 'sum') AS BIGINT) AS q_sumsq
       FROM q ORDER BY vec_id"""

  // --------------------------------------------------------------------------
  // q106: LATERAL correlated subquery join — the per-row-subquery surface
  // (top-N related rows per outer row, spelled the way users write it). Catalyst
  // decorrelates the LATERAL LIMIT into a ranked window join — same physical
  // shape as q17's top-k per group, but reached from SQL. Customers with no
  // qualifying orders drop (inner lateral), exercised by the o_totalprice
  // floor.
  // --------------------------------------------------------------------------
  private def q106(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).createOrReplaceTempView("v_cust_lat")
    T.orders(s, d).createOrReplaceTempView("v_ord_lat")
    s.sql(
      """SELECT c.c_custkey, t.o_orderkey,
           CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS price_x100
         FROM v_cust_lat c,
         LATERAL (SELECT o_orderkey, o_totalprice FROM v_ord_lat o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY c.c_custkey, t.o_orderkey""")
  }

  private val q106Sql =
    """SELECT c.c_custkey, t.o_orderkey,
       CAST(ROUND(t.o_totalprice * 100) AS BIGINT) AS price_x100
       FROM customer c,
       LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
                ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
       ORDER BY c.c_custkey, t.o_orderkey"""

  // --------------------------------------------------------------------------
  // q107: paragraph-level dedup + reassembly — the sub-document dedup real
  // corpus pipelines run between exact-dup (q34) and near-dup (q36/q81): chunk
  // each document, drop every chunk seen earlier ANYWHERE in the corpus (first
  // occurrence by (doc_id, position) wins), and reassemble what remains.
  // Chunks here are 4-token windows (the synthetic corpus has no paragraph
  // breaks; the small vocabulary makes cross-document chunk collisions real, so
  // both the kept and the deduped paths are exercised, not vacuous). Shapes:
  // one explode pass, chunk assembly as a keyed agg, global first-occurrence as
  // min(struct(doc_id, grp)) GROUPED BY chunk content — an aggregate, not a
  // window, deliberately: partial aggregation collapses a hot boilerplate chunk
  // map-side, where a row_number window over the same key would sort the whole
  // hot partition on one reducer. Reassembly is a second keyed agg; md5 over
  // the rebuilt text gives a compact oracle-comparable fingerprint.
  // --------------------------------------------------------------------------
  private def q107(s: SparkSession, d: String): DataFrame = {
    val toks = T.documents(s, d)
      .select(col("doc_id"),
        posexplode(split(trim(col("text")), " ")).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
    val chunks = toks
      .withColumn("grp", expr("CAST(pos DIV 4 AS BIGINT)"))
      .groupBy(col("doc_id"), col("grp"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok), ' ')")
        .as("chunk"))
    val kept = chunks.groupBy(col("chunk"))
      .agg(min(struct(col("doc_id"), col("grp"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.grp").as("grp"), col("chunk"))
    val totals = chunks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        expr("md5(array_join(transform(array_sort(collect_list(struct(grp, chunk))), x -> x.chunk), ' '))")
          .as("kept_md5"))
    totals.join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_md5"), lit("")).as("kept_md5"))
      .orderBy(col("doc_id"))
  }

  private val q107Sql =
    """WITH raw AS (
         SELECT doc_id, string_split(trim(text), ' ') AS ts FROM documents),
       toks AS (
         SELECT * FROM (
           SELECT doc_id,
             unnest(generate_series(1, len(ts))) - 1 AS pos,
             unnest(ts) AS tok
           FROM raw)
         WHERE length(tok) > 0),
       chunks AS (
         SELECT doc_id, pos // 4 AS grp, string_agg(tok, ' ' ORDER BY pos) AS chunk
         FROM toks GROUP BY doc_id, pos // 4),
       kept AS (
         SELECT doc_id, grp, chunk,
           ROW_NUMBER() OVER (PARTITION BY chunk ORDER BY doc_id, grp) AS rn
         FROM chunks),
       tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM chunks GROUP BY doc_id),
       re AS (
         SELECT doc_id, COUNT(*) AS n_kept,
           md5(string_agg(chunk, ' ' ORDER BY grp)) AS kept_md5
         FROM kept WHERE rn = 1 GROUP BY doc_id)
       SELECT t.doc_id, CAST(t.n_chunks AS BIGINT) AS n_chunks,
         CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
         COALESCE(r.kept_md5, '') AS kept_md5
       FROM tot t LEFT JOIN re r ON t.doc_id = r.doc_id
       ORDER BY t.doc_id"""

  // --------------------------------------------------------------------------
  // q108: dynamic partition overwrite — the idempotent backfill op: rewrite ONE
  // partition of a date-partitioned table without touching its siblings
  // (partitionOverwriteMode=dynamic replaces exactly the partitions the write
  // produces; static mode would truncate the whole table). The gate proves the
  // non-overwritten partitions survive byte-identically and the overwritten one
  // carries the corrected rows: per-type counts + value checksum after a
  // backfill that re-derives the 'click' partition with a +1000000 value shift.
  // --------------------------------------------------------------------------
  private def q108(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("events_dynpart", d)
    val ev = T.events(s, d).select(
      col("event_id"), col("user_id"), col("event_type"),
      expr("CAST(ROUND(value * 100) AS BIGINT)").as("value_x100"))
    ev.write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(dir)
    val saved = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    try {
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // backfill ONLY the click partition with corrected values
      ev.filter(col("event_type") === "click")
        .withColumn("value_x100", col("value_x100") + 1000000L)
        .write.mode(SaveMode.Overwrite).partitionBy("event_type").parquet(dir)
    } finally saved.fold(s.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
      s.conf.set("spark.sql.sources.partitionOverwriteMode", _))
    s.read.parquet(dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value_x100")).as("sum_x100"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  private val q108Sql =
    s"""$evCte
       SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)
                  + CASE WHEN event_type = 'click' THEN 1000000 ELSE 0 END)
              AS BIGINT) AS sum_x100,
         MIN(event_id) AS min_id,
         MAX(event_id) AS max_id
       FROM ev GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q109: n-gram index via the NATIVE GENERATOR graft_ngrams — the custom-UDTF
  // rung of the function ladder (scalar Expression q42, optimizer rule q68,
  // generator here): (pos, ngram) rows stream straight out of the Generate
  // operator with no per-row intermediate array allocation, then one hash agg
  // builds the frequent-trigram index (occurrences, document frequency, first
  // occurrence site). The DuckDB twin derives identical n-grams relationally.
  // --------------------------------------------------------------------------
  private def q109(s: SparkSession, d: String): DataFrame = {
    graft.functions.GeneratorFunctions.register(s)
    T.documents(s, d).filter(col("doc_id") < 200)
      .createOrReplaceTempView("v_docs_ng")
    s.sql(
      """SELECT ngram, COUNT(*) AS n_occ, COUNT(DISTINCT doc_id) AS df,
           MIN(doc_id * 100000 + pos) AS first_site
         FROM v_docs_ng LATERAL VIEW graft_ngrams(trim(text), 3) t AS pos, ngram
         GROUP BY ngram
         HAVING COUNT(*) >= 3
         ORDER BY ngram""")
  }

  private val q109Sql =
    """WITH toks AS (
         SELECT doc_id,
           list_filter(string_split(trim(text), ' '), x -> len(x) > 0) AS ts
         FROM documents WHERE doc_id < 200),
       ng AS (
         SELECT doc_id, unnest(generate_series(0, len(ts) - 3)) AS pos,
           unnest(list_transform(generate_series(1, len(ts) - 2),
             i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS ngram
         FROM toks WHERE len(ts) >= 3)
       SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occ,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
         MIN(doc_id * 100000 + pos) AS first_site
       FROM ng GROUP BY ngram HAVING COUNT(*) >= 3
       ORDER BY ngram"""

  // --------------------------------------------------------------------------
  // q110: inverted index build — token → sorted posting list + document
  // frequency, the retrieval-side structure a corpus pipeline materializes for
  // search/dedup lookups. One explode + one hash agg; posting lists are
  // emitted as joined strings (sorted, so deterministic and oracle-comparable;
  // arrays would break the driver's pandas row sort).
  // --------------------------------------------------------------------------
  private def q110(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(
        countDistinct(col("doc_id")).as("df"),
        expr("array_join(transform(array_sort(collect_set(doc_id)), x -> cast(x AS string)), ',')")
          .as("postings"))
      .orderBy(col("token"))

  private val q110Sql =
    """WITH toks AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
         FROM documents WHERE doc_id < 100)
       SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
         array_to_string(list_sort(list_distinct(list(doc_id))), ',') AS postings
       FROM toks WHERE length(token) > 0
       GROUP BY token ORDER BY token"""

  // --------------------------------------------------------------------------
  // q111: parquet schema evolution (mergeSchema) — the data-lake reality that
  // columns arrive over time: batch A was written BEFORE the `value` column
  // existed, batch B after; a mergeSchema read unions the footers into one
  // schema and null-fills the missing column for old files. The aggregate
  // proves both that old rows surface (n_missing) and that the new column's
  // values survive (sum over batch-B rows only) — derivable from the canonical
  // table, so the oracle needs no access to the scratch files.
  // --------------------------------------------------------------------------
  private def q111(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("events_merge", d)
    val ev = T.events(s, d).select(col("event_id"), col("event_type"), col("value"))
    ev.filter(col("event_id") % 2 === 0).select(col("event_id"), col("event_type"))
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/a")
    ev.filter(col("event_id") % 2 === 1)
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/b")
    s.read.option("mergeSchema", "true").parquet(s"$dir/a", s"$dir/b")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_missing"),
        expr("CAST(ROUND(SUM(value) * 100) AS BIGINT)").as("sum_x100"))
      .orderBy(col("event_type"))
  }

  private val q111Sql =
    s"""$evCte
       SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
         CAST(ROUND(SUM(CASE WHEN event_id % 2 = 1 THEN value END) * 100) AS BIGINT) AS sum_x100
       FROM ev GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q112: pipeline funnel report — the composed shape a real corpus build runs
  // nightly: quality gate (length floor) → deterministic content-hash sample
  // (q97's thresholds) → per-doc token budget with truncation, reported as a
  // per-language funnel (docs in, surviving each stage, final token volume,
  // truncation count). Deliberately ONE scan + ONE hash agg: every stage is a
  // row-local predicate, so the whole funnel needs no joins and no second
  // pass — the way to keep a 100 TB nightly report at scan cost.
  // --------------------------------------------------------------------------
  private def q112(s: SparkSession, d: String): DataFrame = {
    val thr = langThresholdCase
    T.documents(s, d)
      .withColumn("q_ok", col("n_chars") >= 150)
      .withColumn("s_ok", col("q_ok") &&
        expr(s"CAST(conv(substring(md5(text), 1, 14), 16, 10) AS BIGINT) < $thr"))
      .withColumn("n_tok", size(split(trim(col("text")), " ")))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_in"),
        sum(when(col("q_ok"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("s_ok"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("s_ok"), least(col("n_tok"), lit(48))).otherwise(0L))
          .as("budget_toks"),
        sum(when(col("s_ok") && col("n_tok") > 48, 1L).otherwise(0L))
          .as("n_truncated"))
      .orderBy(col("lang"))
  }

  private val q112Sql =
    s"""WITH staged AS (
         SELECT lang,
           n_chars >= 150 AS q_ok,
           n_chars >= 150 AND
             CAST(('0x' || substring(md5(text), 1, 14)) AS BIGINT) <
               $langThresholdCase AS s_ok,
           len(string_split(trim(text), ' ')) AS n_tok
         FROM documents)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_in,
         CAST(SUM(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(SUM(CASE WHEN s_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         CAST(SUM(CASE WHEN s_ok THEN LEAST(n_tok, 48) ELSE 0 END) AS BIGINT) AS budget_toks,
         CAST(SUM(CASE WHEN s_ok AND n_tok > 48 THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated
       FROM staged GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------------------
  // q113: sequential event funnel (view → click-after-view → purchase-after-
  // that-click, strictly ordered per user) — the product-analytics pattern
  // that naive per-type mins get WRONG (a click before the first view must not
  // count). Stage qualification is computed with windows over the
  // strictly-preceding frame: a row qualifies iff the previous stage's
  // earliest qualifying timestamp exists before it. Both windows share one
  // (user_id, ts) partitioning+ordering — a single exchange+sort for the
  // whole funnel, then one hash agg. Sharded output for a stronger hash gate.
  // --------------------------------------------------------------------------
  private def q113(s: SparkSession, d: String): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    T.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("seen_view",
        min(when(col("event_type") === "view", col("ts"))).over(wPrev))
      .withColumn("qual_click_ts",
        when(col("event_type") === "click" && col("seen_view").isNotNull, col("ts")))
      .withColumn("seen_qual_click", min(col("qual_click_ts")).over(wPrev))
      .withColumn("qual_purchase",
        when(col("event_type") === "purchase" && col("seen_qual_click").isNotNull, 1L))
      .groupBy((col("user_id") % 8).as("shard"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("event_type") === "view", col("user_id")))
          .as("n_viewed"),
        countDistinct(when(col("qual_click_ts").isNotNull, col("user_id")))
          .as("n_clicked_after_view"),
        countDistinct(when(col("qual_purchase").isNotNull, col("user_id")))
          .as("n_purchased_after_click"))
      .orderBy(col("shard"))
  }

  private val q113Sql =
    s"""$evCte,
       s1 AS (
         SELECT user_id, ts, event_id, event_type,
           MIN(CASE WHEN event_type = 'view' THEN ts END) OVER wprev AS seen_view
         FROM ev
         WINDOW wprev AS (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       s2 AS (
         SELECT *,
           CASE WHEN event_type = 'click' AND seen_view IS NOT NULL THEN ts END
             AS qual_click_ts
         FROM s1),
       s3 AS (
         SELECT *,
           MIN(qual_click_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS seen_qual_click
         FROM s2)
       SELECT user_id % 8 AS shard,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(COUNT(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS BIGINT)
           AS n_viewed,
         CAST(COUNT(DISTINCT CASE WHEN qual_click_ts IS NOT NULL THEN user_id END) AS BIGINT)
           AS n_clicked_after_view,
         CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                AND seen_qual_click IS NOT NULL THEN user_id END) AS BIGINT)
           AS n_purchased_after_click
       FROM s3 GROUP BY user_id % 8 ORDER BY shard"""

  // --------------------------------------------------------------------------
  // q114: cohort retention — users cohorted by first-activity day, retention
  // counted as distinct active users at day offsets 0..7. Two keyed aggs and
  // one user-keyed join: the cohort table is per-user (small relative to the
  // event log) and the join key is the same user_id the activity agg already
  // clustered on. Day truncation (not rounding) on both engines.
  // --------------------------------------------------------------------------
  private def q114(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("off", datediff(col("day"), col("cohort_day")))
      .filter(col("off") <= 7)
      .groupBy(col("cohort_day"), col("off"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("off"), col("n_users"))
      .orderBy(col("cohort_day"), col("off"))
  }

  private val q114Sql =
    s"""$evCte,
       act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM ev),
       coh AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
       SELECT STRFTIME(cohort_day, '%Y-%m-%d') AS cohort_day,
         DATE_DIFF('day', cohort_day, day) AS off,
         CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
       FROM act JOIN coh USING (user_id)
       WHERE DATE_DIFF('day', cohort_day, day) <= 7
       GROUP BY coh.cohort_day, DATE_DIFF('day', cohort_day, day)
       ORDER BY cohort_day, off"""

  val defs: Seq[QDef] = Seq(
    QDef("q96_sessionization", q96, Some(q96Sql)),
    QDef("q97_weighted_sample", q97, Some(q97Sql)),
    QDef("q98_vocab_coverage", q98, Some(q98Sql)),
    QDef("q99_url_profile", q99, Some(q99Sql)),
    QDef("q100_pii_redaction", q100, Some(q100Sql)),
    QDef("q101_range_layout", q101, Some(q101Sql)),
    QDef("q102_typed_mapgroups", q102, Some(q102Sql)),
    QDef("q103_stack_inline", q103, Some(q103Sql)),
    QDef("q104_embedding_quantize", q104, Some(q104Sql)),
    QDef("q106_lateral_join", q106, Some(q106Sql)),
    QDef("q107_paragraph_dedup", q107, Some(q107Sql)),
    QDef("q108_dynamic_overwrite", q108, Some(q108Sql)),
    QDef("q109_ngram_generator", q109, Some(q109Sql)),
    QDef("q110_inverted_index", q110, Some(q110Sql)),
    QDef("q111_schema_merge", q111, Some(q111Sql)),
    QDef("q112_pipeline_funnel", q112, Some(q112Sql)),
    QDef("q113_event_funnel", q113, Some(q113Sql)),
    QDef("q114_cohort_retention", q114, Some(q114Sql)))
}
