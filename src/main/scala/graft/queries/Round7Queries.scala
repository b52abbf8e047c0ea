package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 surface: the OLS regression aggregate family, Count-Min-Sketch
  * frequency estimation (the third sketch after Bloom/q123 and Misra-Gries/
  * q124), exact-distinct bitmap roll-ups, SQL-standard LISTAGG, the predicate
  * aggregate family, a cross-source n-gram contamination matrix, catalog SQL
  * UDFs (Spark 4 `CREATE FUNCTION ... RETURN`), and a distributed 2-D skyline
  * (Pareto frontier) — closing the remaining aggregate/sketch/SQL-surface gaps
  * a 100 TB analytics user would reach for.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts).
  */
object Round7Queries {

  /** Scratch-path scheme shared with SinkQueries/Round5/Round6Queries. */
  private def tmp(name: String, sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_r7_${name}_${Integer.toHexString(sfDir.hashCode)}_p${ProcessHandle.current().pid()}")
      .getAbsolutePath

  // --------------------------------------------------------------------------
  // q139: linear-regression aggregate family — regr_slope / regr_intercept /
  // regr_r2 / regr_count / regr_avgx / regr_avgy, the SQL-standard OLS
  // one-pass aggregates (each is algebraic over (n, Σx, Σy, Σxx, Σyy, Σxy), so
  // they partial-merge map-side like any sum — the 100 TB trend line costs one
  // linear scan, no driver-side fitting). Same fixed-point convention as q89's
  // corr/covar family: scaled, rounded, cast to BIGINT so the hash is exact.
  // --------------------------------------------------------------------------
  private def q139(s: SparkSession, d: String): DataFrame =
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("regr_count(l_extendedprice, l_quantity)").cast("long").as("n_pairs"),
        round(expr("regr_slope(l_extendedprice, l_quantity)") * 100).cast("long")
          .as("slope_x100"),
        round(expr("regr_intercept(l_extendedprice, l_quantity)") * 100).cast("long")
          .as("intercept_x100"),
        round(expr("regr_r2(l_extendedprice, l_quantity)") * 10000).cast("long")
          .as("r2_bp"),
        round(expr("regr_avgx(l_extendedprice, l_quantity)") * 100).cast("long")
          .as("avgx_x100"),
        round(expr("regr_avgy(l_extendedprice, l_quantity)") * 100).cast("long")
          .as("avgy_x100"))
      .orderBy(col("l_returnflag"))

  private val q139Sql =
    """SELECT l_returnflag,
       CAST(REGR_COUNT(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs,
       CAST(ROUND(REGR_SLOPE(l_extendedprice, l_quantity) * 100) AS BIGINT) AS slope_x100,
       CAST(ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity) * 100) AS BIGINT) AS intercept_x100,
       CAST(ROUND(REGR_R2(l_extendedprice, l_quantity) * 10000) AS BIGINT) AS r2_bp,
       CAST(ROUND(REGR_AVGX(l_extendedprice, l_quantity) * 100) AS BIGINT) AS avgx_x100,
       CAST(ROUND(REGR_AVGY(l_extendedprice, l_quantity) * 100) AS BIGINT) AS avgy_x100
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------------------
  // q140: Count-Min-Sketch frequency estimation + exact recheck — the third
  // sketch-then-recheck query (Bloom membership q123, Misra-Gries candidates
  // q124, CMS point-frequency here). CMS is the sketch you use when the
  // QUERY KEYS are known (a watchlist, a vocabulary): fixed width×depth
  // counters, merged map-side by Spark's own count_min_sketch aggregate, and
  // the ONE-SIDED error (estimate ≥ true count, excess ≤ ε·n w.p. δ) makes the
  // estimate-thresholded set a guaranteed SUPERSET of the true heavy hitters —
  // so the exact recheck over broadcast candidates yields the TRUE set and the
  // oracle is plain "count > n/k" SQL. k=30 lands inside the token-frequency
  // cluster, so the threshold genuinely splits the distribution.
  // The sketch probe is a UDF by necessity (sketch API, like q123's
  // mightContain); the sketch deserializes once per executor via the
  // @transient lazy holder, not per row.
  // --------------------------------------------------------------------------
  private val CmsK = 30

  /** Per-executor-deserialized CMS probe around the aggregated sketch bytes. */
  private final class CmsProbe(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val cms =
      org.apache.spark.util.sketch.CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    def estimate(t: String): Long = cms.estimateCount(t)
  }

  private def tokenStream(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  private def q140(s: SparkSession, d: String): DataFrame = {
    val toks = tokenStream(s, d)
    // pass 1: sketch and total count from ONE aggregate over the stream
    val row = toks
      .agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)").as("sk"),
        count(lit(1)).as("n_total"))
      .head()
    val probe = new CmsProbe(row.getAs[Array[Byte]]("sk"))
    val nTotal = row.getAs[Long]("n_total")
    val estU = udf((t: String) => probe.estimate(t))
    // candidate generation: probe the (vocab-sized) key dictionary against the
    // sketch; one-sided error ⇒ superset of the true heavy hitters
    val cands = toks.distinct().filter(estU(col("tok")) * CmsK > lit(nTotal))
    // pass 2: exact recheck — candidates broadcast, counted exactly
    toks.join(broadcast(cands), "tok")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * CmsK > lit(nTotal))
      .select(col("tok"), col("cnt"),
        expr(s"cnt * 10000L DIV ${nTotal}L").as("share_bp"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  private val q140Sql =
    s"""WITH t AS (
         SELECT unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       tt AS (SELECT tok FROM t WHERE length(tok) > 0),
       n AS (SELECT COUNT(*) AS n_total FROM tt),
       c AS (SELECT tok, COUNT(*) AS cnt FROM tt GROUP BY tok)
       SELECT tok, cnt, CAST(cnt * 10000 // n_total AS BIGINT) AS share_bp
       FROM c, n WHERE cnt * $CmsK > n_total
       ORDER BY cnt DESC, tok"""

  // --------------------------------------------------------------------------
  // q141: exact-distinct bitmap roll-up — Spark 4's bitmap aggregate family
  // (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
  // bitmap_or_agg / bitmap_count). The per-(group, bucket) bitmaps are EXACT
  // (one bit per key in a 32k-wide bucket), mergeable with OR, and re-usable:
  // the ALL row is computed by OR-merging the per-type bucket bitmaps — NOT by
  // rescanning raw events. That is the materialized-distinct pattern HLL
  // (q127) approximates, made exact for dense integer key spaces: store
  // bitmaps per segment once, answer any distinct-count roll-up by cheap
  // bitmap OR. user_id is shifted +1 because the bitmap position functions
  // expect 1-based keys (bucket = (k-1) div 32768).
  // --------------------------------------------------------------------------
  private def q141(s: SparkSession, d: String): DataFrame = {
    val base = T.events(s, d).select(col("event_type"), (col("user_id") + 1).as("uid"))
    val sub = base
      .groupBy(col("event_type"), expr("bitmap_bucket_number(uid)").as("bkt"))
      .agg(expr("bitmap_construct_agg(bitmap_bit_position(uid))").as("bm"))
      .persist()
    val perType = sub.groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_users"))
    val overall = sub.groupBy(col("bkt"))
      .agg(expr("bitmap_or_agg(bm)").as("obm"))
      .agg(sum(expr("bitmap_count(obm)")).cast("long").as("n_users"))
      .select(lit("ALL").as("event_type"), col("n_users"))
    val out = perType.unionByName(overall)
      .orderBy(col("event_type"))
      .localCheckpoint(true)
    sub.unpersist()
    out
  }

  private val q141Sql =
    """SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
       FROM events GROUP BY event_type
       UNION ALL
       SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events
       ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q142: SQL-standard LISTAGG (Spark 4.0's ListAgg aggregate) — ordered
  // delimiter-joined string aggregation WITHIN GROUP. Distinct from q13's
  // collect_list+array_join composition: this is the standard's surface
  // (LISTAGG ... WITHIN GROUP (ORDER BY ...)), planned as a SortAggregate with
  // the order carried by the aggregate itself. The deterministic ORDER BY
  // inside the aggregate is what makes the string hash-matchable.
  // --------------------------------------------------------------------------
  private def q142(s: SparkSession, d: String): DataFrame =
    T.nation(s, d)
      .join(T.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  private val q142Sql =
    """SELECT r_name,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
       FROM nation JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name ORDER BY r_name"""

  // --------------------------------------------------------------------------
  // q143: predicate aggregate family — bool_and / bool_or / count_if, the
  // "does every / does any / how many" data-quality assertions. All three are
  // algebraic single-bit (or single-count) partials, so a 100 TB contract
  // check ("every order has a customer", "any urgent order in this segment")
  // is one linear scan with map-side combine — the cheap way to gate a
  // pipeline stage on an invariant.
  // --------------------------------------------------------------------------
  private def q143(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        expr("bool_and(o_totalprice > 1000)").as("all_above_1k"),
        expr("bool_or(o_orderpriority = '1-URGENT')").as("any_urgent"),
        expr("count_if(o_orderpriority IN ('1-URGENT', '2-HIGH'))").as("n_hot"),
        expr("bool_and(o_custkey IS NOT NULL)").as("no_null_cust"))
      .orderBy(col("o_orderstatus"))

  private val q143Sql =
    """SELECT o_orderstatus,
       BOOL_AND(o_totalprice > 1000) AS all_above_1k,
       BOOL_OR(o_orderpriority = '1-URGENT') AS any_urgent,
       CAST(COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS BIGINT) AS n_hot,
       BOOL_AND(o_custkey IS NOT NULL) AS no_null_cust
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // --------------------------------------------------------------------------
  // q144: cross-source n-gram contamination matrix — for every source pair,
  // the bigram-vocabulary overlap (Jaccard, in basis points). This is the
  // corpus-curation diagnostic behind dedup priorities and leakage audits:
  // which sources share boilerplate, which eval shard overlaps which train
  // shard (q93's decontamination generalized from one eval set to the full
  // pairwise matrix). Shape: the corpus collapses ONCE to distinct
  // (source, bigram) — vocabulary-sized, not corpus-sized — and the matrix is
  // a self-equi-join on bigram with per-bigram fanout = #sources containing
  // it, never all-pairs-of-rows. 20 sources ⇒ 190 matrix cells.
  // --------------------------------------------------------------------------
  private def q144(s: SparkSession, d: String): DataFrame = {
    val sb = T.documents(s, d)
      .select(col("source"), split(trim(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("source"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bg"))
      .distinct()
      .persist()
    val sizes = sb.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val common = sb.toDF("s1", "bg")
      .join(sb.toDF("s2", "bg2"), col("bg") === col("bg2") && col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_common"))
    val out = common
      .join(sizes.toDF("s1", "n1"), "s1")
      .join(sizes.toDF("s2", "n2"), "s2")
      .select(col("s1"), col("s2"), col("n_common"), col("n1"), col("n2"),
        expr("n_common * 10000L DIV (n1 + n2 - n_common)").as("jaccard_bp"))
      .orderBy(col("s1"), col("s2"))
      .localCheckpoint(true)
    sb.unpersist()
    out
  }

  private val q144Sql =
    """WITH docs AS (
         SELECT source, string_split(trim(text), ' ') AS toks FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 2),
       sb AS (
         SELECT DISTINCT source,
           unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i + 1])) AS bg
         FROM docs),
       sizes AS (SELECT source, COUNT(*) AS n FROM sb GROUP BY source),
       common AS (
         SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_common
         FROM sb a JOIN sb b ON a.bg = b.bg AND a.source < b.source
         GROUP BY 1, 2)
       SELECT s1, s2, n_common, x.n AS n1, y.n AS n2,
         CAST(n_common * 10000 // (x.n + y.n - n_common) AS BIGINT) AS jaccard_bp
       FROM common JOIN sizes x ON s1 = x.source JOIN sizes y ON s2 = y.source
       ORDER BY s1, s2"""

  // --------------------------------------------------------------------------
  // q145: catalog SQL UDF (Spark 4: CREATE FUNCTION ... RETURNS ... RETURN
  // expr) — the declarative UDF surface. Unlike a Scala closure UDF (q59,
  // opaque to the optimizer), a SQL function body is INLINED into the plan by
  // Analyzer.ResolveSQLFunctions, so it stays inside whole-stage codegen and
  // keeps predicate pushdown — the right way to package shared business
  // arithmetic at 100 TB. The oracle inlines the same expression by hand,
  // proving the inlining is semantics-preserving.
  // --------------------------------------------------------------------------
  private def q145(s: SparkSession, d: String): DataFrame = {
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_net_revenue(
         p DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
         RETURN p * (1 - disc) * (1 + tax)""")
    T.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(expr("graft_net_revenue(l_extendedprice, l_discount, l_tax)")), 2)
          .as("net_revenue"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q145Sql =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS net_revenue
       FROM lineitem GROUP BY l_returnflag, l_linestatus
       ORDER BY l_returnflag, l_linestatus"""

  // --------------------------------------------------------------------------
  // q146: 2-D skyline (Pareto frontier) — parts no other part dominates on
  // (retail price, size), both minimized: the multi-objective "best tradeoff"
  // operator. The naive NOT EXISTS is an all-pairs quadratic; the distributed
  // shape exploits that skyline is DISTRIBUTIVE — skyline(A ∪ B) =
  // skyline(skyline(A) ∪ skyline(B)) — so each partition prunes locally first
  // (sort by (price, size), keep rows whose size beats the running min: one
  // pass, no state beyond a long), and only the per-partition survivors (≤
  // frontier-sized each) reach the final global pass. The global window sort
  // runs over candidates, not the corpus. Output prices are unique by
  // construction (two same-price points can't both be on the frontier), so
  // ORDER BY price is a total order.
  // --------------------------------------------------------------------------
  private def q146(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pts = T.part(s, d)
      .select(expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").as("price_c"),
        col("p_size").cast("long").as("psize"))
      .distinct()
    def runningMinFilter(it: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
      var best = Long.MaxValue
      it.filter { case (_, sz) => if (sz < best) { best = sz; true } else false }
    }
    val local = pts
      .repartition(8, col("price_c"))
      .sortWithinPartitions(col("price_c"), col("psize"))
      .as[(Long, Long)]
      .mapPartitions(runningMinFilter)
      .toDF("price_c", "psize")
    val w = Window.orderBy(col("price_c"), col("psize"))
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("pm", min(col("psize")).over(w))
      .filter(col("pm").isNull || col("psize") < col("pm"))
      .select(col("price_c"), col("psize"))
      .orderBy(col("price_c"))
  }

  private val q146Sql =
    """WITH pts AS (
         SELECT DISTINCT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_c,
           CAST(p_size AS BIGINT) AS psize
         FROM part)
       SELECT price_c, psize FROM pts a
       WHERE NOT EXISTS (
         SELECT 1 FROM pts b
         WHERE b.price_c <= a.price_c AND b.psize <= a.psize
           AND (b.price_c < a.price_c OR b.psize < a.psize))
       ORDER BY price_c"""

  // --------------------------------------------------------------------------
  // q147: Dataset.transpose (Spark 4) — rows↔columns flip with the index
  // column's VALUES becoming the output columns: the report-shaping terminal
  // step (metrics as rows, segments as columns). Transpose is driver-planned
  // over the (already aggregated, group-count-sized) input — the aggregate
  // does the 100 TB work; the flip touches only its tiny result. The oracle
  // hand-builds the same flip with FILTERed conditional aggregates, proving
  // the reshape is value-preserving.
  // --------------------------------------------------------------------------
  private def q147(s: SparkSession, d: String): DataFrame = {
    val cents = expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
    val t = T.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents).as("sum_cents"),
        max(cents).as("max_cents"))
      .transpose(col("o_orderstatus"))
    // transposed column names come from the status VALUES ('F','O','P');
    // lowercase them to meet the engine's all-lowercase output convention
    t.columns.foldLeft(t)((df, c) => df.withColumnRenamed(c, c.toLowerCase))
      .orderBy(col("key"))
  }

  private val q147Sql =
    """SELECT 'max_cents' AS key,
         CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f,
         CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o,
         CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p
       FROM orders
       UNION ALL
       SELECT 'n_orders',
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
       FROM orders
       UNION ALL
       SELECT 'sum_cents',
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS BIGINT),
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') AS BIGINT),
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') AS BIGINT)
       FROM orders
       ORDER BY key"""

  // --------------------------------------------------------------------------
  // q148: modern SQL ergonomics — GROUP BY ALL (group keys inferred from the
  // non-aggregate select items), ORDER BY ALL (total order over the whole
  // select list), and LATERAL COLUMN ALIASES (avg_cents references the cents
  // and n aliases from the SAME select list — no subquery wrapper). All three
  // are resolution-time sugar: the optimized plan is identical to the
  // explicit spelling, so they cost nothing at any scale. DuckDB implements
  // the same trio, which makes the oracle nearly verbatim.
  // --------------------------------------------------------------------------
  private def q148(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("v_orders_r7")
    // lateral aliases live in the inner PROJECTION (cents reused by dollars in
    // the same select list — Spark does not yet allow them as GROUP BY ALL
    // keys); GROUP BY ALL + ORDER BY ALL shape the outer aggregate
    s.sql(
      """SELECT o_orderstatus,
         substring(o_orderpriority, 1, 1) AS prio_code,
         COUNT(*) AS n,
         SUM(cents) AS cents,
         SUM(dollars) AS dollars
         FROM (
           SELECT o_orderstatus, o_orderpriority,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             cents DIV 100 AS dollars
           FROM v_orders_r7)
         GROUP BY ALL
         ORDER BY ALL""")
  }

  private val q148Sql =
    """SELECT o_orderstatus,
       substring(o_orderpriority, 1, 1) AS prio_code,
       COUNT(*) AS n,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(SUM(dollars) AS BIGINT) AS dollars
       FROM (
         SELECT o_orderstatus, o_orderpriority,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
           cents // 100 AS dollars
         FROM orders)
       GROUP BY ALL
       ORDER BY ALL"""

  // --------------------------------------------------------------------------
  // q149: repeated-span detection (the span-level exact-substring diagnostic of
  // Lee et al., "Deduplicating Training Data Makes Language Models Better" —
  // there suffix-array-based; here the distributed k-gram-anchored form): a
  // position is "duplicated" if the 4-token shingle starting there appears in
  // ≥ 2 DISTINCT documents. Per-source duplicated-token coverage (union of
  // overlapping spans, counted once per token via distinct (doc, index)) is
  // the curation signal that tells you which sources carry shared boilerplate
  // worth span-stripping rather than doc-dropping. Every step is a linear
  // explode or hash agg on the shingle key — at 100 TB the only change is
  // hashing shingles to int64 (xxhash64) instead of carrying strings; the
  // string key is kept here so the DuckDB oracle sees identical values.
  // --------------------------------------------------------------------------
  private val SpanW = 4

  private def q149(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), col("source"), split(trim(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= SpanW)
    val sh = docs.select(col("doc_id"), col("source"),
      posexplode(expr(s"transform(sequence(0, size(toks) - $SpanW), " +
        s"i -> concat_ws(' ', slice(toks, i + 1, $SpanW)))")))
      .withColumnRenamed("col", "sh")
      .persist()
    val dup = sh.groupBy(col("sh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("sh"))
    val perDoc = sh.join(dup, "sh")
      .select(col("doc_id"), explode(expr(s"sequence(pos, pos + ${SpanW - 1})")).as("ti"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_toks"))
    val base = docs.select(col("doc_id"), col("source"),
      size(col("toks")).cast("long").as("n_toks"))
    val out = base.join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_dup_toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_toks"),
        sum(col("n_dup_toks")).as("n_dup_toks"))
      .withColumn("dup_bp", expr("n_dup_toks * 10000L DIV n_toks"))
      .orderBy(col("source"))
      .localCheckpoint(true)
    sh.unpersist()
    out
  }

  private val q149Sql =
    """WITH docs AS (
         SELECT doc_id, source, string_split(trim(text), ' ') AS toks
         FROM documents WHERE len(string_split(trim(text), ' ')) >= 4),
       sh AS (
         SELECT doc_id, source,
           unnest(range(1, len(toks) - 2)) AS pos,
           unnest(list_transform(range(1, len(toks) - 2),
             i -> list_aggregate(toks[i:i+3], 'string_agg', ' '))) AS s
         FROM docs),
       dup AS (SELECT s FROM sh GROUP BY s HAVING COUNT(DISTINCT doc_id) >= 2),
       cov AS (SELECT DISTINCT doc_id, ti FROM (
         SELECT doc_id, unnest([pos, pos + 1, pos + 2, pos + 3]) AS ti
         FROM sh JOIN dup USING (s))),
       perdoc AS (SELECT doc_id, COUNT(*) AS n_dup_toks FROM cov GROUP BY doc_id),
       base AS (SELECT doc_id, source, len(toks) AS n_toks FROM docs)
       SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(n_toks) AS BIGINT) AS n_toks,
         CAST(SUM(COALESCE(n_dup_toks, 0)) AS BIGINT) AS n_dup_toks,
         CAST(SUM(COALESCE(n_dup_toks, 0)) * 10000 // SUM(n_toks) AS BIGINT) AS dup_bp
       FROM base LEFT JOIN perdoc USING (doc_id)
       GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------------------
  // q150: incremental ingestion dedup against a PERSISTED fingerprint store —
  // the cross-epoch shape every rolling corpus needs: epoch N's fingerprints
  // are written once (q133's incremental-maintenance pattern applied to
  // dedup), and epoch N+1 is admitted via LEFT ANTI join against the store —
  // the new batch is scanned once and history is NEVER rescanned (the store
  // is fingerprint-sized, not corpus-sized). Fingerprint = md5 of the sorted
  // distinct-token profile: content-derived, engine-portable, and coarser
  // than exact text so the store genuinely suppresses re-ingests (27 of 167
  // epoch-2 docs at sf0.01). At 100 TB the store side is bucketed on fp so
  // the anti join co-locates without a shuffle of the incoming batch.
  // --------------------------------------------------------------------------
  private def q150(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("fp_store", d)
    val docs = T.documents(s, d).select(col("doc_id"), col("source"),
      md5(concat_ws(" ", array_sort(array_distinct(split(trim(col("text")), " ")))))
        .as("fp"))
    docs.filter(col("doc_id") % 3 =!= 0).select(col("fp")).distinct()
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val store = s.read.parquet(dir)
    docs.filter(col("doc_id") % 3 === 0)
      .join(store, Seq("fp"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_new"))
      .orderBy(col("source"))
  }

  private val q150Sql =
    """WITH d AS (
         SELECT doc_id, source,
           md5(list_aggregate(list_sort(list_distinct(string_split(trim(text), ' '))),
             'string_agg', ' ')) AS fp
         FROM documents),
       store AS (SELECT DISTINCT fp FROM d WHERE doc_id % 3 <> 0)
       SELECT source, COUNT(*) AS n_new
       FROM d WHERE doc_id % 3 = 0 AND fp NOT IN (SELECT fp FROM store)
       GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------------------
  // q151: fixed-window chunking with overlap — the context-window preparation
  // step between cleaning and tokenization: every document is cut into
  // 32-token windows advancing by a 24-token stride (8-token overlap carries
  // context across cuts), short tails under 16 tokens are dropped, and the
  // padding overhead of the final short chunks is accounted per source. Pure
  // integer arithmetic over an exploded start-position sequence — shuffle-free
  // until the per-source rollup, and bit-identical in any engine. Distinct
  // from q92/q115 (packing MERGES docs into budget bins; chunking SPLITS docs
  // into fixed windows).
  // --------------------------------------------------------------------------
  private val ChunkW = 32; private val ChunkS = 24; private val ChunkMin = 16

  private def q151(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), " ")).cast("long").as("n_toks"))
      .select(col("doc_id"), col("source"), col("n_toks"),
        explode(expr(s"sequence(0L, (n_toks - 1) DIV $ChunkS * $ChunkS, $ChunkS)"))
          .as("start"))
      .withColumn("chunk_len", least(lit(ChunkW), col("n_toks") - col("start")))
      .filter(col("chunk_len") >= ChunkMin)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("chunk_len")).as("chunk_toks"),
        sum(lit(ChunkW) - col("chunk_len")).as("pad_toks"))
      .withColumn("pad_bp", expr(s"pad_toks * 10000L DIV (n_chunks * $ChunkW)"))
      .orderBy(col("source"))

  private val q151Sql =
    s"""WITH d AS (
         SELECT doc_id, source,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_toks
         FROM documents),
       c AS (
         SELECT doc_id, source, n_toks, unnest(range(0, n_toks, $ChunkS)) AS start
         FROM d),
       l AS (
         SELECT doc_id, source, LEAST($ChunkW, n_toks - start) AS chunk_len
         FROM c WHERE LEAST($ChunkW, n_toks - start) >= $ChunkMin)
       SELECT source, COUNT(*) AS n_chunks,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(SUM(chunk_len) AS BIGINT) AS chunk_toks,
         CAST(SUM($ChunkW - chunk_len) AS BIGINT) AS pad_toks,
         CAST(SUM($ChunkW - chunk_len) * 10000 // (COUNT(*) * $ChunkW) AS BIGINT) AS pad_bp
       FROM l GROUP BY source ORDER BY source"""

  val defs: Seq[QDef] = Seq(
    QDef("q139_regr_family", q139, Some(q139Sql)),
    QDef("q140_cms_heavy_hitters", q140, Some(q140Sql)),
    QDef("q141_bitmap_distinct", q141, Some(q141Sql)),
    QDef("q142_listagg", q142, Some(q142Sql)),
    QDef("q143_predicate_aggs", q143, Some(q143Sql)),
    QDef("q144_source_overlap", q144, Some(q144Sql)),
    QDef("q145_sql_udf", q145, Some(q145Sql)),
    QDef("q146_skyline", q146, Some(q146Sql)),
    QDef("q147_transpose", q147, Some(q147Sql)),
    QDef("q148_sql_ergonomics", q148, Some(q148Sql)),
    QDef("q149_repeated_spans", q149, Some(q149Sql)),
    QDef("q150_incremental_dedup", q150, Some(q150Sql)),
    QDef("q151_window_chunking", q151, Some(q151Sql)))
}
