package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-4 continuation surface: training-corpus assembly operators — greedy
  * sequence packing, time-series gap-fill/forward-fill, linear quality scoring,
  * Spark-4 VARIANT shredding, and collation-aware comparison semantics.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (ORDER BY unique
  * keys, floats as scaled integers, no rand(), no engine-dependent float math).
  */
object CorpusQueries {

  // --------------------------------------------------------------------------
  // q115: EXACT greedy sequence packing — the strict form of q92's
  // batch-assembly op. q92 approximates packing with an exclusive running sum
  // (distributable, but a doc may straddle two packs, overflowing the budget);
  // here a doc that would overflow the open bin STARTS a new one, so no bin
  // ever exceeds the budget (except a single oversized doc alone). That carry
  // reset is a loop dependency no window frame can express, so the corpus is
  // SHARDED (lang, doc_id DIV 256) and each shard is packed by a sequential
  // scan: repartition on the shard key + sortWithinPartitions gives a
  // secondary sort (no per-group materialization — SequencePacking.pack
  // streams rows per partition, resetting state on shard change). Shards
  // bound packing state and the oracle's recursion depth at ANY corpus size,
  // and pack in parallel across executors — the shape real pipelines use.
  // Oracle: DuckDB recursive CTE walking rn -> rn+1 within each shard.
  // --------------------------------------------------------------------------
  private val Budget = 256

  private def q115(s: SparkSession, d: String): DataFrame = {
    val toks = T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr("doc_id DIV 256").as("shard"),
        size(split(trim(col("text")), " ")).cast("long").as("n_tok"))
    graft.operators.SequencePacking.pack(toks, Budget)
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("tok_sum"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("lang"), col("shard"), col("bin"))
  }

  private val q115Sql =
    s"""WITH RECURSIVE toks AS (
         SELECT doc_id, lang, doc_id // 256 AS shard,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tok,
           row_number() OVER (PARTITION BY lang, doc_id // 256 ORDER BY doc_id) AS rn
         FROM documents),
       pack AS (
         SELECT lang, shard, rn, doc_id, n_tok,
           CAST(1 AS BIGINT) AS bin, n_tok AS fill
         FROM toks WHERE rn = 1
         UNION ALL
         SELECT t.lang, t.shard, t.rn, t.doc_id, t.n_tok,
           CASE WHEN p.fill + t.n_tok > $Budget THEN p.bin + 1 ELSE p.bin END,
           CASE WHEN p.fill + t.n_tok > $Budget THEN t.n_tok ELSE p.fill + t.n_tok END
         FROM pack p JOIN toks t
           ON t.lang = p.lang AND t.shard = p.shard AND t.rn = p.rn + 1)
       SELECT lang, shard, bin,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tok) AS BIGINT) AS tok_sum,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       FROM pack GROUP BY lang, shard, bin
       ORDER BY lang, shard, bin"""

  // --------------------------------------------------------------------------
  // q116: time-series gap-fill + forward-fill — densify each user's event
  // stream to an hourly grid (sequence() explode over the user's own
  // [first, last] hour span, so grid size is per-user, not global) and
  // forward-fill the hourly value with last(ignoreNulls) over an unbounded-
  // preceding frame. One exchange keys both the grid join and the fill window
  // (user_id). Values are x100-scaled BEFORE the fill so the carried value is
  // an exact integer. Restricted to user_id < 40 to bound the grid.
  // --------------------------------------------------------------------------
  private def q116(s: SparkSession, d: String): DataFrame = {
    val ev = T.events(s, d).filter(col("user_id") < 40)
      .select(col("user_id"), col("ts"), col("value"))
    val hourly = ev
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(
        count(lit(1)).as("n_events"),
        expr("CAST(ROUND(SUM(value) * 100) AS BIGINT)").as("val_x100"))
    val grid = ev
      .groupBy(col("user_id"))
      .agg(
        date_trunc("hour", min(col("ts"))).as("h0"),
        date_trunc("hour", max(col("ts"))).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(
        col("user_id"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour_s"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(last(col("val_x100"), ignoreNulls = true).over(w), lit(0L))
          .as("ffill_val_x100"))
      .orderBy(col("user_id"), col("hour_s"))
  }

  private val q116Sql =
    """WITH ev AS (
         SELECT user_id, ts, value FROM events WHERE user_id < 40),
       hourly AS (
         SELECT user_id, date_trunc('hour', ts) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(value) * 100) AS BIGINT) AS val_x100
         FROM ev GROUP BY 1, 2),
       grid AS (
         SELECT user_id,
           unnest(generate_series(date_trunc('hour', MIN(ts)),
                                  date_trunc('hour', MAX(ts)),
                                  INTERVAL 1 HOUR)) AS hour
         FROM ev GROUP BY user_id)
       SELECT g.user_id, strftime(g.hour, '%Y-%m-%d %H:%M') AS hour_s,
         COALESCE(h.n_events, 0) AS n_events,
         COALESCE(LAST_VALUE(h.val_x100 IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour
           ROWS UNBOUNDED PRECEDING), 0) AS ffill_val_x100
       FROM grid g LEFT JOIN hourly h
         ON g.user_id = h.user_id AND g.hour = h.hour
       ORDER BY g.user_id, hour_s"""

  // --------------------------------------------------------------------------
  // q117: linear quality classifier — the fastText-style quality gate spelled
  // so both engines agree bit-for-bit: every feature is an INTEGER (token
  // count, distinct-token ratio in basis points via integer DIV, stopword
  // hits, chars-per-token decile) and the score is a fixed integer-weight dot
  // product. No exp()/sigmoid — a monotone transform never changes the
  // decision boundary, so the linear margin IS the classifier (the published
  // CCNet/fastText filters threshold the margin the same way). Narrow
  // projection, one hash agg — linear scan at any scale.
  // --------------------------------------------------------------------------
  private val StopList = Seq("the", "a", "of", "and", "in")

  private def q117(s: SparkSession, d: String): DataFrame = {
    val stops = StopList.map(w => s"'$w'").mkString("array(", ", ", ")")
    T.documents(s, d)
      .withColumn("toks", split(trim(col("text")), " "))
      .withColumn("n_tok", size(col("toks")).cast("long"))
      .withColumn("uniq_bp",
        expr("size(array_distinct(toks)) * 10000 DIV n_tok"))
      .withColumn("stop_hits",
        expr(s"CAST(size(filter(toks, t -> array_contains($stops, t))) AS BIGINT)"))
      .withColumn("cpt", expr("n_chars DIV n_tok"))
      .withColumn("score",
        expr("3 * n_tok + uniq_bp DIV 10 + 20 * stop_hits - 15 * cpt"))
      .withColumn("pass", col("score") >= 500)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        sum(col("score")).as("score_sum"),
        min(col("score")).as("score_min"),
        max(col("score")).as("score_max"))
      .orderBy(col("lang"))
  }

  private val q117Sql = {
    val stops = StopList.map(w => s"'$w'").mkString("[", ", ", "]")
    s"""WITH f AS (
         SELECT lang,
           CAST(len(toks) AS BIGINT) AS n_tok,
           CAST(len(list_distinct(toks)) AS BIGINT) * 10000 // len(toks) AS uniq_bp,
           CAST(len(list_filter(toks, t -> list_contains($stops, t))) AS BIGINT)
             AS stop_hits,
           n_chars // len(toks) AS cpt
         FROM (SELECT lang, n_chars, string_split(trim(text), ' ') AS toks
               FROM documents)),
       scored AS (
         SELECT lang,
           3 * n_tok + uniq_bp // 10 + 20 * stop_hits - 15 * cpt AS score
         FROM f)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CASE WHEN score >= 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         CAST(SUM(score) AS BIGINT) AS score_sum,
         CAST(MIN(score) AS BIGINT) AS score_min,
         CAST(MAX(score) AS BIGINT) AS score_max
       FROM scored GROUP BY lang ORDER BY lang"""
  }

  // --------------------------------------------------------------------------
  // q118: VARIANT shredding (Spark 4) — parse the semi-structured props column
  // once into the binary VARIANT encoding, then extract typed fields with
  // variant_get. Versus get_json_object, VARIANT parses each document ONCE
  // (extractions are binary-offset reads, not re-parses) — the difference
  // between O(fields x parse) and O(parse + fields) on a 100 TB JSON column.
  // Oracle: DuckDB's JSON extraction over the same path.
  // --------------------------------------------------------------------------
  private def q118(s: SparkSession, d: String): DataFrame =
    T.events(s, d)
      .withColumn("v", parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  private val q118Sql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(k) AS BIGINT) AS k_sum,
         CAST(MIN(k) AS BIGINT) AS k_min,
         CAST(MAX(k) AS BIGINT) AS k_max
       FROM (SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             FROM events)
       GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q119: collation-aware comparison (Spark 4) — distinct counting and
  // predicate matching under UTF8_LCASE, the engine-level answer to
  // "normalize case before comparing" (the collation travels with the column;
  // every comparison, join, and DISTINCT downstream inherits it — no scattered
  // lower() calls to forget). The fixture uppercases source on odd doc_ids so
  // case-sensitive and case-insensitive counts genuinely differ. Oracle:
  // explicit lower() on the DuckDB side.
  // --------------------------------------------------------------------------
  private def q119(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("mixed",
        when(col("doc_id") % 2 === 1, upper(col("source"))).otherwise(col("source")))
      .withColumn("ci", expr("collate(mixed, 'UTF8_LCASE')"))
      .groupBy(col("lang"))
      .agg(
        countDistinct(col("ci")).as("n_ci"),
        countDistinct(col("mixed")).as("n_cs"),
        sum(when(col("ci") === "src0", 1L).otherwise(0L)).as("n_src0_ci"))
      .orderBy(col("lang"))

  private val q119Sql =
    """WITH m AS (
         SELECT lang,
           CASE WHEN doc_id % 2 = 1 THEN upper(source) ELSE source END AS mixed
         FROM documents)
       SELECT lang,
         CAST(COUNT(DISTINCT lower(mixed)) AS BIGINT) AS n_ci,
         CAST(COUNT(DISTINCT mixed) AS BIGINT) AS n_cs,
         CAST(SUM(CASE WHEN lower(mixed) = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_src0_ci
       FROM m GROUP BY lang ORDER BY lang"""

  val defs: Seq[QDef] = Seq(
    QDef("q115_greedy_packing", q115, Some(q115Sql)),
    QDef("q116_gapfill_ffill", q116, Some(q116Sql)),
    QDef("q117_quality_classifier", q117, Some(q117Sql)),
    QDef("q118_variant_shred", q118, Some(q118Sql)),
    QDef("q119_collated_compare", q119, Some(q119Sql)))
}
