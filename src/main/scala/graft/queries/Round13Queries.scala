package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 surface: the operator families still uncovered after q01–q224 —
  * `mode()` (the one central-tendency aggregate not yet pinned), `stat
  * .freqItems` run in the sketch→exact-recheck shape (the repo's Misra-Gries /
  * CMS convention: the approximate pass proposes, an exact pass disposes, and
  * the ORACLE gates the exact set), result pagination (`Dataset.offset` /
  * `LIMIT ... OFFSET`), time-interval RANGE window frames (rolling 7-day
  * per-user aggregates — the frame kind q15's rows/range-on-integers left
  * open), bounded-hop BFS reachability (the third iterative graph operator
  * next to PageRank and connected components, sharing q125's co-purchase edge
  * list), the join STRATEGY HINT surface (merge/shuffle_hash/broadcast — plan
  * shape pinned per hint in Round13Spec, values oracle-gated), Hive-style
  * script transform (`SELECT TRANSFORM ... USING 'cat'` — rows piped through
  * an external process per partition, the no-serde path), marketing-style
  * first/last-touch attribution (IGNORE-NULLS navigation composed over both
  * frame kinds), sum-preserving largest-remainder integer proration, and the
  * typed `flatMapSortedGroups` surface (Spark hands each group's rows in
  * secondary-sort order — no per-group sort buffer, the scalable form of
  * sessionized per-key sequence scans).
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer or ROUND(x,2) outputs, DuckDB HUGEINT casts,
  * timestamps emitted as formatted strings).
  */
object Round13Queries {

  // --------------------------------------------------------------------------
  // q225: `mode()` — the most-frequent-value aggregate (Spark 3.4+ / ANSI
  // 2023). Tie behavior is engine-defined, so the query groups where the max
  // is UNIQUE by a verified margin (per-returnflag l_linenumber counts at
  // sf0.01 and sf0.1 both have a unique argmax, margin >= 12 rows); with a
  // unique max, argmax-by-count is engine-independent and hash-matchable.
  // Scale shape: mode is a partial-aggregable count-and-argmax — same
  // distributed profile as any hash aggregate.
  // --------------------------------------------------------------------------
  private def q225(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("m225_src")
    s.sql("""SELECT l_returnflag AS rf, COUNT(*) AS n,
                    MODE(l_linenumber) AS mode_ln,
                    CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
             FROM m225_src GROUP BY 1 ORDER BY 1""")
  }

  private val q225Sql =
    """SELECT l_returnflag AS rf, COUNT(*) AS n,
              MODE(l_linenumber) AS mode_ln,
              CAST(SUM(l_linenumber) AS BIGINT) AS sum_ln
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q226: `stat.freqItems` + EXACT RECHECK — Spark's one-pass frequent-items
  // sketch (Karp/Shenker/Papadimitriou, a guaranteed SUPERSET of all items
  // with frequency > support) proposes candidates; an exact count pass keeps
  // only true heavy hitters. Because the sketch is a superset, intersecting
  // it with the exact set IS the exact set — so the output is deterministic
  // and the oracle recomputes it purely relationally, while the query still
  // exercises the sketch (a sketch false-NEGATIVE would surface as a hash
  // mismatch). Corpus profiling shape: dominant languages of `documents`.
  // --------------------------------------------------------------------------
  private def q226(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val total = docs.count()
    // driver-side: the sketch result is one row with one array cell
    val candidates = docs.stat.freqItems(Seq("lang"), 0.1)
      .head.getSeq[String](0)
    docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .where(col("n") * 10 > lit(total))
      .where(col("lang").isin(candidates: _*))
      .select(col("lang"), col("n"),
        expr(s"CAST(n * 10000 DIV ${total}L AS BIGINT)").as("share_bp"))
      .orderBy(col("lang"))
  }

  private val q226Sql =
    """WITH t AS (SELECT COUNT(*) AS n_total FROM documents),
            c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1)
       SELECT lang, n, CAST(n * 10000 // n_total AS BIGINT) AS share_bp
       FROM c, t WHERE n * 10 > n_total ORDER BY lang"""

  // --------------------------------------------------------------------------
  // q227: PAGINATION — `Dataset.offset` (Spark 3.4+) + `limit` over a
  // total-ordered result, the keyset-less page-3 shape (rows 41–60 of the
  // customer spend leaderboard). Money is summed in integer cents (per-row
  // ROUND before SUM, so both engines add exact integers). Note for 100 TB:
  // OFFSET pagination ships all prior rows through the final single-task
  // limit — fine for page-sized offsets (this one), keyset pagination (q17's
  // top-k per group) is the deep-page tool.
  // --------------------------------------------------------------------------
  private def q227(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("spend_c"))
      .orderBy(col("spend_c").desc, col("o_custkey"))
      .offset(40).limit(20)

  private val q227Sql =
    """SELECT o_custkey,
              CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c
       FROM orders GROUP BY 1
       ORDER BY spend_c DESC, o_custkey LIMIT 20 OFFSET 40"""

  // --------------------------------------------------------------------------
  // q228: time-interval RANGE window frame — rolling 7-day per-user event
  // count and cents sum (`RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND
  // CURRENT ROW` ordered by the event timestamp). q15 pinned ROWS frames and
  // numeric RANGE frames; the calendar-interval frame over a TIMESTAMP order
  // key is its own evaluator path (frame bounds move with the value, peers
  // by timestamp). RANGE is peer-inclusive in both engines, so same-ts
  // events within a user agree deterministically. Scale shape: one shuffle
  // on user_id, per-partition sliding aggregation — no global state.
  // --------------------------------------------------------------------------
  private def q228(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("e228_src")
    s.sql("""SELECT user_id, event_id,
                    date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS t,
                    COUNT(*) OVER w AS n7,
                    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS v7_c
             FROM e228_src
             WINDOW w AS (PARTITION BY user_id ORDER BY ts
                          RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
             ORDER BY user_id, event_id""")
  }

  private val q228Sql =
    """SELECT user_id, event_id,
              strftime(ts, '%Y-%m-%d %H:%M:%S') AS t,
              COUNT(*) OVER w AS n7,
              CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS v7_c
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
       ORDER BY user_id, event_id"""

  // --------------------------------------------------------------------------
  // q229: bounded-hop BFS reachability — single-source shortest hop distance
  // over q125's co-purchase graph (4 hops from the smallest node in the edge
  // list), the third iterative graph operator (PageRank = value iteration,
  // q81 = component propagation, this = frontier expansion). Each hop is ONE
  // frontier⋈edges equi-join + ONE min-aggregate — frontier-sized rows, the
  // textbook distributed BFS (no per-iteration full-graph shuffle; the edge
  // list is cached once). Output is per-hop node count + id checksum, so the
  // oracle (a recursive CTE walking the same edges) hash-gates every layer.
  // --------------------------------------------------------------------------
  private val BfsHops = 4

  private def q229(s: SparkSession, d: String): DataFrame = {
    val edges = Round5Queries.copurchaseEdges(s, d).persist()
    val s0 = edges.agg(min(col("src"))).head.getLong(0) // 1-row driver read
    var dist = s.range(1)
      .select(lit(s0).as("node"), lit(0).cast("int").as("d"))
    for (h <- 1 to BfsHops) {
      val frontier = dist.where(col("d") === h - 1)
        .join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), lit(h).cast("int").as("d"))
      // materialize each layer eagerly: `dist` appears TWICE in the next
      // iteration's plan (as carry-over and as frontier source), so an
      // unmaterialized lineage doubles per hop — the BFS twin of q125's
      // cache note, except here the per-layer state is node-count-sized and
      // a localCheckpoint per hop measured 9.2 s → ~3 s at sf0.1
      dist = dist.union(frontier).groupBy(col("node")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    val out = dist.groupBy(col("d"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("node")).as("id_sum"))
      .orderBy(col("d"))
      .localCheckpoint(true) // q125's convention: materialize, then drop the cache
    edges.unpersist()
    out
  }

  private val q229Sql =
    s"""WITH RECURSIVE pairs AS (
          SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        edges AS (SELECT p1 AS src, p2 AS dst FROM pairs
                  UNION ALL SELECT p2, p1 FROM pairs),
        s0 AS (SELECT MIN(src) AS v FROM edges),
        reach(node, d) AS (
          SELECT v, 0 FROM s0
          UNION
          SELECT e.dst, r.d + 1 FROM reach r JOIN edges e ON e.src = r.node
          WHERE r.d < $BfsHops),
        best AS (SELECT node, MIN(d) AS d FROM reach GROUP BY node)
        SELECT CAST(d AS INT) AS d, COUNT(*) AS n_nodes,
               CAST(SUM(node) AS BIGINT) AS id_sum
        FROM best GROUP BY d ORDER BY d"""

  // --------------------------------------------------------------------------
  // q230: join STRATEGY HINTS — the same equi-join forced down each physical
  // path: `merge` (sort-merge), `shuffle_hash`, and `broadcast`. The query
  // returns the merge-hinted result (the non-default choice at this size, so
  // the hint is observably doing something); Round13Spec pins all three plans
  // (SortMergeJoin / ShuffledHashJoin / BroadcastHashJoin) AND that the three
  // results are identical — the hint contract: strategy changes, semantics
  // don't. At 100 TB this surface is how a pipeline overrides a mis-estimated
  // broadcast (OOM risk) or forces SMJ for a pre-sorted bucketed layout.
  // --------------------------------------------------------------------------
  private[queries] def hintedJoin(s: SparkSession, d: String, hint: String): DataFrame =
    T.orders(s, d).hint(hint)
      .join(T.customer(s, d).hint(hint), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).as("rev_c"))
      .orderBy(col("c_mktsegment"))

  private def q230(s: SparkSession, d: String): DataFrame = hintedJoin(s, d, "merge")

  private val q230Sql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
              CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q231: SCRIPT TRANSFORM — `SELECT TRANSFORM (...) USING 'cat'`, Hive-style
  // rows-through-an-external-process (the no-serde path: fields
  // tab-delimited, output re-read as strings and cast back). `cat` keeps it
  // deterministic and dependency-free while still exercising the full fork /
  // pipe / re-parse machinery per partition — the escape hatch for legacy
  // streaming scripts (awk/sed/python) inside a SQL pipeline. Values are
  // emitted as BIGINT strings before the pipe so re-parsing is exact.
  // --------------------------------------------------------------------------
  private def q231(s: SparkSession, d: String): DataFrame = {
    T.lineitem(s, d).createOrReplaceTempView("st231_src")
    s.sql("""SELECT CAST(k AS BIGINT) % 100 AS bucket,
                    COUNT(*) AS n, CAST(SUM(CAST(q AS BIGINT)) AS BIGINT) AS qty
             FROM (SELECT TRANSFORM(l_orderkey, CAST(l_quantity AS BIGINT))
                     USING 'cat' AS (k STRING, q STRING)
                   FROM st231_src)
             GROUP BY 1 ORDER BY 1""")
  }

  private val q231Sql =
    """SELECT l_orderkey % 100 AS bucket,
              COUNT(*) AS n, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q232: first/last-touch ATTRIBUTION — for every `purchase` event, the
  // last non-purchase event type strictly before it (last-touch: IGNORE
  // NULLS last_value over ROWS ... 1 PRECEDING) and the first non-purchase
  // type within the preceding 7 days (first-touch: IGNORE NULLS first_value
  // over the q228 calendar-RANGE frame — purchases are CASE'd to NULL, which
  // also excludes the current row). Composes both frame kinds with
  // IGNORE-NULLS navigation (q180) into the standard marketing-funnel
  // operator. One shuffle on user_id; the attribution matrix is tiny.
  // --------------------------------------------------------------------------
  private def q232(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("a232_src")
    s.sql("""WITH base AS (
               SELECT user_id, event_id, ts, event_type,
                 LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END)
                   IGNORE NULLS OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
                 FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END)
                   IGNORE NULLS OVER
                   (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS ft
               FROM a232_src)
             SELECT COALESCE(lt, 'direct') AS last_touch,
                    COALESCE(ft, 'none') AS first_touch,
                    COUNT(*) AS conversions
             FROM base WHERE event_type = 'purchase'
             GROUP BY 1, 2 ORDER BY 1, 2""")
  }

  private val q232Sql =
    """WITH base AS (
         SELECT user_id, event_id, ts, event_type,
           LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
           FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW) AS ft
         FROM events)
       SELECT COALESCE(lt, 'direct') AS last_touch,
              COALESCE(ft, 'none') AS first_touch,
              COUNT(*) AS conversions
       FROM base WHERE event_type = 'purchase'
       GROUP BY 1, 2 ORDER BY 1, 2"""

  // --------------------------------------------------------------------------
  // q233: sum-preserving integer PRORATION (largest-remainder / Hamilton
  // method) — allocate exactly 1,000,000 units across nations proportional
  // to their customers' positive balances: integer base shares by DIV, the
  // leftover distributed one unit each to the largest remainders
  // (deterministic tie-break on nation key). Pure integer arithmetic, so the
  // invariant SUM(units) == 1,000,000 holds bit-exactly in any engine
  // (Round13Spec pins it). The ranking windows run over the
  // NATION-count-sized aggregate (≤25 rows — PlanSpec global-window
  // allowlisted, same dimension-bound class as q98/q146); v*B fits a long
  // through petabyte-scale cents (v ~ 1e15 would overflow at B=1e6 — the
  // documented bound, switch to DECIMAL(38) beyond it).
  // --------------------------------------------------------------------------
  private def q233(s: SparkSession, d: String): DataFrame = {
    T.customer(s, d).createOrReplaceTempView("p233_src")
    s.sql("""WITH nat AS (
               SELECT c_nationkey AS nk,
                      SUM(GREATEST(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0L)) AS v
               FROM p233_src GROUP BY 1),
             tot AS (SELECT nk, v, SUM(v) OVER () AS tv FROM nat),
             alloc AS (
               SELECT nk, v, CAST(v * 1000000L DIV tv AS BIGINT) AS base,
                      (v * 1000000L) % tv AS fr
               FROM tot),
             ranked AS (
               SELECT nk, v, base, fr,
                      ROW_NUMBER() OVER (ORDER BY fr DESC, nk) AS rnk,
                      SUM(base) OVER () AS sb
               FROM alloc)
             SELECT nk, v,
                    base + CASE WHEN rnk <= 1000000L - sb THEN 1L ELSE 0L END AS units
             FROM ranked ORDER BY nk""")
  }

  private val q233Sql =
    """WITH nat AS (
         SELECT c_nationkey AS nk,
                SUM(GREATEST(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0)) AS v
         FROM customer GROUP BY 1),
       tot AS (SELECT nk, v, SUM(v) OVER () AS tv FROM nat),
       alloc AS (
         SELECT nk, v, v * 1000000 // tv AS base, (v * 1000000) % tv AS fr
         FROM tot),
       ranked AS (
         SELECT nk, v, base, fr,
                ROW_NUMBER() OVER (ORDER BY fr DESC, nk) AS rnk,
                SUM(base) OVER () AS sb
         FROM alloc)
       SELECT nk, CAST(v AS BIGINT) AS v,
              CAST(base + CASE WHEN rnk <= 1000000 - sb THEN 1 ELSE 0 END AS BIGINT) AS units
       FROM ranked ORDER BY nk"""

  // --------------------------------------------------------------------------
  // q234: typed `flatMapSortedGroups` — Spark 3.4's secondary-sort group
  // iterator: each customer's orders arrive date-ordered WITHOUT a per-group
  // sort buffer (the shuffle's sort delivers them), so per-key sequence
  // scans (here: inter-order gap statistics) stream in O(1) memory per
  // group — the scalable form of "sort each group then fold" and the typed
  // sibling of q102's mapGroups. Gap days are exact epoch-day differences
  // (order dates are midnight UTC).
  // --------------------------------------------------------------------------
  private def q234(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val MsPerDay = 86400000L
    T.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("o_orderdate"), col("o_orderkey")) { (k, it) =>
        var n = 0L
        var firstKey = 0L; var lastKey = 0L
        var prevDay = Long.MinValue; var maxGap = 0L
        it.foreach { case (_, okey, odate) =>
          val day = Math.floorDiv(odate.getTime, MsPerDay)
          if (n == 0) firstKey = okey
          else if (day - prevDay > maxGap) maxGap = day - prevDay
          prevDay = day; lastKey = okey; n += 1
        }
        Iterator.single((k, n, firstKey, lastKey, maxGap))
      }
      .toDF("o_custkey", "n_orders", "first_key", "last_key", "max_gap_days")
      .orderBy(col("o_custkey"))
  }

  private val q234Sql =
    """WITH s AS (
         SELECT o_custkey, o_orderkey, o_orderdate,
                LAG(o_orderdate) OVER w AS pd,
                FIRST_VALUE(o_orderkey) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS fk,
                LAST_VALUE(o_orderkey) OVER
                  (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
       SELECT o_custkey, COUNT(*) AS n_orders,
              MIN(fk) AS first_key, MAX(lk) AS last_key,
              COALESCE(MAX(DATE_DIFF('day', pd, o_orderdate)), 0) AS max_gap_days
       FROM s GROUP BY 1 ORDER BY 1"""

  val defs: Seq[QDef] = Seq(
    QDef("q225_mode_agg", q225, Some(q225Sql)),
    QDef("q226_freq_items_recheck", q226, Some(q226Sql)),
    QDef("q227_offset_pagination", q227, Some(q227Sql)),
    QDef("q228_rolling_interval_frame", q228, Some(q228Sql)),
    QDef("q229_bfs_reachability", q229, Some(q229Sql)),
    QDef("q230_join_strategy_hints", q230, Some(q230Sql)),
    QDef("q231_script_transform", q231, Some(q231Sql)),
    QDef("q232_touch_attribution", q232, Some(q232Sql)),
    QDef("q233_largest_remainder_proration", q233, Some(q233Sql)),
    QDef("q234_sorted_group_scan", q234, Some(q234Sql)))
}
