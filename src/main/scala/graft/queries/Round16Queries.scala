package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 surface: native distributed DBSCAN — the LAST reference operator
  * (reference `image_masking.ipynb` cells 20-25: sklearn DBSCAN over pixel
  * coordinates, eps=2.5, min_samples=1, driver-local) re-expressed as the
  * scale shape every distributed-DBSCAN paper lands on (grid-blocked
  * ε-neighborhood + connected components over core edges — the MR-DBSCAN /
  * RDD-DBSCAN recipe, published algorithms re-derived, no code). The
  * operator itself lives in graft.operators.Dbscan (fixture-pinned against
  * hand-derived sklearn-contract labelings in DbscanSpec); the stages:
  *
  *   1. CELL BLOCKING (q159's recipe): points hash to cells of side eps; any
  *      pair within eps shares a cell or an adjacent one, so the left side
  *      fans out to its 3×3 neighborhood and candidates come from a plain
  *      EQUI-join on cell id — exact INTEGER distance (dx²+dy² ≤ eps²,
  *      engine-portable) verified inside the block only, never n².
  *   2. CORE points: ≥ min_samples neighbors counting the point itself
  *      (sklearn's contract) — one hash agg over the neighbor pairs.
  *   3. CLUSTERS: connected components over CORE-CORE edges by
  *      HOOK–COMPRESS–CONTRACT (Shiloach–Vishkin): hook to the min
  *      neighbor, pointer-double the parent forest to its roots, contract
  *      the edge list — the supernode graph shrinks geometrically where
  *      q81-style label propagation stalls on converged plateaus (measured
  *      30 rounds without convergence on the sf0.1 ε-graph). A core with no
  *      core neighbor is its own singleton cluster.
  *   4. BORDER points (non-core with a core neighbor) adopt the MINIMUM
  *      cluster label among their core neighbors — deterministic, unlike
  *      sklearn's scan-order-dependent first-come assignment (a documented,
  *      equally valid DBSCAN labeling; min_samples=1 — the reference's
  *      setting — has no border points, so the two agree exactly there).
  *   5. NOISE (no core neighbor) labels -1.
  *
  * The ORACLE replays full DBSCAN relationally in DuckDB: brute-force
  * ε-pairs (quadratic — viable at oracle scale only), degree → core set,
  * WITH RECURSIVE transitive closure over core edges, min-label clusters,
  * border adoption, noise. The hash gates every stage end-to-end.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer outputs, no nested output columns). */
object Round16Queries {

  // --------------------------------------------------------------------------
  // q265: distributed DBSCAN over integer points derived from event ids (the
  // same arithmetic-derived-coordinates trick as q159, so the oracle computes
  // identical points). eps=65, min_samples=4 exercises all three point
  // classes (at sf0.01: 91 clusters, 462 border points, 538 noise); the
  // reference's eps=2.5, min_samples=1 setting
  // degenerates to connected components over the ε-graph, which is exactly
  // stages 1+3 of this pipeline. Scale shape: candidate volume scales with
  // per-cell density (never n²), components converge in O(log n)
  // hook-compress-contract rounds on a geometrically shrinking supernode
  // graph, and the driver-side state is one scalar per round.
  // --------------------------------------------------------------------------
  private def q265(s: SparkSession, d: String): DataFrame = {
    val pts = T.events(s, d)
      .where(col("event_id") % 7 === 0)
      .select(col("event_id").as("id"),
        expr("(event_id * 48271) % 2400").as("x"),
        expr("(event_id * 69621) % 2400").as("y"))
    graft.operators.Dbscan.label(pts, eps = 65L, minSamples = 4)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_points"), sum(col("id")).cast("long").as("id_sum"))
      .orderBy(col("label"))
  }

  private val q265Sql =
    """WITH RECURSIVE pts AS (
         SELECT event_id AS id,
                (event_id * 48271) % 2400 AS x,
                (event_id * 69621) % 2400 AS y
         FROM events WHERE event_id % 7 = 0),
       nbrs AS (
         SELECT a.id AS ida, b.id AS idb
         FROM pts a JOIN pts b
           ON a.id <> b.id
          AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4225),
       core AS (
         SELECT ida AS id FROM nbrs GROUP BY ida HAVING COUNT(*) + 1 >= 4),
       core_edges AS (
         SELECT n.ida AS s, n.idb AS t FROM nbrs n
         JOIN core c1 ON n.ida = c1.id
         JOIN core c2 ON n.idb = c2.id),
       reach(node, r) AS (
         SELECT s, t FROM core_edges
         UNION
         SELECT reach.node, e.t FROM reach JOIN core_edges e ON reach.r = e.s),
       clab AS (
         SELECT c.id, LEAST(c.id, COALESCE(MIN(reach.r), c.id)) AS label
         FROM core c LEFT JOIN reach ON reach.node = c.id
         GROUP BY c.id),
       border AS (
         SELECT n.ida AS id, MIN(cl.label) AS label
         FROM nbrs n
         JOIN clab cl ON n.idb = cl.id
         LEFT JOIN core c ON n.ida = c.id
         WHERE c.id IS NULL
         GROUP BY n.ida),
       labeled AS (
         SELECT id, label FROM clab UNION ALL SELECT id, label FROM border),
       all_pts AS (
         SELECT p.id, COALESCE(l.label, -1) AS label
         FROM pts p LEFT JOIN labeled l ON p.id = l.id)
       SELECT label, COUNT(*) AS n_points, CAST(SUM(id) AS BIGINT) AS id_sum
       FROM all_pts GROUP BY label ORDER BY label"""

  // --------------------------------------------------------------------------
  // q266: MAD ROBUST OUTLIER DETECTION (Hampel filter) — the data-quality
  // gate that survives what the reference's mean±k·σ outlier model (O2) does
  // not: a single extreme value inflates σ and masks every other outlier,
  // while the median and the Median Absolute Deviation have a 50% breakdown
  // point (published robust-statistics method, re-derived). Per event type:
  // med = median(value), MAD = median(|value − med|), outlier ⇔
  // |v − med| > 3·1.4826·MAD (1.4826 = the normal-consistency constant).
  // Everything is integer: cents ×10 for the first interpolated median,
  // ×100 for the second (each interpolation can land on a .5), and the
  // 3·1.4826 = 4.4478 rule cross-multiplied into integers — dev_x10 is in
  // x10 cents and mad_x100 in x100 cents, so dev > 4.4478·mad becomes
  // 100000·dev_x10 > 44478·mad_x100, exact in BIGINT.
  // Scale shape: exact medians are per-group sorts over bounded groups (5
  // event types); the deviations join is a broadcast of 5 medians.
  // --------------------------------------------------------------------------
  private def q266(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("mad_events")
    s.sql("""
      WITH v AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v_c
        FROM mad_events),
      med AS (
        SELECT event_type,
               CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY v_c) * 10 AS BIGINT) AS med_x10
        FROM v GROUP BY event_type),
      dev AS (
        SELECT v.event_type, v.v_c, m.med_x10,
               abs(v.v_c * 10 - m.med_x10) AS dev_x10
        FROM v JOIN med m ON v.event_type = m.event_type),
      mad AS (
        SELECT event_type,
               CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY dev_x10) * 10 AS BIGINT) AS mad_x100
        FROM dev GROUP BY event_type)
      SELECT d.event_type, COUNT(*) AS n,
             MIN(d.med_x10) AS med_x10, MIN(a.mad_x100) AS mad_x100,
             CAST(SUM(CASE WHEN 100000 * d.dev_x10 > 44478 * a.mad_x100
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM dev d JOIN mad a ON d.event_type = a.event_type
      GROUP BY d.event_type ORDER BY d.event_type""")
  }

  private val q266Sql =
    """WITH v AS (
         SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS v_c
         FROM events),
       med AS (
         SELECT event_type,
                CAST(quantile_cont(v_c, 0.5) * 10 AS BIGINT) AS med_x10
         FROM v GROUP BY event_type),
       dev AS (
         SELECT v.event_type, v.v_c, m.med_x10,
                abs(v.v_c * 10 - m.med_x10) AS dev_x10
         FROM v JOIN med m ON v.event_type = m.event_type),
       mad AS (
         SELECT event_type,
                CAST(quantile_cont(dev_x10, 0.5) * 10 AS BIGINT) AS mad_x100
         FROM dev GROUP BY event_type)
       SELECT d.event_type, COUNT(*) AS n,
              MIN(d.med_x10) AS med_x10, MIN(a.mad_x100) AS mad_x100,
              CAST(SUM(CASE WHEN 100000 * d.dev_x10 > 44478 * a.mad_x100
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev d JOIN mad a ON d.event_type = a.event_type
       GROUP BY d.event_type ORDER BY d.event_type"""

  // --------------------------------------------------------------------------
  // q267: TWO-SAMPLE KOLMOGOROV–SMIRNOV TEST — the distribution-shift readout
  // (did arm B's value distribution change shape, not just its mean? q264's
  // z-test can't see that). Arms by user-id parity (the q84/q264 deterministic
  // split); D = max_x |F0(x) − F1(x)| evaluated at every distinct value —
  // exact integer arithmetic: |cum0·n1 − cum1·n0| maximized, then D in basis
  // points by integer division. The cumulative walk is ONE window over the
  // DISTINCT-CENTS aggregate (value range bounds it at ~49k rows, never
  // corpus-sized — the PlanSpec global-window audit note), and the reject
  // decision compares D² against c(0.05)²·(n0+n1)/(n0·n1) with c² = 1.844164
  // as IEEE doubles built from identical expression text in both engines
  // (mult/compare are exactly-rounded and portable; no sqrt, no libm).
  // --------------------------------------------------------------------------
  private def q267(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("ks_events")
    s.sql("""
      WITH v AS (
        SELECT CAST(user_id % 2 AS INT) AS arm,
               CAST(ROUND(value * 100) AS BIGINT) AS v_c
        FROM ks_events),
      per_value AS (
        SELECT v_c,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM v GROUP BY v_c),
      totals AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
        FROM per_value),
      cums AS (
        SELECT v_c,
               SUM(c0) OVER (ORDER BY v_c) AS cum0,
               SUM(c1) OVER (ORDER BY v_c) AS cum1
        FROM per_value),
      dmax AS (
        SELECT MAX(abs(cum0 * (SELECT n1 FROM totals) -
                       cum1 * (SELECT n0 FROM totals))) AS max_abs
        FROM cums)
      SELECT t.n0, t.n1, m.max_abs,
             CAST(10000 * m.max_abs DIV (t.n0 * t.n1) AS BIGINT) AS d_bp,
             CAST(CASE WHEN CAST(m.max_abs AS DOUBLE) * CAST(m.max_abs AS DOUBLE) >
                            1.844164e0 * (t.n0 + t.n1) * t.n0 * t.n1
                       THEN 1 ELSE 0 END AS INT) AS reject05
      FROM totals t CROSS JOIN dmax m
      ORDER BY d_bp""")
  }

  private val q267Sql =
    """WITH v AS (
         SELECT CAST(user_id % 2 AS INT) AS arm,
                CAST(ROUND(value * 100) AS BIGINT) AS v_c
         FROM events),
       per_value AS (
         SELECT v_c,
                CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
         FROM v GROUP BY v_c),
       totals AS (
         SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1
         FROM per_value),
       cums AS (
         SELECT v_c,
                SUM(c0) OVER (ORDER BY v_c) AS cum0,
                SUM(c1) OVER (ORDER BY v_c) AS cum1
         FROM per_value),
       dmax AS (
         SELECT MAX(abs(cum0 * (SELECT n1 FROM totals) -
                        cum1 * (SELECT n0 FROM totals))) AS max_abs
         FROM cums)
       SELECT t.n0, t.n1, CAST(m.max_abs AS BIGINT) AS max_abs,
              CAST(10000 * m.max_abs // (t.n0 * t.n1) AS BIGINT) AS d_bp,
              CAST(CASE WHEN CAST(m.max_abs AS DOUBLE) * CAST(m.max_abs AS DOUBLE) >
                             1.844164e0 * (t.n0 + t.n1) * t.n0 * t.n1
                        THEN 1 ELSE 0 END AS INT) AS reject05
       FROM totals t CROSS JOIN dmax m
       ORDER BY d_bp"""

  // --------------------------------------------------------------------------
  // q268: RECIPROCAL RANK FUSION — the hybrid-retrieval combiner every modern
  // search stack runs to merge a lexical ranker with a second signal
  // (published method: RRF(d) = Σ_r 1/(k + rank_r(d)), k=60). Ranker 1 is
  // lexical: total tf of the query terms {hash, join, scan} per doc (q110's
  // inverted-index shape); ranker 2 is a quality prior: doc length closest
  // to the corpus-median length (the curation heuristic — mid-length docs).
  // Integer-exact end to end: ranks are ROW_NUMBER under total orders,
  // contributions are 1e6 DIV (60 + rank) ppm, and the fused ordering
  // tie-breaks on doc_id. Scale shape: each ranker CUTS to its top-200 with
  // a distributed sort+LIMIT (TakeOrdered — never a corpus-wide window) and
  // only the 200 survivors get ROW_NUMBER'd, so the global windows run over
  // LIMIT-bounded inputs by construction (the PlanSpec audit contract);
  // production fuses per-query candidate lists the same way.
  // --------------------------------------------------------------------------
  private def q268(s: SparkSession, d: String): DataFrame = {
    T.documents(s, d).createOrReplaceTempView("rrf_docs")
    s.sql("""
      WITH toks AS (
        SELECT doc_id, tok
        FROM (SELECT doc_id, explode(filter(split(lower(trim(text)), ' '),
                                            x -> x <> '')) AS tok
              FROM rrf_docs)),
      lex AS (
        SELECT doc_id, COUNT(*) AS tf
        FROM toks WHERE tok IN ('hash', 'join', 'scan')
        GROUP BY doc_id),
      lex_cut AS (
        SELECT doc_id, tf FROM lex ORDER BY tf DESC, doc_id ASC LIMIT 200),
      lex_top AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id ASC) AS r
        FROM lex_cut),
      dl AS (
        SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
      med AS (
        SELECT CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY len) * 2 AS BIGINT) AS med2
        FROM dl),
      len_cut AS (
        SELECT doc_id, abs(len * 2 - (SELECT med2 FROM med)) AS dmid
        FROM dl ORDER BY dmid ASC, doc_id ASC LIMIT 200),
      len_top AS (
        SELECT doc_id, ROW_NUMBER() OVER (ORDER BY dmid ASC, doc_id ASC) AS r
        FROM len_cut),
      fused AS (
        SELECT COALESCE(l.doc_id, q.doc_id) AS doc_id,
               COALESCE(CAST(1000000 AS BIGINT) DIV (60 + l.r), 0) +
               COALESCE(CAST(1000000 AS BIGINT) DIV (60 + q.r), 0) AS rrf_ppm
        FROM lex_top l FULL OUTER JOIN len_top q ON l.doc_id = q.doc_id)
      SELECT doc_id, rrf_ppm
      FROM fused
      ORDER BY rrf_ppm DESC, doc_id ASC LIMIT 20""")
  }

  private val q268Sql =
    """WITH toks AS (
         SELECT doc_id, unnest(list_filter(string_split(lower(trim(text)), ' '),
                                           x -> x <> '')) AS tok
         FROM documents),
       lex AS (
         SELECT doc_id, COUNT(*) AS tf
         FROM toks WHERE tok IN ('hash', 'join', 'scan')
         GROUP BY doc_id),
       lex_cut AS (
         SELECT doc_id, tf FROM lex ORDER BY tf DESC, doc_id ASC LIMIT 200),
       lex_top AS (
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY tf DESC, doc_id ASC) AS r
         FROM lex_cut),
       dl AS (
         SELECT doc_id, COUNT(*) AS len FROM toks GROUP BY doc_id),
       med AS (
         SELECT CAST(quantile_cont(len, 0.5) * 2 AS BIGINT) AS med2 FROM dl),
       len_cut AS (
         SELECT doc_id, abs(len * 2 - (SELECT med2 FROM med)) AS dmid
         FROM dl ORDER BY dmid ASC, doc_id ASC LIMIT 200),
       len_top AS (
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY dmid ASC, doc_id ASC) AS r
         FROM len_cut),
       fused AS (
         SELECT COALESCE(l.doc_id, q.doc_id) AS doc_id,
                COALESCE(1000000 // (60 + l.r), 0) +
                COALESCE(1000000 // (60 + q.r), 0) AS rrf_ppm
         FROM lex_top l FULL OUTER JOIN len_top q ON l.doc_id = q.doc_id)
       SELECT doc_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm
       FROM fused
       ORDER BY rrf_ppm DESC, doc_id ASC LIMIT 20"""

  // --------------------------------------------------------------------------
  // q269: MANN–WHITNEY U TEST — the rank-based two-sample test (the
  // nonparametric sibling of q264's z-test and q267's KS: robust to heavy
  // tails where the mean test is not, sensitive to location where KS spreads
  // power over shape). Arms by user-id parity; ties get AVERAGE ranks, kept
  // exact by working in DOUBLED rank units (avgRank×2 = 2·cumBefore + t + 1,
  // integer). U0×2 = ΣranksA×2 − n0(n0+1) exactly; the normal approximation
  // uses the TIE-CORRECTED variance σ² = (n0·n1/12)·((n+1) − Σ(t³−t)/(n(n−1)))
  // and emits z×1000 — multiplication/division/sqrt on identical expression
  // text are IEEE-portable (the q264 convention), no libm transcendentals.
  // The rank walk is ONE window over the distinct-cents aggregate (the q267
  // audit contract).
  // --------------------------------------------------------------------------
  private def q269(s: SparkSession, d: String): DataFrame = {
    T.events(s, d).createOrReplaceTempView("mwu_events")
    s.sql("""
      WITH v AS (
        SELECT CAST(user_id % 2 AS INT) AS arm,
               CAST(ROUND(value * 100) AS BIGINT) AS v_c
        FROM mwu_events),
      per_value AS (
        SELECT v_c,
               CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
               CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        FROM v GROUP BY v_c),
      ranked AS (
        SELECT v_c, c0, c1, c0 + c1 AS t,
               COALESCE(SUM(c0 + c1) OVER (ORDER BY v_c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM per_value),
      agg AS (
        SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
               CAST(SUM(c0 * (2 * cum_before + t + 1)) AS BIGINT) AS r0_x2,
               CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
        FROM ranked)
      SELECT n0, n1,
             CAST(r0_x2 - n0 * (n0 + 1) AS BIGINT) AS u0_x2,
             CAST(2 * n0 * n1 - (r0_x2 - n0 * (n0 + 1)) AS BIGINT) AS u1_x2,
             CAST(ROUND(1000 * ((CAST(r0_x2 - n0 * (n0 + 1) AS DOUBLE) / 2 -
                                 CAST(n0 AS DOUBLE) * n1 / 2) /
               sqrt(CAST(n0 AS DOUBLE) * n1 / 12 *
                    ((n0 + n1 + 1) - CAST(tie_sum AS DOUBLE) /
                      (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1))))) ) AS BIGINT) AS z_x1000
      FROM agg ORDER BY n0""")
  }

  private val q269Sql =
    """WITH v AS (
         SELECT CAST(user_id % 2 AS INT) AS arm,
                CAST(ROUND(value * 100) AS BIGINT) AS v_c
         FROM events),
       per_value AS (
         SELECT v_c,
                CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
                CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
         FROM v GROUP BY v_c),
       ranked AS (
         SELECT v_c, c0, c1, c0 + c1 AS t,
                COALESCE(SUM(c0 + c1) OVER (ORDER BY v_c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         FROM per_value),
       agg AS (
         SELECT CAST(SUM(c0) AS BIGINT) AS n0, CAST(SUM(c1) AS BIGINT) AS n1,
                CAST(SUM(c0 * (2 * cum_before + t + 1)) AS BIGINT) AS r0_x2,
                CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
         FROM ranked)
       SELECT n0, n1,
              CAST(r0_x2 - n0 * (n0 + 1) AS BIGINT) AS u0_x2,
              CAST(2 * n0 * n1 - (r0_x2 - n0 * (n0 + 1)) AS BIGINT) AS u1_x2,
              CAST(ROUND(1000 * ((CAST(r0_x2 - n0 * (n0 + 1) AS DOUBLE) / 2 -
                                  CAST(n0 AS DOUBLE) * n1 / 2) /
                sqrt(CAST(n0 AS DOUBLE) * n1 / 12 *
                     ((n0 + n1 + 1) - CAST(tie_sum AS DOUBLE) /
                       (CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1))))) ) AS BIGINT) AS z_x1000
       FROM agg ORDER BY n0"""

  // --------------------------------------------------------------------------
  // q270: CUSUM DRIFT DETECTION — the sequential changepoint monitor every
  // data-quality pipeline runs on its daily metrics (did the revenue process
  // shift upward, and WHEN?). The textbook recurrence S_t = max(0, S_{t-1} +
  // (x_t − μ)) is not windowable, but its closed form IS: with prefix sums
  // P_t = Σ(x_i − μ), S_t = P_t − min(0, min_{j≤t} P_j) — the min INCLUDES
  // the current prefix sum (j ≤ t, so S_t clamps at 0 when P_t sets a new
  // minimum, exactly the textbook max(0, ·) recurrence) — one prefix-sum
  // window + one running-min window over the DAILY aggregate (bounded by the
  // calendar, the q267/q269 audit contract). Exact integers throughout:
  // deviations are scaled ×D (days), so μ = T/D never divides — dev_t =
  // D·x_t − T. Output: each day's CUSUM in the top decile of the series,
  // with the global max flagged — the drift report, deterministic.
  // --------------------------------------------------------------------------
  private def q270(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("cusum_orders")
    s.sql("""
      WITH daily AS (
        SELECT o_orderdate AS day,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x_c
        FROM cusum_orders GROUP BY o_orderdate),
      tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS dd, CAST(SUM(x_c) AS BIGINT) AS tt
        FROM daily),
      dev AS (
        SELECT day, x_c, (SELECT dd FROM tot) * x_c - (SELECT tt FROM tot) AS dv
        FROM daily),
      pre AS (
        SELECT day, x_c,
               SUM(dv) OVER (ORDER BY day) AS p
        FROM dev),
      cusum AS (
        SELECT day, x_c,
               p - LEAST(CAST(0 AS BIGINT),
                 MIN(p) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
        FROM pre),
      mx AS (SELECT MAX(s) AS smax FROM cusum)
      SELECT day, x_c, s,
             CAST(CASE WHEN s = (SELECT smax FROM mx) THEN 1 ELSE 0 END AS INT) AS is_peak
      FROM cusum
      WHERE 10 * s >= 9 * (SELECT smax FROM mx)
      ORDER BY day""")
  }

  private val q270Sql =
    """WITH daily AS (
         SELECT o_orderdate AS day,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x_c
         FROM orders GROUP BY o_orderdate),
       tot AS (
         SELECT CAST(COUNT(*) AS BIGINT) AS dd, CAST(SUM(x_c) AS BIGINT) AS tt
         FROM daily),
       dev AS (
         SELECT day, x_c, (SELECT dd FROM tot) * x_c - (SELECT tt FROM tot) AS dv
         FROM daily),
       pre AS (
         SELECT day, x_c,
                SUM(dv) OVER (ORDER BY day) AS p
         FROM dev),
       cusum AS (
         SELECT day, x_c,
                p - LEAST(CAST(0 AS BIGINT),
                  MIN(p) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS s
         FROM pre),
       mx AS (SELECT MAX(s) AS smax FROM cusum)
       SELECT day, x_c, CAST(s AS BIGINT) AS s,
              CAST(CASE WHEN s = (SELECT smax FROM mx) THEN 1 ELSE 0 END AS INT) AS is_peak
       FROM cusum
       WHERE 10 * s >= 9 * (SELECT smax FROM mx)
       ORDER BY day"""

  // --------------------------------------------------------------------------
  // q272: THEIL–SEN ROBUST TREND — the median of all pairwise slopes of the
  // daily revenue series (published robust-regression method, re-derived):
  // up to ~29% of the days can be corrupted before the estimate moves, where
  // q139's OLS slope chases a single bad day. The pair space is
  // CALENDAR-BOUNDED (days², constant in data size — the same boundedness
  // argument as q270's windows), so the self-join is aggregate×aggregate,
  // never corpus². Slopes divide exact integer cents by exact integer day
  // gaps in DOUBLE (IEEE division, identical expression text both engines);
  // the median interpolates two identically-sorted doubles (portable);
  // output ×1000 rounded, with the OLS slope alongside for the robustness
  // contrast.
  // --------------------------------------------------------------------------
  private def q272(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("ts_orders")
    s.sql("""
      WITH daily AS (
        SELECT CAST(datediff(o_orderdate, DATE'1992-01-01') AS BIGINT) AS x,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        FROM ts_orders GROUP BY o_orderdate),
      pairs AS (
        SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
        FROM daily a JOIN daily b ON a.x < b.x),
      sen AS (
        SELECT COUNT(*) AS n_pairs,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY slope) AS med_slope
        FROM pairs),
      ols AS (
        SELECT COUNT(*) AS n_days,
               regr_slope(y, x) AS ols_slope
        FROM daily)
      SELECT o.n_days, p.n_pairs,
             CAST(ROUND(p.med_slope * 1000) AS BIGINT) AS sen_slope_x1000,
             CAST(ROUND(o.ols_slope * 1000) AS BIGINT) AS ols_slope_x1000
      FROM ols o CROSS JOIN sen p
      ORDER BY n_days""")
  }

  private val q272Sql =
    """WITH daily AS (
         SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
         FROM orders GROUP BY o_orderdate),
       pairs AS (
         SELECT CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS slope
         FROM daily a JOIN daily b ON a.x < b.x),
       sen AS (
         SELECT COUNT(*) AS n_pairs,
                quantile_cont(slope, 0.5) AS med_slope
         FROM pairs),
       ols AS (
         SELECT COUNT(*) AS n_days,
                regr_slope(y, x) AS ols_slope
         FROM daily)
       SELECT o.n_days, CAST(p.n_pairs AS BIGINT) AS n_pairs,
              CAST(ROUND(p.med_slope * 1000) AS BIGINT) AS sen_slope_x1000,
              CAST(ROUND(o.ols_slope * 1000) AS BIGINT) AS ols_slope_x1000
       FROM ols o CROSS JOIN sen p
       ORDER BY n_days"""

  // --------------------------------------------------------------------------
  // q273: SPEARMAN RANK CORRELATION — the rank sibling of q89's Pearson:
  // monotone-association strength between per-customer spend and order
  // count, immune to the heavy spend tail that drags Pearson. Ranks use the
  // q269 machinery — AVERAGE ranks for ties kept exact in DOUBLED integer
  // units via a window over each variable's DISTINCT-VALUE aggregate, joined
  // back — and ρ = corr(rank_x×2, rank_y×2) (correlation is scale-invariant,
  // so the doubling changes nothing), ×10000 rounded like q89's corr_bp.
  // Scale note: exact global ranks need a total order; the rank walk here
  // runs over distinct-value aggregates (entity-sized for spend) — at 100 TB
  // the documented swap is q160's range-partitioned distributed enumerate,
  // identical semantics for untied values.
  // --------------------------------------------------------------------------
  private def q273(s: SparkSession, d: String): DataFrame = {
    T.orders(s, d).createOrReplaceTempView("sp_orders")
    s.sql("""
      WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM sp_orders GROUP BY o_custkey),
      rx AS (
        SELECT spend_c, 2 * COALESCE(SUM(t) OVER (ORDER BY spend_c
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS rx2
        FROM (SELECT spend_c, CAST(COUNT(*) AS BIGINT) AS t FROM cust GROUP BY spend_c)),
      ry AS (
        SELECT n_orders, 2 * COALESCE(SUM(t) OVER (ORDER BY n_orders
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS ry2
        FROM (SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS t FROM cust GROUP BY n_orders))
      SELECT COUNT(*) AS n_customers,
             CAST(ROUND(corr(rx.rx2, ry.ry2) * 10000) AS BIGINT) AS spearman_bp,
             CAST(ROUND(corr(c.spend_c, c.n_orders) * 10000) AS BIGINT) AS pearson_bp
      FROM cust c
      JOIN rx ON c.spend_c = rx.spend_c
      JOIN ry ON c.n_orders = ry.n_orders
      ORDER BY n_customers""")
  }

  private val q273Sql =
    """WITH cust AS (
         SELECT o_custkey,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c,
                CAST(COUNT(*) AS BIGINT) AS n_orders
         FROM orders GROUP BY o_custkey),
       rx AS (
         SELECT spend_c, 2 * COALESCE(SUM(t) OVER (ORDER BY spend_c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS rx2
         FROM (SELECT spend_c, CAST(COUNT(*) AS BIGINT) AS t FROM cust GROUP BY spend_c)),
       ry AS (
         SELECT n_orders, 2 * COALESCE(SUM(t) OVER (ORDER BY n_orders
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + t + 1 AS ry2
         FROM (SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS t FROM cust GROUP BY n_orders))
       SELECT COUNT(*) AS n_customers,
              CAST(ROUND(corr(rx.rx2, ry.ry2) * 10000) AS BIGINT) AS spearman_bp,
              CAST(ROUND(corr(c.spend_c, c.n_orders) * 10000) AS BIGINT) AS pearson_bp
       FROM cust c
       JOIN rx ON c.spend_c = rx.spend_c
       JOIN ry ON c.n_orders = ry.n_orders
       ORDER BY n_customers"""

  val defs: Seq[QDef] = Seq(
    QDef("q265_dbscan", q265, Some(q265Sql)),
    QDef("q266_mad_outliers", q266, Some(q266Sql)),
    QDef("q267_ks_test", q267, Some(q267Sql)),
    QDef("q268_rrf_fusion", q268, Some(q268Sql)),
    QDef("q269_mann_whitney", q269, Some(q269Sql)),
    QDef("q270_cusum_drift", q270, Some(q270Sql)),
    QDef("q272_theil_sen", q272, Some(q272Sql)),
    QDef("q273_spearman", q273, Some(q273Sql)))
}
