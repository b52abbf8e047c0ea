package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 surface: the mergeable top-k aggregate (and its reservoir-sampling
  * role), degree-oriented triangle counting, incremental partial-aggregate
  * maintenance, Z-order multi-dimensional layout, blocked fuzzy (edit-distance)
  * joins, weighted deterministic source mixing, and quantile-bucket trimming —
  * the remaining aggregation/layout/graph shapes a 100 TB training-data
  * pipeline leans on.
  *
  * All queries follow the SURVEY.md §2b determinism conventions. MERGE INTO was
  * evaluated for this round (VERDICT r5 item 10) and is NOT declarable: Spark 4
  * only plans MERGE against catalogs implementing SupportsRowLevelOperations
  * (Delta/Iceberg class), which the offline session catalog's v1 parquet tables
  * do not — q75's full-outer changeset apply remains the CDC surface.
  */
object Round6Queries {

  /** Scratch-path scheme shared with SinkQueries/Round5Queries. */
  private def tmp(name: String, sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_r6_${name}_${Integer.toHexString(sfDir.hashCode)}_p${ProcessHandle.current().pid()}")
      .getAbsolutePath

  // --------------------------------------------------------------------------
  // q131: mergeable bounded top-k aggregate (functions/TopK.scala) — the
  // aggregation-shaped alternative to q17's window row_number. The window form
  // shuffles and sorts EVERY row of every group; the aggregate form keeps k
  // pairs of partial state per group and combines map-side, so only
  // (groups × k) rows reach the exchange — at 100 TB the difference between
  // shuffling the corpus and shuffling kilobytes. Exactness: top-k under a
  // total order (score DESC, id ASC; ids unique) is a mergeable semigroup, so
  // unlike the MG sketch (q124) no recheck is needed — the oracle is the plain
  // ROW_NUMBER SQL and the hash must match bit-for-bit.
  // --------------------------------------------------------------------------
  private def q131(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK(3))
    T.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"),
        col("o_orderkey"))
      .groupBy(col("prio"))
      .agg(topk(col("cents"), col("o_orderkey")).as("top"))
      .select(col("prio"), posexplode(col("top")))
      .select(col("prio"), (col("pos") + 1).as("rk"),
        col("col._1").as("cents"), col("col._2").as("o_orderkey"))
      .orderBy(col("prio"), col("rk"))
  }

  private val q131Sql =
    """WITH ranked AS (
         SELECT o_orderpriority AS prio,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderkey) AS rk
         FROM orders)
       SELECT prio, CAST(rk AS INT) AS rk, cents, o_orderkey
       FROM ranked WHERE rk <= 3 ORDER BY prio, rk"""

  // --------------------------------------------------------------------------
  // q132: triangle counting + global clustering coefficient over the
  // co-purchase graph (q125's graph, the third graph operator after connected
  // components q81 and PageRank q125). The naive 3-way self-join explodes on
  // hub nodes (a degree-D node contributes D² wedges); the standard fix —
  // orient every edge from the (degree, node)-smaller endpoint to the larger —
  // bounds every node's out-degree by O(√m), so the wedge join is
  // O(m^1.5) worst-case instead of Σ deg² (Schank & Wagner 2005; the same
  // orientation powers every production triangle count). Triangle count is
  // orientation-invariant, so the oracle can use the simple id-orientation.
  // Closure in basis points is integer DIV — hash-matchable.
  // --------------------------------------------------------------------------
  private def q132(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    // pair-gen: ONE shuffle (groupBy order) + in-basket pair expansion — baskets
    // are bounded (TPC-H ≤7 items), so the local quadratic is constant-sized;
    // the self-join form shuffles lineitem twice for the same pairs
    val pairs = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .as("e"))
      .select(col("e.p1"), col("e.p2")).distinct().persist()
    val deg = pairs.select(col("p1").as("n"))
      .union(pairs.select(col("p2").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg")).persist()
    // total order for orientation: (deg, node) compared LEXICOGRAPHICALLY —
    // a packed deg*K+node long is not injective once node ids reach K, which
    // would break the total order (and the count) at large scale factors.
    // deg is node-count-sized, so AQE plans these as broadcast joins.
    val ord1 = deg.select(col("n").as("p1"), col("deg").as("d1"))
    val ord2 = deg.select(col("n").as("p2"), col("deg").as("d2"))
    val oriented = pairs.join(ord1, "p1").join(ord2, "p2")
      .select(when(col("d1") < col("d2") ||
            (col("d1") === col("d2") && col("p1") < col("p2")),
          struct(col("p1").as("src"), col("p2").as("dst")))
        .otherwise(struct(col("p2").as("src"), col("p1").as("dst")))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    // adjacency-intersection form: each triangle {a<b<c} (total order) is counted
    // exactly once, at its oriented edge a→b, as c ∈ N⁺(a) ∩ N⁺(b). Out-degrees
    // are O(√m)-bounded by the orientation, so the neighbor arrays stay small and
    // the count is edge-count-sized rows × an array intersect — the Σ-out-deg²
    // wedge stream (41M rows at sf0.1, 10× the edges) never materializes.
    val adj = oriented.groupBy(col("src")).agg(collect_list(col("dst")).as("nbrs"))
    val tri = oriented
      .join(adj.select(col("src").as("u"), col("nbrs").as("nu")), col("src") === col("u"))
      .join(adj.select(col("src").as("v"), col("nbrs").as("nv")), col("dst") === col("v"), "left")
      .agg(sum(when(col("nv").isNull, lit(0))
        .otherwise(size(array_intersect(col("nu"), col("nv"))))).as("n_triangles"))
    val nodeStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    val edgeStats = pairs.agg(count(lit(1)).as("n_edges"))
    val out = tri.crossJoin(broadcast(nodeStats)).crossJoin(broadcast(edgeStats))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        expr("30000 * n_triangles DIV n_wedges").as("closure_bp"))
      .orderBy(col("n_nodes"))
      .localCheckpoint(true)
    oriented.unpersist(); deg.unpersist(); pairs.unpersist()
    out
  }

  private val q132Sql =
    """WITH pairs AS (
         SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
       deg AS (SELECT n, COUNT(*) AS deg
               FROM (SELECT p1 AS n FROM pairs UNION ALL SELECT p2 FROM pairs)
               GROUP BY n),
       tri AS (SELECT COUNT(*) AS n_triangles
               FROM pairs e1
               JOIN pairs e2 ON e1.p1 = e2.p1 AND e1.p2 < e2.p2
               JOIN pairs e3 ON e3.p1 = e1.p2 AND e3.p2 = e2.p2),
       nodestats AS (SELECT COUNT(*) AS n_nodes,
                       CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
                     FROM deg),
       edgestats AS (SELECT COUNT(*) AS n_edges FROM pairs)
       SELECT n_nodes, n_edges, n_triangles,
         CAST(30000 * n_triangles // n_wedges AS BIGINT) AS closure_bp
       FROM tri, nodestats, edgestats ORDER BY n_nodes"""

  // --------------------------------------------------------------------------
  // q133: incremental aggregate maintenance — the materialized-view pattern
  // that keeps 100 TB dashboards cheap: per-day PARTIAL aggregates (count, sum,
  // min, max — all algebraic, so partials merge losslessly) are persisted once,
  // and the monthly rollup is computed by MERGING day partials (day-count-sized
  // input) instead of rescanning raw history. avg is derived at finish from
  // merged sum/count (integer DIV), never averaged across partials — the
  // classic algebraic-vs-holistic distinction. The oracle aggregates the RAW
  // table directly, so the hash proves partial-merge == direct.
  // --------------------------------------------------------------------------
  private def q133(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("daily_partials", d)
    T.events(s, d)
      .select(date_trunc("day", col("ts")).as("day"), col("event_type"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
    s.read.parquet(dir)
      .groupBy(date_format(col("day"), "yyyy-MM").as("month"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"), max(col("max_cents")).as("max_cents"))
      .withColumn("avg_cents", expr("sum_cents DIV n"))
      .orderBy(col("month"), col("event_type"))
  }

  private val q133Sql =
    """SELECT strftime(ts, '%Y-%m') AS month, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MIN(CAST(ROUND(value * 100) AS BIGINT)) AS min_cents,
       MAX(CAST(ROUND(value * 100) AS BIGINT)) AS max_cents,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) // COUNT(*) AS BIGINT) AS avg_cents
       FROM events GROUP BY 1, 2 ORDER BY month, event_type"""

  // --------------------------------------------------------------------------
  // q134: Z-order (Morton) layout — multi-dimensional clustering without a
  // table format: interleave the bits of two bucketed dimensions into one
  // z-value, range-partition + sort the write on it, and a 2-D box predicate
  // prunes on BOTH dimensions from one sort order (parquet zone maps per file/
  // row-group carry min/max of cb, db AND z). A single-column sort would prune
  // only its leading dimension. The z computation is pure integer bit math —
  // identical in both engines — and the box aggregate over the re-read layout
  // must equal the oracle's direct filter over raw orders, proving the layout
  // is a pure re-arrangement.
  // --------------------------------------------------------------------------
  /** Bit-interleave two 8-bit columns: a in even positions, b in odd. */
  private def zSpark(a: String, b: String): String =
    (0 until 8).map(i =>
      s"(shiftleft(shiftright($a, $i) & 1, ${2 * i}) + shiftleft(shiftright($b, $i) & 1, ${2 * i + 1}))")
      .mkString("(", " + ", ")")

  private def zDuck(a: String, b: String): String =
    (0 until 8).map(i =>
      s"(((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1}))")
      .mkString("(", " + ", ")")

  private def q134(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("zorder", d)
    T.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").as("cents"),
        (col("o_custkey") % 256).as("cb"),
        (dayofyear(col("o_orderdate")) % 256).as("db"))
      .withColumn("z", expr(zSpark("cb", "db")))
      .repartitionByRange(8, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode(SaveMode.Overwrite).parquet(dir)
    s.read.parquet(dir)
      .filter(col("cb").between(16, 79) && col("db").between(32, 159))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        sum(col("z")).as("sum_z"))
      .orderBy(col("o_orderstatus"))
  }

  private val q134Sql = {
    val z = zDuck("(o_custkey % 256)", "(dayofyear(o_orderdate) % 256)")
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(SUM($z) AS BIGINT) AS sum_z
       FROM orders
       WHERE (o_custkey % 256) BETWEEN 16 AND 79
         AND (dayofyear(o_orderdate) % 256) BETWEEN 32 AND 159
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""
  }

  // --------------------------------------------------------------------------
  // q135: blocked fuzzy join (edit distance ≤ 3) — the entity-resolution /
  // catalog-dedup operator. ALL-PAIRS levenshtein is quadratic and off the
  // table at any scale; the standard shape is block-then-verify: (1) dedupe to
  // DISTINCT keys first (match the dictionary, not the rows — 64 names here,
  // not 2000 parts), (2) join only within cheap equality blocks (last word),
  // (3) run the expensive verifier inside blocks only. Levenshtein is built-in
  // and identically defined in both engines, so the pair list hash-matches.
  // Recall note documented: cross-block matches (typo in the blocking word) are
  // out of contract — production stacks add a second blocking pass (q36's LSH
  // is this engine's recall-oriented sibling).
  // --------------------------------------------------------------------------
  private def q135(s: SparkSession, d: String): DataFrame = {
    val names = T.part(s, d).select(col("p_name")).distinct()
      .withColumn("blk", element_at(split(col("p_name"), " "), -1))
    val l = names.select(col("p_name").as("n1"), col("blk"))
    val r = names.select(col("p_name").as("n2"), col("blk").as("blk2"))
    l.join(r, col("blk") === col("blk2") && col("n1") < col("n2"))
      .withColumn("dist", levenshtein(col("n1"), col("n2")))
      .filter(col("dist") <= 3)
      .select(col("n1"), col("n2"), col("dist"))
      .orderBy(col("n1"), col("n2"))
  }

  private val q135Sql =
    """WITH names AS (
         SELECT DISTINCT p_name, string_split(p_name, ' ')[-1] AS blk FROM part)
       SELECT a.p_name AS n1, b.p_name AS n2,
         CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
       FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
       WHERE levenshtein(a.p_name, b.p_name) <= 3
       ORDER BY n1, n2"""

  // --------------------------------------------------------------------------
  // q136: deterministic per-group reservoir sample — q131's TopK aggregate in
  // its second role: top-k by a content hash IS a uniform k-sample that is
  // reproducible across engines, runs, partitionings, and cluster sizes
  // (rand() reservoirs are none of those). Same portable md5→56-bit-integer
  // score as q84/q97; the aggregate keeps k pairs of state per language where
  // the window form would sort every document. This is how you carve a fixed
  // human-eval set per language out of a 100 TB corpus and get the SAME set
  // every time.
  // --------------------------------------------------------------------------
  private def q136(s: SparkSession, d: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK(5))
    T.documents(s, d)
      .select(col("lang"), col("doc_id"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14), 16, 10) AS BIGINT)")
          .as("score"))
      .groupBy(col("lang"))
      .agg(topk(col("score"), col("doc_id")).as("sample"))
      .select(col("lang"), posexplode(col("sample")))
      .select(col("lang"), (col("pos") + 1).as("rk"), col("col._2").as("doc_id"))
      .orderBy(col("lang"), col("rk"))
  }

  private val q136Sql =
    """WITH scored AS (
         SELECT lang, doc_id,
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) AS score
         FROM documents),
       ranked AS (
         SELECT lang, doc_id,
           ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, doc_id) AS rk
         FROM scored)
       SELECT lang, CAST(rk AS INT) AS rk, doc_id
       FROM ranked WHERE rk <= 5 ORDER BY lang, rk"""

  // --------------------------------------------------------------------------
  // q137: weighted deterministic source interleaving — the data-mixing
  // schedule of a training run: each source advances through a virtual
  // timeline at rate 1/weight (position = rank_in_source × 1e6 DIV weight), and
  // reading the merged timeline in position order yields source proportions
  // equal to the weights, with each source internally in its own stable order.
  // Everything is integer arithmetic over deterministic ranks, so the schedule
  // (unlike sampling-based mixing) is bit-reproducible across engines and
  // epochs — and resumable from any cut point. The first 200 slots are taken
  // and summarized per source: the weighted sources (src0–4, weight 3) must
  // fill ~3× the slots of weight-1 sources.
  // --------------------------------------------------------------------------
  private def q137(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), col("source"))
      .withColumn("w",
        expr("CASE WHEN CAST(substring(source, 4) AS INT) < 5 THEN 3 ELSE 1 END"))
    docs
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("source")).orderBy(col("doc_id"))))
      .withColumn("pos", expr("rn * 1000000L DIV w"))
      .orderBy(col("pos"), col("source"), col("doc_id"))
      .limit(200)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_taken"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
        expr("CAST(MAX(rn) AS BIGINT)").as("depth"))
      .orderBy(col("source"))
  }

  private val q137Sql =
    """WITH w AS (
         SELECT doc_id, source,
           CASE WHEN CAST(substr(source, 4) AS INT) < 5 THEN 3 ELSE 1 END AS w
         FROM documents),
       r AS (
         SELECT doc_id, source, w,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         FROM w),
       p AS (SELECT doc_id, source, rn, rn * 1000000 // w AS pos FROM r),
       take AS (SELECT * FROM p ORDER BY pos, source, doc_id LIMIT 200)
       SELECT source, COUNT(*) AS n_taken,
         MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
         CAST(MAX(rn) AS BIGINT) AS depth
       FROM take GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------------------
  // q138: quantile-bucket trimmed statistics (IQR-style): per event type, rank
  // rows into 4 ntile buckets under a TOTAL order (value cents, then event_id —
  // ties broken deterministically, which is what makes ntile portable across
  // engines), drop the extreme quartiles, and aggregate the middle half — the
  // robust-mean gate that keeps sensor glitches out of a 100 TB metric
  // pipeline. ntile's SQL-standard definition (equal buckets, remainder to the
  // leading buckets) is identical in Spark and DuckDB; all outputs integer.
  // --------------------------------------------------------------------------
  private def q138(s: SparkSession, d: String): DataFrame = {
    val cents = T.events(s, d)
      .select(col("event_type"), col("event_id"),
        expr("CAST(ROUND(value * 100) AS BIGINT)").as("cents"))
    cents
      .withColumn("q4", ntile(4).over(
        Window.partitionBy(col("event_type")).orderBy(col("cents"), col("event_id"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("q4").isin(2, 3), 1).otherwise(0)).as("n_kept"),
        sum(when(col("q4").isin(2, 3), col("cents"))).as("kept_cents"))
      .withColumn("trimmed_avg_cents", expr("kept_cents DIV n_kept"))
      .orderBy(col("event_type"))
  }

  private val q138Sql =
    """WITH b AS (
         SELECT event_type, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents,
           NTILE(4) OVER (PARTITION BY event_type
             ORDER BY CAST(ROUND(value * 100) AS BIGINT), event_id) AS q4
         FROM events)
       SELECT event_type, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN q4 IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN q4 IN (2, 3) THEN cents END) AS BIGINT) AS kept_cents,
         CAST(SUM(CASE WHEN q4 IN (2, 3) THEN cents END)
           // SUM(CASE WHEN q4 IN (2, 3) THEN 1 ELSE 0 END) AS BIGINT) AS trimmed_avg_cents
       FROM b GROUP BY event_type ORDER BY event_type"""

  val defs: Seq[QDef] = Seq(
    QDef("q131_topk_aggregate", q131, Some(q131Sql)),
    QDef("q132_triangle_count", q132, Some(q132Sql)),
    QDef("q133_incremental_agg", q133, Some(q133Sql)),
    QDef("q134_zorder_layout", q134, Some(q134Sql)),
    QDef("q135_fuzzy_blocked_join", q135, Some(q135Sql)),
    QDef("q136_reservoir_sample", q136, Some(q136Sql)),
    QDef("q137_source_mixing", q137, Some(q137Sql)),
    QDef("q138_iqr_trimmed_stats", q138, Some(q138Sql)))
}
