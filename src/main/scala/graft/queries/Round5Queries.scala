package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 surface: the remaining scan/sink format (native XML), schema-drift
  * union semantics, and the sketch-then-recheck family — the 100 TB pattern where
  * an approximate, mergeable, single-pass structure (Bloom filter, Misra-Gries,
  * HLL) cuts the shuffle volume and an exact recheck restores deterministic
  * results. Also the iterative-graph operator (fixed-iteration PageRank) and the
  * binary-file multimodal ingestion path.
  *
  * All queries follow the SURVEY.md §2b determinism conventions.
  */
object Round5Queries {

  /** Scratch-path scheme shared with SinkQueries: unique per (sfDir, JVM) so spec
    * runs never race Verify; stable within a JVM so Overwrite keeps reruns clean. */
  private def tmp(name: String, sfDir: String): String =
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft_r5_${name}_${Integer.toHexString(sfDir.hashCode)}_p${ProcessHandle.current().pid()}")
      .getAbsolutePath

  // --------------------------------------------------------------------------
  // q120: XML round-trip — Spark 4's NATIVE XML data source (rowTag-framed
  // records, its own parser/generator distinct from CSV/JSON/parquet/ORC).
  // Same contract shape as q53/q54/q91: write the events projection as XML,
  // read it back with an explicit schema (no inference), aggregate; the oracle
  // computes the same aggregate from the original parquet, so writer, reader,
  // and schema fidelity are all on the hash-checked path. XML is the one
  // text format where element ORDER inside a record is producer-defined, so
  // the read relies on name-addressed fields — exactly what the explicit
  // schema declares.
  // --------------------------------------------------------------------------
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def q120(s: SparkSession, d: String): DataFrame = {
    val dir = tmp("events_xml", d)
    T.events(s, d).select("event_id", "user_id", "event_type", "value")
      .write.mode(SaveMode.Overwrite).option("rowTag", "event").xml(dir)
    s.read.schema(eventsSchema).option("rowTag", "event").xml(dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        round(sum(col("value")), 2).as("sum_value"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  private val q120Sql =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS sum_value,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id
       FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------------------
  // q121: unionByName across drifted schemas — the union you actually run at
  // 100 TB, where epoch N+1 of a feed added a column and reordered the rest.
  // Positional UNION would silently pair o_custkey with o_orderkey; BY NAME
  // pairs columns by name and null-fills the column the old epoch lacks
  // (allowMissingColumns). The oracle is DuckDB's UNION ALL BY NAME, which has
  // the identical contract. Downstream agg proves the null-filled column
  // behaves as real SQL NULL (COUNT skips it).
  // --------------------------------------------------------------------------
  private def q121(s: SparkSession, d: String): DataFrame = {
    val o = T.orders(s, d)
    // epoch 1: pre-evolution shape — no priority column, one column order
    val epoch1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // epoch 2: evolved shape — extra column, different column order
    val epoch2 = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_custkey"), col("o_orderpriority"),
        col("o_totalprice"), col("o_orderkey"))
    epoch1.unionByName(epoch2, allowMissingColumns = true)
      .groupBy((col("o_custkey") % 10).as("cust_bucket"))
      .agg(
        count(lit(1)).as("n"),
        count(col("o_orderpriority")).as("n_with_priority"),
        round(sum(col("o_totalprice")), 2).as("sum_price"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy(col("cust_bucket"))
  }

  private val q121Sql =
    """WITH unioned AS (
         SELECT o_orderkey, o_custkey, o_totalprice
         FROM orders WHERE o_orderkey % 2 = 0
         UNION ALL BY NAME
         SELECT o_custkey, o_orderpriority, o_totalprice, o_orderkey
         FROM orders WHERE o_orderkey % 2 = 1)
       SELECT o_custkey % 10 AS cust_bucket, COUNT(*) AS n,
         COUNT(o_orderpriority) AS n_with_priority,
         ROUND(SUM(o_totalprice), 2) AS sum_price,
         MAX(o_orderkey) AS max_key
       FROM unioned GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------------------
  // q122: bigram language-model scoring — the KenLM-class quality signal of a
  // training-data pipeline (low transition probability ⇒ incoherent text),
  // expressed with integer-only arithmetic so both engines agree bit-for-bit:
  // each bigram instance scores c2(w1,w2) * 1_000_000 DIV c1(w1) — its corpus
  // transition probability in ppm — and a doc's score is the mean over its
  // transitions (integer DIV again). No ln/exp: monotone transforms don't
  // change doc ranking, and libm outputs aren't portable across engines.
  // Shape at 100 TB: the two count tables are vocab-sized aggregates (≪ corpus,
  // map-side partial agg), the score join is a plain equi-join on (bg) / (w1)
  // that AQE broadcasts when vocab is small and shuffle-partitions when it
  // isn't; no driver-side state. TWO corpus explode-scans total — the true
  // minimum for count-then-score: c2 is keyed (w1, bg) (bg determines w1, so
  // the grouping cardinality is unchanged) and c1 = Σ_bg c2 is derived from
  // the VOCAB-SIZED c2, never from a third pass over the corpus.
  // --------------------------------------------------------------------------
  private def q122(s: SparkSession, d: String): DataFrame = {
    val toks = T.documents(s, d)
      .select(col("doc_id"), col("lang"), split(trim(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    val big = toks.select(col("doc_id"), col("lang"),
        explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
          .as("bg"))
      .select(col("doc_id"), col("lang"), col("bg.w1").as("w1"),
        concat_ws(" ", col("bg.w1"), col("bg.w2")).as("bg"))
      // no-op semantically (split elements are never null; the score join on w1
      // drops nulls anyway) but load-bearing for the plan: the c1 rollup's join
      // infers isnotnull(w1) and pushes it into ITS copy of the c2full subtree —
      // stating the filter once here keeps both consumers' subtrees canonically
      // identical, so AQE reuses ONE shuffle stage instead of rescanning the
      // corpus for each branch (PlanSpec pins the 2-scan shape)
      .where(col("w1").isNotNull)
    // corpus scan #1: bigram counts, carrying w1 through the grouping key
    val c2full = big.groupBy(col("w1").as("pw"), col("bg").as("cbg"))
      .agg(count(lit(1)).as("c2"))
    // vocab-sized rollup — zero corpus work
    val c1 = c2full.groupBy(col("pw")).agg(sum(col("c2")).as("c1"))
    val c2 = c2full.select(col("cbg").as("bg"), col("c2"))
    // corpus scan #2: the score join
    big.join(c2, "bg")
      .join(c1, col("w1") === col("pw"))
      .withColumn("ppm", expr("c2 * 1000000L DIV c1"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_big"), sum(col("ppm")).as("ppm_sum"))
      .withColumn("avg_ppm", expr("ppm_sum DIV n_big"))
      .orderBy(col("doc_id"))
  }

  private val q122Sql =
    """WITH docs AS (
         SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 2),
       big AS (
         SELECT doc_id, lang,
           unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> toks[i])) AS w1,
           unnest(list_transform(generate_series(1, len(toks) - 1),
             i -> toks[i] || ' ' || toks[i + 1])) AS bg
         FROM docs),
       c2 AS (SELECT bg, COUNT(*) AS c2 FROM big GROUP BY bg),
       c1 AS (SELECT w1 AS pw, COUNT(*) AS c1 FROM big GROUP BY w1)
       SELECT b.doc_id, b.lang, COUNT(*) AS n_big,
         CAST(SUM(c2.c2 * 1000000 // c1.c1) AS BIGINT) AS ppm_sum,
         CAST(SUM(c2.c2 * 1000000 // c1.c1) // COUNT(*) AS BIGINT) AS avg_ppm
       FROM big b JOIN c2 ON b.bg = c2.bg JOIN c1 ON b.w1 = c1.pw
       GROUP BY b.doc_id, b.lang
       ORDER BY b.doc_id"""

  // --------------------------------------------------------------------------
  // q123: Bloom-filter pre-filtered join — the sideways-information-passing
  // pattern that makes 100 TB fact⋈dim joins cheap: one pass over the small
  // side builds a mergeable Bloom filter (here `stat.bloomFilter`, a
  // distributed treeAggregate), the filter is broadcast, and the fact side is
  // pre-filtered BEFORE the shuffle, so only rows that can possibly match are
  // shuffled (~25% here, priority-selective). False positives are removed by
  // the exact join that follows, so the result is deterministic and identical
  // to the plain join — which is exactly what the oracle declares. This is the
  // manual twin of Spark's own runtime row-level bloom filter
  // (spark.sql.optimizer.runtime.bloomFilter.*), declared here because the
  // built-in only kicks in past size thresholds sf0.01 never reaches.
  // The membership probe is a closure UDF by necessity (the sketch object's
  // API); it sits BEFORE the shuffle where it strictly removes work.
  // --------------------------------------------------------------------------
  private def q123(s: SparkSession, d: String): DataFrame = {
    val urgent = T.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate"))
    // Sized from the ACTUAL key count (one cheap action on the small filtered
    // side — at cluster scale, table statistics or countApprox serve the same
    // purpose) so the 1% false-positive rate holds at any scale factor instead
    // of silently degrading past a hardcoded capacity.
    val bf = urgent.stat.bloomFilter("o_orderkey", math.max(urgent.count(), 1L), 0.01)
    val bc = s.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bc.value.mightContain(k))
    T.lineitem(s, d)
      .filter(mightContain(col("l_orderkey")))
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  private val q123Sql =
    """SELECT l_returnflag, COUNT(*) AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE o_orderpriority = '1-URGENT'
       GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------------------
  // q124: heavy hitters via Misra-Gries sketch + exact recheck. Finding items
  // with frequency > n/k exactly requires a full groupBy over every distinct
  // item — at 100 TB that shuffle is the cost. The MG sketch (functions/
  // MisraGries.scala) bounds partial-aggregate state to k counters, merges
  // map-side, and GUARANTEES its candidate set contains every item with true
  // count > n/k. The recheck then broadcasts the tiny candidate list, semi-
  // joins the stream (pre-shuffle row cut, like q123's bloom), and counts
  // exactly only the candidates — so the declared result is the TRUE heavy-
  // hitter set, deterministic under any partitioning, and the oracle is the
  // plain "count > n/k" SQL. Stream = document bigrams (916 distinct at
  // sf0.01), k = 700, so the sketch genuinely evicts and the threshold splits
  // the distribution non-vacuously. TWO corpus scans — the true minimum for
  // sketch-then-recheck: pass 1 computes the MG sketch AND n_total in the SAME
  // aggregate; pass 2 is the exact recheck against the broadcast candidates.
  // --------------------------------------------------------------------------
  private val HHk = 700

  /** One bigram-per-row stream over documents: (bg = "w1 w2"). */
  private def bigramStream(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(split(trim(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
        .as("bg"))

  private def q124(s: SparkSession, d: String): DataFrame = {
    val big = bigramStream(s, d)
    val mg = udaf(new graft.functions.MisraGries(HHk))
    // pass 1: sketch and total count from ONE aggregate over the stream
    val cands = big.agg(mg(col("bg")).as("cands"), count(lit(1)).as("n_total"))
      .select(explode(col("cands")).as("bg"), col("n_total"))
    // pass 2: exact recheck — candidates (≤ k rows) broadcast, n_total rides along
    big.join(broadcast(cands), "bg")
      .groupBy(col("bg"))
      .agg(count(lit(1)).as("cnt"), max(col("n_total")).as("n_total"))
      .filter(col("cnt") * HHk > col("n_total"))
      .select(col("bg"), col("cnt"),
        expr("cnt * 10000L DIV n_total").as("share_bp"))
      .orderBy(col("cnt").desc, col("bg"))
  }

  private val q124Sql =
    s"""WITH docs AS (
         SELECT string_split(trim(text), ' ') AS toks FROM documents
         WHERE len(string_split(trim(text), ' ')) >= 2),
       big AS (
         SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1])) AS bg
         FROM docs),
       c AS (SELECT bg, COUNT(*) AS cnt FROM big GROUP BY bg),
       t AS (SELECT COUNT(*) AS n_total FROM big)
       SELECT bg, cnt, CAST(cnt * 10000 // n_total AS BIGINT) AS share_bp
       FROM c, t WHERE cnt * $HHk > n_total
       ORDER BY cnt DESC, bg"""

  // --------------------------------------------------------------------------
  // q125: PageRank, 5 fixed iterations, integer arithmetic — the iterative
  // graph operator (q81's connected components is the other). Graph: parts
  // co-purchased in the same order (distinct symmetrized pairs from a keyed
  // lineitem self-join — per-order fan-out is bounded by order size, never
  // all-pairs). Ranks live in millionths (rank0 = 1_000_000) and every
  // division is integer DIV: contribution = rank DIV degree, damping
  // 0.85 = 150000 + (85 * Σcontrib) DIV 100 — bit-identical in any engine, so
  // a float-free oracle hash-match over an iterative fixpoint becomes
  // possible (the DuckDB twin unrolls the same 5 steps as chained CTEs).
  // Scale shape: the adjacency-list graph (node-count-sized, degree folded
  // in) is built once and cached; every iteration is ONE node⋈node equi-join
  // (ranks ⋈ adjacency on the node key) + ONE hash agg on dst over the
  // exploded contribution stream — edge-count-sized rows exist only between
  // the explode and its map-side-combined agg, never as a join input; no
  // driver-side state, no collect. Every
  // node of this graph has degree ≥ 1 by construction, so there is no
  // dangling-mass term.
  // --------------------------------------------------------------------------
  private val PrIters = 5

  /** The ranked frame after PrIters iterations plus the two loop caches,
    * pre-materialization — split out so PlanSpec can pin the per-iteration
    * lineage shape (exactly PrIters joins + PrIters aggregates: the persisted
    * links/deg frames hide their subtrees behind InMemoryRelation, so a persist
    * regression would multiply the visible join count). Callers must
    * materialize the result and then unpersist the returned caches. */
  /** Symmetrized distinct co-purchase edge list (src, dst) — pair-gen is one
    * shuffle + in-basket expansion (q132's shape; the keyed self-join would
    * shuffle lineitem twice for the same distinct pairs). Shared by q125's
    * PageRank and q229's BFS so both graph operators walk the same graph. */
  private[queries] def copurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val li = T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val pairs = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .as("e"))
      .select(col("e.p1"), col("e.p2")).distinct()
    pairs.select(col("p1").as("src"), col("p2").as("dst"))
      .union(pairs.select(col("p2").as("src"), col("p1").as("dst")))
  }

  private[graft] def pagerankRanks(s: SparkSession, d: String): (DataFrame, Seq[DataFrame]) = {
    // adjacency-list graph: NODE-count-sized rows (degree folded in), cached
    // once — so the per-iteration join is node⋈node (AQE broadcasts the rank
    // side) and the edge-count-sized contribution stream exists only between
    // the explode and its map-side-combined agg, never as a join input. The
    // flat (src,dst,deg) links form shuffled the full edge table through every
    // iteration's join.
    //
    // r21 (guide §2.4 remove shuffles): the edge-level `.distinct()` exchange
    // is ABSORBED into the adjacency build — collect_set dedups neighbors
    // per node (partial, map-side), and deg = size(set) is exactly the
    // distinct degree, so the raw in-basket pair stream goes through ONE
    // exchange (by node) instead of two (by pair, then by node). Same
    // adjacency, same ranks; plan: 3 Exchanges → 2 before the loop.
    val li = T.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val rawPairs = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), y -> struct(x AS p1, y AS p2))))"))
        .as("e"))
      .select(col("e.p1"), col("e.p2"))
    val undirected = rawPairs.select(col("p1").as("src"), col("p2").as("dst"))
      .union(rawPairs.select(col("p2").as("src"), col("p1").as("dst")))
    val adj = undirected.groupBy(col("src"))
      .agg(collect_set(col("dst")).as("nbrs"))
      .select(col("src"), col("nbrs"), size(col("nbrs")).cast("long").as("deg"))
      .persist()
    var ranks = adj.select(col("src").as("node"), lit(1000000L).as("pr"))
    // Lineage note (round-8 measurement): an eager localCheckpoint after every
    // 2nd iteration was benchmarked and REJECTED — 5-run medians at sf0.1 were
    // 2.89 s plain vs 3.00 s checkpointed (min 2.61 vs 2.72): at 5 iterations
    // the extra materialization costs more than the shallower re-plan saves.
    // Worth revisiting only if the iteration count grows (lineage depth is
    // linear in it) or executor loss mid-loop becomes a real retry concern.
    for (_ <- 1 to PrIters) {
      ranks = adj.join(ranks, col("src") === col("node"))
        .select(explode(col("nbrs")).as("dst"), expr("pr DIV deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("dst").as("node"), expr("150000L + (85 * s) DIV 100").as("pr"))
    }
    val top = ranks.orderBy(col("pr").desc, col("node")).limit(50)
      .select(col("node").as("p_partkey"), col("pr"))
    (top, Seq(adj))
  }

  private def q125(s: SparkSession, d: String): DataFrame = {
    val (top, caches) = pagerankRanks(s, d)
    // q81's convention: materialize the (50-row) result eagerly, then release
    // the loop caches — otherwise every invocation leaks a CacheManager entry
    // (the bench's median-of-3 re-invokes each query, so leaks accumulate)
    val out = top.localCheckpoint(true)
    caches.foreach(_.unpersist())
    out
  }

  private val q125Sql = {
    val base =
      """WITH pairs AS (
           SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
           FROM lineitem a JOIN lineitem b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         edges AS (SELECT p1 AS src, p2 AS dst FROM pairs
                   UNION ALL SELECT p2, p1 FROM pairs),
         deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
         r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg)"""
    val iters = (1 to PrIters).map { i =>
      s""",
         r$i AS (
           SELECT e.dst AS node,
             CAST(150000 + (85 * SUM(r.pr // d.deg)) // 100 AS BIGINT) AS pr
           FROM edges e
           JOIN r${i - 1} r ON e.src = r.node
           JOIN deg d ON e.src = d.src
           GROUP BY e.dst)"""
    }.mkString
    s"""$base$iters
       SELECT node AS p_partkey, pr FROM r$PrIters
       ORDER BY pr DESC, node LIMIT 50"""
  }

  // --------------------------------------------------------------------------
  // q126: `binaryFile` source — the multimodal INGESTION face. Media lands on
  // object stores as loose files, not parquet; Spark's binaryFile source scans
  // a directory tree into (path, modificationTime, length, content) rows with
  // partition planning, glob filtering, and a path/length filter pushdown of
  // its own, and from there the q52 decode pipeline applies unchanged. Here:
  // deterministic grayscale PNGs are materialized to a scratch dir, re-read
  // via binaryFile, decoded (REAL PNG decode, javax.imageio), and reduced to
  // per-image stats. Declared rows-only (the oracle engine cannot read PNGs);
  // Round5Spec pins the exact expected values from an independent in-memory
  // render of the same planes.
  // --------------------------------------------------------------------------
  /** Deterministic test plane k: value (x*31 + y*7 + k*13) mod 256 at (x,y). */
  private[queries] def plane(k: Int, w: Int, h: Int): Array[Double] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 31 + y * 7 + k * 13) % 256).toDouble
    }

  private[queries] val PngCount = 10

  private[queries] def writePngs(dir: String): Unit = {
    val base = new java.io.File(dir)
    base.mkdirs()
    (0 until PngCount).foreach { k =>
      val (w, h) = (20 + k, 12 + k)
      val bytes = graft.multimodal.Codecs.encodePng(plane(k, w, h), w, h)
      java.nio.file.Files.write(
        new java.io.File(base, f"img_$k%02d.png").toPath, bytes)
    }
  }

  private def q126(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = tmp("binpng", d)
    writePngs(dir)
    s.read.format("binaryFile").option("pathGlobFilter", "*.png").load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"), col("content"))
      .as[(String, Long, Array[Byte])]
      .map { case (name, len, payload) =>
        val (px, w, h) = graft.multimodal.Codecs.decodeImage(payload)
        (name, len, w, h, px.sum.toLong)
      }
      .toDF("name", "byte_len", "width", "height", "pix_sum")
      .orderBy(col("name"))
  }

  // --------------------------------------------------------------------------
  // q127: HLL sketches (Apache DataSketches, built into Spark 4) — the
  // MERGEABLE distinct-count structure. q56's approx_count_distinct gives one
  // number and is done; hll_sketch_agg materializes the sketch itself as a
  // binary column, so per-shard/per-day sketches can be stored and UNIONED
  // later without rescanning history — the only workable shape for rolling
  // distinct-users over 100 TB. Here: one sketch per event_type, estimates
  // per group, plus an ALL row whose estimate comes from hll_union_agg over
  // the five group sketches (never from the raw data). Declared rows-only
  // (sketch estimates aren't ANSI-SQL-reproducible); Round5Spec pins both
  // estimates against exact distinct counts (150 users ≪ 2^lgK, so the HLL
  // sparse mode is exact here) and pins union-vs-direct consistency.
  // --------------------------------------------------------------------------
  private def q127(s: SparkSession, d: String): DataFrame = {
    val sk = T.events(s, d)
      .groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .persist()
    val perType = sk.select(col("event_type"),
      hll_sketch_estimate(col("sk")).as("est_users"))
    val all = sk.agg(hll_union_agg(col("sk"), lit(false)).as("u"))
      .select(lit("ALL").as("event_type"),
        hll_sketch_estimate(col("u")).as("est_users"))
    // materialize the 6-row result, then release the sketch cache (q81's
    // convention — see q125) so repeated invocations don't leak cached frames
    val out = perType.unionByName(all).orderBy(col("event_type")).localCheckpoint(true)
    sk.unpersist()
    out
  }

  // --------------------------------------------------------------------------
  // q128: XML scalar functions (to_xml / from_xml, Spark 4) — q120 covers the
  // file format; this covers the per-row functions that handle XML EMBEDDED in
  // a column (the message-queue payload case). Round trip: struct → to_xml →
  // from_xml(explicit schema) → fields, then aggregate the extracted values.
  // The oracle computes the same aggregates straight from the base columns —
  // if serialization or parsing mangled a value, type, or null, the hash breaks.
  // Scale shape: pure row-local projection chain, no shuffle beyond the agg.
  // --------------------------------------------------------------------------
  private def q128(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(col("o_orderkey"),
        expr("""to_xml(struct(o_orderkey AS k, o_orderstatus AS st,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents))""").as("xml"))
      .select(col("o_orderkey"),
        expr("from_xml(xml, 'k BIGINT, st STRING, cents BIGINT')").as("p"))
      .groupBy(col("p.st").as("st"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("p.cents")).as("sum_cents"),
        max(col("p.k")).as("max_key"))
      .orderBy(col("st"))

  private val q128Sql =
    """SELECT o_orderstatus AS st, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       MAX(o_orderkey) AS max_key
       FROM orders GROUP BY o_orderstatus ORDER BY st"""

  // --------------------------------------------------------------------------
  // q129: TRY-family error-safe evaluation (ANSI-mode companion): try_divide
  // nulls on ÷0 instead of raising, try_cast nulls on malformed input,
  // try_element_at nulls out-of-bounds — the semantics that keep a 100 TB job
  // from dying at hour 9 on one dirty row. The oracle spells out the same
  // semantics in portable SQL (NULLIF guards, TRY_CAST, DuckDB's null-on-OOB
  // list indexing), so the hash-match proves the null contracts line up.
  // --------------------------------------------------------------------------
  private def q129(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .select(
        col("o_orderkey"),
        // floor(exact-integer ÷ small-int as IEEE double) is engine-portable;
        // ROUND(quotient, 2) is not (representation-edge half cases).
        expr("""CAST(FLOOR(try_divide(CAST(ROUND(o_totalprice * 100) AS BIGINT),
                 o_custkey % 7)) AS BIGINT)""").as("div7_cents"),
        expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").as("prio_num"),
        expr("try_element_at(split(o_orderpriority, '-'), 5)").as("oob"),
        expr("try_cast(o_orderstatus AS INT)").as("bad_cast"))
      .orderBy(col("o_orderkey"))
      .limit(300)

  private val q129Sql =
    """SELECT o_orderkey,
       CAST(FLOOR(CAST(ROUND(o_totalprice * 100) AS BIGINT)
         / NULLIF(o_custkey % 7, 0)) AS BIGINT) AS div7_cents,
       TRY_CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
       string_split(o_orderpriority, '-')[5] AS oob,
       TRY_CAST(o_orderstatus AS INT) AS bad_cast
       FROM orders ORDER BY o_orderkey LIMIT 300"""

  // --------------------------------------------------------------------------
  // q130: map higher-order functions — transform_keys / transform_values /
  // map_filter / map_zip_with / exists / forall, the row-local map algebra
  // q26's from_json surface stops short of. Maps are CONSTRUCTED from base
  // columns, every HOF output is reduced to a scalar, and the oracle
  // re-derives each scalar from the same base columns with plain arithmetic —
  // so the lambdas' semantics (not map internals) are what hash-matches.
  // All row-local: zero shuffle before the final sort.
  // --------------------------------------------------------------------------
  private def q130(s: SparkSession, d: String): DataFrame =
    T.orders(s, d)
      .filter(col("o_orderkey") < 600)
      .select(col("o_orderkey"),
        expr("map('price', CAST(ROUND(o_totalprice) AS BIGINT), 'cust', o_custkey % 50, 'key', o_orderkey % 100)")
          .as("m1"),
        expr("map('price', 10L, 'cust', 2L, 'key', 1L)").as("w"))
      .select(
        col("o_orderkey"),
        expr("aggregate(map_values(transform_values(m1, (k, v) -> v * 2)), 0L, (a, x) -> a + x)")
          .as("sum_doubled"),
        expr("size(map_filter(m1, (k, v) -> v > 25))").as("n_gt25"),
        expr("aggregate(map_values(map_zip_with(m1, w, (k, v1, v2) -> v1 * v2)), 0L, (a, x) -> a + x)")
          .as("weighted"),
        expr("forall(map_values(m1), v -> v >= 0)").as("all_nonneg"),
        expr("exists(map_keys(transform_keys(m1, (k, v) -> upper(k))), k -> k = 'PRICE')")
          .as("has_price"))
      .orderBy(col("o_orderkey"))

  private val q130Sql =
    """SELECT o_orderkey,
       2 * (CAST(ROUND(o_totalprice) AS BIGINT) + o_custkey % 50 + o_orderkey % 100) AS sum_doubled,
       CAST((CASE WHEN CAST(ROUND(o_totalprice) AS BIGINT) > 25 THEN 1 ELSE 0 END)
          + (CASE WHEN o_custkey % 50 > 25 THEN 1 ELSE 0 END)
          + (CASE WHEN o_orderkey % 100 > 25 THEN 1 ELSE 0 END) AS INT) AS n_gt25,
       10 * CAST(ROUND(o_totalprice) AS BIGINT) + 2 * (o_custkey % 50) + 1 * (o_orderkey % 100) AS weighted,
       TRUE AS all_nonneg,
       TRUE AS has_price
       FROM orders WHERE o_orderkey < 600 ORDER BY o_orderkey"""

  val defs: Seq[QDef] = Seq(
    QDef("q120_xml_roundtrip", q120, Some(q120Sql)),
    QDef("q121_union_by_name", q121, Some(q121Sql)),
    QDef("q122_bigram_lm_score", q122, Some(q122Sql)),
    QDef("q123_bloom_prejoin", q123, Some(q123Sql)),
    QDef("q124_heavy_hitters", q124, Some(q124Sql)),
    QDef("q125_pagerank", q125, Some(q125Sql)),
    QDef("q126_binaryfile_scan", q126, None),
    QDef("q127_hll_sketch_union", q127, None),
    QDef("q128_xml_functions", q128, Some(q128Sql)),
    QDef("q129_try_functions", q129, Some(q129Sql)),
    QDef("q130_map_hof", q130, Some(q130Sql)))
}
