package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis / deduplication operators over `documents` — the training-data
  * pipeline surface (BASELINE.json north star): tokenization, term frequency, exact
  * dedup, MinHash+LSH near-dup, SimHash, n-gram Jaccard, language-ID heuristics,
  * quality scoring, and document fingerprinting.
  *
  * Portability note: near-dup signatures need a hash both engines compute bit-for-bit
  * identically, so the declared queries use a polynomial character hash
  * `fold(31·acc + ascii(c)) mod 1e9+7` expressible in Spark SQL higher-order
  * functions AND DuckDB lambdas. At 100 TB you would swap it for the codegen'd
  * `xxhash64` built-in (same pipeline shape, one expression changed); the oracle keeps
  * the portable form so results stay checkable.
  */
object TextQueries {

  /** Spark-SQL polynomial char hash of a string expression (rolling-hash
    * fingerprinting; used where the technique itself is the declared op). */
  private def hashExpr(e: String): String =
    s"aggregate(split($e, ''), 0L, (a, c) -> (a * 31 + ascii(c)) % 1000000007)"

  /** DuckDB twin of [[hashExpr]]. */
  private def duckHash(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split($e, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * 31 + b) % 1000000007)"

  /** Fast portable token hash (DuckDB side): first 56 bits of md5, mod 1e9+7. md5 is
    * codegen'd in Spark (far faster than a per-char lambda fold) and DuckDB parses
    * the same hex prefix via a 0x-cast — identical values on both engines. At 100 TB
    * the one-line swap is xxhash64 (no oracle twin, so not used for declared
    * queries). The Spark twin is inlined in [[minhashSigs]]. */
  private def duckTokHash(e: String): String =
    s"CAST(('0x' || substring(md5($e), 1, 14)) AS BIGINT) % 1000000007"

  /** DuckDB CTE: long-form (doc_id, token hash) rows for the oracle side. */
  private val duckTokenCte =
    s"""WITH toks AS (
         SELECT doc_id, unnest(list_distinct(string_split(trim(text), ' '))) AS tok
         FROM documents),
       th AS (SELECT doc_id, ${duckTokHash("tok")} AS h FROM toks)"""

  /** (doc_id, hs: array of token hashes) — per-row, shuffle-free. */
  private def tokenHashArrays(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("toks", array_distinct(split(trim(col("text")), " ")))
      .withColumn("hs", expr(
        "transform(toks, t -> CAST(conv(substring(md5(t), 1, 14), 16, 10) AS BIGINT) % 1000000007)"))

  /** Token counts: tokenize + explode + group — the text twin of word-count.
    * Top-50 with a total ordering (count desc, token) so the cut is deterministic. */
  private def q32(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(explode(split(trim(col("text")), " ")).as("token"),
        col("doc_id"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n").desc, col("token"))
      .limit(50)

  private val q32Sql =
    """SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
       FROM (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents)
       GROUP BY token
       ORDER BY n DESC, token
       LIMIT 50"""

  /** Term frequency per document (docs 0..49). */
  private def q33(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      // tf emitted in basis points (×10000, rounded to integer): ratios of small ints
      // (e.g. 1/32) hit exact decimal ties where Spark's HALF_UP and DuckDB's
      // multiply-then-round disagree; scaled-integer ties are exact binary halves that
      // both engines round identically (away from zero).
      .withColumn("tf_bp", round(col("cnt") * 10000.0 /
        sum(col("cnt")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
        .cast("long"))
      .orderBy(col("doc_id"), col("token"))

  private val q33Sql =
    """WITH t AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
         FROM documents WHERE doc_id < 50),
       c AS (SELECT doc_id, token, COUNT(*) AS cnt FROM t GROUP BY doc_id, token)
       SELECT doc_id, token, cnt,
         CAST(ROUND(cnt * 10000.0 / SUM(cnt) OVER (PARTITION BY doc_id)) AS BIGINT) AS tf_bp
       FROM c
       ORDER BY doc_id, token"""

  /** Exact deduplication by content hash (md5): corpus-level counts. */
  private def q34(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_distinct_texts"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"))
      .orderBy(col("n_docs"))

  private val q34Sql =
    """SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_distinct_texts,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dup_docs
       FROM documents
       ORDER BY n_docs"""

  private val P = 1000000007L
  /** j-th minhash permutation of token hash h (j in 0..15). */
  private def perm(j: Int, h: String) = s"(($h * ${2 * j + 3} + ${j * 7919 + 1}) % $P)"

  /** All 16 minhashes computed PER ROW with higher-order functions — token hashing
    * and the 16 permutation-mins never leave the row, so the whole signature stage is
    * a shuffle-free narrow projection (the original explode → groupBy(doc_id) formul-
    * ation shuffled every (doc, token) pair just to bring them back together). The
    * runtime j in the lambda evaluates the same arithmetic as the per-j constants in
    * [[perm]], so oracle values are unchanged. */
  /** Per-row 16-permutation minhash signature array. IMPORTANT: downstream
    * consumers must reference `mh` exactly ONCE (a generator or a single expression
    * alias) — CollapseProject inlines interpreted higher-order lambdas once per
    * reference, and 16 references re-hash every token 16 times (measured 16× blowup
    * at sf0.1). q35 therefore emits long form via posexplode; q36 builds its band
    * signatures inside one expression. */
  private def minhashSigs(s: SparkSession, d: String): DataFrame =
    tokenHashArrays(s, d)
      .withColumn("mh", expr(
        s"transform(sequence(0, 15), j -> array_min(transform(hs, h -> (h * (2 * j + 3) + j * 7919 + 1) % $P)))"))
      .select(col("doc_id"), col("mh"))

  /** MinHash signatures per document, long form (doc_id, permutation j, minhash). */
  private def q35(s: SparkSession, d: String): DataFrame =
    minhashSigs(s, d)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), posexplode(col("mh")).as(Seq("j", "mh")))
      .orderBy(col("doc_id"), col("j"))

  private val q35Sql =
    s"""$duckTokenCte
       SELECT doc_id, CAST(j AS INT) AS j,
         MIN((h * (2 * j + 3) + j * 7919 + 1) % $P) AS mh
       FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)
       WHERE doc_id < 100
       GROUP BY doc_id, j ORDER BY doc_id, j"""

  /** LSH banding on the 16 minhashes (4 bands × 4 rows) -> DISTINCT candidate
    * near-dup pairs (d1 < d2). The band-signature equi-join is what makes near-dup
    * O(n·bands) instead of O(n²) at corpus scale: only docs sharing a band
    * signature ever meet in the join. Shared by q36 (pair count) and q81
    * (connected-component clusters). */
  private def lshPairs(s: SparkSession, d: String): DataFrame = {
    // 3-gram SHINGLE input, not token sets: this corpus has a ~31-word vocabulary,
    // so every document contains most of the vocabulary, token-set Jaccard is
    // uniformly high, and LSH buckets explode (measured 6.3M candidate pairs at
    // sf0.1); shingles live in a ~|V|³ space where random documents rarely collide —
    // which is why MinHash is defined over w-shingles. The CASE guard matters:
    // Spark's sequence(1, n) DESCENDS when n < 1, so a <3-token doc would evaluate
    // element_at(toks, 0) and throw.
    //
    // Execution shape: explode shingles to long form, hash with CODEGEN'd md5/conv,
    // fold the 16 permutation-mins in a partial-aggregating HashAggregate, at the
    // cost of the standard minhash shuffle (one row per shingle); the HOF form
    // survives in q35/minhashSigs where the signature itself is the output.
    // Head-to-head (Q36Probe, sf0.1, local[16], median of 5 warm runs each,
    // identical 1009-pair result): explode 1.19 s vs per-row-HOF 2.07 s — the
    // codegen'd long form is ~42% faster warm; round 2's apparent 7.4 s was
    // single-run hash-order bench noise, not a plan regression.
    val shingleHashes = T.documents(s, d)
      .withColumn("toks", split(trim(col("text")), " "))
      .select(col("doc_id"), posexplode(expr(
        "CASE WHEN size(toks) < 3 THEN array() ELSE array_distinct(transform(sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))) END"))
        .as(Seq("pos", "sh")))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(sh), 1, 14), 16, 10) AS BIGINT) % 1000000007"))
    val mins = (0 until 16).map(j =>
      min(expr(perm(j, "h"))).as(s"mh$j"))
    val sigs = shingleHashes.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
    val bands = sigs.select(col("doc_id"),
      posexplode(array((0 until 4).map(b =>
        concat_ws("_", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*)): _*))
        .as(Seq("band", "sig")))
    // pair generation INSIDE each band bucket (groupBy + per-bucket combinations)
    // rather than a self-join of the signature table: signatures are computed once,
    // only same-signature docs ever meet, and the shuffle carries one row per
    // (band, sig) bucket — the shape that survives a billion-document corpus
    bands
      .groupBy(col("band"), col("sig"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))"))
        .as("p"))
      .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
      .distinct()
  }

  private def q36(s: SparkSession, d: String): DataFrame =
    lshPairs(s, d)
      .agg(count(lit(1)).as("n_candidate_pairs"))
      .orderBy(col("n_candidate_pairs"))

  /** Shared DuckDB CTE chain: documents → shingles → minhash sigs → bands →
    * distinct candidate pairs (the oracle twin of [[lshPairs]]). */
  private val lshPairCtes: String = {
    val mins = (0 until 16).map(j => s"MIN(${perm(j, "h")}) AS mh$j").mkString(", ")
    val bandSelects = (0 until 4).map { b =>
      val sig = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)").mkString(" || '_' || ")
      s"SELECT doc_id, $b AS band, $sig AS sig FROM sigs"
    }.mkString(" UNION ALL ")
    s"""docs AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       shingles AS (
         SELECT doc_id, unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS tok
         FROM docs),
       th AS (SELECT doc_id, ${duckTokHash("tok")} AS h FROM shingles),
       sigs AS (SELECT doc_id, $mins FROM th GROUP BY doc_id),
       bands AS ($bandSelects),
       pairs AS (
         SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)"""
  }

  private val q36Sql =
    s"""WITH $lshPairCtes
       SELECT COUNT(*) AS n_candidate_pairs FROM pairs
       ORDER BY n_candidate_pairs"""

  /** Near-dup CLUSTERS from the LSH candidate pairs: connected components via
    * the shared hook–compress–contract engine
    * ([[graft.operators.ConnectedComponents]]) — the same CC implementation
    * DBSCAN cluster formation uses, replacing this query's former min-label
    * propagation loop (O(diameter) rounds, stalls on converged plateaus; the
    * engine's scaladoc records the measurements). This is the step real dedup
    * pipelines run after candidate generation (pick one representative per
    * duplicate cluster). The LSH candidate edge list is orders of magnitude
    * smaller than the corpus, so at test scale the engine's bounded local
    * finish resolves it in one collect + one broadcast-mapped join; at
    * pathological near-dup density the distributed contraction rounds bound
    * the work at O(log n) node-sized joins either way.
    * Oracle: DuckDB WITH RECURSIVE transitive closure over the same pairs. */
  private def q81(s: SparkSession, d: String): DataFrame = {
    val pairs = lshPairs(s, d).cache()
    // symmetric=false: the generator emits each pair once (d1 < d2); the
    // engine adds the reverse direction itself
    val nodes = pairs.select(col("d1").as("node"))
      .union(pairs.select(col("d2").as("node"))).distinct()
    val finalLabels = graft.operators.ConnectedComponents.run(
      nodes, pairs.select(col("d1").as("src"), col("d2").as("dst")))
    val out = finalLabels
      .groupBy(col("label").as("rep"))
      .agg(count(lit(1)).as("n_docs"),
        // joined string, not array: the driver's oracle compare sorts rows in
        // pandas, which cannot hash numpy arrays (r03 q81 failure). Sort
        // numerically first, then render — matches DuckDB list_sort semantics.
        expr("array_join(transform(array_sort(collect_list(node)), x -> cast(x AS string)), ',')")
          .as("members"))
      .orderBy(col("rep"))
    // finalLabels is checkpointed (materialized) by the engine, so the
    // candidate cache can be released before the caller consumes `out`
    pairs.unpersist()
    out
  }

  private val q81Sql =
    s"""WITH RECURSIVE $lshPairCtes,
       edges AS (SELECT d1 AS s, d2 AS t FROM pairs
                 UNION ALL SELECT d2 AS s, d1 AS t FROM pairs),
       reach(node, r) AS (
         SELECT s, t FROM edges
         UNION
         SELECT reach.node, e.t FROM reach JOIN edges e ON reach.r = e.s),
       rep AS (SELECT node, LEAST(node, MIN(r)) AS rep FROM reach GROUP BY node)
       SELECT rep, COUNT(*) AS n_docs,
         array_to_string(list_sort(list(node)), ',') AS members
       FROM rep GROUP BY rep ORDER BY rep"""

  /** 16-bit SimHash per document: sign-sum of token-hash bits, computed entirely
    * per-row with nested folds (no explode-over-bits shuffle). */
  private def q37(s: SparkSession, d: String): DataFrame =
    tokenHashArrays(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 15), CAST(0 AS BIGINT), (acc, b) ->
          |  acc + IF(aggregate(hs, 0, (s2, h) -> s2 + IF(((h >> b) & 1) = 1, 1, -1)) > 0,
          |           shiftleft(CAST(1 AS BIGINT), b), CAST(0 AS BIGINT)))""".stripMargin)
        .as("simhash"))
      .orderBy(col("doc_id"))

  private val q37Sql =
    s"""$duckTokenCte,
       bits AS (
         SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         FROM th CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS b)
         WHERE doc_id < 200
         GROUP BY doc_id, b)
       SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id ORDER BY doc_id"""

  /** Token-set and 3-gram-shingle Jaccard similarity on adjacent doc pairs. */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
      .select(col("doc_id"), split(trim(col("text")), " ").as("toks"))
    val sh =
      "CASE WHEN size(%s) < 3 THEN array() ELSE array_distinct(transform(sequence(1, size(%s) - 2), i -> concat(element_at(%s, i), ' ', element_at(%s, i + 1), ' ', element_at(%s, i + 2)))) END"
    val a = docs.filter(col("doc_id") < 99).select(
      col("doc_id").as("d1"), array_distinct(col("toks")).as("ts1"),
      expr(sh.format("toks", "toks", "toks", "toks", "toks")).as("sh1"))
    val b = docs.select(
      col("doc_id").as("d2"), array_distinct(col("toks")).as("ts2"),
      expr(sh.format("toks", "toks", "toks", "toks", "toks")).as("sh2"))
    a.join(b, col("d2") === col("d1") + 1)
      .select(
        col("d1"), col("d2"),
        // basis points, not round(x,4): int-ratio decimal ties round differently
        // across engines (see q33 comment)
        round(size(array_intersect(col("ts1"), col("ts2"))) * 10000.0 /
          size(array_union(col("ts1"), col("ts2")))).cast("long").as("jac_tokens_bp"),
        round(size(array_intersect(col("sh1"), col("sh2"))) * 10000.0 /
          size(array_union(col("sh1"), col("sh2")))).cast("long").as("jac_3gram_bp"))
      .orderBy(col("d1"))
  }

  private val q38Sql =
    """WITH docs AS (
         SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents),
       feat AS (
         SELECT doc_id, list_distinct(toks) AS ts,
           list_distinct(list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh
         FROM docs)
       SELECT a.doc_id AS d1, b.doc_id AS d2,
         CAST(ROUND(len(list_intersect(a.ts, b.ts)) * 10000.0 / len(list_distinct(list_concat(a.ts, b.ts)))) AS BIGINT) AS jac_tokens_bp,
         CAST(ROUND(len(list_intersect(a.sh, b.sh)) * 10000.0 / len(list_distinct(list_concat(a.sh, b.sh)))) AS BIGINT) AS jac_3gram_bp
       FROM feat a JOIN feat b ON b.doc_id = a.doc_id + 1
       WHERE a.doc_id < 99
       ORDER BY d1"""

  /** Language-ID heuristic + quality scoring: token stats, stopword ratio, punct
    * ratio — the cheap per-document features a corpus filter computes at scale. */
  private def q39(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") < 200)
      .withColumn("toks", split(trim(col("text")), " "))
      .withColumn("n_stop", expr(
        "size(filter(toks, t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is')))"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        // ratio metrics in scaled integers (×100 / ×10000) — see q33 comment
        round(length(regexp_replace(trim(col("text")), " ", "")) * 100.0 / size(col("toks")))
          .cast("long").as("avg_token_len_x100"),
        round(col("n_stop") * 10000.0 / size(col("toks"))).cast("long").as("stop_ratio_bp"),
        round(length(regexp_replace(col("text"), "[a-z0-9 ]", "")) * 10000.0 / length(col("text")))
          .cast("long").as("punct_ratio_bp"),
        when(col("n_stop") >= 1, "en").otherwise("other").as("guess_lang"),
        col("lang").as("labeled_lang"))
      .orderBy(col("doc_id"))

  private val q39Sql =
    """WITH f AS (
         SELECT doc_id, lang, text, string_split(trim(text), ' ') AS toks,
           len(list_filter(string_split(trim(text), ' '),
             t -> t IN ('the', 'a', 'and', 'of', 'to', 'in', 'is'))) AS n_stop
         FROM documents WHERE doc_id < 200)
       SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         CAST(ROUND(length(replace(trim(text), ' ', '')) * 100.0 / len(toks)) AS BIGINT) AS avg_token_len_x100,
         CAST(ROUND(n_stop * 10000.0 / len(toks)) AS BIGINT) AS stop_ratio_bp,
         CAST(ROUND(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) * 10000.0 / length(text)) AS BIGINT) AS punct_ratio_bp,
         CASE WHEN n_stop >= 1 THEN 'en' ELSE 'other' END AS guess_lang,
         lang AS labeled_lang
       FROM f
       ORDER BY doc_id"""

  /** Token counting two ways: whitespace split vs a BPE-ish regex segmentation. */
  private def q40(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), " ")).as("ws_tokens"),
        expr("regexp_count(text, '[a-z]+|[0-9]+')").as("re_tokens"),
        array_contains(split(trim(col("text")), " "), "the").as("has_the"),
        (length(col("text")) === col("n_chars")).as("len_matches"))
      .orderBy(col("doc_id"))

  private val q40Sql =
    """SELECT doc_id,
       CAST(len(string_split(trim(text), ' ')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS INT) AS re_tokens,
       list_contains(string_split(trim(text), ' '), 'the') AS has_the,
       (length(text) = n_chars) AS len_matches
       FROM documents
       ORDER BY doc_id"""

  /** Whole-document fingerprint: rolling polynomial hash over the normalized text. */
  private def q41(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") < 200)
      .select(col("doc_id"), expr(hashExpr("trim(text)")).as("fp"))
      .orderBy(col("doc_id"))

  private val q41Sql =
    s"""SELECT doc_id, ${duckHash("trim(text)")} AS fp
       FROM documents WHERE doc_id < 200
       ORDER BY doc_id"""

  /** TF-IDF: q33's per-doc term frequency weighted by inverse document frequency
    * over the WHOLE corpus. Fully distributed — the corpus size N arrives as a
    * broadcast 1-row cross join (never a driver-side count), document frequency is
    * one distinct + groupBy on the token, and the tf×idf join keys on the token.
    * At 100 TB the only change is hashing the token join key (xxhash64) to cut
    * shuffle width; the shape — two aggregations and one keyed join — is already
    * the scalable one. ln-based scores can't land on exact ROUND(x,2) ties (unlike
    * q33's small-integer ratios), so a 2-dp double is deterministic cross-engine. */
  private def q70(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = T.documents(s, d)
    val toks = docs.select(col("doc_id"), explode(split(trim(col("text")), " ")).as("token"))
    val tf = toks.filter(col("doc_id") < 50)
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("doc_len", sum(col("cnt")).over(Window.partitionBy(col("doc_id"))))
    val dfreq = toks.distinct()
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nTotal = broadcast(docs.agg(count(lit(1)).as("n_total")))
    tf.join(dfreq, "token").crossJoin(nTotal)
      .select(
        col("doc_id"), col("token"), col("cnt"), col("df"),
        round((col("cnt") / col("doc_len")) * log(col("n_total") / col("df")), 2)
          .as("tfidf"))
      .orderBy(col("doc_id"), col("token"))
  }

  private val q70Sql =
    """WITH t AS (
         SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token FROM documents),
       tf AS (
         SELECT doc_id, token, COUNT(*) AS cnt,
           SUM(COUNT(*)) OVER (PARTITION BY doc_id) AS doc_len
         FROM t WHERE doc_id < 50 GROUP BY doc_id, token),
       dfreq AS (
         SELECT token, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, token FROM t)
         GROUP BY token),
       n AS (SELECT COUNT(*) AS n_total FROM documents)
       SELECT doc_id, token, cnt, df,
         ROUND((CAST(cnt AS DOUBLE) / doc_len) * LN(CAST(n_total AS DOUBLE) / df), 2) AS tfidf
       FROM tf JOIN dfreq USING (token) CROSS JOIN n
       ORDER BY doc_id, token"""

  /** Changeset merge (CDC-style upsert/delete apply) — the corpus-refresh op of a
    * training-data pipeline: base documents full-outer joined with a changeset of
    * updates (op=U), deletes (op=D), and inserts (op=I); the survivor takes the
    * change's content when present. One shuffle on the key — and at 100 TB the
    * base side would be bucketBy(doc_id) tables (q69's layout), making every
    * periodic merge shuffle-free on the big side. The changeset here is derived
    * deterministically from the base table so the oracle can reproduce it. */
  private def q75(s: SparkSession, d: String): DataFrame = {
    val docs = T.documents(s, d)
    val base = docs.select(col("doc_id"), col("text"))
    val updatesDeletes = docs
      .filter(col("doc_id") % 13 === 0 || col("doc_id") % 7 === 0)
      .select(
        when(col("doc_id") % 13 === 0, lit("D")).otherwise(lit("U")).as("op"),
        col("doc_id"),
        concat(lit("v2 "), col("text")).as("new_text"))
    val inserts = docs.filter(col("doc_id") < 20)
      .select(lit("I").as("op"), (col("doc_id") + 10000).as("doc_id"),
        col("text").as("new_text"))
    val changes = updatesDeletes.unionByName(inserts)
    base.join(changes, Seq("doc_id"), "full_outer")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(
        col("doc_id"),
        coalesce(col("op"), lit("keep")).as("op_applied"),
        md5(coalesce(col("new_text"), col("text"))).as("content_md5"))
      // doc_id alone is not total once inserts (x+10000) can collide with real
      // ids at big SFs — order on all columns per determinism convention (1)
      .orderBy(col("doc_id"), col("op_applied"), col("content_md5"))
  }

  private val q75Sql =
    """WITH base AS (SELECT doc_id, text FROM documents),
       changes AS (
         SELECT CASE WHEN doc_id % 13 = 0 THEN 'D' ELSE 'U' END AS op,
                doc_id, 'v2 ' || text AS new_text
         FROM documents WHERE doc_id % 13 = 0 OR doc_id % 7 = 0
         UNION ALL
         SELECT 'I' AS op, doc_id + 10000 AS doc_id, text AS new_text
         FROM documents WHERE doc_id < 20)
       SELECT doc_id,
         COALESCE(op, 'keep') AS op_applied,
         md5(COALESCE(new_text, text)) AS content_md5
       FROM base FULL OUTER JOIN changes USING (doc_id)
       WHERE COALESCE(op, '') <> 'D'
       ORDER BY doc_id, op_applied, content_md5"""

  /** Deterministic train/val/test split by PORTABLE content-independent hash of the
    * key (md5 of the id string, mod 10): the reproducible-split pattern — the same
    * document lands in the same split on any engine, any run, any cluster size,
    * unlike rand()-based splits. Per-split counts + volume. */
  private def q84(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("h", expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 14), 16, 10) AS BIGINT) % 10"))
      .withColumn("split",
        when(col("h") === 0, "val").when(col("h") === 1, "test").otherwise("train"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text"))).as("total_chars"))
      .orderBy(col("split"))

  private val q84Sql =
    """SELECT split, COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars
       FROM (
         SELECT text,
           CASE (CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 14)) AS BIGINT) % 10)
             WHEN 0 THEN 'val' WHEN 1 THEN 'test' ELSE 'train' END AS split
         FROM documents)
       GROUP BY split ORDER BY split"""

  /** Bigram repetition ratio — the Gopher/C4-style quality signal: share of all
    * 2-grams taken by the single most frequent one (high = boilerplate/spam).
    * Long-form shape: explode bigrams, per-(doc, bigram) counts, one hash agg to
    * (doc) — all partial-aggregating, no per-doc state beyond the group row. */
  private def q85(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") < 200)
      .withColumn("toks", split(trim(col("text")), " "))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(toks) - 1), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"))
        .as(Seq("pos", "bg")))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_bigrams"),
        max(col("c")).as("top_bigram_n"),
        round(max(col("c")) * 10000.0 / sum(col("c"))).cast("long").as("repetition_bp"))
      .orderBy(col("doc_id"))

  private val q85Sql =
    """WITH bg AS (
         SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1])) AS bg
         FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks
               FROM documents WHERE doc_id < 200)
         WHERE len(toks) >= 2),
       cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg)
       SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         CAST(MAX(c) AS BIGINT) AS top_bigram_n,
         CAST(ROUND(MAX(c) * 10000.0 / SUM(c)) AS BIGINT) AS repetition_bp
       FROM cnt GROUP BY doc_id ORDER BY doc_id"""

  /** Outer generator variant: posexplode_outer keeps rows whose generated array is
    * EMPTY (null pos/element) — the generator family's null-preserving half, which
    * plain explode silently drops. Fixture: 7+-char tokens — the corpus's longest
    * run to 8 chars, so docs split into a real mix of empty (null row) and
    * non-empty (value rows), exercising BOTH halves of the outer generate. */
  private def q86(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .filter(col("doc_id") < 50)
      .withColumn("rare", expr(
        "filter(array_distinct(split(trim(text), ' ')), t -> length(t) >= 7)"))
      .select(col("doc_id"), posexplode_outer(expr("array_sort(rare)"))
        .as(Seq("pos", "tok")))
      .orderBy(col("doc_id"), col("pos"))

  private val q86Sql =
    """WITH r AS (
         SELECT doc_id,
           list_sort(list_filter(list_distinct(string_split(trim(text), ' ')),
             t -> length(t) >= 7)) AS rare
         FROM documents WHERE doc_id < 50),
       x AS (
         SELECT doc_id, rare,
           unnest(generate_series(1, greatest(len(rare), 1))) AS i
         FROM r)
       SELECT doc_id,
         CASE WHEN len(rare) = 0 THEN NULL ELSE CAST(i - 1 AS INT) END AS pos,
         CASE WHEN len(rare) = 0 THEN NULL ELSE rare[i] END AS tok
       FROM x
       ORDER BY doc_id, pos"""

  /** Sequence PACKING — the pretraining batch-construction op: stream documents
    * in a deterministic order, accumulate token counts, and cut a new pack every
    * time the running total crosses a fixed token budget (512 here). Expressed as
    * an exclusive running sum (window frame up to -1 row) + floor-div — fixed
    * boundaries, the distributable variant of greedy packing (true greedy is
    * sequential by definition). SHARDED on purpose: the window partitions by
    * doc_id mod 8, so at 100 TB each shard packs independently — a global
    * single-partition window would serialize the corpus through one task.
    * Integer token counts make the running sums exact on both engines. */
  private def q92(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    T.documents(s, d)
      .withColumn("shard", pmod(col("doc_id"), lit(8)))
      .withColumn("tok_n", size(split(trim(col("text")), " ")).cast("long"))
      .withColumn("cum_excl", coalesce(sum(col("tok_n")).over(w), lit(0L)))
      .withColumn("pack", floor(col("cum_excl") / 512).cast("long"))
      .groupBy(col("shard"), col("pack"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tok_n")).as("pack_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"), col("pack"))
  }

  private val q92Sql =
    """WITH t AS (
         SELECT doc_id, doc_id % 8 AS shard,
           CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok_n
         FROM documents),
       c AS (
         SELECT doc_id, shard, tok_n,
           COALESCE(SUM(tok_n) OVER (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
         FROM t)
       SELECT shard, CAST(FLOOR(cum_excl / 512) AS BIGINT) AS pack,
         COUNT(*) AS n_docs,
         CAST(SUM(tok_n) AS BIGINT) AS pack_tokens,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       FROM c GROUP BY shard, pack
       ORDER BY shard, pack"""

  /** Benchmark DECONTAMINATION — the pre-training hygiene op: flag training
    * documents sharing any 3-gram shingle with a held-out eval set (docs 0–4
    * stand in for the benchmark). The eval side is tiny by construction, so its
    * distinct shingles broadcast and the check is one broadcast semi-ish join +
    * per-doc count over the training corpus — linear in corpus size, the shape
    * that scans 100 TB once. Counting DISTINCT overlapping shingles per doc keeps
    * the metric insensitive to repeated shingles on either side. */
  private def q93(s: SparkSession, d: String): DataFrame = {
    def shingles(df: DataFrame): DataFrame = df
      .withColumn("toks", split(trim(col("text")), " "))
      .select(col("doc_id"), explode(expr(
        "CASE WHEN size(toks) < 3 THEN array() ELSE array_distinct(transform(sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))) END"))
        .as("sh"))
    val docs = T.documents(s, d)
    val evalShingles = broadcast(
      shingles(docs.filter(col("doc_id") < 5)).select(col("sh")).distinct())
    shingles(docs.filter(col("doc_id") >= 5))
      .join(evalShingles, "sh")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("sh")).as("n_contaminated_shingles"))
      .orderBy(col("doc_id"))
  }

  private val q93Sql =
    """WITH sh AS (
         SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(toks) - 2),
           i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]))) AS sh
         FROM (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
         WHERE len(toks) >= 3),
       ev AS (SELECT DISTINCT sh FROM sh WHERE doc_id < 5)
       SELECT s.doc_id, COUNT(DISTINCT s.sh) AS n_contaminated_shingles
       FROM sh s JOIN ev ON s.sh = ev.sh
       WHERE s.doc_id >= 5
       GROUP BY s.doc_id
       ORDER BY s.doc_id"""

  val defs: Seq[QDef] = Seq(
    QDef("q32_token_counts", q32, Some(q32Sql)),
    QDef("q33_tf_per_doc", q33, Some(q33Sql)),
    QDef("q34_dedup_exact", q34, Some(q34Sql)),
    QDef("q35_minhash_sig", q35, Some(q35Sql)),
    QDef("q36_lsh_candidates", q36, Some(q36Sql)),
    QDef("q81_neardup_clusters", q81, Some(q81Sql)),
    QDef("q84_hash_split", q84, Some(q84Sql)),
    QDef("q85_repetition_ratio", q85, Some(q85Sql)),
    QDef("q86_posexplode_outer", q86, Some(q86Sql)),
    QDef("q92_sequence_packing", q92, Some(q92Sql)),
    QDef("q93_decontamination", q93, Some(q93Sql)),
    QDef("q37_simhash", q37, Some(q37Sql)),
    QDef("q38_ngram_jaccard", q38, Some(q38Sql)),
    QDef("q39_lang_quality", q39, Some(q39Sql)),
    QDef("q40_token_regex_count", q40, Some(q40Sql)),
    QDef("q41_fingerprint", q41, Some(q41Sql)),
    QDef("q70_tfidf", q70, Some(q70Sql)),
    QDef("q75_changeset_merge", q75, Some(q75Sql)),
  )
}
