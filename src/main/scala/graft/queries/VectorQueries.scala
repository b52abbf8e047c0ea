package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors) — the
  * training-data-pipeline ANN surface: brute-force cosine top-k as the exact
  * baseline, a sign-LSH (random-hyperplane-style, here axis-sign) bucketed variant as
  * the O(n) scale path, and threshold near-duplicate detection.
  *
  * Float determinism: both engines fold the dot product strictly left-to-right in
  * DOUBLE (Spark `aggregate` / DuckDB `list_reduce`), so cosine values are
  * bit-identical and rank order needs no fuzz. Similarities are emitted in basis
  * points (×10000 rounded to integer) per the scaled-integer convention.
  */
object VectorQueries {

  /** Dot product of two float-array columns via the codegen'd native expression
    * (functions.DotProductFloat) — bit-identical to the interpreted
    * `aggregate(zip_with(...))` fold and to the DuckDB oracle, but it runs as a
    * primitive loop inside whole-stage codegen. Each query registers it first. */
  private def dot(a: String, b: String): String = s"graft_dot_f($a, $b)"

  private def reg(s: SparkSession): Unit = graft.functions.VectorExpressions.register(s)

  /** DuckDB twin of [[dot]] — same fold order, same DOUBLE ops. */
  private def duckDot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), (x, y) -> x + y)"

  private def cosExpr(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  private def duckCos(a: String, b: String): String =
    s"${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)}))"

  /** Per-vector L2 norm (precomputed once per row, not once per pair — at n² pairs
    * that is the difference between 1 and 2·k folds per pair). Same fold, same fp
    * values as inlining it, so oracle parity is unaffected. */
  private def normExpr(a: String): String = s"sqrt(${dot(a, a)})"
  private def duckNorm(a: String): String = s"sqrt(${duckDot(a, a)})"

  /** Brute-force cosine top-5 for 5 query vectors — the exact kNN baseline. A
    * broadcast of the tiny query side against a full scan of candidates: one pass,
    * no shuffle of the big side beyond the final per-query top-k. */
  private def q42(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val emb = T.embeddings(s, d)
    val q = broadcast(emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc_nulls_last, col("neighbor_id"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr(cosExpr("qv", "cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        round(col("cos") * 10000).cast("long").as("cos_bp"))
      .orderBy(col("query_id"), col("rn"))
  }

  private val q42Sql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
       c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       scored AS (
         SELECT query_id, neighbor_id, ${duckCos("qv", "cv")} AS cos
         FROM q JOIN c ON query_id <> neighbor_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC NULLS LAST, neighbor_id) AS INT) AS rn
         FROM scored)
       SELECT query_id, rn, neighbor_id, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_bp
       FROM ranked WHERE rn <= 5
       ORDER BY query_id, rn"""

  /** 6-bit sign signature of the leading dimensions — the shared blocking key:
    * 64 cells, each row in exactly one. Used by q43 (ANN probe) and q44 (near-dup
    * pair blocking); [[signBucketSql]] is its DuckDB twin. */
  private def signBucket: org.apache.spark.sql.Column =
    concat((1 to 6).map(i =>
      when(expr(s"CAST(element_at(embedding, $i) AS DOUBLE)") >= 0, "1").otherwise("0")): _*)

  private val signBucketSql: String = (1 to 6).map(i =>
    s"CASE WHEN CAST(embedding[$i] AS DOUBLE) >= 0 THEN '1' ELSE '0' END").mkString(" || ")

  /** Sign-LSH bucketed ANN: the 6-bit sign signature buckets the space (64 cells);
    * each query only scores candidates in its own bucket. This is the shape that
    * survives 100 TB — the bucket equi-join replaces the O(n²) cross product;
    * recall is traded for the 64× candidate cut. */
  private def q43(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val emb = T.embeddings(s, d).withColumn("bucket", signBucket)
    val q = emb.filter(col("vec_id") < 100)
      .select(col("vec_id"), col("bucket"), col("embedding").as("qv"))
    val c = emb.select(col("vec_id").as("cand_id"), col("bucket").as("cbucket"),
      col("embedding").as("cv"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc_nulls_last, col("cand_id"))
    q.join(c, col("bucket") === col("cbucket") && col("vec_id") =!= col("cand_id"), "left")
      .withColumn("cos", expr(cosExpr("qv", "cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("bucket"), col("cand_id").as("nn_id"),
        round(col("cos") * 10000).cast("long").as("cos_bp"))
      .orderBy(col("vec_id"))
  }

  private val q43Sql = {
    s"""WITH e AS (SELECT vec_id, embedding, $signBucketSql AS bucket FROM embeddings),
       q AS (SELECT vec_id, bucket, embedding AS qv FROM e WHERE vec_id < 100),
       c AS (SELECT vec_id AS cand_id, bucket AS cbucket, embedding AS cv FROM e),
       scored AS (
         SELECT q.vec_id, q.bucket, c.cand_id,
           ${duckCos("qv", "cv")} AS cos
         FROM q LEFT JOIN c ON q.bucket = c.cbucket AND q.vec_id <> c.cand_id),
       ranked AS (
         SELECT vec_id, bucket, cand_id, cos,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC NULLS LAST, cand_id) AS rn
         FROM scored)
       SELECT vec_id, bucket, cand_id AS nn_id, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_bp
       FROM ranked WHERE rn = 1
       ORDER BY vec_id"""
  }

  /** Embedding-cosine near-duplicate detection, blocked on (label × sign-LSH
    * bucket) — q43's 6-bit signature reused as the second blocking key. Label
    * alone is a scale-killer: one hot label makes the within-label pair space
    * O(n²/|labels|) and pins a single reducer. The bucket splits every label into
    * 64 cells, so the join is a plain two-column equi-join whose pair space is
    * O(Σ cell²) — linear-ish for any spread-out embedding distribution — and the
    * candidate cut is re-checked against the true cosine threshold. The contract
    * is the standard ANN near-dup semantic (candidates = same blocking cell),
    * declared identically in the DuckDB oracle, so the hash-match is exact. */
  private def q44(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val withNorm = T.embeddings(s, d)
      .withColumn("nrm", expr(normExpr("embedding")))
      .withColumn("bucket", signBucket)
    val a = withNorm.select(col("vec_id").as("v1"), col("label"),
      col("bucket"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = withNorm.select(col("vec_id").as("v2"), col("label").as("label2"),
      col("bucket").as("bucket2"), col("embedding").as("e2"), col("nrm").as("n2"))
    a.join(b, col("label") === col("label2") && col("bucket") === col("bucket2") &&
        col("v1") < col("v2"))
      .withColumn("cos", expr(s"${dot("e1", "e2")} / (n1 * n2)"))
      .filter(col("cos") >= 0.2)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_neardup_pairs"),
        max(round(col("cos") * 10000).cast("long")).as("max_cos_bp"))
      .orderBy(col("label"))
  }

  private val q44Sql = {
    s"""WITH e AS (SELECT vec_id, label, embedding, ${duckNorm("embedding")} AS nrm,
           $signBucketSql AS bucket FROM embeddings),
       pairs AS (
         SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
           ${duckDot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         FROM e a JOIN e b
           ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
       SELECT label, COUNT(*) AS n_neardup_pairs,
         CAST(MAX(CAST(ROUND(cos * 10000) AS BIGINT)) AS BIGINT) AS max_cos_bp
       FROM pairs WHERE cos >= 0.2
       GROUP BY label
       ORDER BY label"""
  }

  /** IVF-style ANN: the first 8 vectors act as fixed coarse centroids; every vector
    * is assigned to its nearest centroid (its "cell"), and queries probe only their
    * own cell. The cell assignment is the blocking equi-key — same O(n) shape as the
    * sign-LSH variant but data-adaptive. Deterministic: ties break to the lowest
    * centroid id, and all distances are the codegen'd dot product. */
  private def q45v(s: SparkSession, d: String): DataFrame = {
    reg(s)
    val emb = T.embeddings(s, d)
    val cents = broadcast(emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cv")))
    // assign: argmin over centroids of L2² = |v|² - 2·v·c + |c|²; |v|² is constant
    // per vector, so argmin of (|c|² - 2·v·c) suffices
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("score"), col("cent_id"))
    val assigned = emb
      .crossJoin(cents)
      .withColumn("score", expr(s"${dot("cv", "cv")} - 2 * ${dot("embedding", "cv")}"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cent_id").as("cell"), col("embedding"))
      // consumed twice below (query side + candidate side): cache so the
      // centroid-assignment subtree runs once instead of per consumer
      .cache()
    val q = assigned.filter(col("vec_id").between(100, 119))
      .select(col("vec_id"), col("cell"), col("embedding").as("qv"))
    val c = assigned.select(col("vec_id").as("cand_id"), col("cell").as("ccell"),
      col("embedding").as("cv"))
    val wNN = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc_nulls_last, col("cand_id"))
    q.join(c, col("cell") === col("ccell") && col("vec_id") =!= col("cand_id"), "left")
      .withColumn("cos", expr(cosExpr("qv", "cv")))
      .withColumn("rn", row_number().over(wNN))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("cand_id").as("nn_id"),
        round(col("cos") * 10000).cast("long").as("cos_bp"))
      .orderBy(col("vec_id"))
  }

  private val q45vSql =
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cv FROM embeddings WHERE vec_id < 8),
       scoredc AS (
         SELECT e.vec_id, c.cent_id,
           ${duckDot("c.cv", "c.cv")} - 2 * ${duckDot("e.embedding", "c.cv")} AS score
         FROM embeddings e CROSS JOIN cents c),
       assigned AS (
         SELECT s.vec_id, s.cent_id AS cell, e.embedding
         FROM (SELECT vec_id, cent_id,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY score, cent_id) AS rn
               FROM scoredc) s
         JOIN embeddings e ON e.vec_id = s.vec_id
         WHERE s.rn = 1),
       q AS (SELECT vec_id, cell, embedding AS qv FROM assigned WHERE vec_id BETWEEN 100 AND 119),
       c AS (SELECT vec_id AS cand_id, cell AS ccell, embedding AS cv FROM assigned),
       scored AS (
         SELECT q.vec_id, q.cell, c.cand_id, ${duckCos("qv", "cv")} AS cos
         FROM q LEFT JOIN c ON q.cell = c.ccell AND q.vec_id <> c.cand_id),
       ranked AS (
         SELECT vec_id, cell, cand_id, cos,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC NULLS LAST, cand_id) AS rn
         FROM scored)
       SELECT vec_id, cell, cand_id AS nn_id, CAST(ROUND(cos * 10000) AS BIGINT) AS cos_bp
       FROM ranked WHERE rn = 1
       ORDER BY vec_id"""

  /** Per-label centroids in LONG form: posexplode to (label, pos, v), hash-aggregate
    * on (label, pos), never re-assembling arrays. This is the shape that scales — a
    * centroid UDAF holding a 64-float buffer per group works too, but the long form
    * rides plain codegen'd sum/count with map-side partials, handles any dimension
    * without a fixed-width buffer, and its shuffle is (label × dim) rows regardless
    * of input size. Cross-engine determinism: each element is floored to an integer
    * basis-point value FIRST (floor(v·10⁴) — exact and order-independent to sum, no
    * float-accumulation-order divergence), then the integer mean is rounded. */
  private def q73(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .select(col("label"), posexplode(col("embedding")))
      .groupBy(col("label"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(floor(col("col").cast("double") * 10000)) / count(lit(1)))
          .cast("long").as("centroid_bp"))
      .orderBy(col("label"), col("pos"))

  private val q73Sql =
    """WITH e AS (
         SELECT label,
           UNNEST(generate_series(1, len(embedding))) AS i,
           UNNEST(embedding) AS v
         FROM embeddings)
       SELECT label, CAST(i - 1 AS INT) AS pos, COUNT(*) AS n,
         CAST(ROUND(SUM(FLOOR(CAST(v AS DOUBLE) * 10000)) / COUNT(*)) AS BIGINT) AS centroid_bp
       FROM e GROUP BY label, i ORDER BY label, pos"""

  val defs: Seq[QDef] = Seq(
    QDef("q42_knn_brute_force", q42, Some(q42Sql)),
    QDef("q43_ann_sign_lsh", q43, Some(q43Sql)),
    QDef("q44_cosine_neardup", q44, Some(q44Sql)),
    QDef("q60_ann_ivf", q45v, Some(q45vSql)),
    QDef("q73_label_centroids", q73, Some(q73Sql)),
  )
}
