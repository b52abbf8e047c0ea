package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe (test scope): stage-by-stage timing of q237's CTEs at sf0.1 to
  * locate the residual cost after the 4-gram selectivity fix. Not a test. */
object Q237Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    Tables.documents(spark, sf).createOrReplaceTempView("ssj_docs")
    def t(name: String, sql: String): Unit = {
      val t0 = System.nanoTime()
      val n = spark.sql(sql).count()
      println(f"$name%-10s rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = """base AS (
        SELECT doc_id, filter(split(lower(trim(text)), ' '), x -> x <> '') AS w
        FROM ssj_docs)"""
    val toks = s"""$base,
      toks AS (
        SELECT doc_id,
               array_distinct(transform(sequence(0, size(w) - 4),
                 i -> concat(element_at(w, i + 1), ' ', element_at(w, i + 2), ' ',
                             element_at(w, i + 3), ' ', element_at(w, i + 4)))) AS t
        FROM base WHERE size(w) >= 4)"""
    val exploded = s"""$toks,
      exploded AS (SELECT doc_id, tok FROM toks LATERAL VIEW explode(t) ex AS tok)"""
    val df = s"""$exploded,
      df AS (SELECT tok, COUNT(*) AS dfreq FROM exploded GROUP BY tok)"""
    val ranked = s"""$df,
      ranked AS (
        SELECT e.doc_id,
               transform(array_sort(collect_list(struct(d.dfreq, e.tok))), p -> p.tok) AS sorted_t
        FROM exploded e JOIN df d ON e.tok = d.tok
        GROUP BY e.doc_id)"""
    val prefixes = s"""$ranked,
      prefixes AS (
        SELECT doc_id, ptok FROM ranked
        LATERAL VIEW explode(
          slice(sorted_t, 1,
                size(sorted_t) - CAST(ceil(0.6 * size(sorted_t)) AS INT) + 1)) AS ptok)"""
    val cands = s"""$prefixes,
      cands AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM prefixes a JOIN prefixes b ON a.ptok = b.ptok AND a.doc_id < b.doc_id)"""
    // production-shaped prefixes (window rank + set size) with and without
    // PPJoin's length companion bound — records how many candidate pairs the
    // length filter removes before DISTINCT/verify
    val prefixesW = s"""$df,
      rankedw AS (
        SELECT e.doc_id, e.tok,
               ROW_NUMBER() OVER (PARTITION BY e.doc_id ORDER BY d.dfreq, e.tok) AS rk,
               COUNT(*) OVER (PARTITION BY e.doc_id) AS n
        FROM exploded e JOIN df d ON e.tok = d.tok),
      prefixesw AS (
        SELECT doc_id, tok AS ptok, n FROM rankedw
        WHERE rk <= n - CAST(ceil(0.6 * n) AS INT) + 1)"""
    val candsLf = s"""$prefixesW,
      cands AS (
        SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
        FROM prefixesw a JOIN prefixesw b
          ON a.ptok = b.ptok AND a.doc_id < b.doc_id
         AND least(a.n, b.n) >= 0.6 * greatest(a.n, b.n))"""
    t("toks", s"WITH $toks SELECT * FROM toks")
    t("exploded", s"WITH $exploded SELECT * FROM exploded")
    t("df", s"WITH $df SELECT * FROM df")
    t("ranked", s"WITH $ranked SELECT * FROM ranked")
    t("prefixes", s"WITH $prefixes SELECT * FROM prefixes")
    t("cands", s"WITH $cands SELECT * FROM cands")
    t("cands_lf", s"WITH $candsLf SELECT * FROM cands")
    val full = Registry.byName("q237_similarity_join_prefix_filter")
    val t0 = System.nanoTime()
    val n = full.fn(spark, sf).count()
    println(f"full       rows=$n%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
