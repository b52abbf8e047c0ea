package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Native generator graft_ngrams: row-generation semantics at every edge, and
  * equivalence with the composed explode(transform(sequence(...))) spelling it
  * replaces. */
class NGramGenerateSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    GeneratorFunctions.register(spark)
    Seq(
      (1L, "a b c d e"),
      (2L, "x y"),          // shorter than n=3 -> zero rows
      (3L, null: String),   // null -> zero rows
      (4L, "  p  q r  "),   // ragged spacing: empty tokens drop first
      (5L, "solo solo solo"))
      .toDF("id", "text")
  }

  test("emits one (pos, ngram) row per window; null/short inputs emit none") {
    val out = fixture.selectExpr("id", "graft_ngrams(text, 3) AS (pos, ngram)")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    assert(out == Seq(
      (1L, 0, "a b c"), (1L, 1, "b c d"), (1L, 2, "c d e"),
      (4L, 0, "p q r"),
      (5L, 0, "solo solo solo")))
  }

  test("n=1 degenerates to tokenization with positions") {
    val out = fixture.filter(col("id") === 4)
      .selectExpr("graft_ngrams(text, 1) AS (pos, ngram)")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out == Seq((0, "p"), (1, "q"), (2, "r")))
  }

  test("matches the composed higher-order-function spelling on real documents") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 50)
    GeneratorFunctions.register(spark)
    docs.createOrReplaceTempView("v_ng_docs")
    val native = spark.sql(
      """SELECT doc_id, pos, ngram
         FROM v_ng_docs LATERAL VIEW graft_ngrams(trim(text), 3) t AS pos, ngram""")
      .collect().map(_.toString).sorted.toSeq
    val composed = spark.sql(
      """SELECT doc_id, pos, ngram FROM (
           SELECT doc_id, posexplode(transform(
             sequence(0, size(toks) - 3),
             i -> concat_ws(' ', slice(toks, i + 1, 3)))) AS (pos, ngram)
           FROM (SELECT doc_id, filter(split(trim(text), ' '), x -> length(x) > 0) AS toks
                 FROM v_ng_docs)
           WHERE size(toks) >= 3)""")
      .collect().map(_.toString).sorted.toSeq
    assert(native.nonEmpty && native == composed)
  }
}
