package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_normalize / graft_strip_accents: form semantics on the Unicode classes
  * that matter for corpus canonicalization, interpreted/codegen parity, and the
  * canonicalize-before-hash property the expression exists for. */
class UnicodeNormalizeSpec extends SparkSpec {

  private val decomposed = "Café"        // 'e' + combining acute (5 cps)
  private val composed = "Café"           // precomposed é (4 cps)
  private val compat = "ﬁle № 5"     // ﬁ ligature + № numero

  private def fixture = {
    import spark.implicits._
    UnicodeFunctions.register(spark)
    Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, compat),
      (4L, "plain ascii"),
      (5L, null: String)).toDF("id", "s")
  }

  test("NFC composes combining sequences; NFD decomposes; both idempotent") {
    val out = fixture.selectExpr(
      "id",
      "graft_normalize(s, 'NFC') AS nfc",
      "graft_normalize(s, 'NFD') AS nfd",
      "graft_normalize(graft_normalize(s, 'NFC'), 'NFC') AS nfc2")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(out(0) == ((1L, composed, decomposed, composed)))
    assert(out(1) == ((2L, composed, decomposed, composed)))
    assert(out(3) == ((4L, "plain ascii", "plain ascii", "plain ascii")))
    assert(out(4)._2 == null && out(4)._3 == null)
  }

  test("NFKC folds compatibility characters NFC leaves alone") {
    val row = fixture.where(col("id") === 3)
      .selectExpr("graft_normalize(s, 'NFC') AS nfc", "graft_normalize(s, 'NFKC') AS nfkc")
      .head()
    assert(row.getString(0) == compat)        // NFC: canonical only — untouched
    assert(row.getString(1) == "file No 5")   // NFKC: ﬁ -> fi, № -> No
  }

  test("strip_accents folds marks from BOTH composed and decomposed inputs") {
    val out = fixture.selectExpr("id", "graft_strip_accents(s) AS t")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(out(0)._2 == "Cafe" && out(1)._2 == "Cafe")
    assert(out(3)._2 == "plain ascii")
  }

  test("canonicalize-before-hash: visually-identical spellings md5-collide only after NFC") {
    val r = fixture.where(col("id") <= 2)
      .agg(
        countDistinct(md5(col("s"))).as("raw_hashes"),
        countDistinct(md5(expr("graft_normalize(s, 'NFC')"))).as("nfc_hashes"))
      .head()
    assert(r.getLong(0) == 2L, "the two spellings must differ before normalization")
    assert(r.getLong(1) == 1L, "NFC must unify them for exact dedup")
  }

  test("interpreted eval matches codegen (expression is codegen-capable)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = UnicodeNormalize(Literal(UTF8String.fromString(decomposed),
      org.apache.spark.sql.types.StringType), "NFC")
    assert(e.eval(null).toString == composed)
    // the declared query runs inside WholeStageCodegen — no interpreted
    // fallback (a local Seq fixture folds to LocalTableScan, so the pin runs
    // over a real parquet scan like the declared query does)
    UnicodeFunctions.register(spark)
    val onParquet = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("md5(graft_normalize(text, 'NFC')) AS h",
        "graft_strip_accents(text) AS t")
    // the `*(n)` prefix is the WholeStageCodegen-stage marker in the compact
    // plan rendering — the Project carrying both expressions must be inside one
    val plan = onParquet.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen:\n${plan.take(600)}")
    assert(onParquet.count() > 0)
  }

  test("already-normalized fast path returns the input unchanged (no realloc)") {
    val s = org.apache.spark.unsafe.types.UTF8String.fromString("plain ascii")
    assert(UnicodeNormalizeUtil.nfc(s) eq s)
    assert(UnicodeNormalizeUtil.stripAccents(s) eq s)
  }

  test("invalid form fails at plan time, not per row") {
    UnicodeFunctions.register(spark)
    val ex = intercept[Exception] {
      fixture.selectExpr("graft_normalize(s, 'NFX')").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("nfx") ||
      ex.getCause != null && ex.getCause.getMessage.contains("NFX"))
  }
}
