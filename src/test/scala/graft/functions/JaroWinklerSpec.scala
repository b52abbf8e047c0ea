package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** graft_jaro / graft_jaro_winkler: the published Winkler-1990 constants
  * (p=0.1, prefix<=4, boost threshold 0.7), classic reference pairs, edge
  * cases, and codegen. The declared query (q257) additionally hash-gates the
  * expression against DuckDB's independent implementation. */
class JaroWinklerSpec extends SparkSpec {

  private def jaro(a: String, b: String): Double =
    JaroWinklerUtil.jaro(UTF8String.fromString(a), UTF8String.fromString(b))
  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic reference pairs (Winkler's published examples)") {
    assert(math.abs(jaro("MARTHA", "MARHTA") - 17.0 / 18) < 1e-12)
    assert(math.abs(jw("MARTHA", "MARHTA") - (17.0 / 18 + 3 * 0.1 * (1 - 17.0 / 18))) < 1e-12)
    assert(math.abs(jaro("DIXON", "DICKSONX") - 0.7666666666666666) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(jaro("CRATE", "TRACE") === 0.7333333333333334)
  }

  test("edges: identity, empties, no-match, single chars") {
    assert(jaro("abc", "abc") === 1.0 && jw("abc", "abc") === 1.0)
    assert(jaro("", "") === 1.0)
    assert(jaro("", "abc") === 0.0 && jaro("abc", "") === 0.0)
    assert(jaro("a", "b") === 0.0)
    assert(jaro("xyz", "abc") === 0.0)
  }

  test("boost threshold 0.7: weak matches get NO prefix bonus (DuckDB-probed)") {
    // jaro = 0.6 with a 4-char common prefix: unboosted JW would be 0.76
    assert(jaro("abcdxxxxxx", "abcdyyyyyy") === 0.6)
    assert(jw("abcdxxxxxx", "abcdyyyyyy") === 0.6)
    // above the threshold the bonus applies, prefix capped at 4
    val j = jaro("ab", "abcdefghij")
    assert(j > 0.7 && math.abs(jw("ab", "abcdefghij") - (j + 2 * 0.1 * (1 - j))) < 1e-12)
  }

  test("SQL surface + codegen over a parquet scan") {
    JaroFunctions.register(spark)
    val df = graft.Tables.part(spark, "/root/testdata/sf0.001")
      .selectExpr("graft_jaro_winkler(p_name, p_brand) AS s")
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.nonEmpty && vals.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("null operands yield null") {
    JaroFunctions.register(spark)
    import spark.implicits._
    val r = Seq((null: String, "x")).toDF("a", "b")
      .selectExpr("graft_jaro(a, b)").head()
    assert(r.isNullAt(0))
  }
}
