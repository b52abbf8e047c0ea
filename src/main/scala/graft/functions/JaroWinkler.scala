package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro and Jaro–Winkler similarity as codegen'd expressions —
  * `graft_jaro(a, b)` / `graft_jaro_winkler(a, b)` -> double in [0, 1].
  *
  * Spark ships levenshtein (edit distance) but neither Jaro metric; entity
  * resolution / fuzzy dedup pipelines want Jaro–Winkler because it is
  * length-normalized and prefix-weighted (names, product titles). The
  * PUBLISHED algorithm (Winkler 1990), with the standard constants the
  * oracle also uses: scaling p = 0.1, prefix capped at 4, boost threshold
  * 0.7 (no boost below it — probed against DuckDB's implementation, which
  * this expression is hash-gated against in the declared query).
  *
  * Matching runs over UTF-16 code units (== code points for the BMP text
  * the corpora hold); a per-pair scratch of two boolean arrays, O(|a|·|b|)
  * worst case with the standard match-window cutoff. */
object JaroWinklerUtil {
  def jaro(a: UTF8String, b: UTF8String): Double = jaroImpl(a.toString, b.toString)

  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val sa = a.toString
    val sb = b.toString
    val j = jaroImpl(sa, sb)
    if (j < 0.7) j // boost threshold: weak matches get no prefix bonus
    else {
      var l = 0
      val max = math.min(4, math.min(sa.length, sb.length))
      while (l < max && sa.charAt(l) == sb.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    }
  }

  private def jaroImpl(a: String, b: String): Double = {
    val n = a.length
    val m = b.length
    if (n == 0 && m == 0) return 1.0
    if (n == 0 || m == 0) return 0.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val aMatched = new Array[Boolean](n)
    val bMatched = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val lo = math.max(0, i - window)
      val hi = math.min(m - 1, i + window)
      var k = lo
      var found = false
      while (k <= hi && !found) {
        if (!bMatched(k) && a.charAt(i) == b.charAt(k)) {
          aMatched(i) = true; bMatched(k) = true; matches += 1; found = true
        }
        k += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: matched chars compared in order; each out-of-order pair
    // counts half
    var t = 0
    var k = 0
    i = 0
    while (i < n) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    // t counts out-of-order matched positions; the metric uses half of them,
    // FLOORED — the convention of the oracle implementation this expression
    // is hash-gated against (probed: 'red anvil'/'Brand#15' has 4 matches
    // with 3 out-of-order, and DuckDB scores (4 - 1)/4, not (4 - 1.5)/4)
    (mm / n + mm / m + (mm - (t / 2)) / mm) / 3.0
  }
}

abstract class JaroBase extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"${prettyName} expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
}

case class JaroSimilarity(left: Expression, right: Expression) extends JaroBase {
  override def prettyName: String = "graft_jaro"
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jaro(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerUtil.jaro($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JaroWinklerSimilarity(left: Expression, right: Expression) extends JaroBase {
  override def prettyName: String = "graft_jaro_winkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerUtil.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JaroFunctions {
  /** Idempotently register graft_jaro / graft_jaro_winkler. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro",
      exprs => { require(exprs.length == 2, "graft_jaro expects (a, b)")
        JaroSimilarity(exprs.head, exprs(1)) },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_jaro_winkler",
      exprs => { require(exprs.length == 2, "graft_jaro_winkler expects (a, b)")
        JaroWinklerSimilarity(exprs.head, exprs(1)) },
      "built-in")
  }
}
