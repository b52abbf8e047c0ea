package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static normalization kernels — kept as a plain object with UTF8String-typed
  * methods so the codegen path is ONE static call (no per-row boxing beyond the
  * unavoidable UTF8String→String transcode that `java.text.Normalizer` forces).
  *
  * Why an Expression and not a UDF: Spark has no Unicode-normalization builtin
  * (translate/soundex/initcap don't touch combining marks), and corpus curation
  * needs NFC canonicalization BEFORE hashing — otherwise the same visible text
  * ("é" precomposed vs "e"+U+0301) produces different md5s and exact dedup
  * silently keeps both copies. A Scala UDF would work but breaks the
  * WholeStageCodegen span around the md5/dedup pipeline; this stays inside it.
  */
object UnicodeNormalizeUtil {
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val j = s.toString
    // fast path: already-normalized (pure-ASCII corpora hit this every row)
    if (Normalizer.isNormalized(j, form)) s
    else UTF8String.fromString(Normalizer.normalize(j, form))
  }

  def nfc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFC)
  def nfd(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFD)
  def nfkc(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKC)
  def nfkd(s: UTF8String): UTF8String = normalize(s, Normalizer.Form.NFKD)

  /** Accent folding: NFD-decompose, drop combining marks (category Mn),
    * recompose. "école" → "ecole". Matches DuckDB's strip_accents on the
    * Latin range the corpora use. */
  def stripAccents(s: UTF8String): UTF8String = {
    val j = s.toString
    val d = Normalizer.normalize(j, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK) hasMark = true
      i += 1
    }
    if (!hasMark) s
    else {
      val b = new java.lang.StringBuilder(d.length)
      i = 0
      while (i < d.length) {
        val c = d.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) b.append(c)
        i += 1
      }
      UTF8String.fromString(Normalizer.normalize(b.toString, Normalizer.Form.NFC))
    }
  }
}

/** `graft_normalize(str, 'NFC'|'NFD'|'NFKC'|'NFKD')` — the form is part of the
  * expression (a plan-time constant), so codegen emits a direct static call with
  * no per-row dispatch. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val jform: Normalizer.Form = Normalizer.Form.valueOf(form.toUpperCase)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalizeUtil.normalize(v.asInstanceOf[UTF8String], jform)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalizeUtil.normalize($c, java.text.Normalizer.Form.${jform.name()})")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_strip_accents(str)` — NFD + drop combining marks + NFC. */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents expects a string, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    UnicodeNormalizeUtil.stripAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeNormalizeUtil.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeFunctions {
  /** Idempotently register graft_normalize / graft_strip_accents. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_normalize",
      exprs => {
        require(exprs.length == 2, "graft_normalize expects (str, form)")
        val form = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
            v.toString
          case other =>
            throw new IllegalArgumentException(
              s"graft_normalize form must be a string literal, got $other")
        }
        UnicodeNormalize(exprs.head, form)
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_strip_accents",
      exprs => {
        require(exprs.length == 1, "graft_strip_accents expects (str)")
        StripAccents(exprs.head)
      },
      "built-in")
  }
}
