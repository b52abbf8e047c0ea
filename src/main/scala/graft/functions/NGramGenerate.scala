package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst GENERATOR (UDTF rung of the custom-function ladder, after
  * scalar Expression [[DotProductFloat]] and the optimizer rule
  * `plans.IntervalJoinRewrite`): `graft_ngrams(text, n)` emits one
  * `(pos, ngram)` row per word n-gram of the input, straight from the
  * `Generate` operator — no intermediate array materialization the
  * `explode(transform(sequence(...)))` composition would allocate per row, and
  * no Scala-UDF round trip. Tokenization matches the corpus convention
  * everywhere else in the engine: split on single spaces, empty tokens
  * dropped.
  *
  * Semantics at the edges (all spec-pinned): NULL text, n <= 0, or fewer than
  * n tokens generate zero rows (matching `explode` of an empty array);
  * `n` must be foldable — a per-row n would make the output schema
  * row-dependent, which Generate cannot represent.
  */
case class NGramGenerate(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_ngrams expects (string, foldable int), got " +
        s"(${child.dataType.simpleString}, ${n.dataType.simpleString})")

  private lazy val nVal: Int = n.eval(null) match {
    case null   => 0
    case i: Int => i
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    if (s == null || nVal <= 0) Nil
    else {
      val toks = s.asInstanceOf[UTF8String].toString
        .split(" ").filter(_.nonEmpty)
      if (toks.length < nVal) Nil
      else (0 to toks.length - nVal).iterator.map { i =>
        InternalRow(i, UTF8String.fromString(
          toks.slice(i, i + nVal).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

object GeneratorFunctions {
  /** Idempotently register graft_ngrams on the session (temp function); usable
    * from selectExpr / SQL exactly like explode: `graft_ngrams(text, 3) AS
    * (pos, ngram)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngrams",
      exprs => {
        require(exprs.length == 2,
          s"graft_ngrams expects exactly 2 arguments, got ${exprs.length}")
        NGramGenerate(exprs.head, exprs(1))
      },
      "built-in")
}
