package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DotProductFloat: the codegen'd loop must be BIT-identical to the interpreted
  * aggregate(zip_with(...)) fold — that identity is what lets the fast path sit on
  * the oracle-checked queries. */
class VectorExpressionsSpec extends SparkSpec {

  test("graft_dot_f equals the interpreted higher-order fold bit-for-bit") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val rng = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rng.nextFloat() * 2 - 1), Array.fill(64)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        expr("graft_dot_f(a, b)").as("fast"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("slow"))
    val out = df.as[(Long, Double, Double)].collect()
    assert(out.length == 200)
    out.foreach { case (id, fast, slow) =>
      assert(java.lang.Double.doubleToLongBits(fast) == java.lang.Double.doubleToLongBits(slow),
        s"row $id: $fast != $slow (bitwise)")
    }
  }

  test("graft_dot_f survives both codegen and interpreted evaluation paths") {
    import spark.implicits._
    VectorExpressions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    // interpreted (eval) path: force by wrapping in a non-codegen context via filter on the value
    val v = df.select(expr("graft_dot_f(a, b)").as("d")).as[Double].head()
    assert(v == 32.0)
    // mismatched lengths: NULL, matching the oracle's out-of-range NULL poisoning
    val w = Seq((Array(1.0f, 2.0f), Array(3.0f))).toDF("a", "b")
      .select(expr("graft_dot_f(a, b)").as("d")).as[Option[Double]].head()
    assert(w.isEmpty)
    // type check rejects non-float arrays
    val err = intercept[Exception] {
      Seq((Array(1.0, 2.0), Array(3.0, 4.0))).toDF("a", "b")
        .select(expr("graft_dot_f(a, b)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("graft_dot_f") ||
      err.getMessage.toLowerCase.contains("datatype mismatch"))
  }
}
