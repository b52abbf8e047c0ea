package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the round-7 operators beyond the DuckDB hash gate: the CMS
  * one-sided error guarantee that justifies q140's sketch-then-recheck shape,
  * q145's SQL-function inlining (the whole point of a SQL UDF over a closure
  * UDF), q146's local-prune-then-global skyline vs the brute-force dominance
  * definition, and q141's OR-merged bitmap roll-up vs a direct distinct.
  */
class Round7Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q140: CMS estimates dominate true counts (one-sided error ⇒ candidate superset)") {
    val toks = graft.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val skBytes = toks
      .agg(expr("count_min_sketch(tok, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(skBytes))
    val exact = toks.groupBy("tok").count().collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (tok, cnt) = (r.getString(0), r.getLong(1))
      assert(cms.estimateCount(tok) >= cnt,
        s"CMS under-estimated '$tok': ${cms.estimateCount(tok)} < $cnt")
    }
  }

  test("q145: the SQL function body is inlined — no trace of the function in the optimized plan") {
    val df = graft.Registry.byName("q145_sql_udf").fn(spark, sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_net_revenue"),
      "SQL UDF survived optimization instead of being inlined")
    // and the executed plan stays inside whole-stage codegen (no opaque UDF node)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF"), "unexpected closure UDF in the physical plan")
  }

  test("q146: distributed skyline equals the brute-force dominance definition") {
    val got = graft.Registry.byName("q146_skyline").fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = graft.Tables.part(spark, sf)
      .select(expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").as("p"),
        col("p_size").cast("long").as("s"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = pts.filter { case (p, s0) =>
      !pts.exists { case (bp, bs) =>
        bp <= p && bs <= s0 && (bp < p || bs < s0)
      }
    }.toSet
    assert(got == brute, s"skyline mismatch: got ${got.size}, brute ${brute.size}")
    assert(got.nonEmpty)
  }

  test("q141: OR-merged bitmap ALL row equals a direct distinct count") {
    val got = graft.Registry.byName("q141_bitmap_distinct").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sf)
    val exactAll = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    assert(got("ALL") == exactAll, s"bitmap ALL ${got("ALL")} != exact $exactAll")
    val exactPer = ev.groupBy("event_type").agg(countDistinct(col("user_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactPer.foreach { case (t, n) => assert(got(t) == n, s"bitmap $t ${got(t)} != $n") }
  }
}
