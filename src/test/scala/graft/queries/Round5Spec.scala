package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Pins for the round-5 no-oracle queries: q126's binaryFile+PNG pipeline
  * against an independent in-memory render, and q127's HLL sketch estimates
  * against exact distinct counts. */
class Round5Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q126: binaryFile scan + real PNG decode matches the in-memory render") {
    val rows = graft.Registry.byName("q126_binaryfile_scan").fn(spark, sf).collect()
    assert(rows.length == Round5Queries.PngCount)
    rows.zipWithIndex.foreach { case (r, k) =>
      val (w, h) = (20 + k, 12 + k)
      val px = Round5Queries.plane(k, w, h)
      assert(r.getAs[String]("name") == f"img_$k%02d.png")
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      // PNG is lossless and the plane is 0..255 integral: the decoded sum is exact.
      assert(r.getAs[Long]("pix_sum") == px.sum.toLong,
        s"img $k pixel sum drifted through the PNG round-trip")
      assert(r.getAs[Long]("byte_len") > 0)
    }
  }

  test("q127: per-group and unioned HLL estimates are exact at this cardinality") {
    val got = graft.Registry.byName("q127_hll_sketch_union").fn(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = graft.Tables.events(spark, sf)
    val exactPer = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.select(countDistinct(col("user_id"))).head.getLong(0)
    // 150 users << 2^12 registers: HLL runs in sparse mode and is exact.
    exactPer.foreach { case (t, n) =>
      assert(got(t) == n, s"event_type $t: sketch ${got(t)} != exact $n")
    }
    assert(got("ALL") == exactAll, s"union estimate ${got("ALL")} != $exactAll")
    assert(got.size == exactPer.size + 1)
  }
}
