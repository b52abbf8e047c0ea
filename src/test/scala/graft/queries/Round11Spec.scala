package graft.queries

import graft.SparkSpec

/** Pins for the approximate aggregates q202–q210's oracle set cannot gate
  * (sketch outputs are not ANSI-SQL-reproducible — SURVEY.md §2b exemption
  * class): `percentile_approx` and `histogram_numeric`, verified by the
  * exact properties the published algorithms guarantee.
  */
class Round11Spec extends SparkSpec {

  test("percentile_approx: at high accuracy the GK sketch is EXACT on a known dataset") {
    // Greenwald-Khanna with relative error 1/accuracy keeps every sample
    // while n << accuracy, so the result must be the exact order statistic.
    import spark.implicits._
    val n = 10001
    val shuffled = new scala.util.Random(7).shuffle((0 until n).toVector)
    shuffled.toDF("x").createOrReplaceTempView("pa_src")
    val got = spark.sql(
      """SELECT percentile_approx(x, 0.5, 1000000),
        |       percentile_approx(x, 0.25, 1000000),
        |       percentile_approx(x, 0.99, 1000000),
        |       percentile_approx(x, ARRAY(0.0, 1.0), 1000000)
        |FROM pa_src""".stripMargin).collect()(0)
    assert(got.getInt(0) === 5000)
    assert(got.getInt(1) === 2500)
    assert(got.getInt(2) === 9900)
    assert(got.getSeq[Int](3) === Seq(0, 10000), "p0/p1 must be the exact extremes")
  }

  test("percentile_approx: rank error is bounded by n/accuracy at LOW accuracy") {
    import spark.implicits._
    val n = 10000
    (0 until n).toDF("x").createOrReplaceTempView("pa_lo")
    val got = spark.sql(
      "SELECT percentile_approx(x, 0.5, 100) FROM pa_lo").collect()(0).getInt(0)
    // accuracy=100 → relative rank error 1/100 → ±100 ranks around 5000
    assert(math.abs(got - 5000) <= n / 100 + 1,
      s"median estimate $got violates the published GK error bound")
  }

  test("histogram_numeric: bins partition the data — counts sum to n, centroids ordered and in range") {
    import spark.implicits._
    val n = 5000
    (0 until n).map(i => i % 97).toDF("x").createOrReplaceTempView("hn_src")
    val bins = spark.sql(
      "SELECT histogram_numeric(x, 10) FROM hn_src")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(bins.size === 10)
    val counts = bins.map(_.getDouble(1))
    assert(counts.sum === n.toDouble, "bin counts must partition the input exactly")
    val centers = bins.map(_.getInt(0))
    assert(centers === centers.sorted, "centroids must be emitted in order")
    assert(centers.forall(c => c >= 0 && c <= 96), "centroids must lie in the data range")
  }
}
