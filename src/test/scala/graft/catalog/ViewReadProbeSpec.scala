package graft.catalog
import graft.SparkSpec
class ViewReadProbeSpec extends SparkSpec {
  private lazy val root = {
    val d = java.nio.file.Files.createTempDirectory("graft_vread")
    spark.conf.set("spark.sql.catalog.gvr", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gvr.root", d.toString)
    d
  }
  test("SELECT through a v2 ViewCatalog view resolves natively") {
    root
    spark.sql("DROP TABLE IF EXISTS gvr.ns.t1")
    spark.sql("CREATE TABLE gvr.ns.t1 (k BIGINT) USING parquet")
    spark.sql("INSERT INTO gvr.ns.t1 VALUES (1), (2)")
    val d = GraftViews.Def("SELECT k, k * 2 AS dbl FROM gvr.ns.t1", "gvr", Seq("ns"),
      new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.LongType)
        .add("dbl", org.apache.spark.sql.types.LongType),
      Seq("k", "dbl"), Nil, Nil, Map.empty)
    assert(GraftViews.createExclusive(root.resolve("ns").resolve("v1"), d))
    val rows = spark.sql("SELECT dbl FROM gvr.ns.v1 ORDER BY dbl").collect().map(_.getLong(0))
    assert(rows.toSeq === Seq(2L, 4L))
  }
}
