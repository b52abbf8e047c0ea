package graft.sources

import graft.SparkSpec
import graft.pipeline.CellImageFixtures

/** The cellimage DSv2 source: every reference reader option (S1), partition
  * planning, channel projection, and required-column pruning. */
class CellImageSourceSpec extends SparkSpec {

  private lazy val dir: java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("cellimages").toFile
    val mk = (f: Int, n: Int) =>
      (0 until n).map(i => CellImageFixtures.make(s"file_$f", f, i.toLong, channels = 3, w = 8, h = 8))
    CellImageJsonl.write(d, "a.jsonl", mk(0, 20))
    CellImageJsonl.write(d, "b.jsonl", mk(1, 20))
    CellImageJsonl.write(d, "c.jsonl", mk(2, 5))
    d
  }

  private def read(opts: (String, String)*) = {
    val r = spark.read.format("cellimage").option("path", dir.getAbsolutePath)
    opts.foldLeft(r) { case (rr, (k, v)) => rr.option(k, v) }.load()
  }

  test("reads all files and images with the declared schema") {
    val df = read()
    assert(df.count() == 45)
    assert(df.columns.toSeq ==
      Seq("fileId", "imageIdx", "width", "height", "nChannels", "data", "mask"))
    val row = df.filter("fileId = 'file_0' AND imageIdx = 0").collect().head
    assert(row.getAs[scala.collection.Seq[Double]]("data").length == 3 * 8 * 8)
    assert(row.getAs[scala.collection.Seq[Boolean]]("mask").length == 3 * 8 * 8)
  }

  test("filelimit caps the number of files (sorted by name)") {
    val df = read("filelimit" -> "2")
    assert(df.count() == 40)
    assert(df.select("fileId").distinct().count() == 2)
  }

  test("imagelimit caps images per file") {
    assert(read("imagelimit" -> "3").count() == 9) // 3 per file x 3 files
  }

  test("numpartitionsperfile controls input partition planning") {
    val df = read("numpartitionsperfile" -> "5", "filelimit" -> "2")
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 40)
    // slicing must not drop or duplicate rows
    assert(df.select("fileId", "imageIdx").distinct().count() == 40)
  }

  test("channels option projects channel slices (manual pushdown, 1-based)") {
    val full = read().filter("fileId = 'file_0' AND imageIdx = 1").collect().head
    val ch2 = read("channels" -> "2").filter("fileId = 'file_0' AND imageIdx = 1").collect().head
    assert(ch2.getAs[Int]("nChannels") == 1)
    val plane = 8 * 8
    assert(ch2.getAs[scala.collection.Seq[Double]]("data") ==
      full.getAs[scala.collection.Seq[Double]]("data").slice(plane, 2 * plane))
    val ch13 = read("channels" -> "1,3").filter("fileId = 'file_0' AND imageIdx = 1").collect().head
    assert(ch13.getAs[scala.collection.Seq[Double]]("data").length == 2 * plane)
    assert(ch13.getAs[scala.collection.Seq[Double]]("data").slice(plane, 2 * plane) ==
      full.getAs[scala.collection.Seq[Double]]("data").slice(2 * plane, 3 * plane))
  }

  test("masked=false drops the mask column from the schema") {
    val df = read("masked" -> "false")
    assert(!df.columns.contains("mask"))
    assert(df.count() == 45)
  }

  test("required-column pruning reaches the scan (width-only query reads no pixels)") {
    val df = read().select("width")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq == Seq("width"))
    assert(df.distinct().collect().map(_.getInt(0)).toSeq == Seq(8))
  }

  test("limit pushdown caps partition reads") {
    val df = read().limit(4)
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    // pushed limit shows in the scan description and the result is correct
    assert(df.count() == 4)
    assert(scans.forall(_.scan.description().contains("limit=Some(4)")))
  }

  test("imageIdx filter pushdown prunes input partitions (line-range skip)") {
    // 4 partitions/file over 20 images = 5 images per partition; imageIdx < 5
    // must plan exactly ONE partition per file instead of 4
    val unfiltered = read("numpartitionsperfile" -> "4", "filelimit" -> "2")
    assert(unfiltered.rdd.getNumPartitions == 8)
    val df = read("numpartitionsperfile" -> "4", "filelimit" -> "2")
      .filter("imageIdx < 5")
    assert(df.rdd.getNumPartitions == 2, "partitions outside the idx range must not be planned")
    assert(df.count() == 10)
    // range with both bounds: images 6..10 -> 2 partitions per file (spans 5..10)
    val mid = read("numpartitionsperfile" -> "4", "filelimit" -> "1")
      .filter("imageIdx >= 6 AND imageIdx <= 10")
    assert(mid.rdd.getNumPartitions <= 2)
    assert(mid.count() == 5)
  }

  test("fileId filter pushdown skips whole files at planning") {
    val df = read("numpartitionsperfile" -> "3").filter("fileId = 'file_2'")
    // only c.jsonl (5 images) is planned: 3 partitions, not 9
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 5)
    val in2 = read().filter("fileId IN ('file_0', 'file_2')")
    assert(in2.rdd.getNumPartitions == 2)
    assert(in2.count() == 25)
  }

  test("pushed filters are reported on the scan and results stay exact") {
    val df = read().filter("fileId = 'file_1' AND imageIdx >= 18 AND width = 8")
    val scans = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    val desc = scans.head.scan.description()
    assert(desc.contains("PushedFilters:") && desc.contains("fileId") && desc.contains("imageIdx"),
      s"pushed filters must be visible in the scan:\n$desc")
    // width=8 is NOT pushable and must still filter correctly post-scan
    assert(!desc.matches("(?s).*PushedFilters: \\[[^\\]]*width.*"))
    assert(df.collect().map(_.getAs[Long]("imageIdx")).sorted.toSeq == Seq(18L, 19L))
  }

  test("filter pushdown composes with limit and channel projection") {
    val df = read("channels" -> "2", "numpartitionsperfile" -> "4")
      .filter("imageIdx = 7").limit(2)
    val rows = df.collect()
    // a bad limit/bounds intersection would return zero rows, which take(0)/forall
    // below would vacuously accept — pin the expected count first
    assert(rows.length == 2, s"expected limit(2) to return 2 rows, got ${rows.length}")
    assert(rows.map(_.getAs[String]("fileId")).sorted.toSeq ==
      Seq("file_0", "file_1", "file_2"). take(rows.length))
    assert(rows.forall(_.getAs[Long]("imageIdx") == 7L))
    assert(rows.forall(_.getAs[Int]("nChannels") == 1))
  }

  test("feature pipeline runs end-to-end off the source (S1 -> S6 -> F1..F4)") {
    import spark.implicits._
    import graft.pipeline.{CellImage, Features}
    val ds = read("filelimit" -> "1").as[CellImage]
    val feats = ds.flatMap(Features.extract _)
    assert(feats.count() == 20 * 4)
    assert(feats.filter((f: graft.pipeline.CellFeatures) => f.values.length == 3).count() == 80)
  }

  test("COUNT aggregate pushdown: metadata-only count, zero image decode") {
    // the reference's FIRST pipeline is load+count (main.py:27) — the count
    // must come from plan-time line counting, with no reader rows and no JSON
    // parsed. Plan shape: the scan is the COUNT scan and reads count columns.
    val df = read().groupBy().count()
    // the agg introduces an exchange, so the plan is AQE-wrapped and
    // BatchScanExec is not collectible pre-execution — assert on the plan text
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates: [COUNT]"),
      s"count must push into the scan:\n$plan")
    assert(df.collect().head.getLong(0) === 45L)
    // the options ride along: filelimit/imagelimit shape the pushed count
    assert(read("filelimit" -> "2", "imagelimit" -> "3").count() === 6L)

    // ZERO-DECODE PROOF: a file whose non-head lines are INVALID JSON counts
    // fine (plan-time line counting never parses), while a full scan of the
    // same directory dies in the reader trying to decode those lines
    val poison = java.nio.file.Files.createTempDirectory("cellimages_poison").toFile
    val good = CellImageFixtures.make("p_0", 0, 0L, channels = 1, w = 4, h = 4)
    CellImageJsonl.write(poison, "p.jsonl", Seq(good))
    val fw = new java.io.FileWriter(new java.io.File(poison, "p.jsonl"), true)
    try fw.write("this is not json\n{neither is this\n") finally fw.close()
    val pRead = spark.read.format("cellimage").option("path", poison.getAbsolutePath).load()
    assert(pRead.count() === 3L, "count = line count, garbage lines never parsed")
    val e = intercept[Exception](pRead.collect())
    assert(e != null, "a full scan must fail decoding the poisoned lines")
  }

  test("COUNT(col) pushes too (all columns non-nullable); filtered counts do NOT push") {
    import org.apache.spark.sql.functions.count
    val df = read().agg(count("imageIdx"))
    assert(df.queryExecution.executedPlan.toString.contains("PushedAggregates: [COUNT]"))
    assert(df.collect().head.getLong(0) === 45L)
    // a filter above the scan keeps the normal read path (our pushed filters
    // are residual by design, so aggregate pushdown must not engage) — and
    // the filtered count stays exact
    val filtered = read().filter("imageIdx < 5").groupBy().count()
    assert(!filtered.queryExecution.executedPlan.toString.contains("PushedAggregates"),
      "filtered count must take the row-scan path")
    assert(filtered.collect().head.getLong(0) === 15L)
  }
}
