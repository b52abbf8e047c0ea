package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.types._

/** Pins the SCOPING of the parquet fieldId session confs (GraftFieldIds):
  * the READ-side conf — the one that switches resolution semantics — must
  * NOT be set by merely configuring a graft catalog or using non-renamed
  * graft tables; it engages only when the session touches a table actually
  * flipped to id resolution by RENAME COLUMN. (A per-relation option is not
  * an alternative on Spark 4.1: both parquet paths clobber it from SQLConf —
  * the write-side half of that experiment is reproduced here.) */
class FieldIdScopeSpec extends SparkSpec {

  private def idMeta(id: Long) =
    new MetadataBuilder().putLong("parquet.field.id", id).build()

  private def footerSchema(dir: String): org.apache.parquet.schema.MessageType = {
    val st = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val f = try {
      val it = st.iterator()
      var found: java.nio.file.Path = null
      while (it.hasNext && found == null) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) found = p
      }
      found
    } finally st.close()
    val fr = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.toString),
        new org.apache.hadoop.conf.Configuration()))
    try fr.getFooter.getFileMetaData.getSchema finally fr.close()
  }

  test("non-renamed graft usage leaves non-graft parquet READ semantics virgin") {
    // entry state: no fieldId confs (other suites may have legitimately
    // enabled them through renamed tables — this pin is about the MECHANISM)
    spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
    val d = java.nio.file.Files.createTempDirectory("graft_fidscope")
    spark.conf.set("spark.sql.catalog.gfs", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs.root", d.toString)
    // real catalog traffic, no rename anywhere
    spark.sql("CREATE TABLE gfs.ns.plain (a BIGINT, b STRING) USING parquet")
    spark.sql("INSERT INTO gfs.ns.plain VALUES (1, 'x'), (2, 'y')")
    assert(spark.sql("SELECT COUNT(*) FROM gfs.ns.plain").collect().head.getLong(0) === 2)
    // READ conf untouched: only the benign write-side stamping conf is set
    assert(!spark.conf.getOption("spark.sql.parquet.fieldId.read.enabled").exists(_.toBoolean),
      "plain graft usage must not flip parquet read resolution for the session")
    // and a non-graft parquet read behaves exactly like a virgin session:
    // an id-carrying user schema with RENAMED names resolves BY NAME (nulls),
    // not by id
    val dir = d.resolve("outside").toString
    val schema = StructType(Seq(
      StructField("a", LongType, nullable = true, idMeta(1)),
      StructField("b", StringType, nullable = true, idMeta(2))))
    spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(7L, "z")), schema)
      .write.mode("overwrite").parquet(dir)
    val renamed = StructType(Seq(
      StructField("renamed_a", LongType, nullable = true, idMeta(1)),
      StructField("renamed_b", StringType, nullable = true, idMeta(2))))
    val rows = spark.read.schema(renamed).parquet(dir).collect()
    assert(rows.forall(r => r.isNullAt(0) && r.isNullAt(1)),
      "non-graft reads must stay NAME-resolved (virgin semantics) in this session")
  }

  test("touching a renamed table engages id resolution for the session") {
    spark.conf.unset("spark.sql.parquet.fieldId.read.enabled")
    val d = java.nio.file.Files.createTempDirectory("graft_fidscope2")
    spark.conf.set("spark.sql.catalog.gfs2", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gfs2.root", d.toString)
    spark.sql("CREATE TABLE gfs2.ns.r (a BIGINT, b STRING) USING parquet")
    spark.sql("INSERT INTO gfs2.ns.r VALUES (1, 'x')")
    spark.sql("ALTER TABLE gfs2.ns.r RENAME COLUMN a TO a2")
    // the rename flipped the table; the session conf follows (here via the
    // DDL; a FRESH session engages at first loadTable of the flipped table)
    assert(spark.conf.get("spark.sql.parquet.fieldId.read.enabled") === "true")
    assert(spark.sql("SELECT a2 FROM gfs2.ns.r").collect().map(_.getLong(0)).toSeq
      === Seq(1L), "old segments resolve by id under the new name")
  }

  test("per-relation fieldId options are clobbered by Spark (the documented dead end)") {
    // with the session write conf OFF, a .option(...) write must produce an
    // id-less footer — proving options cannot scope this, only session confs
    val prev = spark.conf.getOption("spark.sql.parquet.fieldId.write.enabled")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    try {
      val dir = java.nio.file.Files.createTempDirectory("fid_deadend").toString + "/t"
      val schema = StructType(Seq(StructField("a", LongType, nullable = true, idMeta(1))))
      spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(1L)), schema)
        .write.option("spark.sql.parquet.fieldId.write.enabled", "true")
        .mode("overwrite").parquet(dir)
      val fs = footerSchema(dir)
      assert(fs.getFields.get(fs.getFieldIndex("a")).getId == null,
        s"option should have been clobbered (else delete the session-conf scoping!): $fs")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.parquet.fieldId.write.enabled", v)
      case None => spark.conf.unset("spark.sql.parquet.fieldId.write.enabled")
    }
  }
}
