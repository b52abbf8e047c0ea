package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: watermark + state progression of the left-outer stream-stream
  * join replay. Not a test. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val sfDir = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("probe_replay").toFile
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value").orderBy("ts").collect()
    val chunks = ev.grouped(math.max(1, ev.length / 4)).toSeq
    val flat = new java.io.File(dir, "flat"); flat.mkdirs()
    chunks.zipWithIndex.foreach { case (rows, i) =>
      val ds = rows.map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4))).toSeq
        .toDF("event_id", "ts", "user_id", "event_type", "value")
      ds.coalesce(1).write.parquet(s"$dir/chunk_$i")
      val part = new java.io.File(s"$dir/chunk_$i").listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, new java.io.File(flat, f"c$i%03d.parquet").toPath)
    }
    Seq(("zzz1.parquet", -1L, "2030-01-01 00:00:00"), ("zzz2.parquet", -2L, "2030-01-02 00:00:00"),
        ("zzz3.parquet", -3L, "2030-01-03 00:00:00")).foreach { case (fname, id, t) =>
      Seq((id, java.sql.Timestamp.valueOf(t), -1L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.parquet(s"$dir/sent_$id")
      val sfile = new java.io.File(s"$dir/sent_$id").listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(sfile.toPath, new java.io.File(flat, fname).toPath)
    }

    val src = spark.readStream.schema(
      Tables.events(spark, sfDir).select("event_id", "ts", "user_id", "event_type", "value").schema)
      .option("maxFilesPerTrigger", "1").parquet(flat.getAbsolutePath)
    val q = graft.streaming.EventStreams.purchaseClickLeftJoin(src).writeStream
      .format("memory").queryName("probe").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    q.recentProgress.foreach { p =>
      val et = p.eventTime
      println(s"PROGRESS batch=${p.batchId} rows=${p.numInputRows} wm=${et.get("watermark")} max=${et.get("max")} outRows=${p.sink.numOutputRows}")
    }
    val n = spark.table("probe").filter(col("click_id").isNull).count()
    val total = spark.table("probe").count()
    println(s"RESULT nullRows=$n total=$total")
    spark.stop()
  }
}
