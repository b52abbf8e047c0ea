package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** Scratch probe (test scope, not a test): why does q125 PageRank measure
  * 3–4× slower in the driver's post-round re-run (r8: 13.2 s, r10: 19.9 s
  * median) than in the builder's idle-machine bench (~4.9 s) on identical
  * code? Verdict r10 punch item #4 names two hypotheses worth one
  * experiment each:
  *
  *   (a) cache eviction of the persisted adjacency under suite-wide memory
  *       pressure (re-deriving pair-gen per iteration), and
  *   (b) GC / lineage amplification under a contended JVM.
  *
  * Plus the explanation the builder has suspected since r8: plain
  * machine-level CPU contention (the driver re-runs the bench while other
  * round-end work shares the 32 cores; q125 is the most CPU-parallel query
  * in the suite, so it loses the most when the cores are oversubscribed).
  *
  * Modes (one JVM each — run via `sbt "Test/runMain ..."`):
  *   idle   — baseline, nothing else running
  *   cache  — a MEMORY_ONLY hog sized past the storage pool is materialized
  *            first, so q125's adjacency persist (default MEMORY_AND_DISK)
  *            fights an exhausted storage pool → tests hypothesis (a)
  *   cpu    — 32 busy-spin daemon threads oversubscribe the cores 2×
  *            → tests the machine-contention explanation
  *   heap   — run with SPARK_DRIVER_MEM=2g (vs the 8g default) for GC
  *            amplification under a small old gen → tests hypothesis (b)
  *
  * Feeds the SURVEY §6 round-11 note. */
object PageRankContentionProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("idle")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries("q125_pagerank")

    // codegen/classload warm-up, all modes
    fn(spark, sf).count()

    mode match {
      case "cache" =>
        // Hog the storage pool: lineitem × 8 replicas, MEMORY_ONLY (so the
        // hog itself cannot spill — it occupies or evicts, exactly the
        // suite-wide cache-pressure shape). ~8× 70 MB parquet explodes to
        // well past the default storage fraction of an 8g heap.
        import org.apache.spark.sql.functions._
        val hog = spark.read.parquet(s"$sf/lineitem.parquet")
          .crossJoin(spark.range(8))
          .persist(StorageLevel.MEMORY_ONLY)
        println(s"hog rows = ${hog.count()}")
        val pool = spark.sparkContext.getExecutorMemoryStatus.values.head
        println(s"storage pool after hog: remaining ${pool._2 / 1024 / 1024} MB of ${pool._1 / 1024 / 1024} MB")
      case "cpu" =>
        (1 to 32).foreach { i =>
          val t = new Thread(() => { var x = 0L; while (true) { x += 1; if (x == Long.MaxValue) println(x) } }, s"spin-$i")
          t.setDaemon(true)
          t.start()
        }
        println("32 spin threads running (2x core oversubscription)")
      case _ => ()
    }

    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sf).count()
      (System.nanoTime() - t0) / 1e9
    }
    val med = times.sorted.apply(2)
    println(f"mode=$mode heap=${Runtime.getRuntime.maxMemory() / 1024 / 1024} MB: " +
      f"median $med%.2f s  min ${times.min}%.2f s  (${times.map(t => f"$t%.2f").mkString(", ")})")
    spark.stop()
  }
}
