package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Local stress-scale generator: replicates the driver's sf0.1 testdata by an
  * integer factor into a new directory, remapping keys so replicas stay
  * referentially consistent (orders→customer, lineitem→orders) and perturbing
  * document text so replicas are NEAR-duplicates rather than byte-identical —
  * the realistic duplicate structure a web-scale corpus has, and the honest
  * stress for the LSH/near-dup family (bucket sizes grow, pair-gen must not
  * explode).
  *
  * Usage: runMain graft.tools.ScaleUp <inDir> <outDir> <factor>
  * The output serves ONLY local scaling experiments (BENCH at /tmp scale);
  * the driver's own sf dirs stay read-only and authoritative.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val Array(in, out, fStr) = args.take(3)
    val factor = fStr.toInt
    require(factor >= 1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.ts is TIMESTAMP(NANOS); read it as a raw long (the same trick
      // Tables.events uses) and write it back as a plain int64
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$in/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dimension-ish tables: copy through unchanged
    Seq("region", "nation", "supplier", "part").foreach(t => write(read(t), t))

    /** Stack `factor` copies of `df`, offsetting each key column by
      * copyIndex * (max(key)+1) so copies never collide and references remap
      * consistently with the same offset base on both sides of a join. */
    def replicate(df: DataFrame, keys: Map[String, Long])(
        perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until factor).map { i =>
        val shifted = keys.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, col(c) + lit(base * i))
        }
        perCopy(shifted, i)
      }.reduce(_ unionAll _)

    def keyBase(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1

    val cust = read("customer")
    val custBase = keyBase(cust, "c_custkey")
    write(replicate(cust, Map("c_custkey" -> custBase))(), "customer")

    val orders = read("orders")
    val orderBase = keyBase(orders, "o_orderkey")
    write(replicate(orders, Map("o_orderkey" -> orderBase, "o_custkey" -> custBase))(),
      "orders")

    val li = read("lineitem")
    write(replicate(li, Map("l_orderkey" -> orderBase))(), "lineitem")

    val ev = read("events")
    val evBase = keyBase(ev, "event_id")
    val userBase = keyBase(ev, "user_id")
    write(replicate(ev, Map("event_id" -> evBase, "user_id" -> userBase))(), "events")

    val docs = read("documents")
    val docBase = keyBase(docs, "doc_id")
    write(replicate(docs, Map("doc_id" -> docBase)) { (d, i) =>
      if (i == 0) d
      // perturbed tail: each copy is a near-duplicate of copy 0, not an exact
      // one — n_chars stays consistent with the text it describes
      else d.withColumn("text", concat(col("text"), lit(s" rep$i")))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    val emb = read("embeddings")
    val vecBase = keyBase(emb, "vec_id")
    write(replicate(emb, Map("vec_id" -> vecBase))(), "embeddings")

    println(s"scaled $in x$factor -> $out")
    spark.stop()
  }
}
