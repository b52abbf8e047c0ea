package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): head-to-head timing of the two q36 minhash
  * formulations at sf0.1 — the explode+hash-agg form (shipped) vs the per-row
  * HOF-signature form (q35's shape, banded through a single-reference
  * expression so CollapseProject cannot duplicate the hash lambda). Median of 5
  * warm runs each, interleaved. Not a test.
  */
object Q36Probe {
  private val P = 1000000007L

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def pairCount(bands: DataFrame): DataFrame =
      bands.groupBy(col("band"), col("sig"))
        .agg(array_sort(collect_list(col("doc_id"))).as("ds"))
        .filter(size(col("ds")) > 1)
        .select(explode(expr(
          "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, size(ds)), y -> struct(x AS d1, y AS d2))))"))
          .as("p"))
        .select(col("p.d1").as("d1"), col("p.d2").as("d2"))
        .distinct()
        .agg(count(lit(1)).as("n_candidate_pairs"))

    // shipped form: explode shingles, codegen'd md5, 16-way min hash-agg
    def explodeForm(): DataFrame = {
      val sh = Tables.documents(spark, d)
        .withColumn("toks", split(trim(col("text")), " "))
        .select(col("doc_id"), posexplode(expr(
          "CASE WHEN size(toks) < 3 THEN array() ELSE array_distinct(transform(sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))) END"))
          .as(Seq("pos", "sh")))
        .withColumn("h", expr(
          "CAST(conv(substring(md5(sh), 1, 14), 16, 10) AS BIGINT) % 1000000007"))
      val mins = (0 until 16).map(j =>
        min(expr(s"((h * ${2 * j + 3} + ${j * 7919 + 1}) % $P)")).as(s"mh$j"))
      val sigs = sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      val bands = sigs.select(col("doc_id"),
        posexplode(array((0 until 4).map(b =>
          concat_ws("_", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*)): _*))
          .as(Seq("band", "sig")))
      pairCount(bands)
    }

    // HOF form: everything per-row; every intermediate array referenced ONCE
    def hofForm(): DataFrame = {
      val bands = Tables.documents(spark, d)
        .withColumn("toks", split(trim(col("text")), " "))
        .withColumn("shs", expr(
          "CASE WHEN size(toks) < 3 THEN array() ELSE array_distinct(transform(sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))) END"))
        .withColumn("hs", expr(
          "transform(shs, t -> CAST(conv(substring(md5(t), 1, 14), 16, 10) AS BIGINT) % 1000000007)"))
        .select(col("doc_id"), posexplode(expr(
          s"""transform(sequence(0, 3), b -> concat_ws('_',
             transform(sequence(0, 3), r ->
               cast(array_min(transform(hs, h -> (h * (2 * (b * 4 + r) + 3) + (b * 4 + r) * 7919 + 1) % $P)) as string))))"""))
          .as(Seq("band", "sig")))
      pairCount(bands)
    }

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime(); mk().collect(); (System.nanoTime() - t0) / 1e9
    }
    // sanity: identical results
    val (a, b) = (explodeForm().collect()(0).getLong(0), hofForm().collect()(0).getLong(0))
    println(s"RESULT explode=$a hof=$b match=${a == b}")
    val (te, th) = (Array.fill(5)(0.0), Array.fill(5)(0.0))
    for (i <- 0 until 5) { te(i) = time(explodeForm _); th(i) = time(hofForm _) }
    println(f"EXPLODE median=${te.sorted.apply(2)}%.3f all=${te.map(x => f"$x%.2f").mkString(",")}")
    println(f"HOF     median=${th.sorted.apply(2)}%.3f all=${th.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
