package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salted join/aggregation: result parity with the unsalted plan on skewed data,
  * and the salt actually spreading a hot key. */
class SaltedJoinSpec extends SparkSpec {

  private def skewed = {
    import spark.implicits._
    // 90% of rows share key 0 (the hot key), the rest spread over 100 keys
    (0 until 10000).map { i =>
      val k = if (i % 10 != 0) 0L else (i % 100).toLong
      (k, i.toLong, s"v$i")
    }.toDF("k", "seq", "payload")
  }

  private def dim = {
    import spark.implicits._
    (0L until 100L).map(k => (k, s"dim_$k")).toDF("k", "dname")
  }

  test("salted inner join equals the plain join on skewed data") {
    val plain = skewed.join(dim, "k").select("k", "seq", "dname")
    val salted = SaltedJoin.inner(skewed, dim, "k", n = 8).select("k", "seq", "dname")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted aggregation equals plain groupBy on skewed data") {
    val plain = skewed.groupBy("k")
      .agg(sum(col("seq")).as("sum"), count(lit(1)).as("count"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val salted = SaltedJoin.groupSumCount(skewed, "k", "seq", n = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("the hot key's rows spread across multiple salt buckets") {
    val salted = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
    val buckets = salted.filter(col("k") === 0)
      .groupBy("__salt").count().collect()
    assert(buckets.length == 8, s"hot key must hit all 8 salts, got ${buckets.length}")
    // no bucket may hold more than half the hot rows (i.e., the skew actually splits)
    val total = buckets.map(_.getLong(1)).sum
    assert(buckets.forall(_.getLong(1) < total / 2))
  }

  test("salting is deterministic across re-evaluation (no rand(): retry-safe)") {
    val s1 = SaltedJoin.inner(skewed, dim, "k", n = 4).orderBy("seq").collect()
    val s2 = SaltedJoin.inner(skewed, dim, "k", n = 4).orderBy("seq").collect()
    assert(s1.toSeq == s2.toSeq)
  }
}
