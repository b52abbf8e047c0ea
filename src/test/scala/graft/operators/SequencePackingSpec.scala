package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Edge cases for the greedy token-budget packer the q115 oracle can't isolate:
  * exact-fit boundaries, oversized documents, shard/lang state resets, and the
  * invariant that bins tile each shard in contiguous doc_id order. */
class SequencePackingSpec extends SparkSpec {

  private def toks(rows: (Long, String, Long, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "lang", "shard", "n_tok")
  }

  private def bins(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bin")).toMap

  test("exact fit stays in the open bin; one token over starts a new one") {
    val out = bins(SequencePacking.pack(
      toks((1, "en", 0, 100), (2, "en", 0, 156), (3, "en", 0, 1)), 256))
    // 100 + 156 == 256 exactly -> same bin; the next doc overflows.
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("a document larger than the budget gets a bin alone, never an empty bin") {
    val out = bins(SequencePacking.pack(
      toks((1, "en", 0, 10), (2, "en", 0, 999), (3, "en", 0, 10)), 256))
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("an oversized FIRST document opens bin 1 (state starts from the row, not 0)") {
    val out = bins(SequencePacking.pack(
      toks((1, "en", 0, 999), (2, "en", 0, 10)), 256))
    assert(out == Map(1L -> 1L, 2L -> 2L))
  }

  test("bin numbering and fill reset on every (lang, shard) change") {
    val out = SequencePacking.pack(
      toks((1, "en", 0, 200), (2, "en", 0, 200),   // en/0: bins 1, 2
           (3, "en", 1, 200), (4, "en", 1, 200),   // en/1: reset -> bins 1, 2
           (5, "fr", 0, 200), (6, "fr", 0, 50)),   // fr/0: reset -> bins 1, 1
      256)
    val got = out.collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("doc_id")) -> r.getAs[Long]("bin")).toMap
    assert(got == Map(
      ("en", 0L, 1L) -> 1L, ("en", 0L, 2L) -> 2L,
      ("en", 1L, 3L) -> 1L, ("en", 1L, 4L) -> 2L,
      ("fr", 0L, 5L) -> 1L, ("fr", 0L, 6L) -> 1L))
  }

  test("bins tile each shard contiguously in doc_id order and respect the budget") {
    val s = spark
    import s.implicits._
    // 40 docs across 2 langs x 2 shards with varying sizes.
    val rows = (1L to 40L).map { i =>
      (i, if (i % 2 == 0) "en" else "fr", i / 20, 30L + (i * 17) % 80)
    }
    val out = SequencePacking.pack(rows.toDF("doc_id", "lang", "shard", "n_tok"), 200)
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("shard"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("n_tok"), r.getAs[Long]("bin")))
    out.groupBy(t => (t._1, t._2)).foreach { case (_, grp) =>
      val sorted = grp.sortBy(_._3)
      // bin ids start at 1 and never jump by more than 1
      assert(sorted.head._5 == 1L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._5 - a._5 == 0 || b._5 - a._5 == 1)
        case _           =>
      }
      // every bin respects the budget unless it is a single oversized doc
      sorted.groupBy(_._5).foreach { case (_, binRows) =>
        val tot = binRows.map(_._4).sum
        assert(tot <= 200 || binRows.length == 1)
      }
      // greedy invariant: a bin closed because the NEXT doc would not fit
      val byBin = sorted.groupBy(_._5).toSeq.sortBy(_._1)
      byBin.sliding(2).foreach {
        case Seq((_, cur), (_, next)) =>
          assert(cur.map(_._4).sum + next.minBy(_._3)._4 > 200)
        case _ =>
      }
    }
  }
}
