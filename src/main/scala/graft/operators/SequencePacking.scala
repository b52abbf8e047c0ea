package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy token-budget sequence packing (the LLM-training batch-assembly op).
  *
  * Packs rows into bins of at most `budget` tokens, walking each
  * (lang, shard) group in doc_id order: a row that would overflow the open bin
  * starts a new one; a row larger than the whole budget still lands in a bin
  * alone (bins are never empty). The carry (bin fill) is a loop dependency no
  * window frame can express, so packing is sharded: one exchange on the shard
  * key, a secondary sort within partitions, then a streaming per-partition
  * scan that resets state on shard change — no per-group materialization, and
  * shards bound packing state at any corpus size while packing in parallel.
  *
  * Input columns: doc_id LONG, lang STRING, shard LONG, n_tok LONG.
  * Output: input columns + bin LONG (1-based within each (lang, shard)).
  */
object SequencePacking {

  def pack(toks: DataFrame, budget: Long): DataFrame = {
    val s = toks.sparkSession
    import s.implicits._
    toks
      .select(col("doc_id"), col("lang"), col("shard"), col("n_tok"))
      .repartition(col("lang"), col("shard"))
      .sortWithinPartitions(col("lang"), col("shard"), col("doc_id"))
      .as[(Long, String, Long, Long)]
      .mapPartitions { it =>
        var lang: String = null
        var shard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (docId, lg, sh, n) =>
          if (lg != lang || sh != shard) { lang = lg; shard = sh; bin = 1L; fill = n }
          else if (fill + n > budget) { bin += 1; fill = n }
          else fill += n
          (docId, lg, sh, n, bin)
        }
      }
      .toDF("doc_id", "lang", "shard", "n_tok", "bin")
  }
}
