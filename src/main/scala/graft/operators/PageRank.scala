package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Convergence-terminated PageRank WITH the dangling-mass term — the
  * production sibling of q125's fixed-5-iteration integer form (which stays
  * the oracle contract: bit-identical in any engine). Real graphs have sinks
  * and unknown mixing times; fixed iteration counts waste rounds on
  * fast-mixing graphs and starve slow ones, and ignoring dangling nodes
  * leaks probability mass every round. This is the published power-iteration
  * recipe (Page et al. / the standard distributed formulation), re-derived:
  *
  *   pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)/deg(u)  +  danglingMass/N )
  *
  *   - the adjacency list is built ONCE and cached node-sized (degree folded
  *     in); each iteration is one node⋈node equi-join + one map-side-combined
  *     aggregate — edge-count-sized rows exist only between the explode and
  *     its aggregate, never as a join input (q125's scale shape);
  *   - the ranks frame carries (pr, prev, sink) so the round's ONE scalar
  *     aggregate returns both the L1 residual Σ|pr - prev| (termination:
  *     stop when < tol, with a maxIter backstop) and the NEXT round's
  *     dangling mass Σ pr over sinks (redistributed uniformly, so Σ pr == 1
  *     holds EXACTLY every round — mass conservation is the spec's
  *     invariant). No per-round anti-join, no separate residual join;
  *   - per-round frames are severed through an RDD localCheckpoint so
  *     lineage stays flat (the q265 discipline — plans nest exponentially
  *     across iterations otherwise). The aggregate job doubles as the
  *     checkpoint's materialization, so each round is exactly ONE job, and
  *     the previous round's checkpoint blocks are unpersisted as soon as the
  *     new frame is materialized (bounded block storage, not maxIter frames).
  *
  * Driver-side state per round: two scalars (residual, dangling mass). */
object PageRank {

  /** Rank `edges` (src, dst — directed, self-loops allowed, duplicates
    * ignored) to convergence. Returns (ranks: node/pr DataFrame, iterations
    * actually run). `tol` is the L1-residual stop threshold. */
  def converge(edges: DataFrame, damping: Double = 0.85, tol: Double = 1e-6,
               maxIter: Int = 50): (DataFrame, Int) = {
    require(damping > 0 && damping < 1, s"pagerank: damping in (0,1), got $damping")
    require(tol > 0, s"pagerank: tol must be positive, got $tol")
    val spark = edges.sparkSession

    // Sever lineage: row-convert, localCheckpoint (truncates lineage and
    // persists on first materialization). LAZY — the caller's next job over
    // the returned frame materializes it; the RDD handle is kept so the
    // round can free the PREVIOUS checkpoint once this one is live.
    def sever(df: DataFrame): (DataFrame, RDD[Row]) = {
      val r = df.rdd
      r.localCheckpoint()
      (spark.createDataFrame(r, df.schema), r)
    }

    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
    // adjacency: node-sized rows, neighbors + degree folded in, built once
    val adj = e.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs"), count(lit(1)).as("deg"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // sink flag folded into the ranks frame once: a sink has no adjacency row
    val nodesSink = nodes
      .join(adj.select(col("src").as("node"), lit(true).as("hasOut")), Seq("node"), "left")
      .select(col("node"), col("hasOut").isNull.as("sink"))
      .persist() // two consumers: the count and the ranks0 build
    val n = nodesSink.count()
    if (n == 0) {
      adj.unpersist(); nodesSink.unpersist()
      return (spark.emptyDataFrame
        .withColumn("node", lit(0L)).withColumn("pr", lit(0.0)).limit(0), 0)
    }
    val base = (1.0 - damping) / n

    var (ranks, ranksRdd) = sever(nodesSink.select(col("node"), col("sink"),
      lit(1.0 / n).as("pr"), lit(1.0 / n).as("prev")))
    // init: materializes ranks0 and reads the first dangling mass (one job)
    var danglingMass = ranks
      .agg(coalesce(sum(when(col("sink"), col("pr")).otherwise(0.0)), lit(0.0)))
      .first().getDouble(0)
    nodesSink.unpersist(blocking = false) // ranks0 is checkpointed now
    var iter = 0
    var residual = Double.MaxValue
    while (iter < maxIter && residual >= tol) {
      val contribs = adj.join(ranks, adj("src") === ranks("node"))
        .select(explode(col("nbrs")).as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      // ranks is node-complete, so building next FROM it keeps every node
      // and carries prev + sink without extra joins
      val (next, nextRdd) = sever(ranks.select(col("node"), col("sink"), col("pr").as("prev"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"), col("sink"),
          (lit(base) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + lit(danglingMass / n))).as("pr"),
          col("prev")))
      // the round's ONE job: materializes the checkpoint and returns both
      // scalars — this round's residual, next round's dangling mass
      val row = next.agg(
        coalesce(sum(abs(col("pr") - col("prev"))), lit(0.0)),
        coalesce(sum(when(col("sink"), col("pr")).otherwise(0.0)), lit(0.0))).first()
      residual = row.getDouble(0)
      danglingMass = row.getDouble(1)
      // next is live in block storage; the previous round's checkpoint is
      // dead weight from here (never recomputed) — free it now
      ranksRdd.unpersist(blocking = false)
      ranks = next
      ranksRdd = nextRdd
      iter += 1
    }
    adj.unpersist()
    (ranks.select(col("node"), col("pr")), iter)
  }
}
