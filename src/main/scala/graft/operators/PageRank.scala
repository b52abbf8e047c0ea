package graft.operators

import org.apache.spark.sql.DataFrame
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
  *   - danglingMass = Σ pr over sink nodes (one scalar aggregate per round —
  *     an anti-join of ranks against the adjacency's key set), redistributed
  *     uniformly, so Σ pr == 1 holds EXACTLY every round (mass conservation
  *     is the spec's invariant);
  *   - termination: L1 residual Σ|pr' - pr| < tol, checked with the same
  *     aggregate pass that materializes the round (no extra job), with a
  *     maxIter backstop; per-round frames are severed through an RDD round
  *     trip + localCheckpoint so lineage stays flat (the q265 discipline —
  *     plans nest exponentially across iterations otherwise).
  *
  * Driver-side state per round: two scalars (dangling mass, residual). */
object PageRank {

  /** Rank `edges` (src, dst — directed, self-loops allowed, duplicates
    * ignored) to convergence. Returns (ranks: node/pr DataFrame, iterations
    * actually run). `tol` is the L1-residual stop threshold. */
  def converge(edges: DataFrame, damping: Double = 0.85, tol: Double = 1e-6,
               maxIter: Int = 50): (DataFrame, Int) = {
    require(damping > 0 && damping < 1, s"pagerank: damping in (0,1), got $damping")
    require(tol > 0, s"pagerank: tol must be positive, got $tol")
    val spark = edges.sparkSession
    def sever(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).localCheckpoint(true)

    val e = edges.select(col("src").cast("long"), col("dst").cast("long")).distinct()
    // adjacency: node-sized rows, neighbors + degree folded in, built once
    val adj = e.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs"), count(lit(1)).as("deg"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    if (n == 0) {
      adj.unpersist(); nodes.unpersist()
      return (spark.emptyDataFrame
        .withColumn("node", lit(0L)).withColumn("pr", lit(0.0)).limit(0), 0)
    }
    val base = (1.0 - damping) / n

    var ranks = sever(nodes.withColumn("pr", lit(1.0 / n)))
    var iter = 0
    var residual = Double.MaxValue
    while (iter < maxIter && residual >= tol) {
      // sinks hold the mass their zero out-degree would otherwise leak
      val danglingMass = ranks
        .join(adj.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum(col("pr")), lit(0.0))).first().getDouble(0)
      val contribs = adj.join(ranks, adj("src") === ranks("node"))
        .select(explode(col("nbrs")).as("node"), (col("pr") / col("deg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      val next = sever(nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) *
            (coalesce(col("contrib"), lit(0.0)) + lit(danglingMass / n))).as("pr")))
      residual = next.join(ranks.select(col("node"), col("pr").as("prev")), Seq("node"))
        .agg(coalesce(sum(abs(col("pr") - col("prev"))), lit(0.0))).first().getDouble(0)
      ranks = next
      iter += 1
    }
    adj.unpersist()
    nodes.unpersist()
    (ranks, iter)
  }
}
