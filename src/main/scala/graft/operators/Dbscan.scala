package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed DBSCAN over integer 2-D points — the native form of the
  * reference's driver-local sklearn call (`image_masking.ipynb` cells 20-25:
  * DBSCAN(eps=2.5, min_samples=1) over pixel coordinates), built as the
  * scale shape every distributed-DBSCAN paper lands on (MR-DBSCAN /
  * RDD-DBSCAN recipes — published algorithms re-derived, no code):
  *
  *   1. CELL BLOCKING: points hash to grid cells of side `eps`; any pair
  *      within eps shares a cell or an adjacent one, so candidates come from
  *      a plain EQUI-join on cell id (left side fans to its 3×3
  *      neighborhood), exact INTEGER distance dx²+dy² ≤ eps² verified inside
  *      the block — candidate volume scales with per-cell density, never n².
  *   2. CORE points have ≥ min_samples ε-neighbors COUNTING the point
  *      itself (sklearn's contract).
  *   3. CLUSTERS = connected components over core-core edges, by min-label
  *      propagation with POINTER JUMPING: each round takes the min label
  *      over neighbors, then compresses one indirection
  *      (label(v) := label(label(v))), so rounds are O(log diameter) — a
  *      dense ε-graph forms long thin components where plain O(diameter)
  *      propagation does not converge in bounded rounds. Per-round
  *      localCheckpoint truncates lineage (plans nest exponentially across
  *      iterations otherwise); the only driver-side state is one
  *      convergence scalar per round.
  *   4. BORDER points (non-core with a core neighbor) adopt the MINIMUM
  *      cluster label among their core neighbors — deterministic, where
  *      sklearn's border assignment is scan-order-dependent (an equally
  *      valid DBSCAN labeling; with min_samples=1 — the reference's
  *      setting — every point is core and the two agree exactly).
  *   5. NOISE labels -1.
  */
object Dbscan {

  /** Cluster `pts` — columns (id: BIGINT, x: BIGINT, y: BIGINT), ids unique,
    * coordinates non-negative — returning (id, label): label is the minimum
    * core id of the point's cluster, or -1 for noise. */
  def label(pts: DataFrame, eps: Long, minSamples: Int): DataFrame = {
    require(eps > 0, "dbscan: eps must be positive")
    require(minSamples >= 1, "dbscan: min_samples must be >= 1")
    val eps2 = eps * eps
    // ε-neighborhood candidates: right side in its own cell, left fans to the
    // 3×3 neighborhood — each ordered pair found exactly once, both
    // directions present because every point plays both sides
    val right = pts
      .withColumn("cell", expr(s"(x DIV $eps) * 1000000 + (y DIV $eps)"))
      .select(col("id").as("idb"), col("x").as("xb"), col("y").as("yb"), col("cell"))
    val left = pts
      .withColumn("dxy", explode(array(
        (for (dx <- -1 to 1; dy <- -1 to 1) yield lit(dx * 1000000L + dy)): _*)))
      .select(col("id").as("ida"), col("x"), col("y"),
        (expr(s"(x DIV $eps) * 1000000 + (y DIV $eps)") + col("dxy")).as("cell"))
    val nbrs = left.join(right, "cell")
      .where(col("ida") =!= col("idb") &&
        (col("x") - col("xb")) * (col("x") - col("xb")) +
          (col("y") - col("yb")) * (col("y") - col("yb")) <= eps2)
      .select(col("ida"), col("idb"))
      .cache()
    // core ⇔ |ε-neighborhood incl. self| >= min_samples (sklearn's contract)
    val coreBase = nbrs.groupBy(col("ida")).agg(count(lit(1)).as("n"))
      .where(col("n") + 1 >= minSamples)
      .select(col("ida").as("id"))
    // min_samples=1: a fully isolated point has no nbrs row at all but IS
    // core (its neighborhood of one reaches the threshold) — its own
    // singleton cluster, per sklearn
    val core = (if (minSamples == 1)
        coreBase.unionByName(pts.select(col("id"))
          .join(nbrs.select(col("ida").as("id")), Seq("id"), "left_anti"))
      else coreBase)
      .cache()
    val coreEdges = nbrs
      .join(core.select(col("id").as("ida")), "ida")
      .join(core.select(col("id").as("idb")), "idb")
      .select(col("ida").as("src"), col("idb").as("dst"))
      .cache()
    // labels start over ALL cores so a neighbor-less core stays its own
    // singleton cluster
    var labels = core.select(col("id").as("node"), col("id").as("label"))
      .localCheckpoint(true)
    var prevSum = Long.MinValue
    var converged = false
    var iter = 0
    while (!converged && iter < 30) {
      val neighborLabels = coreEdges.join(labels, coreEdges("dst") === labels("node"))
        .select(coreEdges("src").as("node"), col("label"))
      val stepped = labels.union(neighborLabels)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
      val jumped = stepped.as("a")
        .join(stepped.select(col("node").as("jn"), col("label").as("jl")).as("b"),
          col("a.label") === col("jn"), "left")
        .select(col("a.node").as("node"),
          coalesce(col("jl"), col("a.label")).as("label"))
      // sever lineage through an RDD round trip, then checkpoint: a direct
      // localCheckpoint would try to PRESERVE the plan's constraints, and
      // this union-of-self-derived-legs shape (both legs share the previous
      // checkpoint's attribute ids, and the initial labels alias one column
      // twice) crashes Catalyst's union constraint rewrite
      // ("key not found: node#N"). The label frame is core-count-sized; the
      // per-round Row conversion is noise next to the join+agg shuffle.
      val next = pts.sparkSession.createDataFrame(jumped.rdd, jumped.schema)
        .localCheckpoint(true)
      val sum2 = next.agg(coalesce(sum(col("label")), lit(0L))).first().getLong(0)
      labels = next
      converged = sum2 == prevSum
      prevSum = sum2
      iter += 1
    }
    val coreLabels = labels
    // border: non-core points adopt the MIN label among their core neighbors
    val border = nbrs
      .join(core.select(col("id").as("ida")), Seq("ida"), "left_anti")
      .join(coreLabels.select(col("node").as("idb"), col("label")), "idb")
      .groupBy(col("ida").as("id")).agg(min(col("label")).as("border_label"))
    // assemble core / border / noise with LEFT JOINS + coalesce rather than
    // unions: both would-be union legs contain the same checkpointed plan
    // (identical attribute ids), which trips Catalyst's union constraint
    // rewrite ("key not found: node#N") — joins don't share that path
    val out = pts.select(col("id"))
      .join(coreLabels.select(col("node").as("id"), col("label").as("core_label")),
        Seq("id"), "left")
      .join(border, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("core_label"), col("border_label"), lit(-1L)).as("label"))
      .localCheckpoint(true)
    nbrs.unpersist()
    core.unpersist()
    coreEdges.unpersist()
    out
  }
}
