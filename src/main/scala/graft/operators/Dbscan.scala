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
  *   3. CLUSTERS = connected components over core-core edges, by
  *      HOOK–COMPRESS–CONTRACT (the Shiloach–Vishkin shape, published
  *      algorithm re-derived): each round hooks every supernode to the min
  *      of itself and its neighbors (a parent forest), pointer-doubles the
  *      forest to its roots (O(log depth) node-sized self-joins — hook
  *      alone is O(n) rounds on a path, and label propagation stalls on
  *      converged plateaus), then rewrites the deduped edge list through
  *      the root mapping so the supernode graph shrinks geometrically.
  *      Per-round checkpoints truncate lineage (plans nest exponentially
  *      across iterations otherwise); driver-side state is one scalar per
  *      (inner or outer) round.
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
  def label(pts: DataFrame, eps: Long, minSamples: Int,
            localFinishEdges: Long = 100000L): DataFrame = {
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
    // connected components by HOOK–COMPRESS–CONTRACT (Shiloach–Vishkin):
    // hook every supernode to the min of itself and its neighbors (a parent
    // forest), pointer-double the forest to its roots, rewrite the edge
    // list through the root mapping (self-loops dropped, dedup'd), compose
    // the mapping into the per-point labels, repeat until edgeless. The
    // supernode graph shrinks geometrically; measured alternatives both
    // fail: label propagation (even with per-round pointer jumping) stalls
    // on converged plateaus — a front advances one hop per round, 30 rounds
    // without convergence on the sf0.1 ε-graph — and hook-only contraction
    // is O(n) rounds on a path (the chain just shifts by one). A
    // component's global-minimum node always maps to itself, so the final
    // representative IS the component min — deterministic. Per-round frames
    // are severed through an RDD round trip before checkpointing (a direct
    // localCheckpoint preserves plan constraints, and self-derived join legs
    // sharing the previous checkpoint's attribute ids crash Catalyst's
    // constraint rewrite — "key not found: node#N").
    def sever(df: DataFrame): DataFrame =
      pts.sparkSession.createDataFrame(df.rdd, df.schema).localCheckpoint(true)
    // one pointer-doubling step, m := m∘m (left join: roots miss and keep)
    def double(m: DataFrame): DataFrame = {
      val m2 = m.select(col("mnode").as("jn"), col("mrep").as("jr"))
      m.join(m2, m("mrep") === m2("jn"), "left")
        .select(col("mnode"), coalesce(col("jr"), col("mrep")).as("mrep"))
    }
    var labels = sever(core.select(col("id").as("node"), col("id").as("label")))
    var e = sever(coreEdges.select(col("src"), col("dst")).distinct())
    var edgeCount = e.count()
    var iter = 0
    // once distributed contraction has shrunk the supernode graph under a
    // FIXED bound, finish locally: collecting a ≤100k-edge remainder is
    // metadata-class (the standard local-fallback every production CC
    // implementation ends with), and it replaces a long tail of outer
    // rounds that would each drive full distributed machinery over a
    // few-hundred-row frame. The geometric shrink guarantees the bound is
    // reached in O(log n) distributed rounds regardless of input size.
    // (`localFinishEdges` is parameterized so specs can pin the distributed
    // loop end-to-end with a zero threshold.)
    while (iter < 30 && edgeCount > localFinishEdges) {
      // HOOK: m(v) = min(v, min neighbor) — a parent forest (m(v) <= v,
      // roots point to themselves). Hook alone is O(n) rounds on a path
      // (each contraction only shifts the chain by one), so:
      // COMPRESS: pointer-double the forest until every pointer is a root —
      // O(log depth) node-sized self-joins, the Shiloach–Vishkin shortcut
      // step. Every mrep is itself a domain node (it is some node's min
      // neighbor, and e is symmetric), so the left join only misses at
      // roots. The hook flows lazily into the first doubling and each
      // materialization applies TWO doublings — half the job count, the
      // dominant cost of the loop at test scale.
      var m = e.groupBy(col("src").as("mnode"))
        .agg(min(col("dst")).as("mn"))
        .select(col("mnode"), least(col("mnode"), col("mn")).as("mrep"))
      var prev = -1L
      var cur = -2L
      while (cur != prev) {
        m = sever(double(double(m)))
        prev = cur
        cur = m.agg(coalesce(sum(col("mrep")), lit(0L))).first().getLong(0)
      }
      // compose into the per-point labels (left join: supernodes that have
      // already contracted to edgeless singletons keep their label)
      labels = sever(labels
        .join(m, labels("label") === m("mnode"), "left")
        .select(labels("node"), coalesce(col("mrep"), labels("label")).as("label")))
      // CONTRACT the edge list through m; every endpoint of e is in m
      val ms = m.select(col("mnode").as("src"), col("mrep").as("srep"))
      val md = m.select(col("mnode").as("dst"), col("mrep").as("drep"))
      e = sever(e.join(ms, "src").join(md, "dst")
        .select(col("srep").as("src"), col("drep").as("dst"))
        .where(col("src") =!= col("dst"))
        .distinct())
      edgeCount = e.count()
      iter += 1
    }
    if (edgeCount > 0) {
      // LOCAL FINISH: union-find with path compression over the bounded
      // remainder, union-by-min so the representative invariant (component
      // min) is preserved; applied back as ONE broadcast-joined mapping
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
        r
      }
      e.collect().foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) { if (a < b) parent(b) = a else parent(a) = b }
      }
      val mapping = parent.keys.map(k => (k, find(k))).toSeq
      val mapDf = broadcast(
        pts.sparkSession.createDataFrame(mapping).toDF("mnode", "mrep"))
      labels = sever(labels
        .join(mapDf, labels("label") === mapDf("mnode"), "left")
        .select(labels("node"), coalesce(col("mrep"), labels("label")).as("label")))
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
