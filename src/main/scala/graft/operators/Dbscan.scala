package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed DBSCAN over integer 2-D points — the native form of the
  * reference's driver-local sklearn call (`image_masking.ipynb` cells 20-25:
  * DBSCAN(eps=2.5, min_samples=1) over pixel coordinates), built as the
  * scale shape every distributed-DBSCAN paper lands on (MR-DBSCAN /
  * RDD-DBSCAN recipes — published algorithms re-derived, no code):
  *
  *   0. COINCIDENT-POINT PRE-COLLAPSE: identical (x, y) coordinates collapse
  *      to ONE weighted representative (rep id = min point id, weight =
  *      multiplicity) BEFORE candidate generation. Co-located points have
  *      identical ε-neighborhoods, so they share core status and cluster
  *      label by definition — k stacked points cost O(k) (one group-by +
  *      one final coordinate equi-join fan-out), never k² candidate pairs.
  *      This matters because quantized coordinates are the NORM at scale
  *      (pixel grids, geohashes): the sf1 stress measured the un-collapsed
  *      form going 8–9× at 10× data purely from coordinate stacking, vs
  *      ~2× suite-wide.
  *   1. CELL BLOCKING: representatives hash to grid cells of side `eps`; any
  *      pair within eps shares a cell or an adjacent one, so candidates come
  *      from a plain EQUI-join on the (cx, cy) cell key (left side fans to
  *      its 3×3 neighborhood — unpacked two-column key, so no packed-id
  *      collisions), exact INTEGER distance dx²+dy² ≤ eps² verified inside
  *      the block — candidate volume scales with per-cell DISTINCT-coordinate
  *      density, never n².
  *   2. CORE points have ≥ min_samples ε-neighbors COUNTING the point
  *      itself (sklearn's contract) — in collapsed form: own multiplicity
  *      plus the multiplicity-weighted sum over neighbor coordinates. The
  *      left join that computes it also covers the isolated-coordinate case
  *      (no neighbor rows, weight alone decides) uniformly.
  *   3. CLUSTERS = connected components over core-core edges via the shared
  *      [[ConnectedComponents]] engine (hook–compress–contract with bounded
  *      local finish — see its scaladoc for the algorithm and the measured
  *      failure modes of the alternatives).
  *   4. BORDER points (non-core with a core neighbor) adopt the MINIMUM
  *      cluster label among their core neighbors — deterministic, where
  *      sklearn's border assignment is scan-order-dependent (an equally
  *      valid DBSCAN labeling; with min_samples=1 — the reference's
  *      setting — every point is core and the two agree exactly).
  *   5. NOISE labels -1.
  */
object Dbscan {

  /** Coordinate bound: with 0 ≤ x,y < 2^30 and eps ≤ 2^30, every squared
    * distance (< 2^61) and eps² (≤ 2^60) fits a Long with headroom — enforced
    * by a cheap aggregate over the COLLAPSED table before blocking, because a
    * silent overflow would produce wrong neighborhoods, not an error. */
  private val CoordBound = 1L << 30

  /** Collapse identical coordinates to one weighted representative:
    * (id = min point id at the coordinate, x, y, w = multiplicity). */
  private[graft] def collapse(pts: DataFrame): DataFrame =
    pts.groupBy(col("x"), col("y"))
      .agg(min(col("id")).as("id"), count(lit(1)).as("w"))
      .select(col("id"), col("x"), col("y"), col("w"))

  /** ε-candidate pairs over COLLAPSED representatives: (ida, idb, wb) for
    * every ordered pair of DISTINCT coordinates within eps (both directions
    * present because every rep plays both sides). Candidate volume scales
    * with distinct-coordinate density — k points stacked on one coordinate
    * contribute ONE rep, so zero pairs among themselves. */
  private[graft] def repCandidates(reps: DataFrame, eps: Long): DataFrame = {
    val eps2 = eps * eps
    val right = reps.select(col("id").as("idb"), col("x").as("xb"),
      col("y").as("yb"), col("w").as("wb"),
      expr(s"x DIV $eps").as("cx"), expr(s"y DIV $eps").as("cy"))
    val offsets = explode(array(
      (for (dx <- -1 to 1; dy <- -1 to 1)
        yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*))
    val left = reps.withColumn("o", offsets)
      .select(col("id").as("ida"), col("x"), col("y"),
        (expr(s"x DIV $eps") + col("o.dx")).as("cx"),
        (expr(s"y DIV $eps") + col("o.dy")).as("cy"))
    left.join(right, Seq("cx", "cy"))
      .where(col("ida") =!= col("idb") &&
        (col("x") - col("xb")) * (col("x") - col("xb")) +
          (col("y") - col("yb")) * (col("y") - col("yb")) <= eps2)
      .select(col("ida"), col("idb"), col("wb"))
  }

  /** Cluster `pts` — columns (id: BIGINT, x: BIGINT, y: BIGINT), ids unique,
    * coordinates in [0, 2^30) (validated) — returning (id, label): label is
    * the minimum core id of the point's cluster, or -1 for noise. */
  def label(pts: DataFrame, eps: Long, minSamples: Int,
            localFinishEdges: Long = 100000L): DataFrame = {
    require(eps > 0 && eps <= CoordBound,
      s"dbscan: eps must be in (0, 2^30], got $eps (eps^2 must fit a Long)")
    require(minSamples >= 1, "dbscan: min_samples must be >= 1")
    // PRE-COLLAPSE: one weighted rep per distinct coordinate
    val reps = collapse(pts).cache()
    // bounds validation — one agg over the (already coordinate-sized)
    // collapsed table; the squared-distance predicate silently overflows
    // Long outside these bounds, so refuse loudly instead
    val b = reps.agg(min(col("x")), min(col("y")), max(col("x")), max(col("y"))).first()
    if (b.isNullAt(0)) { // empty input: every downstream frame is empty too
      reps.unpersist()
      return pts.select(col("id"), lit(-1L).as("label"))
    }
    if (!(b.getLong(0) >= 0 && b.getLong(1) >= 0 &&
        b.getLong(2) < CoordBound && b.getLong(3) < CoordBound)) {
      reps.unpersist() // don't leak the cached frame on the refusal path
      throw new IllegalArgumentException(
        s"dbscan: coordinates must lie in [0, 2^30) — got x in [${b.getLong(0)}, " +
          s"${b.getLong(2)}], y in [${b.getLong(1)}, ${b.getLong(3)}] " +
          "(squared distances overflow Long beyond that)")
    }
    val nbrs = repCandidates(reps, eps).cache()
    // core ⇔ |ε-neighborhood incl. self| >= min_samples (sklearn's contract):
    // own multiplicity + weighted neighbor-coordinate sum. The LEFT join
    // keeps isolated coordinates (no candidate rows) in play — a stack of
    // w >= min_samples co-located points is core with zero neighbors, which
    // also covers the min_samples=1 singleton case uniformly.
    val nbrW = nbrs.groupBy(col("ida").as("id")).agg(sum(col("wb")).as("nw"))
    val core = reps.select(col("id"), col("w"))
      .join(nbrW, Seq("id"), "left")
      .where(col("w") + coalesce(col("nw"), lit(0L)) >= minSamples)
      .select(col("id"))
      .cache()
    val coreEdges = nbrs
      .join(core.select(col("id").as("ida")), "ida")
      .join(core.select(col("id").as("idb")), "idb")
      .select(col("ida").as("src"), col("idb").as("dst"))
      .cache()
    // labels start over ALL cores so a neighbor-less core stays its own
    // singleton cluster. CLUSTERS = connected components over core-core
    // edges via the shared hook–compress–contract engine (the candidate
    // generator emits both directions of every pair, hence symmetric=true;
    // `localFinishEdges` is parameterized so specs can pin the distributed
    // loop end-to-end with a zero threshold).
    val coreLabels = ConnectedComponents.run(
      core.select(col("id").as("node")), coreEdges,
      localFinishEdges, symmetric = true)
    // border: non-core reps adopt the MIN label among their core-rep
    // neighbors (all points at a core coordinate share one label, so the
    // rep-level min IS the point-level min)
    val border = nbrs
      .join(core.select(col("id").as("ida")), Seq("ida"), "left_anti")
      .join(coreLabels.select(col("node").as("idb"), col("label")), "idb")
      .groupBy(col("ida").as("rid")).agg(min(col("label")).as("border_label"))
    // assemble core / border / noise at REP level with LEFT JOINS + coalesce
    // rather than unions: both would-be union legs contain the same
    // checkpointed plan (identical attribute ids), which trips Catalyst's
    // union constraint rewrite ("key not found: node#N") — joins don't share
    // that path
    val repOut = reps.select(col("id").as("rid"), col("x"), col("y"))
      .join(coreLabels.select(col("node").as("rid"), col("label").as("core_label")),
        Seq("rid"), "left")
      .join(border, Seq("rid"), "left")
      .select(col("x"), col("y"),
        coalesce(col("core_label"), col("border_label"), lit(-1L)).as("label"))
    // FAN-OUT: every original point inherits its coordinate's label through
    // ONE equi-join — the O(k) half of the coincident-point contract. LEFT
    // join from pts so every input id appears in the output: NULL-coordinate
    // rows have no ε-neighborhood (NULL grid keys never equi-match) and
    // coalesce to noise (-1) instead of silently vanishing on an inner join.
    val out = pts.join(repOut, Seq("x", "y"), "left")
      .select(col("id"), coalesce(col("label"), lit(-1L)).as("label"))
      .localCheckpoint(true)
    reps.unpersist()
    nbrs.unpersist()
    core.unpersist()
    coreEdges.unpersist()
    out
  }
}
