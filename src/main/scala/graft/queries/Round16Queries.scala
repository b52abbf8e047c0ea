package graft.queries

import graft.{QDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 surface: native distributed DBSCAN — the LAST reference operator
  * (reference `image_masking.ipynb` cells 20-25: sklearn DBSCAN over pixel
  * coordinates, eps=2.5, min_samples=1, driver-local) re-expressed as the
  * scale shape every distributed-DBSCAN paper lands on (grid-blocked
  * ε-neighborhood + connected components over core edges — the MR-DBSCAN /
  * RDD-DBSCAN recipe, published algorithms re-derived, no code). The
  * operator itself lives in graft.operators.Dbscan (fixture-pinned against
  * hand-derived sklearn-contract labelings in DbscanSpec); the stages:
  *
  *   1. CELL BLOCKING (q159's recipe): points hash to cells of side eps; any
  *      pair within eps shares a cell or an adjacent one, so the left side
  *      fans out to its 3×3 neighborhood and candidates come from a plain
  *      EQUI-join on cell id — exact INTEGER distance (dx²+dy² ≤ eps²,
  *      engine-portable) verified inside the block only, never n².
  *   2. CORE points: ≥ min_samples neighbors counting the point itself
  *      (sklearn's contract) — one hash agg over the neighbor pairs.
  *   3. CLUSTERS: connected components over CORE-CORE edges by min-label
  *      propagation WITH POINTER JUMPING (each round also compresses one
  *      indirection, label(v) := label(label(v)), so rounds are
  *      O(log diameter) — the ε-graph forms long thin components where
  *      q81's plain O(diameter) propagation does not converge in bounded
  *      rounds). One keyed join + hash agg + one self-join per round;
  *      convergence via the strictly-decreasing sum(label) scalar. A core
  *      with no core neighbor is its own singleton cluster.
  *   4. BORDER points (non-core with a core neighbor) adopt the MINIMUM
  *      cluster label among their core neighbors — deterministic, unlike
  *      sklearn's scan-order-dependent first-come assignment (a documented,
  *      equally valid DBSCAN labeling; min_samples=1 — the reference's
  *      setting — has no border points, so the two agree exactly there).
  *   5. NOISE (no core neighbor) labels -1.
  *
  * The ORACLE replays full DBSCAN relationally in DuckDB: brute-force
  * ε-pairs (quadratic — viable at oracle scale only), degree → core set,
  * WITH RECURSIVE transitive closure over core edges, min-label clusters,
  * border adoption, noise. The hash gates every stage end-to-end.
  *
  * All queries follow the SURVEY.md §2b determinism conventions (trailing
  * total-order sort, integer outputs, no nested output columns). */
object Round16Queries {

  // --------------------------------------------------------------------------
  // q265: distributed DBSCAN over integer points derived from event ids (the
  // same arithmetic-derived-coordinates trick as q159, so the oracle computes
  // identical points). eps=65, min_samples=4 exercises all three point
  // classes (at sf0.01: 91 clusters, 462 border points, 538 noise); the
  // reference's eps=2.5, min_samples=1 setting
  // degenerates to connected components over the ε-graph, which is exactly
  // stages 1+3 of this pipeline. Scale shape: candidate volume scales with
  // per-cell density (never n²), components converge in O(log diameter)
  // keyed joins via pointer jumping, and the only driver-side state is one
  // convergence scalar per round.
  // --------------------------------------------------------------------------
  private def q265(s: SparkSession, d: String): DataFrame = {
    val pts = T.events(s, d)
      .where(col("event_id") % 7 === 0)
      .select(col("event_id").as("id"),
        expr("(event_id * 48271) % 2400").as("x"),
        expr("(event_id * 69621) % 2400").as("y"))
    graft.operators.Dbscan.label(pts, eps = 65L, minSamples = 4)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_points"), sum(col("id")).cast("long").as("id_sum"))
      .orderBy(col("label"))
  }

  private val q265Sql =
    """WITH RECURSIVE pts AS (
         SELECT event_id AS id,
                (event_id * 48271) % 2400 AS x,
                (event_id * 69621) % 2400 AS y
         FROM events WHERE event_id % 7 = 0),
       nbrs AS (
         SELECT a.id AS ida, b.id AS idb
         FROM pts a JOIN pts b
           ON a.id <> b.id
          AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4225),
       core AS (
         SELECT ida AS id FROM nbrs GROUP BY ida HAVING COUNT(*) + 1 >= 4),
       core_edges AS (
         SELECT n.ida AS s, n.idb AS t FROM nbrs n
         JOIN core c1 ON n.ida = c1.id
         JOIN core c2 ON n.idb = c2.id),
       reach(node, r) AS (
         SELECT s, t FROM core_edges
         UNION
         SELECT reach.node, e.t FROM reach JOIN core_edges e ON reach.r = e.s),
       clab AS (
         SELECT c.id, LEAST(c.id, COALESCE(MIN(reach.r), c.id)) AS label
         FROM core c LEFT JOIN reach ON reach.node = c.id
         GROUP BY c.id),
       border AS (
         SELECT n.ida AS id, MIN(cl.label) AS label
         FROM nbrs n
         JOIN clab cl ON n.idb = cl.id
         LEFT JOIN core c ON n.ida = c.id
         WHERE c.id IS NULL
         GROUP BY n.ida),
       labeled AS (
         SELECT id, label FROM clab UNION ALL SELECT id, label FROM border),
       all_pts AS (
         SELECT p.id, COALESCE(l.label, -1) AS label
         FROM pts p LEFT JOIN labeled l ON p.id = l.id)
       SELECT label, COUNT(*) AS n_points, CAST(SUM(id) AS BIGINT) AS id_sum
       FROM all_pts GROUP BY label ORDER BY label"""

  val defs: Seq[QDef] = Seq(
    QDef("q265_dbscan", q265, Some(q265Sql)))
}
