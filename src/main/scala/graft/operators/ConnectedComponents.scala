package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by HOOK–COMPRESS–CONTRACT (the Shiloach–Vishkin
  * shape, published algorithm re-derived) with a bounded local finish — the
  * shared CC engine behind DBSCAN cluster formation ([[Dbscan]]) and
  * near-dup clustering (q81). Extracted because round 12 measured the
  * alternatives failing at scale and every CC consumer should inherit that
  * result, not re-learn it:
  *
  *   - plain min-label PROPAGATION (label := min(label, neighbor labels)) is
  *     O(diameter) rounds and stalls on converged plateaus — a front
  *     advances one hop per round; 30 rounds without convergence on the
  *     sf0.1 ε-graph;
  *   - HOOK-only contraction is O(n) rounds on a path (the chain shifts by
  *     one per round).
  *
  * Each outer round: HOOK every supernode to the min of itself and its
  * neighbors (a parent forest), COMPRESS by pointer-doubling the forest to
  * its roots (O(log depth) node-sized self-joins), then CONTRACT the deduped
  * edge list through the root mapping so the supernode graph shrinks
  * geometrically. Once the remainder is under `localFinishEdges`, finish
  * with driver-side union-find (union-by-min, path compression) applied back
  * as ONE broadcast-joined mapping — the standard local fallback every
  * production CC implementation ends with, replacing a long tail of
  * distributed rounds over a few-hundred-row frame. A component's
  * global-minimum node always maps to itself, so the final representative IS
  * the component min — deterministic.
  *
  * Per-round frames are severed through an RDD round trip + localCheckpoint
  * so lineage stays flat (plans nest exponentially across iterations
  * otherwise; the RDD round trip also drops plan constraints — self-derived
  * join legs sharing a checkpoint's attribute ids crash Catalyst's
  * constraint rewrite, "key not found: node#N"). Driver-side state is one
  * scalar per (inner or outer) round.
  */
object ConnectedComponents {

  /** Label every node in `nodes` (column `node`: BIGINT — must cover all
    * edge endpoints; extra rows become singleton components) with the
    * MINIMUM node id of its component in `edges` (columns `src`, `dst`:
    * BIGINT). Returns a checkpointed (node, label) frame.
    *
    * `symmetric = true` asserts both directions of every edge are already
    * present (the DBSCAN candidate generator's shape) and skips the
    * symmetrization union. `localFinishEdges` bounds the driver-side finish;
    * 0 pins the distributed loop end-to-end (spec use). */
  def run(nodes: DataFrame, edges: DataFrame, localFinishEdges: Long = 100000L,
          symmetric: Boolean = false): DataFrame = {
    val spark = nodes.sparkSession
    def sever(df: DataFrame): DataFrame =
      spark.createDataFrame(df.rdd, df.schema).localCheckpoint(true)
    // one pointer-doubling step, m := m∘m (left join: roots miss and keep)
    def double(m: DataFrame): DataFrame = {
      val m2 = m.select(col("mnode").as("jn"), col("mrep").as("jr"))
      m.join(m2, m("mrep") === m2("jn"), "left")
        .select(col("mnode"), coalesce(col("jr"), col("mrep")).as("mrep"))
    }

    val sym =
      if (symmetric) edges.select(col("src"), col("dst"))
      else edges.select(col("src"), col("dst"))
        .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    var labels = sever(nodes.select(col("node"), col("node").as("label")))
    var e = sever(sym.distinct())
    var edgeCount = e.count()
    var iter = 0
    while (iter < 30 && edgeCount > localFinishEdges) {
      // HOOK: m(v) = min(v, min neighbor) — a parent forest (m(v) <= v,
      // roots point to themselves). COMPRESS: pointer-double until every
      // pointer is a root. Every mrep is itself a domain node (it is some
      // node's min neighbor, and e is symmetric), so the left join only
      // misses at roots. The hook flows lazily into the first doubling and
      // each materialization applies TWO doublings — half the job count,
      // the dominant cost of the loop at test scale.
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
      // compose into the per-node labels (left join: supernodes that have
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
        spark.createDataFrame(mapping).toDF("mnode", "mrep"))
      labels = sever(labels
        .join(mapDf, labels("label") === mapDf("mnode"), "left")
        .select(labels("node"), coalesce(col("mrep"), labels("label")).as("label")))
    }
    labels
  }
}
