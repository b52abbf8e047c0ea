package graft.operators

import graft.SparkSpec

/** Pins for the distributed DBSCAN operator (Dbscan.scala) against
  * hand-derived labelings of the sklearn contract — including the exact
  * example the sklearn DBSCAN docs publish, and the reference notebook's
  * min_samples=1 degenerate setting (`image_masking.ipynb` cells 20-25). */
class DbscanSpec extends SparkSpec {
  import spark.implicits._

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minSamples: Int,
                  localFinishEdges: Long = 100000L): Map[Long, Long] =
    Dbscan.label(pts.toDF("id", "x", "y"), eps, minSamples, localFinishEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("sklearn docs example: eps=3, min_samples=2 -> [0,0,0,1,1,-1]") {
    // the published sklearn example: X = [[1,2],[2,2],[2,3],[8,7],[8,8],[25,80]]
    // DBSCAN(eps=3, min_samples=2).labels_ == [0, 0, 0, 1, 1, -1].
    // Our labels are min-core-id representatives, so cluster 0 = {1,2,3}
    // labeled 1, cluster 1 = {4,5} labeled 4, and id 6 is noise.
    val pts = Seq(
      (1L, 1L, 2L), (2L, 2L, 2L), (3L, 2L, 3L),
      (4L, 8L, 7L), (5L, 8L, 8L), (6L, 25L, 80L))
    val labels = run(pts, eps = 3L, minSamples = 2)
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> -1L))
  }

  test("core / border / noise split at min_samples=4") {
    // square of 4 mutually-ε-close points (each has 3 neighbors + itself = 4
    // -> core); (3,1) reaches only (1,1) -> 1 neighbor, not core, but its
    // neighbor IS core -> border, adopts the cluster label; (10,10) -> noise
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (5L, 3L, 1L), (6L, 10L, 10L))
    val labels = run(pts, eps = 2L, minSamples = 4)
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> -1L))
  }

  test("reference setting min_samples=1: every point is core, isolated points are singleton clusters") {
    // the notebook's DBSCAN(eps=2.5, min_samples=1): no noise can exist —
    // an isolated point is its own cluster (sklearn contract). Integer
    // eps=2 here; chain 1-2-3 merges transitively (1<->2 and 2<->3 within
    // eps, 1<->3 not), id 9 is isolated but still labeled, never -1.
    val pts = Seq((1L, 0L, 0L), (2L, 2L, 0L), (3L, 4L, 0L), (9L, 50L, 50L))
    val labels = run(pts, eps = 2L, minSamples = 1)
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    assert(!labels.values.exists(_ == -1L), "min_samples=1 admits no noise")
  }

  test("long chain converges via DISTRIBUTED contraction (local finish disabled)") {
    // a 400-hop path with localFinishEdges=0, so every round is the full
    // distributed hook-compress-contract: plain min-propagation needs ~400
    // rounds and hook-only contraction ~400 too (the chain just shifts);
    // pointer-doubled compression must close it within the 30-round cap
    val pts = (1L to 401L).map(i => (i, i * 2L, 0L))
    val labels = run(pts, eps = 2L, minSamples = 2, localFinishEdges = 0L)
    assert(labels.values.toSet === Set(1L), "one component labeled by its min id")
  }

  test("distributed rounds and local finish agree on the same graph") {
    val pts = (1L to 101L).map(i => (i, i * 2L, 0L)) ++
      Seq((501L, 2000L, 0L), (502L, 2001L, 0L), (503L, 2002L, 0L))
    val viaDistributed = run(pts, eps = 2L, minSamples = 2, localFinishEdges = 0L)
    val viaLocal = run(pts, eps = 2L, minSamples = 2)
    assert(viaDistributed === viaLocal)
    assert(viaLocal.values.toSet === Set(1L, 501L))
  }

  test("two dense blobs either side of a wide gap stay separate clusters") {
    val blobA = (1L to 5L).map(i => (i, i, i))            // pairwise ≤ eps via chain
    val blobB = (11L to 15L).map(i => (i, 1000L + i, i))
    val labels = run(blobA ++ blobB, eps = 3L, minSamples = 3)
    val reps = labels.values.toSet
    assert(reps.size === 2 && labels(1L) != labels(11L),
      s"expected two clusters, got $labels")
  }

  test("stacked coordinates pre-collapse: k duplicates cost O(k), not O(k^2) candidates") {
    // 1000 points on ONE coordinate + two stragglers: candidate generation
    // runs over the 3 collapsed reps, so the pair count is independent of
    // the stack multiplicity — exactly 2 ordered pairs ((5,5)<->(6,5)),
    // where the un-collapsed form would have produced ~10^6
    val stack = (1L to 1000L).map(i => (i, 5L, 5L))
    val pts = (stack ++ Seq((2001L, 6L, 5L), (2002L, 100L, 100L)))
      .toDF("id", "x", "y")
    val reps = Dbscan.collapse(pts)
    val repRows = reps.collect().map(r =>
      (r.getLong(1), r.getLong(2)) -> (r.getLong(0), r.getLong(3))).toMap
    assert(repRows.size === 3)
    assert(repRows((5L, 5L)) === (1L, 1000L), "rep id = min id, weight = multiplicity")
    assert(Dbscan.repCandidates(reps, eps = 2L).count() === 2L,
      "candidate pairs scale with DISTINCT coordinates only")
    // end-to-end labels stay exact: the whole stack + its ε-neighbor form
    // one cluster labeled by the stack's min id; the straggler is noise
    // at min_samples=2 (neighborhood of 1 < 2)
    val labels = Dbscan.label(pts, eps = 2L, minSamples = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 1000L).forall(labels(_) == 1L))
    assert(labels(2001L) === 1L)
    assert(labels(2002L) === -1L)
  }

  test("multiplicity feeds the min_samples count: weighted core, border adoption") {
    // stack of 5 at (0,0); singles at (2,0) and (0,2); eps=2, min_samples=7.
    // Stack neighborhood = 5 (self-stack) + 1 + 1 = 7 -> core. Each single's
    // neighborhood = 1 + 5 = 6 (the two singles are 8 > eps^2 apart) -> not
    // core, but ε-adjacent to a core point -> border, adopting the stack's
    // cluster label (its min id, 1).
    val pts = (1L to 5L).map(i => (i, 0L, 0L)) ++ Seq((6L, 2L, 0L), (7L, 0L, 2L))
    val labels = run(pts, eps = 2L, minSamples = 7)
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 1L, 7L -> 1L))
    // at min_samples=8 nothing reaches the threshold: all noise
    val labels8 = run(pts, eps = 2L, minSamples = 8)
    assert(labels8.values.toSet === Set(-1L))
  }

  test("NULL-coordinate rows come back as noise, never silently vanish") {
    // NULL grid keys never equi-match, so a NULL-coordinate point has no
    // ε-neighborhood; the fan-out must LEFT-join from the input and label it
    // -1 rather than drop the id from the output (prior inner-join bug)
    val pts = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(0L), java.lang.Long.valueOf(0L)),
      (java.lang.Long.valueOf(2L), java.lang.Long.valueOf(1L), java.lang.Long.valueOf(0L)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(0L)),
      (java.lang.Long.valueOf(4L), java.lang.Long.valueOf(5L), null.asInstanceOf[java.lang.Long]))
      .toDF("id", "x", "y")
    val labels = Dbscan.label(pts, eps = 2L, minSamples = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet === Set(1L, 2L, 3L, 4L), "every input id is in the output")
    assert(labels(1L) === 1L && labels(2L) === 1L)
    assert(labels(3L) === -1L && labels(4L) === -1L, "NULL coordinates are noise")
  }

  test("coordinate bounds are validated, not silently overflowed") {
    val bad = Seq((1L, -3L, 0L), (2L, 1L, 1L))
    intercept[IllegalArgumentException] {
      Dbscan.label(bad.toDF("id", "x", "y"), eps = 2L, minSamples = 1).collect()
    }
    val huge = Seq((1L, (1L << 31) + 5L, 0L), (2L, 1L, 1L))
    intercept[IllegalArgumentException] {
      Dbscan.label(huge.toDF("id", "x", "y"), eps = 2L, minSamples = 1).collect()
    }
    intercept[IllegalArgumentException] {
      Dbscan.label(bad.toDF("id", "x", "y"), eps = (1L << 31), minSamples = 1)
    }
  }
}
