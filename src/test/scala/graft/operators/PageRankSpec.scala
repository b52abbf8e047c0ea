package graft.operators

import graft.SparkSpec

/** Property pins for the convergence-terminated, dangling-aware PageRank
  * (PageRank.converge) — the production sibling of q125's fixed-iteration
  * oracle form. Invariants, not golden numbers: exact mass conservation on
  * sink-ful graphs, early exit on fast-mixing graphs, and the analytically
  * known fixpoints where one exists. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(Long, Long)], tol: Double = 1e-9,
                      maxIter: Int = 100): (Map[Long, Double], Int) = {
    val (df, iters) = PageRank.converge(
      edges.toDF("src", "dst"), tol = tol, maxIter = maxIter)
    (df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap, iters)
  }

  test("cycle: uniform fixpoint, immediate convergence") {
    // on a k-cycle the uniform vector is the exact fixpoint — the first
    // iteration reproduces it, so the L1 residual is ~0 and the loop exits
    // after one round, far below maxIter (the convergence pin)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    val (ranks, iters) = ranksOf(cycle)
    assert(iters <= 2, s"uniform fixpoint must exit immediately, ran $iters")
    ranks.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("sink graph: mass conserved EXACTLY, sink outranks source") {
    // A -> B with B a sink: without the dangling term B's mass leaks every
    // round and Σpr decays toward (1-d); with it Σpr == 1 always
    val (ranks, _) = ranksOf(Seq((1L, 2L)))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9,
      s"dangling mass must be redistributed, got sum ${ranks.values.sum}")
    assert(ranks(2L) > ranks(1L), "the sink receives A's rank plus its dangling share")
    // analytic fixpoint of the 2-node chain with redistribution, d = 0.85:
    //   a = 0.075 + 0.425 b ; b = 0.075 + 0.85 a + 0.425 b  (b's mass
    //   redistributes half to each node) ⇒ b = 0.13875 / 0.21375
    assert(math.abs(ranks(1L) - 0.3508771930) < 1e-6, s"a = ${ranks(1L)}")
    assert(math.abs(ranks(2L) - 0.6491228070) < 1e-6, s"b = ${ranks(2L)}")
  }

  test("star graph: hub outranks leaves; leaves symmetric") {
    // leaves all point at the hub; hub is a sink. Leaves are symmetric by
    // construction, so their ranks must be EQUAL (determinism pin) and the
    // hub strictly dominates.
    val star = (2L to 6L).map(l => (l, 1L))
    val (ranks, _) = ranksOf(star)
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    val leaves = (2L to 6L).map(ranks)
    assert(leaves.forall(v => math.abs(v - leaves.head) < 1e-12))
    assert(ranks(1L) > leaves.head * 2)
  }

  test("residual termination: loose tol stops earlier than tight tol") {
    // a slow-mixing path graph: the iteration count must be monotone in tol
    val path = (1L until 30L).map(i => (i, i + 1L))
    val (_, fast) = ranksOf(path, tol = 1e-2, maxIter = 100)
    val (_, slow) = ranksOf(path, tol = 1e-10, maxIter = 100)
    assert(fast < slow, s"tol=1e-2 ran $fast rounds, tol=1e-10 ran $slow")
    assert(slow < 100, "must converge before the backstop on 30 nodes")
  }

  test("agrees with q125's shape on a sink-free graph: degree-weighted flow") {
    // both formulations coincide when no dangling mass exists; spot-check
    // against an independently-derived fixpoint for a 3-node graph:
    // 1->2, 1->3, 2->3, 3->1 (no sinks)
    val (ranks, _) = ranksOf(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)))
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    // fixpoint: r1 = 0.15/3 + .85 r3; r2 = 0.05 + .85 (r1/2);
    //           r3 = 0.05 + .85 (r1/2 + r2)
    val r1 = ranks(1L); val r2 = ranks(2L); val r3 = ranks(3L)
    assert(math.abs(r1 - (0.05 + 0.85 * r3)) < 1e-8)
    assert(math.abs(r2 - (0.05 + 0.85 * r1 / 2)) < 1e-8)
    assert(math.abs(r3 - (0.05 + 0.85 * (r1 / 2 + r2))) < 1e-8)
  }

  test("empty graph: empty ranks, zero iterations") {
    val (df, iters) = PageRank.converge(
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(df.collect().isEmpty && iters === 0)
  }
}
