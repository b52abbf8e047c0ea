package graft.operators

import graft.SparkSpec

/** Pins for the shared CC engine (hook–compress–contract + bounded local
  * finish) that both DBSCAN cluster formation and q81 near-dup clustering
  * route through. The path-graph case with `localFinishEdges = 0` pins the
  * DISTRIBUTED loop end-to-end on exactly the shape that defeats the
  * alternatives (hook-only is O(n) rounds on a path; propagation stalls on
  * plateaus); the near-clique case pins the q81 LSH-candidate shape. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)],
                  localFinish: Long = 100000L): Map[Long, Long] =
    ConnectedComponents.run(
      nodes.toDF("node"), edges.toDF("src", "dst"), localFinish)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph, distributed loop pinned (localFinishEdges = 0): one component, min label") {
    val n = 64L
    val labels = run(0L until n, (0L until n - 1).map(i => i -> (i + 1)), localFinish = 0L)
    assert(labels.size === n)
    assert(labels.values.toSet === Set(0L), "a path must contract to its minimum node")
  }

  test("two components + isolated nodes: labels are each component's minimum") {
    val labels = run(
      nodes = Seq(1L, 2L, 3L, 10L, 11L, 99L, 100L),
      edges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      99L -> 99L, 100L -> 100L))
  }

  test("near-clique buckets (the q81 LSH-candidate shape) resolve via the local finish") {
    // three dense buckets sharing one bridge node, edges emitted once (d1<d2)
    val buckets = Seq(Seq(5L, 6L, 7L, 8L), Seq(20L, 21L, 22L), Seq(30L, 31L))
    val cliqueEdges = buckets.flatMap(b =>
      for (i <- b.indices; j <- i + 1 until b.size) yield b(i) -> b(j))
    val edges = cliqueEdges :+ (8L -> 20L) // bridge merges the first two buckets
    val nodes = buckets.flatten
    val labels = run(nodes, edges)
    assert(Seq(5L, 6L, 7L, 8L, 20L, 21L, 22L).forall(labels(_) == 5L),
      "bridged buckets must merge to the global min")
    assert(Seq(30L, 31L).forall(labels(_) == 30L))
  }

  test("symmetric=true (the DBSCAN candidate shape) equals the symmetrized default") {
    val dir = Seq(3L -> 1L, 1L -> 2L, 7L -> 9L)
    val sym = dir ++ dir.map(_.swap)
    val nodes = Seq(1L, 2L, 3L, 7L, 9L)
    val a = ConnectedComponents.run(nodes.toDF("node"), sym.toDF("src", "dst"),
      symmetric = true).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = ConnectedComponents.run(nodes.toDF("node"), dir.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
    assert(a === Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (9L, 7L)))
  }
}
