package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Pure-Scala replay of the integer PageRank recurrence (same floor
    * division at every step) — the in-test oracle for arbitrary small
    * graphs.
    */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int, dampingPct: Long = 85L
  ): Map[Long, Long] = {
    val s = Graph.Scale
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size.toLong
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = (100L - dampingPct) * s / 100L
    var rank = nodes.map(_ -> s / n).toMap
    for (_ <- 0 until iters) {
      val dang = nodes.filterNot(outdeg.contains).map(rank).sum
      val in = edges
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map { case (src, _) => rank(src) / outdeg(src) }.sum
        }
      rank = nodes.map { v =>
        v -> (base / n + dampingPct * (in.getOrElse(v, 0L) + dang / n) / 100L)
      }.toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph
      .pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("3-cycle: perfect symmetry, every node holds Scale div 3 every round") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L)), iters = 4)
    assert(got.values.toSet.size == 1)
    assert(got == refPageRank(Seq((1L, 2L), (2L, 3L), (3L, 1L)), 4))
  }

  test("star with dangling hub: matches the integer reference, hub dominates") {
    // 1..4 all point at 5; 5 has no out-edges (dangling redistribution on)
    val edges = (1L to 4L).map(i => (i, 5L))
    val got = run(edges, iters = 3)
    assert(got == refPageRank(edges, 3))
    assert(got(5L) > got(1L), "hub must out-rank leaves")
    assert(got(1L) == got(4L), "leaves are symmetric")
  }

  test("parallel edges act as weights; mass stays conserved within floor loss") {
    // 1 -> 2 twice, 1 -> 3 once: node 2 gets 2/3 of node 1's share
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val got = run(edges, iters = 5)
    assert(got == refPageRank(edges, 5))
    assert(got(2L) > got(3L))
    // floor division only ever loses mass; bounded by ~1 unit per div site
    val total = got.values.sum
    assert(total <= Graph.Scale && total > Graph.Scale - 1000L)
  }
}
