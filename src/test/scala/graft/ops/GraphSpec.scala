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

  test("pageRank driver and distributed paths agree rank-for-rank " +
    "(driverMaxEdges=0 forces the distributed rounds)") {
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L),
      (4L, 5L), (5L, 4L), (2L, 6L)) // includes a dangling node (6)
    val drv = run(edges, iters = 4) // tiny graph -> driver path
    val dist = Graph
      .pageRank(edges.toDF("src", "dst"), "src", "dst", 4,
        driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drv === dist)
    assert(drv === refPageRank(edges, 4))
  }

  test("bfsLevels driver and distributed paths agree hop-for-hop " +
    "(driverMaxEdges=0 forces the frontier rounds)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (5L, 9L), (7L, 1L), (2L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L, 42L).toDF("node") // 42 is absent from the graph
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    val drv = tbl(Graph.bfsLevels(edges, "src", "dst", seeds, "node", 4))
    val dist = tbl(Graph.bfsLevels(edges, "src", "dst", seeds, "node", 4,
      driverMaxEdges = 0L))
    assert(drv === dist)
    assert(drv.contains((42L, 0)), "unconnected seed keeps hop 0")
  }

  /** Brute-force triangle/wedge reference over an undirected edge list. */
  private def refTriangles(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val es = e.toSet
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val tris = nodes.sorted.combinations(3).count {
      case Seq(a, b, c) => es((a, b)) && es((b, c)) && es((a, c))
    }
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity).map(_._2.size.toLong)
    (nodes.size.toLong, e.size.toLong, tris.toLong,
      deg.map(d => d * (d - 1) / 2).sum)
  }

  private def runTri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) = {
    val r = Graph.triangleStats(edges.toDF("a", "b"), "a", "b").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("triangleStats: K4 has 4 triangles and clustering exactly 1") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(runTri(k4) == ((4L, 6L, 4L, 12L, 1000000L)))
  }

  test("triangleStats: orientation counts each triangle once on a skewed graph") {
    // hub 0 connected to 1..20, plus ring edges closing some triangles,
    // duplicate + reversed + self-loop noise the canonicalizer must drop
    val hub = (1L to 20L).map(i => (0L, i))
    val ring = (1L until 20L).map(i => (i, i + 1L))
    val noise = Seq((5L, 0L), (0L, 5L), (7L, 7L), (12L, 11L))
    val edges = hub ++ ring ++ noise
    val (n, m, t, w) = refTriangles(edges)
    val got = runTri(edges)
    assert((got._1, got._2, got._3, got._4) == ((n, m, t, w)))
    assert(got._5 == 3L * t * 1000000L / w)
  }

  test("triangleStats: deterministic pseudo-random graph matches brute force") {
    // LCG edge list: ~120 edges over 30 nodes (dense enough for triangles)
    // take HIGH bits: a power-of-2-modulus LCG's low bits alternate parity,
    // which would make every (a, b) draw bipartite (zero triangles)
    var s = 12345L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val edges = (1 to 120).map { _ => (next() % 30, next() % 30) }
    val (n, m, t, w) = refTriangles(edges)
    assert(t > 0, "fixture must actually contain triangles")
    val got = runTri(edges)
    assert((got._1, got._2, got._3, got._4) == ((n, m, t, w)))
  }

  test("triangleStats: chunked hub path (saltChunk forced low) is exact — " +
    "diagonal suffix pairs + off-diagonal crosses cover every wedge once") {
    // hub 0 with oriented out-degree far above the chunk, ring closures,
    // plus a second mid-size hub straddling one chunk boundary exactly
    val hub = (1L to 20L).map(i => (0L, i))
    val ring = (1L until 20L).map(i => (i, i + 1L)) :+ (20L, 1L)
    val hub2 = (30L to 37L).map(i => (25L, i)) ++ Seq((30L, 31L), (36L, 37L))
    val edges = hub ++ ring ++ hub2
    val (n, m, t, w) = refTriangles(edges)
    assert(t > 0)
    for (chunk <- Seq(2, 3, 4, 7, 64)) {
      val r = Graph.triangleStats(edges.toDF("a", "b"), "a", "b", chunk,
        driverMaxEdges = 0L).collect().head
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((n, m, t, w)), s"saltChunk=$chunk")
    }
  }

  test("triangleStats: salted and unsalted paths agree on the random graph") {
    var s = 424243L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val edges = (1 to 160).map { _ => (next() % 24, next() % 24) }
    val (n, m, t, w) = refTriangles(edges)
    assert(t > 0, "fixture must actually contain triangles")
    val got = runTri(edges) // defaults: tiny graph -> driver fold
    val salted = Graph.triangleStats(edges.toDF("a", "b"), "a", "b", 3,
      driverMaxEdges = 0L).collect().head
    assert((got._1, got._2, got._3, got._4) == ((n, m, t, w)))
    assert((salted.getLong(0), salted.getLong(1), salted.getLong(2),
      salted.getLong(3)) == ((n, m, t, w)))
  }

  test("triangleStats: forced shuffled-hash path with Bloom wedge pruning " +
    "is exact (broadcastEdgeLimit=0 engages the scale plan on a small graph)") {
    var s = 777777L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val edges = (1 to 140).map { _ => (next() % 26, next() % 26) }
    val (n, m, t, w) = refTriangles(edges)
    assert(t > 0, "fixture must actually contain triangles")
    val r = Graph.triangleStats(edges.toDF("a", "b"), "a", "b",
      saltChunk = 1024, broadcastEdgeLimit = 0L, driverMaxEdges = 0L)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n, m, t, w)))
  }

  test("triangleStats driver and distributed paths agree column-for-column " +
    "(driverMaxEdges=0 forces the wedge plan)") {
    // random graph + hub + duplicate/reversed/self-loop noise: exercises
    // the canonical dedup, the (deg, id) orientation tie-breaks, and the
    // clustering_ppm div on both paths
    var s = 20260819L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val rand = (1 to 150).map { _ => (next() % 28, next() % 28) }
    val hub = (1L to 15L).map(i => (0L, i))
    val noise = Seq((5L, 0L), (0L, 5L), (7L, 7L), (3L, 2L))
    val edges = rand ++ hub ++ noise
    val (n, m, t, w) = refTriangles(edges)
    assert(t > 0, "fixture must actually contain triangles")
    def row(driverMax: Long) =
      Graph.triangleStats(edges.toDF("a", "b"), "a", "b",
        driverMaxEdges = driverMax).collect().head.toSeq
    val drv = row(2000000L) // driver fold
    val dist = row(0L)      // forced wedge plan
    assert(drv === dist)
    assert(drv.take(4) === Seq(n, m, t, w))
  }

  test("bfsLevels: hop = exact shortest distance, unreached nodes absent, " +
    "directed edges not followed backwards") {
    import spark.implicits._
    // path 1->2->3->4->5 plus shortcut 1->4; node 9 isolated target of 5->9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (5L, 9L), (7L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val out = graft.ops.Graph.bfsLevels(edges, "src", "dst", seeds, "node", 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // shortest hops: 1:0, 2:1, 4:1 (shortcut), 3:2, 5:2, 9:3; 7 unreachable
    assert(out == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2, 5L -> 2, 9L -> 3),
      s"got $out")
  }
}
