package graft.ops

import graft.SparkSpec

class DensitySpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force DBSCAN with the same pinned conventions (cluster = min
    * core id of the component, border -> min neighbor cluster).
    */
  private def ref(
      pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int
  ): Map[Long, (String, Option[Long])] = {
    def near(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val nbrs = pts.map(p => p._1 -> pts.filter(q => near(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map[Long, Long](core.map(c => c -> c).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    for (c <- core; n <- nbrs(c) if core(n)) {
      val (ra, rb) = (find(c), find(n)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val label = core.map(c => c -> core.filter(o => find(o) == find(c)).min).toMap
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> (("core", Some(label(id))))
      else {
        val coreN = nbrs(id).filter(core)
        if (coreN.nonEmpty) id -> (("border", Some(coreN.map(label).min)))
        else id -> (("noise", None))
      }
    }.toMap
  }

  /** Collects to a map AFTER asserting one row per point — `toMap` would
    * silently collapse a duplicate-role bug (e.g. a point emitted as both
    * core and noise).
    */
  private def toRoleMap(
      rows: Array[org.apache.spark.sql.Row]
  ): Map[Long, (String, Option[Long])] = {
    val ids = rows.map(_.getLong(0))
    assert(ids.length == ids.distinct.length,
      s"one row per point violated: ${rows.toSeq.sortBy(_.getLong(0))}")
    rows.map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap
  }

  private def run(
      pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int
  ): Map[Long, (String, Option[Long])] =
    toRoleMap(Density.dbscan2d(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps, minPts).collect())

  test("two blobs + isolated noise: clusters split, noise flagged") {
    val blobA = (0L until 6L).map(i => (i, i % 3 * 10L, i / 3 * 10L))
    val blobB = (10L until 16L).map(i => (i, 1000L + i % 3 * 10L, i / 3 * 10L))
    val lone = Seq((99L, 5000L, 5000L))
    val pts = blobA ++ blobB ++ lone
    val got = run(pts, eps = 25L, minPts = 4)
    assert(got == ref(pts, 25L, 4))
    assert(got(99L) == (("noise", None)))
    assert(got(0L)._2 != got(10L)._2, "blobs are separate clusters")
  }

  test("negative coordinates: the shifted grid still finds cross-cell pairs") {
    // chain straddling the origin; eps picked so only adjacent links match
    val pts = Seq((1L, -30L, 0L), (2L, -10L, 0L), (3L, 10L, 0L), (4L, 30L, 0L))
    val got = run(pts, eps = 21L, minPts = 3)
    assert(got == ref(pts, 21L, 3))
    assert(got.values.count(_._1 == "core") > 0)
  }

  private def runCapped(
      pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int, cap: Int
  ): Map[Long, (String, Option[Long])] =
    toRoleMap(Density.dbscan2d(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps, minPts, maxCellSize = Some(cap)).collect())

  test("maxCellSize at/above the densest cell is the exact operator") {
    var s = 424242L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val pts = (1L to 100L).map(i => (i, next() % 300 - 150, next() % 300 - 150))
    val exact = run(pts, eps = 40L, minPts = 5)
    assert(runCapped(pts, 40L, 5, cap = pts.size) == exact,
      "a cap no cell reaches must not change a single row")
  }

  test("maxCellSize degrades monotonically: core can only shrink, noise only grow") {
    // one cell (eps=100 grid) packed with 40 points + a sparse fringe
    val dense = (1L to 40L).map(i => (i, 10L + i % 7, 10L + i / 7))
    val fringe = Seq((200L, 95L, 10L), (201L, 480L, 480L))
    val pts = dense ++ fringe
    val exact = run(pts, eps = 100L, minPts = 5)
    val capped = runCapped(pts, 100L, 5, cap = 8)
    assert(capped.keySet == exact.keySet, "every point still gets a role")
    val coreE = exact.collect { case (id, ("core", _)) => id }.toSet
    val coreC = capped.collect { case (id, ("core", _)) => id }.toSet
    val noiseE = exact.collect { case (id, ("noise", _)) => id }.toSet
    val noiseC = capped.collect { case (id, ("noise", _)) => id }.toSet
    assert(coreC.subsetOf(coreE), "capped neighbor counts are lower bounds")
    assert(noiseE.subsetOf(noiseC), "fewer credited neighbors, never more")
    assert(coreC.nonEmpty, "an over-cap cell still holds >= minPts targets")
    // deterministic: retained targets are the lowest ids, not a sample
    assert(runCapped(pts, 100L, 5, cap = 8) == capped)
  }

  test("capped-out core is one row, never re-emitted as noise") {
    // eps=10 grid, one cell, cap=2 retains ids 1,2 which are mutually
    // farther than eps — point 3 probes the full population and comes out
    // core, but none of ITS retained in-home neighbors is core. A noise
    // derivation based on "has a retained core neighbor" would emit 3
    // twice (core AND noise); the contract is one row per point.
    val pts = Seq((1L, 0L, 0L), (2L, 9L, 9L), (3L, 5L, 5L))
    val rows = Density.dbscan2d(pts.toDF("id", "x", "y"), "id", "x", "y",
        eps = 10L, minPts = 2, maxCellSize = Some(2))
      .collect()
    assert(rows.length == pts.size, s"one row per point, got ${rows.toSeq}")
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val byId = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(3L) == "core", "full-population probe count makes 3 core")
    // 1 and 2 have no RETAINED core neighbor -> noise (monotone: the
    // exact run makes all three core; cap shrinks core, grows noise)
    assert(byId(1L) == "noise" && byId(2L) == "noise")
  }

  test("capped-out core with lower-id retained core neighbors keeps its edges") {
    // eps=10, cap=2: ids 1,2 retained, 3 capped out; all three are core
    // and mutually within eps via 3. Every neighbor pair involving 3
    // survives only as (probe=3, home=lower id) — a `pid < id` edge
    // filter would strand 3 as a spurious singleton cluster. The
    // canonicalized build must reproduce the exact result here.
    val pts = Seq((1L, 0L, 0L), (2L, 9L, 0L), (3L, 4L, 0L))
    val exact = run(pts, eps = 10L, minPts = 2)
    val capped = runCapped(pts, 10L, 2, cap = 2)
    assert(capped == exact,
      s"cap must not fragment this cluster: exact=$exact capped=$capped")
    assert(capped(3L) == (("core", Some(1L))))
  }

  test("pseudo-random cloud matches brute force exactly") {
    var s = 31337L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val pts = (1L to 120L).map(i => (i, next() % 400 - 200, next() % 400 - 200))
    val got = run(pts, eps = 40L, minPts = 5)
    val want = ref(pts, 40L, 5)
    assert(got == want)
    val roles = got.values.map(_._1).toSet
    assert(roles.contains("core") && roles.contains("noise"),
      s"fixture should exercise several roles, got $roles")
  }

  // the out-of-core blocked-pass path (round 13) is the SAME exact
  // operator — every (role, cluster) must be bit-identical to the
  // single-pass plan on a fixture dense enough that cells span blocks
  Seq(2, 3, 7).foreach { blocks =>
    test(s"blocked exact path (blocks=$blocks) is bit-identical to single-pass") {
      var s = 97L
      def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
      val pts = (1L to 150L).map(i => (i, next() % 500 - 250, next() % 500 - 250))
      val single = run(pts, eps = 45L, minPts = 4)
      val blocked = toRoleMap(Density.dbscan2d(pts.toDF("id", "x", "y"),
        "id", "x", "y", eps = 45L, minPts = 4, blocks = blocks).collect())
      assert(blocked == single)
      assert(blocked == ref(pts, 45L, 4))
    }
  }

  test("blocked passes reject the capped mode") {
    val e = intercept[IllegalArgumentException] {
      Density.dbscan2d(Seq((1L, 0L, 0L)).toDF("id", "x", "y"),
        "id", "x", "y", eps = 10L, minPts = 1,
        maxCellSize = Some(4), blocks = 2)
    }
    assert(e.getMessage.contains("exact-mode"))
  }
}
