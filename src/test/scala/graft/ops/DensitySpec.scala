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

  private def run(
      pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int
  ): Map[Long, (String, Option[Long])] =
    Density.dbscan2d(pts.toDF("id", "x", "y"), "id", "x", "y", eps, minPts)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))))
      .toMap

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
}
