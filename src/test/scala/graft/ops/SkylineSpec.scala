package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force NOT EXISTS dominance (min x, max y, one strict). */
  private def refSkyline(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    pts.filterNot { case (_, x1, y1) =>
      pts.exists { case (_, x2, y2) =>
        x2 <= x1 && y2 >= y1 && (x2 < x1 || y2 > y1)
      }
    }.toSet

  private def run(pts: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Skyline.skyline2d(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("skyline2d: staircase fixture, dominated interior points dropped") {
    // front = (1,50),(3,70),(6,90); (2,40) under (1,50); (4,70) behind (3,70)
    val pts = Seq(
      (1L, 1L, 50L), (2L, 2L, 40L), (3L, 3L, 70L),
      (4L, 4L, 70L), (5L, 6L, 90L), (6L, 7L, 80L))
    assert(run(pts) == Set((1L, 1L, 50L), (3L, 3L, 70L), (5L, 6L, 90L)))
  }

  test("skyline2d: exact duplicates of a front point all survive") {
    val pts = Seq((1L, 5L, 10L), (2L, 5L, 10L), (3L, 5L, 7L), (4L, 9L, 10L))
    assert(run(pts) == refSkyline(pts))
    assert(run(pts).map(_._1) == Set(1L, 2L))
  }

  test("skyline2d: same-x tie keeps only the max-y rows of that x") {
    val pts = Seq((1L, 2L, 10L), (2L, 2L, 30L), (3L, 4L, 20L), (4L, 1L, 5L))
    assert(run(pts) == refSkyline(pts))
  }

  test("skyline2d: deterministic pseudo-random cloud matches brute force") {
    var s = 98765L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s }
    val pts = (1L to 300L).map(i => (i, next() % 1000, next() % 1000))
    val got = run(pts)
    assert(got == refSkyline(pts))
    assert(got.nonEmpty && got.size < pts.size)
  }
}
