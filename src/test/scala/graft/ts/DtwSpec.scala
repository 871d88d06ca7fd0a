package graft.ts

import graft.SparkSpec
import java.sql.Timestamp

class DtwSpec extends SparkSpec {
  import spark.implicits._

  /** Brute-force O(n·m) DTW reference. */
  private def refDtw(a: Seq[Long], b: Seq[Long]): Long = {
    val n = a.length; val m = b.length
    val dp = Array.fill(n + 1, m + 1)(Dtw.Inf)
    dp(0)(0) = 0L
    for (i <- 1 to n; j <- 1 to m)
      dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
        math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
    dp(n)(m)
  }

  private def pairs(vs: Seq[(Long, Seq[Long])], m: Int): Map[(Long, Long), (Long, Long)] =
    Dtw.dtwPairs(vs.toDF("id", "vec"), "id", "vec", m)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

  test("dtw: identical series distance 0; shifted impulse warps to 0 while L1 pays") {
    val a = Seq(0L, 10L, 0L, 0L)
    val b = Seq(0L, 0L, 10L, 0L)
    val got = pairs(Seq((1L, a), (2L, a), (3L, b)), 4)
    assert(got((1L, 2L)) == ((0L, 0L)), "identity")
    val (dtw, l1) = got((1L, 3L))
    assert(l1 == 20L, "aligned L1 pays the impulse twice")
    assert(dtw == 0L, "DTW aligns the impulses")
  }

  test("dtw: matches brute force and never exceeds L1 on pseudo-random vectors") {
    var s = 4242L
    def next(): Long = { s = (s * 1103515245L + 12345L) % 2147483648L; s >> 16 }
    val m = 12
    val vs = (1L to 8L).map(i => (i, Seq.fill(m)(next() % 1000)))
    val got = pairs(vs, m)
    val byId = vs.toMap
    assert(got.size == 8 * 7 / 2)
    got.foreach { case ((ia, ib), (dtw, l1)) =>
      assert(dtw == refDtw(byId(ia), byId(ib)), s"pair ($ia,$ib)")
      assert(dtw <= l1, "identity path upper-bounds DTW")
    }
  }

  test("seriesVectors: bucket sums land in global-span slices, gaps are 0") {
    // span [t0, t0+40) minutes, m=4 -> 10-minute slices; series 2 only
    // has data in slice 0 and 3
    val t0 = 1700000000000000L // micros
    def ts(min: Long) = new Timestamp((t0 + min * 60000000L) / 1000L)
    val rows = Seq(
      (1L, ts(0), 5L), (1L, ts(11), 7L), (1L, ts(22), 9L), (1L, ts(40), 1L),
      (2L, ts(2), 3L), (2L, ts(3), 4L), (2L, ts(39), 8L))
    val vecs = Dtw.seriesVectors(rows.toDF("id", "ts", "cents"),
        "id", "ts", "cents", m = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // global span = [0, 40] min inclusive -> slice = span/4 with +1 end
    assert(vecs(1L) == Seq(5L, 7L, 9L, 1L))
    assert(vecs(2L) == Seq(7L, 0L, 0L, 8L))
  }
}
