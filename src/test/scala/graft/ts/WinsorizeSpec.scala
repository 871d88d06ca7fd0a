package graft.ts

import graft.SparkSpec

class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  test("discrete cuts, clip counts, and winsorized sum on 1..20") {
    val rows = (1L to 20L).map(v => ("u", v))
    val r = Winsorize.stats(rows.toDF("k", "v"), "v", Seq("k")).collect().head
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("lo_cut") == 1L) // rank ceil(5*20/100)=1
    assert(r.getAs[Long]("hi_cut") == 19L) // rank ceil(95*20/100)=19
    assert(r.getAs[Long]("n_clip_lo") == 0L)
    assert(r.getAs[Long]("n_clip_hi") == 1L) // only 20 > 19
    assert(r.getAs[Long]("sum_raw") == 210L)
    assert(r.getAs[Long]("sum_winsor") == 209L)
  }

  test("outlier-heavy series: both tails clamp; per-series independence") {
    val u = (1L to 98L).map(v => ("u", 50L)) ++ Seq(("u", -1000L), ("u", 5000L))
    val v = (1L to 4L).map(i => ("v", i))
    val got = Winsorize.stats((u ++ v).toDF("k", "v"), "v", Seq("k"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ru = got("u")
    // n=100: lo rank 5, hi rank 95 -> both cuts are 50 (constant bulk)
    assert(ru.getAs[Long]("lo_cut") == 50L && ru.getAs[Long]("hi_cut") == 50L)
    assert(ru.getAs[Long]("n_clip_lo") == 1L && ru.getAs[Long]("n_clip_hi") == 1L)
    assert(ru.getAs[Long]("sum_winsor") == 100L * 50L)
    val rv = got("v")
    // n=4: lo rank ceil(20/100)=1 -> 1, hi rank ceil(380/100)=4 -> 4
    assert(rv.getAs[Long]("lo_cut") == 1L && rv.getAs[Long]("hi_cut") == 4L)
    assert(rv.getAs[Long]("n_clip_lo") == 0L && rv.getAs[Long]("n_clip_hi") == 0L)
  }
}
