package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DownsampleLttbSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference LTTB (independent of the Spark fold): same
    * doubled-area integer arithmetic, same first-wins tie-break.
    */
  private def refLttb(pts: Seq[(Long, Long)], t: Int): Seq[(Long, Long)] = {
    val n = pts.length
    if (n <= t) return pts
    val sorted = pts.sorted
    val mids = sorted.slice(1, n - 1)
    val buckets = (0 until t - 2).map { b =>
      mids.zipWithIndex.filter { case (_, j) =>
        j.toLong * (t - 2) / (n - 2) == b }.map(_._1)
    }
    var prev = sorted.head
    val sel = scala.collection.mutable.ArrayBuffer(prev)
    for (b <- 0 until t - 2) {
      val (cnt, sx, sy) =
        if (b < t - 3)
          (buckets(b + 1).length.toLong,
            buckets(b + 1).map(_._1).sum, buckets(b + 1).map(_._2).sum)
        else (1L, sorted.last._1, sorted.last._2)
      var bestA = -1L
      var best = buckets(b).head
      for (c <- buckets(b)) {
        val a = math.abs(
          (prev._1 * cnt - sx) * (c._2 - prev._2) -
            (prev._1 - c._1) * (sy - cnt * prev._2))
        if (a > bestA) { bestA = a; best = c }
      }
      sel += best
      prev = best
    }
    sel += sorted.last
    sel.toSeq
  }

  private def run(pts: Seq[(Long, Long)], t: Int): Seq[(Long, Long)] =
    Downsample.lttb(
      pts.map { case (x, y) => ("s", x, y) }.toDF("k", "x", "y"),
      "k", "x", "y", t)
      .orderBy("x", "y")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq

  test("lttb matches an independent reference implementation on a noisy " +
    "series, for several thresholds") {
    // deterministic pseudo-noise, includes flats and reversals
    val pts = (0 until 120).map(i =>
      (i.toLong * 7, ((i * 37) % 23).toLong - 11 + (if (i % 9 == 0) 40 else 0)))
    for (t <- Seq(3, 5, 12, 50)) {
      assert(run(pts, t) == refLttb(pts, t).sorted,
        s"divergence from reference at threshold $t")
    }
  }

  test("lttb keeps first, last, and any dominant spike; small series pass " +
    "through") {
    val flat = (0 until 60).map(i => (i.toLong, 10L))
    val spiked = flat.updated(31, (31L, 5000L))
    val out = run(spiked, 10)
    assert(out.length == 10)
    assert(out.contains((0L, 10L)) && out.contains((59L, 10L)),
      "endpoints must survive")
    assert(out.contains((31L, 5000L)), "dominant spike must survive")

    val tiny = Seq((0L, 1L), (5L, 2L), (9L, 0L))
    assert(run(tiny, 24) == tiny, "n <= threshold must pass through")
  }

  test("sax: PAA means exact in milli-units, equi-depth alphabet balanced, " +
    "ragged tail kept with its true length") {
    // series a: 0..9 in frames of 4 -> frames {0..3},{4..7},{8,9}
    val df = (0 until 10).map(i => ("a", i.toLong, i.toLong))
      .toDF("k", "id", "v")
    val out = Downsample.sax(df, Seq("id"), "v",
        frame = 4, alphabet = 2, seriesCols = Seq("k"))
      .orderBy("widx").collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(out.head.fieldIndex("n"))).toSeq == Seq(4, 4, 2))
    // PAA means: 1.5, 5.5, 8.5 -> 1500, 5500, 8500 milli-units
    assert(out.map(_.getLong(out.head.fieldIndex("paa_u"))).toSeq ==
      Seq(1500L, 5500L, 8500L))
    // equi-depth rank over 3 frames, alphabet 2: ranks 1,2,3 -> 0,0,1
    assert(out.map(_.getLong(out.head.fieldIndex("sym"))).toSeq ==
      Seq(0L, 0L, 1L))
    // alphabet bins are balanced within 1 across many frames
    val big = (0 until 256).map(i => ("a", i.toLong, ((i * 37) % 101).toLong))
      .toDF("k", "id", "v")
    val counts = Downsample.sax(big, Seq("id"), "v",
        frame = 4, alphabet = 8, seriesCols = Seq("k"))
      .groupBy("sym").count().orderBy("sym")
      .collect().map(_.getLong(1))
    assert(counts.length == 8 && counts.max - counts.min <= 1,
      counts.mkString(","))
    // float input fails loudly
    intercept[IllegalArgumentException] {
      Downsample.sax(df.withColumn("v", col("v").cast("double")),
        Seq("id"), "v", frame = 4, alphabet = 2, seriesCols = Seq("k"))
    }
  }

  test("lttb plan: one exchange collects each series; no joins") {
    val df = (0 until 50).map(i => ("s", i.toLong, (i % 7).toLong))
      .toDF("k", "x", "y")
    val plan = Downsample.lttb(df, "k", "x", "y", 10)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("join"), s"lttb must not join:\n$plan")
    assert("exchange hashpartitioning".r.findAllIn(plan).size <= 2,
      s"expected only the series groupBy exchanges:\n$plan")
  }
}
