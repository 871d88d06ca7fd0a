package graft

import graft.ts.Spectral
import org.apache.spark.sql.functions._

class SpectralSpec extends SparkSpec {
  import spark.implicits._

  test("periodogram: a planted 24-cycle dominates the other candidates " +
    "and a constant series has zero power everywhere") {
    // x_t = 1000·cos(2π·t/24) rounded to ints, 10 full cycles
    val wave = (0 until 240).map(t =>
      (t.toLong, math.round(1000.0 * math.cos(2 * math.Pi * t / 24))))
      .toDF("idx", "x")
    val p = Spectral.periodogram(wave, "idx", "x", Seq(6, 12, 24, 168))
      .collect().map(r => r.getInt(0) ->
        r.getDouble(r.fieldIndex("power"))).toMap
    // theoretical power of a centered cosine: (A²/4)·n = 250k·240... but
    // normalized /n twice -> A²/4 = 250000 at the true period
    assert(math.abs(p(24) - 250000.0) < 1000.0, s"got ${p(24)}")
    assert(p(24) > 100 * p(6) && p(24) > 100 * p(12),
      s"24-cycle must dominate: $p")
    val const = (0 until 240).map(t => (t.toLong, 7L)).toDF("idx", "x")
    val pc = Spectral.periodogram(const, "idx", "x", Seq(6, 24))
      .collect().map(r => r.getInt(0) ->
        r.getDouble(r.fieldIndex("power"))).toMap
    assert(pc.values.forall(_ == 0.0), s"centering must kill DC: $pc")
  }

  test("periodogram: spectral sums are the exact integer closed form on a " +
    "tiny grid") {
    // 4 points, period 4: phases 0..3 have cos_u = (1e6, 0, -1e6, 0),
    // sin_u = (0, 1e6, 0, -1e6); dev = 4·x − S with S=10, n=4
    val df = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("idx", "x")
    val r = Spectral.periodogram(df, "idx", "x", Seq(4)).head()
    val dev = Seq(1L, 2L, 3L, 4L).map(4L * _ - 10L) // -6, -2, 2, 6
    assert(r.getLong(r.fieldIndex("sc_u")) == dev(0) * 1000000L - dev(2) * 1000000L)
    assert(r.getLong(r.fieldIndex("ss_u")) == dev(1) * 1000000L - dev(3) * 1000000L)
  }

  test("periodogram plan: candidate fan-out multiplies the grid, totals " +
    "ride a broadcast, one final hash aggregate") {
    val df = Seq((0L, 1L)).toDF("idx", "x")
    val plan = Spectral.periodogram(df, "idx", "x", Seq(6, 24))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("broadcast"), plan)
    assert(!plan.contains("sortmergejoin"), plan)
  }

  test("haarL1: hand-computed coefficients on an 8-point grid, absent " +
    "slots contribute zero") {
    // x = 1,2,3,4,5,6,7,8 at idx 0..7
    val df = (0 to 7).map(i => (i.toLong, (i + 1).toLong)).toDF("idx", "x")
    val out = Spectral.haarL1(df, "idx", "x", levels = 3)
      .orderBy("level").collect()
    // level 1 blocks: (1-2),(3-4),(5-6),(7-8) = -1 each -> l1 4, max 1
    assert(out(0).getAs[Long]("n_coeffs") == 4L)
    assert(out(0).getAs[Long]("l1_energy") == 4L)
    assert(out(0).getAs[Long]("max_abs") == 1L)
    // level 2: (1+2)-(3+4) = -4, (5+6)-(7+8) = -4 -> l1 8
    assert(out(1).getAs[Long]("n_coeffs") == 2L)
    assert(out(1).getAs[Long]("l1_energy") == 8L)
    // level 3: (1..4)-(5..8) = -16
    assert(out(2).getAs[Long]("l1_energy") == 16L)
    // sparse grid: idx 0 and 3 only -> level-1 blocks {0:(x0 - 0)}, {1:(0 - x3)}
    val sparse = Seq((0L, 5L), (3L, 7L)).toDF("idx", "x")
    val s1 = Spectral.haarL1(sparse, "idx", "x", levels = 1).collect().head
    assert(s1.getAs[Long]("n_coeffs") == 2L)
    assert(s1.getAs[Long]("l1_energy") == 12L) // |5| + |-7|
  }

  test("haarL1: a negative grid index raises instead of silently " +
    "mis-binning (div vs floor-div divergence is fenced)") {
    val bad = Seq((-1L, 5L), (0L, 7L)).toDF("idx", "x")
    val e = intercept[Exception] {
      Spectral.haarL1(bad, "idx", "x", levels = 1).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-negative")), e.toString)
  }
}
