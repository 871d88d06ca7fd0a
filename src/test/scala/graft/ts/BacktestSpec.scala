package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BacktestSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed two-row eval: naive and ma(2), exact integer metrics") {
    val rows = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))
      .map { case (p, v) => ("u", p, v) }
    val r = Backtest
      .oneStepAhead(rows.toDF("k", "pos", "cents"), Seq("pos"), "cents",
        evalMask = col("pos") >= 3, maWindow = 2, seriesCols = Seq("k"))
      .collect().head
    assert(r.getAs[Long]("n_eval") == 2L)
    // t=3: naive f=20 (ae 10), ma f=(10+20)div 2=15 (ae 15)
    // t=4: naive f=30 (ae 10), ma f=(20+30)div 2=25 (ae 15)
    assert(r.getAs[Long]("sum_ae_naive") == 20L)
    assert(r.getAs[Long]("sum_ae_ma") == 30L)
    // smape ppm: 2*10e6/50 + 2*10e6/70 = 400000 + 285714
    assert(r.getAs[Long]("sum_smape_naive_ppm") == 685714L)
    // 2*15e6/45 + 2*15e6/65 = 666666 + 461538
    assert(r.getAs[Long]("sum_smape_ma_ppm") == 1128204L)
  }

  test("rows without a prior observation never score; 0/0 sMAPE term is 0") {
    val rows = Seq(("u", 1L, 0L), ("u", 2L, 0L), ("v", 5L, 9L))
    val got = Backtest
      .oneStepAhead(rows.toDF("k", "pos", "cents"), Seq("pos"), "cents",
        evalMask = lit(true), maWindow = 4, seriesCols = Seq("k"))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(!got.contains("v"), "single-row series has nothing to evaluate")
    val u = got("u")
    assert(u.getAs[Long]("n_eval") == 1L)
    assert(u.getAs[Long]("sum_smape_naive_ppm") == 0L, "0/0 term snaps to 0")
  }

  test("SES backtest: hand-computed snapped EWMA forecast; frame ends " +
    "strictly before the row (no leakage); constant series forecast exact") {
    // alpha=0.5 on (10, 20, 40): eval at t=3 sees history (10, 20) only.
    // adjusted ewma = (10*0.5 + 20*1)/(0.5+1) = 16.666… -> snap 17
    val rows = Seq(("u", 1L, 10L), ("u", 2L, 20L), ("u", 3L, 40L))
    val r = Backtest
      .oneStepAheadSes(rows.toDF("k", "pos", "cents"), Seq("pos"), "cents",
        evalMask = col("pos") >= 3, alpha = 0.5, window = 32,
        seriesCols = Seq("k"))
      .collect().head
    assert(r.getAs[Long]("n_eval") == 1L)
    assert(r.getAs[Long]("sum_ae_naive") == 20L)   // |40 - 20|
    assert(r.getAs[Long]("sum_ae_ses") == 23L,     // |40 - 17|
      s"snapped SES forecast must be 17 (leak-free history only): $r")
    // constant series: SES reproduces the constant exactly -> zero error
    val const = Seq(("c", 1L, 7L), ("c", 2L, 7L), ("c", 3L, 7L), ("c", 4L, 7L))
    val rc = Backtest
      .oneStepAheadSes(const.toDF("k", "pos", "cents"), Seq("pos"), "cents",
        evalMask = lit(true), alpha = 0.1, window = 8, seriesCols = Seq("k"))
      .collect().head
    assert(rc.getAs[Long]("sum_ae_ses") == 0L)
    assert(rc.getAs[Long]("sum_smape_ses_ppm") == 0L)
  }
  test("holtForecast: hand-computed integer level/trend trace; single-point " +
    "series returns (x, 0); one keyed exchange") {
    // xs = [100,120,140,130,150], a=2, b=3:
    //   l=100,b=0 -> (104,1) -> (112,3) -> (118,3) -> (126,4)
    val rows = Seq(
      ("u", 1L, 100L), ("u", 2L, 120L), ("u", 3L, 140L),
      ("u", 4L, 130L), ("u", 5L, 150L),
      ("v", 1L, 77L))
      .toDF("k", "pos", "x")
    val out = Backtest.holtForecast(rows, Seq("pos"), "x", Seq("k"),
        aTenths = 2, bTenths = 3, horizon = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out("u") == ((5L, 126L, 4L, 130L, 134L)))
    assert(out("v") == ((1L, 77L, 0L, 77L, 77L)))
    // order robustness: shuffled input folds identically (array_sort pins it)
    val shuffled = Seq(
      ("u", 4L, 130L), ("u", 1L, 100L), ("u", 5L, 150L),
      ("u", 2L, 120L), ("u", 3L, 140L)).toDF("k", "pos", "x")
    val o2 = Backtest.holtForecast(shuffled, Seq("pos"), "x", Seq("k"), 2, 3, 2)
      .collect().head
    assert((o2.getLong(2), o2.getLong(3)) == ((126L, 4L)))
    // non-integral value column must fail loudly, like the other exact ops
    intercept[IllegalArgumentException] {
      Backtest.holtForecast(rows.withColumn("x", col("x").cast("double")),
        Seq("pos"), "x", Seq("k"))
    }
    val plan = Backtest.holtForecast(rows, Seq("pos"), "x", Seq("k"))
      .queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"holt must ride a single series-key exchange:\n$plan")
  }

  /** Pure-Scala replay of the integer Holt-Winters recursion. */
  private def refHw(
      xs: Seq[Long], m: Int, a: Long, b: Long, g: Long
  ): (Long, Long, Seq[Long]) = {
    var l = xs.take(m).sum / m
    var t = 0L
    var s = xs.take(m).map(_ - l)
    for (x <- xs.drop(m)) {
      val sOld = s.head
      val lN = (a * (x - sOld) + (10 - a) * (l + t)) / 10
      val tN = (b * (lN - l) + (10 - b) * t) / 10
      val sN = (g * (x - lN) + (10 - g) * sOld) / 10
      l = lN; t = tN; s = s.tail :+ sN
    }
    (l, t, s)
  }

  test("holtWinters: matches the pure-Scala recursion, pure-seasonal series " +
    "forecasts its own cycle, short series keeps the init state") {
    // two full cycles of a period-3 pattern + drift noise
    val xs = Seq(100L, 200L, 300L, 110L, 190L, 310L, 105L, 205L, 295L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) } ++
      Seq(("w", 1L, 50L), ("w", 2L, 60L), ("w", 3L, 70L)) // exactly m rows
    val out = Backtest.holtWinters(rows.toDF("k", "pos", "x"),
        Seq("pos"), "x", Seq("k"), period = 3, aTenths = 3, bTenths = 1,
        gTenths = 2, horizon = 3)
      .collect().map(r => r.getString(0) -> r).toMap
    val (l, t, s) = refHw(xs, 3, 3, 1, 2)
    val u = out("u")
    assert(u.getAs[Long]("level") == l && u.getAs[Long]("trend") == t)
    assert((1 to 3).map(h => u.getAs[Long](s"forecast_$h")) ==
      (1 to 3).map(h => l + h * t + s((h - 1) % 3)))
    // exactly-m series: fold body never ran -> level = init mean, trend 0
    val w = out("w")
    assert(w.getAs[Long]("level") == 60L && w.getAs[Long]("trend") == 0L)
    assert(w.getAs[Long]("forecast_1") == 60L + (50L - 60L))
    // a perfectly periodic series forecasts close to its own next cycle
    val per = (0 until 30).map(i => ("p", i.toLong, Seq(100L, 500L, 900L)(i % 3)))
    val p = Backtest.holtWinters(per.toDF("k", "pos", "x"),
        Seq("pos"), "x", Seq("k"), period = 3).collect().head
    val f = (1 to 3).map(h => p.getAs[Long](s"forecast_$h"))
    assert(math.abs(f(1) - f(0)) > 100,
      s"seasonal spread must survive into the forecasts, got $f")
  }

  test("oneStepAheadSeasonal: periodic grid scores seasonal at zero error " +
    "while naive pays the full swing; shared eval set") {
    // period-4 sawtooth over 12 slots: 10,20,30,40 repeating
    val g = (0 until 12).map(i => (i.toLong, Seq(10L, 20L, 30L, 40L)(i % 4)))
      .toDF("idx", "x")
    val r = Backtest.oneStepAheadSeasonal(g, Seq("idx"), "x", period = 4)
      .collect().head
    // eval rows: idx 4..11 (both lag1 and lag4 defined) = 8 rows
    assert(r.getAs[Long]("n_eval") == 8L)
    assert(r.getAs[Long]("sum_ae_seasonal") == 0L)
    // naive error: |x_t - x_{t-1}| = 10 except at wrap 40->10 (=30);
    // idx 4..11 holds two wraps (idx 4 and 8): 6*10 + 2*30 = 120
    assert(r.getAs[Long]("sum_ae_naive") == 120L)
    assert(r.getAs[Long]("sum_smape_seasonal_ppm") == 0L)
  }

  test("ar2Fit: recovers an exact AR(2) recurrence, degenerate series " +
    "yield nulls, float input rejected") {
    // y_t = 2*y_{t-1} - y_{t-2} (a perfect line fits AR(2) exactly)
    val line = (1 to 12).map(i => ("u", i.toLong, 10L * i))
    val out = Backtest.ar2Fit(line.toDF("uid", "pos", "x"), Seq("pos"), "x",
      Seq("uid")).collect().head
    assert(out.getAs[Long]("n_eval") == 10L)
    assert(math.abs(out.getAs[Double]("phi1") - 2.0) < 1e-6, s"$out")
    assert(math.abs(out.getAs[Double]("phi2") + 1.0) < 1e-6, s"$out")
    // exact fit -> forecast continues the line: phi1*120 + phi2*110 = 130
    assert(out.getAs[Long]("forecast_next") == 130L)
    // constant-zero series: all moments zero -> det 0 -> nulls
    val const = (1 to 6).map(i => ("c", i.toLong, 0L))
    val c = Backtest.ar2Fit(const.toDF("uid", "pos", "x"), Seq("pos"), "x",
      Seq("uid")).collect().head
    assert(c.isNullAt(c.fieldIndex("phi1")) && c.isNullAt(c.fieldIndex("forecast_next")))
    intercept[IllegalArgumentException] {
      Backtest.ar2Fit(line.map { case (u, p, x) => (u, p, x.toDouble) }
        .toDF("uid", "pos", "x"), Seq("pos"), "x", Seq("uid"))
    }
  }
}
