package graft

import graft.ts.{Downsample, Smooth}
import org.apache.spark.sql.functions._

class SmoothSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    // user a: 4 points, hourly
    ("a", 1L, ts("2024-01-01 00:00:00"), 10.0),
    ("a", 2L, ts("2024-01-01 01:00:00"), 20.0),
    ("a", 3L, ts("2024-01-01 02:00:00"), 30.0),
    ("a", 4L, ts("2024-01-01 03:00:00"), 40.0),
    // user b: constant
    ("b", 5L, ts("2024-01-01 00:00:00"), 5.0),
    ("b", 6L, ts("2024-01-01 01:00:00"), 5.0)
  ).toDF("k", "id", "ts", "v")

  test("ewma matches the pandas adjust=True closed form") {
    val out = Smooth.ewma(series, Seq("ts", "id"), "v", alpha = 0.5,
        window = 64, seriesCols = Seq("k"))
      .orderBy("id").select("ewma").as[Double].collect()
    // pandas: y_i = sum((1-a)^j x_{i-j}) / sum((1-a)^j), a=0.5
    // user a: 10; (0.5*10+20)/1.5=16.6667; (0.25*10+0.5*20+30)/1.75=24.2857;
    //         (0.125*10+0.25*20+0.5*30+40)/1.875=32.6667
    val exp = Seq(10.0, 25.0 / 1.5, 42.5 / 1.75, 61.25 / 1.875, 5.0, 5.0)
    out.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12, s"$g vs $e") }
  }

  test("ewma window truncation drops contributions beyond the frame") {
    val out = Smooth.ewma(series.filter($"k" === "a"), Seq("ts", "id"), "v",
        alpha = 0.5, window = 2, seriesCols = Seq("k"))
      .orderBy("id").select("ewma").as[Double].collect()
    // window=2: y_i = (0.5 x_{i-1} + x_i) / 1.5 for i >= 1
    val exp = Seq(10.0, 25.0 / 1.5, 40.0 / 1.5, 55.0 / 1.5)
    out.zip(exp).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("ewma nulls keep positional weight but contribute to neither sum (pandas ignore_na=False)") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00"), Some(10.0)),
      ("a", 2L, ts("2024-01-01 01:00:00"), None: Option[Double]),
      ("a", 3L, ts("2024-01-01 02:00:00"), Some(30.0))
    ).toDF("k", "id", "ts", "v")
    val out = Smooth.ewma(df, Seq("ts", "id"), "v", alpha = 0.5,
        window = 64, seriesCols = Seq("k"))
      .orderBy("id").select("ewma").as[Double].collect()
    // row2: null -> carries row1's value; row3: (0.25*10 + 30)/1.25 = 26.0
    assert(math.abs(out(0) - 10.0) < 1e-12)
    assert(math.abs(out(1) - 10.0) < 1e-12)
    assert(math.abs(out(2) - 26.0) < 1e-12)
  }

  test("cusum integer path is exact and ends at zero") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 00:00:00"), 10L),
      ("a", 2L, ts("2024-01-01 01:00:00"), 30L),
      ("a", 3L, ts("2024-01-01 02:00:00"), 20L)
    ).toDF("k", "id", "ts", "v")
    val out = Smooth.cusum(df, Seq("ts", "id"), "v", seriesCols = Seq("k"))
      .orderBy("id").select("cusum").as[Double].collect()
    // mean 20: deviations -10, +10, 0 -> cusum -10, 0, 0
    assert(out.toSeq == Seq(-10.0, 0.0, 0.0))
  }

  test("cusum float path matches the integer path on integral values") {
    val longs = Seq(("a", 1L, ts("2024-01-01 00:00:00"), 7L),
      ("a", 2L, ts("2024-01-01 01:00:00"), 14L),
      ("a", 3L, ts("2024-01-01 02:00:00"), 0L)).toDF("k", "id", "ts", "v")
    val doubles = longs.withColumn("v", col("v").cast("double"))
    val a = Smooth.cusum(longs, Seq("ts", "id"), "v", seriesCols = Seq("k"))
      .orderBy("id").select("cusum").as[Double].collect()
    val b = Smooth.cusum(doubles, Seq("ts", "id"), "v", seriesCols = Seq("k"))
      .orderBy("id").select("cusum").as[Double].collect()
    a.zip(b).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
  }

  test("rolling autocorr: perfect linear series gives 1, degenerate frames give null") {
    val out = Smooth.rollingAutocorr(series.filter($"k" === "a"),
        Seq("ts", "id"), "v", window = 32, seriesCols = Seq("k"))
      .orderBy("id").select("autocorr").as[Option[Double]].collect()
    assert(out(0).isEmpty) // no lag pair
    assert(out(1).isEmpty) // one pair: zero variance -> null, not NaN
    out.drop(2).foreach { v =>
      assert(v.isDefined && math.abs(v.get - 1.0) < 1e-9) // linear -> corr 1
    }
  }

  test("ewma kernel is bit-identical to the HOF fold it replaced") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 150).map { i =>
      ("k" + (i % 3), i.toLong,
        new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 1000L),
        if (i % 7 == 0) None else Some(rnd.nextDouble() * 100 - 50))
    }.toDF("k", "id", "ts", "v")
    val kernel = Smooth.ewma(df, Seq("ts", "id"), "v", 0.1, 16, Seq("k"))
      .orderBy("id").select("ewma").as[Option[Double]].collect()
    val hof = Smooth.ewmaHof(df, Seq("ts", "id"), "v", 0.1, 16, Seq("k"), "ewma")
      .orderBy("id").select("ewma").as[Option[Double]].collect()
    assert(kernel.length == hof.length)
    kernel.zip(hof).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a == b, s"bit mismatch at $i: $a vs $b") // EXACT, not approx
    }
  }

  test("rollingAutocorrExact equals the windowed-corr form on integer series") {
    // pseudo-random integer walk across two series, incl. a window shorter
    // than the series so sliding-out rows are exercised
    val rnd = new scala.util.Random(7)
    var acc = 50L
    val df = (0 until 120).map { i =>
      acc += rnd.nextInt(21) - 10
      ("k" + (i % 2), i.toLong,
        new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 1000L), acc)
    }.toDF("k", "id", "ts", "v")
    val exact = Smooth.rollingAutocorrExact(df, Seq("ts", "id"), "v",
        window = 8, seriesCols = Seq("k"))
      .orderBy("id").select("autocorr").as[Option[Double]].collect()
    val ref = Smooth.rollingAutocorr(df, Seq("ts", "id"), "v",
        window = 8, seriesCols = Seq("k"))
      .orderBy("id").select("autocorr").as[Option[Double]].collect()
    assert(exact.length == ref.length)
    exact.zip(ref).zipWithIndex.foreach { case ((e, r), i) =>
      assert(e.isDefined == r.isDefined, s"null mismatch at $i: $e vs $r")
      for (ev <- e; rv <- r)
        assert(math.abs(ev - rv) < 1e-9, s"value mismatch at $i: $ev vs $rv")
    }
  }

  test("rollingAutocorrExact: large-magnitude integers stay within int64 headroom") {
    // random walk with ±1e6 steps: x ~ 1e7, x^2 ~ 1e14, n·Σxx ~ 1e17 —
    // an order of magnitude under 2^63, and the result must still agree
    // with the float windowed-corr form
    val rnd = new scala.util.Random(3)
    var acc = 0L
    val df = (0 until 100).map { i =>
      acc += rnd.nextInt(2000001) - 1000000
      ("k", i.toLong,
        new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 1000L), acc)
    }.toDF("k", "id", "ts", "v")
    val exact = Smooth.rollingAutocorrExact(df, Seq("ts", "id"), "v",
        window = 32, seriesCols = Seq("k"))
      .orderBy("id").select("autocorr").as[Option[Double]].collect()
    val ref = Smooth.rollingAutocorr(df, Seq("ts", "id"), "v",
        window = 32, seriesCols = Seq("k"))
      .orderBy("id").select("autocorr").as[Option[Double]].collect()
    exact.zip(ref).foreach { case (e, r) =>
      assert(e.isDefined == r.isDefined)
      for (ev <- e; rv <- r) assert(math.abs(ev - rv) < 1e-9, s"$ev vs $rv")
    }
  }

  test("rolling autocorr constant series yields null (zero variance), never NaN") {
    val out = Smooth.rollingAutocorr(series.filter($"k" === "b"),
        Seq("ts", "id"), "v", window = 32, seriesCols = Seq("k"))
      .select("autocorr").as[Option[Double]].collect()
    assert(out.forall(_.isEmpty))
  }

  test("rollingMomentsExact: hand-computed window and null edges") {
    // frame {0,0,3}: M2 = 3*9-9 = 18, M3 = 9*27-3*3*3*9+2*27 = 54,
    // M4 = 27*81 - 4*9*3*27 + 6*3*9*9 - 3*81 = 486
    // skew = 54/(18*sqrt(18)) = 1/sqrt(2); kurt = 486/324 - 3 = -1.5
    val df = Seq(("a", 1L, ts("2024-01-01 00:00:00"), 0L),
      ("a", 2L, ts("2024-01-01 01:00:00"), 0L),
      ("a", 3L, ts("2024-01-01 02:00:00"), 3L))
      .toDF("k", "id", "ts", "v")
    val out = Smooth.rollingMomentsExact(df, Seq("ts", "id"), "v",
        window = 3, seriesCols = Seq("k"))
      .orderBy("id").collect()
    val last = out.last
    assert(last.getLong(last.fieldIndex("m2_num")) == 18)
    assert(last.getLong(last.fieldIndex("m3_num")) == 54)
    assert(last.getLong(last.fieldIndex("m4_num")) == 486)
    assert(math.abs(last.getDouble(last.fieldIndex("skew")) -
      1.0 / math.sqrt(2.0)) < 1e-12)
    assert(last.getDouble(last.fieldIndex("kurt")) == -1.5)
    // one-row frame -> null; constant frame (zero variance) -> null
    assert(out.head.isNullAt(out.head.fieldIndex("skew")))
    assert(out(1).isNullAt(out(1).fieldIndex("kurt")),
      "two equal values have zero variance")
    // float input must fail loudly, not truncate
    intercept[IllegalArgumentException] {
      Smooth.rollingMomentsExact(series, Seq("ts", "id"), "v",
        window = 3, seriesCols = Seq("k"))
    }
  }

  test("rollingMomentsExact equals Spark's windowed skewness/kurtosis " +
    "aggregates on a random integer walk") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    var acc = 100L
    val df = (0 until 150).map { i =>
      acc += rnd.nextInt(41) - 20
      ("k" + (i % 3), i.toLong,
        new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 1000L), acc)
    }.toDF("k", "id", "ts", "v")
    val w = Window.partitionBy("k").orderBy("ts", "id").rowsBetween(-7, 0)
    val ref = df
      .withColumn("rskew", skewness(col("v").cast("double")).over(w))
      .withColumn("rkurt", kurtosis(col("v").cast("double")).over(w))
      .orderBy("id")
      .select("rskew", "rkurt")
      .as[(Option[Double], Option[Double])].collect()
    val got = Smooth.rollingMomentsExact(df, Seq("ts", "id"), "v",
        window = 8, seriesCols = Seq("k"))
      .orderBy("id").select("skew", "kurt")
      .as[(Option[Double], Option[Double])].collect()
    assert(got.length == ref.length)
    got.zip(ref).zipWithIndex.foreach { case (((gs, gk), (rs, rk)), i) =>
      for (g <- gs; r <- rs)
        assert(math.abs(g - r) < 1e-8, s"skew mismatch at $i: $g vs $r")
      for (g <- gk; r <- rk)
        assert(math.abs(g - r) < 1e-8, s"kurt mismatch at $i: $g vs $r")
    }
  }

  test("m4 keeps first/last/min/max per bucket with deterministic tie-break") {
    val df = Seq(
      // one series, 4 points in bucket 0 of 1 bucket
      ("a", 1L, ts("2024-01-01 00:00:00"), 15.0),
      ("a", 2L, ts("2024-01-01 00:00:00"), 10.0), // same ts as id=1: id breaks tie
      ("a", 3L, ts("2024-01-01 01:00:00"), 99.0),
      ("a", 4L, ts("2024-01-01 02:00:00"), 1.0)
    ).toDF("k", "id", "ts", "v")
    val out = Downsample.m4(df, "ts", "v", buckets = 1,
        seriesCols = Seq("k"), tieCol = Some("id")).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("v_first") == 15.0) // id=1 wins the ts tie
    assert(r.getAs[Double]("v_last") == 1.0)
    assert(r.getAs[Double]("v_min") == 1.0)
    assert(r.getAs[Double]("v_max") == 99.0)
    assert(r.getAs[Long]("n_rows") == 4L)
  }

  test("m4 bucket count bounds output: at most 4 distinct values survive per bucket") {
    val rows = (0 until 1000).map { i =>
      ("a", i.toLong, new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 60000L),
        math.sin(i / 10.0) * 100)
    }
    val df = rows.toDF("k", "id", "ts", "v")
    val out = Downsample.m4(df, "ts", "v", buckets = 10,
      seriesCols = Seq("k"), tieCol = Some("id"))
    assert(out.count() == 10)
    // every row of the input lands in exactly one bucket
    assert(out.agg(sum("n_rows")).as[Long].head() == 1000L)
  }

  test("rollingMedian: odd frames pick the middle value, even frames " +
    "interpolate, and a spike never drags the median like the mean") {
    // 1, 100, 3, 5, 7 — the 100-spike must not surface in any median
    val df = Seq(("s", 1L, 1L), ("s", 2L, 100L), ("s", 3L, 3L),
      ("s", 4L, 5L), ("s", 5L, 7L)).toDF("k", "id", "v")
    val out = Smooth.rollingMedian(df, Seq("id"), "v", window = 3,
        seriesCols = Seq("k"))
      .orderBy("id").select("roll_median").as[Double].collect()
    // frames: [1], [1,100], [1,100,3], [100,3,5], [3,5,7]
    assert(out.toSeq == Seq(1.0, 50.5, 3.0, 5.0, 5.0), out.toSeq.toString)
  }

  test("rollingMedian plan: one exchange, no joins (same shape as every " +
    "smoother)") {
    val df = Seq(("s", 1L, 1L)).toDF("k", "id", "v")
    val plan = Smooth.rollingMedian(df, Seq("id"), "v", window = 3,
        seriesCols = Seq("k"))
      .queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("join"), plan)
  }

  test("twap: hold-duration weighting beats the plain mean on irregular " +
    "sampling; single point yields null; one exchange") {
    // value 100 held 3600s, then 200 held 60s, then 300 (no successor)
    val df = Seq(
      ("s", ts("2024-01-01 00:00:00"), 1L, 100L),
      ("s", ts("2024-01-01 01:00:00"), 2L, 200L),
      ("s", ts("2024-01-01 01:01:00"), 3L, 300L),
      ("lone", ts("2024-01-01 00:00:00"), 4L, 42L)
    ).toDF("k", "ts", "id", "v")
    val q = Smooth.twap(df, Seq("ts", "id"), "v", "ts", seriesCols = Seq("k"))
    // pin the STATIC plan before execution (AQE's final plan re-counts
    // stage-boundary exchanges — the ACF lesson)
    val plan0 = q.queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan0).length == 1, plan0)
    val out = q.collect().map(r => r.getString(0) ->
      (r.getLong(1), Option(r.get(r.fieldIndex("twap"))))).toMap
    // (100*3600 + 200*60) / 3660 = 372000/3660; plain mean would say 200
    assert(out("s") == ((3L, Some(372000.0 / 3660.0))), out("s").toString)
    assert(out("lone") == ((1L, None)), "no held interval -> null twap")
  }

  test("maxDrawdown: deepest drop from the running peak, not from the " +
    "global max; rising series draws down zero") {
    // peaks: 10, 10, 50, 50, 50; drawdowns: 0, 5, 0, 45, 20 -> max 45
    val df = Seq(10L, 5L, 50L, 5L, 30L).zipWithIndex
      .map { case (v, i) => ("s", i.toLong, v) }.toDF("k", "id", "v")
    val r = Smooth.maxDrawdown(df, Seq("id"), "v", Seq("k")).head()
    assert(r.getLong(r.fieldIndex("peak")) == 50L)
    assert(r.getLong(r.fieldIndex("max_drawdown")) == 45L)
    val rising = Seq(1L, 2L, 3L).zipWithIndex
      .map { case (v, i) => ("s", i.toLong, v) }.toDF("k", "id", "v")
    val r2 = Smooth.maxDrawdown(rising, Seq("id"), "v", Seq("k")).head()
    assert(r2.getLong(r2.fieldIndex("max_drawdown")) == 0L)
  }

  test("hampel: flags the spike a rolling mean would smear, replaces it " +
    "with the window median, leaves clean points untouched") {
    // steady 10..14 with a 1000-spike at position 3
    val df = Seq(("s", 1L, 10L), ("s", 2L, 11L), ("s", 3L, 1000L),
      ("s", 4L, 12L), ("s", 5L, 13L), ("s", 6L, 14L)).toDF("k", "id", "v")
    val out = Smooth.hampel(df, Seq("id"), "v", window = 5, k = 3,
        seriesCols = Seq("k"))
      .orderBy("id")
      .select("is_outlier", "cleaned", "roll_med", "roll_mad").collect()
    // pos 3 frame [10,11,1000]: med=11, devs |v-11|=[1,0,989], MAD=1,
    // |1000-11|=989 > 3*1 -> outlier, cleaned to 11
    assert(out(2).getBoolean(0), "spike must be flagged")
    assert(out(2).getDouble(1) == 11.0, "spike cleaned to window median")
    assert(out(2).getDouble(2) == 11.0 && out(2).getDouble(3) == 1.0)
    // the spike sits INSIDE later frames but medians shrug it off:
    // pos 5 frame [10,11,1000,12,13]: med=12, devs [2,1,988,0,1], MAD=1,
    // |13-12|=1 <= 3 -> clean
    assert(!out(4).getBoolean(0) && out(4).getDouble(1) == 13.0)
    // even frame at pos 2: [10,11] -> med 10.5, MAD 0.5 (dyadic exact)
    assert(out(1).getDouble(2) == 10.5 && out(1).getDouble(3) == 0.5)
  }

  test("hampel plan: one exchange, no self-join (frame buffered as a " +
    "bounded array, not joined)") {
    val df = Seq(("s", 1L, 1L)).toDF("k", "id", "v")
    val plan = Smooth.hampel(df, Seq("id"), "v", window = 7,
        seriesCols = Seq("k"))
      .queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
    assert(!plan.contains("join"), plan)
  }

  test("acf: linear series -> exactly 1.0, alternating -> exactly -1.0, " +
    "constant -> null; one exchange") {
    val rows =
      (1 to 40).map(i => ("lin", i.toLong, i.toLong)) ++
        (1 to 40).map(i => ("alt", i.toLong, if (i % 2 == 0) 7L else -7L)) ++
        (1 to 40).map(i => ("const", i.toLong, 5L))
    def out = Smooth.acf(rows.toDF("k", "pos", "v"), Seq("pos"), "v",
      maxLag = 2, seriesCols = Seq("k"))
    // pin the static plan BEFORE execution (AQE's final plan re-counts
    // stage-boundary exchanges)
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"lag windows + agg must share one exchange:\n$plan")
    val got = out.collect().map(r => r.getString(0) ->
      (r.get(r.fieldIndex("acf_1")), r.get(r.fieldIndex("acf_2")))).toMap
    assert(got("lin") == ((1.0, 1.0)), "shifted linear is perfectly correlated")
    assert(got("alt") == ((-1.0, 1.0)), "alternating flips at odd lags")
    assert(got("const") == ((null, null)), "zero variance is null, not NaN")
  }

  test("theilSen: immune to the outlier that drags OLS; exact pair count; " +
    "maxPoints caps the fan-out; float input fails loudly") {
    // slope-2 line with one wild spike: OLS bends, Theil–Sen doesn't
    val rows = (1 to 9).map(i =>
      ("u", i.toLong, ts(f"2024-01-01 0$i:00:00"),
        if (i == 5) 1000L else 2L * i))
    val df = rows.toDF("uid", "eid", "t", "y")
    val out = Smooth.theilSen(df, Seq("t", "eid"), "y",
      seriesCols = Seq("uid"))
    val r = out.collect()(0)
    assert(r.getLong(r.fieldIndex("n_pairs")) == 36L) // 9·8/2
    assert(r.getDouble(r.fieldIndex("slope")) == 2.0,
      s"median pair slope must ignore the spike: $r")
    // maxPoints: with a 4-point cap only 6 pairs survive
    val capped = Smooth.theilSen(df, Seq("t", "eid"), "y",
      seriesCols = Seq("uid"), maxPoints = 4).collect()(0)
    assert(capped.getLong(capped.fieldIndex("n_pairs")) == 6L)
    // non-integral value column is rejected, not truncated
    val bad = rows.map { case (u, e, t0, y) => (u, e, t0, y.toDouble) }
      .toDF("uid", "eid", "t", "y")
    intercept[IllegalArgumentException] {
      Smooth.theilSen(bad, Seq("t", "eid"), "y", seriesCols = Seq("uid"))
    }
  }

  test("bollingerBreaches: spike above mu+2sigma flagged, partial frames " +
    "excluded, float input rejected") {
    // window 3: flat 10s then one 100 spike. Frames (10,10,100):
    // mu=40, var=(3*10200-120^2)/9=1800, sigma~42.4 -> 100 < 40+2*42.4?
    // dev = 3*100-120 = 180, dev^2 = 32400, 4*varnum = 4*(3*10200-14400)
    // = 4*16200 = 64800 -> NOT an upper breach at k=2; at k=1 it is.
    val rows = Seq(("u", 1L, 10L), ("u", 2L, 10L), ("u", 3L, 10L),
      ("u", 4L, 100L), ("u", 5L, 10L), ("u", 6L, 10L))
    val df = rows.toDF("uid", "pos", "x")
    val k1 = Smooth.bollingerBreaches(df, Seq("pos"), "x", window = 3,
      k = 1, seriesCols = Seq("uid")).collect().head
    // frames: (10,10,10) flat, (10,10,100) up, (10,100,10) down?,
    // (100,10,10) down? dev(last)=3*10-120=-90, dev^2=8100,
    // varnum=16200 > 8100 -> not flagged at k=1... both spike-adjacent
    // frames have the big varnum, only the spike row itself exceeds 1σ
    assert(k1.getAs[Long]("n_eval") == 4L) // 6 rows - 2 partial frames
    assert(k1.getAs[Long]("n_upper") == 1L, s"spike row breaches at k=1: $k1")
    assert(k1.getAs[Long]("n_lower") == 0L)
    val k2 = Smooth.bollingerBreaches(df, Seq("pos"), "x", window = 3,
      k = 2, seriesCols = Seq("uid")).collect().head
    assert(k2.getAs[Long]("n_upper") == 0L,
      s"a single spike in a 3-frame never exceeds 2 sigma: $k2")
    intercept[IllegalArgumentException] {
      Smooth.bollingerBreaches(rows.map { case (u, p, x) => (u, p, x.toDouble) }
        .toDF("uid", "pos", "x"), Seq("pos"), "x", 3, 2, Seq("uid"))
    }
  }

  test("rsiCutler: monotone-up series pins rsi at 1e6, alternating at " +
    "the gain share; head frames without a full diff count are excluded") {
    val up = (1 to 8).map(i => ("u", i.toLong, 10L * i))
    val r = Smooth.rsiCutler(up.toDF("uid", "pos", "x"), Seq("pos"), "x",
      period = 3, seriesCols = Seq("uid")).collect().head
    // diffs exist from row 2; full 3-diff frames start at row 4 -> 5 eval
    assert(r.getAs[Long]("n_eval") == 5L)
    assert(r.getAs[Long]("n_overbought") == 5L)
    assert(r.getAs[Long]("sum_rsi_ppm") == 5L * 1000000L)
    // alternating +30/-10: each 3-diff frame holds gains 60 losses 10 or
    // gains 30 losses 20 -> rsi in {857142, 600000}
    val alt = Seq(0L, 30L, 20L, 50L, 40L, 70L, 60L).zipWithIndex
      .map { case (x, i) => ("u", i.toLong, x) }
    val a = Smooth.rsiCutler(alt.toDF("uid", "pos", "x"), Seq("pos"), "x",
      period = 3, seriesCols = Seq("uid")).collect().head
    assert(a.getAs[Long]("n_eval") == 4L)
    assert(a.getAs[Long]("n_oversold") == 0L)
    // frames: (+30,-10,+30)=60/70, (-10,+30,-10)=30/50, repeat
    assert(a.getAs[Long]("sum_rsi_ppm") ==
      2L * (60L * 1000000L / 70L) + 2L * (30L * 1000000L / 50L))
  }

  test("pageCusum: hand-stepped alarms with reset; below-reference " +
    "values drain the statistic to zero, never negative") {
    // k=10, h=25. xs: 20,20,20 -> S=10,20,30>25 ALARM reset;
    // then 5,5 -> S stays 0 (drain); then 30,30 -> S=20,40>25 ALARM
    val xs = Seq(20L, 20L, 20L, 5L, 5L, 30L, 30L)
    val df = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) }
      .toDF("uid", "pos", "x")
    val r = Smooth.pageCusum(df, Seq("pos"), "x", k = 10L, h = 25L,
      seriesCols = Seq("uid")).collect().head
    assert(r.getAs[Long]("n") == 7L)
    assert(r.getAs[Long]("n_alarms") == 2L, s"$r")
    assert(r.getAs[Long]("final_s") == 0L) // reset on the last alarm
    assert(r.getAs[Long]("max_s") == 40L)
    // constant at the reference: statistic never accumulates, no alarms
    val flat = Smooth.pageCusum(
      (1 to 5).map(i => ("u", i.toLong, 10L)).toDF("uid", "pos", "x"),
      Seq("pos"), "x", 10L, 25L, Seq("uid")).collect().head
    assert(flat.getAs[Long]("n_alarms") == 0L && flat.getAs[Long]("max_s") == 0L)
  }
}
