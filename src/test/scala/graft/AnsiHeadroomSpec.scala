package graft

import graft.ts.Smooth
import org.apache.spark.sql.functions._

/** The integer-exactness kernels document int64 headroom bounds
  * (rollingAutocorrExact's `n·max(x)² < 2^63`, the cusum/bollinger
  * conventions). This spec makes the ANSI sweep EXPLICIT:
  *
  *  1. the shared test session really runs `spark.sql.ansi.enabled=true`
  *     (Spark 4's default, pinned in TestSpark) — so every green suite in
  *     this repo is evidence that no kernel overflows at test magnitudes;
  *  2. the documented boundary is REAL on both sides: magnitudes inside
  *     the bound evaluate fine, magnitudes beyond it throw
  *     ARITHMETIC_OVERFLOW rather than silently wrapping.
  */
class AnsiHeadroomSpec extends SparkSpec {
  import spark.implicits._

  test("the shared session runs under ANSI (pinned, not inherited)") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("the shared session pins spark.sql.unionOutputPartitioning=false " +
    "(Spark 4.1 union partitioning mis-claim workaround, SCALE.md r7)") {
    // drift guard: with the default (true), a 2-child union can claim a
    // child's hash partitioning while physically holding the SUM of the
    // children's partitions; a downstream sort-merge join then fails with
    // "Can't zip RDDs with unequal numbers of partitions" — reproduced by
    // emb_dbscan at the sf1 scale probe. Bench/Verify pin it in their own
    // builders; this pins the test session so suite green stays evidence.
    assert(spark.conf.get("spark.sql.unionOutputPartitioning") == "false")
  }

  test("rollingAutocorrExact inside the documented headroom: |x| <= 1e6 " +
    "over a long series evaluates under ANSI with exact statistics") {
    // 2000 rows at the documented 1e6-unit magnitude: cumulative x*x sum
    // reaches ~2e15 — far inside 2^63, and ANSI proves it by not throwing
    val rows = (0 until 2000).map(i =>
      ("s", i.toLong, ((i % 97) - 48) * 1000000L / 48))
    val df = rows.toDF("k", "pos", "x")
    val out = Smooth.rollingAutocorrExact(df, Seq("pos"), "x",
      window = 32, seriesCols = Seq("k"))
    assert(out.count() == 2000)
    val vals = out.filter(col("autocorr").isNotNull).count()
    assert(vals > 1900, s"autocorr should exist once frames fill: $vals")
  }

  test("beyond the headroom the ANSI boundary is loud: |x| > sqrt(2^63) " +
    "throws ARITHMETIC_OVERFLOW instead of wrapping") {
    // one value whose square alone exceeds 2^63: 3.1e9^2 = 9.61e18 > 9.22e18
    val df = Seq(("s", 1L, 3100000000L), ("s", 2L, 3100000000L))
      .toDF("k", "pos", "x")
    val e = intercept[Exception] {
      Smooth.rollingAutocorrExact(df, Seq("pos"), "x",
        window = 2, seriesCols = Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow")),
      e.toString)
  }

  /** Evaluate the shared Welch t/df text over LITERAL accumulators — the
    * text is the thing that carried both historical cliffs, so the
    * fixtures drive it directly instead of synthesizing millions of rows.
    */
  private def welchOverAccumulators(
      nA: Long, sA: Long, ssA: Long,
      nB: Long, sB: Long, ssB: Long) = {
    import graft.ops.Behavior
    Seq((nA, sA, ssA, nB, sB, ssB))
      .toDF("n_a", "s_a", "ss_a", "n_b", "s_b", "ss_b")
      .selectExpr(s"${Behavior.WelchVarA} AS var_a", Behavior.WelchT,
        Behavior.WelchDf)
      .collect()(0)
  }

  test("Welch variance survives the old int64 cliff (bug #10): " +
    "n·Σx² ≈ 1.35e25 ≫ 2^63 evaluates exactly via DECIMAL(38,0)") {
    // ss_a at the int64 accumulator ceiling, n in the millions: the
    // retired integer form (n_a * ss_a - s_a * s_a) ANSI-threw here
    val n = 1500000L
    val s = 3000000000000L // mean 2e6 cents
    val ss = 9000000000000000000L // 9e18, just under 2^63
    val row = welchOverAccumulators(n, s, ss, n, s + 1000000L, ss)
    // exact expectation via BigDecimal: (n·ss − s²) / n / (n−1)
    val num = (BigDecimal(n) * BigDecimal(ss) - BigDecimal(s) * BigDecimal(s))
      .toDouble
    val expectVar = num / n / (n - 1)
    assert(math.abs(row.getDouble(0) - expectVar) / expectVar < 1e-12,
      s"var_a=${row.getDouble(0)} expected=$expectVar")
    assert(!row.isNullAt(1) && !row.isNullAt(2), "t/df must be non-null")
  }

  test("Welch variance survives the round-9 cancellation cliff: " +
    "Σx² > 2^53 with tiny variance stays exact (no all-double subtraction)") {
    // 8e6 rows at 1e6 cents, 500 of them off by ±1 (250 each way):
    // Σx² = 8e18 + 500 (> 2^53, ulp at that magnitude = 1024), true
    // variance numerator n·Σx² − (Σx)² = 8e6·500 = 4e9 — but the DOUBLE
    // rounding of Σx² alone perturbs `ss − s·(s/n)` by up to 512·n,
    // comparable to the true value; the decimal form is exact.
    val n = 8000000L
    val s = n * 1000000L // all deviations cancel in the sum
    val ss = 8000000000000000500L // n·(1e6)² + 500
    val row = welchOverAccumulators(n, s, ss, n, s, ss)
    val expectVar = (BigDecimal(n) * BigDecimal(ss) -
      BigDecimal(s) * BigDecimal(s)).toDouble / n / (n - 1)
    assert(expectVar > 0 && expectVar < 1e-4) // genuinely tiny variance
    assert(row.getDouble(0) == expectVar,
      s"var_a=${row.getDouble(0)} expected=$expectVar (must be bit-exact: " +
        "one correctly-rounded cast of an exact integer)")
    // equal groups → t = 0 exactly, not null: se² > 0 because var > 0
    assert(row.getDouble(1) == 0.0)
  }

  test("Mann-Whitney survives the t³ tie cliff: 2.5e6 rows tied on one " +
    "value (Σt³ ≈ 1.6e19 > 2^63 in the retired int64 form)") {
    import graft.ops.Behavior
    // 2.5M rows all valued 0 (one giant tie block) + a spread tail so the
    // rank variance is positive and z is non-null
    val big = spark.range(2500000L)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "0L AS v")
    val tail = spark.range(1000L)
      .selectExpr("CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "id + 1 AS v")
    val out = Behavior.mannWhitneyU(big.union(tail), "g", "a", "b", col("v"))
      .collect()(0)
    val t = 2500000L
    val expectTie = BigDecimal(t) * BigDecimal(t) * BigDecimal(t) - t
    assert(out.getAs[Double]("tie_term") == expectTie.toDouble,
      s"tie_term=${out.getAs[Double]("tie_term")} expected=$expectTie")
    assert(!out.isNullAt(out.fieldIndex("z")), "z must be non-null")
  }

  test("KS cross-product text survives fa·nb > 2^63 over literal ECDF " +
    "accumulators (count-only cliff at ~3e9 rows/arm — data-infeasible, " +
    "so the shared expression is driven directly)") {
    // fa=2e9 of na=3e9 vs fb=1e9 of nb=4e9: fa·nb = 8e18 < 2^63 BUT
    // fb·na... make it cross: fa=3e9·nb=4e9 = 1.2e19 > 2^63
    val row = Seq((3000000000L, 3000000000L, 1000000000L, 4000000000L))
      .toDF("__fa", "__na", "__fb", "__nb")
      .selectExpr(
        "CAST(ABS(CAST(__fa AS DECIMAL(19,0)) * CAST(__nb AS DECIMAL(19,0))" +
          " - CAST(__fb AS DECIMAL(19,0)) * CAST(__na AS DECIMAL(19,0)))" +
          " AS DOUBLE) AS dnum")
      .collect()(0)
    val expect = (BigDecimal(3000000000L) * BigDecimal(4000000000L) -
      BigDecimal(1000000000L) * BigDecimal(3000000000L)).toDouble
    assert(row.getDouble(0) == expect)
  }

  test("chi-squared cell term and exp_ppm survive N ≈ 9e12 marginals " +
    "(the int64 r·c·1e6 crossed 2^63 at N ≈ 3e6 — sf3 sat on the cliff)") {
    import graft.ops.Behavior
    // one synthetic cell at the 9.2e12-event scale: r=2e12, c=3e12, N=9e12
    val df = Seq((1500000000000L, 2000000000000L, 3000000000000L,
        9000000000000L))
      .toDF("o", "r_total", "c_total", "n_total")
      .withColumn("__rc",
        expr("CAST(r_total AS DECIMAL(19,0)) * CAST(c_total AS DECIMAL(19,0))"))
      .selectExpr(
        "(__rc DIV n_total) * 1000000 " +
          "+ (CAST(__rc % n_total AS DECIMAL(19,0)) * 1000000) DIV n_total " +
          "AS exp_ppm",
        s"${Behavior.ChiSqCellU} AS chi2_u")
    val row = df.collect()(0)
    val (o, r, c, n) = (BigInt(1500000000000L), BigInt(2000000000000L),
      BigInt(3000000000000L), BigInt(9000000000000L))
    assert(row.getLong(0) == (r * c * 1000000 / n).toLong)
    // chi2_u expectation: same fixed IEEE sequence over the exact |o·N−r·c|
    val num = (o * n - r * c).abs.toDouble
    val expectChi = math.floor(1e6 * num * num /
      (r.toDouble * c.toDouble * n.toDouble)).toLong
    assert(row.getLong(1) == expectChi)
  }

  test("association-rule lift survives cab·N·1e6 > 2^63 via the decimal " +
    "div/mod split (int64 crossed at ~2000 co-occurrences × 4.5e6 baskets)") {
    import graft.ops.Behavior
    // cab=5e6, N=4e9, ca=6e6, cb=7e6: cab·N·1e6 = 2e22 ≫ 2^63
    val row = Seq((5000000L, 4000000000L, 6000000L, 7000000L))
      .toDF("__cab", "__n", "__ca", "__cb")
      .withColumn("__lnum",
        expr("CAST(__cab AS DECIMAL(19,0)) * CAST(__n AS DECIMAL(19,0))"))
      .withColumn("__lden",
        expr("CAST(__ca AS DECIMAL(19,0)) * CAST(__cb AS DECIMAL(19,0))"))
      .selectExpr(s"${Behavior.LiftPpm} AS lift_ppm")
      .collect()(0)
    val expect = (BigInt(5000000L) * BigInt(4000000000L) * 1000000 /
      (BigInt(6000000L) * BigInt(7000000L))).toLong
    assert(row.getLong(0) == expect, s"${row.getLong(0)} vs $expect")
  }

  test("acf survives n·Σx² > 2^63: 400k rows of ~1e6-unit values " +
    "(the retired int64 Pearson products crossed at ~3e5 rows/series)") {
    // Σx² ≈ 4e17 (inside the accumulator bound) but n·Σx² ≈ 1.6e23 — the
    // old form threw here; sign alternation also exercises the decimal
    // sign trick on the numerator
    val df = spark.range(400000L)
      .selectExpr("'u' AS k", "id AS pos",
        "CASE WHEN id % 2 = 0 THEN 1000000 + id % 97 " +
          "ELSE -(1000000 + id % 89) END AS x")
    val out = Smooth.acf(df, Seq("pos"), "x", maxLag = 2, seriesCols = Seq("k"))
      .collect()(0)
    assert(out.getAs[Long]("n") == 400000L)
    val a1 = out.getAs[Double]("acf_1")
    // strictly alternating signs → strong negative lag-1 autocorrelation
    assert(a1 < -0.9, s"acf_1=$a1")
  }

  test("cusumArgmax boundary is loud and documented: n·Σ|x| past 2^63 " +
    "throws ARITHMETIC_OVERFLOW; just inside evaluates") {
    import graft.ts.Changepoint
    def series(mag: Long) = Seq(
      ("s", 1L, mag), ("s", 2L, mag), ("s", 3L, mag), ("s", 4L, mag))
      .toDF("k", "pos", "x")
    // inside: n·rs = 4·(4·1e18) — wait, per-row 1e18 → s = 4e18, n·rs ≤
    // 4·4e18 = 1.6e19 > 2^63 — so inside must use 5e17: n·rs ≤ 8e18 ✓
    val ok = Changepoint.cusumArgmax(series(500000000000000000L),
      Seq("pos"), "x", Seq("k")).collect()
    assert(ok.length == 1)
    val e = intercept[Exception] {
      Changepoint.cusumArgmax(series(2000000000000000000L),
        Seq("pos"), "x", Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow")), e.toString)
  }

  test("rollingMomentsExact boundary is loud: x⁴ past 2^63 throws; the " +
    "documented (window·max|x|)⁴ bound admits cents-scale windows") {
    val inside = Seq(("s", 1L, 10000L), ("s", 2L, 10200L), ("s", 3L, 9800L))
      .toDF("k", "pos", "x")
    val okRows = Smooth.rollingMomentsExact(inside, Seq("pos"), "x",
      window = 3, seriesCols = Seq("k")).collect()
    assert(okRows.length == 3)
    // one value whose 4th power alone exceeds 2^63: (56k)⁴ ≈ 9.8e18
    val beyond = Seq(("s", 1L, 56000L), ("s", 2L, 56000L))
      .toDF("k", "pos", "x")
    val e = intercept[Exception] {
      Smooth.rollingMomentsExact(beyond, Seq("pos"), "x",
        window = 2, seriesCols = Seq("k")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(m =>
      m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow")), e.toString)
  }

  test("Hurst block variance survives nb·total² > 2^63: concentrated mass " +
    "of 5e8 units (the int64 vnum crossed at total ≈ 1.9e8)") {
    // five rows of 1e8 units in one timestamp cluster: all mass lands in
    // ~one bucket, so ΣS² ≈ total² = 2.5e17 and nb·ΣS² at k=1 (nb=256)
    // ≈ 6.4e19 > 2^63 — the retired int64 numerator threw here
    val rows = (0 until 5).map(i =>
      (java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i"), 100000000L)) ++
      (0 until 4).map(i =>
        (java.sql.Timestamp.valueOf(s"2024-01-0${i + 2} 00:00:00"), 1L))
    val df = rows.toDF("ts", "usd")
    val out = graft.ts.Hurst.aggVar(df, "ts", "usd",
      m = 256, ks = Seq(1, 2, 4, 8, 16)).collect()(0)
    assert(out.getAs[Long]("total_units") == 500000004L)
    val v1 = out.getAs[Double]("vnum_1")
    assert(v1 > 6e19, s"vnum_1=$v1 must exceed the old int64 ceiling")
  }

  test("ppm shares survive cents sums whose x1e6 crosses 2^63 (scale " +
    "finding #18): DECIMAL(38,0) path exact where int64 overflowed") {
    // two groups summing to 9e18 cents (fits int64); share * 1e6 = 4e24
    // does NOT fit — the pre-round-12 int64 form threw at the sf10 sweep
    val df = Seq(("r1", "a", 4000000000000000000L),
      ("r1", "b", 5000000000000000000L)).toDF("r", "n", "rev_cents")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("r")
    val out = df
      .withColumn("tot", sum(col("rev_cents")).over(w))
      .withColumn("share_ppm",
        expr("CAST((CAST(rev_cents AS DECIMAL(38,0)) * 1000000) div tot AS BIGINT)"))
      .orderBy("n").collect()
    assert(out(0).getAs[Long]("share_ppm") == 444444L) // floor(4/9 * 1e6)
    assert(out(1).getAs[Long]("share_ppm") == 555555L)
    // and the boundary is real: the old int64 form throws under ANSI
    val e = intercept[Exception] {
      df.withColumn("tot", sum(col("rev_cents")).over(w))
        .withColumn("share_ppm", expr("(rev_cents * 1000000) div tot"))
        .collect()
    }
    val m = Option(e.getMessage).getOrElse("") + e.toString
    assert(m.contains("ARITHMETIC_OVERFLOW") || m.toLowerCase.contains("overflow"), m)
  }
}
