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
}
