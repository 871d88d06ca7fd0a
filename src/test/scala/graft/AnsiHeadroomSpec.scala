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
}
