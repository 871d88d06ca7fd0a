package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Smoothing / drift analytics over an ordered time axis — the pandas
  * `Series.ewm`, CUSUM change detection, and rolling autocorrelation shapes
  * a time-series consumer of the reference loader reaches for next
  * (reference exposes the raw ordered frame; these are the standard
  * follow-on transforms).
  *
  * Scale design: every operator here is window algebra over ONE
  * (partitionBy(series) orderBy ts) sort — a single shuffle, no UDFs, no
  * iteration. EWMA's recursive definition is re-expressed as a
  * bounded-frame weighted sum (the tail weight below the truncation window
  * is (1-alpha)^W ~ 1e-3 at W=64, alpha=0.1 — and the *adjusted* pandas
  * form is exactly a ratio of these truncated sums), so it stays a
  * per-row, codegen-friendly fold instead of a sequential scan.
  */
object Smooth {

  private def keyedWindow(seriesCols: Seq[String], orderCols: Seq[String]) = {
    val base =
      if (seriesCols.nonEmpty) Window.partitionBy(seriesCols.map(col): _*)
      else Window.partitionBy()
    base.orderBy(orderCols.map(col): _*)
  }

  /** Exponentially weighted moving average, pandas
    * `ewm(alpha=a, adjust=True).mean()` semantics truncated to the last
    * `window` observations:
    *
    *   y_i = sum_{j=0..W-1} (1-a)^j x_{i-j}  /  sum over the same j with
    *         x_{i-j} non-null of (1-a)^j
    *
    * Nulls keep their positional weight but contribute to neither sum
    * (pandas `ignore_na=False`). `orderCols` must make the ordering total
    * (include a unique tiebreaker) or the frame contents are
    * nondeterministic.
    *
    * 100 TB: the bounded ROWS frame means a keyed series never needs more
    * than `window` rows of state; for a single global series, range
    * partition with (window-1)-row overlap (RangeSeries covers the
    * running-frame case; bounded frames would extend it) — or key the data,
    * which a 100 TB series always is in practice.
    */
  def ewma(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      window: Int = 64,
      seriesCols: Seq[String] = Nil,
      outCol: String = "ewma"
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val w = keyedWindow(seriesCols, orderCols).rowsBetween(-(window - 1), 0)
    // collect_list drops nulls, which would shift positional weights; box
    // values in a struct so every frame row survives with its position.
    val boxed = collect_list(struct(col(valueCol).cast("double").as("v")))
      .over(w)
    // one compiled loop per row (graft.functions.EwmaFold) — the HOF fold
    // evaluated interpreted per element, twice per row; the kernel is
    // bit-identical to it (same weights, same left-to-right order;
    // equivalence spec-pinned against [[ewmaHof]])
    df.withColumn(outCol, graft.functions.series.ewma_fold(boxed, alpha))
  }

  /** Reference (HOF) form of [[ewma]]'s fold — kept as the executable
    * equivalence spec for the native kernel, the repo's standard pattern
    * for every native expression.
    */
  private[graft] def ewmaHof(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      alpha: Double,
      window: Int,
      seriesCols: Seq[String],
      outCol: String
  ): DataFrame = {
    val w = keyedWindow(seriesCols, orderCols).rowsBetween(-(window - 1), 0)
    val boxed = collect_list(struct(col(valueCol).cast("double").as("v")))
      .over(w)
    val weightsLit = array(
      (0 until window).map(j => lit(math.pow(1.0 - alpha, j.toDouble))): _*)
    def weightAt(p: Column) =
      element_at(weightsLit, (col("__n") - p + 1).cast("int"))
    df.withColumn("__frame", boxed)
      .withColumn("__n", size(col("__frame")))
      // left-to-right fold in frame order, same IEEE addition sequence as
      // the kernel
      .withColumn(
        "__num",
        aggregate(
          zip_with(col("__frame"), sequence(lit(1), col("__n")),
            (x, p) => when(x.getField("v").isNull, lit(0.0))
              .otherwise(x.getField("v") * weightAt(p))),
          lit(0.0), (acc, x) => acc + x))
      .withColumn(
        "__den",
        aggregate(
          zip_with(col("__frame"), sequence(lit(1), col("__n")),
            (x, p) => when(x.getField("v").isNull, lit(0.0))
              .otherwise(weightAt(p))),
          lit(0.0), (acc, x) => acc + x))
      .withColumn(outCol, when(col("__den") > 0.0, col("__num") / col("__den")))
      .drop("__frame", "__n", "__num", "__den")
  }

  /** CUSUM drift statistic: running sum of deviations from the series mean,
    * `c_i = sum_{j<=i} (x_j - mean(x))`. A sustained level shift makes the
    * statistic trend away from zero — the classic change-point screen.
    *
    * Two window passes (whole-partition mean, then running sum) share one
    * exchange: same partitioning keys, so Catalyst plans a single shuffle.
    */
  def cusum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String] = Nil,
      outCol: String = "cusum"
  ): DataFrame = {
    val wAll =
      if (seriesCols.nonEmpty) Window.partitionBy(seriesCols.map(col): _*)
      else Window.partitionBy()
    val wRun = keyedWindow(seriesCols, orderCols)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val integral = df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (integral) {
      // integer-exact form: c_i = (N * runsum_i - i * S) / N. Every term is
      // integer arithmetic (order-independent, engine-exact); the one double
      // division happens last. The float form instead folds i rounded
      // (x_j - mu) terms, and i*mu lands exactly ON rounding boundaries
      // whenever N divides the scale — fold-order epsilon then decides the
      // side, which no cross-engine check survives.
      df.withColumn("__s", sum(col(valueCol)).over(wAll))
        .withColumn("__n", count(lit(1)).over(wAll))
        .withColumn("__rs", sum(col(valueCol)).over(wRun))
        .withColumn("__rc", count(lit(1)).over(wRun))
        .withColumn(outCol,
          (col("__n") * col("__rs") - col("__rc") * col("__s")).cast("double") /
            col("__n").cast("double"))
        .drop("__s", "__n", "__rs", "__rc")
    } else {
      // float path: explicit sum/count (not avg()) keeps the mean formula
      // identical across engines even when accumulation order differs
      df.withColumn("__mu",
          sum(col(valueCol)).over(wAll).cast("double") /
            count(lit(1)).over(wAll).cast("double"))
        .withColumn(outCol,
          sum(col(valueCol).cast("double") - col("__mu")).over(wRun))
        .drop("__mu")
    }
  }

  /** Rolling lag-1 autocorrelation over a bounded ROWS frame: Pearson
    * corr(x_i, x_{i-1}) across the trailing `window` rows of each series.
    * Degenerate frames (fewer than two lagged pairs, or zero variance)
    * yield null rather than NaN, so downstream filters behave.
    */
  def rollingAutocorr(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      window: Int = 32,
      seriesCols: Seq[String] = Nil,
      outCol: String = "autocorr"
  ): DataFrame = {
    val ordered = keyedWindow(seriesCols, orderCols)
    val framed = ordered.rowsBetween(-(window - 1), 0)
    val c = corr(col(valueCol).cast("double"), col("__lag1")).over(framed)
    df.withColumn("__lag1", lag(col(valueCol).cast("double"), 1).over(ordered))
      .withColumn(outCol, when(isnan(c), lit(null)).otherwise(c))
      .drop("__lag1")
  }

  /** [[rollingAutocorr]] for INTEGRAL inputs, O(1) per row instead of
    * O(window): Spark re-aggregates a bounded `rowsBetween` frame from
    * scratch for every row (no retract support), so windowed `corr` costs
    * O(n·window) per series. Here every frame statistic is the difference
    * of two RUNNING sums (incremental) — sum over [i−W+1, i] =
    * cum_i − cum_{i−W} — and with integer inputs the six sums are EXACT,
    * so Pearson's closed form
    *
    *   (n·Σxu − Σx·Σu) / sqrt((n·Σx² − (Σx)²) · (n·Σu² − (Σu)²))
    *
    * has an exact integer numerator and exact integer variance terms: the
    * doubles are engine-identical without any fold-order caveat (the
    * variance PRODUCT can pass 2^63, so only that multiply happens in
    * doubles). Null when the frame holds fewer than two lagged pairs or
    * either variance is zero. All six running sums and their W-row lags
    * share ONE exchange+sort.
    *
    * Requires an integral value column (use [[rollingAutocorr]] for
    * float inputs) — scale floats to integer units first (e.g. cents),
    * exactly like `cusum`'s integral dispatch.
    *
    * Headroom bound: the CUMULATIVE sums run over the whole partition, so
    * exactness needs `seriesLength · max(x)² < 2^63` — e.g. |x| ≤ 1e6
    * units supports ~9e6 rows/series; |x| ≤ 1e4 supports ~9e10. Beyond
    * that the cumulative x·x sum overflows int64: under Spark 4's ANSI
    * default the query THROWS (loud, AnsiHeadroomSpec pins both sides of
    * the boundary); only legacy `spark.sql.ansi.enabled=false` wraps —
    * where the window DIFFERENCES happen to stay correct
    * (two's-complement subtraction) but the DuckDB oracle promotes to
    * HUGEINT and diverges. For larger magnitudes, sum the bounded ROWS
    * frame directly instead of differencing running sums.
    */
  def rollingAutocorrExact(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      window: Int = 32,
      seriesCols: Seq[String] = Nil,
      outCol: String = "autocorr"
  ): DataFrame = {
    // a double/decimal input would silently truncate under cast("long") and
    // produce a wrong-but-plausible statistic — fail loudly instead
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"rollingAutocorrExact needs an integral value column, got $valueCol: " +
          s"$other — scale to integer units first or use rollingAutocorr")
    }
    val ordered = keyedWindow(seriesCols, orderCols)
    val run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // pair (x, u=lag1); rows with no lagged partner contribute nothing
    val base = df
      .withColumn("__x", col(valueCol).cast("long"))
      .withColumn("__u", lag(col("__x"), 1).over(ordered))
    val ok = col("__u").isNotNull
    val terms = Seq[(String, Column)](
      "n" -> when(ok, 1L).otherwise(0L),
      "x" -> when(ok, col("__x")).otherwise(0L),
      "u" -> when(ok, col("__u")).otherwise(0L),
      "xu" -> when(ok, col("__x") * col("__u")).otherwise(0L),
      "xx" -> when(ok, col("__x") * col("__x")).otherwise(0L),
      "uu" -> when(ok, col("__u") * col("__u")).otherwise(0L))
    val withSums = terms.foldLeft(base) { case (d, (nm, term)) =>
      d.withColumn(s"__c$nm", sum(term).over(run))
        .withColumn(s"__s$nm",
          col(s"__c$nm") - coalesce(lag(col(s"__c$nm"), window).over(ordered), lit(0L)))
    }
    val n = col("__sn")
    val varX = n * col("__sxx") - col("__sx") * col("__sx")
    val varU = n * col("__suu") - col("__su") * col("__su")
    val num = n * col("__sxu") - col("__sx") * col("__su")
    withSums
      .withColumn(outCol,
        when(n >= 2 && varX > 0 && varU > 0,
          num.cast("double") /
            sqrt(varX.cast("double") * varU.cast("double"))))
      .drop(terms.flatMap { case (nm, _) => Seq(s"__c$nm", s"__s$nm") } :+ "__x" :+ "__u": _*)
  }

  /** Rolling skewness and excess kurtosis over a trailing ROWS frame, in
    * the exact-integer [[rollingAutocorrExact]] style: four running power
    * sums (S1..S4 of x, x², x³, x⁴) differenced at the window lag give the
    * frame sums, and the central-moment numerators
    *
    *   M2 = n·S2 − S1²                       (= n  · Σ(x−μ)²)
    *   M3 = n²·S3 − 3n·S1·S2 + 2·S1³         (= n² · Σ(x−μ)³)
    *   M4 = n³·S4 − 4n²·S1·S3 + 6n·S1²·S2 − 3·S1⁴   (= n³ · Σ(x−μ)⁴)
    *
    * are exact int64, so
    *
    *   skew = M3 / M2^{3/2}          (population g1)
    *   kurt = M4 / M2² − 3           (population excess g2)
    *
    * are each ONE fixed IEEE sequence over exact integers (sqrt is
    * correctly rounded) — engine-identical bits, no fold-order caveat.
    * Null while the frame holds < 2 rows or M2 = 0.
    *
    * Requires an integral value column (scale first); skew/kurt are
    * scale-invariant, so coarser integer units change nothing but
    * headroom. Headroom: the M4 terms need (window·max|x|)⁴ < 2^63
    * (window·max|x| ≲ 55k — e.g. 32·1700), and the cumulative S4 needs
    * seriesLength·max(x)⁴ < 2^63; beyond that the same non-ANSI
    * wraparound note as [[rollingAutocorrExact]] applies.
    *
    * Scale shape: all four running sums and their lags share the ONE
    * keyed exchange+sort; O(1) state per row vs Spark's O(window) frame
    * re-aggregation.
    */
  def rollingMomentsExact(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      window: Int = 32,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"rollingMomentsExact needs an integral value column, got $valueCol: " +
          s"$other — scale to integer units first")
    }
    val ordered = keyedWindow(seriesCols, orderCols)
    val run = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = df.withColumn("__x", col(valueCol).cast("long"))
    val terms = Seq[(String, Column)](
      "n" -> lit(1L),
      "s1" -> col("__x"),
      "s2" -> col("__x") * col("__x"),
      "s3" -> col("__x") * col("__x") * col("__x"),
      "s4" -> col("__x") * col("__x") * col("__x") * col("__x"))
    val withSums = terms.foldLeft(base) { case (d, (nm, term)) =>
      d.withColumn(s"__c$nm", sum(term).over(run))
        .withColumn(s"__f$nm",
          col(s"__c$nm") - coalesce(lag(col(s"__c$nm"), window).over(ordered), lit(0L)))
    }
    val n = col("__fn")
    val s1 = col("__fs1"); val s2 = col("__fs2")
    val s3 = col("__fs3"); val s4 = col("__fs4")
    val m2 = n * s2 - s1 * s1
    val m3 = n * n * s3 - lit(3L) * n * s1 * s2 + lit(2L) * s1 * s1 * s1
    val m4 = n * n * n * s4 - lit(4L) * n * n * s1 * s3 +
      lit(6L) * n * s1 * s1 * s2 - lit(3L) * s1 * s1 * s1 * s1
    withSums
      .withColumn("m2_num", m2)
      .withColumn("m3_num", m3)
      .withColumn("m4_num", m4)
      .withColumn("skew",
        when(n >= 2 && m2 > 0,
          col("m3_num").cast("double") /
            (col("m2_num").cast("double") * sqrt(col("m2_num").cast("double")))))
      .withColumn("kurt",
        when(n >= 2 && m2 > 0,
          col("m4_num").cast("double") /
            (col("m2_num").cast("double") * col("m2_num").cast("double")) - 3.0))
      .drop(terms.flatMap { case (nm, _) => Seq(s"__c$nm", s"__f$nm") } :+ "__x": _*)
  }

  /** Rolling median over a trailing ROWS frame — the robust smoother
    * (median filter) that survives the spikes a rolling mean smears.
    * Linear interpolation at even frame sizes (pandas/NumPy default, and
    * DuckDB `median` = `quantile_cont(0.5)`): with integral inputs every
    * median is `k` or `k + 0.5` — a dyadic rational, exact in doubles on
    * any engine.
    *
    * Scale shape: same single keyed exchange+sort as every smoother here;
    * the frame buffer is `window` rows. O(window·log window) per row —
    * fine for the smoothing-scale windows (≤ a few hundred) this targets.
    */
  def rollingMedian(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      window: Int = 5,
      seriesCols: Seq[String] = Nil,
      outCol: String = "roll_median"
  ): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val w = keyedWindow(seriesCols, orderCols).rowsBetween(-(window - 1), 0)
    df.withColumn(outCol,
      percentile(col(valueCol), lit(0.5)).over(w))
  }

  /** Whole-series autocorrelation function: one row per series with
    * `n` and Pearson corr of (x_t, x_{t−k}) for k = 1..`maxLag`
    * (columns `acf_1..acf_maxLag`; null when degenerate — under 2 pairs
    * or zero variance).
    *
    * Exactness: requires an integral value column (the
    * [[rollingAutocorrExact]] convention) — all six sums per lag are
    * exact int64 and the Pearson closed form runs over exact
    * DECIMAL(38,0) products (see [[pearsonExactSql]]): the earlier int64
    * `n·Σx² − (Σx)²` carried a SECOND length factor the accumulator
    * bound misses and crossed 2^63 at ~3e5 rows/series of cents-scale
    * values (the Welch bug-#10 shape, whole-series edition). Headroom
    * now: magnitude²·length < 2^63 (the int64 accumulators), loud.
    * One keyed-window exchange produces every lag column; the groupBy
    * rides the same partitioning.
    */
  def acf(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      maxLag: Int,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32, s"maxLag must be in [1,32], got $maxLag")
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
      s"acf needs an integral value column for exactness, got $dt")
    val w = keyedWindow(seriesCols, orderCols)
    val x = col(valueCol).cast("long")
    val lagged = (1 to maxLag).foldLeft(df.withColumn("__x", x)) { (acc, k) =>
      acc.withColumn(s"__u$k", lag(x, k).over(w))
    }
    val aggCols = Seq(count(lit(1)).as("n")) ++ (1 to maxLag).flatMap { k =>
      val u = col(s"__u$k")
      val m = u.isNotNull
      Seq(
        sum(when(m, 1L).otherwise(0L)).as(s"__n$k"),
        sum(when(m, col("__x")).otherwise(0L)).as(s"__sx$k"),
        sum(when(m, u).otherwise(0L)).as(s"__su$k"),
        sum(when(m, col("__x") * u).otherwise(0L)).as(s"__sxu$k"),
        sum(when(m, col("__x") * col("__x")).otherwise(0L)).as(s"__sxx$k"),
        sum(when(m, u * u).otherwise(0L)).as(s"__suu$k"))
    }
    val grouped = lagged
      .groupBy(seriesCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val withAcf = (1 to maxLag).foldLeft(grouped) { (acc, k) =>
      acc.withColumn(s"acf_$k", expr(pearsonExactSql(
        s"__n$k", s"__sx$k", s"__su$k", s"__sxu$k", s"__sxx$k", s"__suu$k")))
    }
    withAcf.select((seriesCols.map(col) :+ col("n")) ++
      (1 to maxLag).map(k => col(s"acf_$k")): _*)
  }

  /** Pearson correlation closed form over six EXACT INT64 accumulator
    * columns (n, Σx, Σu, Σxu, Σx², Σu²), as engine/oracle-shared SQL text:
    * every `n·Σ·· − Σ·Σ` product runs in DECIMAL(38,0) (no 2^63 cliff —
    * each int64 accumulator fits DECIMAL(19,0), each product DECIMAL(38,0)),
    * the variance terms are non-negative (Cauchy–Schwarz) so their double
    * casts are engine-identical below 2^117, and the SIGNED numerator is
    * negated in decimal before its cast (DuckDB's negative decimal→double
    * double-rounds even below 2^63) with the exact sign reapplied as a
    * double negation. Null when under 2 pairs or either variance is zero.
    */
  def pearsonExactSql(n: String, sx: String, su: String, sxu: String,
      sxx: String, suu: String): String = {
    def d(c: String) = s"CAST($c AS DECIMAL(19,0))"
    val varX = s"(${d(n)} * ${d(sxx)} - ${d(sx)} * ${d(sx)})"
    val varU = s"(${d(n)} * ${d(suu)} - ${d(su)} * ${d(su)})"
    val num = s"(${d(n)} * ${d(sxu)} - ${d(sx)} * ${d(su)})"
    s"""CASE WHEN $n >= 2 AND $varX > 0 AND $varU > 0
       |THEN (CASE WHEN $num < 0 THEN -CAST(-$num AS DOUBLE)
       |      ELSE CAST($num AS DOUBLE) END) /
       |     sqrt(CAST($varX AS DOUBLE) * CAST($varU AS DOUBLE))
       |END""".stripMargin
  }

  /** Time-weighted average (TWAP): each observation is weighted by how
    * long it REMAINED the latest value — Σ xᵢ·(tᵢ₊₁ − tᵢ) / (t_end −
    * t_start), the right mean for irregularly sampled state (a price held
    * for an hour counts 60× one held for a minute, where the plain mean
    * overweights bursts). One row per series: (series…, n, twap).
    *
    * Exactness: with integral values and second-resolution holds, the
    * weighted sum is an exact int64 (headroom |x|·span·rows < 2^63); the
    * single final division is the only float op. The last observation has
    * no successor and carries zero weight (the standard
    * closed-interval-left convention); a single-point series yields null.
    *
    * Scale shape: lead() and the groupBy share one keyed exchange.
    */
  def twap(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      tsCol: String,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
      s"twap needs an integral value column for exactness, got $dt")
    val w = keyedWindow(seriesCols, orderCols)
    val withHold = df
      .withColumn("__t", unix_micros(col(tsCol)))
      .withColumn("__next", lead(col("__t"), 1).over(w))
      .withColumn("__hold", expr("(__next - __t) div 1000000"))
    withHold
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("__hold").isNotNull,
          col(valueCol).cast("long") * col("__hold")).otherwise(0L))
          .as("__wsum"),
        sum(coalesce(col("__hold"), lit(0L))).as("__span"))
      .withColumn("twap",
        when(col("__span") > 0,
          col("__wsum").cast("double") / col("__span")))
      .drop("__wsum", "__span")
  }

  /** Maximum drawdown per series: the deepest drop from a running peak —
    * max over t of (max_{s≤t} x_s − x_t). Returns (series…, n, peak,
    * max_drawdown) in exact integers (pure running-max/min algebra over
    * int64; no float ever appears).
    *
    * Scale shape: the running max and the final aggregate share one keyed
    * exchange (same partitioning), O(1) state per row.
    */
  def maxDrawdown(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
      s"maxDrawdown needs an integral value column, got $dt")
    val w = keyedWindow(seriesCols, orderCols)
      .rowsBetween(Window.unboundedPreceding, 0)
    df.withColumn("__runmax", max(col(valueCol).cast("long")).over(w))
      .withColumn("__dd", col("__runmax") - col(valueCol).cast("long"))
      .groupBy(seriesCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        max(col(valueCol).cast("long")).as("peak"),
        max(col("__dd")).as("max_drawdown"))
  }

  /** Hampel filter — the robust spike detector/cleaner: a point is an
    * outlier when it sits more than `k` window-MADs from the window median
    * (|x − med| > k · MAD over a trailing ROWS frame), and `cleaned`
    * replaces flagged points by that median. The rolling-mean z-score
    * (P6's global cousin) smears around spikes; median/MAD don't.
    *
    * Exactness: requires an integral value column (the
    * [[rollingAutocorrExact]] convention). With n integers, a median is
    * `m` or `m + 0.5`, so `2·median` is an exact integer: the whole test
    * runs in doubled/quadrupled integer units —
    * `2·|2x − med2| > k · mad4` with `med2 = 2·med(frame)` and
    * `mad4 = 2·med(|2v − med2|) = 4·MAD` — and only the reported columns
    * divide back to (dyadic-exact) doubles.
    *
    * Scale shape: one keyed exchange+sort; each row's frame is buffered as
    * a `window`-element array (collect_list over the ROWS frame), sorted
    * per row — O(window·log window)/row, no self-join, no second shuffle.
    * The per-row deviation pass (transform + sort) is array algebra over
    * that bounded buffer, so executor memory is O(window) per row in
    * flight regardless of series length.
    */
  def hampel(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      window: Int = 7,
      k: Int = 3,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(k >= 1, s"k must be >= 1, got $k")
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
      s"hampel needs an integral value column for exactness, got $dt")
    val w = keyedWindow(seriesCols, orderCols).rowsBetween(-(window - 1), 0)
    // 2·median of an integer array, exact: odd n -> 2·middle,
    // even n -> sum of the two middles (element_at is 1-based)
    def twiceMedian(arr: String, n: String): String =
      s"""CASE WHEN $n % 2 = 1
         |THEN 2 * element_at(sort_array($arr), CAST(($n + 1) DIV 2 AS INT))
         |ELSE element_at(sort_array($arr), CAST($n DIV 2 AS INT))
         |   + element_at(sort_array($arr), CAST($n DIV 2 + 1 AS INT))
         |END""".stripMargin
    df.withColumn("__fr", collect_list(col(valueCol).cast("long")).over(w))
      .withColumn("__n", size(col("__fr")))
      .withColumn("__med2", expr(twiceMedian("__fr", "__n")))
      .withColumn("__dev2", expr(s"transform(__fr, v -> abs(2L * v - __med2))"))
      .withColumn("__mad4", expr(twiceMedian("__dev2", "__n")))
      .withColumn("roll_med", col("__med2").cast("double") / 2.0)
      .withColumn("roll_mad", col("__mad4").cast("double") / 4.0)
      .withColumn("is_outlier",
        abs(lit(2L) * col(valueCol).cast("long") - col("__med2")) * 2 >
          lit(k.toLong) * col("__mad4"))
      .withColumn("cleaned",
        when(col("is_outlier"), col("__med2").cast("double") / 2.0)
          .otherwise(col(valueCol).cast("double")))
      .drop("__fr", "__n", "__med2", "__dev2", "__mad4")
  }

  /** Theil–Sen robust trend estimator: the median of all pairwise slopes
    * over the first `maxPoints` row-indexed observations of each series —
    * the outlier-immune alternative to the OLS slope (breakdown point
    * ~29% vs 0%).
    *
    * Scale design: the quadratic pair fan-out runs over the BOUNDED
    * per-series prefix (`maxPoints·(maxPoints−1)/2` pairs) and never
    * leaves its row: ONE keyed exchange (the row_number index) feeds a
    * collect_list on the window's own key (so the aggregation reuses
    * that exchange), and the [[graft.functions.TheilSenStats]] native
    * kernel computes pair slopes + the exact percentile-interpolated
    * median in one compiled loop per series. No self-join, no second
    * aggregation, no interpreted per-pair work — the alternatives both
    * measured badly at sf0.1: nested-`transform` HOFs pay ~µs per
    * interpreted lambda eval (and a `size()` filter gets pushed below
    * the projection, re-evaluating the whole quadratic array), while
    * explode-the-pairs + `percentile` pays ~7× the rest of the plan in
    * the interpreted Percentile aggregate. The kernel is bit-identical
    * to `percentile(slopes, 0.5)` (probed 1500/1500 rows at sf0.1 and
    * 540 ULP-adversarial pairs), so the statistic stays
    * engine-replayable.
    *
    * Output: series cols + `n_pairs` + `slope` (value units per step);
    * series with fewer than two points emit nothing (no pairs exist).
    */
  def theilSen(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String],
      maxPoints: Int = 64
  ): DataFrame = {
    require(seriesCols.nonEmpty, "theilSen needs at least one series column")
    require(maxPoints >= 2 && maxPoints <= 65536,
      s"theilSen maxPoints=$maxPoints out of [2, 65536]: the per-series " +
        "pair fan-out is quadratic and the kernel's Int pair count " +
        "overflows past 65536 points")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => ()
      case other => throw new IllegalArgumentException(
        s"theilSen needs an integral value column (exact pair deltas), got " +
          s"$valueCol: $other — scale to integer units first")
    }
    val w = keyedWindow(seriesCols, orderCols)
    df
      .withColumn("__x", row_number().over(w).cast("long"))
      .filter(col("__x") <= maxPoints)
      // the groupBy key equals the window partition key, so the prefix
      // aggregation reuses the SAME exchange the index pass created
      .groupBy(seriesCols.map(col): _*)
      .agg(array_sort(collect_list(
        struct(col("__x"), col(valueCol).cast("long").as("__y")))).as("__p"))
      .withColumn("__ts", graft.functions.series.theil_sen_stats(col("__p")))
      .filter(col("__ts").isNotNull)
      .select(seriesCols.map(col) :+
        col("__ts.n_pairs").as("n_pairs") :+
        col("__ts.slope").as("slope"): _*)
  }

  /** Bollinger-band breach detection over a trailing ROWS frame: a point
    * breaches the upper band when `x > mu + k*sigma` over the last
    * `window` observations (population sigma, frame including the current
    * row), and symmetrically for the lower band. The float-free form of
    * the test —
    *
    *   x > mu + k·sigma  ⇔  n·x − Σx > 0  ∧  (n·x − Σx)² > k²·(n·Σx² − (Σx)²)
    *
    * — is pure int64 algebra (both sides multiplied through by n²), so the
    * flags are engine-exact; no sigma is ever materialized as a float.
    * Rows without a full frame are excluded from evaluation.
    *
    * Output per series: `(series…, n_eval, n_upper, n_lower, sum_varnum)`
    * where `sum_varnum = Σ (n·Σx² − (Σx)²)` is the exact integer variance
    * numerator total (a drift-sensitive fingerprint of the band widths).
    *
    * Headroom: |x| ≤ 1e5 (cents), window ≤ 64 keeps (n·x − Σx)² ≤ ~4e13
    * and each varnum ≤ ~6.5e12; the varnum SUM tolerates ~1e6 eval rows
    * per series per 2^63 — document larger magnitudes before scaling.
    *
    * Scale shape: one keyed exchange+sort shared by both window sums, then
    * a map-side-combining groupBy on the same key — no second shuffle.
    */
  def bollingerBreaches(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      window: Int,
      k: Int,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    require(k >= 1, s"k must be >= 1, got $k")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => ()
      case other => throw new IllegalArgumentException(
        s"bollingerBreaches needs an integral value column, got $other")
    }
    val w = keyedWindow(seriesCols, orderCols)
      .rowsBetween(-(window - 1), Window.currentRow)
    val x = col(valueCol).cast("long")
    df.withColumn("__s", sum(x).over(w))
      .withColumn("__ss", sum(x * x).over(w))
      .withColumn("__c", count(lit(1)).over(w))
      .filter(col("__c") === window)
      .withColumn("__dev", lit(window.toLong) * x - col("__s"))
      .withColumn("__varnum",
        lit(window.toLong) * col("__ss") - col("__s") * col("__s"))
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_eval"),
        sum(when(col("__dev") > 0 &&
          col("__dev") * col("__dev") > lit(k.toLong * k) * col("__varnum"),
          1L).otherwise(0L)).as("n_upper"),
        sum(when(col("__dev") < 0 &&
          col("__dev") * col("__dev") > lit(k.toLong * k) * col("__varnum"),
          1L).otherwise(0L)).as("n_lower"),
        sum(col("__varnum")).as("sum_varnum"))
  }

  /** Page's CUSUM test — the DECISION form of [[cusum]]: the one-sided
    * statistic `S_t = max(0, S_{t-1} + x_t − k)` accumulates upward drift
    * past the reference `k`; when it crosses the decision interval `h`
    * an alarm fires and the statistic resets. Pure int64 recursion
    * (truncation-free — only adds, max, compares), exactly replayable as
    * a left fold in any engine.
    *
    * Output per series: `(series…, n, n_alarms, final_s, max_s)`.
    *
    * Scale shape: ONE keyed exchange (groupBy collect_list) and an O(n)
    * in-row HOF fold — the [[graft.ts.Backtest.holtForecast]] spine; the
    * state is 3 longs however long the series.
    */
  def pageCusum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      k: Long,
      h: Long,
      seriesCols: Seq[String]
  ): DataFrame = {
    require(h > 0, s"decision interval h must be positive, got $h")
    require(seriesCols.nonEmpty, "pageCusum needs at least one series column")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => ()
      case other => throw new IllegalArgumentException(
        s"pageCusum needs an integral value column, got $other")
    }
    val packed = struct(orderCols.map(col) :+
      col(valueCol).cast("long").as("__x"): _*)
    // state = [S, alarms, maxS]; s' computed once via a nested transform-
    // free CASE (Spark HOF lambdas have no let-binding)
    val fold =
      s"""aggregate(
         |  transform(__s, e -> e.__x),
         |  array(0L, 0L, 0L),
         |  (st, x) -> CASE
         |    WHEN greatest(0L, element_at(st, 1) + x - ${k}L) > ${h}L
         |    THEN array(0L, element_at(st, 2) + 1L,
         |               greatest(element_at(st, 3),
         |                 greatest(0L, element_at(st, 1) + x - ${k}L)))
         |    ELSE array(greatest(0L, element_at(st, 1) + x - ${k}L),
         |               element_at(st, 2),
         |               greatest(element_at(st, 3),
         |                 greatest(0L, element_at(st, 1) + x - ${k}L)))
         |  END)""".stripMargin
    df.groupBy(seriesCols.map(col): _*)
      .agg(array_sort(collect_list(packed)).as("__s"))
      .withColumn("__st", expr(fold))
      .select(seriesCols.map(col) ++ Seq(
        size(col("__s")).cast("long").as("n"),
        element_at(col("__st"), 2).as("n_alarms"),
        element_at(col("__st"), 1).as("final_s"),
        element_at(col("__st"), 3).as("max_s")): _*)
  }

  /** Cutler's RSI (the SMA variant of the relative-strength index) over a
    * trailing `period`-row frame:
    *
    *   gain_t = max(x_t − x_{t-1}, 0),  loss_t = max(x_{t-1} − x_t, 0)
    *   rsi = 100 · Σgain / (Σgain + Σloss)     (over the last `period` diffs)
    *
    * reported in exact integer ppm (`1e6·Σgain div (Σgain+Σloss)`) — both
    * sums are non-negative int64, so Spark's truncating `div` and DuckDB's
    * flooring `//` agree and no float enters the statistic. (Wilder's
    * original smooths with an EWMA recursion; Cutler's form replaces it
    * with the SMA precisely so the statistic is a bounded window sum —
    * the property that also makes it one exchange at scale.)
    *
    * Output per row with a full frame: `(series…, orderCols…, rsi_ppm)`
    * plus the caller aggregates; here we return the per-series summary
    * `(series…, n_eval, n_overbought, n_oversold, sum_rsi_ppm)` with the
    * conventional 70/30 thresholds in ppm. Flat frames (Σgain+Σloss = 0)
    * are neutral 500000 ppm by convention.
    */
  def rsiCutler(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      period: Int,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => ()
      case other => throw new IllegalArgumentException(
        s"rsiCutler needs an integral value column, got $other")
    }
    val wo = keyedWindow(seriesCols, orderCols)
    val wf = wo.rowsBetween(-(period - 1), Window.currentRow)
    val x = col(valueCol).cast("long")
    val d = x - lag(x, 1).over(wo)
    df.withColumn("__g", when(d > 0, d).otherwise(lit(0L)))
      .withColumn("__l", when(d < 0, -d).otherwise(lit(0L)))
      .withColumn("__hasd", when(d.isNotNull, 1L).otherwise(0L))
      .withColumn("__sg", sum(col("__g")).over(wf))
      .withColumn("__sl", sum(col("__l")).over(wf))
      .withColumn("__nd", sum(col("__hasd")).over(wf))
      .filter(col("__nd") === period)
      .withColumn("rsi_ppm",
        when(col("__sg") + col("__sl") === 0, lit(500000L))
          .otherwise(expr("__sg * 1000000 div (__sg + __sl)")))
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_eval"),
        sum(when(col("rsi_ppm") >= 700000L, 1L).otherwise(0L))
          .as("n_overbought"),
        sum(when(col("rsi_ppm") <= 300000L, 1L).otherwise(0L))
          .as("n_oversold"),
        sum(col("rsi_ppm")).as("sum_rsi_ppm"))
  }
}
