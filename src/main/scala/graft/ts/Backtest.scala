package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling-origin one-step-ahead forecast backtesting: every row in the
  * evaluation region is forecast from data strictly before it, per
  * series, for two baseline models —
  *
  *   naive:  f_t = x_{t-1}
  *   ma(W):  f_t = floor-mean of up to W previous values
  *
  * and scored with MAE and sMAPE. The per-term sMAPE ratio is snapped to
  * integer ppm (`2·|f−x|·10⁶ div (|f|+|x|)`, 0 when both are 0), so every
  * accumulated metric is an EXACT int64 sum — no float fold-order
  * divergence, one final divide per metric. Values must be integral
  * (cents/micro-units) and the floor-mean forecast assumes them
  * non-negative (floor == truncation).
  *
  * Scale: pure window algebra over one keyed sort — single exchange, O(W)
  * state per row, then a map-side-combinable groupBy. Forecast leakage is
  * impossible by construction: every frame ends at `-1 PRECEDING`.
  *
  * Reference behavior modeled: none (the loader feeds forecasting
  * pipelines; this is the evaluation harness they bolt on first).
  */
object Backtest {

  /** Per-series exact metric sums over the eval region:
    * `(seriesCols…, n_eval, sum_ae_naive, sum_ae_ma, sum_smape_naive_ppm,
    * sum_smape_ma_ppm)`. Eval rows are those matching `evalMask` that
    * have at least one prior observation.
    */
  def oneStepAhead(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      evalMask: Column,
      maWindow: Int,
      seriesCols: Seq[String]
  ): DataFrame = {
    require(maWindow >= 1, s"maWindow must be >= 1, got $maWindow")
    val w = Window
      .partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("long")
    def smapeTerm(fCol: String): Column = {
      val f = col(fCol)
      when(abs(f) + abs(col("__xv")) === 0, 0L)
        .otherwise(expr(s"(2 * abs($fCol - __xv) * 1000000) div " +
          s"(abs($fCol) + abs(__xv))"))
    }
    val prepared = df
      .withColumn("__xv", x)
      .withColumn("__f_naive", lag(x, 1).over(w))
      .withColumn("__ps", sum(x).over(w.rowsBetween(-maWindow, -1)))
      .withColumn("__pc", count(lit(1)).over(w.rowsBetween(-maWindow, -1)))
      .withColumn("__f_ma", expr("__ps div __pc"))
      .filter(evalMask && col("__f_naive").isNotNull)
    prepared
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_eval"),
        sum(abs(x - col("__f_naive"))).as("sum_ae_naive"),
        sum(abs(x - col("__f_ma"))).as("sum_ae_ma"),
        sum(smapeTerm("__f_naive")).as("sum_smape_naive_ppm"),
        sum(smapeTerm("__f_ma")).as("sum_smape_ma_ppm"))
  }

  /** [[oneStepAhead]]'s third model: simple exponential smoothing.
    * `f_t = EWMA(alpha, adjust)` over the frame ending at `-1 PRECEDING`
    * (leakage-impossible by the same construction), snapped to the
    * integer unit grid (`floor(ewma + 0.5)`) so the error sums stay
    * exact int64. The EWMA itself is the [[Smooth.ewma]] kernel — a
    * bit-identical fold in any engine — and the snap removes even its
    * terminal-digit exposure from the metrics.
    *
    * Output: `(seriesCols…, n_eval, sum_ae_naive, sum_ae_ses,
    * sum_smape_naive_ppm, sum_smape_ses_ppm)`.
    */
  def oneStepAheadSes(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      evalMask: Column,
      alpha: Double,
      window: Int,
      seriesCols: Seq[String]
  ): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    require(window >= 1, s"window must be >= 1, got $window")
    val w = Window
      .partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("long")
    def smapeTerm(fCol: String): Column = {
      val f = col(fCol)
      when(abs(f) + abs(col("__xv")) === 0, 0L)
        .otherwise(expr(s"(2 * abs($fCol - __xv) * 1000000) div " +
          s"(abs($fCol) + abs(__xv))"))
    }
    val boxed = collect_list(struct(x.cast("double").as("v")))
      .over(w.rowsBetween(-window, -1))
    val prepared = df
      .withColumn("__xv", x)
      .withColumn("__f_naive", lag(x, 1).over(w))
      .withColumn("__f_ses",
        floor(graft.functions.series.ewma_fold(boxed, alpha) + 0.5)
          .cast("long"))
      .filter(evalMask && col("__f_naive").isNotNull)
    prepared
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_eval"),
        sum(abs(x - col("__f_naive"))).as("sum_ae_naive"),
        sum(abs(x - col("__f_ses"))).as("sum_ae_ses"),
        sum(smapeTerm("__f_naive")).as("sum_smape_naive_ppm"),
        sum(smapeTerm("__f_ses")).as("sum_smape_ses_ppm"))
  }

  /** Holt double-exponential smoothing (level + trend) with h-step linear
    * forecasts — integer-exact: alpha = aTenths/10, beta = bTenths/10 as
    * rationals, every state update pure int64 with truncating division
    * (Spark `div` and DuckDB `//` both truncate toward zero, so the fold
    * is engine-identical — no float ever enters the recursion).
    *
    *   l_1 = x_1, b_1 = 0
    *   l_t = (a·x_t + (10−a)·(l+b)) div 10
    *   b_t = (β·(l_t − l) + (10−β)·b) div 10
    *   forecast_h = l_n + h·b_n
    *
    * Scale shape: ONE keyed exchange (groupBy collect_list); the
    * recursion is an O(n) in-row HOF fold over the sorted series — no
    * window machinery, no per-step pass. Headroom: every intermediate is
    * ≤ ~10·max(|x|,|l|,|b|), so cents magnitudes are safe to ~10^17.
    */
  def holtForecast(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String],
      aTenths: Int = 2,
      bTenths: Int = 3,
      horizon: Int = 3
  ): DataFrame = {
    require(aTenths >= 1 && aTenths <= 10, s"aTenths in [1,10], got $aTenths")
    require(bTenths >= 0 && bTenths <= 10, s"bTenths in [0,10], got $bTenths")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case dt => throw new IllegalArgumentException(
        s"holtForecast needs an integral value column (scale to cents first), " +
          s"got $valueCol: $dt")
    }
    val ordFields = orderCols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__o$i")
    }
    val packed = struct((ordFields :+ col(valueCol).cast("long").as("__x")): _*)
    val a = aTenths; val na = 10 - aTenths
    val b = bTenths; val nb = 10 - bTenths
    // (see also holtWinters below for the seasonal extension)
    // l' appears in both fields; inlined twice so the lambda stays a pure
    // expression (the duplicated subtree is int ops, not the data pass)
    val lNext = s"(($a * e.__x + $na * (acc.l + acc.b)) div 10)"
    val fold =
      s"""aggregate(
         |  slice(__s, 2, size(__s) - 1),
         |  named_struct('l', element_at(__s, 1).__x, 'b', CAST(0 AS BIGINT)),
         |  (acc, e) -> named_struct(
         |    'l', $lNext,
         |    'b', ($b * ($lNext - acc.l) + $nb * acc.b) div 10))""".stripMargin
    df.groupBy(seriesCols.map(col): _*)
      .agg(array_sort(collect_list(packed)).as("__s"))
      .withColumn("__st", expr(fold))
      .select(seriesCols.map(col) ++ Seq(
        size(col("__s")).cast("long").as("n_obs"),
        col("__st.l").as("level"),
        col("__st.b").as("trend")) ++
        (1 to horizon).map(h =>
          (col("__st.l") + lit(h.toLong) * col("__st.b")).as(s"forecast_$h")): _*)
  }

  /** Holt–Winters additive triple exponential smoothing in pure int64 —
    * [[holtForecast]] plus a rotating length-`period` seasonal queue
    * (rational tenths coefficients, truncating div, so the whole state
    * trajectory replays in any engine):
    *
    *   l_0 = (Σ first m x) div m,  b_0 = 0,  s_i = x_i − l_0  (i ≤ m)
    *   l_t = (a·(x_t − s_{t−m}) + (10−a)·(l+b)) div 10
    *   b_t = (β·(l_t − l) + (10−β)·b) div 10
    *   s_t = (γ·(x_t − l_t) + (10−γ)·s_{t−m}) div 10
    *   forecast_h = l + h·b + s[((h−1) mod m) + 1]
    *
    * State rides the fold as one long array `[l, b, s_next … s_last]`
    * with the seasonal queue rotating each step, so the head is always
    * the s_{t−m} the step needs. Same scale shape as Holt: ONE keyed
    * exchange, O(n) in-row fold. Series shorter than m+1 return the
    * initialization state unchanged (the fold body never runs).
    */
  def holtWinters(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String],
      period: Int,
      aTenths: Int = 3,
      bTenths: Int = 1,
      gTenths: Int = 2,
      horizon: Int = 3
  ): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    require(Seq(aTenths, bTenths, gTenths).forall(t => t >= 0 && t <= 10),
      s"coefficients are tenths in [0,10]")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case dt => throw new IllegalArgumentException(
        s"holtWinters needs an integral value column (scale to cents first), " +
          s"got $valueCol: $dt")
    }
    val m = period
    val ordFields = orderCols.zipWithIndex.map { case (c, i) =>
      col(c).as(s"__o$i")
    }
    val packed = struct((ordFields :+ col(valueCol).cast("long").as("__x")): _*)
    val a = aTenths; val na = 10 - aTenths
    val b = bTenths; val nb = 10 - bTenths
    val g = gTenths; val ng = 10 - gTenths
    // l0 inlined twice in the init (pure int subtrees, not data passes)
    val l0 = s"(aggregate(slice(__xs, 1, $m), 0L, (p, q) -> p + q) div ${m}L)"
    // l' appears in b' and s' — inlined, same convention as holtForecast
    val lN = s"(($a * (e.__x - element_at(st, 3)) + $na * " +
      s"(element_at(st, 1) + element_at(st, 2))) div 10)"
    val fold =
      s"""aggregate(
         |  slice(__s, ${m + 1}, greatest(size(__s) - $m, 0)),
         |  concat(array($l0, 0L),
         |    transform(slice(__xs, 1, $m), x -> x - $l0)),
         |  (st, e) -> concat(
         |    array($lN,
         |          ($b * ($lN - element_at(st, 1)) + $nb * element_at(st, 2))
         |            div 10),
         |    slice(st, 4, ${m - 1}),
         |    array(($g * (e.__x - $lN) + $ng * element_at(st, 3)) div 10)))"""
        .stripMargin
    df.groupBy(seriesCols.map(col): _*)
      .agg(array_sort(collect_list(packed)).as("__s"))
      .filter(size(col("__s")) >= m)
      .withColumn("__xs", expr("transform(__s, e -> e.__x)"))
      .withColumn("__st", expr(fold))
      .select(seriesCols.map(col) ++ Seq(
        size(col("__s")).cast("long").as("n_obs"),
        element_at(col("__st"), 1).as("level"),
        element_at(col("__st"), 2).as("trend")) ++
        (1 to horizon).map(h =>
          (element_at(col("__st"), 1) +
            lit(h.toLong) * element_at(col("__st"), 2) +
            element_at(col("__st"), 3 + ((h - 1) % m))).as(s"forecast_$h")): _*)
  }

  /** AR(2) least-squares fit per series (no intercept): minimize
    * Σ (y_t − φ₁·y_{t-1} − φ₂·y_{t-2})² over the rows with both lags,
    * solved by the 2×2 normal equations via Cramer's rule:
    *
    *   φ₁ = (Σy·l₁·Σl₂² − Σy·l₂·Σl₁l₂) / det
    *   φ₂ = (Σy·l₂·Σl₁² − Σy·l₁·Σl₁l₂) / det,  det = Σl₁²·Σl₂² − (Σl₁l₂)²
    *
    * All five moment sums are EXACT int64 over integral inputs; the
    * determinant products would overflow int64 at cents magnitudes, so
    * the solve runs in doubles over those exact sums with a FIXED IEEE op
    * order (cast → multiply → subtract → divide, the periodogram-power
    * contract) — bit-identical in any engine, replayable in SQL.
    * Zero/negative-degenerate determinants (constant or too-short series)
    * yield null coefficients. Also emits the 1-step forecast
    * `floor(φ₁·yₙ + φ₂·yₙ₋₁ + 0.5)` snapped to the integer unit grid.
    *
    * Scale shape: two lags + one map-side-combined groupBy on the series
    * key — the one-exchange smoother spine; the final-row lookup rides
    * the same window (no second pass).
    */
  def ar2Fit(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String]
  ): DataFrame = {
    require(seriesCols.nonEmpty, "ar2Fit needs at least one series column")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType => ()
      case other => throw new IllegalArgumentException(
        s"ar2Fit needs an integral value column for exact moments, got $other")
    }
    val w = Window
      .partitionBy(seriesCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("long")
    val prepared = df
      .withColumn("__y", x)
      .withColumn("__l1", lag(x, 1).over(w))
      .withColumn("__l2", lag(x, 2).over(w))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(seriesCols.map(col): _*)
          .orderBy(orderCols.map(c => col(c).desc): _*)))
    val m = prepared
      .groupBy(seriesCols.map(col): _*)
      .agg(
        sum(when(col("__l2").isNotNull, 1L).otherwise(0L)).as("n_eval"),
        sum(when(col("__l2").isNotNull, col("__l1") * col("__l1"))
          .otherwise(0L)).as("__s11"),
        sum(when(col("__l2").isNotNull, col("__l1") * col("__l2"))
          .otherwise(0L)).as("__s12"),
        sum(when(col("__l2").isNotNull, col("__l2") * col("__l2"))
          .otherwise(0L)).as("__s22"),
        sum(when(col("__l2").isNotNull, col("__y") * col("__l1"))
          .otherwise(0L)).as("__sy1"),
        sum(when(col("__l2").isNotNull, col("__y") * col("__l2"))
          .otherwise(0L)).as("__sy2"),
        max(when(col("__rn") === 1, col("__y"))).as("__last1"),
        max(when(col("__rn") === 2, col("__y"))).as("__last2"))
    // fixed IEEE op order: every engine computes the same doubles from the
    // same exact integer sums
    m.withColumn("__det",
        col("__s11").cast("double") * col("__s22").cast("double") -
          col("__s12").cast("double") * col("__s12").cast("double"))
      .withColumn("phi1_raw",
        when(col("__det") =!= 0.0,
          (col("__sy1").cast("double") * col("__s22").cast("double") -
            col("__sy2").cast("double") * col("__s12").cast("double")) /
            col("__det")))
      .withColumn("phi2_raw",
        when(col("__det") =!= 0.0,
          (col("__sy2").cast("double") * col("__s11").cast("double") -
            col("__sy1").cast("double") * col("__s12").cast("double")) /
            col("__det")))
      .withColumn("forecast_next",
        when(col("__det") =!= 0.0,
          floor(col("phi1_raw") * col("__last1").cast("double") +
            col("phi2_raw") * col("__last2").cast("double") + 0.5)
            .cast("long")))
      // + 0.0 normalizes IEEE -0.0 after the round (a tiny negative phi
      // rounding to zero must hash like the oracle's +0.0 — the
      // ts_rolling_autocorr signed-zero lesson, pinned by OracleParitySpec)
      .select(seriesCols.map(col) ++ Seq(col("n_eval"),
        (round(col("phi1_raw"), 6) + lit(0.0)).as("phi1"),
        (round(col("phi2_raw"), 6) + lit(0.0)).as("phi2"),
        col("forecast_next")): _*)
  }

  /** Seasonal-naive vs naive 1-step backtest over a REGULAR grid: the
    * seasonal model forecasts `x_{t-period}` (same slot last season), the
    * baseline forecasts `x_{t-1}`. Eval rows are those where BOTH lags
    * exist — the models are compared on an identical eval set. Metrics are
    * the [[oneStepAhead]] family's exact int64 sums (absolute error and
    * sMAPE in ppm), so the whole comparison replays in SQL.
    *
    * The input must be one row per grid slot (resample first — this is
    * the grid-worthy member of the family; on an irregular event sequence
    * "one season ago" has no meaning). `orderCols` orders the grid.
    *
    * Scale shape: two lags over one keyed exchange+sort, then a map-side
    * combining groupBy on the same key. With no series columns the window
    * is global — acceptable only because the input is an already
    * aggregated grid, bounded by the time span, not the data.
    */
  def oneStepAheadSeasonal(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      period: Int,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val w =
      (if (seriesCols.nonEmpty) Window.partitionBy(seriesCols.map(col): _*)
       else Window.partitionBy()).orderBy(orderCols.map(col): _*)
    val x = col(valueCol).cast("long")
    def smapeTerm(fCol: String): Column = {
      val f = col(fCol)
      when(abs(f) + abs(col("__xv")) === 0, 0L)
        .otherwise(expr(s"(2 * abs($fCol - __xv) * 1000000) div " +
          s"(abs($fCol) + abs(__xv))"))
    }
    val prepared = df
      .withColumn("__xv", x)
      .withColumn("__f_naive", lag(x, 1).over(w))
      .withColumn("__f_seas", lag(x, period).over(w))
      .filter(col("__f_naive").isNotNull && col("__f_seas").isNotNull)
    val grouped =
      if (seriesCols.nonEmpty) prepared.groupBy(seriesCols.map(col): _*)
      else prepared.groupBy()
    grouped.agg(
      count(lit(1)).as("n_eval"),
      sum(abs(x - col("__f_naive"))).as("sum_ae_naive"),
      sum(abs(x - col("__f_seas"))).as("sum_ae_seasonal"),
      sum(smapeTerm("__f_naive")).as("sum_smape_naive_ppm"),
      sum(smapeTerm("__f_seas")).as("sum_smape_seasonal_ppm"))
  }
}
