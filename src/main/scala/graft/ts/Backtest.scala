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
}
