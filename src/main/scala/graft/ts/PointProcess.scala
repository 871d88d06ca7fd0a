package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Self-exciting point-process analytics (Hawkes intensity) — burst
  * detection for event streams: each event bumps the conditional
  * intensity by `alpha` and the bump decays exponentially at rate
  * `1/tauSeconds`, so `lambda(t) = mu + sum_i alpha·exp(-(t-t_i)/tau)`
  * measures how "hot" the process is at each arrival. Clustered arrivals
  * (bursts, cascades) push lambda far above `mu + alpha`; a Poisson
  * stream hovers near it.
  *
  * Reference behavior modeled: none (no point-process plane in the
  * reference); extends the engine's drift/burst family (CUSUM, Page,
  * sessionize) with the standard self-excitation readout.
  */
object PointProcess {

  /** Per-series Hawkes summary in exact integer MICRO-units:
    * the excitation state folds as
    *
    *   decay_u = round(exp(-(t − t_prev)/tau) · 1e6)      (snapped!)
    *   A'      = (A · decay_u) div 1e6                     (pure int64)
    *   lambda_u(event) = mu_u + A'   (before the event's own bump)
    *   A''     = A' + alpha_u
    *
    * Snapping every decay factor to micro-units BEFORE it enters the
    * recursion is what makes the fold engine-exact: a raw chained
    * `exp` fold would compound 1-ulp libm-vs-JVM differences, while a
    * 1e-6-granular factor disagrees only on measure-zero boundary inputs
    * (the cos/sin-snap contract of [[Spectral.periodogram]]).
    *
    * Output: `(series…, n, final_a_u, max_lambda_u, n_hot)` where
    * `n_hot` counts events whose pre-bump intensity exceeded `hotU`.
    *
    * Scale shape: ONE keyed exchange (groupBy collect_list) + an O(n)
    * in-row fold with 4 longs of state — the [[Backtest.holtForecast]]
    * spine.
    */
  def hawkesSummary(
      df: DataFrame,
      tsCol: String,
      orderCols: Seq[String],
      seriesCols: Seq[String],
      muU: Long = 100000L,
      alphaU: Long = 500000L,
      tauSeconds: Long = 3600L,
      hotU: Long = 700000L
  ): DataFrame = {
    require(seriesCols.nonEmpty, "hawkesSummary needs a series key")
    require(tauSeconds > 0 && alphaU > 0)
    val packed = struct(orderCols.map(col) :+
      unix_micros(col(tsCol)).as("__t"): _*)
    // The micro-snapped decay factor round(exp(-Δt/τ)·1e6) depends only on
    // the CONSECUTIVE gap, not on the running state, so it is hoisted out
    // of the fold into one transform over the sorted array: 1 exp() per
    // event. Inlining it in the fold (the pre-round-12 form) evaluated the
    // exp subtree THREE times per event — higher-order-function lambdas
    // get no common-subexpression elimination. Head element carries -1.
    val decs =
      s"""transform(sequence(1, size(__s)),
         |  i -> CASE WHEN i = 1 THEN -1L
         |    ELSE CAST(round(exp(
         |      -((element_at(__s, i).__t - element_at(__s, i - 1).__t)
         |        / 1000000.0) / ${tauSeconds}.0) * 1000000.0, 0) AS BIGINT)
         |    END)""".stripMargin
    // state = [A_u, maxLambda_u, nHot]; the fold consumes ONLY the decay
    // factors (timestamps already did their job in `decs`), and decayed
    // is cheap int64 arithmetic
    val decayed =
      s"""CASE WHEN dec < 0L THEN 0L
         |ELSE (element_at(st, 1) * dec) div 1000000L END""".stripMargin
    val fold =
      s"""aggregate(
         |  __d,
         |  array(0L, 0L, 0L),
         |  (st, dec) -> array(
         |    ($decayed) + ${alphaU}L,
         |    greatest(element_at(st, 2), ${muU}L + ($decayed)),
         |    element_at(st, 3) +
         |      CASE WHEN ${muU}L + ($decayed) > ${hotU}L THEN 1L ELSE 0L END))""".stripMargin
    df.groupBy(seriesCols.map(col): _*)
      .agg(array_sort(collect_list(packed)).as("__s"))
      .withColumn("__d", expr(decs))
      .withColumn("__st", expr(fold))
      .select(seriesCols.map(col) ++ Seq(
        size(col("__s")).cast("long").as("n"),
        element_at(col("__st"), 1).as("final_a_u"),
        element_at(col("__st"), 2).as("max_lambda_u"),
        element_at(col("__st"), 3).as("n_hot")): _*)
  }
}
