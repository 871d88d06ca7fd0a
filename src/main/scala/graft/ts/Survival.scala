package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over event streams — the
  * right-censoring-aware retention curve (plain "x% of users lasted t
  * days" silently treats still-active users as churned; KM removes them
  * from the risk set instead).
  *
  * Reference behavior modeled: none (the reference has no survival
  * plane); this extends the engine's A/B-analytics family
  * (Welch/Mann-Whitney/KS) with the standard time-to-event readout.
  */
object Survival {

  /** KM estimator over per-subject lifetimes:
    *
    *   duration = floor days between a subject's first and last event;
    *   a subject is CENSORED (still alive) when its last event falls at
    *   or after `censorCutoff`, a DEATH otherwise.
    *   S(t) = Π_{s ≤ t, d_s > 0} (1 − d_s / n_s),
    *   n_s = subjects with duration ≥ s (the risk set).
    *
    * Exactness: the product is carried in micro-nat LOG units —
    * `surv_logu(t) = Σ lnU(n_s − d_s) − lnU(n_s)` with
    * `lnU(k) = round(ln(k)·1e6)` of exact integer counts — an exact int64
    * running sum (the engine's standard dodge of float product
    * fold-order); the reported `survival` is one `exp` of that exact sum.
    * Output one row per duration with at least one death:
    * `(t_days, n_risk, n_events, n_censored, surv_logu, survival)`.
    *
    * Scale shape: per-subject lifetimes are one map-side-combined
    * groupBy; the life table aggregates to DISTINCT durations (bounded by
    * the observation span in days, not by subjects), so the cumulative
    * windows run over a days-sized frame.
    */
  def kaplanMeier(
      df: DataFrame,
      subjectCol: String,
      tsCol: String,
      censorCutoff: Column
  ): DataFrame = {
    val spans = df
      .groupBy(col(subjectCol))
      .agg(min(col(tsCol)).as("__first"), max(col(tsCol)).as("__last"))
      .select(
        expr("(unix_micros(__last) - unix_micros(__first)) div 86400000000")
          .as("t_days"),
        when(col("__last") >= censorCutoff, 1L).otherwise(0L).as("__cens"))
    val lifeTable = spans
      .groupBy(col("t_days"))
      .agg(
        sum(lit(1L) - col("__cens")).as("n_events"),
        sum(col("__cens")).as("n_censored"))
    val wOrd = Window.orderBy(col("t_days"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def lnU(c: Column): Column =
      round(log(c.cast("double")) * 1e6, 0).cast("long")
    lifeTable
      .withColumn("__total",
        sum(col("n_events") + col("n_censored"))
          .over(Window.partitionBy(lit(1))))
      .withColumn("__before",
        coalesce(sum(col("n_events") + col("n_censored"))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_risk", col("__total") - col("__before"))
      // a duration where EVERY at-risk subject dies sends the product to
      // exactly zero — representable in no log unit (ln 0): carry it as a
      // sticky flag instead, so neither engine ever evaluates ln(0)
      .withColumn("__dead",
        max(when(col("n_events") === col("n_risk"), 1L).otherwise(0L))
          .over(wCum))
      .withColumn("__step",
        when(col("n_events") > 0 && col("n_events") < col("n_risk"),
          lnU(col("n_risk") - col("n_events")) - lnU(col("n_risk")))
          .otherwise(lit(0L)))
      .withColumn("surv_logu",
        when(col("__dead") === 0, sum(col("__step")).over(wCum)))
      .filter(col("n_events") > 0)
      .withColumn("survival",
        when(col("__dead") === 1, lit(0.0))
          .otherwise(
            round(exp(col("surv_logu").cast("double") / 1e6), 6) + lit(0.0)))
      .select("t_days", "n_risk", "n_events", "n_censored", "surv_logu",
        "survival")
  }
}
