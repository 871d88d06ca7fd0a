package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winsorization: clamp each series' values to its own discrete
  * [p_lo, p_hi] percentiles — the robust-statistics tail treatment a
  * pipeline applies before means/regressions on heavy-tailed metrics.
  *
  * Percentiles are DISCRETE (the rank-`(q·n+99) div 100` order statistic,
  * the [[graft.ops.HdrHist]] convention): over an integral value column
  * the cut points, clip decisions, and clipped sums are all exact
  * integers — no interpolation, engine-identical.
  *
  * Shape: one keyed sort computes ranks; the per-series cut row (2 longs)
  * is a #series-row aggregate broadcast back onto the rows; the final
  * stats are one map-side-combinable groupBy. Series count bounds the
  * broadcast, not row count.
  */
object Winsorize {

  /** Per-series winsorization report:
    * `(seriesCols…, n, lo_cut, hi_cut, n_clip_lo, n_clip_hi, sum_raw,
    * sum_winsor)` — sums exact int64, cut points the discrete loPct/hiPct
    * order statistics.
    */
  def stats(
      df: DataFrame,
      valueCol: String,
      seriesCols: Seq[String],
      loPct: Int = 5,
      hiPct: Int = 95
  ): DataFrame = {
    require(loPct >= 1 && hiPct <= 100 && loPct < hiPct,
      s"bad percentile pair ($loPct, $hiPct)")
    val x = col(valueCol).cast("long")
    val w = Window.partitionBy(seriesCols.map(col): _*)
    val ranked = df
      .withColumn("__x", x)
      .withColumn("__rn", row_number().over(w.orderBy(x)))
      .withColumn("__n", count(lit(1)).over(w))
    val cuts = ranked
      .groupBy(seriesCols.map(col): _*)
      .agg(
        max(when(col("__rn") === expr(s"($loPct * __n + 99) div 100"), col("__x")))
          .as("lo_cut"),
        max(when(col("__rn") === expr(s"($hiPct * __n + 99) div 100"), col("__x")))
          .as("hi_cut"))
    ranked
      .join(broadcast(cuts), seriesCols)
      .groupBy(seriesCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        max("lo_cut").as("lo_cut"),
        max("hi_cut").as("hi_cut"),
        sum(when(col("__x") < col("lo_cut"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(col("__x") > col("hi_cut"), 1L).otherwise(0L)).as("n_clip_hi"),
        sum(col("__x")).as("sum_raw"),
        sum(greatest(least(col("__x"), col("hi_cut")), col("lo_cut")))
          .as("sum_winsor"))
  }
}
