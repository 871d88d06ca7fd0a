package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition, x = trend + seasonal +
  * residual (the moving-average method STL refines; public textbook
  * algorithm):
  *
  *   - trend    = centered rolling mean over an odd `window` (null at the
  *     series edges where the frame is incomplete — the classical
  *     convention, not a shrunk-window estimate);
  *   - seasonal = per-(series, phase) mean of the detrended values, phase
  *     being a caller-supplied expression (hour-of-day, day-of-week, ...);
  *   - residual = detrended − seasonal.
  *
  * Exactness contract (the ts_cusum/rollingAutocorrExact discipline): the
  * value column must be integral (scale to cents first). Then with
  * W = window, n_p = phase-group size:
  *
  *   detrended·W        = x·W − Σ_frame x                  (exact int)
  *   seasonal·(n_p·W)   = Σ_phase (x·W − Σ_frame x)        (exact int)
  *   residual·(n_p·W)   = detrended·W·n_p − seasonal-sum    (exact int)
  *
  * so every output is one exact-integer numerator over one exact-integer
  * denominator — a single engine-identical double divide, no float
  * accumulation anywhere. Headroom: |x|·W·n_p must stay inside int64
  * (1e5-unit values, W=25, 1e9 rows/phase-group still fit).
  *
  * Scale shape: ONE exchange total — the per-series hash partitioning is a
  * subset of the (series, phase) clustering, so the phase window rides the
  * same shuffle as the ordered frame window (spec-pinned). No joins, no
  * driver state.
  */
object Decompose {

  def additive(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      phase: Column,
      window: Int = 25,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    require(window >= 3 && window % 2 == 1,
      s"window must be odd and >= 3 for a centered mean, got $window")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other => throw new IllegalArgumentException(
        s"Decompose.additive needs an integral value column, got $valueCol: " +
          s"$other — scale to integer units first (the cents convention)")
    }
    val h = window / 2
    val wFrame = (if (seriesCols.nonEmpty)
      Window.partitionBy(seriesCols.map(col): _*) else Window.partitionBy())
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(-h, h)
    val x = col(valueCol)
    val full = count(lit(1)).over(wFrame) === window
    // detrended·W, null at edges (kept null through every downstream term)
    val detW = when(full, x * window - sum(x).over(wFrame))
    val wPhase = Window.partitionBy((seriesCols.map(col) :+ phase): _*)
    val step = df
      .withColumn("__detW", detW)
      .withColumn("__np", count(col("__detW")).over(wPhase))
      .withColumn("__sp", sum(col("__detW")).over(wPhase))
    step
      .withColumn("trend",
        when(col("__detW").isNotNull,
          (x * window - col("__detW")).cast("double") / window))
      .withColumn("seasonal",
        when(col("__np") > 0,
          col("__sp").cast("double") / (col("__np") * window).cast("double")))
      .withColumn("residual",
        when(col("__detW").isNotNull && col("__np") > 0,
          (col("__detW") * col("__np") - col("__sp")).cast("double") /
            (col("__np") * window).cast("double")))
      .drop("__detW", "__np", "__sp")
  }

  /** Seasonal-adjusted anomaly detection: decompose via [[additive]], snap
    * the residual to integer micro-units, and flag rows whose |residual|
    * exceeds `k` × the series' mean absolute residual. The comparison is
    * pure integer arithmetic — `|r_u| · n > k · Σ|r_u|` — so the flag is
    * engine-exact (no float threshold, no sqrt).
    *
    * Scale shape: the per-series mean-absolute-residual windows partition
    * by the SAME series key as the decomposition's ordered frame, so the
    * whole operator still costs the one exchange [[additive]] already
    * pays (spec-pinned). Output keeps only flagged rows.
    */
  def seasonalAnomalies(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      phase: Column,
      window: Int = 25,
      seriesCols: Seq[String] = Nil,
      k: Int = 3
  ): DataFrame = {
    val dec = additive(df, orderCols, valueCol, phase, window, seriesCols)
      .withColumn("__ru",
        floor(col("residual") * lit(1e6) + lit(0.5)).cast("long"))
    val wSeries = if (seriesCols.nonEmpty)
      Window.partitionBy(seriesCols.map(col): _*) else Window.partitionBy()
    dec
      .withColumn("__n", count(col("__ru")).over(wSeries))
      .withColumn("__sabs", sum(abs(col("__ru"))).over(wSeries))
      .filter(col("__ru").isNotNull &&
        abs(col("__ru")) * col("__n") > lit(k) * col("__sabs"))
      .withColumn("residual_u", col("__ru"))
      .drop("trend", "seasonal", "residual", "__ru", "__n", "__sabs")
  }
}
