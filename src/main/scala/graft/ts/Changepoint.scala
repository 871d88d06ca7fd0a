package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offline changepoint localization: the argmax-|CUSUM| estimator for a
  * single mean shift (Page's statistic / binary-segmentation step 1).
  *
  *   S_t = Σ_{i<=t} (x_i - mean)   ;   cp = argmax_t |S_t|
  *
  * Exactness: over an integral value column the statistic is kept as the
  * common-denominator integer numerator `num_t = n·rs_t − rc_t·s` (where
  * rs/rc are running sum/count and s/n the series totals), so the argmax
  * and every reported sum are exact integers — engine-independent and
  * replayable in ANSI SQL. Headroom bound (the ts_cusum convention):
  * |num| <= 2·n·Σ|x|, so magnitude·length² must stay under 2^63 — at
  * 10^4-unit values that allows ~10^7-row series; larger series should
  * pre-aggregate to coarser bins first (the estimator is bin-invariant for
  * a single shift).
  *
  * Scale: one hash Exchange on the series key serves both the running and
  * the full-partition window plus the argmax pick — no joins, no
  * iteration; state per series is O(1).
  *
  * Reference behavior modeled: none directly (the reference loader stops
  * at gap/continuity QC, time_series_loader/load_file.py:1731-1839); this
  * is the standard next diagnostic over the same ordered frame.
  */
object Changepoint {

  /** One row per series: the changepoint row's order columns plus exact
    * split stats (`n_pre/n_post/sum_pre/sum_post`) and the integer CUSUM
    * numerator `cusum_num` (divide by `n` for the statistic in value
    * units). Ties on |num| resolve to the earliest order position.
    */
  def cusumArgmax(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String] = Nil
  ): DataFrame = {
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
      s"cusumArgmax needs an integral value column for exactness, got $dt " +
        "(pre-scale floats to cents/micro-units like ts_cusum does)")
    val part =
      if (seriesCols.nonEmpty) Window.partitionBy(seriesCols.map(col): _*)
      else Window.partitionBy()
    val wRun = part
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast("long")
    val stats = df
      .withColumn("__s", sum(x).over(part))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__rs", sum(x).over(wRun))
      .withColumn("__rc", count(lit(1)).over(wRun))
      .withColumn("__num", col("__n") * col("__rs") - col("__rc") * col("__s"))
    val pick = part.orderBy(
      abs(col("__num")).desc +: orderCols.map(col(_).asc): _*)
    stats
      .withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(
        seriesCols.map(col) ++ orderCols.map(col) ++ Seq(
          col("__n").as("n"),
          col("__rc").as("n_pre"),
          (col("__n") - col("__rc")).as("n_post"),
          col("__rs").as("sum_pre"),
          (col("__s") - col("__rs")).as("sum_post"),
          col("__num").as("cusum_num")
        ): _*
      )
  }

  /** Two-level binary segmentation: the standard multi-changepoint
    * extension of [[cusumArgmax]] — find the strongest changepoint per
    * series, split there, and find the strongest point inside each half.
    * Up to three changepoints per series, each labeled with its `level`
    * (1 = whole series, 2 = post-split half) and `segment` (−1 for the
    * root, 0/1 for the left/right half).
    *
    * Exactness: identical integer CUSUM statistic at every level (the
    * argmax is over exact int64 `n·runsum − i·total`); the split point
    * joins back by the ORDER key tuple, and segment membership is the
    * lexicographic struct compare both engines define identically.
    *
    * Scale shape: level 1 is [[cusumArgmax]]'s one keyed exchange; the
    * split join is per-series against a one-row-per-series changepoint
    * table; level 2 re-keys on (series, segment) — the same spine, one
    * level deeper. Deeper trees iterate the same two steps.
    */
  def binseg2(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String]
  ): DataFrame = {
    require(seriesCols.nonEmpty, "binseg2 needs a series key")
    val statCols = Seq("n", "n_pre", "n_post", "sum_pre", "sum_post",
      "cusum_num")
    val l1 = cusumArgmax(df, orderCols, valueCol, seriesCols)
    val cp = l1.select(seriesCols.map(col) ++
      orderCols.map(c => col(c).as(s"__cp_$c")): _*)
    val seg = df.join(cp, seriesCols)
      .withColumn("__seg",
        when(struct(orderCols.map(col): _*) <=
          struct(orderCols.map(c => col(s"__cp_$c")): _*), 0).otherwise(1))
      .drop(orderCols.map(c => s"__cp_$c"): _*)
    val l2 = cusumArgmax(seg, orderCols, valueCol, seriesCols :+ "__seg")
    val out1 = l1.select(seriesCols.map(col) ++ Seq(lit(1).as("level"),
      lit(-1).as("segment")) ++ orderCols.map(col) ++ statCols.map(col): _*)
    val out2 = l2.select(seriesCols.map(col) ++ Seq(lit(2).as("level"),
      col("__seg").as("segment")) ++ orderCols.map(col) ++
      statCols.map(col): _*)
    out1.unionByName(out2)
  }
}
