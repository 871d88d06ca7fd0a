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
    * reaches every row as a window `min_by` over the SAME keyed
    * partition (no join-back), and segment membership is the
    * lexicographic struct compare both engines define identically.
    *
    * Scale shape: ONE hash exchange on the series key serves BOTH
    * levels — `hashpartitioning(series)` already satisfies the
    * `(series, segment)` clustering every level-2 window requires, so
    * EnsureRequirements inserts only per-partition sorts, never a second
    * shuffle, and the input is scanned once (plan-pinned in
    * ChangepointSpec). The level-1 argmax is broadcast to the rows of
    * its own partition via `min_by(order-tuple, (−|num|, order-tuple))`
    * rather than a one-row-per-series join table; both levels' picks
    * then read off the same spine. Deeper trees iterate the same step.
    */
  def binseg2(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      seriesCols: Seq[String]
  ): DataFrame = {
    require(seriesCols.nonEmpty, "binseg2 needs a series key")
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType ||
        dt == org.apache.spark.sql.types.ShortType,
      s"binseg2 needs an integral value column for exactness, got $dt")
    val x = col(valueCol).cast("long")
    val ord = struct(orderCols.map(col): _*)
    val part = Window.partitionBy(seriesCols.map(col): _*)
    val wRun = part.orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val part2 = Window.partitionBy((seriesCols :+ "__seg").map(col): _*)
    val wRun2 = part2.orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spine = df
      // level 1: totals, running stats, integer CUSUM numerator
      .withColumn("__s", sum(x).over(part))
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__rs", sum(x).over(wRun))
      .withColumn("__rc", count(lit(1)).over(wRun))
      .withColumn("__num", col("__n") * col("__rs") - col("__rc") * col("__s"))
      // the level-1 changepoint's order tuple, known to EVERY row of the
      // partition without a join: min_by over (−|num|, order…) — the
      // ties-to-earliest rule as a lexicographic minimum
      .withColumn("__cp",
        min_by(ord, struct(-abs(col("__num")) +:
          orderCols.map(col): _*)).over(part))
      .withColumn("__seg", when(ord <= col("__cp"), 0).otherwise(1))
      // level 2: the same statistic one key deeper — hash(series) still
      // clusters (series, __seg), so no new exchange appears
      .withColumn("__s2", sum(x).over(part2))
      .withColumn("__n2", count(lit(1)).over(part2))
      .withColumn("__rs2", sum(x).over(wRun2))
      .withColumn("__rc2", count(lit(1)).over(wRun2))
      .withColumn("__num2",
        col("__n2") * col("__rs2") - col("__rc2") * col("__s2"))
      .withColumn("__rk1", row_number().over(part.orderBy(
        abs(col("__num")).desc +: orderCols.map(col(_).asc): _*)))
      .withColumn("__rk2", row_number().over(part2.orderBy(
        abs(col("__num2")).desc +: orderCols.map(col(_).asc): _*)))
      .filter(col("__rk1") === 1 || col("__rk2") === 1)
    // a row can be both the root cp and a half cp — emit one output row
    // per role via a conditional explode, so the spine runs exactly once
    val roles = spine.select(
      (seriesCols ++ orderCols).map(col) :+
        explode(concat(
          when(col("__rk1") === 1,
            array(struct(lit(1).as("level"), lit(-1).as("segment"),
              col("__n").as("n"), col("__rc").as("n_pre"),
              (col("__n") - col("__rc")).as("n_post"),
              col("__rs").as("sum_pre"),
              (col("__s") - col("__rs")).as("sum_post"),
              col("__num").as("cusum_num"))))
            .otherwise(array().cast("array<struct<level:int,segment:int," +
              "n:bigint,n_pre:bigint,n_post:bigint,sum_pre:bigint," +
              "sum_post:bigint,cusum_num:bigint>>")),
          when(col("__rk2") === 1,
            array(struct(lit(2).as("level"), col("__seg").as("segment"),
              col("__n2").as("n"), col("__rc2").as("n_pre"),
              (col("__n2") - col("__rc2")).as("n_post"),
              col("__rs2").as("sum_pre"),
              (col("__s2") - col("__rs2")).as("sum_post"),
              col("__num2").as("cusum_num"))))
            .otherwise(array().cast("array<struct<level:int,segment:int," +
              "n:bigint,n_pre:bigint,n_post:bigint,sum_pre:bigint," +
              "sum_post:bigint,cusum_num:bigint>>")))).as("__r"): _*)
    roles.select(seriesCols.map(col) ++
      Seq(col("__r.level").as("level"), col("__r.segment").as("segment")) ++
      orderCols.map(col) ++
      Seq(col("__r.n").as("n"), col("__r.n_pre").as("n_pre"),
        col("__r.n_post").as("n_post"), col("__r.sum_pre").as("sum_pre"),
        col("__r.sum_post").as("sum_post"),
        col("__r.cusum_num").as("cusum_num")): _*)
  }
}
