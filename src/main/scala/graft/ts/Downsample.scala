package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M4 visualization-oriented downsampling (Jugel et al., "M4: A
  * Visualization-Oriented Time Series Data Aggregation", VLDB 2014): split
  * the series' time extent into `buckets` equal-width pixel columns and
  * keep, per series per bucket, the first, last, min and max values — the
  * four rows that make a line rendering of the bucket pixel-exact.
  *
  * Scale design: one tiny bounds aggregate (2 values per series — broadcast
  * back), then ONE hash-partitioned groupBy with map-side combine; state per
  * group is four scalars. No sort, no window, no collect. At 100 TB this is
  * the cheapest full-pass shape Spark has.
  *
  * Bucket index uses integer microsecond arithmetic
  * (`(t - tmin) * buckets / (tmax - tmin + 1)`) so engine-independent
  * oracles agree exactly; first/last tie-break on (ts, orderCol) via struct
  * min/max, deterministic when orderCol is unique.
  */
object Downsample {

  def m4(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      buckets: Int,
      seriesCols: Seq[String] = Nil,
      tieCol: Option[String] = None
  ): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val e = unix_micros(col(tsCol))
    val keyCols = seriesCols.map(col)

    val bounds =
      if (seriesCols.nonEmpty)
        df.groupBy(keyCols: _*)
          .agg(min(e).as("__tmin"), max(e).as("__tmax"))
      else
        df.agg(min(e).as("__tmin"), max(e).as("__tmax"))

    // per-series bounds are one row per key: broadcast-join them back
    val withBounds =
      if (seriesCols.nonEmpty)
        df.join(broadcast(bounds), seriesCols)
      else df.crossJoin(broadcast(bounds))

    // double divide + floor (NOT cast-truncate): floor of an identical IEEE
    // double is engine-portable, while BIGINT casts round in some engines
    // and truncate in others
    val bucket =
      floor((e - col("__tmin")) * buckets / (col("__tmax") - col("__tmin") + 1))

    val tie = tieCol.map(col).getOrElse(lit(0L))
    val rec = struct(col(tsCol).as("t"), tie.as("tb"),
      col(valueCol).cast("double").as("v"))

    withBounds
      .withColumn("__bucket", bucket)
      .groupBy((keyCols :+ col("__bucket").as("bucket")): _*)
      .agg(
        min(rec).as("__first"),
        max(rec).as("__last"),
        min(col(valueCol).cast("double")).as("v_min"),
        max(col(valueCol).cast("double")).as("v_max"),
        count(lit(1)).as("n_rows"))
      .select((keyCols :+ col("bucket") :+
        col("__first.t").as("t_first") :+ col("__first.v").as("v_first") :+
        col("__last.t").as("t_last") :+ col("__last.v").as("v_last") :+
        col("v_min") :+ col("v_max") :+ col("n_rows")): _*)
  }
}
