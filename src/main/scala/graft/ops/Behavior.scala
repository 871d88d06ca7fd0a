package graft.ops

import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams: funnel conversion and cohort
  * retention — the two queries a product-analytics consumer of the
  * reference loader's event frames runs first (ClickHouse `windowFunnel` /
  * Amplitude-style cohorts).
  */
object Behavior {

  /** Earliest-chain funnel: per series, walk `steps` in order taking the
    * EARLIEST event of step i that is strictly later than the chosen
    * event of step i−1; the funnel level is the deepest step whose chain
    * event falls within `window` of the step-1 event.
    *
    * Semantics note: this is the deterministic earliest-chain variant (the
    * chain is unique given the data). ClickHouse's `windowFunnel` searches
    * ALL chains; the earliest chain is the common analytics default and
    * makes every timestamp in the output an exact, oracle-checkable value.
    *
    * Scale shape: `steps.size` window passes over ONE
    * partitionBy(series) exchange (each pass references the previous
    * column, same partitioning), then a per-series dedup that rides the
    * same hash partitioning. State per series is `steps.size` timestamps.
    *
    * Output: (seriesCol, t_1..t_k, level) — one row per series present.
    */
  def windowFunnel(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      window: Duration
  ): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val w = Window.partitionBy(col(seriesCol))
    val withTs = steps.zipWithIndex.foldLeft(df) { case (d, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t_$i")
      d.withColumn(s"t_${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    val wMicros = window.toNanos / 1000L
    // forward fold so the DEEPEST satisfied step ends outermost in the
    // CASE chain (level = max qualifying step, not min)
    val level = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t_${i + 1}").isNotNull &&
        unix_micros(col(s"t_${i + 1}")) - unix_micros(col("t_1")) <= wMicros,
        lit(i + 1)).otherwise(acc)
    }
    withTs
      .select((col(seriesCol) +: steps.indices.map(i => col(s"t_${i + 1}")) :+
        level.as("level")): _*)
      .dropDuplicates(seriesCol)
  }

  /** Cohort retention: bucket time with `bucketOf` (an integral bucket
    * index — month number, week number…), cohort each series by its FIRST
    * active bucket, and report how many series from each cohort are active
    * `k` buckets later, plus retention in ppm of the cohort's size.
    *
    * Scale shape: activity dedups to (series, bucket) with map-side
    * combine; the cohort (one row per series) joins back on the series
    * hash; the final frame is #cohorts × #offsets rows, and the cohort-
    * size window runs over that aggregate, not the data. Retention ppm is
    * exact integer arithmetic.
    *
    * Output: (cohort, k, n_active, retention_ppm).
    */
  def cohortRetention(
      df: DataFrame,
      seriesCol: String,
      bucketOf: org.apache.spark.sql.Column
  ): DataFrame = {
    val active = df
      .select(col(seriesCol).as("__s"), bucketOf.cast("long").as("__b"))
      .distinct()
    val cohort = active.groupBy(col("__s")).agg(min(col("__b")).as("cohort"))
    val byOffset = active
      .join(cohort, Seq("__s"))
      .groupBy(col("cohort"), (col("__b") - col("cohort")).as("k"))
      .agg(count(lit(1)).as("n_active"))
    val wc = Window.partitionBy(col("cohort"))
    byOffset
      .withColumn("__size", max(when(col("k") === 0, col("n_active"))).over(wc))
      .withColumn("retention_ppm",
        expr("n_active * 1000000 div __size"))
      .drop("__size")
  }
}
