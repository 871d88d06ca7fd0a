package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the reference's headline
    * pipeline (resample_time_series: grid + aggregate + forward-fill) over
    * the events table. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val ev = Queries.table(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts"), col("value"))
    ts.Resample.resampleTimeSeries(
      ev, "ts", frequency = "1h",
      methodResample = Some("mean"), methodFill = Some("ffill"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * training-data pipeline operators). See graft.Queries.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.queries

  /** DuckDB-equivalent SQL for EVERY query (same column names, same
    * rounding) — including the full MinHash/SimHash/LSH pipelines via the
    * portable md5+affine-mod-P hash family, the composite quality score,
    * and the Lloyd-REFINED k-means queries (integer-exact micro-unit sums
    * let `IvfSql.lloydCtes` unroll the rounds in SQL). Zero rows-only
    * entries remain: every name in `queries` has a key here.
    */
  def oracleSql: Map[String, String] = Queries.oracleSql
}
