package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style date-partitioned layout: materialize an event stream as
  * `outDir/event_date=YYYY-MM-DD/part-*.parquet` so every time-bounded
  * query afterwards prunes to the matching directories BEFORE any I/O —
  * `PartitionFilters` in the scan node, zero rows read outside the range.
  *
  * This is the third leg of the storage story next to [[Bucketing]]
  * (exchange-free joins) and the z-order layout (intra-file skipping):
  * at 100 TB the date partition is what turns "last 7 days" queries from
  * a corpus scan into a 7-directory scan, and it composes with both — a
  * day directory can hold bucketed, z-ordered files.
  *
  * Partition-count discipline: one directory per day keeps the partition
  * count linear in retention (365/year), far under the small-files cliff;
  * sub-day partitioning should come from bucket counts, not more
  * directories.
  */
object PartitionedLayout {

  /** Write `df` date-partitioned on `date(tsCol)` (column `event_date`). */
  def writePartitionedByDay(
      df: DataFrame,
      tsCol: String,
      outDir: String,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode(mode)
      .partitionBy("event_date")
      .parquet(outDir)

  /** Read back a closed day range [from, to] — the filter lands in the
    * scan's `PartitionFilters`, so only matching `event_date=` directories
    * are opened.
    */
  def readDays(spark: SparkSession, dir: String, from: String, to: String): DataFrame =
    spark.read.parquet(dir)
      .filter(col("event_date") >= lit(from) && col("event_date") <= lit(to))
}
