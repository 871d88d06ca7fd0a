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

  /** The COMPOSED layout: day directories × bucket files in one managed
    * table — `table/event_date=D/part-*_NNNNN.parquet` where NNNNN is the
    * bucket id. A day predicate prunes directories (PartitionFilters) and
    * an equi-join on the bucket key is exchange-free, IN THE SAME PLAN —
    * the two storage levers don't trade off against each other
    * (spec-pinned in LayoutComposeSpec). At 100 TB this is the layout for
    * a fact table queried by time AND joined by key: "last 7 days of
    * events ⋈ users" reads 7 directories and shuffles nothing.
    */
  def writePartitionedBucketed(
      df: DataFrame,
      tsCol: String,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode(mode)
      .partitionBy("event_date")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet").saveAsTable(table)

  /** Day-range read of a composed table ([[writePartitionedBucketed]]). */
  def readDaysTable(spark: SparkSession, table: String, from: String, to: String): DataFrame =
    spark.table(table)
      .filter(col("event_date") >= lit(from) && col("event_date") <= lit(to))
}
