package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle fact tables ONCE at write time so
  * every later equi-join/aggregation on the bucket key is exchange-free.
  * At 100 TB this converts the recurring per-query shuffle of the big fact
  * table into a one-time layout cost — the single highest-leverage storage
  * decision for a star schema.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite
  ): Unit = {
    var w = df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Join two tables bucketed on the same key with the same bucket count:
    * plans as a SortMergeJoin with NO shuffle exchange on either side.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      on: Seq[String]
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
