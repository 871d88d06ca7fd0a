package graft.ts

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe window algebra for a SINGLE global series (no partition keys).
  *
  * `Window.partitionBy()` puts the whole series in ONE task ("WindowExec: No
  * Partition Defined" — the single-task sort that kills a 100 TB timeline).
  * Keyed series don't need this file: their windows hash-partition and
  * parallelize naturally.
  *
  * The classic two-pass fix implemented here:
  *   1. `repartitionByRange(key)` — time-ordered chunks, each its own task;
  *      per-chunk running aggregates via an ordinary partitioned window;
  *   2. per-chunk BOUNDARY stats (one row per chunk — driver-sized by
  *      construction) are collected, prefix-combined on the driver, and
  *      broadcast-joined back to patch chunk-leading rows.
  *
  * Everything stays declarative DataFrame algebra; the only driver traffic is
  * the O(#partitions) boundary table.
  */
object RangeSeries {

  /** A running last-non-null request: `out` column = last non-null value of
    * `in` at or before the current row in the global `key` ordering.
    */
  final case class Running(out: String, in: Column)

  /** A lag(1) request: `out` = value of `in` on the immediately preceding row
    * in the global `key` ordering (null for the very first row).
    */
  final case class Lagged(out: String, in: Column)

  private def numParts(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** Two-pass global-ordering window computation.
    *
    * @param key     monotone sort key for the GLOBAL ordering (ascending).
    *                Encode compound orderings into one orderable expression
    *                (e.g. `unix_micros(ts) * 2 + side`); descending orderings
    *                negate the key.
    * @param runnings running last-non-null columns to add
    * @param lags     lag(1) columns to add
    * @param rnCol    if set, adds a GLOBAL 1-based row number column
    */
  def withGlobalRunning(
      df: DataFrame,
      key: Column,
      runnings: Seq[Running],
      lags: Seq[Lagged] = Nil,
      rnCol: Option[String] = None
  ): DataFrame = {
    val k = "__rs_k"
    val pid = "__rs_pid"
    val lrn = "__rs_lrn"

    // DETERMINISTIC chunk ids, not spark_partition_id(): the boundary-stats
    // job and the final window job execute the exchange independently, and
    // repartitionByRange re-SAMPLES its boundaries per execution — physical
    // partition ids can disagree between the two jobs (observed: exactly the
    // chunk-boundary rows corrupted). Quantile boundaries are computed ONCE
    // here and baked into the plan as literals, so every job assigns every
    // row the same chunk. Keys fit a double exactly (< 2^53 until year
    // ~2255 in 2*micros), and even past that both jobs compare the same
    // doubles, so assignment stays consistent.
    val keyed = df.withColumn(k, key)
    val n = numParts(df)
    val bounds: Array[Double] =
      if (n <= 1) Array.empty
      else keyed.stat.approxQuantile(k, (1 until n).map(_.toDouble / n).toArray, 0.001)
    val bucket = bounds.distinct.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(k).cast("double") > lit(b), 1).otherwise(0)
    }
    val ranged = keyed
      .withColumn(pid, bucket)
      .repartition(math.max(n, 1), col(pid))
    val w = Window.partitionBy(col(pid)).orderBy(col(k))
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val local0 = runnings.foldLeft(ranged) { (acc, r) =>
      acc.withColumn(r.out, last(r.in, ignoreNulls = true).over(wr))
    }
    val local1 = lags.foldLeft(local0) { (acc, l) =>
      acc.withColumn(l.out, lag(l.in, 1).over(w))
    }
    val local = local1.withColumn(lrn, row_number().over(w))

    // chunk boundary stats: one row per non-empty chunk. max_by with a
    // null-masked key = "value at the last position where in was non-null";
    // plain max_by(in, k) = value on the chunk's last ROW (for lag patching).
    val aggs: Seq[Column] =
      runnings.map(r => max_by(r.in, when(r.in.isNotNull, col(k))).as(s"__last_${r.out}")) ++
        lags.map(l => max_by(l.in, col(k)).as(s"__tail_${l.out}")) :+
        count(lit(1)).as("__cnt")
    // stats run on `ranged` (pre-window) so Spark computes ONE extra shuffle
    // of chunk aggregates, not a second windowed pass
    val statsRows = ranged.groupBy(col(pid))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
      .sortBy(_.getInt(0))

    if (statsRows.isEmpty) {
      // empty input: emit the requested columns as nulls/zeros with the
      // schema the caller expects
      val cleaned = local.drop(k, pid)
      return rnCol.fold(cleaned.drop(lrn))(rc => cleaned.withColumnRenamed(lrn, rc))
    }

    // driver prefix-combine over the tiny per-chunk table
    val spark = df.sparkSession
    val carryRows = scala.collection.mutable.ArrayBuffer.empty[Row]
    val carryVals = Array.fill[Any](runnings.size)(null)
    val prevTail = Array.fill[Any](lags.size)(null)
    var offset = 0L
    statsRows.foreach { r =>
      carryRows += Row.fromSeq(
        r.getInt(0).toLong +: (carryVals.toSeq ++ prevTail.toSeq :+ offset))
      runnings.indices.foreach { i =>
        val v = r.get(1 + i)
        if (v != null) carryVals(i) = v
      }
      lags.indices.foreach { i => prevTail(i) = r.get(1 + runnings.size + i) }
      offset += r.getLong(1 + runnings.size + lags.size)
    }
    val carrySchema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__c_pid", org.apache.spark.sql.types.LongType) +:
        (runnings.map(r => org.apache.spark.sql.types.StructField(
          s"__c_${r.out}", local.schema(r.out).dataType)) ++
          lags.map(l => org.apache.spark.sql.types.StructField(
            s"__c_${l.out}", local.schema(l.out).dataType)) :+
          org.apache.spark.sql.types.StructField("__c_off", org.apache.spark.sql.types.LongType)))
    val carryDf = broadcast(
      spark.createDataFrame(spark.sparkContext.parallelize(carryRows.toSeq, 1), carrySchema))

    val joined = local.join(carryDf, col(pid).cast("long") === col("__c_pid"), "left")
    val patchedRunnings = runnings.foldLeft(joined) { (acc, r) =>
      acc.withColumn(r.out, coalesce(col(r.out), col(s"__c_${r.out}")))
    }
    val patchedLags = lags.foldLeft(patchedRunnings) { (acc, l) =>
      // only the chunk's FIRST row lacks a local lag; a null local lag
      // elsewhere is a genuine null previous value and must stay null
      acc.withColumn(l.out,
        when(col(lrn) === 1, col(s"__c_${l.out}")).otherwise(col(l.out)))
    }
    val withRn = rnCol match {
      case Some(rc) => patchedLags.withColumn(rc, col(lrn) + col("__c_off"))
      case None => patchedLags
    }
    withRn.drop((Seq(k, pid, lrn, "__c_pid", "__c_off") ++
      runnings.map(r => s"__c_${r.out}") ++ lags.map(l => s"__c_${l.out}")): _*)
  }
}
