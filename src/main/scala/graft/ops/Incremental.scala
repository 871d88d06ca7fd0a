package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a per-group STATE table
  * (count / sum / min / max / sum-of-squares), fold each new batch in by
  * merging states, and finalize mean/variance on read. At 100 TB this is
  * the difference between re-scanning the standing corpus per batch and
  * shuffling only `groups × 5` longs — the same partial-aggregate algebra
  * Spark runs map-side, lifted to a durable table (and the batch-plane
  * twin of the streaming plane's stateful aggregations).
  *
  * Exactness: over an integral value column every state field is an exact
  * int64, so merge order can never change a result and the DuckDB oracle
  * can replay finalize bit-for-bit. Headroom: `Σv²` must fit int64 —
  * magnitude²·rows < 2^63 (whole-dollar units give ~10^8 rows of 10^5.5
  * values; switch to a wider unit, or per-shard states finalized with
  * compensated mergeing, beyond that).
  *
  * Reference behavior modeled: the reference recomputes its per-file
  * stats report from scratch each run (time_series_loader's validation
  * summaries); this is the incremental-refresh extension of that report.
  */
object Incremental {

  /** Partial-agg state per group: `(groupCols…, n, sum_v, min_v, max_v,
    * sum_sq)`. Map-side combinable; requires an integral value column.
    */
  def aggState(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String
  ): DataFrame = {
    val v = col(valueCol).cast("long")
    df.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(v).as("sum_v"),
        min(v).as("min_v"),
        max(v).as("max_v"),
        sum(v * v).as("sum_sq"))
  }

  /** Merge state tables: counts/sums add, min/max combine; groups present
    * on only one side pass through (union + re-aggregate).
    */
  def mergeState(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(
        sum("n").as("n"),
        sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"),
        max("max_v").as("max_v"),
        sum("sum_sq").as("sum_sq"))

  /** Finalize: adds `mean` and population `variance`. Divide-FIRST form
    * (`Σv²/n − (Σv/n)²` rather than the exact-integer numerator
    * `n·Σv² − (Σv)²`): the integer form overflows int64 once
    * rows·magnitude² passes 2^63 (sf0.1 orders already does), while this
    * is a fixed sequence of IEEE ops over exact int64 state — identical
    * bits on any engine, no overflow at any scale.
    */
  /** SCD-type-2 history reconstruction: collapse an event stream into
    * validity intervals of a tracked attribute — one row per consecutive
    * run of the same value per series, with `valid_from` (run start),
    * `valid_to` (start of the NEXT run, null while current) and
    * `is_current`. The classic warehouse dimension-history shape, built
    * from the raw stream instead of maintained by triggers.
    *
    * `orderCols` must totally order each series. Scale shape: change
    * detection, run numbering, and the run groupBy all ride ONE
    * `partitionBy(series) orderBy(orderCols)` exchange (the run key is a
    * prefix-sum over the same window; the final lead() re-sorts the
    * already-co-partitioned run table in place).
    */
  def scd2Intervals(
      df: DataFrame,
      seriesCol: String,
      orderCols: Seq[String],
      attrCol: String
  ): DataFrame = {
    val w = Window.partitionBy(col(seriesCol)).orderBy(orderCols.map(col): _*)
    val runs = df
      .withColumn("__chg",
        when(lag(col(attrCol), 1).over(w).isNull ||
          lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__chg")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(seriesCol), col("__run"))
      .agg(max(col(attrCol)).as(attrCol), // constant within a run
        min(struct(orderCols.map(col): _*)).as("__start"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_from", col("__start").getField(orderCols.head))
    val wRun = Window.partitionBy(col(seriesCol)).orderBy(col("__run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run", "__start")
  }

  /** CDC merge-apply (the MERGE INTO staple): fold an ordered change
    * batch into a keyed snapshot. Per key, only the LAST change matters —
    * a final `delete` removes the key, any other final op upserts its
    * payload; keys without changes pass through untouched. `changes` must
    * carry the snapshot's columns plus `opCol`; `orderCols` must totally
    * order changes within a key.
    *
    * Scale shape: one window over the CHANGE BATCH (keyed, batch-sized —
    * never the snapshot), then a left-anti equi-join on key + unionByName.
    * The snapshot is never sorted and never shuffled beyond the anti-join
    * hash on its key — at 100 TB the cost is the change batch plus one
    * keyed pass over the snapshot, the same shape a Delta/Iceberg MERGE
    * plans.
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      opCol: String,
      deleteOp: String = "delete"
  ): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    val lastChg = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = lastChg.filter(col(opCol) =!= deleteOp)
      .drop(opCol).drop(orderCols.filterNot(snapshot.columns.contains): _*)
      .select(snapshot.columns.map(col): _*)
    snapshot
      .join(lastChg.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(upserts)
  }

  /** Keyed snapshot diff — the dataset-versioning readout (what changed
    * between corpus v1 and v2): every key classified added / removed /
    * changed / unchanged. Both snapshots reduce to slim
    * `(key, md5-over-compare-cols)` projections BEFORE the full-outer
    * join, so diffing two 100 TB snapshots shuffles only keys plus
    * 128-bit hashes — the payload never moves.
    *
    * NULL compare values are coalesced to a sentinel before hashing
    * (concat_ws silently drops NULLs, which would make (NULL,"x") and
    * ("x",NULL) collide); a literal value equal to the sentinel is the
    * documented residual ambiguity.
    */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String]
  ): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    def slim(df: DataFrame, h: String) =
      df.select(keyCols.map(col) :+
        md5(concat_ws("|",
          compareCols.map(c => coalesce(col(c).cast("string"), lit("<NULL>"))): _*))
          .as(h): _*)
    slim(oldDf, "__h_old")
      .join(slim(newDf, "__h_new"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") =!= col("__h_new"), lit("changed"))
          .otherwise(lit("unchanged")))
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  def finalize(state: DataFrame, groupCols: Seq[String]): DataFrame =
    state
      .withColumn("mean", expr("CAST(sum_v AS DOUBLE) / n"))
      .withColumn("variance",
        expr("CAST(sum_sq AS DOUBLE) / n - " +
          "(CAST(sum_v AS DOUBLE) / n) * (CAST(sum_v AS DOUBLE) / n)"))

  /** Incremental maintenance of an inner equi-join view under inserts —
    * the standard delta algebra
    *
    *   Δ(L ⋈ R) = ΔL ⋈ R ∪ L ⋈ ΔR ∪ ΔL ⋈ ΔR
    *
    * (old rows join old rows only in the standing view, so the base⋈base
    * work is NEVER redone). At 100 TB the bases live bucketed on the join
    * key, so each delta term shuffles only the DELTA side; the three
    * terms union into one append to the materialized view.
    */
  def joinDelta(
      oldL: DataFrame,
      deltaL: DataFrame,
      oldR: DataFrame,
      deltaR: DataFrame,
      keys: Seq[String]
  ): DataFrame = {
    require(keys.nonEmpty, "joinDelta needs join keys")
    deltaL.join(oldR, keys)
      .unionByName(oldL.join(deltaR, keys))
      .unionByName(deltaL.join(deltaR, keys))
  }

  /** The maintained view after one insert batch on each side: the
    * standing view (old⋈old) plus [[joinDelta]]. Equal to a full
    * recompute over (oldL ∪ ΔL) ⋈ (oldR ∪ ΔR) — which is exactly what
    * the oracle checks.
    */
  def incrementalJoin(
      oldL: DataFrame,
      deltaL: DataFrame,
      oldR: DataFrame,
      deltaR: DataFrame,
      keys: Seq[String]
  ): DataFrame =
    oldL.join(oldR, keys).unionByName(joinDelta(oldL, deltaL, oldR, deltaR, keys))
}
