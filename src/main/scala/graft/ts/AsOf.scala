package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / nearest time joins (J1 in the survey; reference
  * load_file.py:2207-2230 does an O(n*m) python scan per target timestamp —
  * here re-expressed as the classic union-of-timelines trick:
  *
  *   union(left-tagged, right-tagged) -> one sort by (key, t, tag) ->
  *   running last/first window -> filter back to left rows.
  *
  * Cost: ONE shuffle (the window sort), linear work, no cross join — this is
  * the shape that survives 100 TB, unlike a |t1-t2| range join which
  * explodes quadratically inside bucket pairs.
  *
  * Tie-breaking matches the reference (argmin picks the first minimal
  * distance, i.e. the EARLIER row wins ties) via backward-before-forward
  * preference on equal distance.
  */
object AsOf {

  sealed trait Direction
  object Direction {
    /** last right row with rt <= lt */
    case object Backward extends Direction
    /** first right row with rt >= lt */
    case object Forward extends Direction
    /** closer of the two; earlier wins ties */
    case object Nearest extends Direction
  }

  /** Attach `valueCols` from `right` to every row of `left`, matched as-of on
    * time. `keys` co-partitions both sides (series id); empty keys = one
    * global series.
    *
    * Output: all columns of `left` + each value column (named
    * `<prefix><valueCol>`) + `<prefix>ts` (the matched right timestamp).
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      leftTs: String,
      rightTs: String,
      valueCols: Seq[String],
      keys: Seq[String] = Nil,
      direction: Direction = Direction.Backward,
      tolerance: Option[Long] = None, // max |lt - rt| in seconds
      prefix: String = "asof_"
  ): DataFrame = {
    val spark = left.sparkSession
    val t = "__t"
    val side = "__side" // 0 = right(data), 1 = left(probe)

    val leftCols = left.columns.toSeq
    // keep left payload; right contributes only key/ts/value columns
    val lTagged = left
      .withColumn(t, col(leftTs))
      .withColumn(side, lit(1))
      .select((Seq(col(t), col(side)) ++ keys.map(col) ++
        leftCols.map(c => col(c).as(s"__l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")) :+
        lit(null).cast("timestamp").as("__r_ts")): _*)
    val rTagged = right
      .withColumn(t, col(rightTs))
      .withColumn(side, lit(0))
      .select((Seq(col(t), col(side)) ++ keys.map(col) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++
        valueCols.map(c => col(c).as(s"__r_$c")) :+
        col(rightTs).as("__r_ts")): _*)

    val unioned = lTagged.unionByName(rTagged)

    // right rows sort BEFORE left rows at equal t => backward window ("<= t")
    // sees same-instant right rows. The FORWARD match ("first right at or
    // after t") is expressed as a backward-RUNNING window over DESCENDING
    // order: Spark evaluates [currentRow, unboundedFollowing] frames by
    // recomputing the aggregate per row — O(n^2), measured 515s on a 100k-row
    // timeline — while running frames are incremental O(n).
    //
    // With keys the windows hash-partition and parallelize. With NO keys
    // (one global timeline) a global window would single-task the sort, so
    // the same algebra runs through RangeSeries' two-pass range-partitioned
    // form in ONE exchange: chunks bucket on t alone (tied instants never
    // split), the backward match is a running last over (2*t_us + side) asc
    // — side 0/1 keeps it order-preserving and overflow-free until year
    // ~148000 — and the forward match is a reverse request over
    // (2*t_us - side) asc, so a right row at the same instant counts as
    // "at or after" the probe for forward exactly as it counts as "at or
    // before" for backward.
    val global = keys.isEmpty
    val kBase = unix_micros(col(t)) * 2
    val kBack = kBase + col(side)
    val kFwdAsc = kBase - col(side)
    def reqs(pfx: String): Seq[RangeSeries.Running] =
      RangeSeries.Running(s"${pfx}ts", col("__r_ts")) +:
        valueCols.map(c => RangeSeries.Running(s"$pfx$c", col(s"__r_$c")))
    def runGlobal(in: DataFrame, backPfx: Option[String], fwdPfx: Option[String]): DataFrame =
      RangeSeries.withGlobalRunning(in, kBack,
        runnings = backPfx.toSeq.flatMap(reqs),
        reverses = fwdPfx.toSeq.flatMap(reqs),
        bucketKey = Some(kBase),
        revKey = Some(kFwdAsc))

    val part = Window.partitionBy(keys.map(col): _*)
    val wBack = part.orderBy(col(t).asc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.orderBy(col(t).desc, col(side).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def runKeyed(in: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
        pfx: String): DataFrame =
      valueCols.foldLeft(
        in.withColumn(s"${pfx}ts", last(col("__r_ts"), ignoreNulls = true).over(w))
      ) { (acc, c) =>
        acc.withColumn(s"$pfx$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
      }

    val withMatches = direction match {
      case Direction.Backward =>
        if (global) runGlobal(unioned, Some("__m_"), None)
        else runKeyed(unioned, wBack, "__m_")
      case Direction.Forward =>
        if (global) runGlobal(unioned, None, Some("__m_"))
        else runKeyed(unioned, wFwd, "__m_")
      case Direction.Nearest =>
        val withBoth =
          if (global) runGlobal(unioned, Some("__b_"), Some("__f_"))
          else runKeyed(runKeyed(unioned, wBack, "__b_"), wFwd, "__f_")
        val bDist = abs(unix_micros(col(t)) - unix_micros(col("__b_ts")))
        val fDist = abs(unix_micros(col("__f_ts")) - unix_micros(col(t)))
        // earlier (backward) wins ties, matching the reference argmin
        val useBack = col("__b_ts").isNotNull &&
          (col("__f_ts").isNull || bDist <= fDist)
        valueCols.foldLeft(
          withBoth.withColumn("__m_ts", when(useBack, col("__b_ts")).otherwise(col("__f_ts")))
        ) { (acc, c) =>
          acc.withColumn(s"__m_$c", when(useBack, col(s"__b_$c")).otherwise(col(s"__f_$c")))
        }
    }

    val tolFiltered = tolerance match {
      case Some(sec) =>
        val ok = withMatches.withColumn(
          "__dist_ok",
          abs(unix_micros(col(t)) - unix_micros(col("__m_ts"))) <= sec * 1000000L
        )
        valueCols
          .foldLeft(ok) { (acc, c) =>
            acc.withColumn(s"__m_$c", when(col("__dist_ok"), col(s"__m_$c")))
          }
          .withColumn("__m_ts", when(col("__dist_ok"), col("__m_ts")))
      case None => withMatches
    }

    val _ = spark
    tolFiltered
      .filter(col(side) === 1)
      .select((leftCols.map(c => col(s"__l_$c").as(c)) ++
        valueCols.map(c => col(s"__m_$c").as(s"$prefix$c")) :+
        col("__m_ts").as(s"${prefix}ts")): _*)
  }
}
