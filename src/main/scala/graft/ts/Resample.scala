package graft.ts

import graft.core.{Offsets, TimeSeriesGap}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import java.time.Duration

/** Resampling operators (A1/A2/U3/J1; reference load_file.py:2127-2360).
  *
  * Scale design:
  *   - tumbling resample = groupBy(window(ts, freq)) -> map-side partial
  *     aggregation, one hash shuffle, no sort;
  *   - regular right-closed bins (the resample_time_series path) = O(1)
  *     arithmetic bucket per row — no edge array, no range join;
  *   - irregular custom edges = O(#edges) lookup on a broadcast sorted edge
  *     array (edges are config-sized by construction);
  *   - target grids are generated ON EXECUTORS via sequence()+explode from a
  *     tiny segment-bounds list — never a driver-side row loop;
  *   - non-numeric "nearest" columns reuse AsOf.join (one sort shuffle)
  *     instead of the reference's O(n*m) python scan.
  */
object Resample {

  sealed trait Method
  object Method {
    case object Mean extends Method
    case object Sum extends Method
    case object Last extends Method
    case object First extends Method
    def parse(s: String): Method = s.toLowerCase match {
      case "mean" => Mean
      case "sum" => Sum
      case "last" => Last
      case "first" => First
      case other =>
        throw new graft.core.ConfigValidationException(
          s"Unsupported resampling method: $other" // reference load_file.py:2146-2148
        )
    }
  }

  private def aggFor(method: Method, c: String, tsCol: String, skipna: Boolean,
      sumAllNullZero: Boolean = false): Column = {
    val base = method match {
      case Method.Mean => avg(col(c))
      case Method.Sum => sum(col(c))
      // deterministic last/first-by-time among non-null values
      case Method.Last => max_by(col(c), when(col(c).isNotNull, col(tsCol)))
      case Method.First => min_by(col(c), when(col(c).isNotNull, col(tsCol)))
    }
    // pandas skipna=False: one null poisons the bucket (survey §7.4 trap #1);
    // Spark aggregates always skip nulls, so detect-any-null and override.
    // The skipna=True direction has its own trap (reference
    // load_file.py:2188-2194): pandas sum(skipna=True) of an ALL-null group
    // is 0.0 where Spark/SQL return null — opt in via sumAllNullZero (loader
    // columns are double-coerced, so the 0.0 literal keeps the column type).
    val agg =
      if (!skipna)
        when(count(when(col(c).isNull, lit(1))) > 0, lit(null)).otherwise(base)
      else if (sumAllNullZero && method == Method.Sum)
        when(count(col(c)) === 0, lit(0.0)).otherwise(base)
      else base
    agg.as(c)
  }

  /** A1: fixed-frequency tumbling-window resample (reference "upsample_df",
    * load_file.py:2127-2149). Bucket label = window start; left-closed
    * buckets, pandas df.resample() semantics.
    */
  def upsample(
      df: DataFrame,
      tsCol: String,
      freq: Duration,
      method: Method,
      valueCols: Seq[String],
      skipna: Boolean = true,
      seriesCols: Seq[String] = Nil,
      sumAllNullZero: Boolean = false
  ): DataFrame = {
    val win = window(col(tsCol), s"${freq.getSeconds} seconds")
    val groups: Seq[Column] = win +: seriesCols.map(col)
    val aggs = valueCols.map(c => aggFor(method, c, tsCol, skipna, sumAllNullZero))
    df.groupBy(groups: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select((col("window.start").as(tsCol) +: seriesCols.map(col)) ++ valueCols.map(col): _*)
  }

  /** Bucket lookup for irregular right-closed bins: pd.cut(bins,
    * include_lowest=True) semantics — intervals (b_i, b_{i+1}] with the first
    * closed at b_0; label = LEFT edge (reference load_file.py:2183-2185).
    * Broadcast sorted-edge array + higher-order filter: O(#edges) per row,
    * zero shuffle. Use `regularBucket` when edges are evenly spaced.
    */
  def bucketExpr(tsCol: String, edges: Seq[Timestamp]): Column = {
    require(edges.size >= 2, "need at least two bin edges")
    val sorted = edges.sortBy(_.getTime)
    val arr = array(sorted.map(e => lit(e)): _*)
    val t = col(tsCol)
    val firstE = lit(sorted.head)
    val lastE = lit(sorted.last)
    val leftOpen = element_at(filter(arr, e => e < t), -1)
    when(t < firstE || t > lastE, lit(null).cast("timestamp"))
      .when(t === firstE, firstE)
      .otherwise(leftOpen)
  }

  /** Right-closed REGULAR binning as O(1) arithmetic — the scale path for
    * resample_time_series grids: ts in (start+(k-1)f, start+kf] -> label
    * start+(k-1)f; ts == start -> start (include_lowest); outside
    * [start,end] -> null.
    */
  def regularBucket(tsCol: String, start: Timestamp, end: Timestamp, freq: Duration): Column = {
    val t = col(tsCol)
    // microsecond integer arithmetic: grid points from sequence() carry
    // sub-second precision, so second-truncated labels would never join
    val f = freq.getSeconds * 1000000L
    val s0 = lit(start)
    val delta = unix_micros(t) - unix_micros(s0)
    val k = ceil(delta.cast("double") / f.toDouble).cast("long")
    val left = timestamp_micros(unix_micros(s0) + (k - 1) * f)
    when(t < s0 || t > lit(end), lit(null).cast("timestamp"))
      .when(t === s0, s0)
      .otherwise(left)
  }

  /** Aggregate a pre-bucketed frame: numeric columns per `method`+`skipna`,
    * non-numeric columns by globally-nearest row to the bucket label (J1),
    * original column order preserved (reference load_file.py:2151-2239).
    * Expects a `__bucket` timestamp column; null buckets already filtered.
    */
  private def aggregateBuckets(
      bucketed: DataFrame,
      original: DataFrame,
      tsCol: String,
      method: Method,
      skipna: Boolean,
      sumAllNullZero: Boolean = false
  ): DataFrame = {
    val dataCols = original.columns.filterNot(_ == tsCol).toSeq
    val numeric = dataCols.filter { c =>
      original.schema(c).dataType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case _ => false
      }
    }
    val nonNumeric = dataCols.diff(numeric)

    val numAgg =
      if (numeric.nonEmpty) {
        val aggs = numeric.map(c => aggFor(method, c, tsCol, skipna, sumAllNullZero))
        bucketed.groupBy(col("__bucket")).agg(aggs.head, aggs.tail: _*)
      } else bucketed.select(col("__bucket")).distinct()

    val result =
      if (nonNumeric.isEmpty) numAgg
      else {
        val nearest = AsOf.join(
          left = numAgg.select(col("__bucket")),
          right = original.select((col(tsCol) +: nonNumeric.map(col)): _*),
          leftTs = "__bucket",
          rightTs = tsCol,
          valueCols = nonNumeric,
          direction = AsOf.Direction.Nearest,
          prefix = "__n_"
        )
        numAgg.join(
          nearest.select((col("__bucket").as("__bucket2") +: nonNumeric.map(c =>
            col(s"__n_$c").as(c))): _*),
          col("__bucket") === col("__bucket2"),
          "left"
        ).drop("__bucket2")
      }
    result.select((col("__bucket").as(tsCol) +: dataCols.map(col)): _*)
  }

  /** A2 + J1: irregular-bin resample ("resample_with_dates", reference
    * load_file.py:2151-2239) over explicit edges.
    */
  def resampleWithDates(
      df: DataFrame,
      tsCol: String,
      edges: Seq[Timestamp],
      method: Method,
      skipna: Boolean = true,
      sumAllNullZero: Boolean = false
  ): DataFrame = {
    val bucketed = df
      .withColumn("__bucket", bucketExpr(tsCol, edges))
      .filter(col("__bucket").isNotNull)
    aggregateBuckets(bucketed, df, tsCol, method, skipna, sumAllNullZero)
  }

  /** U3/F7: regular timestamp grid [start, end] step `freq`, expanded on
    * executors via sequence + explode.
    */
  def grid(
      spark: org.apache.spark.sql.SparkSession,
      start: Timestamp,
      end: Timestamp,
      freq: Duration,
      tsCol: String = "ts"
  ): DataFrame =
    segmentsGrid(spark, Seq((start, end)), freq, tsCol)

  /** Grid over multiple [start,end] segments (gap-exclusion grids, reference
    * load_file.py:2310-2329): the segment list is tiny and driver-side, the
    * point EXPANSION is distributed.
    */
  def segmentsGrid(
      spark: org.apache.spark.sql.SparkSession,
      segments: Seq[(Timestamp, Timestamp)],
      freq: Duration,
      tsCol: String = "ts"
  ): DataFrame = {
    import spark.implicits._
    val seg = segments.toDF("__s", "__e").repartition(math.max(1, segments.size))
    seg
      .select(explode(sequence(col("__s"), col("__e"),
        expr(s"interval ${freq.getSeconds} second"))).as(tsCol))
      .dropDuplicates(tsCol)
  }

  /** Segment bounds excluding gap interiors. We implement the reference's
    * DOCUMENTED semantics ("gaps larger than max_gap_size are excluded from
    * the grid", load_file.py:2264-2266); its code inverts its own docstring
    * (survey §7.4 trap #5).
    */
  def segmentsExcludingGaps(
      start: Timestamp,
      end: Timestamp,
      gaps: Seq[TimeSeriesGap],
      maxGapSize: Option[Duration]
  ): Seq[(Timestamp, Timestamp)] = {
    val excluded = maxGapSize match {
      case Some(mx) => gaps.filter(_.duration.compareTo(mx) > 0)
      case None => gaps
    }
    val sorted = excluded.sortBy(_.start.getTime)
    var cur = start
    val segs = Seq.newBuilder[(Timestamp, Timestamp)]
    sorted.foreach { g =>
      if (g.start.after(cur)) segs += ((cur, g.start))
      if (g.end.after(cur)) cur = g.end
    }
    if (!end.before(cur)) segs += ((cur, end))
    segs.result()
  }

  /** Per-series resample: the scale generalization of resampleTimeSeries.
    * Grids generate PER KEY on executors (bounds via one hash agg, expansion
    * via sequence+explode — the driver never sees a timestamp), buckets
    * compute relative to each series' own start, alignment joins on
    * (keys, bucket). Reference semantics per series, no global state.
    */
  def resampleTimeSeriesPerSeries(
      df: DataFrame,
      tsCol: String,
      frequency: String,
      seriesCols: Seq[String],
      methodResample: Option[String] = None,
      methodFill: Option[String] = None,
      fillLimit: Option[Int] = None,
      valueCols: Seq[String] = Nil
  ): DataFrame = {
    require(seriesCols.nonEmpty, "use resampleTimeSeries for a single global series")
    val freq = Offsets.parse(frequency)
    val fUs = freq.getSeconds * 1000000L
    val vals =
      if (valueCols.nonEmpty) valueCols
      else df.columns.filterNot(c => c == tsCol || seriesCols.contains(c)).toSeq
    val proj = df.select((seriesCols.map(col) :+ col(tsCol)) ++ vals.map(col): _*)

    val bounds = proj.groupBy(seriesCols.map(col): _*)
      .agg(min(col(tsCol)).as("__s"), max(col(tsCol)).as("__e"))

    val grid = bounds.select((seriesCols.map(col) :+
      explode(sequence(col("__s"), col("__e"),
        expr(s"interval ${freq.getSeconds} second"))).as(tsCol)): _*)

    val aligned = methodResample match {
      case None =>
        grid.join(proj, seriesCols :+ tsCol, "left")
      case Some(m) =>
        val withStart = proj.join(bounds.select((seriesCols.map(col) :+ col("__s")): _*),
          seriesCols)
        val t = col(tsCol)
        val delta = unix_micros(t) - unix_micros(col("__s"))
        val k = ceil(delta.cast("double") / fUs.toDouble).cast("long")
        val label = timestamp_micros(unix_micros(col("__s")) + (k - 1) * fUs)
        val bucketed = withStart
          .withColumn("__bucket", when(t === col("__s"), col("__s")).otherwise(label))
          .drop("__s")
        val method = Method.parse(m)
        val aggs = vals.map(c => aggFor(method, c, tsCol, skipna = true))
        val agg = bucketed
          .groupBy((seriesCols.map(col) :+ col("__bucket").as(tsCol)): _*)
          .agg(aggs.head, aggs.tail: _*)
        grid.join(agg, seriesCols :+ tsCol, "left")
    }

    methodFill match {
      case Some("ffill") => Fill.ffill(aligned, tsCol, vals, fillLimit, seriesCols)
      case Some("bfill") => Fill.bfill(aligned, tsCol, vals, fillLimit, seriesCols)
      case Some("interpolate") => Fill.interpolateTime(aligned, tsCol, vals, fillLimit, seriesCols)
      case _ => aligned
    }
  }

  /** Full resample_time_series parity (reference load_file.py:2241-2360):
    * build grid (optionally excluding big gaps) -> align or aggregate ->
    * fill. All row-wise work distributed; driver holds only segment bounds.
    */
  def resampleTimeSeries(
      df: DataFrame,
      tsCol: String,
      frequency: String,
      methodResample: Option[String] = None,
      methodFill: Option[String] = None,
      fillLimit: Option[Int] = None,
      includeAllGaps: Boolean = true,
      maxGapSize: Option[String] = None,
      valueCols: Seq[String] = Nil
  ): DataFrame = {
    val spark = df.sparkSession
    val freq = Offsets.parse(frequency)
    val vals =
      if (valueCols.nonEmpty) valueCols
      else df.columns.filterNot(_ == tsCol).toSeq
    val proj = df.select((col(tsCol) +: vals.map(col)): _*)

    val bounds = proj.agg(min(col(tsCol)), max(col(tsCol))).head()
    val (start, end) = (bounds.getTimestamp(0), bounds.getTimestamp(1))

    val segments =
      if (includeAllGaps) Seq((start, end))
      else {
        val report = Continuity.analyze(proj, tsCol)
        segmentsExcludingGaps(start, end, report.gaps, maxGapSize.map(Offsets.parse))
      }
    val g = segmentsGrid(spark, segments, freq, tsCol)

    val aligned = methodResample match {
      case None =>
        // pure reindex: exact-timestamp alignment (reference 2332-2333)
        g.join(proj, Seq(tsCol), "left")
      case Some(m) =>
        val bucketed = proj
          .withColumn("__bucket", regularBucket(tsCol, start, end, freq))
          .filter(col("__bucket").isNotNull)
        val agg = aggregateBuckets(bucketed, proj, tsCol, Method.parse(m), skipna = true)
        g.join(agg, Seq(tsCol), "left")
    }

    methodFill match {
      case Some("ffill") => Fill.ffill(aligned, tsCol, vals, fillLimit)
      case Some("bfill") => Fill.bfill(aligned, tsCol, vals, fillLimit)
      case Some("interpolate") => Fill.interpolateTime(aligned, tsCol, vals, fillLimit)
      case _ => aligned
    }
  }
}
