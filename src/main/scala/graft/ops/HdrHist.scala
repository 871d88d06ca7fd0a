package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HDR-histogram quantile sketch: log₂ octaves × 32 sub-buckets over
  * non-negative integers. Bucket index and bucket lower bound are pure
  * integer formulas (bit_length via `length(bin(v))`, the HLL idiom), so
  * the sketch — unlike t-digest/KLL — is deterministic, engine-exact, and
  * fully replayable in ANSI SQL.
  *
  * Why it exists next to exact `percentile()` (rel_quantiles): the exact
  * path buffers every group value; this table is ≤ ~2048 rows per group
  * no matter the input, builds map-side (a groupBy count), and MERGES by
  * summing counts — the shape running percentile estimation at 100 TB
  * (or incrementally, or per-shard-then-global) actually needs. Relative
  * error is bounded by the sub-bucket width: ≤ 1/32 ≈ 3.1%.
  *
  * Values must be >= 0 (pre-scale to cents/micro-units as usual; shift
  * signed data first). Reference behavior modeled: none — the reference's
  * pandas `describe()`-style stats are exact; this is the scale-path
  * extension, same spirit as [[Sketch]].
  */
object HdrHist {

  /** Sub-bucket bits: 32 sub-buckets per octave. */
  val SubBits = 5

  /** Bucket index of value `v` (SQL text, engine-shared except the
    * integer-division token: Spark `div`, DuckDB `//`).
    *
    * v < 32: idx = v (exact singleton buckets).
    * v >= 32: idx = bit_length(v)·32 + (the 5 bits after the leading 1) —
    * starts at 6·32 = 192, disjoint from the small range.
    * pow(2, k) for k <= 57 is an exact double, so the CAST is exact.
    */
  private[graft] def idxSql(v: String, divOp: String): String =
    s"CASE WHEN $v < 32 THEN $v ELSE length(bin($v)) * 32 + " +
      s"(($v $divOp CAST(pow(2, length(bin($v)) - 6) AS BIGINT)) % 32) END"

  /** Lower bound of bucket `idx` — the quantile estimate reported;
    * the true ranked value lies in [lo, lo + lo/32). */
  private[graft] def loSql(idx: String, divOp: String): String =
    s"CASE WHEN $idx < 192 THEN $idx ELSE " +
      s"(32 + $idx % 32) * CAST(pow(2, $idx $divOp 32 - 6) AS BIGINT) END"

  /** Build: `(groupCols…, idx, cnt)`, ≤ ~2048 rows per group, map-side
    * combinable. `valueCol` must be integral and non-negative.
    */
  def histogram(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String]
  ): DataFrame =
    df.select(
        (groupCols.map(col) :+
          expr(idxSql(valueCol, "div")).cast("long").as("idx")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge two histograms over the same groups: counts add. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile estimates from a histogram: for each integer percent in
    * `qPcts`, the lower bound of the bucket holding rank
    * `ceil(q·n/100) = (q·n + 99) div 100`. Output:
    * `(groupCols…, q, n, qidx, est)`.
    */
  def quantiles(
      hist: DataFrame,
      groupCols: Seq[String],
      qPcts: Seq[Int]
  ): DataFrame = {
    require(qPcts.nonEmpty && qPcts.forall(q => q >= 1 && q <= 100),
      s"quantile percents must be in [1,100], got $qPcts")
    val spark = hist.sparkSession
    import spark.implicits._
    val wCum = Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    hist
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
      .crossJoin(broadcast(qPcts.toDF("q")))
      .filter(col("cum") >= expr("(q * n + 99) div 100"))
      .groupBy((groupCols :+ "q").map(col): _*)
      .agg(max("n").as("n"), min("idx").as("qidx"))
      .withColumn("est", expr(loSql("qidx", "div")).cast("long"))
  }
}
