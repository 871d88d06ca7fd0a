package graft.ts

import graft.ops.Sketch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window distinct counting (rolling HAU/DAU-style actives):
  * for every observed time bucket, how many distinct ids appeared in the
  * last `windowBuckets` buckets (current included).
  *
  * Spark windows can't express `count(DISTINCT) OVER (ROWS ...)`, and a
  * per-bucket re-scan is O(window) passes. Both paths here are single-pass
  * contribution expansions instead:
  *
  *   - [[exact]]: dedup to (bucket, id) pairs FIRST (the only row-scale
  *     groupBy, map-side combinable), then each pair contributes to the
  *     `windowBuckets` buckets it is visible in. Shuffled volume after
  *     dedup is (actives/bucket)·window — independent of raw row count,
  *     the thing that matters at 100 TB.
  *   - [[hllSliding]]: per-bucket HLL register tables (64 rows/bucket,
  *     built map-side from raw rows), expanded and max-merged. Shuffled
  *     volume is 64·window rows per bucket TOTAL — independent of both
  *     row count AND cardinality; this is the path when ids/bucket is
  *     itself huge. Register merge = max, so expansion+groupBy IS the
  *     sliding sketch-union.
  *
  * Reference behavior modeled: none (the loader's continuity QC stops at
  * per-file coverage); this is the standard activity analytic over the
  * same event stream, in the sketch-algebra style of [[graft.ops.Sketch]].
  */
object SlidingDistinct {

  private def bucketOf(timeCol: String, bucketUs: Long) =
    expr(s"unix_micros($timeCol) div ${bucketUs}L").as("bkt")

  /** Exact distinct ids per trailing window, one row per OBSERVED bucket:
    * `(bkt, n_exact)`. Buckets with no events are skipped (a trailing
    * window anchored at an empty bucket is rarely asked for; union a grid
    * and left-join to include them).
    *
    * Interval-difference formulation (round-12): each id's visibility is
    * the union of `[b, b+W-1]` over its source buckets; consecutive
    * source buckets closer than W merge into ONE interval, each interval
    * contributes `(start, +1)` and `(end+1, −1)` boundary deltas, and the
    * per-bucket distinct count is the prefix sum of deltas. Shuffled
    * volume is O(deduped pairs) — the [[exactExpand]] form it replaces
    * shuffled W× that through a second distinct (at W=24: 24× the pair
    * volume through the widest exchange). The prefix sum runs as ONE
    * unpartitioned window over the bucket-delta table, whose size is
    * bounded by the time span in buckets (hours over years ≈ 10^5 rows)
    * + interval ends — bounded-cardinality by construction, never
    * O(rows), so the one-task sort is safe at any corpus size.
    */
  def exact(
      df: DataFrame,
      timeCol: String,
      idCol: String,
      bucketUs: Long,
      windowBuckets: Int
  ): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets must be >= 1, got $windowBuckets")
    val pairs = df
      .select(bucketOf(timeCol, bucketUs), col(idCol).as("id"))
      .distinct()
    val buckets = pairs.select("bkt").distinct()
    // per-id merged visibility intervals via an in-row fold over the id's
    // SORTED source buckets: state = (emitted intervals, open [s, e]);
    // a next bucket b extends the open interval iff b <= e + 1
    val iv = pairs
      .groupBy("id")
      .agg(sort_array(collect_list(col("bkt"))).as("bs"))
      .select(explode(expr(
        s"""aggregate(
           |  bs,
           |  named_struct(
           |    'ivs', cast(array() as array<struct<s: bigint, e: bigint>>),
           |    's', cast(null as bigint), 'e', cast(null as bigint)),
           |  (st, b) -> CASE
           |    WHEN st.s IS NULL THEN
           |      named_struct('ivs', st.ivs, 's', b, 'e', b + ${windowBuckets - 1}L)
           |    WHEN b <= st.e + 1L THEN
           |      named_struct('ivs', st.ivs, 's', st.s, 'e', b + ${windowBuckets - 1}L)
           |    ELSE named_struct(
           |      'ivs', array_append(st.ivs, named_struct('s', st.s, 'e', st.e)),
           |      's', b, 'e', b + ${windowBuckets - 1}L) END,
           |  st -> CASE WHEN st.s IS NULL THEN st.ivs
           |        ELSE array_append(st.ivs, named_struct('s', st.s, 'e', st.e)) END)
           |""".stripMargin)).as("iv"))
    val deltas = iv
      .select(explode(array(
        struct(col("iv.s").as("bkt"), lit(1L).as("d")),
        struct((col("iv.e") + 1L).as("bkt"), lit(-1L).as("d")))).as("x"))
      .select(col("x.bkt").as("bkt"), col("x.d").as("d"))
      // observed buckets ride along with d=0 so the prefix sum lands a row
      // exactly at every bucket the output needs
      .unionByName(buckets.select(col("bkt"), lit(0L).as("d")))
      .groupBy("bkt").agg(sum(col("d")).as("d"))
    val w = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("n_exact", sum(col("d")).over(w))
      .join(broadcast(buckets), Seq("bkt"), "left_semi")
      .select(col("bkt"), col("n_exact"))
  }

  /** The contribution-expansion form of [[exact]] — kept as the
    * independent second implementation the parity spec and the A/B bench
    * run against; the interval-difference form above replaced it on the
    * hot path (it shuffles W× the deduped pair volume).
    */
  private[graft] def exactExpand(
      df: DataFrame,
      timeCol: String,
      idCol: String,
      bucketUs: Long,
      windowBuckets: Int
  ): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets must be >= 1, got $windowBuckets")
    val pairs = df
      .select(bucketOf(timeCol, bucketUs), col(idCol).as("id"))
      .distinct()
    val buckets = pairs.select("bkt").distinct()
    pairs
      .select(
        explode(sequence(col("bkt"), col("bkt") + (windowBuckets - 1)))
          .as("bkt"),
        col("id"))
      .distinct()
      .join(broadcast(buckets), Seq("bkt"), "left_semi")
      .groupBy("bkt")
      .agg(count(lit(1)).as("n_exact"))
  }

  /** HLL-merged trailing-window estimate, one row per observed bucket:
    * `(bkt, v_zero, harmonic_s, est_u, hll_est)` — the
    * [[graft.ops.Sketch.hllEstimate]] contract, exact-integer registers so
    * the whole path replays in SQL.
    */
  def hllSliding(
      df: DataFrame,
      timeCol: String,
      idCol: String,
      bucketUs: Long,
      windowBuckets: Int
  ): DataFrame = {
    require(windowBuckets >= 1, s"windowBuckets must be >= 1, got $windowBuckets")
    val base = df.select(bucketOf(timeCol, bucketUs), col(idCol).as("id"))
    val regs = Sketch.hllRegisters(base, "id", Seq("bkt"))
    val buckets = base.select("bkt").distinct()
    val merged = regs
      .select(
        explode(sequence(col("bkt"), col("bkt") + (windowBuckets - 1)))
          .as("bkt"),
        col("bucket"), col("m_j"))
      .join(broadcast(buckets), Seq("bkt"), "left_semi")
      .groupBy("bkt", "bucket")
      .agg(max("m_j").as("m_j"))
    Sketch.hllEstimate(merged, Seq("bkt"))
  }
}
