package graft.ts

import graft.ops.Sketch
import org.apache.spark.sql.DataFrame
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
