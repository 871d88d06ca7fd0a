package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dynamic time warping over fixed-length bucket vectors — time-series
  * similarity that tolerates phase shift (the metric behind query-by-shape
  * search and series clustering, which plain L1/L2 on aligned buckets
  * can't express).
  *
  * Shape: each series first collapses to an m-bucket integer vector (one
  * keyed exchange, map-side-combined bucket sums), so series LENGTH never
  * enters the DP — DTW cost is O(m²) per PAIR, in-row, with m a small
  * constant. The pair table is the caller's: at 100 TB you block
  * candidate pairs first (SAX words, LSH on the vectors — both in this
  * engine) and run this verify-style DP per bucket, exactly like the
  * text near-dup pipeline's candidate->verify split; the all-pairs join
  * here is the per-block verification step, never corpus×corpus.
  *
  * All arithmetic is exact int64 (bucket sums of cents, |diff| path
  * costs), so every DP cell — and therefore the distance — is
  * engine-identical and the whole operator replays in SQL via the same
  * list-fold the Holt oracle uses.
  */
object Dtw {

  /** Large-but-overflow-safe DP sentinel: Inf + any path cost stays < 2^63. */
  val Inf: Long = 4611686018427387903L

  /** Per-series m-bucket vectors: bucket i = Σ `valueCol` (integral) over
    * the i-th of m equal slices of the GLOBAL [min ts, max ts] span
    * (global bounds travel by broadcast; missing buckets are 0).
    */
  def seriesVectors(
      df: DataFrame,
      seriesCol: String,
      tsCol: String,
      valueCol: String,
      m: Int
  ): DataFrame = {
    require(m >= 2 && m <= 128, s"bucket count m in [2,128], got $m")
    val e = df.select(col(seriesCol).as("__s"),
      unix_micros(col(tsCol)).as("__t"), col(valueCol).cast("long").as("__x"))
    val bounds = broadcast(e.agg(min(col("__t")).as("__lo"), max(col("__t")).as("__hi")))
    val buckets = e.crossJoin(bounds)
      // (t-lo)·m fits int64 for any span < 2^63/m microseconds (~2e5 years at m=128)
      .withColumn("__b", expr(s"CAST((__t - __lo) * $m div (__hi - __lo + 1) AS INT)"))
      .groupBy(col("__s"), col("__b")).agg(sum(col("__x")).as("__v"))
    buckets.groupBy(col("__s"))
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__v")))).as("__m"))
      .select(col("__s").as(seriesCol),
        transform(sequence(lit(0), lit(m - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L))).as("vec"))
  }

  /** The DTW distance of two length-`m` long vectors as a column
    * expression: classic O(m²) DP, rows folded over `va`, each row built
    * by an inner fold over positions of `vb` — both pure int64.
    */
  def dtwColumn(va: Column, vb: Column, m: Int): Column = {
    val row0 = concat(array(lit(0L)),
      transform(sequence(lit(1), lit(m)), _ => lit(Inf)))
    val dp = aggregate(va, row0,
      (prev, ai) => aggregate(sequence(lit(1), lit(m)),
        array(lit(Inf)),
        (c, j) => concat(c, array(
          abs(ai - element_at(vb, j)) +
            least(element_at(prev, j + 1), element_at(prev, j),
              element_at(c, j))))))
    element_at(dp, m + 1)
  }

  /** Aligned L1 distance (the identity warping path) — DTW's upper bound,
    * emitted alongside it so "how much did warping help" is a column.
    */
  def l1Column(va: Column, vb: Column): Column =
    aggregate(zip_with(va, vb, (a, b) => abs(a - b)), lit(0L), (acc, x) => acc + x)

  /** All (a < b) pairs of the given vector table with dtw + aligned L1.
    * The input is the candidate BLOCK (pre-filtered / pre-blocked by the
    * caller) — this join is quadratic in ITS size by design.
    */
  def dtwPairs(vectors: DataFrame, seriesCol: String, vecCol: String, m: Int): DataFrame = {
    val a = vectors.select(col(seriesCol).as("id_a"), col(vecCol).as("__va"))
    val b = vectors.select(col(seriesCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        dtwColumn(col("__va"), col("__vb"), m).as("dtw"),
        l1Column(col("__va"), col("__vb")).as("l1"))
  }
}
