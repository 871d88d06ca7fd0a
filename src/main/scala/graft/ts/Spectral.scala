package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spectral cycle detection: discrete-Fourier power at a handful of
  * CANDIDATE periods (the Goertzel use-case — "is there a daily / weekly
  * rhythm in this metric?"), not a full FFT. The reference loader stops at
  * frequency inference from consecutive deltas (SURVEY §2.5 A6); this is
  * the natural next question asked of the same regular grid.
  *
  * Exactness contract (the repo's integer-kernel convention):
  *   - input is an already-bucketed regular grid of integral values
  *     (idx, x) — e.g. hour index, summed cents;
  *   - mean-centering multiplies through by n: dev_t = n·x_t − S is an
  *     exact int64 (the cross-correlation trick), so no float mean exists;
  *   - the phase factors snap to integer micro-units,
  *     cos_u = round(cos(2π·(idx mod P)/P)·1e6) — probed identical on
  *     JVM/libm at every phase of every candidate period;
  *   - per-period Σ dev·cos_u and Σ dev·sin_u are exact int64 sums;
  *     only the reported `power` collapses them to doubles in a fixed
  *     IEEE op sequence.
  * Headroom: n·|x|·1e6·n_rows < 2^63 — at 10^6 grid rows of 10^6-cent
  * magnitudes shard the grid first (the operator is per-series linear).
  *
  * Scale shape: the candidate fan-out multiplies the GRID (periods ×
  * grid rows), never raw events; totals ride a broadcast scalar; one
  * map-side-combined groupBy(period) ends the plan. Prefer this over a
  * distributed FFT whenever the question is "which of these k rhythms",
  * which is the pipeline-monitoring case.
  */
object Spectral {

  def periodogram(
      grid: DataFrame,
      idxCol: String,
      valueCol: String,
      periods: Seq[Int]
  ): DataFrame = {
    require(periods.nonEmpty, "periods must be non-empty")
    require(periods.forall(_ >= 2), s"periods must be >= 2, got $periods")
    val dt = grid.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType ||
        dt == org.apache.spark.sql.types.IntegerType,
      s"periodogram needs an integral value column for exactness, got $dt")
    val tot = grid.agg(
      count(lit(1)).as("__n"), sum(col(valueCol).cast("long")).as("__s"))
    grid
      .crossJoin(broadcast(tot))
      .withColumn("period",
        explode(array(periods.map(p => lit(p)): _*)))
      .withColumn("__dev",
        col("__n") * col(valueCol).cast("long") - col("__s"))
      .withColumn("__r", col(idxCol).cast("long") % col("period"))
      .withColumn("__cos_u",
        round(cos(lit(2) * lit(math.Pi) * col("__r") / col("period")) * 1e6, 0)
          .cast("long"))
      .withColumn("__sin_u",
        round(sin(lit(2) * lit(math.Pi) * col("__r") / col("period")) * 1e6, 0)
          .cast("long"))
      .groupBy(col("period"))
      .agg(
        max(col("__n")).as("n"),
        sum(col("__dev") * col("__cos_u")).as("sc_u"),
        sum(col("__dev") * col("__sin_u")).as("ss_u"))
      // squared mean projection onto the candidate's cos/sin pair: for a
      // pure centered cosine of amplitude A at the true period this is
      // A²/4 regardless of series length (comparable across periods AND
      // grids). sc_u/1e6 undoes the trig snap, the two /n undo the
      // centering ×n and take the mean — a fixed IEEE op sequence over
      // two exact integers
      .withColumn("power",
        round(
          col("sc_u").cast("double") / 1e6 / col("n") / col("n") *
            (col("sc_u").cast("double") / 1e6 / col("n") / col("n")) +
            col("ss_u").cast("double") / 1e6 / col("n") / col("n") *
              (col("ss_u").cast("double") / 1e6 / col("n") / col("n")), 4))
  }

  /** Unnormalized Haar wavelet detail coefficients over an integer-indexed
    * grid, summarized per decomposition level:
    *
    *   D_{l,b} = Σ_{idx div 2^l = b} sign(idx, l) · x_idx,
    *   sign = +1 when (idx div 2^(l-1)) is even, −1 when odd
    *
    * i.e. each level-l coefficient is (sum of the left half-block) −
    * (sum of the right half-block) of a 2^l-wide aligned block. Grid
    * positions with no row contribute 0 (a dense-grid zero-fill, both
    * engines agree by construction). Every coefficient is an exact int64;
    * the per-level summary reports the L1 energy `Σ|D|`, `max|D|` and the
    * coefficient count — L1 rather than L2 because D² at corpus
    * magnitudes would overflow int64 while Σ|D| keeps wide headroom, and
    * the L1 profile carries the same which-scale-has-the-action signal.
    *
    * Scale shape: the input is the already-aggregated grid (bounded by
    * series length / bucket count, not raw rows); all levels ride ONE
    * explode → one groupBy (level, block) with map-side combine, then a
    * tiny per-level rollup.
    *
    * Headroom/contract: grid indices must be NON-NEGATIVE. Block ids use
    * Spark's `div` (truncation toward zero), which equals floor-division —
    * the cross-engine `//` contract — only for idx >= 0; a negative index
    * would also misalign the `% 2` sign rule across zero. Enforced at
    * runtime: a negative index raises rather than silently mis-binning
    * (the headroom-documentation style of the cumulative-sum operators).
    */
  def haarL1(
      grid: DataFrame,
      idxCol: String,
      valueCol: String,
      levels: Int
  ): DataFrame = {
    require(levels >= 1 && levels <= 20, s"levels must be in [1,20], got $levels")
    val lvls = array((1 to levels).map(l => lit(l)): _*)
    grid
      .select(
        when(col(idxCol).cast("long") >= 0, col(idxCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("haarL1: grid index must be non-negative, got "),
            col(idxCol).cast("string")))).as("__i"),
        col(valueCol).cast("long").as("__x"))
      .select(col("__i"), col("__x"), explode(lvls).as("level"))
      .withColumn("__block",
        expr("__i div CAST(shiftleft(1, level) AS BIGINT)"))
      .withColumn("__signed",
        when(expr("(__i div CAST(shiftleft(1, level - 1) AS BIGINT)) % 2") === 0,
          col("__x")).otherwise(-col("__x")))
      .groupBy(col("level"), col("__block"))
      .agg(sum(col("__signed")).as("__d"))
      .groupBy(col("level"))
      .agg(
        count(lit(1)).as("n_coeffs"),
        sum(abs(col("__d"))).as("l1_energy"),
        max(abs(col("__d"))).as("max_abs"))
  }
}
