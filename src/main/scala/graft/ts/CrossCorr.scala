package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lagged cross-correlation between pairs of series — the lead/lag
  * discovery step (does series A anticipate series B?) a time-series
  * consumer runs after the reference loader has aligned its frames.
  *
  * Semantics: both series are first resampled onto a shared integer bucket
  * grid (sum per bucket, integral units), then for every ordered pair
  * (a < b) and every lag in [-maxLag, maxLag] the Pearson correlation of
  * (x_t, y_{t+lag}) is computed over the overlapping buckets.
  *
  * Exactness: all six correlation sums are exact int64 (integral inputs)
  * and Pearson's closed form
  *
  *   (n·Σxy − Σx·Σy) / sqrt(n·Σx² − (Σx)²) / sqrt(n·Σy² − (Σy)²)
  *
  * runs its products in exact DECIMAL(38,0) — the int64 form crossed 2^63
  * once n_overlap·(hourly mass)² did, ~3000 overlapping hours at 1e6-unit
  * buckets (the Welch bug-#10 shape) — then a fixed sequence of IEEE ops:
  * the non-negative variance casts are engine-identical below 2^117, the
  * SIGNED numerator is negated in decimal before its cast (DuckDB's
  * negative decimal→double double-rounds), and the oracle writes the same
  * op ORDER (two divisions, not a product of roots). Degenerate pairs
  * (n < 2 or zero variance) yield null.
  *
  * Scale shape: the grid is a map-side-combined groupBy (buckets ≪ rows);
  * the lag fan-out multiplies the GRID (not the raw events) by
  * 2·maxLag + 1; the pair join is an equi-join on the bucket index, so it
  * hash-partitions on time — series pairs meet only where they overlap,
  * and no all-pairs blowup exists (the pair space materializes only in the
  * final #pairs·#lags-row aggregate).
  */
object CrossCorr {

  def crossCorrelation(
      df: DataFrame,
      seriesCol: String,
      bucketCol: String,
      valueCol: String,
      maxLag: Int = 3
  ): DataFrame = {
    require(maxLag >= 0, s"maxLag must be >= 0, got $maxLag")
    df.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => ()
      case other =>
        throw new IllegalArgumentException(
          s"crossCorrelation needs an integral value column (exact sums); " +
            s"got $other — scale to integer units first")
    }
    val grid = df
      .groupBy(col(seriesCol).as("__s"), col(bucketCol).as("__b"))
      .agg(sum(col(valueCol)).as("__v"))
    val probe = grid
      .select(col("__s").as("series_a"),
        explode(sequence(lit(-maxLag), lit(maxLag))).as("lag"),
        col("__b"), col("__v").as("__x"))
      // x_t pairs with y_{t+lag}: probe bucket on the b side is t+lag
      .withColumn("__pb", col("__b") + col("lag"))
    val other = grid.select(col("__s").as("series_b"),
      col("__b").as("__pb"), col("__v").as("__y"))
    val joined = probe
      .join(other, Seq("__pb"))
      .filter(col("series_a") < col("series_b"))
    val agg = joined
      .groupBy(col("series_a"), col("series_b"), col("lag"))
      .agg(
        count(lit(1)).as("n_overlap"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    agg
      .withColumn("xcorr", expr(xcorrSql(
        "n_overlap", "__sx", "__sy", "__sxy", "__sxx", "__syy")))
      .drop("__sx", "__sy", "__sxy", "__sxx", "__syy")
  }

  /** The shared engine/oracle Pearson text in THIS operator's op order
    * (two sqrt divisions): exact decimal products, decimal-negated signed
    * numerator, non-negative variance casts (see class doc for why).
    */
  def xcorrSql(n: String, sx: String, sy: String, sxy: String,
      sxx: String, syy: String): String = {
    def d(c: String) = s"CAST($c AS DECIMAL(19,0))"
    val varX = s"(${d(n)} * ${d(sxx)} - ${d(sx)} * ${d(sx)})"
    val varY = s"(${d(n)} * ${d(syy)} - ${d(sy)} * ${d(sy)})"
    val num = s"(${d(n)} * ${d(sxy)} - ${d(sx)} * ${d(sy)})"
    s"""CASE WHEN $n >= 2 AND $varX > 0 AND $varY > 0
       |THEN (CASE WHEN $num < 0 THEN -CAST(-$num AS DOUBLE)
       |      ELSE CAST($num AS DOUBLE) END)
       |     / sqrt(CAST($varX AS DOUBLE)) / sqrt(CAST($varY AS DOUBLE))
       |END""".stripMargin
  }
}
