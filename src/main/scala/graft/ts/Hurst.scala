package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hurst exponent by the aggregated-variance method — the long-range-
  * dependence readout (H≈0.5 memoryless, H→1 trending/persistent) used to
  * characterize load and demand series before forecasting them.
  *
  * Method: collapse the timeline to m equal buckets of integral mass (one
  * map-side-combined pass — the only data-scale stage), then for each
  * block size k: group the m buckets into n_b = m/k blocks and take the
  * variance of block means. Var ∝ k^(2H−2), so H = 1 + slope/2 of
  * ln Var vs ln k.
  *
  * Exactness: block sums S_j are int64 and the variance numerator
  * v_num = n_b·ΣS_j² − (ΣS_j)² is an exact DECIMAL(38,0) (Spark) /
  * HUGEINT (oracle) — non-negative by Cauchy–Schwarz, so its single cast
  * to DOUBLE is correctly rounded identically on both engines (< 2^117).
  * ln(v_num) snaps to integer kilo-nats (the zipf-slope contract), the
  * constant lns bake as literals, so the OLS runs on exact integers and
  * the final H is one fixed IEEE div+mul+add. Headroom: the int64 block
  * sums need total mass < 2^63 units and the decimal product needs
  * n_b·total² < 10^38 (total < ~6e17 units at n_b = 256) — the earlier
  * all-int64 v_num crossed 2^63 at n_b·total² , i.e. total ≈ 1.9e8 units
  * with mass concentrated in one block (the sf10 decade at whole-dollar
  * scale); decimal→double parity holds to n_b·total² < 2^117
  * (total < 2.5e16).
  */
object Hurst {

  /** Kilo-nat snap of a positive constant, shared by the Spark literals
    * and the generated oracle SQL so both sides use the SAME integers.
    */
  def lnKilo(c: Long): Long = math.round(math.log(c.toDouble) * 1e3)

  /** One-row result: n_buckets, total_units, vnum_<k> per block size,
    * hurst (null if any v_num ≤ 0 — constant series have no slope).
    */
  def aggVar(
      df: DataFrame,
      tsCol: String,
      valueCol: String,
      m: Int,
      ks: Seq[Int]
  ): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && m % k == 0 && m / k >= 2),
      s"each k must divide m with >= 2 blocks; got m=$m ks=$ks")
    val e = df.select(unix_micros(col(tsCol)).as("__t"),
      col(valueCol).cast("long").as("__x"))
    val bounds = broadcast(e.agg(min(col("__t")).as("__lo"), max(col("__t")).as("__hi")))
    val buckets = e.crossJoin(bounds)
      .withColumn("__b", expr(s"CAST((__t - __lo) * $m div (__hi - __lo + 1) AS INT)"))
      .groupBy(col("__b")).agg(sum(col("__x")).as("__s"))
    val vec = buckets
      .agg(map_from_entries(collect_list(struct(col("__b"), col("__s")))).as("__m"))
      .select(transform(sequence(lit(0), lit(m - 1)),
        i => coalesce(element_at(col("__m"), i), lit(0L))).as("vec"))

    def vnum(k: Int): Column = {
      val nb = m / k
      val bs = transform(sequence(lit(0), lit(nb - 1)),
        j => aggregate(slice(col("vec"), j * k + 1, lit(k)), lit(0L), (a, x) => a + x))
      val s = aggregate(bs, lit(0L), (a, x) => a + x)
      // ΣS² and the numerator in DECIMAL(38,0): exact past the int64
      // cliff, and non-negative (Cauchy–Schwarz) so the one double cast
      // is engine-identical below 2^117
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val s2 = aggregate(bs, lit(java.math.BigDecimal.ZERO).cast(dec38),
        (a, x) => a + x.cast(dec19) * x.cast(dec19))
      (lit(nb.toLong).cast(dec19) * s2 - s.cast(dec19) * s.cast(dec19))
        .cast("double").as(s"vnum_$k")
    }

    val withV = vec.select(
      (lit(m.toLong).as("n_buckets") +:
        aggregate(col("vec"), lit(0L), (a, x) => a + x).as("total_units") +:
        ks.map(vnum)): _*)

    // y_k = kilonat ln Var_k (+ the constant parts folded in); x_k = kilonat ln k
    val xs = ks.map(k => lnKilo(k.toLong))
    val ys = ks.map { k =>
      round(log(col(s"vnum_$k").cast("double")) * 1e3, 0).cast("long") -
        lit(2L * lnKilo((m / k).toLong)) - lit(2L * lnKilo(k.toLong))
    }
    val n = ks.size.toLong
    val sx = xs.sum
    val sxx = xs.map(x => x * x).sum
    val den = n * sxx - sx * sx
    val sy = ys.reduce(_ + _)
    val sxy = xs.zip(ys).map { case (x, y) => lit(x) * y }.reduce(_ + _)
    val num = lit(n) * sxy - lit(sx) * sy
    val anyNonPos = ks.map(k => col(s"vnum_$k") <= 0L).reduce(_ || _)
    withV.withColumn("hurst",
      when(anyNonPos, lit(null).cast("double"))
        .otherwise(lit(1.0) +
          lit(0.5) * (num.cast("double") / lit(den.toDouble))))
  }
}
