package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generator-driven invariants for the smoothing/downsampling family:
  * EWMA is a convex combination (bounded by its frame extrema), CUSUM
  * conserves mass (last value exactly 0 on the integer path), M4 keeps
  * every bucket's extrema consistent and conserves row counts.
  */
class SmoothPropertySpec extends SparkSpec {
  import spark.implicits._

  private val seriesGen: Gen[Seq[(String, Long, Long)]] = for {
    n <- Gen.choose(3, 60)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    vals <- Gen.listOfN(n, Gen.choose(-10000L, 10000L))
  } yield keys.zip(vals).zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) }

  private def cases[T](g: Gen[T], n: Int = 6): Seq[T] =
    (1 to n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  private def toDf(rows: Seq[(String, Long, Long)]) =
    rows.map { case (k, i, v) =>
      (k, i, new java.sql.Timestamp(ts("2024-01-01 00:00:00").getTime + i * 60000L), v)
    }.toDF("k", "id", "ts", "v")

  test("property: ewma is a convex combination — bounded by the series min/max") {
    for (rows <- cases(seriesGen); alpha <- Seq(0.1, 0.5, 0.9)) {
      val df = toDf(rows).withColumn("v", col("v").cast("double"))
      val bad = Smooth.ewma(df, Seq("ts", "id"), "v", alpha, 16, Seq("k"))
        .join(df.groupBy("k").agg(min("v").as("lo"), max("v").as("hi")), "k")
        .filter(col("ewma") < col("lo") - 1e-9 || col("ewma") > col("hi") + 1e-9)
      assert(bad.count() == 0, s"ewma escaped [min,max] for alpha=$alpha")
    }
  }

  test("property: cusum integer path ends each series at exactly zero") {
    for (rows <- cases(seriesGen)) {
      val out = Smooth.cusum(toDf(rows), Seq("ts", "id"), "v", Seq("k"))
      val lastPerKey = out
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("k").orderBy(col("id").desc)))
        .filter(col("rn") === 1)
        .select("cusum").as[Double].collect()
      assert(lastPerKey.forall(_ == 0.0),
        s"total deviation from the mean must be exactly 0, got ${lastPerKey.toSeq}")
    }
  }

  test("property: m4 buckets conserve rows and keep first/last inside [min,max]") {
    for (rows <- cases(seriesGen); buckets <- Seq(1, 4, 16)) {
      val df = toDf(rows).withColumn("v", col("v").cast("double"))
      val out = Downsample.m4(df, "ts", "v", buckets, Seq("k"), Some("id"))
      val total = out.agg(sum("n_rows")).as[Long].head()
      assert(total == rows.size, s"row conservation: $total != ${rows.size}")
      val bad = out.filter(
        col("v_first") < col("v_min") || col("v_first") > col("v_max") ||
        col("v_last") < col("v_min") || col("v_last") > col("v_max") ||
        col("bucket") < 0 || col("bucket") >= buckets)
      assert(bad.count() == 0, "bucket extrema inconsistent")
    }
  }

  test("property: rolling autocorr stays within [-1, 1] or null") {
    for (rows <- cases(seriesGen)) {
      val df = toDf(rows).withColumn("v", col("v").cast("double"))
      val bad = Smooth.rollingAutocorr(df, Seq("ts", "id"), "v", 8, Seq("k"))
        .filter(col("autocorr").isNotNull &&
          (col("autocorr") < -1.0 - 1e-9 || col("autocorr") > 1.0 + 1e-9))
      assert(bad.count() == 0)
    }
  }

  test("property: dupNgramStats ratios are consistent (n_dup <= n_ngrams, ppm exact)") {
    val textGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(2, 12)
      docs <- Gen.listOfN(n, Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (docs <- cases(textGen)) {
      val out = graft.ops.Corpus.dupNgramStats(docs.toDF("doc_id", "text"), "doc_id", "text", 5)
        .select("n_ngrams", "n_dup", "dup_ppm").as[(Long, Long, Long)].collect()
      out.foreach { case (n, d, ppm) =>
        assert(d <= n && ppm == d * 1000000L / n, s"inconsistent ($n, $d, $ppm)")
      }
    }
  }

  test("property: tokenEntropy is within [0, ln(n_tokens)]") {
    val textGen: Gen[Seq[(Long, String)]] = for {
      n <- Gen.choose(1, 10)
      docs <- Gen.listOfN(n, Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" ")))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    for (docs <- cases(textGen)) {
      val out = graft.ops.TextStats.tokenEntropy(docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("n_tokens", "entropy").as[(Long, Double)].collect()
      out.foreach { case (n, h) =>
        assert(h >= -1e-9 && h <= math.log(n.toDouble) + 1e-3, s"H=$h out of range for n=$n")
      }
    }
  }
}
