package graft.ts

import graft.SparkSpec
import java.time.Duration
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator invariants from the survey's test strategy (§5):
  * grid spacing exact, coverage% in [0,100], ffill never invents values,
  * bucket counts bounded, sum-agg conserves mass. Generators drive the
  * cases deterministically (fixed seeds — spark jobs are too heavy for
  * hundreds of random trials).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val tsGen: Gen[Seq[java.sql.Timestamp]] = for {
    n <- Gen.choose(2, 40)
    offsets <- Gen.listOfN(n, Gen.choose(0L, 72L * 3600))
  } yield offsets.distinct.sorted.map(s =>
    java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(s)))

  private val valsGen: Gen[Seq[Option[Double]]] = for {
    n <- Gen.choose(1, 30)
    vs <- Gen.listOfN(n,
      Gen.oneOf(Gen.const(None), Gen.choose(-100.0, 100.0).map(Some(_))))
  } yield vs

  private def cases[T](g: Gen[T], n: Int = 8): Seq[T] =
    (1 to n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong)))

  test("property: resample grid spacing is exactly the requested frequency") {
    for (tss <- cases(tsGen); freq <- Seq("30min", "1h")) {
      if (tss.size >= 2 && tss.head != tss.last) {
        val df = tss.map(t => (t, 1.0)).toDF("ts", "v")
        val out = Resample.resampleTimeSeries(df, "ts", freq)
        val diffs = Continuity.withDiff(out, "ts")
          .filter(org.apache.spark.sql.functions.col("diff_us").isNotNull)
          .select("diff_us").distinct().collect().map(_.getLong(0))
        val expect = graft.core.Offsets.parse(freq).getSeconds * 1000000L
        assert(diffs.isEmpty || diffs.toSeq == Seq(expect),
          s"spacing $diffs != $expect for n=${tss.size} freq=$freq")
      }
    }
  }

  test("property: coverage percent stays in [0, 100]") {
    for (tss <- cases(tsGen)) {
      val r = Continuity.analyze(tss.map(t => (t, 1.0)).toDF("ts", "v"), "ts")
      assert(r.coveragePercent >= 0.0 && r.coveragePercent <= 100.0)
    }
  }

  test("property: ffill never invents values; row count preserved") {
    for (vals <- cases(valsGen)) {
      val df = vals.zipWithIndex.map { case (v, i) =>
        (new java.sql.Timestamp(1704067200000L + i * 60000L), v)
      }.toDF("ts", "v")
      val out = Fill.ffill(df, "ts", Seq("v")).collect()
      assert(out.length == vals.size)
      val filled = out.filterNot(_.isNullAt(1)).map(_.getDouble(1)).toSet
      assert(filled.subsetOf(vals.flatten.toSet))
      assert(out.count(!_.isNullAt(1)) >= vals.count(_.isDefined))
    }
  }

  test("property: upsample bucket count bounded by points; sum-agg conserves mass") {
    for (tss <- cases(tsGen)) {
      val df = tss.map(t => (t, 2.0)).toDF("ts", "v")
      val out = Resample.upsample(df, "ts", Duration.ofHours(1),
        Resample.Method.Sum, Seq("v")).collect()
      assert(out.length <= tss.size)
      assert(out.map(_.getDouble(1)).sum == 2.0 * tss.size)
    }
  }

  test("property: interpolation output is bounded by neighbor values") {
    for (vals <- cases(valsGen)) {
      val df = vals.zipWithIndex.map { case (v, i) =>
        (new java.sql.Timestamp(1704067200000L + i * 60000L), v)
      }.toDF("ts", "v")
      val out = Fill.interpolateTime(df, "ts", Seq("v"))
        .collect().filterNot(_.isNullAt(1)).map(_.getDouble(1))
      val defined = vals.flatten
      if (defined.nonEmpty) {
        assert(out.forall(v => v >= defined.min - 1e-9 && v <= defined.max + 1e-9))
      }
    }
  }

  test("property: sequence packing reconstructs cumulative layout exactly") {
    val docGen: Gen[Seq[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 60)
      toks <- Gen.listOfN(n, Gen.choose(0L, 400L))
    } yield toks.zipWithIndex.map { case (t, i) => (i.toLong, (i % 4).toLong, t) }
    for (docs <- cases(docGen); budget <- Seq(64, 256)) {
      val df = docs.toDF("id", "bucket", "n")
      val out = graft.ops.Corpus.packSequences(df, "id", "n", "bucket", budget)
        .orderBy("bucket", "id").collect()
        .map(r => (r.getLong(1), r.getLong(2),
          r.getLong(r.fieldIndex("pack_in_bucket")), r.getLong(r.fieldIndex("pack_offset"))))
      // invariants: offset < budget; pack*budget + offset == exclusive
      // cumsum, monotone per bucket; packs never skip backwards
      out.groupBy(_._1).foreach { case (_, rows) =>
        var cum = 0L
        var lastPack = 0L
        rows.foreach { case (_, n, pack, off) =>
          assert(off >= 0 && off < budget)
          assert(pack * budget + off == cum, s"layout broke at cum=$cum")
          assert(pack >= lastPack)
          lastPack = pack
          cum += n
        }
      }
    }
  }
}
