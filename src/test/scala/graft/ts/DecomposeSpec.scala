package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecomposeSpec extends SparkSpec {
  import spark.implicits._

  // value = 100·phase-pattern + linear trend (in integer units): the
  // decomposition must recover both shapes and leave ~zero residual
  private def fixture = {
    val pattern = Seq(0L, 300L, 600L, 300L) // period 4
    (0 until 64).map { i =>
      ("s1", i.toLong, pattern(i % 4) + 10L * i)
    }.toDF("k", "idx", "v").withColumn("phase", col("idx") % 4)
  }

  test("additive recovers a planted linear trend + periodic seasonal with " +
    "near-zero residual, and x = trend + seasonal + residual exactly") {
    val out = Decompose.additive(fixture, Seq("idx"), "v", col("phase"),
        window = 5, seriesCols = Seq("k"))
      .orderBy("idx").collect()
    val interior = out.filter(r => !r.isNullAt(r.fieldIndex("trend")))
    assert(interior.length == 64 - 4, "edges (h=2 each side) must be null")
    interior.foreach { r =>
      val x = r.getLong(r.fieldIndex("v")).toDouble
      val t = r.getDouble(r.fieldIndex("trend"))
      val s = r.getDouble(r.fieldIndex("seasonal"))
      val res = r.getDouble(r.fieldIndex("residual"))
      // identity holds to the bit: all three come from exact-integer
      // numerators over the SAME denominator family
      assert(math.abs(x - (t + s + res)) < 1e-9, s"identity broke at $r")
    }
    // the planted pattern: seasonal means (window=5 over period 4 smears
    // the pattern into the trend a little, but phase ORDERING must hold:
    // phase 2 highest, phase 0 lowest)
    val byPhase = interior.groupBy(_.getLong(1) % 4)
      .map { case (p, rs) =>
        p -> rs.map(_.getDouble(rs.head.fieldIndex("seasonal"))).head }
    assert(byPhase(2L) > byPhase(1L) && byPhase(1L) > byPhase(0L),
      s"seasonal ordering lost: $byPhase")
    // residuals tiny relative to the planted 300-unit seasonal swing
    val maxAbsResid = interior.map(r =>
      math.abs(r.getDouble(r.fieldIndex("residual")))).max
    assert(maxAbsResid < 60.0, s"residual too large: $maxAbsResid")
  }

  test("additive rejects non-integral values; requires an odd window") {
    val floats = Seq(("s", 1L, 1.5)).toDF("k", "idx", "v")
    intercept[IllegalArgumentException] {
      Decompose.additive(floats, Seq("idx"), "v", col("idx") % 4)
    }
    intercept[IllegalArgumentException] {
      Decompose.additive(fixture, Seq("idx"), "v", col("phase"), window = 4)
    }
  }

  test("seasonalAnomalies flags exactly the planted spike and nothing else") {
    // plant one violent spike into the otherwise perfectly-decomposable
    // fixture: its residual dwarfs the mean |residual|, so it alone is
    // flagged at k=3
    val spiked = fixture.withColumn("v",
      when(col("idx") === 31, col("v") + 5000L).otherwise(col("v")))
    val out = Decompose.seasonalAnomalies(spiked, Seq("idx"), "v",
        col("phase"), window = 5, seriesCols = Seq("k"))
      .orderBy("idx").collect()
    // the spike smears into the trend window of its neighbours, but the
    // spiked row itself must be flagged and carry the dominant residual
    assert(out.nonEmpty, "planted spike not flagged")
    val flaggedIdx = out.map(_.getLong(1)).toSet
    assert(flaggedIdx.contains(31L), s"idx=31 missing from flags: $flaggedIdx")
    val top = out.maxBy(r => math.abs(r.getLong(r.fieldIndex("residual_u"))))
    assert(top.getLong(top.fieldIndex("idx")) == 31L,
      s"dominant residual not at the spike: $top")
    // clean fixture: near-zero residuals, mean-|residual| threshold flags
    // only genuine outliers — none here
    val clean = Decompose.seasonalAnomalies(fixture, Seq("idx"), "v",
      col("phase"), window = 5, seriesCols = Seq("k"))
    assert(clean.count() == 0, "clean series must produce no anomalies")
  }

  test("plan: seasonalAnomalies still costs ONE exchange (threshold windows " +
    "ride the decomposition's series partitioning)") {
    val out = Decompose.seasonalAnomalies(fixture, Seq("idx"), "v",
      col("phase"), window = 5, seriesCols = Seq("k"))
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    val exchanges = "exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shared exchange, got $exchanges:\n$plan")
    assert(!plan.contains("join"), s"anomaly detector must not join:\n$plan")
  }

  test("plan: ONE exchange serves both windows (series partitioning is a " +
    "subset of the (series, phase) clustering), no joins") {
    val out = Decompose.additive(fixture, Seq("idx"), "v", col("phase"),
      window = 5, seriesCols = Seq("k"))
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    val exchanges = "exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shared exchange, got $exchanges:\n$plan")
    assert(!plan.contains("join"), s"decomposition must not join:\n$plan")
  }
}
