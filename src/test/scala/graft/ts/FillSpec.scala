package graft.ts

import graft.SparkSpec

/** Pins pandas fillna/interpolate semantics (W4/W5; survey §7.4 traps 2-3):
  * `limit` counts consecutive nulls from the last valid value.
  */
class FillSpec extends SparkSpec {
  import spark.implicits._

  private def seriesOf(vals: Option[Double]*) =
    vals.zipWithIndex.map { case (v, i) =>
      (ts(f"2024-01-01 00:${i}%02d:00"), v)
    }.toDF("ts", "v")

  private def collectVals(df: org.apache.spark.sql.DataFrame): Seq[Option[Double]] =
    df.orderBy("ts").collect().map(r =>
      if (r.isNullAt(1)) None else Some(r.getDouble(1))).toSeq

  test("ffill without limit carries last valid forward; leading nulls stay null") {
    val df = seriesOf(None, Some(1.0), None, None, Some(4.0), None)
    val out = Fill.ffill(df, "ts", Seq("v"))
    assert(collectVals(out) == Seq(None, Some(1.0), Some(1.0), Some(1.0), Some(4.0), Some(4.0)))
  }

  test("ffill limit=n fills at most n consecutive nulls from the last valid value") {
    val df = seriesOf(Some(1.0), None, None, None, Some(5.0))
    val out = Fill.ffill(df, "ts", Seq("v"), limit = Some(2))
    assert(collectVals(out) == Seq(Some(1.0), Some(1.0), Some(1.0), None, Some(5.0)))
  }

  test("bfill mirrors ffill over reversed order") {
    val df = seriesOf(Some(1.0), None, None, Some(4.0), None)
    val out = Fill.bfill(df, "ts", Seq("v"))
    assert(collectVals(out) == Seq(Some(1.0), Some(4.0), Some(4.0), Some(4.0), None))
  }

  test("bfill limit=1 fills only the null adjacent to the next valid value") {
    val df = seriesOf(Some(1.0), None, None, Some(4.0))
    val out = Fill.bfill(df, "ts", Seq("v"), limit = Some(1))
    assert(collectVals(out) == Seq(Some(1.0), None, Some(4.0), Some(4.0)))
  }

  test("ffill is per-series when seriesCols given") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(1.0)),
      ("a", ts("2024-01-01 00:01:00"), None: Option[Double]),
      ("b", ts("2024-01-01 00:00:30"), None: Option[Double]), // no prior in b
      ("b", ts("2024-01-01 00:01:30"), Some(9.0))
    ).toDF("k", "ts", "v")
    val out = Fill.ffill(df, "ts", Seq("v"), seriesCols = Seq("k"))
      .orderBy("k", "ts").collect()
    assert(out(1).getDouble(2) == 1.0) // a: filled from a's last valid
    assert(out(2).isNullAt(2)) // b: leading null NOT filled from series a
  }

  test("multiple value columns fill independently over one shared window") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), Some(1.0), None: Option[Double]),
      (ts("2024-01-01 00:01:00"), None: Option[Double], Some(10.0)),
      (ts("2024-01-01 00:02:00"), None: Option[Double], None: Option[Double])
    ).toDF("ts", "a", "b")
    val out = Fill.ffill(df, "ts", Seq("a", "b")).orderBy("ts").collect()
    assert(out.map(r => (r.isNullAt(1), r.isNullAt(2))).toSeq ==
      Seq((false, true), (false, false), (false, false)))
    assert(out(2).getDouble(1) == 1.0 && out(2).getDouble(2) == 10.0)
    // both columns share ONE window (and thus one sort); the two-pass global
    // path adds a BroadcastExchange for the boundary patch, which is fine
    val plan = Fill.ffill(df, "ts", Seq("a", "b")).queryExecution.executedPlan.toString
    assert("\\bSort\\b".r.findAllIn(plan).size <= 1, s"fills must share one sort:\n$plan")
    assert("\\bWindow\\b".r.findAllIn(plan).size <= 1, s"fills must share one window:\n$plan")
  }

  test("interpolateTime is linear in TIME, not row position") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), Some(0.0)),
      (ts("2024-01-01 00:00:05"), None: Option[Double]), // 5s of 20s span
      (ts("2024-01-01 00:00:20"), Some(20.0))
    ).toDF("ts", "v")
    val out = Fill.interpolateTime(df, "ts", Seq("v"))
    assert(collectVals(out) == Seq(Some(0.0), Some(5.0), Some(20.0)))
  }

  test("interpolateTime edges: leading nulls stay null, trailing carry last valid") {
    val df = seriesOf(None, Some(2.0), None, Some(4.0), None)
    val out = Fill.interpolateTime(df, "ts", Seq("v"))
    assert(collectVals(out) == Seq(None, Some(2.0), Some(3.0), Some(4.0), Some(4.0)))
  }

  test("interpolateTime limit bounds consecutive filled nulls") {
    val df = seriesOf(Some(0.0), None, None, Some(30.0))
    val out = Fill.interpolateTime(df, "ts", Seq("v"), limit = Some(1))
    assert(collectVals(out) == Seq(Some(0.0), Some(10.0), None, Some(30.0)))
  }
}
