package graft.ts

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RangeSeriesBoundedSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // this suite pins the CHUNKED machinery (ghost overlap, thin fallback,
  // multi-chunk plan shape); disable the small-input fast path so the
  // 300-row fixtures exercise the scale path. FastPathParitySpec owns the
  // fast-path-vs-spine equivalence.
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("graft.rangeSeries.fastPathRows", "0")
    spark.conf.set("graft.rangeSeries.fastPathBytes", "0")
  }
  override def afterAll(): Unit = {
    spark.conf.unset("graft.rangeSeries.fastPathRows")
    spark.conf.unset("graft.rangeSeries.fastPathBytes")
    super.afterAll()
  }

  /** 300 rows over 4 shuffle partitions → 4 chunks of ~75 >> window: the
    * ghost-overlap path actually runs (spot-checked via the thin guard).
    */
  private def series = (1 to 300)
    .map(i => (i.toLong, if (i % 7 == 0) null else java.lang.Long.valueOf(i * 3 % 50)))
    .toDF("pos", "v")

  private def naive(window: Int) = {
    val w = Window.partitionBy().orderBy(col("pos")).rowsBetween(-(window - 1), 0)
    series
      .withColumn("s", sum("v").over(w))
      .withColumn("c", count(lit(1)).over(w))
      .withColumn("mn", min("v").over(w))
      .collect()
      .map(r => r.getLong(0) -> (r.get(r.fieldIndex("s")),
        r.get(r.fieldIndex("c")), r.get(r.fieldIndex("mn"))))
      .toMap
  }

  test("ghost-overlap bounded frames == single-task global window (nulls included)") {
    val got = RangeSeries
      .withGlobalBounded(series, col("pos"), window = 8,
        Seq(
          RangeSeries.Bounded("s", sum(col("v"))),
          RangeSeries.Bounded("c", count(lit(1))),
          RangeSeries.Bounded("mn", min(col("v")))))
      .collect()
      .map(r => r.getLong(0) -> (r.get(r.fieldIndex("s")),
        r.get(r.fieldIndex("c")), r.get(r.fieldIndex("mn"))))
      .toMap
    assert(got.size == 300, "ghosts must not leak into the output")
    assert(got == naive(8))
  }

  test("thin input falls back to the exact single-task window") {
    val tiny = (1 to 5).map(i => (i.toLong, java.lang.Long.valueOf(i.toLong)))
      .toDF("pos", "v")
    val got = RangeSeries
      .withGlobalBounded(tiny, col("pos"), window = 8,
        Seq(RangeSeries.Bounded("s", sum(col("v")))))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("s")))
      .toMap
    assert(got == Map(1L -> 1L, 2L -> 3L, 3L -> 6L, 4L -> 10L, 5L -> 15L))
  }

  test("multi-chunk path emits no single-partition exchange") {
    val out = RangeSeries.withGlobalBounded(series, col("pos"), window = 8,
      Seq(RangeSeries.Bounded("s", sum(col("v")))))
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("exchange singlepartition"),
      s"bounded global frame must stay chunk-parallel:\n$plan")
  }
}
