package graft

import graft.ts.{AsOf, Fill}
import org.apache.spark.sql.functions._

/** Plan-quality regression guards: these assert the SHAPE of the physical
  * plan, not results — the properties that silently rot (pushdown lost, an
  * O(n^2) window frame reintroduced) while outputs stay correct.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def series = Seq(
    ("a", ts("2024-01-01 00:00:00"), Some(1.0)),
    ("a", ts("2024-01-01 01:00:00"), None: Option[Double]),
    ("a", ts("2024-01-01 02:00:00"), Some(3.0))
  ).toDF("k", "ts", "v")

  test("no [current, unboundedFollowing] frames anywhere in fill/as-of plans " +
    "(Spark re-evaluates such frames per row: O(n^2), measured 515s at 100k rows)") {
    val plans = Seq(
      Fill.interpolateTime(series, "ts", Seq("v"), seriesCols = Seq("k")),
      Fill.bfill(series, "ts", Seq("v"), limit = Some(1), seriesCols = Seq("k")),
      AsOf.join(
        series.select(col("ts").as("lt")),
        series.select(col("ts").as("rt"), col("v")),
        "lt", "rt", Seq("v"), direction = AsOf.Direction.Nearest)
    ).map(_.queryExecution.executedPlan.toString.toLowerCase)
    plans.foreach { p =>
      assert(!p.contains("unboundedfollowing"),
        "forward-unbounded window frame found — use the reversed running-frame form")
    }
  }

  test("parquet filter pushdown and column pruning reach the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    Seq((1L, "x", 10.0), (2L, "y", 20.0)).toDF("id", "s", "v")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("id") > 1L).select("id", "v")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,1)"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("s:string"),
      s"unused column not pruned:\n$plan")
  }

  test("metadata attach in the loader plans as a broadcast join (no shuffle)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-load")
    java.nio.file.Files.writeString(
      dir.resolve("01-01-2024 00_00_00 - 01-01-2024 01_00_00.csv"),
      "timestamp;v\n01/01/2024 00:00;1.0\n")
    val loaded = new graft.load.TimeSeriesLoader(spark,
      tsConfig = graft.core.TimeSeriesConfig(
        strategy = graft.core.ValidationStrategy.None_))
      .load(dir.toString)
    val plan = loaded.df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"metadata attach not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "metadata attach must not shuffle")
  }

  test("tumbling resample aggregates map-side (partial aggregation present)") {
    val ev = series.select(col("ts"), col("v"))
    val plan = graft.ts.Resample.upsample(ev, "ts", java.time.Duration.ofHours(1),
        graft.ts.Resample.Method.Mean, Seq("v"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_avg") || plan.contains("HashAggregate"),
      s"no partial aggregation:\n$plan")
  }
}
