package graft.ts

import java.time.Duration

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def points = Seq(
    ("u", ts("2024-01-01 10:00:00"), 1L),
    ("u", ts("2024-01-01 10:29:59"), 2L),
    ("u", ts("2024-01-01 10:30:00"), 3L),
    ("u", ts("2024-01-01 12:00:00"), 4L),
    ("v", ts("2024-01-01 10:00:00"), 5L) // other key: never matches u's windows
  ).toDF("k", "ts", "pid")

  private def intervals = Seq(
    ("u", ts("2024-01-01 10:00:00"), ts("2024-01-01 10:30:00"), "a"),
    ("u", ts("2024-01-01 10:15:00"), ts("2024-01-01 13:00:00"), "b"), // spans 6 buckets
    ("u", ts("2024-01-01 11:00:00"), ts("2024-01-01 11:00:00"), "empty")
  ).toDF("k", "t0", "t1", "iid")

  test("half-open containment under equality keys; multi-bucket intervals " +
    "match without duplicates; empty intervals match nothing") {
    val out = IntervalJoin.intervalJoin(points, intervals, "ts", "t0", "t1",
        Duration.ofMinutes(30), equalKeys = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getString(1)))
    val got = out.sorted.toSeq
    // pid1: in a (start inclusive); pid2: in a and b; pid3: ts == a.end ->
    // only b; pid4: inside b (bucket 4 of 6); pid5: key v, nothing
    assert(got == Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (4L, "b")),
      s"got $got")
    assert(out.length == out.distinct.length, "bucketization must not duplicate")
  }

  test("plan: bucketized range join is an equi hash/sort-merge join, " +
    "never a nested loop or cartesian") {
    val plan = IntervalJoin.intervalJoin(points, intervals, "ts", "t0", "t1",
        Duration.ofMinutes(30), equalKeys = Seq("k"))
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("broadcastnestedloop") &&
      !plan.contains("cartesianproduct"),
      s"range join must stay an equi-join:\n$plan")
    assert(plan.contains("join"), s"expected a join:\n$plan")
  }
}
