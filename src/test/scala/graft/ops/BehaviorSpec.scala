package graft.ops

import java.time.Duration

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("view", "click", "buy")

  private def funnel(rows: Seq[(String, String, String)]) =
    Behavior.windowFunnel(
      rows.map { case (u, tss, e) => (u, ts(tss), e) }.toDF("u", "ts", "ev"),
      "u", "ts", "ev", steps, Duration.ofHours(2))
      .collect().map(r => r.getString(0) ->
        (r.getInt(r.fieldIndex("level")), Option(r.getTimestamp(1)))).toMap

  test("windowFunnel: level counts only in-order chains inside the window") {
    val out = funnel(Seq(
      // u1: full chain within 2h -> level 3
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 10:30:00", "click"),
      ("u1", "2024-01-01 11:00:00", "buy"),
      // u2: buy BEFORE the click -> chain stops at 2
      ("u2", "2024-01-01 10:00:00", "view"),
      ("u2", "2024-01-01 09:00:00", "buy"),
      ("u2", "2024-01-01 10:30:00", "click"),
      // u3: click arrives after the 2h window -> level 1
      ("u3", "2024-01-01 10:00:00", "view"),
      ("u3", "2024-01-01 12:30:00", "click"),
      // u4: never starts the funnel -> level 0, t_1 null
      ("u4", "2024-01-01 10:00:00", "click"),
      ("u4", "2024-01-01 10:10:00", "buy")
    ))
    assert(out("u1")._1 == 3)
    assert(out("u2")._1 == 2)
    assert(out("u3")._1 == 1)
    assert(out("u4") == ((0, None)))
  }

  test("windowFunnel picks the EARLIEST chain: a later qualifying view is " +
    "ignored even when it would convert deeper") {
    // the earliest view (08:00) anchors the window; the 10:00 view would
    // convert fully, but earliest-chain semantics ignore it -> level 1
    // (ClickHouse's any-chain windowFunnel would say 3 — this divergence
    // is the documented contract)
    val out = funnel(Seq(
      ("u1", "2024-01-01 08:00:00", "view"),
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 10:30:00", "click"),
      ("u1", "2024-01-01 11:00:00", "buy")
    ))
    assert(out("u1")._1 == 1)
    // control: drop the 08:00 view and the SAME tail converts fully
    val control = funnel(Seq(
      ("u1", "2024-01-01 10:00:00", "view"),
      ("u1", "2024-01-01 10:30:00", "click"),
      ("u1", "2024-01-01 11:00:00", "buy")
    ))
    assert(control("u1")._1 == 3)
  }

  test("windowFunnel plan: one exchange serves all step windows and the " +
    "final per-series dedup") {
    val df = Seq(("u", ts("2024-01-01 10:00:00"), "view")).toDF("u", "ts", "ev")
    val plan = Behavior.windowFunnel(df, "u", "ts", "ev", steps,
        Duration.ofHours(1))
      .queryExecution.executedPlan.toString.toLowerCase
    assert("exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"step windows + dedup must share one exchange:\n$plan")
  }

  test("cohortRetention: cohorts by first bucket, ppm exact, k=0 is 1e6") {
    val df = Seq(
      ("a", 10L), ("a", 11L), ("a", 12L),
      ("b", 10L), ("b", 12L),
      ("c", 11L), ("c", 12L),
      ("d", 10L)
    ).toDF("s", "b")
    val out = Behavior.cohortRetention(df, "s", col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // cohort 10 = {a, b, d}; k=1 -> {a}; k=2 -> {a, b}
    assert(out((10L, 0L)) == ((3L, 1000000L)))
    assert(out((10L, 1L)) == ((1L, 333333L)))
    assert(out((10L, 2L)) == ((2L, 666666L)))
    // cohort 11 = {c}, retained at k=1
    assert(out((11L, 0L)) == ((1L, 1000000L)))
    assert(out((11L, 1L)) == ((1L, 1000000L)))
    assert(!out.keys.exists(_._1 == 12L), "no series first-appears in bucket 12")
  }
}
