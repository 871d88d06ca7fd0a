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

  test("funnelDropoff: survivors accumulate from the top, step conversion " +
    "is exact ppm, absent levels surface as zeros") {
    val levels = Seq(0, 0, 1, 1, 1, 3).map(l => ("u", l)).toDF("user", "level")
    val out = Behavior.funnelDropoff(levels, nSteps = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(r.fieldIndex("conv_ppm"))))).toMap
    // levels: 0->2 users, 1->3, 2->0, 3->1; survivors: 6, 4, 1, 1
    assert(out(0L) == ((2L, 6L, None)))
    assert(out(1L) == ((3L, 4L, Some(666666L))), out(1L).toString)
    assert(out(2L) == ((0L, 1L, Some(250000L))))
    assert(out(3L) == ((1L, 1L, Some(1000000L))))
  }

  test("lastTouchAttribution: last strictly-prior channel wins, no prior " +
    "touch falls to direct, non-channel events never take credit") {
    val rows = Seq(
      // u1: click then view then purchase -> view (the LAST touch) credited
      ("u1", 1L, "click", 0L), ("u1", 2L, "view", 0L),
      ("u1", 3L, "purchase", 100L),
      // u1 again: the purchase itself must not credit later conversions;
      // an intervening error is not a channel -> still view
      ("u1", 4L, "error", 0L), ("u1", 5L, "purchase", 50L),
      // u2: purchase with no prior events at all -> direct
      ("u2", 1L, "purchase", 70L),
      // u3: channel touch AFTER the purchase doesn't count -> direct
      ("u3", 1L, "purchase", 30L), ("u3", 2L, "click", 0L)
    ).toDF("u", "pos", "ev", "cents")
    val out = Behavior.lastTouchAttribution(rows, "u", Seq("pos"), "ev",
        col("cents"), "purchase", Seq("click", "view", "signup"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("view") == ((2L, 150L)), s"both u1 purchases credit view: $out")
    assert(out("direct") == ((2L, 100L)), s"u2 + u3 are direct: $out")
    assert(!out.contains("click"), "click was never the LAST touch")
  }

  test("welchTTest: matches the closed form on a known pair of samples; " +
    "degenerate group gives null t") {
    val rows = (Seq(2L, 4L, 6L, 8L).map(("a", _)) ++
      Seq(1L, 2L, 3L).map(("b", _))).toDF("g", "v")
    val r = Behavior.welchTTest(rows, "g", "a", "b", col("v")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getDouble(r.fieldIndex("mean_a")) == 5.0)
    assert(r.getDouble(r.fieldIndex("mean_b")) == 2.0)
    // var_a = 20/3, var_b = 1; se2 = 20/12 + 1/3 = 2.0; t = 3/sqrt(2)
    val t = r.getDouble(r.fieldIndex("t_stat"))
    assert(math.abs(t - 3.0 / math.sqrt(2.0)) < 1e-12, t.toString)
    val dfw = r.getDouble(r.fieldIndex("df_welch"))
    // se2^2 / ((5/3)^2/3 + (1/3)^2/2) = 4 / (25/27 + 1/18) ~ 4.09
    assert(math.abs(dfw - 4.0 / (25.0 / 27.0 + 1.0 / 18.0)) < 1e-9, dfw.toString)
    val one = Seq(("a", 5L), ("b", 1L), ("b", 2L)).toDF("g", "v")
    val r2 = Behavior.welchTTest(one, "g", "a", "b", col("v")).head()
    assert(r2.isNullAt(r2.fieldIndex("t_stat")), "n_a < 2 must null the test")
  }

  test("mannWhitneyU: doubled ranks match the hand-computed tied example; " +
    "all-tied data nulls z") {
    // values: a={1,3,3}, b={2,3,5}. sorted: 1(a) 2(b) 3 3 3(a,a,b) 5(b)
    // avg ranks: 1, 2, 4, 4, 4, 6 -> R_A = 1+4+4 = 9, U_A = 9 - 6 = 3
    // ties: one block of t=3 -> tie_term = 27 - 3 = 24
    val df = (Seq(1L, 3L, 3L).map(("a", _)) ++ Seq(2L, 3L, 5L).map(("b", _)))
      .toDF("g", "v")
    val r = Behavior.mannWhitneyU(df, "g", "a", "b", col("v")).head()
    assert(r.getLong(r.fieldIndex("n_a")) == 3 && r.getLong(r.fieldIndex("n_b")) == 3)
    assert(r.getDouble(r.fieldIndex("u2_a")) == 6.0, "2*U_A")
    assert(r.getDouble(r.fieldIndex("tie_term")) == 24.0)
    assert(r.getDouble(r.fieldIndex("u_a")) == 3.0)
    // z = (U - nA*nB/2) / sqrt(nA*nB/12 * ((N+1) - T/(N(N-1))))
    //   = (3 - 4.5) / sqrt(0.75 * (7 - 24/30)) = -1.5/sqrt(4.65)
    val z = r.getDouble(r.fieldIndex("z"))
    assert(math.abs(z - (-1.5 / math.sqrt(0.75 * (7.0 - 24.0 / 30.0)))) < 1e-12,
      z.toString)
    val tied = (Seq(4L, 4L).map(("a", _)) ++ Seq(4L, 4L).map(("b", _)))
      .toDF("g", "v")
    val rt = Behavior.mannWhitneyU(tied, "g", "a", "b", col("v")).head()
    assert(rt.isNullAt(rt.fieldIndex("z")), "zero variance must null z")
  }

  test("ksTest: D numerator matches the hand-computed ECDF gap; ties " +
    "absorbed before evaluation") {
    // a={1,2,3,4}, b={3,4,5,6}: after v=2, Fa=2/4 vs Fb=0/4 -> |2*4-0*4|=8
    // is the max gap (D = 0.5)
    val df = (Seq(1L, 2L, 3L, 4L).map(("a", _)) ++
      Seq(3L, 4L, 5L, 6L).map(("b", _))).toDF("g", "v")
    val r = Behavior.ksTest(df, "g", "a", "b", col("v")).head()
    assert(r.getLong(r.fieldIndex("n_a")) == 4 && r.getLong(r.fieldIndex("n_b")) == 4)
    assert(r.getDouble(r.fieldIndex("d_num")) == 8.0)
    assert(r.getDouble(r.fieldIndex("d")) == 0.5)
    // identical samples: every ECDF step matches exactly -> D = 0
    val same = (Seq(1L, 2L).map(("a", _)) ++ Seq(1L, 2L).map(("b", _)))
      .toDF("g", "v")
    val rs = Behavior.ksTest(same, "g", "a", "b", col("v")).head()
    assert(rs.getDouble(rs.fieldIndex("d_num")) == 0.0)
    // a tie at the same value counts BOTH rows before the gap is measured:
    // a={1,1}, b={1,2} -> at v=1: |2*2 - 1*2| = 2 (not 4)
    val tied = (Seq(1L, 1L).map(("a", _)) ++ Seq(1L, 2L).map(("b", _)))
      .toDF("g", "v")
    val rt = Behavior.ksTest(tied, "g", "a", "b", col("v")).head()
    assert(rt.getDouble(rt.fieldIndex("d_num")) == 2.0)
  }

  test("chiSquared: marginals, expected ppm, and micro-unit cells match the " +
    "hand-computed 2x2 table; independent table gives zero") {
    // table: r1=(10, 20), r2=(30, 40): N=100; cell(r1,c1): r=30, c=40,
    //   e = 12, (o*N - r*c)^2/(r*c*N) = (1000-1200)^2/(30*40*100) = 1/3
    val rows =
      Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
        Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val out = Behavior.chiSquared(rows.toDF("r", "c"), col("r"), col("c"))
      .collect().map(x => (x.getString(0), x.getString(1)) -> x).toMap
    val c11 = out(("r1", "c1"))
    assert(c11.getLong(c11.fieldIndex("o")) == 10)
    assert(c11.getLong(c11.fieldIndex("r_total")) == 30)
    assert(c11.getLong(c11.fieldIndex("c_total")) == 40)
    assert(c11.getLong(c11.fieldIndex("n_total")) == 100)
    assert(c11.getLong(c11.fieldIndex("exp_ppm")) == 12000000,
      "expected count 12 events = 12e6 ppm")
    // (10*100 - 30*40)^2 / (30*40*100) = 40000/120000 = 1/3 -> 333333 u
    assert(c11.getLong(c11.fieldIndex("chi2_u")) == 333333)
    // exactly independent table -> every cell contributes 0
    val ind =
      Seq.fill(10)(("r1", "c1")) ++ Seq.fill(10)(("r1", "c2")) ++
        Seq.fill(10)(("r2", "c1")) ++ Seq.fill(10)(("r2", "c2"))
    val zeros = Behavior.chiSquared(ind.toDF("r", "c"), col("r"), col("c"))
      .agg(sum(col("chi2_u"))).head().getLong(0)
    assert(zeros == 0)
  }

  test("associationRules: hand-computed support/conf/lift, directed both ways") {
    // 10 baskets: {1,2} x4, {1} x4, {2} x1, {1,2,3} x1
    // c1=9, c2=6, c12=5, N=10
    val rows =
      (1L to 4L).flatMap(b => Seq((b, 1L), (b, 2L))) ++
        (5L to 8L).map(b => (b, 1L)) ++ Seq((9L, 2L)) ++
        Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 2L)) // dup item dedups
    val got = Behavior.associationRules(rows.toDF("bk", "it"),
        "bk", "it", minPairCount = 2L, topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // pair (1,2): cab=5 >= 2 kept; pairs with 3 have cab=1, dropped
    assert(got.keySet == Set((1L, 2L), (2L, 1L)))
    val (cab, sup, conf12, lift) = got((1L, 2L))
    assert(cab == 5L && sup == 500000L)
    assert(conf12 == 5000000L / 9L, "conf 5/9")
    // lift = 5*10/(9*6) identical both directions
    assert(lift == 5L * 10L * 1000000L / (9L * 6L))
    assert(got((2L, 1L))._4 == lift)
    assert(got((2L, 1L))._3 == 5000000L / 6L, "conf 5/6")
  }

  test("linearAttribution: credits conserve the conversion value exactly, " +
    "remainder lands on the FIRST touch, no-touch conversions go direct") {
    import org.apache.spark.sql.functions._
    // u1: view, click, purchase(100) -> base 50/50, rem 0
    // u2: click, view, view, purchase(100) -> base 33 each, rem 1 to click
    // u3: purchase(70) with no touches -> direct 70
    val rows = Seq(
      ("u1", 1L, "view", 0L), ("u1", 2L, "click", 0L),
      ("u1", 3L, "purchase", 100L),
      ("u2", 1L, "click", 0L), ("u2", 2L, "view", 0L),
      ("u2", 3L, "view", 0L), ("u2", 4L, "purchase", 100L),
      ("u3", 1L, "purchase", 70L)
    ).toDF("u", "pos", "typ", "cents")
    val got = Behavior.linearAttribution(rows.toDF(), "u", Seq("pos"), "typ",
        col("cents"), "purchase", Seq("click", "view", "signup"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("conversions_touched"), r.getAs[Long]("revenue_cents")))
      .toMap
    // click: u1 50 + u2 (33 + rem 1) = 84, touched by 2 conversions
    assert(got("click") == ((2L, 84L)), s"got $got")
    // view: u1 50 + u2 66 = 116
    assert(got("view") == ((2L, 116L)))
    assert(got("signup") == ((0L, 0L)))
    assert(got("direct") == ((1L, 70L)))
    // conservation: total credited == total converted
    assert(got.values.map(_._2).sum == 270L)
  }

  test("windowFunnel: chain must fit the window measured from ITS click; " +
    "a later click restarts the clock (greedy latest-chain optimality)") {
    import org.apache.spark.sql.functions._
    def ev(u: String, h: Int, typ: String, id: Long) =
      (u, id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00"), typ)
    val rows = Seq(
      // u1: click@0, signup@1, purchase@2 -> full chain in window
      ev("u1", 0, "click", 1), ev("u1", 1, "signup", 2),
      ev("u1", 2, "purchase", 3),
      // u2: click@0, signup@10 (outside 4h window) -> level 1 only
      ev("u2", 0, "click", 4), ev("u2", 10, "signup", 5),
      // u3: click@0, click@8, signup@9, purchase@10 — the FIRST click is
      // stale but the second one's chain completes: greedy must reach 3
      ev("u3", 0, "click", 6), ev("u3", 8, "click", 7),
      ev("u3", 9, "signup", 8), ev("u3", 10, "purchase", 9),
      // u4: signup/purchase with no click -> level 0 (not counted anywhere)
      ev("u4", 1, "signup", 10), ev("u4", 2, "purchase", 11)
    ).toDF("u", "eid", "t", "typ")
    val got = Behavior.windowFunnel(rows, "u", Seq("t", "eid"), "typ",
        Seq("click", "signup", "purchase"), 4L * 3600L * 1000000L, "t")
      .collect().map(r => r.getInt(0) -> r.getAs[Long]("n_reached")).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L, 3 -> 2L), s"got $got")
  }
}
