package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.StreamingResample.{AttrPoint, CreditedConversion,
  GapEvent, IntervalClose, SeriesPoint, TouchEvent}

/** Differential fuzz for the STREAMING twins (round 13): seeded-random
  * late/out-of-order/duplicate event interleavings, replayed through the
  * stateful kernels batch-by-batch under the deterministic clock
  * (`MemoryStream.addData` + `processAllAvailable` per batch — watermarks
  * advance on DATA, never wall time), and diffed two ways:
  *
  *   1. against a single-threaded in-memory fold of the kernel's
  *      documented arrival contract (sort within batch, fold across
  *      batches, the scd2 strictly-before drop rule) — this catches state
  *      round-trip, partitioning, ordering, and watermark-plumbing bugs
  *      on EVERY draw, however mangled the interleaving;
  *   2. against the BATCH twin operator on the same data — the twin is
  *      DuckDB-oracle-green, so agreement transitively oracle-checks the
  *      stream. For scd2 the twin runs on the fold's SURVIVOR set (the
  *      events the drop policy folded) on every draw; for gaps and
  *      attribution, whose kernels fold late arrivals instead of dropping
  *      them, the twin comparison runs on the in-order draws (late draws
  *      are covered by diff 1). The windowed-upsample cases compare the
  *      append-mode post-watermark output against the batch aggregate of
  *      the retained (non-late) rows on every draw.
  *
  * Boundary pins: one crafted scd2 case sits exactly ON the late-drop
  * boundary (straggler at lastTs − 1ms drops; at lastTs folds), and the
  * gap draws include threshold-exact diffs (strictly-greater contract).
  * Upsample cases put event times on a 10 s lattice with a watermark
  * delay ≡ 3 (mod 10), so no row or window edge can ever tie the
  * watermark — the diff never depends on an engine-internal >= vs >.
  */
class StreamingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def tsMs(ms: Long): Timestamp = new Timestamp(ms)
  private val Base = 1704067200000L // 2024-01-01 UTC, ms

  // ---- interleaving generator ---------------------------------------------

  /** Split `events` (globally ts-sorted) into `nb` in-order batches, then
    * displace ~`lateFrac` of them one-or-two batches later (cross-batch
    * stragglers) and re-add ~`dupFrac` as identical copies in a later
    * batch. Within-batch order is shuffled (the kernels sort per batch).
    */
  private def interleave[T](
      rnd: scala.util.Random,
      events: Seq[T],
      nb: Int,
      lateFrac: Double,
      dupFrac: Double): Seq[Seq[T]] = {
    val cuts = Seq.fill(nb - 1)(rnd.nextInt(events.size)).sorted
    val base = mutable.ArraySeq.fill(events.size)(0)
    events.indices.foreach { i => base(i) = cuts.count(_ <= i) }
    val batches = mutable.ArraySeq.fill(nb)(mutable.Buffer.empty[T])
    events.zipWithIndex.foreach { case (e, i) =>
      val b =
        if (rnd.nextDouble() < lateFrac)
          math.min(nb - 1, base(i) + 1 + rnd.nextInt(2))
        else base(i)
      batches(b) += e
      if (rnd.nextDouble() < dupFrac)
        batches(math.min(nb - 1, b + rnd.nextInt(2))) += e
    }
    batches.map(b => rnd.shuffle(b.toSeq)).toSeq
  }

  // ---- scd2 ---------------------------------------------------------------

  private def genAttrEvents(rnd: scala.util.Random): Seq[AttrPoint] = {
    val attrs = Seq("bronze", "silver", "gold", "platinum")
    Seq("u1", "u2", "u3").flatMap { s =>
      var t = Base + rnd.nextInt(1000) * 1000L
      var a = attrs(rnd.nextInt(attrs.size))
      (0 until 25).map { _ =>
        t += (1 + rnd.nextInt(3000)) * 1000L // unique, strictly increasing
        if (rnd.nextDouble() < 0.3) a = attrs(rnd.nextInt(attrs.size))
        AttrPoint(s, tsMs(t), a)
      }
    }.sortBy(_.ts.getTime)
  }

  /** Mirror of scd2Stream's contract; also returns the folded survivors. */
  private def refScd2(batches: Seq[Seq[AttrPoint]])
      : (Seq[(String, String, Long, Long, Long)], Seq[AttrPoint]) = {
    final case class St(attr: String, since: Long, n: Long, lastTs: Long)
    val state = mutable.Map[String, St]()
    val out = mutable.Buffer[(String, String, Long, Long, Long)]()
    val folded = mutable.Buffer[AttrPoint]()
    for (b <- batches; (series, evs) <- b.groupBy(_.series).toSeq.sortBy(_._1);
         p <- evs.sortBy(_.ts.getTime)) {
      state.get(series) match {
        case None =>
          state(series) = St(p.attr, p.ts.getTime, 1L, p.ts.getTime)
          folded += p
        case Some(st) if p.ts.getTime < st.lastTs => () // late: drop
        case Some(st) if st.attr == p.attr =>
          state(series) = st.copy(n = st.n + 1, lastTs = p.ts.getTime)
          folded += p
        case Some(st) =>
          out += ((series, st.attr, st.since, p.ts.getTime, st.n))
          state(series) = St(p.attr, p.ts.getTime, 1L, p.ts.getTime)
          folded += p
      }
    }
    (out.toSeq, folded.toSeq)
  }

  private def runScd2Stream(batches: Seq[Seq[AttrPoint]], qn: String)
      : Seq[(String, String, Long, Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AttrPoint]
    val q = StreamingResample.scd2Stream(input.toDS())
      .writeStream.format("memory").queryName(qn)
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        if (b.nonEmpty) input.addData(b)
        q.processAllAvailable()
      }
      spark.table(qn).as[IntervalClose].collect().toSeq
        .map(c => (c.series, c.attr, c.valid_from.getTime,
          c.valid_to.getTime, c.n_events))
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
    }
  }

  (0 until 8).foreach { i =>
    test(s"stream-fuzz scd2 draw $i: stream == arrival fold == batch twin on survivors") {
      val rnd = new scala.util.Random(1000 + i)
      val batches = interleave(rnd, genAttrEvents(rnd), 3 + rnd.nextInt(4),
        lateFrac = if (i % 2 == 0) 0.15 else 0.0,
        dupFrac = if (i % 3 == 0) 0.08 else 0.0)
      val (want, survivors) = refScd2(batches)
      val got = runScd2Stream(batches, s"graft_fz_scd2_$i")
      assert(got.sorted == want.sorted,
        s"stream vs fold: ${got.sorted.diff(want.sorted)} / ${want.sorted.diff(got.sorted)}")
      // batch twin on the survivor set: closed rows must match exactly
      val twin = graft.ops.Incremental
        .scd2Intervals(survivors.toDF(), "series", Seq("ts"), "attr")
        .filter(!col("is_current"))
        .select(col("series"), col("attr"), col("valid_from"),
          col("valid_to"), col("n_events"))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getTimestamp(2).getTime,
          r.getTimestamp(3).getTime, r.getLong(4)))
      assert(twin.sorted == want.sorted,
        s"twin vs fold: ${twin.sorted.diff(want.sorted)} / ${want.sorted.diff(twin.sorted)}")
    }
  }

  test("stream-fuzz scd2 under RocksDBStateStoreProvider: a late+dup draw " +
    "matches the arrival fold — provider × kernel coverage beyond the " +
    "gap/dedup parity test") {
    val confKey = "spark.sql.streaming.stateStore.providerClass"
    val rnd = new scala.util.Random(4242)
    val batches = interleave(rnd, genAttrEvents(rnd), 4,
      lateFrac = 0.15, dupFrac = 0.08)
    val (want, _) = refScd2(batches)
    val prev = spark.conf.getOption(confKey)
    spark.conf.set(confKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val got = runScd2Stream(batches, "graft_fz_scd2_rocks")
      assert(got.sorted == want.sorted,
        s"rocksdb stream vs fold: ${got.sorted.diff(want.sorted)} / " +
          s"${want.sorted.diff(got.sorted)}")
    } finally prev match {
      case Some(p) => spark.conf.set(confKey, p)
      case None => spark.conf.unset(confKey)
    }
  }

  test("stream-fuzz scd2 late-drop boundary: lastTs-1ms drops, lastTs folds") {
    val t0 = Base
    val t1 = Base + 100000L
    val batches = Seq(
      Seq(AttrPoint("u1", tsMs(t0), "bronze"), AttrPoint("u1", tsMs(t1), "gold")),
      // straggler 1ms BEFORE the folded frontier: strictly late -> drop;
      // then a tie AT the frontier with the same attr: folds, n -> 2
      Seq(AttrPoint("u1", tsMs(t1 - 1), "silver"), AttrPoint("u1", tsMs(t1), "gold")),
      Seq(AttrPoint("u1", tsMs(t1 + 50000L), "platinum")))
    val want = Seq(
      ("u1", "bronze", t0, t1, 1L),
      ("u1", "gold", t1, t1 + 50000L, 2L))
    val (ref, survivors) = refScd2(batches)
    assert(ref.sorted == want.sorted)
    val got = runScd2Stream(batches, "graft_fz_scd2_boundary")
    assert(got.sorted == want.sorted, s"got $got")
    assert(survivors.size == 4) // silver straggler folded nowhere
  }

  // ---- gap detection ------------------------------------------------------

  private def genSeriesPoints(rnd: scala.util.Random): Seq[SeriesPoint] =
    Seq("s1", "s2", "s3").flatMap { s =>
      var t = Base + rnd.nextInt(1000) * 1000L
      (0 until 30).map { _ =>
        // steps land ON the 100 s threshold sometimes: 100 s exactly must
        // NOT gap (strictly-greater contract), 101 s must
        t += (Seq(50, 99, 100, 101, 150, 400)(rnd.nextInt(6))) * 1000L
        SeriesPoint(s, tsMs(t))
      }
    }.sortBy(_.ts.getTime)

  /** Mirror of detectGapsStream's NoTimeout contract. */
  private def refGaps(batches: Seq[Seq[SeriesPoint]], thrMs: Long)
      : Seq[(String, Long, Long)] = {
    val last = mutable.Map[String, Long]()
    val out = mutable.Buffer[(String, Long, Long)]()
    for (b <- batches; (series, evs) <- b.groupBy(_.series).toSeq.sortBy(_._1)) {
      var prev = last.get(series)
      for (p <- evs.sortBy(_.ts.getTime)) {
        val t = p.ts.getTime
        prev match {
          case Some(pt) if t - pt > thrMs => out += ((series, pt, t))
          case _ => ()
        }
        prev = Some(prev.fold(t)(math.max(_, t)))
      }
      prev.foreach(last(series) = _)
    }
    out.toSeq
  }

  (0 until 6).foreach { i =>
    val late = i >= 3
    test(s"stream-fuzz gaps draw $i (${if (late) "late" else "in-order"}): " +
      "stream == arrival fold" + (if (!late) " == batch twin" else "")) {
      implicit val sqlCtx = spark.sqlContext
      val rnd = new scala.util.Random(2000 + i)
      val events = genSeriesPoints(rnd)
      val batches = interleave(rnd, events, 3 + rnd.nextInt(3),
        lateFrac = if (late) 0.12 else 0.0, dupFrac = if (late) 0.05 else 0.0)
      val want = refGaps(batches, 100000L)
      val input = MemoryStream[SeriesPoint]
      val qn = s"graft_fz_gaps_$i"
      val q = StreamingResample.detectGapsStream(input.toDS(),
          java.time.Duration.ofMillis(100000L))
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      val got =
        try {
          batches.foreach { b =>
            if (b.nonEmpty) input.addData(b)
            q.processAllAvailable()
          }
          spark.table(qn).as[GapEvent].collect().toSeq
            .map(g => (g.series, g.gap_start.getTime, g.gap_end.getTime))
        } finally {
          q.stop()
          spark.catalog.dropTempView(qn)
        }
      assert(got.sorted == want.sorted,
        s"stream vs fold: ${got.sorted.diff(want.sorted)} / ${want.sorted.diff(got.sorted)}")
      if (!late) {
        // in-order interleaving == globally sorted data: the batch twin
        // (oracle-green gapsDf, threshold = expected + minGap) must agree
        val twin = graft.ts.Continuity.gapsDf(events.toDF(), "ts",
            java.time.Duration.ofSeconds(60), java.time.Duration.ofSeconds(40),
            Seq("series"))
          .select(col("series"), col("gap_start"), col("gap_end"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getTimestamp(1).getTime,
            r.getTimestamp(2).getTime))
        assert(twin.sorted == want.sorted,
          s"twin vs fold: ${twin.sorted.diff(want.sorted)} / ${want.sorted.diff(twin.sorted)}")
      }
    }
  }

  // ---- last-touch attribution ---------------------------------------------

  private def genTouchEvents(rnd: scala.util.Random): Seq[TouchEvent] = {
    val types = Seq("click", "view", "signup", "purchase", "refund")
    Seq("c1", "c2", "c3").flatMap { s =>
      var t = Base + rnd.nextInt(1000) * 1000L
      (0 until 25).map { _ =>
        t += (1 + rnd.nextInt(2000)) * 1000L
        TouchEvent(s, tsMs(t), types(rnd.nextInt(types.size)),
          1 + rnd.nextInt(500))
      }
    }.sortBy(_.ts.getTime)
  }

  /** Mirror of attributionStream's contract (no drop policy: late touches
    * fold into state in arrival order).
    */
  private def refAttr(batches: Seq[Seq[TouchEvent]])
      : Seq[(String, Long, String, Long)] = {
    val chan = mutable.Map[String, String]()
    val out = mutable.Buffer[(String, Long, String, Long)]()
    val channels = Set("click", "view", "signup")
    for (b <- batches; (series, evs) <- b.groupBy(_.series).toSeq.sortBy(_._1);
         e <- evs.sortBy(_.ts.getTime)) {
      if (e.eventType == "purchase")
        out += ((series, e.ts.getTime, chan.getOrElse(series, "direct"), e.cents))
      if (channels.contains(e.eventType)) chan(series) = e.eventType
    }
    out.toSeq
  }

  (0 until 4).foreach { i =>
    val late = i >= 2
    test(s"stream-fuzz attribution draw $i (${if (late) "late" else "in-order"}): " +
      "stream == arrival fold" + (if (!late) " == batch twin rollup" else "")) {
      implicit val sqlCtx = spark.sqlContext
      val rnd = new scala.util.Random(3000 + i)
      val events = genTouchEvents(rnd)
      val batches = interleave(rnd, events, 3 + rnd.nextInt(3),
        lateFrac = if (late) 0.15 else 0.0, dupFrac = 0.0)
      val want = refAttr(batches)
      val input = MemoryStream[TouchEvent]
      val qn = s"graft_fz_attr_$i"
      val q = StreamingResample.attributionStream(input.toDS(), "purchase",
          Set("click", "view", "signup"))
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      val got =
        try {
          batches.foreach { b =>
            if (b.nonEmpty) input.addData(b)
            q.processAllAvailable()
          }
          spark.table(qn).as[CreditedConversion].collect().toSeq
            .map(c => (c.series, c.ts.getTime, c.channel, c.cents))
        } finally {
          q.stop()
          spark.catalog.dropTempView(qn)
        }
      assert(got.sorted == want.sorted,
        s"stream vs fold: ${got.sorted.diff(want.sorted)} / ${want.sorted.diff(got.sorted)}")
      if (!late) {
        // the batch twin aggregates per channel; roll the stream up the
        // same way and the two oracle-linked readouts must agree
        val twin = graft.ops.Behavior.lastTouchAttribution(events.toDF(),
            "series", Seq("ts"), "eventType", col("cents"), "purchase",
            Seq("click", "view", "signup"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val rollup = want.groupBy(_._3).map { case (ch, rows) =>
          (ch, rows.size.toLong, rows.map(_._4).sum)
        }.toSeq
        assert(twin.sorted == rollup.sorted,
          s"twin ${twin.sorted} vs stream rollup ${rollup.sorted}")
      }
    }
  }

  // ---- windowed upsample: post-watermark append vs batch aggregate --------

  (0 until 4).foreach { i =>
    test(s"stream-fuzz upsample draw $i: append-mode finalized windows == " +
      "batch aggregate of retained rows") {
      implicit val sqlCtx = spark.sqlContext
      val rnd = new scala.util.Random(4000 + i)
      // 10 s lattice event times; watermark delay 123 s (== 3 mod 10) so
      // no event or window edge can tie the watermark
      val wmDelayMs = 123000L
      val events = {
        var t = Base
        (0 until 80).map { _ =>
          t += (1 + rnd.nextInt(12)) * 10000L
          (tsMs(t), (rnd.nextInt(1000) + 1).toDouble)
        }
      }
      val nb = 4 + rnd.nextInt(3)
      val batches = interleave(rnd, events, nb, lateFrac = 0.15, dupFrac = 0.0)
      // harness watermark replay: wm during batch k = max event ts over
      // batches < k, minus the delay. A late row survives while its WINDOW
      // is still open — the engine drops it only once the window's end has
      // passed the watermark (state for that window is already evicted),
      // not merely when the row's own ts is behind the watermark
      val winMs = 300000L
      var wm = Long.MinValue
      val retained = mutable.Buffer[(Timestamp, Double)]()
      batches.foreach { b =>
        b.foreach { case (t, v) =>
          val wEnd = Math.floorDiv(t.getTime, winMs) * winMs + winMs
          if (wEnd > wm) retained += ((t, v))
        }
        if (b.nonEmpty)
          wm = math.max(wm, b.map(_._1.getTime).max - wmDelayMs)
      }
      // sentinel far in the future finalizes every real window decisively
      val sentinel = (tsMs(Base + 365L * 86400000L), 1.0)
      val input = MemoryStream[(Timestamp, Double)]
      val qn = s"graft_fz_upsample_$i"
      val q = StreamingResample.upsampleStream(
          input.toDS().toDF("ts", "v"), "ts", java.time.Duration.ofMinutes(5),
          Seq("v"), watermark = java.time.Duration.ofMillis(wmDelayMs))
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").start()
      val got =
        try {
          batches.foreach { b =>
            if (b.nonEmpty) input.addData(b)
            q.processAllAvailable()
          }
          input.addData(Seq(sentinel))
          q.processAllAvailable()
          spark.table(qn).collect().toSeq
            .map(r => (r.getTimestamp(0).getTime, r.getDouble(1),
              r.getDouble(2), r.getLong(3)))
        } finally {
          q.stop()
          spark.catalog.dropTempView(qn)
        }
      val want = StreamingResample.upsampleStream(
          retained.toSeq.toDF("ts", "v"), "ts",
          java.time.Duration.ofMinutes(5), Seq("v"))
        .collect().toSeq
        .map(r => (r.getTimestamp(0).getTime, r.getDouble(1),
          r.getDouble(2), r.getLong(3)))
      assert(got.sorted == want.sorted,
        s"stream vs batch-on-retained: ${got.sorted.diff(want.sorted)} / " +
          s"${want.sorted.diff(got.sorted)} (retained ${retained.size}/${events.size})")
    }
  }
}
