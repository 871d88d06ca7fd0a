package graft.ts

import graft.SparkSpec
import graft.ops.Sketch
import org.apache.spark.sql.functions._

class SlidingDistinctSpec extends SparkSpec {
  import spark.implicits._

  // (ts-bucket 0..4, id): bucket 3 is empty — must not appear in output
  private val events = Seq(
    (0L, 1L), (0L, 2L), (0L, 1L),
    (1L, 2L), (1L, 3L),
    (2L, 1L),
    (4L, 9L))

  private def asDf = events
    .map { case (b, id) => (new java.sql.Timestamp(b * 3600L * 1000L), id) }
    .toDF("t", "id")

  private val HourUs = 3600L * 1000000L

  test("exact: trailing-2 window matches brute force; empty buckets skipped") {
    val got = SlidingDistinct
      .exact(asDf, "t", "id", HourUs, windowBuckets = 2)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // brute force: bkt 0 -> {1,2}; 1 -> {1,2,3}; 2 -> {1,2,3}; 4 -> {9}
    // (bkt 3 empty: not emitted; bkt 2's window is {1,2}∪{1} = wait —
    //  window 2 at bkt 2 covers bkt 1..2 = {2,3}∪{1} = {1,2,3})
    assert(got == Map(0L -> 2L, 1L -> 3L, 2L -> 3L, 4L -> 1L))
  }

  test("window=1 degenerates to per-bucket distinct") {
    val got = SlidingDistinct
      .exact(asDf, "t", "id", HourUs, windowBuckets = 1)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 4L -> 1L))
  }

  test("interval-difference exact == contribution-expansion exactExpand " +
    "on random fixtures (sparse + dense + every window width)") {
    val rnd = new scala.util.Random(5)
    (1 to 4).foreach { trial =>
      val w = 1 + rnd.nextInt(6)
      val span = if (trial % 2 == 0) 12 else 60 // dense vs gappy buckets
      val evs = (0 until 400).map { _ =>
        (rnd.nextInt(span).toLong, rnd.nextInt(25).toLong)
      }
      val df = evs
        .map { case (b, id) => (new java.sql.Timestamp(b * 3600L * 1000L), id) }
        .toDF("t", "id")
      val a = SlidingDistinct.exact(df, "t", "id", HourUs, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val b = SlidingDistinct.exactExpand(df, "t", "id", HourUs, w)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(a == b, s"trial $trial w=$w span=$span")
    }
  }

  test("streaming: the HLL register path runs as a stateful streaming " +
    "aggregation and converges to the batch registers") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Sketch
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the stateful core of hllSliding is registers-per-bucket (max-merge);
    // the expansion + estimate are stateless reads of that table
    val in = MemoryStream[(Long, Long)]
    val q = Sketch.hllRegisters(
        in.toDF().toDF("bkt", "id"), "id", Seq("bkt"))
      .writeStream.format("memory").queryName("sliding_regs")
      .outputMode("complete").start()
    try {
      val (h1, h2) = events.splitAt(4)
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val streamed = spark.table("sliding_regs").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      val batch = Sketch.hllRegisters(
          events.toDF("bkt", "id"), "id", Seq("bkt"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(streamed == batch, "streamed registers diverged from batch")
    } finally q.stop()
  }

  test("hllSliding == hllEstimate over the brute-force window union") {
    val w = 2
    val got = SlidingDistinct
      .hllSliding(asDf, "t", "id", HourUs, windowBuckets = w)
      .collect()
      .map(r => r.getAs[Long]("bkt") -> r.getAs[Long]("est_u"))
      .toMap
    // reference: materialize each window's id multiset directly, sketch it
    val windows = events.map(_._1).distinct.map { b =>
      b -> events.filter { case (eb, _) => eb >= b - (w - 1) && eb <= b }
    }
    val flat = windows.flatMap { case (b, es) => es.map { case (_, id) => (b, id) } }
    val ref = Sketch
      .hllEstimate(
        Sketch.hllRegisters(flat.toDF("bkt", "id"), "id", Seq("bkt")),
        Seq("bkt"))
      .collect()
      .map(r => r.getAs[Long]("bkt") -> r.getAs[Long]("est_u"))
      .toMap
    assert(got == ref, "register merge must equal sketching the union")
  }
}
