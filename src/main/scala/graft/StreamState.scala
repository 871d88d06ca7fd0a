package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Streaming state-growth probe (round-12 directive 4): replay the
  * `events` table of an sf directory through the stateful streaming
  * kernels in time-ordered micro-batches and dump, per batch, the state
  * store's row count and bytes next to the input row count — the numbers
  * that prove the state BOUND each kernel's scaladoc claims:
  *
  *   - `attribution` (stream_attribution): state = ONE string per series
  *     → state rows must equal the distinct series seen so far and go
  *     FLAT once all series have appeared, no matter how many more
  *     events stream in.
  *   - `scd2` (stream_scd2): state = (attr, 3 longs) per series — same
  *     flat-at-#series bound.
  *
  * Neither kernel uses a timeout (NoTimeout): the bound is per-key O(1)
  * state, not eviction; series cardinality is the ONLY growth axis.
  *
  * Round-13 extension (VERDICT r12 next #4) — the EVICTION kernels, whose
  * claimed bound is the WATERMARK HORIZON, not series cardinality:
  *
  *   - `gap` (stream_gap_detect with idleTimeout): event-time timeout
  *     drops a series' state once the watermark passes lastTs + idle.
  *     Expected profile: state ≈ series active within the idle horizon —
  *     FLAT across batches while cumulative distinct series keeps growing
  *     (the OPPOSITE of the NoTimeout profile, which grows to #series and
  *     then flattens only because the series pool is exhausted).
  *   - `dedup` (stream_curate's dropDuplicatesWithinWatermark): state =
  *     one 256-bit hash per distinct payload INSIDE the horizon; the
  *     watermark evicts. Same flat-at-horizon profile expected.
  *
  * For both, the asserted bound is max-state-over-batches < half the
  * total distinct keys ever seen — with a horizon ≪ timeline that margin
  * is enormous when eviction works and IMPOSSIBLE when it silently
  * doesn't (no eviction ⇒ final state = all keys ever, the 100 TB leak).
  *
  * Batching: the input is written as `nBatches` range-partitioned parquet
  * files in event-time order and read back with maxFilesPerTrigger=1, so
  * each micro-batch is one time slice — state growth vs time, not one
  * giant batch.
  *
  * Usage: scripts/run.sh graft.StreamState <sfDir> [attr|scd2] [nBatches]
  * Output: one `| batch | input_rows | state_rows | state_MB |` table per
  * kernel (markdown, for SCALE.md) + a `distinct_series=` footer.
  */
object StreamState {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val which = if (args.length > 1) args(1) else "both"
    val nBatches = if (args.length > 2) args(2).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // GRAFT_STATE_STORE=rocksdb swaps the state backend for the one a
    // production 100 TB deployment would run (the in-memory HDFS-backed
    // default caps state at executor heap; RocksDB spills to local disk,
    // which is what makes the 100M-series ≈ 27 GB extrapolation in
    // SCALE.md deployable). Same kernels, same replay, same bound
    // assertions — only the provider changes, so a parity run proves the
    // bounds are kernel properties, not default-provider artifacts.
    val stateStore = sys.env.getOrElse("GRAFT_STATE_STORE", "memory")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false")
    if (stateStore == "rocksdb") builder.config(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("graft-streamstate")
    val in = s"$tmp/in"
    // same synthetic per-event timestamp as the stream_* queries: unique,
    // event-ordered; range-partition by ts so file k is time slice k
    val base = Queries.table(spark, sfDir, "events")
      .select(col("user_id").cast("string").as("series"),
        timestamp_micros(lit(1704067200000000L) +
          col("event_id") * 1000000L).as("ts"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    base.repartitionByRange(nBatches, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(in)
    // the file stream source orders tied-mtime files ARBITRARILY (all 12
    // parts land in the same write second), which scrambled the replay's
    // time slices at sf1 — stagger mtimes so file k really is slice k
    locally {
      val parts = new java.io.File(in).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (f, k) =>
        f.setLastModified(1704067200000L + k * 1000L)
      }
    }
    val nSeries = base.select("series").distinct().count()
    val schema = spark.read.parquet(in).schema

    def probe(name: String, nKeys: Long = nSeries, keysDesc: String = "distinct_series",
        evicting: Boolean = false)(
        build: String => org.apache.spark.sql.DataFrame): Unit = {
      val q = build(in).writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt_$name")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      println(s"\n### $name @ $sfDir ($nBatches micro-batches, " +
        s"$keysDesc=$nKeys, stateStore=$stateStore)")
      println("| batch | input_rows | state_rows | state_MB |")
      println("|---|---|---|---|")
      q.recentProgress.foreach { p =>
        val so = p.stateOperators.headOption
        println(s"| ${p.batchId} | ${p.numInputRows} | " +
          s"${so.map(_.numRowsTotal).getOrElse(-1L)} | " +
          f"${so.map(_.memoryUsedBytes).getOrElse(0L) / 1048576.0}%.1f |")
      }
      val states = q.recentProgress.toSeq
        .flatMap(_.stateOperators.headOption.map(_.numRowsTotal))
      val ok =
        if (evicting) {
          // the horizon bound: state must never approach the total key
          // population — a silent no-evict bug would drive max state to
          // nKeys exactly; half is an enormous margin when horizon ≪
          // timeline (measured steady state is ~one batch's distinct keys)
          states.nonEmpty && states.max < nKeys / 2
        } else states.lastOption.exists(_ <= nKeys)
      val shown = if (evicting) s"max ${if (states.isEmpty) -1L else states.max} < $keysDesc/2 ${nKeys / 2}"
        else s"final ${states.lastOption.getOrElse(-1L)} <= $keysDesc $nKeys"
      println(s"bound: state_rows $shown : ${if (ok) "HOLDS" else "VIOLATED"}")
      if (!ok) sys.exit(2)
    }

    if (which == "attr" || which == "both") probe("attribution") { dir =>
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .selectExpr("series", "ts", "event_type as eventType", "cents")
        .as[graft.streaming.StreamingResample.TouchEvent]
      graft.streaming.StreamingResample.attributionStream(
        stream, conversionType = "purchase",
        channelTypes = Set("click", "view", "signup")).toDF()
    }
    if (which == "scd2" || which == "both") probe("scd2") { dir =>
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .selectExpr("series", "ts", "event_type as attr")
        .as[graft.streaming.StreamingResample.AttrPoint]
      graft.streaming.StreamingResample.scd2Stream(stream).toDF()
    }

    // ==== eviction kernels (r13): bound = watermark horizon, not #keys ====
    // ScaleUp replicas occupy disjoint synthetic-ts bands (event_id offsets
    // of k·10^7 s), so at sf1/sf10 each replica's series go idle forever
    // once its band passes — exactly the arrive-then-idle shape a 100 TB
    // stream has, and the shape that makes a missing eviction measurable.
    if (which == "gap" || which == "evict") probe("gap_evict",
      evicting = true) { dir =>
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .selectExpr("series", "ts")
        .as[graft.streaming.StreamingResample.SeriesPoint]
      graft.streaming.StreamingResample.detectGapsStream(
        stream, threshold = java.time.Duration.ofMinutes(30),
        idleTimeout = Some(java.time.Duration.ofHours(1))).toDF()
    }
    if (which == "dedup" || which == "evict") {
      val payload = concat_ws(":", col("series"), col("cents"))
      val nPayloads = base.select(payload).distinct().count()
      probe("dedup_evict", nKeys = nPayloads, keysDesc = "distinct_payloads",
        evicting = true) { dir =>
        graft.streaming.StreamingResample.dedupStream(
          spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(dir)
            .withColumn("payload", concat_ws(":", col("series"), col("cents"))),
          tsCol = "ts", contentCol = "payload",
          watermark = java.time.Duration.ofHours(1))
      }
    }

    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(tmp)
    try walk.iterator().asScala.toSeq.sortBy(p => -p.getNameCount)
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
    spark.stop()
  }
}
