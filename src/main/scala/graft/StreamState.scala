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
  * state, not eviction; series cardinality is the ONLY growth axis. The
  * watermark-evicting kernels (gap detect, stream_curate dedup) are
  *   pinned separately by their deterministic-clock suites.
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
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
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
    val nSeries = base.select("series").distinct().count()
    val schema = spark.read.parquet(in).schema

    def probe(name: String)(build: String => org.apache.spark.sql.DataFrame): Unit = {
      val q = build(in).writeStream.format("noop")
        .option("checkpointLocation", s"$tmp/ckpt_$name")
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      println(s"\n### $name @ $sfDir ($nBatches micro-batches, " +
        s"distinct_series=$nSeries)")
      println("| batch | input_rows | state_rows | state_MB |")
      println("|---|---|---|---|")
      q.recentProgress.foreach { p =>
        val so = p.stateOperators.headOption
        println(s"| ${p.batchId} | ${p.numInputRows} | " +
          s"${so.map(_.numRowsTotal).getOrElse(-1L)} | " +
          f"${so.map(_.memoryUsedBytes).getOrElse(0L) / 1048576.0}%.1f |")
      }
      val last = q.recentProgress.lastOption.flatMap(_.stateOperators.headOption)
      val ok = last.exists(_.numRowsTotal <= nSeries)
      println(s"bound: state_rows ${last.map(_.numRowsTotal).getOrElse(-1L)} " +
        s"<= distinct_series $nSeries : ${if (ok) "HOLDS" else "VIOLATED"}")
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

    import scala.jdk.CollectionConverters._
    val walk = java.nio.file.Files.walk(tmp)
    try walk.iterator().asScala.toSeq.sortBy(p => -p.getNameCount)
      .foreach(p => java.nio.file.Files.deleteIfExists(p))
    finally walk.close()
    spark.stop()
  }
}
