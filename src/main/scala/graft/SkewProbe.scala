package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Measured skew probe: what a hot key actually costs this engine, and
  * which design answers it — numbers recorded in SCALE.md.
  *
  * Fixture: the sf events/lineitem tables with ~30% of rows remapped to
  * ONE key (`pmod(id, 10) < 3` → key 1) — a 30%-hot key is far past the
  * usual Zipf head and makes every skew pathology visible at probe scale.
  *
  * Four probes, each timed against the uniform baseline on the SAME data
  * volume:
  *   1. decomposable hot-key agg (sum/count groupBy): expected ~no cost —
  *      map-side partial aggregation collapses the hot key per partition
  *      BEFORE the shuffle, so the reducer sees ≤ #partitions rows/key.
  *      Also proves `Skew.saltedAggregate` returns identical results.
  *   2. hot-key DISTINCT count: `countDistinct` final-aggregates one key's
  *      whole value set in one reducer; the fix is distinct-then-count
  *      (distinct shuffles on (key, value) — uniform again; the following
  *      count collapses map-side). Both timed, results asserted equal.
  *   3. hot SERIES window: `Window.partitionBy(key)` is semantically one
  *      sorted task for the hot series; the design answer for single-
  *      series analytics is the chunked ghost-row machinery
  *      (`RangeSeries.withGlobalBounded` — the ts_global_rolling spine).
  *      Both run the same 32-row bounded sum on the hot series; values
  *      asserted equal, times compared.
  *   4. skewed sort-merge join: lineitem with a 30%-hot orderkey ⋈ orders,
  *      broadcast off. With AQE skew thresholds at data scale, the final
  *      plan must show the hot partition SPLIT (`skew=true` on the SMJ) —
  *      the runtime mitigation a static planner can't do.
  *
  * Usage: scripts/run.sh graft.SkewProbe <sfDir>
  */
object SkewProbe {

  private def time[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = body
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .config("spark.sql.unionOutputPartitioning", "false")
      // AQE skew-join thresholds sized to probe data (defaults target
      // 256MB+ partitions; the MECHANISM is what's under test)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = Queries.table(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("ts"),
        round(col("value") * 100).cast("long").as("cents"))
    val uniform = ev.localCheckpoint(true)
    val skewed = ev
      .withColumn("user_id",
        when(pmod(col("event_id"), lit(10)) < 3, lit(1L)).otherwise(col("user_id")))
      .localCheckpoint(true)
    val nRows = uniform.count()
    val hotRows = skewed.filter(col("user_id") === 1L).count()
    println(s"SKEWPROBE fixture rows=$nRows hot_key_rows=$hotRows " +
      f"(${hotRows * 100.0 / nRows}%.1f%%)")

    // ---- 1. decomposable agg: hot vs uniform vs salted ----
    def aggCount(df: DataFrame): Long =
      df.groupBy(col("user_id"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n")).count()
    val (_, tAggU) = time(aggCount(uniform))
    val (_, tAggS) = time(aggCount(skewed))
    val naiveHot = skewed.groupBy(col("user_id"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    val salted = ops.Skew.saltedAggregate(skewed, Seq("user_id"), Seq(
      "s" -> (sum(col("cents")), sum(col("s"))),
      "n" -> (count(lit(1)), sum(col("n")))))
    val saltDiff = naiveHot.exceptAll(salted.select("user_id", "s", "n")).count() +
      salted.select("user_id", "s", "n").exceptAll(naiveHot).count()
    println(f"SKEWPROBE agg_decomposable uniform=$tAggU%.2fs hot=$tAggS%.2fs " +
      s"salted_result_diff=$saltDiff (map-side combine pre-collapses the hot key)")

    // ---- 2. distinct count: countDistinct vs distinct-then-count ----
    def cd(df: DataFrame): Array[(Long, Long)] =
      df.groupBy(col("user_id")).agg(countDistinct(col("cents")).as("d"))
        .as[(Long, Long)].collect().sortBy(_._1)
    def dtc(df: DataFrame): Array[(Long, Long)] =
      df.select(col("user_id"), col("cents")).distinct()
        .groupBy(col("user_id")).agg(count(lit(1)).as("d"))
        .as[(Long, Long)].collect().sortBy(_._1)
    val (cdRes, tCd) = time(cd(skewed))
    val (dtcRes, tDtc) = time(dtc(skewed))
    require(cdRes.sameElements(dtcRes), "distinct-then-count diverged")
    println(f"SKEWPROBE distinct_hot countDistinct=$tCd%.2fs " +
      f"distinct_then_count=$tDtc%.2fs (identical results)")

    // ---- 3. hot series window vs chunked ghost rows ----
    // the hot series is replicated (distinct event_ids, same timestamps)
    // to the scale where the single-task sort actually hurts — at probe
    // sizes the one-task window is FAST (sorting a few hundred thousand
    // rows in one thread is ~1s); the chunked machinery's multi-job floor
    // only pays off once one series outgrows a task, which is exactly the
    // regime a 30%-hot key reaches at corpus scale
    val rep = 64
    val hot = skewed.filter(col("user_id") === 1L)
      .select(col("event_id"), col("ts"), col("cents"))
      .withColumn("r", explode(lit((0 until rep).toArray)))
      .select((col("event_id") * rep + col("r")).as("event_id"),
        col("ts"), col("cents"))
      .repartition(cpus.toInt)
      .localCheckpoint(true)
    val hotN = hot.count()
    val w = Window.orderBy(col("ts"), col("event_id")).rowsBetween(-31, 0)
    def sumAll(df: DataFrame, c: String): Long =
      df.agg(sum(col(c))).head().getLong(0)
    val (winSum, tWin) = time(sumAll(
      hot.select(sum(col("cents")).over(w).as("ws")), "ws"))
    val (chunkSum, tChunk) = time(sumAll(
      ts.RangeSeries.withGlobalBounded(hot,
        key = struct(col("ts"), col("event_id")), window = 32,
        aggs = Seq(ts.RangeSeries.Bounded("ws", sum(col("cents")))),
        bucketKey = Some(expr("unix_micros(ts)"))), "ws"))
    require(winSum == chunkSum, s"chunked rolling diverged: $winSum vs $chunkSum")
    println(f"SKEWPROBE hot_series_window rows=$hotN " +
      f"single_task_window=$tWin%.2fs " +
      f"chunked_rangeseries=$tChunk%.2fs (identical checksum $winSum)")

    // ---- 4. AQE skew-join split ----
    val li = Queries.table(spark, dir, "lineitem")
      .select(col("l_orderkey"), round(col("l_extendedprice") * 100)
        .cast("long").as("cents"))
    val hotKey = li.head().getLong(0)
    val liSkew = li.withColumn("l_orderkey",
      when(pmod(col("cents"), lit(10)) < 3, lit(hotKey)).otherwise(col("l_orderkey")))
      .localCheckpoint(true)
    val o = Queries.table(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = liSkew.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("s"))
      // execute THIS Dataset (count() would plan a separate query and the
      // inspected AQE plan would still read isFinalPlan=false)
      val (n: Int, tJoin) = time(joined.collect().length)
      val plan = joined.queryExecution.executedPlan.toString
      val split = plan.contains("skew=true") &&
        plan.contains("AQEShuffleRead skewed")
      println(f"SKEWPROBE skew_join rows=$n time=$tJoin%.2fs " +
        s"aqe_split=$split (SortMergeJoin(skew=true) + AQEShuffleRead skewed)")
      if (!split) sys.exit(1)

      // ---- 4b. AQE skew split under DEFAULT thresholds ----
      // 4 proves the mechanism with thresholds sized to probe data; this
      // variant proves the 256 MB+ PRODUCTION path: thresholds restored to
      // Spark defaults (256 MB skewedPartitionThresholdInBytes, factor 5,
      // 64 MB advisory), hot rows replicated until the hot key's shuffle
      // partition genuinely crosses 256 MB compressed, split re-asserted.
      Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
        .foreach(spark.conf.unset)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // hot rows fan out rep2x with entropy-preserving cents (cents*rep2+r
      // keeps the bytes incompressible, so the 256 MB bar is honest);
      // uniform rows stay single so the median partition stays small. The
      // factor is sized from the measured hot count: at ~5.3 compressed
      // bytes per (key, cents) row (measured via task shuffle-read metrics
      // at sf1 — 34M rows read back as 172 MB), 64M rows lands the hot
      // partition at ~330 MB, comfortably past the 256 MB default bar at
      // ANY input sf, without ballooning a large sf's fixture further.
      val hotCnt = liSkew.filter(col("l_orderkey") === hotKey).count()
      val targetRows =
        sys.env.getOrElse("SPARK_GRAFT_SKEW_TARGET_ROWS", "64000000").toLong
      val rep2 = math.max(1L, (targetRows + hotCnt - 1) / hotCnt).toInt
      val liBig = liSkew
        .withColumn("r", explode(sequence(lit(0),
          when(col("l_orderkey") === hotKey, lit(rep2 - 1)).otherwise(lit(0)))))
        .select(col("l_orderkey"),
          (col("cents") * rep2 + col("r")).as("cents"))
      val joinedBig = liBig.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("s"))
      val (nBig: Int, tBig) = time(joinedBig.collect().length)
      val planBig = joinedBig.queryExecution.executedPlan.toString
      // the skewed read node prints "AQEShuffleRead coalesced and skewed"
      // when the same side's tiny uniform partitions also coalesce —
      // match both spellings
      val splitBig = planBig.contains("skew=true") &&
        "AQEShuffleRead (coalesced and )?skewed".r
          .findFirstIn(planBig).isDefined
      println(f"SKEWPROBE skew_join_default_thresholds rep=$rep2 rows=$nBig " +
        f"time=$tBig%.2fs aqe_split=$splitBig " +
        "(256MB+ hot partition, Spark default AQE thresholds)")
      if (!splitBig) sys.exit(1)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.stop()
  }
}
