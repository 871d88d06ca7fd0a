package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def points = (0 until 500)
    .map(i => (new java.sql.Timestamp(i * 600L * 1000L), i.toLong))
    .toDF("pts", "pid")

  // 40 half-open windows of 2h..6h, some overlapping, one empty
  private def intervals = (0 until 40)
    .map { i =>
      val s = i * 7200L * 1000L
      val e = s + (if (i % 7 == 0) 0L else (7200L + (i % 3) * 7200L) * 1000L)
      (new java.sql.Timestamp(s), new java.sql.Timestamp(e), i.toLong)
    }
    .toDF("start", "end", "iid")

  private def joinDf = points.join(intervals,
    col("start") <= col("pts") && col("pts") < col("end"))

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq

  test("without the rule: Spark plans the inequality join as a nested loop") {
    val plan = joinDf.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("nestedloop") || plan.contains("cartesian"),
      s"expected the pathological baseline plan:\n$plan")
  }

  test("with the rule: bucketized equi-join, no nested loop, identical rows") {
    val expected = collectPairs(joinDf)
    assert(expected.nonEmpty)
    GraftExtensions.install(spark)
    spark.conf.set(IntervalJoinRewrite.BucketConf, "3600")
    try {
      val fast = joinDf
      val plan = fast.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
        s"rewrite did not fire:\n$plan")
      assert(plan.contains("generate") || plan.contains("explode"),
        s"interval fan-out missing:\n$plan")
      assert(collectPairs(fast) == expected, "rewrite changed the results")
    } finally spark.conf.unset(IntervalJoinRewrite.BucketConf)
  }

  test("swapped orientation (intervals on the left) rewrites too") {
    val swapped = intervals.join(points,
      col("start") <= col("pts") && col("pts") < col("end"))
    val expected = collectPairs(swapped)
    GraftExtensions.install(spark)
    spark.conf.set(IntervalJoinRewrite.BucketConf, "3600")
    try {
      val plan = swapped.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
        s"swapped rewrite did not fire:\n$plan")
      assert(collectPairs(swapped) == expected)
    } finally spark.conf.unset(IntervalJoinRewrite.BucketConf)
  }

  private def assertVariantRewrites(
      cond: org.apache.spark.sql.Column, label: String): Unit = {
    val df = points.join(intervals, cond)
    val expected = collectPairs(df)
    GraftExtensions.install(spark)
    spark.conf.set(IntervalJoinRewrite.BucketConf, "3600")
    try {
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
        s"$label rewrite did not fire:\n$plan")
      assert(collectPairs(df) == expected, s"$label changed the results")
    } finally spark.conf.unset(IntervalJoinRewrite.BucketConf)
  }

  test("closed bounds (start <= ts <= end) rewrite, identical rows") {
    // closed upper: boundary points on exact interval ends now match —
    // the fixture's 600s-grid points land on many interval ends
    assertVariantRewrites(
      col("start") <= col("pts") && col("pts") <= col("end"), "closed-closed")
  }

  test("open bounds (start < ts < end) rewrite, identical rows") {
    assertVariantRewrites(
      col("start") < col("pts") && col("pts") < col("end"), "open-open")
  }

  test("mixed bounds (start < ts <= end) rewrite, identical rows") {
    assertVariantRewrites(
      col("start") < col("pts") && col("pts") <= col("end"), "open-closed")
  }

  test("PIT closed residue: IS NOT NULL guard rides along, rewrite fires") {
    // rel_pit_join's raw shape has `end IS NULL OR ts < end` (the open
    // SCD2 row) — out of the bucketing family by construction. Its closed
    // residue, guarded `end IS NOT NULL`, is this rule's job:
    val nullable = intervals.withColumn("end",
      when(col("iid") % 5 === 0, lit(null).cast("timestamp"))
        .otherwise(col("end")))
    val df = points.join(nullable,
      col("end").isNotNull && col("start") <= col("pts") &&
        col("pts") < col("end"))
    val expected = collectPairs(df)
    GraftExtensions.install(spark)
    spark.conf.set(IntervalJoinRewrite.BucketConf, "3600")
    try {
      val plan = df.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("nestedloop") && !plan.contains("cartesian"),
        s"PIT closed-residue rewrite did not fire:\n$plan")
      assert(collectPairs(df) == expected)
    } finally spark.conf.unset(IntervalJoinRewrite.BucketConf)
  }

  test("extra equality conjuncts survive; inert when conf is unset") {
    val p2 = points.withColumn("k", col("pid") % 2)
    val i2 = intervals.withColumn("k", col("iid") % 2)
    val both = p2.join(i2,
      p2("k") === i2("k") && col("start") <= col("pts") && col("pts") < col("end"))
    val expected = both.select(col("pid"), col("iid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    GraftExtensions.install(spark)
    spark.conf.set(IntervalJoinRewrite.BucketConf, "3600")
    try {
      val got = both.select(col("pid"), col("iid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(got == expected, "equality conjunct lost in rewrite")
    } finally spark.conf.unset(IntervalJoinRewrite.BucketConf)
    // inert: baseline nested loop comes back once the conf is gone
    val plan = joinDf.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("nestedloop") || plan.contains("cartesian"),
      "rule must be inert without its conf")
  }
}
