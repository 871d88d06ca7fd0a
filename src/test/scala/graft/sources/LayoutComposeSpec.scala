package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The storage planes COMPOSE: a day-partitioned + bucketed table must
  * give directory pruning AND an exchange-free join in one plan — each
  * lever was pinned in isolation (PartitionedLayoutSpec, PlanSpec's
  * bucketed-join test); this pins that neither disables the other.
  */
class LayoutComposeSpec extends SparkSpec {
  import spark.implicits._

  test("rel_layout_compose: day predicate prunes directories AND the " +
    "bucket-key join plans with zero shuffle exchanges, in ONE plan") {
    val facts = (0 until 10).flatMap { d =>
      (0 until 40).map { i =>
        (ts(f"2024-03-${d + 1}%02d 0${i % 8}:00:00"), i.toLong % 16, d * 40L + i)
      }
    }.toDF("ts", "user_id", "amount")
    val users = (0 until 10).flatMap { d =>
      (0 until 16).map(u => (ts(f"2024-03-${d + 1}%02d 01:00:00"), u.toLong, s"u$u"))
    }.toDF("ts", "user_id", "name")
    PartitionedLayout.writePartitionedBucketed(
      facts, "ts", "graft_compose_facts", Seq("user_id"), 4)
    PartitionedLayout.writePartitionedBucketed(
      users, "ts", "graft_compose_users", Seq("user_id"), 4)
    // AQE's wrapper hides the scan nodes from collect() pre-execution, and
    // a broadcast join would bypass (not disprove) the bucket layout —
    // pin the SMJ path on the bare physical plan
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val f = PartitionedLayout.readDaysTable(
        spark, "graft_compose_facts", "2024-03-03", "2024-03-04")
      val u = PartitionedLayout.readDaysTable(
        spark, "graft_compose_users", "2024-03-03", "2024-03-04")
      val joined = f.hint("merge")
        .join(u.select(col("user_id"), col("name")), Seq("user_id"))
      joined.write.mode("overwrite").format("noop").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")

      // 1) no shuffle anywhere: the bucket layout carries the join
      assert(!plan.toLowerCase.contains("exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // 2) BOTH scans prune to the 2 matching day directories of 10
      val scans = joined.queryExecution.executedPlan.collectLeaves().collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.length == 2, plan)
      scans.foreach { s =>
        assert(s.metadata.get("PartitionFilters").exists(_.contains("event_date")),
          s.metadata.toString)
        assert(s.selectedPartitions.partitionCount == 2,
          s"expected 2 of 10 day dirs, got ${s.selectedPartitions.partitionCount}")
        assert(s.metadata.get("SelectedBucketsCount").exists(_.contains("4 out of 4")),
          s"scan must be bucket-aware: ${s.metadata}")
      }
      // 3) correctness through the composed layout: 2 days x 40 facts,
      // each matching its user's snapshot row from BOTH selected days
      val got = joined.select(col("amount"), col("name")).collect()
      assert(got.length == 160, got.length.toString)
      // amount = d*40 + i with user_id = i%16, so user = (amount%40)%16
      assert(got.forall(r => r.getString(1) == s"u${r.getLong(0) % 40 % 16}"))
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
      spark.sql("DROP TABLE IF EXISTS graft_compose_facts")
      spark.sql("DROP TABLE IF EXISTS graft_compose_users")
    }
  }
}
