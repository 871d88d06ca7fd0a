package graft.sources

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PartitionedLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("day-partitioned write prunes at the directory level: the range " +
    "scan carries PartitionFilters and touches only matching day files") {
    val out = Files.createTempDirectory("graft-daypart").toString
    val rows = (0 until 10).flatMap { d =>
      (0 until 5).map(i => (ts(f"2024-03-${d + 1}%02d 0$i:00:00"), d * 5L + i))
    }.toDF("ts", "v")
    PartitionedLayout.writePartitionedByDay(rows, "ts", out)

    val scan = PartitionedLayout.readDays(spark, out, "2024-03-03", "2024-03-04")
    // pruning is visible in the scan node: the date range rides
    // PartitionFilters (NOT PushedFilters — it never reaches row I/O) ...
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // ... and the FileSourceScan selects exactly the 2 matching day
    // directories of the 10 written (df.inputFiles can't show this — it
    // reflects the unpruned file index)
    val scanExec = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scanExec.metadata.get("PartitionFilters").exists(_.contains("event_date")),
      scanExec.metadata.toString)
    assert(scanExec.selectedPartitions.partitionCount == 2,
      s"expected 2 of 10 day directories, got " +
        s"${scanExec.selectedPartitions.partitionCount}")
    val selected = scanExec.selectedPartitions.toPartitionArray
      .map(_.filePath.toString).distinct
    assert(selected.nonEmpty && selected.forall(f =>
      f.contains("event_date=2024-03-03") || f.contains("event_date=2024-03-04")),
      selected.mkString("\n"))
    // correctness: exactly the two days' rows, values intact
    val got = scan.select("v").as[Long].collect().sorted
    assert(got.toSeq == (10L to 19L), got.toSeq.toString)
  }
}
