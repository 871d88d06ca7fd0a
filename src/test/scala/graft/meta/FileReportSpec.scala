package graft.meta

import graft.core._
import java.time.Duration
import org.scalatest.funsuite.AnyFunSuite

class FileReportSpec extends AnyFunSuite {
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def m(p: String, s: String, e: String) =
    FileMetadata(p, Some(ts(s)), Some(ts(e)))

  test("A8: overlap-adjusted coverage counts each instant once") {
    // f1 00-02, f2 01-03 (1h overlap), f3 04-05 -> covered 3h + 1h of 5h span
    val report = FileReport.generate(Seq(
      m("f1", "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      m("f2", "2024-01-01 01:00:00", "2024-01-01 03:00:00"),
      m("f3", "2024-01-01 04:00:00", "2024-01-01 05:00:00")))
    assert(report.totalFiles == 3)
    assert(report.totalSpan == Some(Duration.ofHours(5)))
    assert(report.coveredDuration == Duration.ofHours(4))
    assert(math.abs(report.coveragePercent - 80.0) < 1e-9)
    // overlap f1/f2 flagged as an issue by the default config
    assert(report.issues.exists(_.issueType == IssueType.Overlap))
  }

  test("files without time info are counted but excluded from coverage") {
    val report = FileReport.generate(Seq(
      FileMetadata("untimed"),
      m("f1", "2024-01-01 00:00:00", "2024-01-01 01:00:00")))
    assert(report.totalFiles == 2)
    assert(report.filesWithTimeInfo == 1)
    assert(report.coveragePercent == 100.0)
    assert(report.issues.exists(_.issueType == IssueType.NoTimeInfo))
  }
}
