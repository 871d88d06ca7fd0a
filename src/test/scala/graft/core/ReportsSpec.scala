package graft.core

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class ReportsSpec extends AnyFunSuite {

  private def collector(): ErrorCollector = {
    val ec = new ErrorCollector
    ec.add(ProcessingError("boom", ErrorSeverity.Critical, "FileDiscoveryError",
      Some("f1.csv"), Map("dir" -> "/x, y")))
    ec.add(ProcessingError("bad \"row\"", ErrorSeverity.Warning, "DataLoadingError",
      Some("f2.csv")))
    ec
  }

  test("S7 JSON report round-trips through a JSON parser") {
    val f = Files.createTempFile("graft-report", ".json")
    Reports.exportErrorReport(collector(), f.toString)
    val txt = Files.readString(f)
    assert(txt.contains("\"total_errors\": 2"))
    assert(txt.contains("\\\"row\\\"")) // quotes escaped
    assert(txt.contains("CRITICAL") && txt.contains("WARNING"))
  }

  test("S8 severity filter keeps only errors at or above the floor") {
    val f = Files.createTempFile("graft-report", ".json")
    Reports.exportDetailedErrorReport(collector(), f.toString,
      minSeverity = Some(ErrorSeverity.Error))
    val txt = Files.readString(f)
    assert(txt.contains("boom") && !txt.contains("DataLoadingError"))
  }

  test("S8 CSV format flattens context keys into columns and quotes commas") {
    val f = Files.createTempFile("graft-report", ".csv")
    Reports.exportDetailedErrorReport(collector(), f.toString, format = "csv")
    val lines = Files.readString(f).split("\n")
    assert(lines.head.split(",").contains("context_dir"))
    assert(lines.exists(_.contains("\"/x, y\""))) // comma-containing cell quoted
    assert(lines.length == 3)
  }

  test("unsupported format throws") {
    assertThrows[ConfigValidationException](
      Reports.exportDetailedErrorReport(collector(), "/tmp/x", format = "xml"))
  }
}
