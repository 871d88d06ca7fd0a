package graft.validate

import graft.core._
import java.nio.file.Files
import java.time.Duration
import org.scalatest.funsuite.AnyFunSuite

/** W3 pairwise file gap/overlap classification + strategy gating
  * (reference ts_validator.py:113-248).
  */
class ValidatorSpec extends AnyFunSuite {
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def meta(path: String, s: String, e: String) =
    FileMetadata(path, Some(ts(s)), Some(ts(e)))

  private val contiguous = Seq(
    meta("f1", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
    meta("f2", "2024-01-01 01:00:00", "2024-01-01 02:00:00"))

  private val gapped = Seq(
    meta("f1", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
    meta("f2", "2024-01-01 03:00:00", "2024-01-01 04:00:00")) // 2h gap

  private val overlapping = Seq(
    meta("f1", "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
    meta("f2", "2024-01-01 01:30:00", "2024-01-01 03:00:00")) // 30min overlap

  test("contiguous files produce no issues") {
    assert(new TimeSeriesValidator().validateFiles(contiguous).isEmpty)
  }

  test("gap above maxAllowedGap is flagged with duration") {
    val issues = new TimeSeriesValidator().validateFiles(gapped)
    assert(issues.map(_.issueType) == Seq(IssueType.Gap))
    assert(issues.head.duration == Some(Duration.ofHours(2)))
    assert(issues.head.file1 == "f1" && issues.head.file2 == Some("f2"))
  }

  test("gap below maxAllowedGap is tolerated") {
    val cfg = TimeSeriesConfig(maxAllowedGap = Duration.ofHours(3))
    assert(new TimeSeriesValidator(cfg).validateFiles(gapped).isEmpty)
  }

  test("overlap flagged unless allowOverlap && within maxAllowedOverlap") {
    assert(new TimeSeriesValidator().validateFiles(overlapping)
      .map(_.issueType) == Seq(IssueType.Overlap))
    val tolerant = TimeSeriesConfig(allowOverlap = true,
      maxAllowedOverlap = Duration.ofHours(1))
    assert(new TimeSeriesValidator(tolerant).validateFiles(overlapping).isEmpty)
    val tooTight = TimeSeriesConfig(allowOverlap = true,
      maxAllowedOverlap = Duration.ofMinutes(10))
    assert(new TimeSeriesValidator(tooTight).validateFiles(overlapping).nonEmpty)
  }

  test("missing timestamps -> NoTimeInfo issue (reference :177-187)") {
    val metas = Seq(FileMetadata("f1"), meta("f2", "2024-01-01 00:00:00", "2024-01-01 01:00:00"))
    val issues = new TimeSeriesValidator().validateFiles(metas)
    assert(issues.map(_.issueType) == Seq(IssueType.NoTimeInfo))
    assert(issues.head.file1 == "f1")
  }

  test("any missing startTime keeps INPUT order — reference :129-132 sorted() " +
    "raises TypeError on a None key and falls back to the original list") {
    val metas = Seq(
      FileMetadata("f1"), // no times
      meta("f2", "2024-01-01 02:00:00", "2024-01-01 03:00:00"),
      meta("f3", "2024-01-01 00:00:00", "2024-01-01 01:00:00")) // earlier than f2
    val issues = new TimeSeriesValidator().validateFiles(metas)
    // input-order pairs: (f1,f2) -> no_time_info, (f2,f3) -> 3h overlap.
    // A missing-to-front sort would instead yield (f1,f3) + a (f3,f2) GAP.
    assert(issues.map(_.issueType) == Seq(IssueType.NoTimeInfo, IssueType.Overlap))
    assert(issues(1).file1 == "f2" && issues(1).file2 == Some("f3"))
  }

  test("failure message/error_type use reference wire names " +
    "(capitalize()-d in the message, raw in error_type; reference :210-216)") {
    val strict = new TimeSeriesValidator(
      TimeSeriesConfig(strategy = ValidationStrategy.Strict))
    val noInfo = strict.isValidSequence(Seq(
      FileMetadata("f1"), meta("f2", "2024-01-01 00:00:00", "2024-01-01 01:00:00")))
    assert(noInfo.errorType == Some("no_time_info"))
    assert(noInfo.errorMessage.get.startsWith(
      "No_time_info detected between files: f1 and f2"))
    val gap = strict.isValidSequence(gapped)
    assert(gap.errorType == Some("gap"))
    assert(gap.errorMessage.get.startsWith("Gap detected between files: f1 and f2"))
  }

  test("strategy gating: None_ always valid; Lenient gaps-ok overlaps-fatal; Strict any-fatal") {
    def verdict(s: ValidationStrategy, metas: Seq[FileMetadata]) =
      new TimeSeriesValidator(TimeSeriesConfig(strategy = s)).isValidSequence(metas)

    assert(verdict(ValidationStrategy.None_, overlapping).isValid)
    assert(verdict(ValidationStrategy.Lenient, gapped).isValid)
    assert(!verdict(ValidationStrategy.Lenient, overlapping).isValid)
    assert(verdict(ValidationStrategy.Lenient, overlapping).errorType == Some("overlap"))
    assert(!verdict(ValidationStrategy.Strict, gapped).isValid)
    assert(!verdict(ValidationStrategy.Strict, overlapping).isValid)
  }

  test("Strict flags overlaps even when allowOverlap tolerates them " +
    "(reference :159-165 consults strategy BEFORE allow_overlap)") {
    val cfg = TimeSeriesConfig(strategy = ValidationStrategy.Strict,
      allowOverlap = true, maxAllowedOverlap = Duration.ofHours(1))
    assert(new TimeSeriesValidator(cfg).validateFiles(overlapping)
      .map(_.issueType) == Seq(IssueType.Overlap))
    assert(!new TimeSeriesValidator(cfg).isValidSequence(overlapping).isValid)
  }

  test("Custom: gaps reported but never fatal; overlaps fatal only when " +
    "!allowOverlap (reference :232-247)") {
    def cfg(allow: Boolean) = TimeSeriesConfig(
      strategy = ValidationStrategy.Custom, allowOverlap = allow,
      maxAllowedOverlap = Duration.ofMinutes(10))
    // gap survives validateFiles yet the sequence stays VALID under Custom
    assert(new TimeSeriesValidator(cfg(allow = false)).validateFiles(gapped).nonEmpty)
    assert(new TimeSeriesValidator(cfg(allow = false)).isValidSequence(gapped).isValid)
    // overlap: fatal iff overlaps are disallowed — the 30min overlap exceeds
    // the 10min threshold so it is REPORTED either way, but with
    // allowOverlap=true the custom verdict still passes
    assert(!new TimeSeriesValidator(cfg(allow = false)).isValidSequence(overlapping).isValid)
    assert(new TimeSeriesValidator(cfg(allow = true)).validateFiles(overlapping).nonEmpty)
    assert(new TimeSeriesValidator(cfg(allow = true)).isValidSequence(overlapping).isValid)
  }

  test("FileContentValidator probes header + min rows without full read (S6)") {
    val f = Files.createTempFile("graft-content", ".csv")
    Files.writeString(f, "a;b;c\n1;2;3\n")
    val ok = new FileContentValidator(Set("a", "b"), minRows = 1)
    assert(ok.validate(f, Map.empty).isValid)
    val missing = new FileContentValidator(Set("a", "zzz"), minRows = 1)
    val r = missing.validate(f, Map.empty)
    assert(!r.isValid && r.errorType == Some("missing_columns"))
    val tooFew = new FileContentValidator(Set("a"), minRows = 5)
    assert(tooFew.validate(f, Map.empty).errorType == Some("too_few_rows"))
    val empty = Files.createTempFile("graft-empty", ".csv")
    assert(new FileContentValidator().validate(empty, Map.empty).errorType == Some("empty_file"))
  }

  test("CompositeFileValidator: first failure wins") {
    val f = Files.createTempFile("graft-comp", ".csv")
    Files.writeString(f, "a;b\n1;2\n")
    val pass = new FileContentValidator(Set("a"))
    val fail1 = new FileContentValidator(Set("x"))
    val fail2 = new FileContentValidator(Set("y"))
    val composite = new CompositeFileValidator(Seq(pass, fail1, fail2))
    val r = composite.validate(f, Map.empty)
    assert(!r.isValid)
    assert(r.errorMessage.get.contains("x"))
  }

  test("ErrorCollector is safe under concurrent adds") {
    val ec = new ErrorCollector
    val threads = (0 until 8).map { t =>
      new Thread(() => (0 until 500).foreach { i =>
        ec.add(ProcessingError(s"$t-$i", ErrorSeverity.Warning, s"T${t % 2}"))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(ec.errors.size == 4000)
    assert(ec.stats("by_type").values.sum == 4000)
  }

  test("ErrorCollector stats group by severity/type/file (A3)") {
    val ec = new ErrorCollector
    ec.add(ProcessingError("m1", ErrorSeverity.Error, "T1", Some("f1")))
    ec.add(ProcessingError("m2", ErrorSeverity.Error, "T2", Some("f1")))
    ec.add(ProcessingError("m3", ErrorSeverity.Warning, "T1", None))
    assert(ec.stats("by_severity") == Map("ERROR" -> 2, "WARNING" -> 1))
    assert(ec.stats("by_type") == Map("T1" -> 2, "T2" -> 1))
    assert(ec.bySeverity(ErrorSeverity.Error).size == 2)
    assert(ec.byFile("f1").size == 2)
  }
}
