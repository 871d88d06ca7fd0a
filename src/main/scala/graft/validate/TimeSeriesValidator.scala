package graft.validate

import graft.core._
import java.time.Duration

/** File-sequence continuity validation (reference ts_validator.py:50-248).
  *
  * Operates on the (small, driver-side) per-file metadata list — W3 in the
  * survey. The same lead/lag classification is available columnar via
  * graft.ts.Continuity for in-data gap scans; here the list is tiny (one entry
  * per file) so a Scala sliding(2) pass is the right tool — no reason to
  * shuffle a 1000-element list through a cluster.
  */
trait TimeSeriesValidatorTrait extends Serializable {
  def validateFiles(metas: Seq[FileMetadata]): Seq[TimeValidationIssue]
  def isValidSequence(metas: Seq[FileMetadata]): ValidationResult
}

class TimeSeriesValidator(config: TimeSeriesConfig = TimeSeriesConfig())
    extends TimeSeriesValidatorTrait {

  /** Pairwise gap/overlap scan over metadata sorted by startTime
    * (reference ts_validator.py:113-189: gap at 141-157, overlap at 159-176,
    * missing-timestamps -> no_time_info at 177-187). Strategy participates
    * HERE, exactly as in the reference: gaps are reported unless strategy is
    * NONE; an overlap is reported when strategy is STRICT (always, ignoring
    * allowOverlap) OR overlaps are disallowed OR it exceeds the threshold.
    */
  override def validateFiles(metas: Seq[FileMetadata]): Seq[TimeValidationIssue] = {
    // reference (ts_validator.py:129-132): sorted(key=start_time) raises
    // TypeError the moment a None start_time is compared, and the except
    // falls back to the ORIGINAL order — so any missing startTime means
    // "keep input order", not "sort missing to the front"
    val sorted =
      if (metas.size >= 2 && metas.exists(_.startTime.isEmpty)) metas
      else metas.sortBy(_.startTime.map(_.getTime).getOrElse(Long.MinValue))
    sorted.sliding(2).flatMap {
      case Seq(a, b) =>
        (a.endTime, b.startTime) match {
          case (Some(aEnd), Some(bStart)) =>
            val deltaMs = bStart.getTime - aEnd.getTime
            if (deltaMs > 0) {
              val d = Duration.ofMillis(deltaMs)
              if (config.strategy != ValidationStrategy.None_ &&
                  d.compareTo(config.maxAllowedGap) > 0)
                Some(TimeValidationIssue(IssueType.Gap, Some(aEnd), Some(bStart),
                  a.filepath, Some(b.filepath), Some(d)))
              else None
            } else if (deltaMs < 0) {
              val d = Duration.ofMillis(-deltaMs)
              val flagged =
                config.strategy == ValidationStrategy.Strict ||
                  !config.allowOverlap ||
                  d.compareTo(config.maxAllowedOverlap) > 0
              if (flagged)
                Some(TimeValidationIssue(IssueType.Overlap, Some(bStart), Some(aEnd),
                  a.filepath, Some(b.filepath), Some(d)))
              else None
            } else None
          case _ =>
            Some(TimeValidationIssue(IssueType.NoTimeInfo, None, None,
              a.filepath, Some(b.filepath), Some(Duration.ZERO)))
        }
      case _ => Nil // single file
    }.toVector
  }

  /** Strategy-gated verdict (reference ts_validator.py:191-248):
    * NONE -> always valid; STRICT -> any issue fatal; LENIENT -> only
    * overlaps fatal; CUSTOM -> overlaps fatal only when !allowOverlap,
    * gaps are reported but never fatal.
    */
  override def isValidSequence(metas: Seq[FileMetadata]): ValidationResult = {
    if (config.strategy == ValidationStrategy.None_)
      return ValidationResult(isValid = true)
    val issues = validateFiles(metas)
    if (issues.isEmpty) return ValidationResult(isValid = true)

    // reference messages use the wire name ("gap"/"overlap"/"no_time_info"),
    // str.capitalize()-d in the message ("Gap"/"Overlap"/"No_time_info") and
    // raw in error_type (ts_validator.py:210-216) — not the enum identifier
    def wireName(t: IssueType): String = t match {
      case IssueType.Gap        => "gap"
      case IssueType.Overlap    => "overlap"
      case IssueType.NoTimeInfo => "no_time_info"
    }
    def fail(i: TimeValidationIssue): ValidationResult = ValidationResult(false,
      Some(s"${wireName(i.issueType).capitalize} detected between files: ${i.file1} and " +
        s"${i.file2.getOrElse("?")} (${i.duration.getOrElse(Duration.ZERO)})"),
      Some(wireName(i.issueType)))

    config.strategy match {
      case ValidationStrategy.Strict => fail(issues.head)
      case ValidationStrategy.Lenient =>
        issues.find(_.issueType == IssueType.Overlap)
          .map(fail).getOrElse(ValidationResult(isValid = true))
      case _ => // Custom (reference ts_validator.py:232-247)
        if (!config.allowOverlap)
          issues.find(_.issueType == IssueType.Overlap)
            .map(fail).getOrElse(ValidationResult(isValid = true))
        else ValidationResult(isValid = true)
    }
  }
}
