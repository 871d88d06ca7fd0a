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
    * missing-timestamps -> no_time_info at 177-187).
    */
  override def validateFiles(metas: Seq[FileMetadata]): Seq[TimeValidationIssue] = {
    val sorted = metas.sortBy(_.startTime.map(_.getTime).getOrElse(Long.MinValue))
    sorted.sliding(2).flatMap {
      case Seq(a, b) =>
        (a.endTime, b.startTime) match {
          case (Some(aEnd), Some(bStart)) =>
            val deltaMs = bStart.getTime - aEnd.getTime
            if (deltaMs > 0) {
              val d = Duration.ofMillis(deltaMs)
              if (d.compareTo(config.maxAllowedGap) > 0)
                Some(TimeValidationIssue(IssueType.Gap, Some(aEnd), Some(bStart),
                  a.filepath, Some(b.filepath), Some(d)))
              else None
            } else if (deltaMs < 0) {
              val d = Duration.ofMillis(-deltaMs)
              val tolerated =
                config.allowOverlap && d.compareTo(config.maxAllowedOverlap) <= 0
              if (!tolerated)
                Some(TimeValidationIssue(IssueType.Overlap, Some(bStart), Some(aEnd),
                  a.filepath, Some(b.filepath), Some(d)))
              else None
            } else None
          case _ =>
            val missing = if (a.endTime.isEmpty) a else b
            Some(TimeValidationIssue(IssueType.NoTimeInfo, None, None,
              missing.filepath, None, None))
        }
      case _ => Nil // single file
    }.toVector
  }

  /** Strategy-gated verdict (reference ts_validator.py:191-248):
    * NONE -> always valid; LENIENT -> overlaps fatal, gaps OK;
    * STRICT -> any issue fatal; CUSTOM -> thresholds already applied in
    * validateFiles, any surviving issue fatal.
    */
  override def isValidSequence(metas: Seq[FileMetadata]): ValidationResult =
    config.strategy match {
      case ValidationStrategy.None_ => ValidationResult(isValid = true)
      case ValidationStrategy.Lenient =>
        val overlaps = validateFiles(metas).filter(_.issueType == IssueType.Overlap)
        if (overlaps.isEmpty) ValidationResult(isValid = true)
        else ValidationResult(false,
          Some(s"${overlaps.size} overlap(s) between consecutive files"),
          Some("overlap"))
      case ValidationStrategy.Strict | ValidationStrategy.Custom =>
        val issues = validateFiles(metas)
        if (issues.isEmpty) ValidationResult(isValid = true)
        else ValidationResult(false,
          Some(s"${issues.size} time-series issue(s): " +
            issues.map(_.issueType).distinct.mkString(", ")),
          Some(issues.head.issueType.toString.toLowerCase))
    }
}
