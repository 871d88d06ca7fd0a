package graft.meta

import graft.core._
import graft.validate.TimeSeriesValidator
import java.time.Duration

/** File-level time-series report (A5/A8 in the survey; reference
  * generate_time_series_report, load_file.py:1023-1102: total span, per-file
  * coverage with overlap adjustment, issue list). Metadata-plane: operates on
  * the driver-side Seq[FileMetadata], never row data.
  */
object FileReport {

  final case class TimeSeriesFileReport(
      totalFiles: Int,
      filesWithTimeInfo: Int,
      startTime: Option[java.sql.Timestamp],
      endTime: Option[java.sql.Timestamp],
      totalSpan: Option[Duration],
      coveredDuration: Duration,
      coveragePercent: Double,
      issues: Seq[TimeValidationIssue]
  )

  def generate(
      metas: Seq[FileMetadata],
      config: TimeSeriesConfig = TimeSeriesConfig()
  ): TimeSeriesFileReport = {
    val timed = metas.filter(m => m.startTime.isDefined && m.endTime.isDefined)
    val start = timed.flatMap(_.startTime).sortBy(_.getTime).headOption
    val end = timed.flatMap(_.endTime).sortBy(_.getTime).lastOption
    val span = for (s <- start; e <- end)
      yield Duration.ofMillis(e.getTime - s.getTime)

    // overlap-adjusted union of per-file intervals (reference :1045-1068):
    // sweep sorted intervals, count each instant once
    val sorted = timed
      .map(m => (m.startTime.get.getTime, m.endTime.get.getTime))
      .sortBy(_._1)
    var coveredMs = 0L
    var curStart = Long.MinValue
    var curEnd = Long.MinValue
    sorted.foreach { case (s, e) =>
      if (s > curEnd) {
        if (curEnd > curStart) coveredMs += curEnd - curStart
        curStart = s; curEnd = e
      } else if (e > curEnd) curEnd = e
    }
    if (curEnd > curStart) coveredMs += curEnd - curStart

    val coverage = span match {
      case Some(s) if s.toMillis > 0 => 100.0 * coveredMs / s.toMillis
      case _ => if (timed.isEmpty) 0.0 else 100.0
    }
    TimeSeriesFileReport(
      totalFiles = metas.size,
      filesWithTimeInfo = timed.size,
      startTime = start,
      endTime = end,
      totalSpan = span,
      coveredDuration = Duration.ofMillis(coveredMs),
      coveragePercent = coverage,
      issues = new TimeSeriesValidator(config).validateFiles(metas)
    )
  }
}
