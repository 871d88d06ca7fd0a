package graft.meta

import graft.core.FileMetadata
import java.nio.file.Path
import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter
import scala.util.matching.Regex

/** Filename -> FileMetadata extraction (reference file_metadata_parser.py:21-51).
  * Driver-side by design: file listing/metadata is metadata-plane work in Spark
  * too; row data never touches the driver.
  */
trait MetadataExtractor extends Serializable {
  def extractMetadata(path: Path): FileMetadata
  def isValidFilename(filename: String): Boolean
}

/** No-op extractor: accepts any filename, extracts no times
  * (reference file_metadata_parser.py:54-114).
  */
class DefaultMetadataExtractor extends MetadataExtractor {
  override def extractMetadata(path: Path): FileMetadata =
    FileMetadata(path.toString)
  override def isValidFilename(filename: String): Boolean = true
}

object TimeMetadataExtractor {
  /** reference file_metadata_parser.py:143 */
  val DefaultPattern: String =
    """.*?(\d{2}-\d{2}-\d{4}\s+\d{2}_\d{2}_\d{2})\s+-\s+(\d{2}-\d{2}-\d{4}\s+\d{2}_\d{2}_\d{2})\.csv"""
  /** reference file_metadata_parser.py:123 ("%m-%d-%Y %H_%M_%S") */
  val DefaultTimeFormat: String = "MM-dd-yyyy HH_mm_ss"
}

/** Start/end-time-in-filename extractor
  * (reference file_metadata_parser.py:117-215; pattern at :143, strptime at
  * :147-155).
  */
class TimeMetadataExtractor(
    pattern: String = TimeMetadataExtractor.DefaultPattern,
    timeFormat: String = TimeMetadataExtractor.DefaultTimeFormat
) extends MetadataExtractor {
  @transient private lazy val rx: Regex = pattern.r
  @transient private lazy val fmt = DateTimeFormatter.ofPattern(timeFormat)

  private def parseTs(s: String): Timestamp =
    Timestamp.valueOf(LocalDateTime.parse(s.replaceAll("\\s+", " ").trim, fmt))

  override def extractMetadata(path: Path): FileMetadata = {
    val name = path.getFileName.toString
    rx.findFirstMatchIn(name) match {
      case Some(m) =>
        FileMetadata(
          filepath = path.toString,
          startTime = Some(parseTs(m.group(1))),
          endTime = Some(parseTs(m.group(2)))
        )
      case None =>
        throw new graft.core.FileParsingException(
          s"Filename does not match expected pattern: $name"
        )
    }
  }

  override def isValidFilename(filename: String): Boolean =
    rx.findFirstMatchIn(filename).isDefined
}

/** Generic named-group regex extractor (reference ts_extensions.py:273-349).
  * Groups named "start"/"end" parse as timestamps with `timeFormat`; all other
  * named groups land in `additional`.
  */
class RegexMetadataExtractor(
    pattern: String,
    timeFormat: String = TimeMetadataExtractor.DefaultTimeFormat,
    groupNames: Seq[String] = Seq.empty
) extends MetadataExtractor {
  @transient private lazy val rx: Regex = new Regex(pattern, groupNames: _*)
  @transient private lazy val fmt = DateTimeFormatter.ofPattern(timeFormat)

  private def tryTs(s: String): Option[Timestamp] =
    scala.util
      .Try(Timestamp.valueOf(LocalDateTime.parse(s.replaceAll("\\s+", " ").trim, fmt)))
      .toOption

  override def extractMetadata(path: Path): FileMetadata = {
    val name = path.getFileName.toString
    rx.findFirstMatchIn(name) match {
      case Some(m) =>
        val named = groupNames.flatMap { g =>
          Option(scala.util.Try(m.group(g)).getOrElse(null)).map(g -> _)
        }.toMap
        FileMetadata(
          filepath = path.toString,
          startTime = named.get("start").flatMap(tryTs),
          endTime = named.get("end").flatMap(tryTs),
          additional = named -- Seq("start", "end")
        )
      case None =>
        throw new graft.core.FileParsingException(
          s"Filename does not match pattern '$pattern': $name"
        )
    }
  }

  override def isValidFilename(filename: String): Boolean =
    rx.findFirstMatchIn(filename).isDefined
}

/** File predicates applied during discovery (reference
  * file_metadata_parser.py:235-296).
  */
trait FileFilter extends Serializable {
  /** Returns None if valid, Some(reason) if rejected. */
  def check(path: Path): Option[String]
  final def isValid(path: Path): Boolean = check(path).isEmpty
}

/** is_file && extension allowed && readable && size > 0
  * (reference file_metadata_parser.py:235-270).
  */
class DefaultFileFilter(allowedExtensions: Set[String] = Set(".csv"))
    extends FileFilter {
  override def check(path: Path): Option[String] = {
    val f = path.toFile
    if (!f.isFile) Some("not a regular file")
    else if (!allowedExtensions.exists(e => f.getName.toLowerCase.endsWith(e)))
      Some(s"extension not in ${allowedExtensions.mkString(",")}")
    else if (!f.canRead) Some("not readable")
    else if (f.length() == 0L) Some("empty file (0 bytes)")
    else None
  }
}

/** DefaultFileFilter + filename must satisfy the extractor
  * (reference file_metadata_parser.py:273-296).
  */
class MetadataFileFilter(
    extractor: MetadataExtractor,
    allowedExtensions: Set[String] = Set(".csv")
) extends FileFilter {
  private val base = new DefaultFileFilter(allowedExtensions)
  override def check(path: Path): Option[String] =
    base.check(path).orElse {
      if (extractor.isValidFilename(path.getFileName.toString)) None
      else Some("filename does not match metadata pattern")
    }
}
