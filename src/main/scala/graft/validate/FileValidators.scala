package graft.validate

import graft.core.ValidationResult
import java.nio.file.{Files, Path}

/** Per-file validators (reference ts_extensions.py:78-124 traits,
  * :214-269 content probe). Driver-side: these run before any Spark read.
  */
trait FileValidator extends Serializable {
  def validate(path: Path, context: Map[String, String]): ValidationResult
}

/** First-failure-wins chain (reference ts_extensions.py:103-124). */
class CompositeFileValidator(validators: Seq[FileValidator]) extends FileValidator {
  override def validate(path: Path, context: Map[String, String]): ValidationResult =
    validators.iterator
      .map(_.validate(path, context))
      .find(!_.isValid)
      .getOrElse(ValidationResult(isValid = true))
}

/** Content probe: read the first minRows+1 lines, check required headers and
  * a minimum data-row count (reference ts_extensions.py:214-269; the Spark
  * analogue of a limit-pushdown probe — never reads the whole file).
  */
class FileContentValidator(
    requiredColumns: Set[String] = Set.empty,
    minRows: Int = 1,
    delimiter: String = ";"
) extends FileValidator {
  override def validate(path: Path, context: Map[String, String]): ValidationResult = {
    val it =
      try Files.lines(path)
      catch {
        case e: Exception =>
          return ValidationResult(false, Some(s"Cannot read file: ${e.getMessage}"), Some("read_error"))
      }
    try {
      val lines = it.limit(minRows + 1L).iterator()
      if (!lines.hasNext)
        return ValidationResult(false, Some("File is empty"), Some("empty_file"))
      val header = lines.next().split(java.util.regex.Pattern.quote(delimiter)).map(_.trim).toSet
      val missing = requiredColumns -- header
      if (missing.nonEmpty)
        return ValidationResult(
          false,
          Some(s"Missing required columns: ${missing.mkString(", ")}"),
          Some("missing_columns")
        )
      var n = 0
      while (lines.hasNext && n < minRows) { lines.next(); n += 1 }
      if (n < minRows)
        ValidationResult(false, Some(s"File has fewer than $minRows data rows"), Some("too_few_rows"))
      else ValidationResult(isValid = true)
    } finally it.close()
  }
}
