package graft.core

import java.nio.file.{Files, Paths}

/** Error-report sinks (S7/S8 in the survey; reference
  * load_file.py:344-360 export_error_report and :420-526
  * export_detailed_error_report with severity/type filters and JSON|CSV
  * formats). Reports are driver-sized by construction (one entry per
  * control-plane error, never per row), so a driver-side write is the right
  * tool — no distributed job for a few KB of JSON.
  */
object Reports {

  private def esc(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def errJson(e: ProcessingError): String = {
    val ctx = e.context.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }
      .mkString("{", ",", "}")
    s"""{"message": ${esc(e.message)}, "severity": ${esc(e.severity.name)}, """ +
      s""""error_type": ${esc(e.errorType)}, "file": ${e.file.map(esc).getOrElse("null")}, """ +
      s""""timestamp": ${e.timestamp}, "context": $ctx}"""
  }

  /** S7: full error report -> JSON file. */
  def exportErrorReport(errors: ErrorCollector, path: String): Unit = {
    val stats = errors.stats
    def statsJson(m: Map[String, Int]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s"${esc(k)}: $v" }.mkString("{", ",", "}")
    val json =
      s"""{"total_errors": ${errors.errors.size}, """ +
        s""""by_severity": ${statsJson(stats("by_severity"))}, """ +
        s""""by_type": ${statsJson(stats("by_type"))}, """ +
        s""""errors": ${errors.errors.map(errJson).mkString("[", ",", "]")}}"""
    Files.writeString(Paths.get(path), json)
  }

  /** S8: severity/type-filtered report -> JSON or flattened CSV. */
  def exportDetailedErrorReport(
      errors: ErrorCollector,
      path: String,
      minSeverity: Option[ErrorSeverity] = None,
      errorTypes: Option[Set[String]] = None,
      format: String = "json"
  ): Unit = {
    val filtered = errors.errors
      .filter(e => minSeverity.forall(s => e.severity.level >= s.level))
      .filter(e => errorTypes.forall(_.contains(e.errorType)))
    format.toLowerCase match {
      case "json" =>
        Files.writeString(Paths.get(path),
          filtered.map(errJson).mkString("[", ",", "]"))
      case "csv" =>
        // nested context flattened to one column per key (reference :486-518)
        val ctxKeys = filtered.flatMap(_.context.keys).distinct.sorted
        val header = Seq("message", "severity", "error_type", "file", "timestamp") ++
          ctxKeys.map(k => s"context_$k")
        def csvCell(s: String): String =
          if (s.exists(c => c == ',' || c == '"' || c == '\n'))
            "\"" + s.replace("\"", "\"\"") + "\""
          else s
        val lines = filtered.map { e =>
          (Seq(e.message, e.severity.name, e.errorType, e.file.getOrElse(""),
            e.timestamp.toString) ++ ctxKeys.map(k => e.context.getOrElse(k, "")))
            .map(csvCell).mkString(",")
        }
        Files.writeString(Paths.get(path), (header.mkString(",") +: lines).mkString("\n"))
      case other =>
        throw new ConfigValidationException(s"Unsupported report format: $other")
    }
  }
}
