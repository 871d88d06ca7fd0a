package graft.core

import java.time.Duration

/** Pandas-style offset-string parser ("1min", "5min", "1H", "30s", "2D",
  * "15min") -> java.time.Duration. Reference uses pd.Timedelta on these at
  * load_file.py:745,2077,2081,2286,2292. Only fixed-width units appear in the
  * reference (no month/quarter offsets), so Duration suffices.
  */
object Offsets {
  private val Pat = """^\s*(\d+)?\s*([a-zA-Z]+)\s*$""".r

  def parse(offset: String): Duration = {
    offset match {
      case Pat(numStr, unit) =>
        val n = Option(numStr).map(_.toLong).getOrElse(1L)
        unit match {
          case "ns" => Duration.ofNanos(n)
          case "us" | "U" => Duration.ofNanos(n * 1000L)
          case "ms" | "L" => Duration.ofMillis(n)
          case "s" | "S" | "sec" | "second" | "seconds" => Duration.ofSeconds(n)
          case "min" | "T" | "m" | "minute" | "minutes" => Duration.ofMinutes(n)
          case "h" | "H" | "hr" | "hour" | "hours" => Duration.ofHours(n)
          case "d" | "D" | "day" | "days" => Duration.ofDays(n)
          case "w" | "W" | "week" | "weeks" => Duration.ofDays(7L * n)
          case other =>
            throw new ConfigValidationException(s"Unsupported offset unit: '$other' in '$offset'")
        }
      case _ =>
        throw new ConfigValidationException(s"Cannot parse offset string: '$offset'")
    }
  }

  /** Duration -> seconds string, the freq-inference fallback output format
    * (reference load_file.py:2072-2074; pinned "3600s" by its tests).
    */
  def toFreqString(d: Duration): String = s"${d.getSeconds}s"

  /** Duration -> Spark interval expression string, e.g. "INTERVAL 90 SECOND". */
  def toSparkInterval(d: Duration): String = s"INTERVAL ${d.getSeconds} SECOND"
}
