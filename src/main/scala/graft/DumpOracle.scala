package graft
import java.nio.file.{Files, Paths}
/** Dev utility: rewrite `outDir/oracle_sql.json` without re-running the
  * Spark side — for iterating on an oracle after its parquet is dumped.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
