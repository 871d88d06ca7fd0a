package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (sbt test forks a single JVM).
  *
  * The session PINS `spark.sql.ansi.enabled=true` (Spark 4's default,
  * made explicit so a config drift can't silently weaken it): every suite
  * is therefore an ANSI sweep — an int64 overflow beyond a kernel's
  * documented headroom would THROW here, not wrap, so green tests prove
  * the documented bounds are the real boundary at test magnitudes
  * (AnsiHeadroomSpec pins the mode itself plus the boundary behavior).
  * `GRAFT_ANSI=false sbt test` runs the same suites in legacy wrapping
  * mode for comparison.
  */
object TestSpark {
  val ansiEnabled: Boolean =
    !sys.env.get("GRAFT_ANSI").exists(_.equalsIgnoreCase("false"))
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", ansiEnabled.toString)
      // 468 tests compile thousands of generated classes in one JVM —
      // same static-cache sizing rationale as Bench/Verify (SCALE.md)
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      // union partitioning mis-claim workaround — same rationale as Bench
      // (Spark 4.1 zips unequal partition lists under union-into-join)
      .config("spark.sql.unionOutputPartitioning", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)
}
