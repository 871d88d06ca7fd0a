package graft

import org.apache.spark.sql.functions._

/** Guards the signed-zero round-parity class found in round 4
  * (`ts_rolling_autocorr`, CORRECTNESS_r04): Spark's `round()` goes through
  * BigDecimal, which has NO signed zero, so a tiny negative statistic rounds
  * to +0.0 — while DuckDB's binary round preserves the sign and emits -0.0.
  * Value-equal, bit-different; the driver hashes bits. The repo-wide fix is
  * to normalize every double-valued `round(...)` in the DuckDB oracles with
  * `+ 0` (IEEE: `-0.0 + 0.0 == +0.0`; identity on every other double).
  *
  * This spec (a) pins the divergence so it stays understood, and (b) lints
  * `Queries.oracleSql` so a new query can't reintroduce the class.
  */
class OracleParitySpec extends SparkSpec {
  import spark.implicits._

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)
  private val negZeroBits = bits(-0.0)

  /** DuckDB round semantics model: half-away-from-zero on the binary double,
    * sign of zero preserved (libm-style `round(x * 10^n) / 10^n`).
    */
  private def binaryRound(x: Double, n: Int): Double = {
    val s = math.pow(10, n)
    val y = x * s
    val r = if (y < 0) -math.floor(-y + 0.5) else math.floor(y + 0.5)
    r / s
  }

  private val tinyNegatives =
    Seq(-1e-300, -1e-9, -1e-6, -4.9e-5, -4.999e-5)

  test("Spark round() never emits -0.0 (BigDecimal has no signed zero)") {
    val out = tinyNegatives.toDF("x")
      .select(round(col("x"), 4).as("r")).as[Double].collect()
    out.foreach { r =>
      assert(r == 0.0 && bits(r) != negZeroBits,
        s"expected +0.0 from Spark round, got bits ${bits(r).toHexString}")
    }
  }

  test("binary round (DuckDB semantics) emits -0.0 for tiny negatives; " +
    "+ 0 normalizes it") {
    tinyNegatives.foreach { x =>
      val r = binaryRound(x, 4)
      assert(bits(r) == negZeroBits,
        s"model should yield -0.0 for $x, got bits ${bits(r).toHexString}")
      assert(bits(r + 0.0) == bits(0.0), "normalization must flip to +0.0")
    }
  }

  test("+ 0 is a bitwise identity on every non-(-0.0) double (so blanket " +
    "oracle normalization can't change any green query)") {
    val probes = Seq(0.0, 1.0, -1.0, -3.1415, 0.00005, -0.00005, 1e300,
      -1e300, 4.9e-324, -4.9e-324, Double.MaxValue, Double.MinValue,
      Double.PositiveInfinity, Double.NegativeInfinity)
    probes.foreach { x =>
      assert(bits(x + 0.0) == bits(x), s"+ 0 changed bits of $x")
    }
    assert(java.lang.Double.isNaN(Double.NaN + 0.0))
  }

  // ---- lint: every terminal double-valued round() in an oracle is normalized

  private val SqlTypes = Set("BIGINT", "INT", "INTEGER", "SMALLINT",
    "TINYINT", "DOUBLE", "FLOAT", "REAL", "DECIMAL", "HUGEINT", "VARCHAR",
    "DATE", "TIMESTAMP", "BOOLEAN")

  private def matchParen(s: String, open: Int): Int = {
    var d = 0; var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return i + 1
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** Offsets of `round(...)` calls in terminal projection position
    * (`AS <alias>` / `END`) that are NOT followed by `+ 0`. A round that
    * feeds a CAST-to-integer or further arithmetic is exempt: only a round
    * that SURVIVES to double output can leak a signed zero into the hash.
    */
  private def unnormalizedRounds(sql: String): Seq[String] = {
    val call = "(?i)\\bround\\s*\\(".r
    call.findAllMatchIn(sql).flatMap { m =>
      val end = matchParen(sql, sql.indexOf('(', m.start))
      if (end < 0) None
      else {
        var k = end
        while (k < sql.length && " \n\t".contains(sql.charAt(k))) k += 1
        val rest = sql.substring(k, math.min(sql.length, k + 40))
        val alias = "^AS\\s+(\\w+)".r.findFirstMatchIn(rest).map(_.group(1))
        val terminal = alias.exists(a => !SqlTypes(a.toUpperCase)) ||
          rest.startsWith("END")
        if (terminal && !rest.startsWith("+"))
          Some(sql.substring(m.start, math.min(sql.length, end + 12))
            .replaceAll("\\s+", " "))
        else None
      }
    }.toSeq
  }

  test("lint: every terminal round() in every DuckDB oracle carries + 0 " +
    "signed-zero normalization") {
    val offenders = Queries.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        unnormalizedRounds(sql).map(site => s"$name: ...$site...")
    }
    assert(offenders.isEmpty,
      "un-normalized round() in oracle SQL — a negative stat that rounds " +
        "to zero hashes as -0.0 in DuckDB but +0.0 in Spark. Append `+ 0` " +
        "after the round:\n" + offenders.mkString("\n"))
  }

  test("lint self-check: the linter flags an un-normalized terminal round") {
    assert(unnormalizedRounds("SELECT round(x, 4) AS v FROM t").nonEmpty)
    assert(unnormalizedRounds("SELECT round(x, 4) + 0 AS v FROM t").isEmpty)
    assert(unnormalizedRounds(
      "SELECT CAST(round(x * 100) AS BIGINT) AS cents FROM t").isEmpty)
    assert(unnormalizedRounds(
      "SELECT CASE WHEN a THEN round(x, 2) END AS v FROM t").nonEmpty)
  }
}
