package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle-side round rewriter (Queries.duckRound): every two-arg
  * `round(x, k)` in emitted DuckDB SQL goes through the double's shortest
  * VARCHAR repr into DECIMAL(38,20) so the oracle rounds HALF_UP on the
  * same digits Spark sees — Spark's semantics —
  * instead of in float space (the half-point dialect the sf1 sweep caught;
  * see SCALE.md round 7).
  */
class DuckRoundSpec extends AnyFunSuite {

  test("two-arg round is wrapped; scale preserved") {
    assert(Queries.duckRound("SELECT round(x, 4) FROM t") ==
      "SELECT CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) FROM t")
  }

  test("one-arg round (cents snap) is untouched") {
    assert(Queries.duckRound("CAST(round(value * 100) AS BIGINT)") ==
      "CAST(round(value * 100) AS BIGINT)")
  }

  test("nested round inside a one-arg round is still rewritten") {
    assert(Queries.duckRound("round(a + round(b / c, 2))") ==
      "round(a + CAST(round(CAST(CAST(b / c AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE))")
  }

  test("nested calls with commas keep the right argument split") {
    assert(Queries.duckRound("round(greatest(a, b) / nullif(c, 0), 6)") ==
      "CAST(round(CAST(CAST(greatest(a, b) / nullif(c, 0) AS VARCHAR) " +
        "AS DECIMAL(38,20)), 6) AS DOUBLE)")
  }

  test("identifiers ending in 'round(' are not treated as the function") {
    assert(Queries.duckRound("my_round(x, 4)") == "my_round(x, 4)")
  }

  test("non-literal scale argument is left untouched") {
    assert(Queries.duckRound("round(x, k)") == "round(x, k)")
  }

  test("ROUND in any case is rewritten (round-7 advisor)") {
    assert(Queries.duckRound("SELECT ROUND(x, 4) FROM t") ==
      "SELECT CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,20)), 4) AS DOUBLE) FROM t")
    assert(Queries.duckRound("Round(x, 2)") ==
      "CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,20)), 2) AS DOUBLE)")
  }

  test("round(..,k) inside a string literal is data, not SQL (round-7 advisor)") {
    assert(Queries.duckRound("SELECT 'round(x, 4)' AS s") ==
      "SELECT 'round(x, 4)' AS s")
    // '' escape inside the literal doesn't end the quoted region
    assert(Queries.duckRound("SELECT 'it''s round(x, 4)' AS s, round(y, 2)") ==
      "SELECT 'it''s round(x, 4)' AS s, CAST(round(CAST(CAST(y AS VARCHAR) " +
        "AS DECIMAL(38,20)), 2) AS DOUBLE)")
  }

  test("quotes inside a matched argument list don't derail the paren scan") {
    assert(Queries.duckRound("round(strpos(x, '('), 2)") ==
      "CAST(round(CAST(CAST(strpos(x, '(') AS VARCHAR) " +
        "AS DECIMAL(38,20)), 2) AS DOUBLE)")
  }

  test("no emitted oracle contains an unrewritten two-arg round, any case") {
    // strip string literals, then every remaining `round(x..., <int>)`
    // must be the rewriter's own DECIMAL(38,20) form — i.e. no bare
    // two-arg round survives outside the CAST(round(CAST(CAST(...)))
    // wrapper the rewriter emits
    val twoArg = "(?i)(?<![a-z0-9_])round\\(".r
    Queries.oracleSql.foreach { case (name, sql) =>
      // unrolled-loop literal pattern, NOT "(?:[^']|'')*": the alternation
      // form recurses one Java-regex stack frame per character, and the
      // longest quoteless run in the emitted oracles overflows the thread
      // stack (suite abort) once an oracle grows past a few KB
      val noLit = sql.replaceAll("'[^']*(?:''[^']*)*'", "''")
      twoArg.findAllMatchIn(noLit).foreach { m =>
        // scan the argument list for a top-level comma + integer scale
        var depth = 1; var j = m.end; var lastComma = -1
        while (depth > 0 && j < noLit.length) {
          noLit.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case ',' if depth == 1 => lastComma = j
            case _ => ()
          }
          j += 1
        }
        val isTwoArgLiteral = depth == 0 && lastComma >= 0 &&
          noLit.substring(lastComma + 1, j - 1).trim.matches("-?\\d+")
        val rewritten = noLit.regionMatches(
          true, m.start - "CAST(".length, "CAST(round(", 0, 11) &&
          noLit.substring(m.end).startsWith("CAST(CAST(")
        assert(!isTwoArgLiteral || rewritten,
          s"$name: unrewritten two-arg round at ${m.start}: " +
            noLit.substring(m.start, math.min(noLit.length, m.start + 80)))
      }
    }
  }

  test("every emitted oracle still parses in shape: balanced parens") {
    Queries.oracleSql.foreach { case (name, sql) =>
      val bal = sql.foldLeft(0) {
        case (d, '(') => d + 1
        case (d, ')') => d - 1
        case (d, _) => d
      }
      assert(bal == 0, s"$name oracle has unbalanced parens after rewrite")
    }
  }
}
