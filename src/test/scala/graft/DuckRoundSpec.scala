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
