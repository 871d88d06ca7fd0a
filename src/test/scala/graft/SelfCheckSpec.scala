package graft

/** Pins the engine-side invariant checks for the four queries whose DuckDB
  * oracles are brute-force baselines (infeasible past sf0.1 — see
  * ScaleSelfCheck's scaladoc and SCALE.md). Running them here at sf0.001
  * keeps the checker itself honest: the same code that certifies these
  * queries at sf1 must agree with the hash-gated result at a scale where
  * the DuckDB oracle ALSO passes, so a broken invariant (or a broken
  * checker) fails the suite, not just the scale probe.
  */
class SelfCheckSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  ScaleSelfCheck.checks.foreach { case (name, fn) =>
    test(s"$name: zero invariant violations at sf0.001") {
      val (violations, detail) = fn(spark, dir)
      assert(violations == 0, s"$name violated its invariants: $detail")
    }
  }
}
