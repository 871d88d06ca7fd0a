package graft

import java.nio.file.{Files, Paths}

/** Full-surface plan-regression gate: recomputes the physical-plan
  * fingerprint of every SparkEntry query (PlanSnapshot.fingerprint — with
  * AQE off, at the pinned sf0.001) and diffs against the committed
  * PLANS.json. Any drift — a new exchange, a lost broadcast or pushdown, a
  * join-strategy flip, a narrower/wider scan, a new/removed query — fails
  * here even though every value check would still pass.
  *
  * Intentional plan changes are re-baselined with
  * `scripts/run.sh graft.PlanSnapshot` (rewrites PLANS.json; review the
  * printed diff before committing it).
  */
class PlanSnapshotSpec extends SparkSpec {

  test("all query plans match the committed PLANS.json fingerprints") {
    val path = Paths.get("PLANS.json")
    assert(Files.exists(path),
      "PLANS.json missing — generate with scripts/run.sh graft.PlanSnapshot")
    val committed = Files.readString(path)
    val recomputed = PlanSnapshot.render(
      PlanSnapshot.all(spark, PlanSnapshot.DefaultSf))
    val drift = PlanSnapshot.diff(committed, recomputed)
    assert(drift.isEmpty,
      s"""${drift.size} queries drifted from PLANS.json:
         |${drift.mkString("\n")}
         |If intentional, re-baseline: scripts/run.sh graft.PlanSnapshot
         |""".stripMargin)
  }

  test("every unpartitioned window sits on a documented bounded-cardinality " +
    "frame (PlanSnapshot.BoundedGlobalWindows); corpus-sized global windows " +
    "must ride the RangeSeries chunked spine") {
    val committed = Files.readString(Paths.get("PLANS.json"))
    // parse the committed snapshot (same gate run re-verifies it matches
    // the recomputed plans above, so reading the file is sound)
    val offenders = committed.linesIterator.filter(_.contains(":")).flatMap {
      l =>
        val name = l.trim.stripPrefix("\"").takeWhile(_ != '"')
        if (l.contains("\"window_unpartitioned\"") &&
          !PlanSnapshot.BoundedGlobalWindows.contains(name)) Some(name)
        else None
    }.toSeq
    assert(offenders.isEmpty,
      s"""unpartitioned windows outside the bounded allowlist: $offenders
         |Either chunk them onto graft.ts.RangeSeries (the sax/z-order/RRF
         |treatment) or add a bounded-cardinality justification to
         |PlanSnapshot.BoundedGlobalWindows.""".stripMargin)
    // the allowlist must not rot: every entry still names a live query
    val stale = PlanSnapshot.BoundedGlobalWindows.keySet
      .diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty, s"allowlist entries for removed queries: $stale")
  }
}
