#!/bin/bash
# Commit driver-written artifacts (bench/correctness/leakcheck/etc JSON)
# whenever they are untracked or modified. The driver writes these AFTER
# the end-of-round snapshot commit, which left them dirty at judge time
# every round (VERDICT r10 housekeeping note). Run standalone at any time,
# or let snapshot_gate.sh invoke it; it is a no-op when nothing matches.
set -o pipefail
cd "$(dirname "$0")/.."
ARTIFACTS=$(git status --porcelain -- \
  'BENCH_r*.json' 'CORRECTNESS_r*.json' 'BENCH_FULL.json' \
  'LEAKCHECK.json' 'COPYCHECK.json' 'PLANS.json' 'BUDGETS.json' \
  'VERDICT.md' 'ADVICE.md' 2>/dev/null | awk '{print $NF}')
[ -z "$ARTIFACTS" ] && { echo "driver artifacts clean"; exit 0; }
echo "$ARTIFACTS" | xargs git add --
git commit -m "Record driver artifacts" -- $ARTIFACTS >/dev/null \
  && echo "committed: $ARTIFACTS" || echo "nothing to commit"
