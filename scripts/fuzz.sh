#!/bin/bash
# Differential parameter fuzz (graft.Fuzz): seeded-random parameter sets —
# irregular resample edges (duplicates, edges ON event timestamps), as-of
# tolerances at exact ±1µs tie boundaries, skipna buckets at arbitrary
# widths, every LSH band/row split — run through the Spark engine AND the
# generated DuckDB oracle, adjudicated by check.py. Deterministic per seed:
# a red case replays by name.
#
# Usage: scripts/fuzz.sh [sfDir] [outDir] [seed]
set -e
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/fuzz_out}
SEED=${3:-20260816}
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} scripts/run.sh graft.Fuzz "$SF" "$OUT" "$SEED"
SKIP_VERIFY=1 python3 scripts/check.py "$SF" "$OUT"
