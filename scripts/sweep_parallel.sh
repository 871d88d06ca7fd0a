#!/bin/bash
# Parallel full-surface oracle sweep — the sf10-scale variant of
# sweep_compare.py. Runs one check.py subprocess per query (same
# SKIP_VERIFY reuse of an existing graft.Verify dump, same per-query
# wall-clock cap) but N at a time: at 100x the oracle walls are minutes,
# and the sequential sweep's expected total (hours) is dominated by
# independent single-query DuckDB runs that parallelize perfectly.
# Verdict lines land in $OUT_LOG_DIR/<name>.log; a final pass prints the
# sweep scoreboard in sweep_compare's format.
#
# Usage: scripts/sweep_parallel.sh <sfdir> <dumpdir> <timeout_s> <jobs> <logdir>
set -e
cd "$(dirname "$0")/.."
SF=$1; OUT=$2; CAP=${3:-1200}; JOBS=${4:-6}; LOGS=${5:-/tmp/sweep_logs}
mkdir -p "$LOGS"
python3 - "$OUT" <<'EOF' > "$LOGS/names.txt"
import json, os, sys
out = sys.argv[1]
oracle = json.load(open(f"{out}/oracle_sql.json"))
dirs = set(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
for n in sorted(dirs | set(oracle)):
    print(n)
EOF
run_one() {
  name=$1
  if timeout "$CAP" python3 scripts/check.py "$SF" "$OUT" "$name" \
      > "$LOGS/$name.log" 2>&1; then :; else
    rc=$?
    [ $rc -eq 124 ] && echo "ORACLE-TIMEOUT $name: exceeded ${CAP}s" >> "$LOGS/$name.log"
  fi
  grep -h "^OK\|^FAIL\|^ROWS-ONLY\|^ORACLE-TIMEOUT" "$LOGS/$name.log" | head -1
}
export -f run_one
# thread + memory caps: N concurrent DuckDBs must split the box honestly
# (the sf10 sweep's only FAILs were an uncapped-memory OOM and a disk
# race — both scheduler artifacts, both green solo; SCALE.md round 12)
# default memlimit: split ~80% of MemAvailable across the JOBS concurrent
# DuckDBs so the sweep can't overcommit RAM on a box smaller than the
# sf10 machine (a static 20GB x JOBS default could)
if [ -z "$DUCKDB_MEMLIMIT" ]; then
  avail_kb=$(awk '/MemAvailable/ {print $2}' /proc/meminfo)
  DUCKDB_MEMLIMIT="$(( avail_kb * 8 / 10 / JOBS / 1048576 ))GB"
fi
# oracle result cache: a re-sweep after an engine-only change should touch
# zero DuckDB oracles (expected answers are keyed by SQL + data content hash)
export GRAFT_ORACLE_CACHE=${GRAFT_ORACLE_CACHE:-/root/repo/target/oracle_cache}
export SF OUT CAP LOGS SKIP_VERIFY=1 DUCKDB_THREADS=${DUCKDB_THREADS:-6} \
  DUCKDB_MEMLIMIT
xargs -a "$LOGS/names.txt" -P "$JOBS" -I{} bash -c 'run_one {}'
echo "== SCOREBOARD =="
ok=0; fail=0; to=0; ro=0
while read -r n; do
  line=$(grep -h "^OK\|^FAIL\|^ROWS-ONLY\|^ORACLE-TIMEOUT" "$LOGS/$n.log" 2>/dev/null | head -1)
  case "$line" in
    OK*) ok=$((ok+1));;
    ROWS-ONLY*) ro=$((ro+1));;
    ORACLE-TIMEOUT*) to=$((to+1)); echo "$line";;
    *) fail=$((fail+1)); echo "FAIL $n: ${line:-no verdict}";;
  esac
done < "$LOGS/names.txt"
echo "SWEEP: $((ok+ro)) green ($ro rows-only), $fail fail, $to oracle-timeout of $(wc -l < "$LOGS/names.txt")"
