#!/usr/bin/env python3
"""Full-surface oracle compare with a per-query timeout — the sf1 sweep tool.

check.py runs every oracle inline, which is right at the driver-gated scales
(sf0.01/sf0.1, every oracle finishes in seconds) but wrong at the 10x scale
probe: a handful of oracles are DELIBERATELY brute-force (exact all-pairs
similarity as the recall baseline for the bucketed engine path), and DuckDB
evaluates their interpreted list-lambda cross joins in hours at 20k vectors /
50k docs. The ENGINE side is not the bottleneck — graft.Verify completes all
queries at sf1 — the oracle is. So this runner executes each compare in a
subprocess with a wall-clock cap and reports ORACLE-TIMEOUT for the
quadratic baselines instead of hanging the sweep; their value parity stays
gated at sf0.1 where the brute-force oracle is feasible.

Usage: python3 scripts/sweep_compare.py <sfdir> <outdir> [timeout_s]
(assumes <outdir> already holds a graft.Verify dump for <sfdir>)
"""
import json, os, subprocess, sys

SF = sys.argv[1]
OUT = sys.argv[2]
TIMEOUT = int(sys.argv[3]) if len(sys.argv) > 3 else 180

def main():
    here = os.path.dirname(os.path.abspath(__file__))
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    dirs = set(d for d in os.listdir(OUT)
               if os.path.isdir(os.path.join(OUT, d)))
    ok, fails, timeouts = [], [], []
    for name in sorted(dirs | set(oracle)):
        cmd = [sys.executable, os.path.join(here, "check.py"), SF, OUT, name]
        env = dict(os.environ, SKIP_VERIFY="1")
        try:
            r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                               timeout=TIMEOUT)
        except subprocess.TimeoutExpired:
            timeouts.append(name)
            print(f"ORACLE-TIMEOUT {name}: oracle exceeded {TIMEOUT}s "
                  f"(brute-force baseline infeasible at this scale)",
                  flush=True)
            continue
        line = next((l for l in r.stdout.splitlines()
                     if l.startswith(("OK", "FAIL", "ROWS-ONLY"))), None)
        if r.returncode == 0 and line:
            ok.append(name)
        else:
            fails.append(name)
        print(line or f"FAIL {name}: no verdict (rc={r.returncode}) "
                      f"{r.stderr.splitlines()[-1] if r.stderr else ''}",
              flush=True)
    print(f"\nSWEEP: {len(ok)} green, {len(fails)} fail, "
          f"{len(timeouts)} oracle-timeout of {len(dirs | set(oracle))}")
    if fails:
        print("FAILS:", " ".join(fails))
    if timeouts:
        print("ORACLE-TIMEOUTS:", " ".join(timeouts))
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
