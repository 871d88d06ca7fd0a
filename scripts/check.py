#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate:
run graft.Verify -> compare each query parquet against its DuckDB oracle
(sorted columns, sorted rows, exact value equality after the query's own
rounding). Usage: python3 scripts/check.py [sfdir] [outdir] [query...]
"""
import json, math, subprocess, sys, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

import duckdb
import numpy as np
import pandas as pd

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps -> ns ints for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def compare(name, got, exp):
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA mismatch: spark={sorted(got.columns)} duckdb={sorted(exp.columns)}"
    g, e = canon(got), canon(exp)
    if len(g) != len(e):
        return f"ROWS mismatch: spark={len(g)} duckdb={len(e)}"
    for c in g.columns:
        gv, ev = g[c], e[c]
        # the driver hashes VALUES WITH THEIR TYPES: an int column vs a
        # float column hash-mismatches even when every value is equal
        # (DuckDB HUGEINT sums surface as float). Enforce dtype-kind
        # equality BEFORE any tolerant compare so local green => driver green.
        if gv.dtype.kind != ev.dtype.kind:
            return (f"DTYPE mismatch in {c}: spark={gv.dtype} ({gv.dtype.kind}) "
                    f"vs duckdb={ev.dtype} ({ev.dtype.kind}) — cast the oracle "
                    f"(e.g. CAST(sum(...) AS BIGINT)) or the spark column")
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            # The driver hashes BITS: -0.0 vs +0.0 and sub-1e-9 ULP drift are
            # real driver failures even though they are value-equal, so compare
            # bit patterns (NaN canonicalized so NaN==NaN). The tolerant diff
            # survives only to LABEL the failure mode in the message.
            if gv.dtype != ev.dtype:
                return (f"FLOAT WIDTH mismatch in {c}: spark={gv.dtype} vs "
                        f"duckdb={ev.dtype}")
            ga, ea = gv.to_numpy().copy(), ev.to_numpy().copy()
            ga[np.isnan(ga)] = np.nan  # canonical quiet-NaN bits
            ea[np.isnan(ea)] = np.nan
            w = "uint%d" % (ga.dtype.itemsize * 8)
            bad = ga.view(w) != ea.view(w)
            if bad.any():
                i = int(np.argmax(bad))
                gx, ex2 = ga[i], ea[i]
                if gx == ex2:  # bit-different but value-equal
                    kind = ("SIGNED-ZERO mismatch" if gx == 0
                            else "BIT mismatch on equal values")
                elif abs(gx - ex2) <= 1e-9:
                    kind = "ULP drift (value-equal to 1e-9)"
                else:
                    kind = "VALUE mismatch"
                return (f"{kind} in {c} row {i}: {gx!r} "
                        f"(bits {int(ga.view(w)[i]):#018x}) vs {ex2!r} "
                        f"(bits {int(ea.view(w)[i]):#018x})")
        else:
            if not gv.astype(object).where(~gv.isna(), None).equals(
                   ev.astype(object).where(~ev.isna(), None)):
                neq = gv.astype(str) != ev.astype(str)
                i = neq.idxmax()
                return f"VALUE mismatch in {c} row {i}: {gv[i]!r} vs {ev[i]!r}"
    return None

def main():
    if not os.environ.get("SKIP_VERIFY"):
        subprocess.run(["scripts/run.sh", "graft.Verify", SF, OUT], check=True)
    con = duckdb.connect()
    # parallel sweeps (sweep_parallel.sh) run many check.py processes at
    # once; without a cap each DuckDB grabs every core and they thrash
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    # likewise, a co-resident Spark JVM at scale-probe heaps leaves DuckDB
    # less than its default 80%-of-RAM assumption — make the split explicit
    if os.environ.get("DUCKDB_MEMLIMIT"):
        con.execute(f"SET memory_limit='{os.environ['DUCKDB_MEMLIMIT']}'")
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.isdir(p):
            # Spark-written table (ScaleUp sf1 output): directory of parts
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    # Verify swallows per-query exceptions (a dead query must not kill the
    # whole dump), so a query that FAILED TO RUN has no output dir at all.
    # Iterate over oracle names ∪ dirs and flag the missing ones — otherwise
    # 54 dead queries can read as ALL GREEN (happened: the testdata
    # regeneration flipped events.ts nanos->micros and every events query
    # died in Verify, invisibly to the dir-driven loop).
    dirs = set(d for d in os.listdir(OUT) if os.path.isdir(os.path.join(OUT, d)))
    names = sorted(dirs | set(oracle))
    fails = 0
    for d in sorted(set(oracle) - dirs):
        if ONLY and d not in ONLY:
            continue
        print(f"FAIL {d}: query produced NO OUTPUT (died in Verify — check its stderr)")
        fails += 1
    for d in names:
        path = os.path.join(OUT, d)
        if d not in dirs:
            continue
        if ONLY and d not in ONLY:
            continue
        try:
            got = duckdb.connect().execute(f"SELECT * FROM '{path}/*.parquet'").df()
        except Exception as ex:
            print(f"FAIL {d}: cannot read spark output: {ex}")
            fails += 1
            continue
        if d not in oracle:
            print(f"ROWS-ONLY {d}: {len(got)} rows {'OK' if len(got) > 0 else '** EMPTY **'}")
            if len(got) == 0:
                fails += 1
            continue
        try:
            exp = con.execute(oracle[d]).df()
        except Exception as ex:
            print(f"FAIL {d}: oracle SQL error: {str(ex).splitlines()[0]}")
            fails += 1
            continue
        err = compare(d, got, exp)
        if err:
            print(f"FAIL {d}: {err}")
            fails += 1
        else:
            print(f"OK   {d}: {len(got)} rows")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)

main()
