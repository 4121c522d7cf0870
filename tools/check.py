#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB compare.

Usage: python3 tools/check.py [sfDir] [outDir]
Assumes graft.Verify has already written outDir/<name>/ parquet dirs and
outDir/oracle_sql.json. Compares each query result against DuckDB running
the oracle SQL over the same tables: sort columns by name, sort rows by
all columns, exact compare (with float diff report on mismatch).
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify dtypes-ish: datetimes -> iso strings, categories -> str
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if not isinstance(v, (str, bytes, type(None))) else v)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

n_pass = n_fail = 0
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        n_fail += 1
        results[name] = "missing"
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: exec error: {e}")
        n_fail += 1
        results[name] = "error"
        continue
    g, e = normalize(got), normalize(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns spark={list(g.columns)} duck={list(e.columns)}")
        n_fail += 1; results[name] = "cols"; continue
    if len(g) != len(e):
        print(f"FAIL {name}: rows spark={len(g)} duck={len(e)}")
        n_fail += 1; results[name] = "rows"; continue
    ok = True
    for c in g.columns:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            gv2 = gv.astype(float); ev2 = ev.astype(float)
            both_nan = np.isnan(gv2) & np.isnan(ev2)
            neq = ~(both_nan | (gv2 == ev2))
            if neq.any():
                d = np.nanmax(np.abs(gv2[neq] - ev2[neq]))
                print(f"FAIL {name}: col {c} float mismatch n={neq.sum()} maxdiff={d}")
                ok = False
        else:
            ga = pd.Series(gv).astype(str).to_numpy()
            ea = pd.Series(ev).astype(str).to_numpy()
            neq = ga != ea
            if neq.any():
                i = int(np.argmax(neq))
                print(f"FAIL {name}: col {c} mismatch n={neq.sum()} first: spark={ga[i]!r} duck={ea[i]!r}")
                ok = False
    if ok:
        n_pass += 1; results[name] = "pass"
        print(f"PASS {name} ({len(g)} rows)")
    else:
        n_fail += 1; results[name] = "values"

print(f"\n{n_pass} pass / {n_fail} fail / {len(oracle)} total")
sys.exit(1 if n_fail else 0)
