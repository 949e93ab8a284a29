#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf tables and compare (sorted columns, sorted rows,
exact values) against the parquet written by graft.Verify."""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append(name); print(f"[FAIL] {name}: oracle SQL error: {e}"); continue
    path = f"{OUT}/{name}"
    if not os.path.exists(path):
        fails.append(name); print(f"[FAIL] {name}: no spark output"); continue
    got = pd.read_parquet(path)
    # driver-style compare: sort columns by name, sort rows, hash values
    exp = exp[sorted(exp.columns)]
    got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        fails.append(name)
        print(f"[FAIL] {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        continue
    if len(exp) != len(got):
        fails.append(name)
        print(f"[FAIL] {name}: rows exp={len(exp)} got={len(got)}")
        continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype.kind == 'f' or g.dtype.kind == 'f':
            ef = e.astype(float).to_numpy(); gf = g.astype(float).to_numpy()
            eq = (ef == gf) | (np.isnan(ef) & np.isnan(gf))
        else:
            eq = (e.astype(object).to_numpy() == g.astype(object).to_numpy())
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f"col {c} ({int((~eq).sum())} diffs; row{i}: exp={e.iloc[i]!r} got={g.iloc[i]!r}; "
                       f"dtypes {e.dtype}/{g.dtype})")
    if bad:
        fails.append(name)
        print(f"[FAIL] {name}: " + " | ".join(bad))
    else:
        passes.append(name)
        print(f"[ok]   {name}: {len(exp)} rows")

print(f"\n{len(passes)} pass, {len(fails)} fail" + (f": {fails}" if fails else ""))
sys.exit(1 if fails else 0)
