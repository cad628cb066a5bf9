#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run graft.Verify first, then
compare each dumped parquet against its DuckDB oracle SQL.

Usage: python3 scripts/check_oracle.py [verify_out_dir] [sf_dir]
"""
import duckdb, json, os, sys
import numpy as np

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

fails = 0
oracle = json.load(open(f"{out}/oracle_sql.json"))
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    mine = duckdb.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
    try:
        ref = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}"); fails += 1; continue
    mine, ref = mine[sorted(mine.columns)], ref[sorted(ref.columns)]
    if list(mine.columns) != list(ref.columns):
        print(f"{name}: COLUMN MISMATCH {list(mine.columns)} vs {list(ref.columns)}")
        fails += 1; continue
    if len(mine) != len(ref):
        print(f"{name}: ROWCOUNT {len(mine)} vs {len(ref)}"); fails += 1; continue
    bad = []
    for c in mine.columns:
        a, b = mine[c], ref[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            if not np.allclose(a.astype(float).fillna(-1e300),
                               b.astype(float).fillna(-1e300), rtol=0, atol=0):
                bad.append((c, float(np.abs(a.astype(float).fillna(0)
                                            - b.astype(float).fillna(0)).max())))
        elif not a.astype(str).equals(b.astype(str)):
            bad.append((c, "values"))
    if bad:
        print(f"{name}: MISMATCH {bad}"); fails += 1
    else:
        print(f"{name}: OK ({len(mine)} rows)")

# queries with no oracle get a rows-only note
sys.exit(1 if fails else 0)
