#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate: compare graft.Verify's
parquet dumps against the DuckDB oracle SQL, exactly, after sorting columns
by name and rows by all columns. Usage:
  tools/check.py [sfDir] [outDir] [key ...]
"""
import json, math, sys

import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize cell values to comparable python objects
    def cell(v):
        if v is None:
            return None
        if isinstance(v, float) and math.isnan(v):
            return None
        import decimal, datetime
        import numpy as np
        if isinstance(v, decimal.Decimal):
            return ("dec", str(v.normalize()))
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, (np.floating,)):
            return float(v)
        if isinstance(v, (np.ndarray, list, tuple)):
            return tuple(cell(x) for x in v)
        if isinstance(v, (pd.Timestamp, datetime.datetime)):
            ts = pd.Timestamp(v)
            return ("ts", ts.isoformat())
        if isinstance(v, datetime.date):
            return ("d", v.isoformat())
        return v
    rows = [tuple(cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return list(df.columns), rows

fails, passes, skips = [], 0, 0
for key in sorted(oracle):
    if only and key not in only:
        continue
    try:
        gcols, grows = norm(con.sql(f"SELECT * FROM '{out}/{key}/*.parquet'").df())
        wcols, wrows = norm(con.sql(oracle[key]).df())
    except Exception as e:
        fails.append((key, f"load/oracle error: {e}"))
        continue
    if gcols != wcols:
        fails.append((key, f"columns: got {gcols} want {wcols}"))
        continue
    if len(grows) != len(wrows):
        fails.append((key, f"rows: got {len(grows)} want {len(wrows)}"))
        continue
    bad = None
    for i, (gr, wr) in enumerate(zip(grows, wrows)):
        for c, x, y in zip(gcols, gr, wr):
            eq = x == y
            if not eq and isinstance(x, tuple) and isinstance(y, tuple) and len(x) == 2 and x[0] == "dec" and y[0] == "dec":
                eq = float(x[1]) == float(y[1])
            if not eq:
                bad = f"col {c} row {i}: got {x!r} want {y!r}"
                break
        if bad:
            break
    if bad:
        fails.append((key, bad))
    else:
        passes += 1

for k, m in fails:
    print(f"FAIL {k}: {m}")
print(f"\n{passes} passed, {len(fails)} failed "
      f"(of {len([k for k in oracle if not only or k in only])} oracle-checked)")
sys.exit(1 if fails else 0)
