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
            # pyarrow yields date objects where duckdb yields midnight
            # timestamps for the same DATE column; normalize to timestamps
            # (the driver's round-1 gate matched date columns, so this is a
            # checker artifact, not a real difference).
            return ("ts", pd.Timestamp(v).isoformat())
        return v
    rows = [tuple(cell(v) for v in r) for r in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return list(df.columns), rows

fails, passes, skips = [], 0, 0
for key in sorted(oracle):
    if only and key not in only:
        continue
    try:
        # Read the Spark dump the way the driver does (pyarrow -> pandas):
        # decimals stay decimal.Decimal, arrays become ndarrays. The oracle is
        # fetched from duckdb as pandas (decimals -> float64). A decimal or
        # array column in the Spark output therefore can never hash-match —
        # flag it as a failure even if values agree numerically.
        import glob as _glob
        gdf = pd.concat(
            [pd.read_parquet(f) for f in sorted(_glob.glob(f"{out}/{key}/*.parquet"))],
            ignore_index=True)
        import pyarrow.parquet as _pq
        # check EVERY part file: a mixed re-run in the same out dir could put
        # a decimal/list column in a later file only
        badtypes = sorted({
            f"{n}:{t}"
            for s in (_pq.read_schema(f)
                      for f in sorted(_glob.glob(f"{out}/{key}/*.parquet")))
            for n, t in zip(s.names, s.types)
            if "decimal" in str(t) or "list" in str(t)})
        if badtypes:
            fails.append((key, f"driver-hostile output types (cast to string/scalar): {badtypes}"))
            continue
        gcols, grows = norm(gdf)
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
            # Decimal.normalize() is canonical, so normalized strings are equal
            # iff the exact values are equal — no float fallback (it would mask
            # differences beyond ~15-16 significant digits, e.g. wei sums).
            if x != y:
                bad = f"col {c} row {i}: got {x!r} want {y!r}"
                break
        if bad:
            break
    if bad:
        fails.append((key, bad))
    elif len(grows) == 0:
        # A 0-row triple-match is vacuously true: it hash-matches without
        # exercising the operator at all (r10 verdict: three keys went green
        # on 0 rows after a testdata regeneration moved the data out from
        # under their fixed predicates). Treat as a failure so the local
        # gate catches the next silent re-introduction.
        fails.append((key, "VACUOUS: 0-row result matches 0-row oracle"))
    else:
        passes += 1

for k, m in fails:
    print(f"FAIL {k}: {m}")
print(f"\n{passes} passed, {len(fails)} failed "
      f"(of {len([k for k in oracle if not only or k in only])} oracle-checked)")
sys.exit(1 if fails else 0)
