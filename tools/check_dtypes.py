#!/usr/bin/env python3
"""Oracle dtype-compat gate: run every SparkEntry.oracleSql through DuckDB
and assert each result column arrives as a driver-friendly type. The driver's
hash compare fetches both sides as pandas; a DuckDB HUGEINT (what sum(BIGINT)
returns) or DECIMAL column fetches as a different dtype than Spark's int64
even when every value is identical, so the hash mismatches — the
text_unigram_logprob red row in CORRECTNESS_r07 was exactly this. This gate
makes that a checked class, not a per-key incident.

Usage:
  tools/check_dtypes.py [sfDir] [outDir]      # outDir holds oracle_sql.json
  tools/check_dtypes.py --selftest            # prove the gate catches the bug
"""
import json
import sys

import duckdb

# DuckDB logical types that fetch into pandas as the same dtype the Spark
# parquet dump produces. Anything outside this set (HUGEINT, DECIMAL, UBIGINT,
# nested LIST/STRUCT...) hash-mismatches in the driver compare even on equal
# values. Spark-side decimals/arrays are already flagged by check.py.
OK_TYPES = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT",
    "DOUBLE", "FLOAT",
    "VARCHAR", "BOOLEAN",
    "DATE", "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
}

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def connect(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def bad_columns(con, sql: str):
    rel = con.sql(sql)
    return [f"{n}:{t}" for n, t in zip(rel.columns, map(str, rel.types))
            if str(t) not in OK_TYPES]


def selftest(sf: str) -> int:
    con = connect(sf)
    # The bug class: uncast sum over a BIGINT column -> HUGEINT.
    bad = bad_columns(con, "SELECT o_custkey, sum(o_orderkey) AS s FROM orders GROUP BY 1")
    assert any(b.startswith("s:HUGEINT") for b in bad), f"gate missed HUGEINT: {bad}"
    good = bad_columns(
        con, "SELECT o_custkey, CAST(sum(o_orderkey) AS BIGINT) AS s FROM orders GROUP BY 1")
    assert good == [], f"false positive on cast sum: {good}"
    print("selftest OK: uncast sum(BIGINT) flagged, cast form clean")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        return selftest(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    con = connect(sf)
    fails = []
    for key in sorted(oracle):
        try:
            bad = bad_columns(con, oracle[key])
        except Exception as e:  # noqa: BLE001 - report and keep scanning
            fails.append((key, f"oracle error: {e}"))
            continue
        if bad:
            fails.append((key, f"driver-hostile oracle dtypes: {bad}"))
    for k, m in fails:
        print(f"FAIL {k}: {m}")
    print(f"\n{len(oracle) - len(fails)} clean, {len(fails)} flagged of {len(oracle)} oracles")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
