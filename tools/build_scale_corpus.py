#!/usr/bin/env python3
"""Rebuild the synthetic scale-probe corpora PLANS.md's probes use.

Method (PLANS.md "Scale probe — dedup/ANN/text family at 10x"): K
vocabulary-sharded copies of the source tables — copy k suffixes every
document token with `_k` (shards share no shingles, so near-dup structure
and df distributions replicate per shard, like concatenating K independent
corpora) and shifts ids by k*10M (preserving the %10 new-batch split).
Relational tables get the same id-shift treatment.

Embeddings use the r5 rotation method instead: copy k cyclically rotates
the dimension array by k (norms and intra-shard geometry preserved, so
recall structure replicates per shard) and shifts vec_id by k*10M.

Usage: tools/build_scale_corpus.py <srcSfDir> <outDir> <K> [table ...]
Tables default to: documents orders. (events/lineitem variants are built
by the probes that need them; see PLANS.md for their methods.)
"""
import sys

import duckdb

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
tables = sys.argv[4:] or ["documents", "orders"]
SHIFT = 10_000_000

con = duckdb.connect()
con.sql(f"SET threads TO 16")

SQL = {
    "documents": f"""
      SELECT doc_id + k * {SHIFT} AS doc_id,
             array_to_string(list_transform(string_split(text, ' '),
               t -> t || '_' || k), ' ') AS text,
             lang, source,
             CAST(length(array_to_string(list_transform(string_split(text, ' '),
               t -> t || '_' || k), ' ')) AS BIGINT) AS n_chars
      FROM '{src}/documents.parquet' CROSS JOIN range({k}) r(k)""",
    "orders": f"""
      SELECT o_orderkey + k * {SHIFT} AS o_orderkey,
             o_custkey, o_orderstatus, o_totalprice, o_orderdate,
             o_orderpriority
      FROM '{src}/orders.parquet' CROSS JOIN range({k}) r(k)""",
    "embeddings": f"""
      SELECT vec_id + k * {SHIFT} AS vec_id,
             list_concat(embedding[CAST(k AS INT) + 1:],
                         embedding[:CAST(k AS INT)]) AS embedding,
             label
      FROM '{src}/embeddings.parquet' CROSS JOIN range({k}) r(k)""",
}

import os
os.makedirs(out, exist_ok=True)
for t in tables:
    q = SQL[t]
    con.sql(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows -> {out}/{t}.parquet")
