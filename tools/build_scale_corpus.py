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

FULL-SUITE mode: tools/build_scale_corpus.py <src> <out> <K> --full
builds ALL ten tables with CONSISTENT foreign-key shifts (o_custkey /
l_orderkey / l_partkey / l_suppkey / user_id shift with their parents, so
referential integrity and join selectivity replicate per shard — the
probe #2 method); region/nation stay shared dims, copied as-is. NOTE the
default per-table mode deliberately leaves orders.o_custkey unshifted
(it predates the full mode and existing probes' corpora were built that
way); --full shifts it to match the customer copies.
"""
import sys

import duckdb

src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
# --full is a flag, not a table name: parse it independently of position so
# '--full documents' doesn't silently fall into per-table mode and KeyError.
rest = sys.argv[4:]
full = "--full" in rest
named = [a for a in rest if a != "--full"]
if full and named:
    sys.exit("--full builds ALL tables; don't combine it with table names")
tables = named or ["documents", "orders"]
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

FULL_SQL = dict(SQL)
FULL_SQL.update({
    "region": f"SELECT * FROM '{src}/region.parquet'",
    "nation": f"SELECT * FROM '{src}/nation.parquet'",
    "customer": f"""
      SELECT c_custkey + k * {SHIFT} AS c_custkey,
             c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM '{src}/customer.parquet' CROSS JOIN range({k}) r(k)""",
    "supplier": f"""
      SELECT s_suppkey + k * {SHIFT} AS s_suppkey,
             s_name, s_nationkey, s_acctbal
      FROM '{src}/supplier.parquet' CROSS JOIN range({k}) r(k)""",
    "part": f"""
      SELECT p_partkey + k * {SHIFT} AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM '{src}/part.parquet' CROSS JOIN range({k}) r(k)""",
    "orders": f"""
      SELECT o_orderkey + k * {SHIFT} AS o_orderkey,
             o_custkey + k * {SHIFT} AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM '{src}/orders.parquet' CROSS JOIN range({k}) r(k)""",
    "lineitem": f"""
      SELECT l_orderkey + k * {SHIFT} AS l_orderkey,
             l_partkey + k * {SHIFT} AS l_partkey,
             l_suppkey + k * {SHIFT} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM '{src}/lineitem.parquet' CROSS JOIN range({k}) r(k)""",
    "events": f"""
      SELECT event_id + k * {SHIFT} AS event_id, ts,
             user_id + k * {SHIFT} AS user_id,
             event_type, value, props
      FROM '{src}/events.parquet' CROSS JOIN range({k}) r(k)""",
})

import os
os.makedirs(out, exist_ok=True)
todo = ("region nation customer supplier part orders lineitem events "
        "documents embeddings").split() if full else tables
sql_map = FULL_SQL if full else SQL
for t in todo:
    q = sql_map[t]
    con.sql(f"COPY ({q}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    # Re-encode through pyarrow: DuckDB's COPY writes PLAIN (no dictionary)
    # pages for these cross-join outputs, which disables Spark's vectorized
    # dictionary fast paths and inflates scan CPU ~5x on string/low-card
    # columns — a corpus-build artifact that polluted probe #20's first
    # pass. The driver's testdata is pyarrow-written (dictionary on), so
    # match that layout for like-for-like scan costs.
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{out}/{t}.parquet")
    pq.write_table(tbl, f"{out}/{t}.parquet", use_dictionary=True,
                   compression="snappy")
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows -> {out}/{t}.parquet")
