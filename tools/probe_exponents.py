#!/usr/bin/env python3
"""Per-key CPU growth exponents across scale decades (probe #21 tooling).

Usage: tools/probe_exponents.py bench_1x.json bench_10x.json [bench_100x.json]

Reads `queries_cpu` (executor-CPU medians — the steal-invariant metric)
from full-suite Bench records taken at 1x/10x/100x corpora and prints one
row per key: CPU at each decade and the per-decade growth exponent
e = log10(cpu_next / cpu_prev). Keys with every CPU below NOISE_S are
skipped (fixed-cost noise dominates); exponents on a sub-NOISE base are
marked '~'. Sort: worst final-decade exponent first.
"""
import json
import math
import sys

NOISE_S = 0.05

recs = [json.load(open(p)) for p in sys.argv[1:]]
assert len(recs) >= 2, "need at least two decade records"
cpus = [r["queries_cpu"] for r in recs]
fails = [set(r.get("failed", [])) for r in recs]
keys = sorted(set(cpus[0]) & set(cpus[-1]))

print(f"# decades: {len(recs)}; keys: {[r['n_queries'] for r in recs]}; "
      f"steal: {[r['steal_pct_cpu'] for r in recs]}; "
      f"failed: {[sorted(f) for f in fails]}")
rows = []
for k in keys:
    vals = [c.get(k) for c in cpus]
    if any(v is None for v in vals):
        continue
    failed_at = [i for i, f in enumerate(fails) if k in f]
    if max(vals) < NOISE_S:
        continue
    exps = []
    for a, b in zip(vals, vals[1:]):
        if a < NOISE_S:
            exps.append(None)  # base too small to quote
        else:
            exps.append(math.log10(max(b, 1e-6) / a))
    rows.append((k, vals, exps, failed_at))

def sortkey(r):
    last = [e for e in r[2] if e is not None]
    return -(last[-1] if last else -9)

rows.sort(key=sortkey)
hdr = "key".ljust(30) + "".join(f"  cpu@10^{i}" for i in range(len(recs)))
hdr += "".join(f"   e{i}{i+1}" for i in range(len(recs) - 1)) + "  failed_at"
print(hdr)
for k, vals, exps, failed_at in rows:
    line = k.ljust(30)
    line += "".join(f"  {v:8.2f}" for v in vals)
    line += "".join("     ~ " if e is None else f"  {e:5.2f}" for e in exps)
    line += f"  {failed_at if failed_at else ''}"
    print(line)
