#!/usr/bin/env python3
"""Regenerate BASELINE.md/.json from a fresh full-surface BENCH.json.

Usage: python3 tools/make_baseline.py <bench.json> <round-label>

Keeps the methodology preamble stable across rounds and swaps in the
per-query table + total, so cross-round diffs stay readable.
"""
import json
import sys

bench_path, label = sys.argv[1], sys.argv[2]
bench = json.load(open(bench_path))
qs = bench["queries"]
total = sum(qs.values())

preamble = f"""# BASELINE — {label} bench (the number later rounds must stay within 2x of)

Source: fresh end-of-{label} run of `graft.Bench` — sf0.1, local[32],
all {len(qs)} queries. Prior tables are preserved as BASELINE_r05.md /
the git history of this file, so cross-round comparisons never diff a
round against itself.

**Methodology** (this is what makes the number comparable): 2 untimed
warmup passes over the full query list (JIT + whole-stage-codegen
compilation + page cache), then 3 timed passes in name order, recording
the per-query MINIMUM of the three. Single measurements on this shared
box swing 2-3x from GC/scheduler jitter; min-of-3 after warmup is the
reproducible signal. Compare future runs against this table only under
the same protocol (`SPARK_GRAFT_BENCH_WARMUP=2 SPARK_GRAFT_BENCH_RUNS=3`,
the Bench defaults). Per-query run spread is recorded alongside in
BENCH_spread.json (min/median/stdev of the timed passes). Residual noise
band: +-30% per query, less in aggregate. No other process may run
sbt/Spark concurrently with the bench — CPU contention skews sub-second
queries 3-4x.

**Total: {total:.1f} s for {len(qs)} queries.**

Deliberate algorithm trades (slower locally, mandatory at 100 TB), all
oracle-identical to their direct counterparts: q21/q47 prefix-filtered
Jaccard, q34/q49 two-pass exact percentiles, q50 maxDf cap, q22/q52/q59
LSH band-bucket cap, q96 asymmetric containment prefix, the distributed
two-pass prefix aggregation behind q119/q121/q238/q244/q264/q309/q325
(+ q378/q385's global rank pools), and — new in round 8 — q313's
<=256-vector sub-blocks (the sf1 rehearsal's quadratic-block fix,
BASELINE_sf1.md). The heavy hitters remain the pair-join dedup family
(q21/q47/q96/q300), the CC-based clustering consumers (q76/q83/q93/q330),
and the brute-force ground-truth sides of the ANN audits
(q377/q380/q386) — all candidate-bounded, none all-pairs.

| query | sec |
| --- | --- |
"""

rows = "".join(f"| {q} | {qs[q]:.3f} |\n" for q in sorted(qs))
open("BASELINE.md", "w").write(preamble + rows)
json.dump(bench, open("BASELINE.json", "w"))
print(f"BASELINE.md/.json written: {len(qs)} queries, total {total:.1f}s")
