#!/usr/bin/env python3
"""Property-based differential fuzz of the Spark <-> DuckDB oracle contract.

Round 9 proved the oracle gate's defects hide in VALUE classes, not just
volume: all eight sf1 fixes were tie-breaks, overflow and rounding edges
that sf0.1 simply never sampled. This harness attacks the same classes at
sf-independent cost: seeded generators plant adversarial values — ties
everywhere, -0.0 vs 0.0, envelope-edge 2^30 magnitudes, zero-variance and
single-row series, empty/duplicate/whitespace documents, zero / axis-
aligned / antipodal embeddings — overlays them on the sf0.001 base
tables, runs graft.Verify over the numerically hottest queries, and
hash-compares each against its DuckDB oracle via check_oracle.py.

Usage:
    python3 tools/fuzz_parity.py [--seeds 1,2,3,4,5] [--queries q1,q2]
Writes FUZZ_r10.json {seed: {query: PASS|FAIL...}, n_cases: N} and exits
non-zero on any FAIL. Each seed is one dataset; "cases" = adversarial
rows generated (the spec target is >= 1000 across seeds).
"""
import argparse
import json
import math
import os
import random
import shutil
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASE = "/root/testdata/sf0.001"
WORK = "/tmp/fuzz"

# The numerically hottest event/document/embedding queries: rank/tie
# sensitive statistics, variance-guarded tests, rounding-snapped sums,
# iterative float pipelines. Relational TPC-H queries keep base tables.
HOT_QUERIES = [
    # events: moments, ranks, ties, zero variance, single-row series
    "q01_resample_avg", "q03_rolling_avg", "q41_zscore_outliers",
    "q42_autocorr", "q44_corr_matrix", "q110_ewma", "q111_changepoint",
    "q116_seasonal_outliers", "q125_welch_weekend", "q127_linear_trend",
    "q128_ks_drift", "q130_mann_whitney", "q131_dominant_period",
    "q139_cusum", "q140_quantile_drift", "q141_winsorized",
    "q152_theil_sen", "q154_benford", "q155_bootstrap_ci",
    "q168_hurst_rs", "q180_rolling_moments", "q181_runs_test",
    "q182_drawdown", "q183_variance_ratio", "q184_run_length_census",
    "q193_pacf", "q194_durbin_watson", "q201_kendall_tau",
    "q202_spearman_daily", "q206_jarque_bera", "q224_mann_kendall",
    "q240_grubbs", "q243_weighted_median", "q287_kalman_level",
    "q288_kpss_level", "q289_rolling_median", "q292_markov_stationary",
    "q302_cvm_drift", "q314_energy_distance", "q409_mcnemar",
    "q410_cochran_q", "q415_hampel",
    # documents: empty/whitespace/dup/72-char texts
    "q20_dedup_exact", "q27_lang_id", "q28_quality_score",
    "q29_token_count", "q113_token_entropy", "q203_cross_entropy",
    "q229_paragraph_dedup", "q262_readability", "q424_phash_pairs",
    # embeddings: zero vectors, axis-aligned, antipodal, huge components
    "q25_cosine_topk", "q122_norm_outliers", "q200_pca_power",
    "q231_vector_profile", "q430_pca_deflation", "q433_pca_outliers",
]

VOCAB = ("the spark batch window merge join filter sort table scan row "
         "column data value key part order line agg query hash dup small "
         "big slow fast stream vector customer").split()


def gen_events(rng):
    """Adversarial (event_id, ts, user_id, event_type, value, props)."""
    rows = []
    eid = [0]
    base = 1704067200  # 2024-01-01 epoch seconds

    def add(etype, uid, offsets, values):
        for off, v in zip(offsets, values):
            rows.append((eid[0], base + off, uid, etype, float(v),
                         '{"k": %d}' % rng.randrange(100)))
            eid[0] += 1

    # single- and two-row series (every windowed stat's degenerate case)
    add("single", 1, [10], [rng.choice([1.0, -0.0, 16384.0])])
    add("double", 1, [20, 86420], [3.5, 3.5])
    # zero-variance series: sd=0 guards, MAD=0 conventions
    n = 60 + rng.randrange(40)
    add("const", 2, [i * 3600 for i in range(n)], [7.25] * n)
    # ties everywhere: tiny value alphabet incl. signed zeros
    n = 200 + rng.randrange(100)
    pool = [1.0, 2.0, -0.0, 0.0, -1.0, 0.5]
    add("ties", 2, [i * 900 + rng.randrange(300) for i in range(n)],
        [rng.choice(pool) for _ in range(n)])
    # 2^14-adjacent magnitudes: exact on the double lattice and inside the
    # TIGHTEST family envelope (the daily-mean autocorrelation family snaps
    # centered squares through decimal(28,16) -- integral room 1e12, so
    # |v| <~ 1e4 at 1e4-row series). Larger magnitudes are per-family
    # rejection contracts, not hash-parity inputs: both engines reject
    # loudly (FuzzParitySpec pins 2^53 for the (28,6) moment family; the
    # (28,16)/(28,12) families reject from ~1e8). See SURVEY §3 envelopes.
    n = 80 + rng.randrange(40)
    big = [16383.0, 16384.0, 16385.0, -16384.0, 9999.00005]
    add("huge", 3, [i * 7200 for i in range(n)],
        [rng.choice(big) for _ in range(n)])
    # magnitude mix: denormal-ish tiny vs large, rounding-boundary values
    n = 150 + rng.randrange(50)
    mix = [1e-300, -1e-300, 1e4, -1e4, 0.00005, 1.00005, 2.5, -2.5,
           0.1 + 0.2, 123.456]
    add("mix", 4, [i * 1800 + (i % 7) for i in range(n)],
        [rng.choice(mix) for _ in range(n)])
    # gap-heavy daily-ish series (contiguity gates, resample/ffill)
    n = 90 + rng.randrange(30)
    offs, t = [], 0
    for _ in range(n):
        t += rng.choice([60, 3600, 86400, 7 * 86400])
        offs.append(t)
    add("gappy", 5, offs, [round(rng.gauss(50, 20), 2) for _ in range(n)])
    # plain series for baseline sanity (keeps aggregates non-degenerate)
    n = 300 + rng.randrange(100)
    add("plain", 5, [i * 600 + rng.randrange(60) for i in range(n)],
        [round(rng.uniform(-100, 300), 2) for _ in range(n)])
    return rows


def gen_documents(rng):
    rows = []
    did = [0]

    def add(text, lang="en", source="s0"):
        rows.append((did[0], text, lang, source, len(text)))
        did[0] += 1

    add("")                      # empty text
    add(" ")                     # whitespace only
    add("a")                     # single char
    add("x" * 72)                # exactly the dHash grid floor
    add("x" * 71)                # one under it
    dup = " ".join(rng.choice(VOCAB) for _ in range(40))
    add(dup); add(dup)           # exact duplicate pair
    add(dup + " extra")          # near duplicate
    add(("tok " * 50).strip())   # one token repeated
    for _ in range(40 + rng.randrange(20)):
        n = rng.randrange(1, 120)
        add(" ".join(rng.choice(VOCAB) for _ in range(n)),
            rng.choice(["en", "es", "de", "zh", "fr"]),
            "src%d" % rng.randrange(3))
    return rows


def gen_embeddings(rng, dim=64):
    rows = []

    def add(vec, label):
        rows.append((len(rows), [float(x) for x in vec], label))

    add([0.0] * dim, 0)                          # zero vector (norm 0)
    e0 = [0.0] * dim; e0[0] = 1.0; add(e0, 1)    # axis-aligned
    e1 = [0.0] * dim; e1[1] = 1.0; add(e1, 1)
    v = [rng.gauss(0, 0.1) for _ in range(dim)]
    add(v, 2); add(v, 2)                         # identical pair
    add([-x for x in v], 3)                      # antipodal
    # NOTE: no float-max (3e38) vector here — embedding operators contract
    # to the unit-normalized envelope (decimal(18,16) dot accumulators);
    # far-out magnitudes are a loud-rejection class, pinned in
    # FuzzParitySpec, not a hash-parity input
    add([-0.0] * dim, 4)                         # signed-zero vector
    for _ in range(40 + rng.randrange(20)):
        add([rng.gauss(0, 0.12) for _ in range(dim)], rng.randrange(8))
    return rows


def write_dataset(seed):
    rng = random.Random(seed)
    d = os.path.join(WORK, "seed%d" % seed)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for f in os.listdir(BASE):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(BASE, f), os.path.join(d, f))
    con = duckdb.connect()
    ev = gen_events(rng)
    con.execute("CREATE TABLE ev(event_id BIGINT, es BIGINT, user_id BIGINT,"
                " event_type VARCHAR, value DOUBLE, props VARCHAR)")
    con.executemany("INSERT INTO ev VALUES (?,?,?,?,?,?)", ev)
    con.execute("COPY (SELECT event_id, to_timestamp(es)::TIMESTAMP ts, "
                "user_id, event_type, value, props FROM ev ORDER BY event_id)"
                " TO '%s/events.parquet' (FORMAT PARQUET)" % d)
    docs = gen_documents(rng)
    con.execute("CREATE TABLE dd(doc_id BIGINT, text VARCHAR, lang VARCHAR,"
                " source VARCHAR, n_chars BIGINT)")
    con.executemany("INSERT INTO dd VALUES (?,?,?,?,?)", docs)
    con.execute("COPY (SELECT * FROM dd ORDER BY doc_id) TO "
                "'%s/documents.parquet' (FORMAT PARQUET)" % d)
    emb = gen_embeddings(rng)
    con.execute("CREATE TABLE ee(vec_id BIGINT, embedding FLOAT[],"
                " label INTEGER)")
    con.executemany("INSERT INTO ee VALUES (?,?,?)", emb)
    con.execute("COPY (SELECT * FROM ee ORDER BY vec_id) TO "
                "'%s/embeddings.parquet' (FORMAT PARQUET)" % d)
    con.close()
    return d, len(ev) + len(docs) + len(emb)


def run_seed(seed, queries):
    d, n_cases = write_dataset(seed)
    out = os.path.join(WORK, "out%d" % seed)
    shutil.rmtree(out, ignore_errors=True)
    r = subprocess.run(
        ["sbt", "-batch", "runMain graft.Verify %s %s %s"
         % (d, out, ",".join(queries))],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    verify_errs = [l for l in (r.stdout + "\n" + r.stderr).splitlines()
                   if "] failed:" in l]
    chk = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_oracle.py"),
         out, d, ",".join(queries)],
        capture_output=True, text=True, timeout=3600)
    results = {}
    for line in chk.stdout.splitlines():
        if line.startswith("PASS ") or line.startswith("FAIL "):
            q = line.split()[1].rstrip(":")
            results[q] = "PASS" if line.startswith("PASS") else "FAIL"
    for l in verify_errs:
        q = l.split("[verify] ")[-1].split(" failed:")[0]
        results[q] = "FAIL(spark: " + l.split("failed:")[-1].strip()[:120] + ")"
    detail = [l for l in chk.stdout.splitlines()
              if l.startswith("FAIL") or "only-in" in l or "differs" in l]
    return n_cases, results, detail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="1,2,3,4,5")
    ap.add_argument("--queries", default=",".join(HOT_QUERIES))
    ap.add_argument("--out", default=os.path.join(REPO, "FUZZ_r10.json"))
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]
    queries = args.queries.split(",")
    os.makedirs(WORK, exist_ok=True)
    report = {"queries": len(queries), "seeds": seeds, "n_cases": 0,
              "results": {}, "fail_detail": {}}
    any_fail = False
    for s in seeds:
        n, res, detail = run_seed(s, queries)
        report["n_cases"] += n
        report["results"][str(s)] = res
        fails = {q: v for q, v in res.items() if v != "PASS"}
        missing = [q for q in queries if q not in res]
        if missing:
            fails["_missing"] = ",".join(missing)
        if fails:
            any_fail = True
            report["fail_detail"][str(s)] = detail[:40]
        print("seed %d: %d/%d pass, %d cases%s"
              % (s, sum(1 for v in res.values() if v == "PASS"),
                 len(queries), n, (" FAILS: %s" % fails) if fails else ""))
    report["status"] = "FAIL" if any_fail else "PASS"
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote %s status=%s n_cases=%d"
          % (args.out, report["status"], report["n_cases"]))
    sys.exit(1 if any_fail else 0)


if __name__ == "__main__":
    main()
