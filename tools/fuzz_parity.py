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
Writes FUZZ_r11.json {seed: {query: PASS|FAIL...}, n_cases: N} and exits
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
    "q440_graph_ann", "q441_beam_sweep",
    # relational TPC-H shapes (round-11 widening: NULL keys, empty join
    # sides, all-returned orders, tie clusters from overlay_tpch)
    "q13_pricing_summary", "q14_top_revenue", "q15_region_rollup",
    "q16_window_topn", "q17_semi_anti", "q18_decorrelated_agg",
    "q33_asof_join", "q34_percentiles", "q35_revenue_rollup",
    "q37_event_pivot", "q45_window_suite", "q46_ship_priority",
    "q48_funnel", "q49_mad", "q63_cohort_retention", "q66_market_share",
    "q67_transitions", "q69_ship_delay_sla", "q70_degree_census",
    "q84_attribution", "q94_scd2_intervals", "q99_basket_lift",
    "q100_session_paths", "q104_sole_late_supplier", "q105_point_in_time",
    "q107_promo_share", "q108_cohort_ltv", "q109_returns_impact",
    "q112_idle_customers", "q114_order_backlog", "q117_supplier_hhi",
    "q119_abc_classes", "q120_priority_mix", "q121_revenue_gini",
    "q132_local_supplier_volume", "q133_cross_nation_trade",
    "q134_disjunctive_revenue", "q147_revenue_scan", "q148_profit_by_nation",
    "q149_top_supplier", "q150_small_qty_revenue", "q151_big_orders",
    "q159_cust_opportunity", "q167_min_price_supplier", "q175_priority_wait",
    "q176_late_ship_mix", "q177_custdist", "q178_supplier_breadth",
    "q179_dominant_supplier", "q190_important_parts", "q204_cube_revenue",
    "q217_range_frame_revenue", "q218_mom_growth", "q220_grouping_sets",
    "q236_column_profile", "q237_fk_orphans", "q238_pareto_frontier",
    "q244_lorenz_deciles", "q264_rfm_segments", "q274_against_tide",
    "q276_price_volume_mix", "q280_rollup_consistency",
    "q291_delivery_percentiles", "q305_nation_gini", "q309_spend_migration",
    "q325_abc_xyz", "q329_brand_cagr", "q339_priority_inversion",
    "q342_top_heavy", "q345_wilson_returns", "q347_icc_ship_delay",
    "q349_purchase_entropy", "q350_clumpiness", "q352_priority_markov",
    "q353_price_endings", "q362_fulfillment_spread", "q373_first_value_ltv",
    "q376_discount_monotonicity", "q426_price_index",
    "q429_simpsons_reversal", "q435_pearson_residuals",
    # graph family (self-pairs, degenerate orders, NULL-key edges)
    "q142_supplier_pagerank", "q143_copurchase_triangles",
    "q144_assortativity", "q145_adamic_adar", "q146_copurchase_kcore",
    "q157_communities", "q160_hits_authority", "q161_jaccard_neighbors",
    "q170_clustering_coeff", "q172_weighted_communities",
    "q173_degree_power_law", "q189_rich_club", "q199_local_bridges",
    "q219_modularity", "q255_landmark_bfs", "q256_edge_formation",
    "q286_profile_neighbors", "q298_radius_profile", "q299_absorbing_time",
    "q354_flow_reciprocity", "q358_participation_ratio",
    "q360_diameter_sweep", "q396_ktruss", "q422_two_hop",
    # recsys family (empty baskets, cold items, tie scores)
    "q166_supplier_affinity", "q268_negative_samples",
    "q285_basket_confidence", "q308_cold_start", "q423_item_knn",
    "q439_rec_coverage",
    # round-11 widening (conformal folds, CUPED phases, sign bits, bands)
    "q442_conformal_interval", "q443_cuped", "q444_binary_embed_recall",
    "q445_stratified_ate", "q446_band_join", "q447_woe_iv",
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


def overlay_tpch(rng, con, d):
    """Append adversarial rows to the copied TPC-H tables (round-11
    widening): NULL join keys, empty-join-side members (orders with no
    lineitems, customers with no orders, nations with no suppliers,
    never-ordered parts), all-returned orders, zero-quantity /
    full-discount lines, duplicated lines, and tie clusters (identical
    totalprice / shipdate / acctbal) — the classes the relational, graph
    and recsys families never see at any SF of the uniform generator.
    Key ranges start far above the base tables' maxima; names keep the
    base formats (ANSI CAST parsers must keep parsing). Returns the
    number of appended rows."""
    n = 0

    def append(table, cols, rows, cast=None):
        nonlocal n
        path = os.path.join(d, table + ".parquet")
        con.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM "
                    "read_parquet('%s')" % path)
        placeholders = ",".join(["?"] * len(cols.split(",")))
        con.executemany(
            "INSERT INTO t(%s) VALUES (%s)" % (cols, placeholders), rows)
        con.execute("COPY t TO '%s' (FORMAT PARQUET)" % path)
        n += len(rows)

    day = 86400
    base_date = "1998-03-%02d"
    # --- orders: empty orders, NULL custkey, totalprice/date tie cluster
    o0 = 100000
    orders = [
        (o0 + 0, 7, "O", 5000.25, "1998-03-01", "1-URGENT"),     # no lines
        (o0 + 1, 8, "F", 5000.25, "1998-03-01", "1-URGENT"),     # no lines
        (o0 + 2, None, "F", 5000.25, "1998-03-01", "2-HIGH"),    # NULL cust
        (o0 + 3, 9, "F", 7777.77, "1998-03-02", "2-HIGH"),       # returned
        (o0 + 4, 9, "F", 7777.77, "1998-03-02", "2-HIGH"),       # tie twin
        (o0 + 5, 10, "O", 0.0, "1998-03-03", "5-LOW"),           # zero price
        (o0 + 6, 11, "F", 123.45, "1998-03-04", "3-MEDIUM"),     # dup lines
    ]
    for i in range(rng.randrange(3, 7)):                         # tie pile
        orders.append((o0 + 10 + i, 12 + (i % 3), "F", 999.99,
                       base_date % (5 + i % 3), "4-NOT SPECIFIED"))
    append("orders",
           "o_orderkey,o_custkey,o_orderstatus,o_totalprice,o_orderdate,"
           "o_orderpriority",
           [(a, b, c, p, dt + " 00:00:00", pr)
            for a, b, c, p, dt, pr in orders])

    # --- lineitem: NULL part/supp keys, all-returned order, zero qty,
    # full discount, duplicate lines, same part twice, shipdate ties
    li = []
    def line(ok, pk, sk, ln, qty, price, disc, tax, rf, ls, sd):
        li.append((ok, pk, sk, ln, qty, price, disc, tax, rf, ls,
                   sd + " 00:00:00"))
    # all-returned order (every line R)
    for j in range(3):
        line(o0 + 3, 50 + j, j % 10, j + 1, 10.0 + j, 1000.0 + j,
             0.05, 0.02, "R", "F", "1998-03-02")
    # NULL join keys on a real order
    line(o0 + 2, None, 3, 1, 5.0, 500.0, 0.0, 0.0, "N", "F", "1998-03-01")
    line(o0 + 2, 60, None, 2, 5.0, 500.0, 0.0, 0.0, "N", "F", "1998-03-01")
    # zero-quantity + full-discount (revenue exactly 0)
    line(o0 + 5, 61, 4, 1, 0.0, 800.0, 1.0, 0.0, "N", "O", "1998-03-03")
    # duplicate lines (identical but linenumber), same part twice
    line(o0 + 6, 62, 5, 1, 7.0, 123.45, 0.1, 0.01, "A", "F", "1998-03-04")
    line(o0 + 6, 62, 5, 2, 7.0, 123.45, 0.1, 0.01, "A", "F", "1998-03-04")
    # shipdate tie cluster across the tie-pile orders
    for i in range(rng.randrange(4, 9)):
        line(o0 + 10 + (i % 3), 70 + i, i % 10, 1 + i // 3, 20.0,
             2000.0, 0.05, 0.03, rng.choice(["N", "A", "R"]), "F",
             "1998-03-06")
    append("lineitem",
           "l_orderkey,l_partkey,l_suppkey,l_linenumber,l_quantity,"
           "l_extendedprice,l_discount,l_tax,l_returnflag,l_linestatus,"
           "l_shipdate", li)

    # --- customer: no-orders customer, NULL nationkey, acctbal ties/zeros
    c0 = 100000
    append("customer", "c_custkey,c_name,c_nationkey,c_acctbal,c_mktsegment",
           [(c0 + 0, "Customer#%09d" % (c0 + 0), 3, 555.55, "FURNITURE"),
            (c0 + 1, "Customer#%09d" % (c0 + 1), None, 555.55, "BUILDING"),
            (c0 + 2, "Customer#%09d" % (c0 + 2), 4, 0.0, "AUTOMOBILE"),
            (c0 + 3, "Customer#%09d" % (c0 + 3), 4, -0.0, "AUTOMOBILE")])

    # --- supplier: NULL nationkey (referenced by no adversarial lines)
    s0 = 100000
    append("supplier", "s_suppkey,s_name,s_nationkey,s_acctbal",
           [(s0, "Supplier#%09d" % s0, None, 100.0),
            (s0 + 1, "Supplier#%09d" % (s0 + 1), 24, 100.0)])

    # --- nation: empty-member nation + NULL regionkey nation
    append("nation", "n_nationkey,n_name,n_regionkey",
           [(98, "NATION_98", 4), (99, "NATION_99", None)])

    # --- region: region with no nations
    append("region", "r_regionkey,r_name", [(9, "NOWHERE")])

    # --- part: never-ordered part, size 0, retailprice tie
    p0 = 100000
    append("part", "p_partkey,p_name,p_brand,p_type,p_size,p_retailprice",
           [(p0, "ghost widget", "Brand#13", "ECONOMY", 0, 900.0),
            (p0 + 1, "ghost gadget", "Brand#13", "ECONOMY", 1, 900.0)])
    return n


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
    n_tpch = overlay_tpch(rng, con, d)
    con.close()
    return d, len(ev) + len(docs) + len(emb) + n_tpch


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
    ap.add_argument("--out", default=os.path.join(REPO, "FUZZ_r11.json"))
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
