#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<query>/ parquet written by graft.Verify, runs the
corresponding oracle SQL from <out>/oracle_sql.json in DuckDB against views
over <sf_dir>/*.parquet, and compares the two row-sets exactly (after
canonicalizing column order by name and sorting rows). Strict equality —
the real driver hash-compares, so "close" is not good enough.

Also TYPE-strict: the driver's hash is sensitive to column types, so an
oracle emitting HUGEINT (DuckDB's type for sum(INTEGER)) against Spark's
BIGINT hash-mismatches even when every value is identical (the round-5
q176 failure mode). We compare the DuckDB type of each oracle output
column against the type DuckDB assigns the Spark parquet column and fail
on any divergence, modulo a small equivalence map for representations
that hash identically (e.g. DECIMAL scale widening Spark performs on
write is visible in the parquet type itself, so no mapping is needed).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    # IEEE: -0.0 == 0.0 — Spark's round() canonicalizes the
                    # sign bit away while DuckDB preserves it, so compare by
                    # VALUE (+ 0.0 folds -0.0 to 0.0). Sign-DEPENDENT
                    # divergence (1/x, copysign) still shows as a real diff.
                    v = repr(round(v, 9) + 0.0)
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


# Type pairs (spark_parquet_type, duckdb_oracle_type) known to hash
# identically on the driver side (calibrated against CORRECTNESS_r05: the
# queries green there span spark=INTEGER vs oracle=BIGINT — the driver
# canonicalizes sub-64-bit integer widths — while q176's BIGINT vs HUGEINT
# was red). Anything NOT in this list, notably any HUGEINT, is a failure.
_INTS = ["TINYINT", "SMALLINT", "INTEGER", "BIGINT"]
EQUIV = {(a, b) for a in _INTS for b in _INTS if a != b}


def type_mismatches(got_desc, exp_desc):
    """Compare per-column types by name; return list of error strings."""
    got_t = dict(got_desc)
    errs = []
    for col, exp_type in exp_desc:
        spark_type = got_t.get(col)
        if spark_type is None:
            continue  # column-name mismatch is reported separately
        if spark_type == exp_type or (spark_type, exp_type) in EQUIV:
            continue
        errs.append(f"{col}: spark={spark_type} oracle={exp_type}")
    return errs


def main(out_dir, sf_dir, only=None):
    import os
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is a single parquet FILE; Spark-written synthetic
        # SFs (graft.ScaleUp) are DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_desc = list(zip(got_rel.columns, [str(t) for t in got_rel.types]))
            got_cols = [d[0] for d in got_desc]
            got = canon(got_rel.fetchall(), got_cols)
            exp_rel = con.sql(sql)
            exp_desc = list(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
            exp_cols = [d[0] for d in exp_desc]
            exp = canon(exp_rel.fetchall(), exp_cols)
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns spark={sorted(got_cols)} oracle={sorted(exp_cols)}")
            n_fail += 1
            continue
        type_errs = type_mismatches(got_desc, exp_desc)
        if type_errs:
            print(f"FAIL {name}: column types {'; '.join(type_errs)}")
            n_fail += 1
        elif got != exp:
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            diff = [(a, b) for a, b in zip(got, exp) if a != b][:3]
            exp_set, got_set = set(exp), set(got)  # once — not per element
            only_got = [r for r in got if r not in exp_set][:3]
            only_exp = [r for r in exp if r not in got_set][:3]
            for a, b in diff:
                print(f"  first diffs: spark={a}\n               oracle={b}")
                break
            if only_got:
                print(f"  only-in-spark: {only_got}")
            if only_exp:
                print(f"  only-in-oracle: {only_exp}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    # optional 3rd arg: comma-separated query filter (resumable sweeps)
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
