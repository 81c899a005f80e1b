#!/usr/bin/env python3
"""Dev-loop mirror of the driver's DuckDB-oracle compare.

Usage: oracle_check.py SF_DIR OUT_DIR [query ...]

Loads OUT_DIR/<query>/ parquet (written by graft.Verify), runs
OUT_DIR/oracle_sql.json's SQL in DuckDB against the SF_DIR fixture tables,
sorts columns by name / rows by value, and compares exactly.

This script is developer tooling only — the shipped library has no Python
dependency.
"""
import json
import math
import sys

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            return 0.0
        return v
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    # version fingerprint next to the Spark side's verify_env.json — the
    # r12 driver-only mismatches were a DuckDB type-mapping difference
    print(f"duckdb {duckdb.__version__}")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
            exp = con.execute(sql)
            ecols = [d[0] for d in exp.description]
            erows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        # Un-cast HUGEINT (decimal128 in arrow) oracle columns hash
        # differently depending on the driver's DuckDB/pyarrow version —
        # the r12 failure class. Flag them as failures even when the
        # fetchall() value compare below would pass.
        try:
            sch = con.execute(f"SELECT * FROM ({sql}) q LIMIT 0").arrow().schema
            dec = [f.name for f in sch if "decimal" in str(f.type)]
            if dec:
                print(f"FAIL {name}: HUGEINT/decimal oracle columns {dec} "
                      f"(cast to BIGINT in the SQL)")
                n_fail += 1
                continue
        except Exception:
            pass
        gc, gr = canon(grows, gcols)
        ec, er = canon(erows, ecols)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} vs oracle {ec}")
            n_fail += 1
        elif gr != er:
            n_fail += 1
            diffs = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows, "
                  f"{len(diffs)} positional diffs; first: "
                  f"{diffs[0] if diffs else (gr[:2], er[:2])}")
        else:
            n_pass += 1
            print(f"PASS {name} ({len(gr)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
