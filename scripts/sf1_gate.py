#!/usr/bin/env python3
"""Full-registry sf1 correctness gate (VERDICT r14 "Next" #4).

Runs the driver-protocol DuckDB compare for EVERY query against a
graft.Verify dump produced at the sf1 fixture (make_sf1.py), with a
per-query oracle budget: BUDGET1 seconds first, timeouts retried once
at BUDGET2. Remaining timeouts are ANNOTATED in the artifact with the
oracle's enumeration bound where one is known, so the gate is a full
304-row artifact rather than a silent hole.

Driver-side dev tooling only (duckdb) — library code never depends on it.

Usage: sf1_gate.py SF_DIR OUT_DIR ARTIFACT [BUDGET1=150] [BUDGET2=600]
"""
import json
import math
import sys
import time
import threading

import duckdb

SF_DIR, OUT_DIR, ARTIFACT = sys.argv[1], sys.argv[2], sys.argv[3]
BUDGET1 = float(sys.argv[4]) if len(sys.argv) > 4 else 150.0
BUDGET2 = float(sys.argv[5]) if len(sys.argv) > 5 else 600.0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Known intrinsic enumeration bounds for oracles that may still exceed
# the budget at sf1 — carried into the artifact per VERDICT r14 #4.
BOUNDS = {
    "sampler_big": "M*N pair enumeration with a 64-dim dot per pair "
                   "(4e8 pairs / 2.6e10 flops at sf1): the Gumbel-argmax "
                   "admits no sound pruning, so any complete single-node "
                   "oracle is Omega(M*N); graded complete at sf0.01/sf0.1.",
    "dedup_minhash": "output-linear complete pair listing (~2e7 result "
                     "rows at sf1): the uncapped band join's result set "
                     "itself is quadratic in duplicate-cluster size.",
    "dedup_ssjoin": "exact-threshold verification of the ppjoin candidate "
                    "set: the synthetic corpus's compact vocabulary leaves "
                    "~2e7 length+positional-filtered candidates at sf1 "
                    "(~1.4e9 verification join rows) — the fully "
                    "exhaustive dual would be Sigma df^2 = 4.6e9 pairs.",
    "dedup_minhash_recall": "embeds the dedup_ssjoin exact truth set "
                            "(same ~1.4e9-row verification) plus the "
                            "complete candidate audit.",
    "dedup_clusters_ingest": "pair-set-EXACT from-scratch clustering "
                             "(the ingest parity contract forbids the "
                             "hot-bucket cap): ~2e7 uncapped band "
                             "candidates verified then transitively "
                             "closed by a recursive CTE.",
    "dedup_clusters_retract": "same uncapped pair-set-exact parity "
                              "contract as dedup_clusters_ingest.",
}


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


def run_one(name, sql, budget, trust_written_order=False):
    con = duckdb.connect()
    con.execute(f"SET threads={min(24, len(TABLES) * 4)}")
    if trust_written_order:
        # second-attempt policy: DuckDB's join-order search has no
        # statistics on materialized-CTE scans (EC=0) and can pick a
        # build side of ~1e9 rows on the pair-verification joins; the
        # oracle SQL is written left-deep small-build, so the retry
        # trusts the written order (measured: dedup_ssjoin 600s+ -> 294s
        # at sf1)
        con.execute("SET disabled_optimizers='join_order'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    done = [False]

    def kill(c=con, d=done):
        t0 = time.time()
        while time.time() - t0 < budget:
            time.sleep(1)
            if d[0]:
                return
        if not d[0]:
            c.interrupt()

    threading.Thread(target=kill, daemon=True).start()
    t0 = time.time()
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{OUT_DIR}/{name}/*.parquet')")
        gcols = [d[0] for d in got.description]
        grows = got.fetchall()
        exp = con.execute(sql)
        ecols = [d[0] for d in exp.description]
        erows = exp.fetchall()
    except Exception as e:
        done[0] = True
        wall = time.time() - t0
        con.close()
        kind = "TIMEOUT" if "Interrupt" in str(e) else "ERROR"
        return {"status": kind, "wall_s": round(wall, 1), "err": str(e)[:200]}
    done[0] = True
    wall = time.time() - t0
    con.close()
    gc, gr = canon(grows, gcols)
    ec, er = canon(erows, ecols)
    if gc != ec:
        return {"status": "FAIL", "wall_s": round(wall, 1),
                "err": f"columns {gc} vs {ec}"}
    if gr != er:
        diffs = sum(1 for a, b in zip(gr, er) if a != b)
        return {"status": "FAIL", "wall_s": round(wall, 1),
                "err": f"{len(gr)} vs {len(er)} rows, {diffs} diffs"}
    return {"status": "PASS", "wall_s": round(wall, 1), "rows": len(gr)}


def main():
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = n_to = 0
    for name, sql in sorted(oracle.items()):
        r = run_one(name, sql, BUDGET1)
        if r["status"] == "TIMEOUT":
            print(f"[sf1-gate] {name} timed out at {BUDGET1}s — "
                  f"retrying at {BUDGET2}s with the written join order",
                  flush=True)
            r = run_one(name, sql, BUDGET2, trust_written_order=True)
            if r["status"] != "TIMEOUT":
                r["retry"] = "join_order_disabled"
        if r["status"] == "TIMEOUT":
            r["status"] = "ORACLE_TIMEOUT"
            if name in BOUNDS:
                r["enumeration_bound"] = BOUNDS[name]
            n_to += 1
        elif r["status"] == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        results[name] = r
        print(f"[sf1-gate] {name}: {r['status']} ({r['wall_s']}s)",
              flush=True)
    art = {
        "sf": SF_DIR,
        "n_queries": len(results),
        "n_pass": n_pass,
        "n_fail": n_fail,
        "n_oracle_timeout": n_to,
        "protocol": (
            f"graft.Verify ran ALL queries at sf1; DuckDB oracle re-run "
            f"per query: {BUDGET1:.0f}s budget, timeouts retried at "
            f"{BUDGET2:.0f}s. ORACLE_TIMEOUT rows carry the oracle's "
            "intrinsic enumeration bound where known."),
        "queries": results,
    }
    json.dump(art, open(ARTIFACT, "w"), indent=1)
    print(f"== sf1 gate: {n_pass} pass, {n_fail} fail, "
          f"{n_to} oracle-timeout -> {ARTIFACT}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
