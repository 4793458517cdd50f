#!/usr/bin/env python3
"""Regenerate BENCH_SF1_PROBE.json mechanically — the data-dominated
sf1.0 probe (10x gate data) with per-query status, budgeted DuckDB
disk, and a per-query timeout (r17 verdict ask #4: the r17 probe was a
hand-driven narrative; three mirrors filled ~70 GB of spill and died,
eating the window).

Dev-only tooling, like check.py/time_oracle.py — the engine never
reads this code.

One command:
    python3 scripts/sf1_probe.py [--out BENCH_SF1_PROBE.json]
        [--timeout 600] [--temp-gb 25] [--sf1 /root/repo/tmp/sf1.0]

Steps:
  1. Build the sf1.0 replica fixture via make_sf1.py if absent
     (structure-preserving 10x of sf0.1 — per-replica token bijection,
     circular dim rotation; see make_sf1.py).
  2. Run the Spark side: Bench with SPARK_GRAFT_BENCH_ONLY over the
     data-dominated query set, min-of-2, pairing off.
  3. Dump oracle SQL via a minimal Verify run at sf0.001 (fast; Verify
     writes the FULL oracle_sql.json regardless of the query subset).
  4. Run each mirror in its OWN subprocess with
     SET max_temp_directory_size (budgeted disk — a spill-happy mirror
     dies at the budget, not at a full container) and a wall timeout.
     Per-query status lands in the artifact: ok / died / timeout.

The mirror-infeasible class (status died/timeout) is a FINDING, not a
failure: at 10x gate data the single-process engine cannot complete
those replays on this hardware while Spark finishes them in seconds —
recorded in SURVEY §6.
"""
import argparse
import json
import os
import re
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# The data-dominated probe set (mirrors > ~0.3 s at sf0.1, the r17
# selection): every weak-band member with an sf1.0-meaningful shape.
QUERIES = [
    "ann_pq_incremental", "ann_pq_residual", "cl4_dbscan_lsh",
    "dc9_fuzzy_decontam", "dd15_incremental_neardup", "dd16_containment",
    "dd18_minhash_calibration", "dd2_minhash_lsh", "dd3_ngram_jaccard",
    "dd4_simhash", "dd6_winnow_fragments", "emb5_pq_residual_recall",
    "emb8_ivfsq_recall", "mm_phash_incremental", "mm_phash_pairs",
    "pipe1_training_pipeline", "pipe2_screen_and_phase",
    "pipe3_curation_report", "pk3_pack_whole_docs", "txt_filter_stack",
    "txt_langid",
]

MIRROR_RUNNER = r"""
import sys, json, time
import duckdb
sf, sql_path, temp_dir, temp_gb = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sql = open(sql_path).read()
con = duckdb.connect()
con.execute("SET temp_directory='%s'" % temp_dir)
con.execute("SET max_temp_directory_size='%sGB'" % temp_gb)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute("CREATE VIEW %s AS SELECT * FROM read_parquet('%s/%s.parquet')"
                % (t, sf, t))
t0 = time.time()
try:
    import pandas  # noqa: F401
    con.execute(sql).df()
    print(json.dumps({"status": "ok", "sec": round(time.time() - t0, 3)}))
except Exception as e:
    print(json.dumps({"status": "died", "sec": round(time.time() - t0, 3),
                      "error": str(e)[:300]}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_SF1_PROBE.json"))
    ap.add_argument("--timeout", type=int, default=600,
                    help="per-mirror wall timeout, seconds")
    ap.add_argument("--temp-gb", type=int, default=25,
                    help="per-mirror DuckDB spill budget, GB")
    ap.add_argument("--sf1", default=os.path.join(REPO, "tmp", "sf1.0"))
    ap.add_argument("--runs", type=int, default=2, help="Spark min-of runs")
    args = ap.parse_args()

    # 1. fixture
    if not os.path.exists(os.path.join(args.sf1, "documents.parquet")):
        print("[sf1] building the sf1.0 replica fixture ...", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "make_sf1.py"),
                        args.sf1], check=True)

    # 2. Spark side (sequential with everything else — never concurrent
    # with the DuckDB loop, per the BENCH_NOTES contention rule)
    print("[sf1] Spark side: Bench over %d queries, min-of-%d ..."
          % (len(QUERIES), args.runs), flush=True)
    # stdout carries only the COMPACT headline (12 slowest queries);
    # the full per-query map goes to the artifact path — point it at a
    # temp file so the committed bench_out.json is never touched
    bench_fd, bench_out = tempfile.mkstemp(prefix="sf1-bench", suffix=".json")
    os.close(bench_fd)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=args.sf1,
               SPARK_GRAFT_BENCH_ONLY=",".join(QUERIES),
               SPARK_GRAFT_BENCH_RUNS=str(args.runs),
               SPARK_GRAFT_BENCH_PAIR="0",
               SPARK_GRAFT_BENCH_OUT=bench_out)
    r = subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                       cwd=REPO, env=env, capture_output=True, text=True)
    try:
        m = json.load(open(bench_out))
    except Exception:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        sys.exit("Bench produced no artifact at %s" % bench_out)
    finally:
        try:
            os.unlink(bench_out)
        except OSError:
            pass
    spark_q = m["queries"]
    missing = [q for q in QUERIES if q not in spark_q]
    if missing:
        sys.exit("Bench artifact lacks queries: %s" % missing)

    # 3. oracle SQL dump (fast Verify at sf0.001, subset of one query)
    with tempfile.TemporaryDirectory(prefix="sf1-oracle") as od:
        subprocess.run(
            ["sbt", "-batch",
             "runMain graft.Verify /root/testdata/sf0.001 %s q1_agg" % od],
            cwd=REPO, check=True, capture_output=True, text=True)
        oracle = json.load(open(os.path.join(od, "oracle_sql.json")))

    # 4. mirrors, one subprocess each, budgeted + timed out
    statuses, oracle_t = {}, {}
    for name in QUERIES:
        if name not in oracle:
            statuses[name] = "no_mirror"
            continue
        with tempfile.TemporaryDirectory(prefix="sf1-duck") as td:
            sqlp = os.path.join(td, "q.sql")
            with open(sqlp, "w") as f:
                f.write(oracle[name])
            t0 = time.time()
            try:
                p = subprocess.run(
                    [sys.executable, "-c", MIRROR_RUNNER, args.sf1, sqlp,
                     td, str(args.temp_gb)],
                    capture_output=True, text=True, timeout=args.timeout)
                res = json.loads(p.stdout.strip().splitlines()[-1])
                statuses[name] = res["status"]
                if res["status"] == "ok":
                    oracle_t[name] = res["sec"]
                else:
                    oracle_t[name] = res["sec"]
                    print("  X %s died after %.0fs: %s"
                          % (name, res["sec"], res.get("error", "")[:120]),
                          flush=True)
            except subprocess.TimeoutExpired:
                statuses[name] = "timeout"
                oracle_t[name] = round(time.time() - t0, 3)
                print("  X %s timeout at %ds" % (name, args.timeout),
                      flush=True)
            except Exception as e:
                statuses[name] = "died"
                print("  X %s runner error: %s" % (name, e), flush=True)
        print("  %s: spark=%.2fs oracle=%s (%s)"
              % (name, spark_q.get(name, float("nan")),
                 oracle_t.get(name, "-"), statuses[name]), flush=True)

    ok = [q for q in QUERIES if statuses.get(q) == "ok" and q in spark_q]
    spark_total = round(sum(spark_q.values()), 3)
    oracle_ok_total = round(sum(oracle_t[q] for q in ok), 3)
    spark_ok_total = round(sum(spark_q[q] for q in ok), 3)
    out = {
        "metric": "total", "value": spark_total, "unit": "sec",
        "queries": {q: spark_q[q] for q in sorted(spark_q)},
        "oracle": {q: oracle_t[q] for q in sorted(oracle_t)
                   if statuses.get(q) == "ok"},
        "oracle_status": {q: statuses[q] for q in sorted(statuses)},
        "oracle_total": oracle_ok_total,
        "oracle_paired_spark_total": spark_ok_total,
        "paired_ratio": round(spark_ok_total / oracle_ok_total, 4)
        if oracle_ok_total else None,
        "mirror_infeasible": sorted(q for q, s in statuses.items()
                                    if s in ("died", "timeout")),
        "timeout_sec": args.timeout, "temp_budget_gb": args.temp_gb,
        "n_runs": args.runs, "sf": args.sf1, "oracle_engine": "duckdb",
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print("[sf1] paired %s over %d ok mirrors; infeasible: %s -> %s"
          % (out["paired_ratio"], len(ok), out["mirror_infeasible"],
             args.out), flush=True)


if __name__ == "__main__":
    main()
