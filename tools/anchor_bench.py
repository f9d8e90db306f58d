#!/usr/bin/env python3
"""Run one sbt-launched Bench at sf0.1 and append the result as a run
entry to BENCH_ANCHOR_r18.json, recording load brackets (the r13
quiet-window anchor discipline: separate JVMs, best-measured-loop
semantics, load before/after so a contended window is inspectable).

Usage: python3 tools/anchor_bench.py [note]
"""
import json
import os
import subprocess
import sys

ANCHOR = "BENCH_ANCHOR_r18.json"
TOP_N = 40


def loadavg():
    return [round(x, 2) for x in os.getloadavg()]


def main():
    note = sys.argv[1] if len(sys.argv) > 1 else ""
    before = loadavg()
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, check=True, capture_output=True, text=True, timeout=1800)
    after = loadavg()
    with open("bench_full.json") as f:
        full = json.load(f)
    top = dict(sorted(full["queries"].items(),
                      key=lambda kv: -kv[1])[:TOP_N])
    entry = {
        "load_before": before,
        "load_after": after,
        "headline_best_loop_sec": full["value"],
        "loop_totals": full["loop_totals"],
        "min_total": full["min_total"],
        "n_queries": full["n_queries"],
        "note": note,
        "queries": {k: round(v, 3) for k, v in top.items()},
    }
    if "failed" in full:
        entry["failed"] = full["failed"]
    if os.path.exists(ANCHOR):
        with open(ANCHOR) as f:
            doc = json.load(f)
    else:
        doc = {"round": 14, "sf": "/root/testdata/sf0.1",
               "bench_schema": 4, "host_note": "", "schema4_runs": []}
    entry["run"] = len(doc["schema4_runs"]) + 1
    doc["schema4_runs"].append(entry)
    with open(ANCHOR, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: entry[k] for k in
                      ("run", "headline_best_loop_sec", "loop_totals",
                       "min_total", "n_queries", "load_before",
                       "load_after")}))


if __name__ == "__main__":
    main()
