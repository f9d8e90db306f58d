#!/usr/bin/env python3
"""Run one sbt-launched Bench at sf0.1 and append the result as a run
entry to BENCH_ANCHOR_r19.json, recording load brackets (the r13
quiet-window anchor discipline: separate JVMs, best-measured-loop
semantics, load before/after so a contended window is inspectable) and
— new in r19 — host-state counters bracketing the run: /proc/stat
steal/iowait/idle deltas, cgroup CPU-throttling deltas, and PSI
(pressure-stall) totals for cpu/io/memory. The r18 slow band was
invisible to loadavg (run 7: slow at the round's quietest loadavg);
these counters let a slow reading name its mechanism (hypervisor steal,
IO stall, cgroup quota) instead of bracketing it.

New in r20 (r19 verdict #8): a PRE-LAUNCH steal sample. The r19
counters' one usable slow-band predictor is hypervisor steal% — tiny
(< 2.2%) but co-varying with the band in both directions — so the
anchor now samples /proc/stat steal over a short window BEFORE paying
a ~10-minute bench, records the skip/proceed decision in the entry,
and by default SKIPS (exit 0, nothing recorded to the runs list) when
the sample reads above the threshold. --force overrides; round
headlines are thereby taken in low-steal windows by construction.

Usage: python3 tools/anchor_bench.py [note] [--force]
"""
import json
import os
import subprocess
import sys
import time

ANCHOR = "BENCH_ANCHOR_r22.json"
TOP_N = 40
PRE_SAMPLE_SEC = 15
STEAL_SKIP_PCT = 1.0


def loadavg():
    return [round(x, 2) for x in os.getloadavg()]


def proc_stat_cpu():
    """Aggregate cpu jiffies from /proc/stat: (total, steal, iowait, idle)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        # user nice system idle iowait irq softirq steal guest guest_nice
        return {"total": sum(vals[:8]), "idle": vals[3],
                "iowait": vals[4], "steal": vals[7] if len(vals) > 7 else 0}
    except OSError:
        return None


def cgroup_cpu_stat():
    """cgroup v1 CPU throttling counters (v2 fallback on cpu.stat path)."""
    for path in ("/sys/fs/cgroup/cpu/cpu.stat", "/sys/fs/cgroup/cpu.stat"):
        try:
            with open(path) as f:
                kv = dict(line.split() for line in f if line.strip())
            return {k: int(v) for k, v in kv.items()
                    if k in ("nr_periods", "nr_throttled", "throttled_time",
                             "throttled_usec")}
        except OSError:
            continue
    return None


def psi_totals():
    """PSI stall totals (usec) — some/full per resource."""
    out = {}
    for res in ("cpu", "io", "memory"):
        try:
            with open(f"/proc/pressure/{res}") as f:
                for line in f:
                    kind = line.split()[0]
                    total = int(line.rsplit("total=", 1)[1])
                    out[f"{res}_{kind}"] = total
        except OSError:
            pass
    return out or None


def counter_deltas(before, after):
    if before is None or after is None:
        return None
    return {k: after[k] - before.get(k, 0) for k in after}


def cpu_mhz():
    """Mean and min advertised core clock — run-bracket samples catch a
    host whose frequency governor (invisible to jiffy accounting) is
    parked low, the one slow-band mechanism the r19 counters ruled
    everything else out of."""
    try:
        with open("/proc/cpuinfo") as f:
            mhz = [float(line.split(":")[1]) for line in f
                   if line.startswith("cpu MHz")]
        if not mhz:
            return None
        return {"mean": round(sum(mhz) / len(mhz), 0), "min": round(min(mhz), 0)}
    except (OSError, ValueError):
        return None


def pre_launch_sample():
    """Short steal/busy sample before committing to a full bench run."""
    s0 = proc_stat_cpu()
    time.sleep(PRE_SAMPLE_SEC)
    s1 = proc_stat_cpu()
    d = counter_deltas(s0, s1)
    if not d or d["total"] <= 0:
        return {"window_sec": PRE_SAMPLE_SEC, "steal_pct": None}
    return {
        "window_sec": PRE_SAMPLE_SEC,
        "steal_pct": round(100.0 * d["steal"] / d["total"], 2),
        "busy_pct": round(100.0 * (d["total"] - d["idle"]) / d["total"], 1),
        "iowait_pct": round(100.0 * d["iowait"] / d["total"], 2),
    }


def main():
    force = "--force" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--force"]
    note = args[0] if args else ""
    pre = pre_launch_sample()
    steal = pre.get("steal_pct")
    if steal is not None and steal >= STEAL_SKIP_PCT and not force:
        pre["decision"] = "skip"
        print(json.dumps({"decision": "skip", "pre_launch": pre,
                          "reason": f"pre-launch steal {steal}% >= "
                                    f"{STEAL_SKIP_PCT}% (slow-band proxy); "
                                    "re-run later or pass --force"}))
        return
    pre["decision"] = "forced" if (
        steal is not None and steal >= STEAL_SKIP_PCT) else "proceed"
    before = loadavg()
    stat0, cg0, psi0, mhz0 = (proc_stat_cpu(), cgroup_cpu_stat(),
                              psi_totals(), cpu_mhz())
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.1")
    subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, check=True, capture_output=True, text=True, timeout=1800)
    after = loadavg()
    stat1, cg1, psi1, mhz1 = (proc_stat_cpu(), cgroup_cpu_stat(),
                              psi_totals(), cpu_mhz())
    with open("bench_full.json") as f:
        full = json.load(f)
    top = dict(sorted(full["queries"].items(),
                      key=lambda kv: -kv[1])[:TOP_N])
    stat_d = counter_deltas(stat0, stat1)
    if stat_d and stat_d["total"] > 0:
        # busy share of the whole host's cpu time over the run window —
        # the cross-VM contention loadavg cannot see directly
        stat_d["busy_pct"] = round(
            100.0 * (stat_d["total"] - stat_d["idle"]) / stat_d["total"], 1)
        stat_d["steal_pct"] = round(
            100.0 * stat_d["steal"] / stat_d["total"], 2)
        stat_d["iowait_pct"] = round(
            100.0 * stat_d["iowait"] / stat_d["total"], 2)
    entry = {
        "pre_launch": pre,
        "load_before": before,
        "load_after": after,
        "proc_stat_delta": stat_d,
        "cpu_mhz": {"before": mhz0, "after": mhz1},
        "cgroup_cpu_delta": counter_deltas(cg0, cg1),
        "psi_total_delta_usec": counter_deltas(psi0, psi1),
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
        doc = {"round": 22, "sf": "/root/testdata/sf0.1",
               "bench_schema": 4, "host_note": "", "schema4_runs": []}
    entry["run"] = len(doc["schema4_runs"]) + 1
    doc["schema4_runs"].append(entry)
    with open(ANCHOR, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: entry[k] for k in
                      ("run", "pre_launch", "headline_best_loop_sec",
                       "loop_totals",
                       "min_total", "n_queries", "load_before",
                       "load_after", "proc_stat_delta",
                       "cgroup_cpu_delta", "psi_total_delta_usec",
                       "cpu_mhz")}))


if __name__ == "__main__":
    main()
