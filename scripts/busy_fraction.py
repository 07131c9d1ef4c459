"""Executor-busy fraction from a Spark event log.

Answers the driver-serialization question for the scaling evidence
(BENCH/BASELINE.md): over the interval from the first task launch to
the last task finish, what fraction of the available core-seconds did
tasks actually run? A fraction near 1.0 at local[16] means the round
loop keeps 16 cores fed — the wall-clock gap between 4 and 16 cores is
then machine contention (single DRAM bus), not the driver serializing
between jobs.

Usage:
    KS_EVENTLOG_DIR=/tmp/ks_eventlog python scripts/leg_once.py ...
    python scripts/busy_fraction.py --dir /tmp/ks_eventlog --cores 16

Reads the newest application log in --dir. Prints one JSON line:
  span_sec        first-launch → last-finish wall interval
  task_run_sec    sum of per-task "Executor Run Time" (+ deser/ser)
  busy_frac       task_run_sec / (cores * span_sec)
  cpu_frac        sum of task "Executor CPU Time" over the same budget
  gc_frac         sum of task "JVM GC Time" over the same budget
  gaps_over_1s    count + total of inter-task idle gaps (all cores
                  simultaneously idle) longer than 1 s — the direct
                  signature of driver-side serialization between jobs
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def analyze(path: str, cores: int) -> dict:
    t_min = None
    t_max = None
    run_ms = 0.0
    cpu_ns = 0.0
    gc_ms = 0.0
    intervals: list[tuple[float, float]] = []
    n_tasks = 0
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") != "SparkListenerTaskEnd":
                continue
            info = ev.get("Task Info") or {}
            metrics = ev.get("Task Metrics") or {}
            launch = info.get("Launch Time")
            finish = info.get("Finish Time")
            if launch is None or finish is None:
                continue
            n_tasks += 1
            t_min = launch if t_min is None else min(t_min, launch)
            t_max = finish if t_max is None else max(t_max, finish)
            intervals.append((launch / 1e3, finish / 1e3))
            run_ms += metrics.get("Executor Run Time", 0)
            run_ms += metrics.get("Executor Deserialize Time", 0)
            run_ms += metrics.get("Result Serialization Time", 0)
            cpu_ns += metrics.get("Executor CPU Time", 0)
            gc_ms += metrics.get("JVM GC Time", 0)
    if not n_tasks:
        raise SystemExit(f"no TaskEnd events in {path}")
    span = (t_max - t_min) / 1e3
    budget = cores * span
    # all-cores-idle gaps: merge task intervals, look for holes > 1 s
    intervals.sort()
    gaps = []
    cur_end = intervals[0][1]
    for s, e in intervals[1:]:
        if s > cur_end + 1.0:
            gaps.append(round(s - cur_end, 2))
        cur_end = max(cur_end, e)
    return {
        "log": os.path.basename(path),
        "cores": cores,
        "n_tasks": n_tasks,
        "span_sec": round(span, 1),
        "task_run_sec": round(run_ms / 1e3, 1),
        "busy_frac": round(run_ms / 1e3 / budget, 3),
        "cpu_frac": round(cpu_ns / 1e9 / budget, 3),
        "gc_frac": round(gc_ms / 1e3 / budget, 3),
        "gaps_over_1s": {"count": len(gaps),
                         "total_sec": round(sum(gaps), 1)},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ks_eventlog")
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--log", help="specific log file (default: newest)")
    args = ap.parse_args()
    path = args.log
    if not path:
        logs = [p for p in glob.glob(os.path.join(args.dir, "*"))
                if not p.endswith(".inprogress")]
        if not logs:
            logs = glob.glob(os.path.join(args.dir, "*"))
        if not logs:
            raise SystemExit(f"no event logs in {args.dir}")
        path = max(logs, key=os.path.getmtime)
    print(json.dumps(analyze(path, args.cores)))


if __name__ == "__main__":
    main()
