"""Noise-gated launcher for the scaling window.

The sandbox shares a host with co-tenants whose load comes in waves
(observed memory-bandwidth scaling ceiling swinging 0.41 ↔ 0.91 within
an hour). Recording an N→4N window during a bad wave measures the
neighbours, not the engine — so this watcher probes the machine's own
1→4-process STREAM-triad scaling every few minutes and only launches
`bench_scaling.py` once the box is quiet:

  * bw ceiling ≥ --min-ceiling (default 0.8): the DRAM bus scales,
  * aggregate 4-proc bandwidth ≥ --min-gbs (default 15): co-tenants
    are not eating the absolute budget either,
  * no local pytest/Spark JVM is running (our own work pollutes too).

On launch the window runs synchronously (bench_scaling itself appends
to BENCH/windows.jsonl and rewrites BENCH/BASELINE.md); the watcher
exits after --max-windows successful windows or --max-hours.

Usage: nohup python scripts/scaling_watch.py > /tmp/scaling_watch.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import mem_calibration  # noqa: E402


def busy_with_own_work() -> bool:
    out = subprocess.run(
        ["ps", "ax", "-o", "args="], capture_output=True, text=True
    ).stdout
    for line in out.splitlines():
        # shell wrappers quote entire scripts into their argv — a bash -c
        # whose TEXT mentions bench.py is not a running bench (matching it
        # self-deadlocked the harvester against its own launcher once)
        stripped = line.lstrip()
        if stripped.startswith(("bash", "/bin/bash", "sh ", "/bin/sh",
                                "-bash", "nohup")):
            continue
        if "pytest" in line or "profile_crawl" in line:
            return True
        if "bench.py" in line or "microbench" in line:
            return True
        # any locally-launched Spark driver JVM (pytest sessions, bench
        # runs, ad-hoc shells) — not just ivy resolution
        if "java" in line and ("pyspark-shell" in line
                               or "org.apache.spark" in line
                               or "ivy" in line.lower()):
            return True
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-ceiling", type=float, default=0.8)
    ap.add_argument("--min-gbs", type=float, default=15.0)
    ap.add_argument("--probe-minutes", type=float, default=4.0)
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plan", default="1:12000",
                    help="comma list of n:pages windows to record in "
                    "order, e.g. '1:12000,4:24000' = one local[1]→"
                    "local[4] window on the 12k corpus, then one "
                    "local[4]→local[16] window on the 24k corpus")
    args = ap.parse_args()

    plan = [(int(n), int(p)) for n, p in
            (entry.split(":") for entry in args.plan.split(","))]

    t_end = time.time() + args.max_hours * 3600
    recorded = 0
    streak = 0  # consecutive quiet probes; waves are minutes-long, so
    # require two before committing ~35 min of measurement to the window
    while time.time() < t_end and recorded < len(plan):
        n, pages = plan[recorded]
        if busy_with_own_work():
            print(f"{time.strftime('%H:%M:%S')} own work running — skip probe",
                  flush=True)
            streak = 0
            time.sleep(60 * args.probe_minutes)
            continue
        # quietness is ALWAYS probed at 1→4: it is the host-noise signal
        # (co-tenant bandwidth steal), not the pair's own ceiling — 4→16
        # process scaling saturates the single DRAM bus even on an idle
        # box, so gating an n=4 window on mem_calibration(4) would never
        # fire. bench_scaling still reports the pair's own calibration.
        mem = mem_calibration(1)
        quiet = (mem["ceiling"] >= args.min_ceiling
                 and mem["n4_gbs"] >= args.min_gbs)
        streak = streak + 1 if quiet else 0
        print(f"{time.strftime('%H:%M:%S')} probe(n={n}) {json.dumps(mem)} "
              f"quiet={quiet} streak={streak}", flush=True)
        if streak < 2:
            time.sleep(60 * (1.0 if quiet else args.probe_minutes))
            continue
        print(f"QUIET×2 — launching scaling window n={n} pages={pages}",
              flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "bench_scaling.py"),
             "--hosts", str(args.hosts), "--pages", str(pages),
             "--n", str(n), "--reps", str(args.reps),
             "--require-quiet", str(args.min_ceiling * 0.9)],
            cwd=REPO)
        streak = 0
        if r.returncode == 0:
            recorded += 1
            print(f"window recorded ({recorded}/{len(plan)})", flush=True)
        elif r.returncode == 3:
            print("wave returned before the window started — unrecorded, "
                  "re-arming", flush=True)
        else:
            print(f"bench_scaling failed rc={r.returncode}", flush=True)
            time.sleep(60 * args.probe_minutes)
    print("watcher done", flush=True)


if __name__ == "__main__":
    main()
