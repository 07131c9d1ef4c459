"""Noise-ROBUST scaling-window harvester (successor to scaling_watch).

scaling_watch.py gates on the host being quiet for two consecutive
probes and then commits ~35 minutes of measurement to one contiguous
window. That worked in round 4 (one long quiet stretch existed); in
round 5 the co-tenant noise waves shortened to ~1-2 minutes every few
minutes (BENCH/noise_watch_r5.log: eight streak=1 probes in 2.6 h,
never streak=2), so a contiguous quiet window may simply never come.

This harvester inverts the strategy: run the legs ANYWAY, many times,
interleaved (lo, hi, lo, hi, ...), and record a concurrent noise trace
for every rep — a 4-process STREAM-triad aggregate-bandwidth probe
every --probe-sec seconds for the duration of the leg, plus an idle
(pre-leg) 1-proc/4-proc calibration pair. Co-tenant noise only ever
SLOWS a run down (same argument bench.py's min-of-reps makes), so the
per-leg MINIMUM over many reps converges on the quiet-host time, and
the chosen rep's own trace shows whether it actually ran quiet.

Every rep is appended raw to BENCH/reps_r5.jsonl; window assembly
(per-leg min + BASELINE.md regeneration) is a separate judgment step:
scripts/scaling_assemble.py.

Probe self-interference: the probe itself (4 procs x ~2-4 s every
--probe-sec) steals a sliver of bandwidth from the leg — identical on
both legs, so the ratio is unaffected; and the in-leg probe readings
are depressed by the leg's OWN bandwidth use, which is why 'clean'
thresholds are applied at assembly time per core-count, not here.

Usage:
  nohup python scripts/scaling_harvest.py --window 1:12000 --window 4:24000 \
      --max-hours 4.5 > /tmp/scaling_harvest_r5.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import _triad, mem_calibration, run_bench  # noqa: E402
from scaling_watch import busy_with_own_work  # noqa: E402

REPS_PATH = os.environ.get(
    "KS_REPS_PATH", os.path.join(REPO, "BENCH", "reps_r5.jsonl"))


def probe_4p(mb: int = 256, iters: int = 6) -> float:
    """One 4-process aggregate-bandwidth reading (GB/s)."""
    elems = mb * 1024 * 1024 // 8
    with multiprocessing.Pool(4) as p:
        per = p.map(_triad, [(elems, iters)] * 4)
    return round(sum(per) / 1e9, 1)


class TraceSampler(threading.Thread):
    """Probe aggregate 4-proc bandwidth every `interval` s while a leg runs."""

    def __init__(self, interval: float):
        super().__init__(daemon=True)
        self.interval = interval
        self.samples: list[dict] = []
        self._halt = threading.Event()
        self._t0 = time.time()

    def run(self) -> None:
        while not self._halt.wait(self.interval):
            t = round(time.time() - self._t0, 0)
            try:
                gbs = probe_4p()
            except Exception:
                continue
            self.samples.append({"t": t, "n4_gbs": gbs})

    def stop(self) -> list[dict]:
        self._halt.set()
        self.join(timeout=30)
        return self.samples


def run_leg(cpus: int, hosts: int, pages: int, probe_sec: float) -> dict:
    idle = mem_calibration(1)  # pre-leg host-noise snapshot (1->4 pair)
    sampler = TraceSampler(probe_sec)
    sampler.start()
    t0 = time.time()
    try:
        r = run_bench(cpus, hosts, pages)
    finally:
        trace = sampler.stop()
    gbs = sorted(s["n4_gbs"] for s in trace) or [0.0]
    return {
        "when": time.strftime("%Y-%m-%d %H:%M:%S UTC", time.gmtime()),
        "cpus": cpus,
        "hosts": hosts,
        "pages": pages,
        # JVM provenance: heap size and GC are part of a rep's identity
        # (see bench_scaling.py's heap-size caveat)
        "jvm": {
            "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "40g"),
            "gc": os.environ.get("KS_GC", "parallel") or "parallel",
        },
        "crawl": r["crawl"],
        "wall": round(time.time() - t0, 1),
        "idle_probe": idle,
        "trace": trace,
        "trace_min_gbs": gbs[0],
        "trace_med_gbs": gbs[len(gbs) // 2],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", action="append", required=True,
                    help="n:pages, e.g. 1:12000 (legs run at n and 4n)")
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--reps", type=int, default=4,
                    help="max rep PAIRS per window")
    ap.add_argument("--probe-sec", type=float, default=60.0)
    ap.add_argument("--max-hours", type=float, default=4.5)
    args = ap.parse_args()

    windows = [(int(n), int(p)) for n, p in
               (w.split(":") for w in args.window)]
    t_end = time.time() + args.max_hours * 3600
    os.makedirs(os.path.dirname(REPS_PATH), exist_ok=True)

    for n, pages in windows:
        counts_seen: dict[int, set] = {}
        for rep in range(args.reps):
            for cpus in (n, n * 4):
                while busy_with_own_work():
                    print(f"{time.strftime('%H:%M:%S')} own work running — "
                          "waiting", flush=True)
                    time.sleep(120)
                if time.time() > t_end:
                    print("time budget exhausted", flush=True)
                    return
                try:
                    leg = run_leg(cpus, args.hosts, pages, args.probe_sec)
                except Exception as e:
                    print(f"leg cpus={cpus} pages={pages} FAILED: {e}",
                          flush=True)
                    continue
                key = (leg["crawl"]["fetched"], leg["crawl"]["deduped"])
                counts_seen.setdefault(cpus, set()).add(key)
                if len(counts_seen[cpus]) > 1:
                    raise RuntimeError(
                        f"reps disagree on counts at cpus={cpus}: "
                        f"{counts_seen[cpus]}")
                with open(REPS_PATH, "a") as f:
                    f.write(json.dumps(leg) + "\n")
                print(f"rep{rep} n={n} cpus={cpus} pages={pages}: "
                      f"{leg['crawl']['sec']}s  trace med/min "
                      f"{leg['trace_med_gbs']}/{leg['trace_min_gbs']} GB/s  "
                      f"idle-ceiling {leg['idle_probe']['ceiling']}",
                      flush=True)
    print("harvest done", flush=True)


if __name__ == "__main__":
    main()
