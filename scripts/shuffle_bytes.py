"""Shuffle-byte ledger from a Spark event log.

Companion to busy_fraction.py for the scale argument in docs/SCALE.md:
the bucketed-corpus harvest path (`CrawlConfig.corpus_bucketed`) skips
the pre-extraction payload respread, which on a 10^10-URL frontier is
the dominant byte mover per round. This sums what actually crossed the
shuffle per run so the A/B is a measured number, not a claim.

Usage:
    KS_EVENTLOG_DIR=/tmp/ks_ev_b KS_BENCH_CORPUS_BUCKETED=1 python bench.py
    KS_EVENTLOG_DIR=/tmp/ks_ev_r KS_BENCH_CORPUS_BUCKETED=0 python bench.py
    python scripts/shuffle_bytes.py --dir /tmp/ks_ev_b --dir /tmp/ks_ev_r

Reads the newest application log per --dir. Prints one JSON line per
log: shuffle bytes written / read (remote+local), records, spilled
bytes (memory/disk), and input/output bytes for context.
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def _open_lines(p: str):
    if p.endswith(".zstd"):
        import io
        import subprocess
        proc = subprocess.Popen(["zstd", "-dc", p], stdout=subprocess.PIPE)
        yield from io.TextIOWrapper(proc.stdout)
        proc.wait()
        return
    with open(p) as f:
        yield from f


def _lines(path: str):
    """Yield event lines from a v1 single-file log or a v2 rolling dir."""
    if os.path.isdir(path):
        for p in sorted(glob.glob(os.path.join(path, "events_*"))):
            yield from _open_lines(p)
        return
    yield from _open_lines(path)


def analyze(path: str) -> dict:
    w_bytes = w_recs = 0
    r_bytes = r_recs = 0
    spill_mem = spill_disk = 0
    in_bytes = out_bytes = 0
    n_tasks = 0
    for line in _lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerTaskEnd":
            continue
        m = ev.get("Task Metrics") or {}
        n_tasks += 1
        sw = m.get("Shuffle Write Metrics") or {}
        w_bytes += sw.get("Shuffle Bytes Written", 0)
        w_recs += sw.get("Shuffle Records Written", 0)
        sr = m.get("Shuffle Read Metrics") or {}
        r_bytes += (sr.get("Remote Bytes Read", 0)
                    + sr.get("Local Bytes Read", 0))
        r_recs += sr.get("Total Records Read", 0)
        spill_mem += m.get("Memory Bytes Spilled", 0)
        spill_disk += m.get("Disk Bytes Spilled", 0)
        im = m.get("Input Metrics") or {}
        in_bytes += im.get("Bytes Read", 0)
        om = m.get("Output Metrics") or {}
        out_bytes += om.get("Bytes Written", 0)
    gib = 1024.0 ** 3
    return {
        "log": os.path.basename(path),
        "n_tasks": n_tasks,
        "shuffle_write_gib": round(w_bytes / gib, 3),
        "shuffle_write_records": w_recs,
        "shuffle_read_gib": round(r_bytes / gib, 3),
        "spill_mem_gib": round(spill_mem / gib, 3),
        "spill_disk_gib": round(spill_disk / gib, 3),
        "input_gib": round(in_bytes / gib, 3),
        "output_gib": round(out_bytes / gib, 3),
    }


def newest(d: str) -> str:
    logs = [p for p in glob.glob(os.path.join(d, "*"))
            if os.path.isfile(p) and not p.endswith(".inprogress")]
    logs = logs or glob.glob(os.path.join(d, "*"))
    if not logs:
        raise SystemExit(f"no event logs in {d}")
    return max(logs, key=os.path.getmtime)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", action="append", required=True)
    args = ap.parse_args()
    for d in args.dir:
        r = analyze(newest(d))
        r["dir"] = d
        print(json.dumps(r))


if __name__ == "__main__":
    main()
