"""Run ONE scaling leg (cpus x corpus) with the harvester's concurrent
noise-trace sampler and append it to the reps file — used to top up a
window's thin leg when noise waves ate the scheduled reps (the
assembler takes the min over ALL matching reps, so extra legs can only
sharpen the estimate).

Usage: python scripts/leg_once.py --cpus 4 --pages 12000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from scaling_harvest import REPS_PATH, run_leg  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--pages", type=int, required=True)
    ap.add_argument("--hosts", type=int, default=64)
    ap.add_argument("--probe-sec", type=float, default=60.0)
    args = ap.parse_args()

    leg = run_leg(args.cpus, args.hosts, args.pages, args.probe_sec)
    with open(REPS_PATH, "a") as f:
        f.write(json.dumps(leg) + "\n")
    print(json.dumps({k: v for k, v in leg.items() if k != "trace"}))


if __name__ == "__main__":
    main()
