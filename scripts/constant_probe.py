"""Measure the per-run Amdahl constant of the crawl round loop: run the
bench crawl at a TINY corpus (driver/plan cost dominates, data cost ~0)
and at the evidence corpus shape, printing wall times. The tiny-corpus
wall clock IS (approximately) the fixed per-run constant the scaling
gate pays at any scale.

Usage: python scripts/constant_probe.py [--cpus 2] [--hosts 8] [--pages 50] [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=2)
    ap.add_argument("--hosts", type=int, default=8)
    ap.add_argument("--pages", type=int, default=50)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")

    import bench
    from krawler_spark.session import get_spark

    spark = get_spark("constant-probe", cores=args.cpus,
                      shuffle_partitions=max(8, args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    for rep in range(args.reps):
        t0 = time.time()
        r = bench.crawl_bench(spark, args.hosts, args.pages)
        print(f"rep{rep}: crawl={r['sec']}s (incl corpus-table setup "
              f"{time.time() - t0 - r['sec']:.1f}s) fetched={r['fetched']} "
              f"rounds={r['rounds']}", flush=True)


if __name__ == "__main__":
    main()
