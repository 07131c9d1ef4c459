"""Round-6 measurement harness (guide §1): per-query noop-sink timing
plus ``explain("formatted")`` capture. bench.py is FROZEN for the
driver's measurement; this file holds the extra instrumentation the
optimization round needs (noop isolation, plan dumps, repeat control).

Usage:
  python bench_extra.py [--sf SF_DIR] [--reps N] [--plans-out DIR] \
                        [--tag before|after] [query ...]

Prints one JSON line: {"sf":..., "cpus":..., "queries": {name: sec}}.
Timing = min over reps of a noop-sink write (computes every column of
every row, no sink cost, visible in the SQL tab).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--plans-out", default=None,
                    help="dir to write <query>_<tag>.txt explain dumps")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from krawler_spark.session import get_spark

    spark = get_spark("krawler-bench-extra", cores=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    names = args.queries or list(qs)
    # session warmup, same machinery classes as bench.py
    from pyspark.sql import functions as F

    spark.range(1 << 18).select(F.sum("id")).collect()
    docs = spark.read.parquet(os.path.join(args.sf, "documents.parquet"))
    docs.limit(64).select(F.length("text")).count()
    docs.limit(64).mapInPandas(
        lambda it: (pdf.iloc[:1][["doc_id"]] for pdf in it),
        schema="doc_id long").count()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        df = fn(spark, args.sf)
        if args.plans_out:
            os.makedirs(args.plans_out, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans_out, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(plan)
        best = None
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        if best is not None:
            timings[name] = round(best, 3)
            print(f"# {name}: {timings[name]}", file=sys.stderr)

    print(json.dumps({"sf": args.sf, "cpus": args.cpus,
                      "reps": args.reps, "estimator": "min-of-reps, noop sink",
                      "queries": timings}))


if __name__ == "__main__":
    main()
