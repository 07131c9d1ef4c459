"""Isolated window-dedup scaling probe with tunables.

python scripts/micro_window.py --cpus 32 --sp 32 [--gc parallel] [--nocompress]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sp", type=int, default=0, help="shuffle partitions (0=cpus)")
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--gc", default="")
    ap.add_argument("--nocompress", action="store_true")
    ap.add_argument("--noaqe", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")
    from krawler_spark.session import get_spark
    from pyspark.sql import functions as F, Window

    extra = {}
    jvm_flags = []
    if args.gc == "parallel":
        jvm_flags.append("-XX:+UseParallelGC")
    if jvm_flags:
        extra["spark.driver.extraJavaOptions"] = " ".join(jvm_flags)
    if args.nocompress:
        extra["spark.shuffle.compress"] = "false"
        extra["spark.shuffle.spill.compress"] = "false"
    if args.noaqe:
        extra["spark.sql.adaptive.enabled"] = "false"

    sp = args.sp or args.cpus
    spark = get_spark("microw", cores=args.cpus, shuffle_partitions=sp,
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    src = f"/dev/shm/micro_src_{args.rows}"
    if not os.path.isdir(src):
        raise SystemExit("run scripts/microbench.py once first to build src")
    df = spark.read.parquet(src)
    df.count()  # warm: JVM, page cache, codegen

    w = Window.partitionBy("url").orderBy("priority", "enq_round", "seq")
    times = []
    for _ in range(args.reps):
        t0 = time.time()
        df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).count()
        times.append(round(time.time() - t0, 2))
    print(json.dumps({"cpus": args.cpus, "sp": sp, "gc": args.gc,
                      "nocompress": args.nocompress, "noaqe": args.noaqe,
                      "window_dedup": times}))


if __name__ == "__main__":
    main()
