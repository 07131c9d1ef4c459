"""Primitive-scaling microbench: measures how the engine's core plan
shapes (url-window dedup, anti-join, pandas map) scale with local[]
cores on this machine. Diagnosis tool for the north-rule efficiency
target. Usage: python scripts/microbench.py --cpus 8
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
    ap.add_argument("--rows", type=int, default=10_000_000)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_LOCAL_DIRS", "/dev/shm/sparktmp")
    from krawler_spark.session import get_spark
    from pyspark.sql import functions as F, Window

    spark = get_spark("micro", cores=args.cpus, shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    src = f"/dev/shm/micro_src_{args.rows}"
    if not os.path.isdir(src):
        (
            spark.range(0, args.rows, 1, 64)
            .select(
                F.concat(F.lit("http://www.site-"), (F.col("id") % 64).cast("string"),
                         F.lit(".com/p/"), (F.col("id") % 3_000_000).cast("string"),
                         F.lit(".html")).alias("url"),
                F.concat(F.lit("www.site-"), (F.col("id") % 64).cast("string"),
                         F.lit(".com")).alias("host"),
                (F.col("id") % 3).cast("int").alias("priority"),
                (F.col("id") % 7).cast("int").alias("enq_round"),
                F.col("id").alias("seq"),
            )
            .write.mode("overwrite").parquet(src)
        )
    df = spark.read.parquet(src)

    t = {}

    t0 = time.time()
    df.count()
    t["scan"] = round(time.time() - t0, 2)

    w = Window.partitionBy("url").orderBy("priority", "enq_round", "seq")
    t0 = time.time()
    df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).count()
    t["window_dedup"] = round(time.time() - t0, 2)

    seen = df.filter(F.col("seq") % 10 == 0).select("url")
    t0 = time.time()
    df.join(seen, "url", "left_anti").count()
    t["anti_join"] = round(time.time() - t0, 2)

    t0 = time.time()
    df.groupBy("host").agg(F.count(F.lit(1))).count()
    t["groupby_host"] = round(time.time() - t0, 2)

    def _py(batches):
        import hashlib
        import pandas as pd
        for pdf in batches:
            # ~ the per-row python cost of a light harvest
            out = pdf["url"].map(lambda u: hashlib.md5(u.encode()).hexdigest())
            yield pd.DataFrame({"h": out})

    t0 = time.time()
    df.limit(2_000_000).repartition(args.cpus * 2).mapInPandas(_py, "h string").count()
    t["pandas_map_2m"] = round(time.time() - t0, 2)

    t0 = time.time()
    df.write.mode("overwrite").parquet(f"/dev/shm/micro_out_{args.cpus}")
    t["parquet_write"] = round(time.time() - t0, 2)

    print(json.dumps({"cpus": args.cpus, "rows": args.rows, "timings": t}))


if __name__ == "__main__":
    main()
