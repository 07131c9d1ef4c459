"""Cluster job entry point: run the crawl engine under ``spark-submit``.

The north rule's deployment shape (BASELINE.json): the engine "runs via
spark-submit --py-files on multi-executor clusters". This script is the
job file for that invocation — it takes the SparkSession the cluster
hands it (master/executors/memory all come from spark-submit or the
cluster default conf, never hard-coded here), imports ``krawler_spark``
from the ``--py-files`` archive built by ``scripts/package.py``, and
drives the BSP round loop:

    python scripts/package.py
    spark-submit --py-files dist/krawler_spark.zip \\
        scripts/submit_crawl.py \\
        --corpus /data/commoncrawl.parquet \\
        --warehouse hdfs:///krawl/wh \\
        --seeds seeds.txt --max-depth 3 --total-pages 1000000

With ``--store iceberg --catalog my_cat`` the frontier/history/delta
state lives in Iceberg tables (resumable snapshots) instead of the
parquet SnapshotStore; ``--resume`` continues a killed crawl from its
last committed round with no re-fetches (plans/iceberg_store.py).

Local smoke test (same file, no cluster):
    spark-submit --master 'local[4]' --py-files dist/krawler_spark.zip \\
        scripts/submit_crawl.py --corpus ... --warehouse /tmp/wh --seeds ...
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def parse_args(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus", required=True,
                    help="parquet path (default) OR, with --corpus-table, a "
                    "catalog table of the page corpus "
                    "(url, warc_ts, html, text, lang[, status, clen])")
    ap.add_argument("--corpus-table", action="store_true",
                    help="interpret --corpus as a catalog table name instead "
                    "of a parquet path (explicit — a dotted relative path "
                    "like pages.parquet must never be guessed into a table)")
    ap.add_argument("--warehouse", required=True,
                    help="crawl-state location: a path (parquet store) or an "
                    "Iceberg namespace when --store iceberg")
    ap.add_argument("--seeds", required=True,
                    help="file of seed URLs (one per line) or a comma list")
    ap.add_argument("--store", choices=["parquet", "iceberg"], default="parquet")
    ap.add_argument("--catalog", default="spark_catalog",
                    help="Iceberg catalog name (with --store iceberg)")
    ap.add_argument("--max-depth", type=int, default=-1)
    ap.add_argument("--total-pages", type=int, default=-1)
    ap.add_argument("--max-rounds", type=int, default=1000)
    ap.add_argument("--politeness-delay-ms", type=int, default=200)
    ap.add_argument("--user-agent", default="krawler-spark")
    ap.add_argument("--no-robots", action="store_true")
    ap.add_argument("--should-visit", default="true",
                    help="SQL boolean over the candidate row (shouldVisit)")
    ap.add_argument("--should-check", default="false")
    ap.add_argument("--priority-expr", default="1")
    ap.add_argument("--emit-links", action="store_true")
    ap.add_argument("--no-repeat-events", action="store_true",
                    help="skip repeat_visit event rows (steady-state scale run)")
    ap.add_argument("--resume", action="store_true")
    return ap.parse_args(argv)


def load_seeds(spec: str) -> list[str]:
    try:
        with open(spec, encoding="utf-8") as f:
            return [ln.strip() for ln in f if ln.strip()]
    except OSError:
        return [s.strip() for s in spec.split(",") if s.strip()]


def main(argv=None) -> int:
    args = parse_args(argv)
    # the cluster (spark-submit flags / spark-defaults.conf) decides
    # master, executor count and memory; we only pin the engine's
    # semantic confs that must not vary per deployment
    spark = (
        SparkSession.builder.appName("krawler-spark-crawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from krawler_spark.config import CrawlConfig
    from krawler_spark.engine import CrawlEngine

    pages = (
        spark.table(args.corpus) if args.corpus_table
        else spark.read.parquet(args.corpus)
    )

    cfg = CrawlConfig(
        max_depth=args.max_depth,
        total_pages=args.total_pages,
        max_rounds=args.max_rounds,
        politeness_delay_ms=args.politeness_delay_ms,
        user_agent=args.user_agent,
        respect_robots_txt=not args.no_robots,
        emit_links=args.emit_links,
        record_repeat_events=not args.no_repeat_events,
    )

    store = None
    warehouse = args.warehouse
    if args.store == "iceberg":
        from krawler_spark.plans.iceberg_store import IcebergStore

        store = IcebergStore(spark, args.catalog, namespace=args.warehouse)
        warehouse = None

    eng = CrawlEngine(
        spark, pages, config=cfg, store=store, warehouse=warehouse,
        should_visit=args.should_visit, should_check=args.should_check,
        priority_expr=args.priority_expr,
    )
    out = eng.run(seeds=None if args.resume else load_seeds(args.seeds),
                  resume=args.resume)
    visited = eng.visited()
    n_visited = visited.count() if visited is not None else 0
    print(json.dumps({
        "rounds": out["rounds"],
        "visited": n_visited,
        "state": {k: v for k, v in out["state"].items()
                  if isinstance(v, (int, float, str, bool))},
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
