"""SparkSession factory with the engine's standard tuning.

AQE (runtime re-planning + skew-join splitting) and Arrow transfers are
always on; shuffle partition count defaults to the core count so the
local harness mirrors a cluster's executor-count scaling knob.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _export_package_path() -> None:
    """Make the krawler_spark package importable in executor python
    workers (the local-mode analogue of ``spark-submit --py-files``).
    Must run before the JVM starts — workers inherit this env."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    current = os.environ.get("PYTHONPATH", "")
    if pkg_root not in current.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + current if current else "")
        )


def get_spark(
    app_name: str = "krawler-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    _export_package_path()
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    b = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        # Throughput GC: G1's concurrent cycles throttle 32-thread local
        # mode measurably (≈1.5× on the window-dedup microbench,
        # scripts/micro_window.py); ParallelGC matches the batch-job
        # profile. On a real cluster this is an executor JVM flag.
        # KS_GC overrides for A/B runs (event logs put GC at 6-22% of
        # core-time depending on parallelism — worth re-measuring on
        # the full crawl loop when the JVM or heap sizing changes).
        .config(
            "spark.driver.extraJavaOptions",
            {"g1": "-XX:+UseG1GC", "zgc": "-XX:+UseZGC -XX:+ZGenerational"}.get(
                os.environ.get("KS_GC", "").lower(), "-XX:+UseParallelGC"
            ),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Catalyst constraint propagation is O(n^2)-ish in plan width
        # and runs on every action; the crawl round's 14-branch union
        # DAG pays it repeatedly — measured ~1s/crawl of driver gap at
        # local[32] (warm crawl 14.7-14.9s -> 13.7-13.9s with it off,
        # counts identical; the engine's joins carry explicit
        # null-safe keys, so the inferred-constraint plans don't
        # change). KS_CONSTRAINT_PROP=1 restores the default.
        .config(
            "spark.sql.constraintPropagation.enabled",
            "true" if os.environ.get("KS_CONSTRAINT_PROP") == "1" else "false",
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # zstd over snappy (Iceberg's modern parquet default): the delta
        # write and corpus scan are bandwidth-bound — fewer bytes on the
        # bus trades cheap, core-scaling CPU for the one resource that
        # does NOT scale with executor count on a shared host
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    # Opt-in Spark event log (KS_EVENTLOG_DIR): scripts/busy_fraction.py
    # post-processes it into an executor-busy fraction — the direct
    # measurement that the driver does not serialize the round loop at
    # real task counts (scaling-evidence provenance, BENCH/BASELINE.md).
    evlog = os.environ.get("KS_EVENTLOG_DIR")
    if evlog:
        os.makedirs(evlog, exist_ok=True)
        b = (
            b.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", evlog)
            # plain single-file v1 logs: busy_fraction.py/shuffle_bytes.py
            # read them line-wise; this environment's defaults otherwise
            # produce rolling zstd logs they cannot open
            .config("spark.eventLog.compress", "false")
            .config("spark.eventLog.rolling.enabled", "false")
        )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
