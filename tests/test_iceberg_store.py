"""IcebergSnapshotStore: full crawl-equivalence when an Iceberg runtime
is on the classpath; cleanly skipped otherwise (this sandbox ships no
iceberg-spark-runtime jar — the test documents and guards the
config-level store swap)."""

import pytest


def _iceberg_spark():
    from krawler_spark.session import get_spark

    return get_spark(
        "iceberg-store-test",
        cores=4,
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.catalog.ks_ice": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.ks_ice.type": "hadoop",
            "spark.sql.catalog.ks_ice.warehouse": "/tmp/ks_ice_wh",
        },
    )


def test_iceberg_store_crawl_equivalence():
    from krawler_spark.plans.iceberg_store import iceberg_available

    spark = _iceberg_spark()
    if not iceberg_available(spark, "ks_ice"):
        pytest.skip("no iceberg-spark-runtime on the classpath")

    from krawler_spark.config import CrawlConfig
    from krawler_spark.engine import CrawlEngine
    from krawler_spark.oracle import crawl_oracle
    from krawler_spark.plans.iceberg_store import IcebergSnapshotStore
    from krawler_spark.schemas import PAGES
    from krawler_spark.sources.corpus import build_pages_local, default_seeds

    rows = build_pages_local(n_hosts=3, pages_per_host=10, hot_factor=3)
    pages_dict = {r[0]: {"html": r[2], "text": r[3], "lang": r[4]} for r in rows}
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)
    store = IcebergSnapshotStore(spark, "ks_ice", namespace="t_equiv")
    try:
        eng = CrawlEngine(spark, spark.createDataFrame(rows, PAGES),
                          config=cfg, store=store)
        eng.run(default_seeds(3))
        oracle_res = crawl_oracle(default_seeds(3), pages_dict, cfg)
        vis = sorted(
            (r["url"], r["depth"], r["host_seq"]) for r in eng.visited().collect()
        )
        ovis = sorted(
            (v["url"], v["depth"], v["host_seq"]) for v in oracle_res.visited
        )
        assert vis == ovis
    finally:
        store.destroy()


def test_iceberg_submissions_roundtrip():
    """submit_urls staging on the Iceberg store: an append table with a
    consumed-round column (VERDICT r2 wrong #3). Idempotent per round."""
    from krawler_spark.plans.iceberg_store import iceberg_available

    spark = _iceberg_spark()
    if not iceberg_available(spark, "ks_ice"):
        pytest.skip("no iceberg-spark-runtime on the classpath")

    from krawler_spark.plans.iceberg_store import IcebergSnapshotStore
    from krawler_spark import schemas

    store = IcebergSnapshotStore(spark, "ks_ice", namespace="t_subs")
    try:
        assert store.drain_submissions(1) is None
        rows = [("http://a.com/x", "a.com", 7, None, 0, 0, 0, 1)]
        store.stage_submissions(spark.createDataFrame(rows, schemas.FRONTIER))
        got = store.drain_submissions(3)
        assert [r["url"] for r in got.collect()] == ["http://a.com/x"]
        # crash/resume of the SAME round re-reads the claimed rows
        again = store.drain_submissions(3)
        assert [r["url"] for r in again.collect()] == ["http://a.com/x"]
        # a later round never re-consumes them
        assert store.drain_submissions(4) is None
    finally:
        store.destroy()
