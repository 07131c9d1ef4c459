"""Bloom shard pipeline: distributed merge/probe properties
(VERDICT r1 item 3 — shard bytes must never transit the driver)."""

import inspect

from krawler_spark.config import CrawlConfig
from krawler_spark.engine import CrawlEngine
from krawler_spark.plans.store import SnapshotStore
from krawler_spark.schemas import PAGES
from krawler_spark.sources.corpus import build_pages_local, default_seeds


def test_bloom_module_has_no_driver_collect():
    """The shard build/merge/probe path is fully distributed: no
    .collect()/.toPandas()/driver broadcast of shard bytes anywhere in
    the module."""
    from krawler_spark.operators import bloom

    src = inspect.getsource(bloom)
    assert ".collect()" not in src
    assert ".toPandas()" not in src
    assert "sparkContext.broadcast" not in src


def test_bloom_many_buckets_crawl_matches_exact(spark, tmp_path):
    """512-bucket shards, probe forced on from round 0: same visited set
    as the exact-only path."""
    rows = build_pages_local(n_hosts=3, pages_per_host=10, hot_factor=3)

    def run(cfg, wh):
        eng = CrawlEngine(
            spark, spark.createDataFrame(rows, PAGES), config=cfg,
            store=SnapshotStore(spark, str(wh)),
        )
        eng.run(default_seeds(3))
        return sorted(
            (r["url"], r["depth"], r["host_seq"]) for r in eng.visited().collect()
        )

    v_bloom = run(
        CrawlConfig(deterministic_history_ids=True, max_depth=3,
                    round_seconds=1.0, use_bloom=True, bloom_buckets=512,
                    bloom_bits_per_bucket=1 << 12, bloom_activation_rows=0),
        tmp_path / "b512",
    )
    v_exact = run(
        CrawlConfig(deterministic_history_ids=True, max_depth=3,
                    round_seconds=1.0, use_bloom=False),
        tmp_path / "exact",
    )
    assert v_bloom == v_exact and len(v_bloom) > 0
