"""Benchmark harness — run headline queries + the crawl-throughput
round loop; print ONE JSON line.

Env:
  SPARK_GRAFT_SF_DIR  testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] core count (default 32)
  KS_BENCH_PAGES_PER_HOST / KS_BENCH_HOSTS  crawl-corpus scale overrides

The crawl bench measures the north-star metric: URLs fetched+deduped
per second of frontier-round processing. The frontier is seeded with
every corpus URL at once (a deep-frontier snapshot, not a BFS trickle),
politeness budgets set high enough not to throttle, so the measured
rate is the engine DAG's throughput: dedup window → bloom-probed
anti-join → robots gate → politeness rank → fetch join → harvest.
Scaling evidence across core counts: scripts/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "urlseen_antijoin",
    "inbatch_dedup",
    "politeness_topk",
    "priority_pop",
    "link_explode",
    "robots_segment_gate",
    "url_canonicalize",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "text_quality",
    "text_langid",
    "text_repetition",
    "text_quality_filter",
    "ann_cosine_topk",
    "ann_ivf",
    "emb_neardup_pairs",
    "events_window_agg",
]


def _count(df) -> int:
    return df.count()


def crawl_bench(spark, hosts: int, pages_per_host: int) -> dict:
    from pyspark.sql import functions as F

    from krawler_spark.config import CrawlConfig
    from krawler_spark.engine import CrawlEngine
    from krawler_spark.sources.corpus import build_pages_spark

    avg_links = int(os.environ.get("KS_BENCH_LINKS", "40"))
    n_words = int(os.environ.get("KS_BENCH_WORDS", "300"))
    corpus_dir = os.path.join(
        "/tmp",  # page-cached read-only input; keep off the tmpfs TMPDIR
        f"ks_bench_corpus_h{hosts}_p{pages_per_host}_l{avg_links}_w{n_words}",
    )
    if not os.path.isdir(corpus_dir):
        build_pages_spark(
            spark, hosts, pages_per_host, avg_links=avg_links, n_words=n_words
        ).write.mode("overwrite").parquet(corpus_dir + ".tmp")
        os.replace(corpus_dir + ".tmp", corpus_dir)

    # The corpus is served as a url-BUCKETED table — the local analogue of
    # an Iceberg table with a bucket(url) partition transform. The per-
    # round fetch join then reads pre-bucketed, pre-sorted corpus files
    # and only the (payload-free) admitted side shuffles: the multi-GB
    # html/text corpus never re-shuffles, on any round (north_rule:
    # partitioning handled explicitly).
    tbl = f"ks_pages_h{hosts}_p{pages_per_host}_l{avg_links}_w{n_words}"
    tbl_dir = corpus_dir + "_bucketed"
    try:
        if not os.path.isdir(tbl_dir):
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            (
                spark.read.parquet(corpus_dir)
                # ONE file per bucket: repartition by the same hash
                # bucketBy uses, so each write task holds exactly one
                # bucket. With >1 file per bucket Spark cannot trust
                # the SORTED BY property and silently re-sorts the
                # entire payload corpus inside every round's SMJ —
                # measured 3.2× crawl wall at local[32] (85s vs 22s
                # round 1) before this fix.
                .repartition(32, F.col("url"))
                .write.bucketBy(32, "url").sortBy("url")
                .option("path", tbl_dir).saveAsTable(tbl)
            )
        elif not spark.catalog.tableExists(tbl):
            # the default session catalog is in-memory: a NEW process
            # must re-register the existing bucketed files as an
            # external bucketed table, or every fetch join silently
            # pays a full corpus shuffle (the old fallback did exactly
            # that — a ~100 TB-scale anti-pattern hidden in the bench)
            spark.sql(
                f"CREATE TABLE {tbl} (url STRING, warc_ts TIMESTAMP, "
                "html BINARY, text STRING, lang STRING) USING parquet "
                "CLUSTERED BY (url) SORTED BY (url) INTO 32 BUCKETS "
                f"LOCATION '{tbl_dir}'"
            )
        pages = spark.table(tbl)
        pages.limit(1).count()  # validate metadata before committing to it
    except Exception:
        # unrecoverable metadata problem → plain parquet (correctness
        # identical; the fetch join just pays the corpus shuffle)
        pages = spark.read.parquet(corpus_dir)

    seeds_df = (
        pages.filter(~F.col("url").endswith("/robots.txt"))
        .select("url")
        .withColumn("seed_order", F.pmod(F.xxhash64("url"), F.lit(1 << 31)))
    )

    cfg = CrawlConfig(
        max_depth=-1,
        politeness_delay_ms=1,          # budget ≫ host size: measure engine, not throttle
        round_seconds=60.0,
        max_rounds=2,
        use_bloom=True,
        bloom_buckets=64,
        bloom_bits_per_bucket=1 << 18,
        deterministic_history_ids=False,  # scale mode: no global-order stage
        # scale mode: don't materialize frontier-sized repeat_visit hook
        # payloads (onRepeatVisit is a no-op unless overridden; the
        # fetched/deduped counts this bench reports are unaffected)
        record_repeat_events=False,
        # the bench corpus IS a url-bucketed table (bucketBy(32,"url")
        # above), and corpus_bucketed=True skips the harvest respread's
        # payload re-shuffle — it shuffles 2.6× fewer bytes (measured,
        # scripts/shuffle_bytes.py) but fusing the python extraction
        # into the 32-task bucketed-join stage costs 3× crawl WALL at
        # local[32] (85s vs 22s round 1, quiet host): at bucket-count ≈
        # core-count the fused stage loses the respread's post-exchange
        # rebalance. Default OFF here so the headline bench measures
        # the faster plan at this box's shape; KS_BENCH_CORPUS_BUCKETED=1
        # opts in (the shape is echoed in the output either way).
        corpus_bucketed=os.environ.get("KS_BENCH_CORPUS_BUCKETED", "0") == "1",
    )
    wh = tempfile.mkdtemp(prefix="ks_bench_wh_")
    eng = CrawlEngine(spark, pages, config=cfg, warehouse=wh)

    t0 = time.time()
    eng.run(seeds_df=seeds_df)
    wall = time.time() - t0

    # Per-round wall times, derived from the commit files' mtimes (the
    # commit rename is the last act of a round — engine.py:1042): round
    # r's cost = commit(r) - commit(r-1), with t0 opening round 0. Used
    # by the scaling assembler's per-round-minimum estimator: each round
    # is the same deterministic computation across reps (counts
    # asserted identical), so min-over-reps per ROUND needs only a
    # round-sized quiet stretch on the shared host, not a leg-sized one.
    round_secs = []
    try:
        commit_dir = os.path.join(wh, "_commits")
        mtimes = sorted(
            (int(f[1:].split(".")[0]), os.path.getmtime(
                os.path.join(commit_dir, f)))
            for f in os.listdir(commit_dir)
            if f.startswith("r") and f.endswith(".json")
            and not f.startswith("r-")  # r-1 = history-floor marker
        )
        prev = t0
        for _, mt in mtimes:
            round_secs.append(round(mt - prev, 2))
            prev = mt
    except OSError:
        pass

    last = eng.store.last_committed()
    metrics = {}
    for r in eng.store.read_metrics(last).collect():
        metrics.setdefault(r["metric"], 0)
        metrics[r["metric"]] += r["value"]
    fetched = int(metrics.get("visited", 0))
    deduped = int(metrics.get("history_inserted", 0))
    # candidates entering the round pipeline = seeds + all re-enqueued links
    processed = fetched + deduped
    shutil.rmtree(wh, ignore_errors=True)
    return {
        "sec": round(wall, 2),
        "rounds": int(last) + 1 if last is not None else 0,
        "round_secs": round_secs,
        "fetched": fetched,
        "deduped": deduped,
        "urls_per_sec": round((fetched + deduped) / wall, 1),
        "frontier_next": int(metrics.get("frontier_next", 0)),
        # harvest-path provenance: reps with and without the respread
        # skip are not the same computation shape (one fewer full
        # payload shuffle per round when bucketed)
        "corpus_bucketed": cfg.corpus_bucketed,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entry
    from krawler_spark.session import get_spark

    # Shuffle partitions COMPUTED from data volume, identical at every
    # core count (a real cluster sizes exchanges to input volume and
    # lets AQE coalesce — r3's fixed 64 was the right diagnosis applied
    # as the wrong constant: it fixed the 34M-row sort spills but cost
    # ~15% at the 3.4M-row sf0.1 scale). The session default covers the
    # micro-queries and the crawl's round 0 (frontier = corpus size);
    # from round 1 on, the ENGINE re-sizes per round from the committed
    # frontier_next count (CrawlConfig.shuffle_rows_per_partition).
    hosts = int(os.environ.get("KS_BENCH_HOSTS", "64"))
    pph = int(os.environ.get("KS_BENCH_PAGES_PER_HOST", "1200"))
    rows_per_part = 500_000
    parts = int(
        os.environ.get(
            "KS_BENCH_SHUFFLE_PARTITIONS",
            max(cpus, min(4096, hosts * pph // rows_per_part)),
        )
    )
    spark = get_spark("krawler-bench", cores=cpus, shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    timings: dict[str, float] = {}
    if not os.environ.get("KS_BENCH_CRAWL_ONLY"):
        # Untimed warmup: a fresh session's first job pays JVM JIT,
        # codegen-compiler classloading, parquet footer caching, and
        # python-worker spin-up — session cost, not query cost (the r3
        # numbers charged all of it to whichever query ran first). The
        # warmup touches each machinery kind once without running any
        # timed query's plan.
        from pyspark.sql import functions as F

        spark.range(1 << 18).select(F.sum("id")).collect()
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        docs.limit(64).select(F.length("text")).count()
        docs.limit(64).mapInPandas(
            lambda it: (pdf.iloc[:1][["doc_id"]] for pdf in it),
            schema="doc_id long").count()
        # min-of-reps per query, same policy as the crawl headline:
        # co-tenant noise only slows a run, and rep 2 measures the
        # steady state (plan/codegen caches warm) a long-running
        # session actually sees rather than one cold shot.
        q_reps = int(os.environ.get("KS_BENCH_QUERY_REPS", "2"))
        for name in BENCH_QUERIES:
            best = None
            for _ in range(q_reps):
                t0 = time.time()
                _count(qs[name](spark, sf_dir))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)

    # The crawl loop is the headline; the sandbox shares a host with
    # co-tenants whose load waves can double a single run's wall time
    # (measured: identical back-to-back runs at 33.8s and 59.3s). Noise
    # only ever SLOWS a run, so min-of-reps is the honest estimator of
    # the engine's cost; counts are asserted identical across reps.
    crawl_reps = int(os.environ.get("KS_BENCH_CRAWL_REPS", "2"))
    crawls = [crawl_bench(spark, hosts, pph) for _ in range(crawl_reps)]
    if len({(c["fetched"], c["deduped"]) for c in crawls}) != 1:
        # not a bare assert: stripped under -O, and min-of-reps is only
        # honest when it picks among identical-output runs
        raise RuntimeError(f"crawl reps disagree on counts: {crawls}")
    crawl = min(crawls, key=lambda c: c["sec"])
    timings["crawl_round_loop"] = crawl["sec"]

    total = round(sum(timings.values()), 2)
    q_reps = int(os.environ.get("KS_BENCH_QUERY_REPS", "2"))
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "crawl": crawl,
                # methodology self-description (r4 VERDICT "what's wrong"
                # #2): r3 and earlier were single-shot cold numbers; r4+
                # are min-of-reps after an untimed session warmup. Not
                # apples-to-apples with BENCH_r03 and before.
                "estimator": (f"min-of-{q_reps}, warmed"
                              if not os.environ.get("KS_BENCH_CRAWL_ONLY")
                              else "crawl-only"),
                "crawl_estimator": f"min-of-{crawl_reps}, counts-asserted",
                "warmup": True,
            }
        )
    )


if __name__ == "__main__":
    main()
