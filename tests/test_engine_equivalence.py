"""Crawl-equivalence: the Spark BSP engine must reproduce the serial
oracle's visited set, depth assignment, history contents, per-host
fetch order, and extracted text byte-for-byte (SURVEY.md §5 item 2;
north_rule ordering + URL-seen match)."""

import pytest

from krawler_spark.config import CrawlConfig
from krawler_spark.engine import CrawlEngine
from krawler_spark.oracle import crawl_oracle
from krawler_spark.plans.store import SnapshotStore
from krawler_spark.schemas import PAGES
from krawler_spark.sources.corpus import build_pages_local, default_seeds

N_HOSTS = 3
PAGES_PER_HOST = 10


def _corpus():
    rows = build_pages_local(n_hosts=N_HOSTS, pages_per_host=PAGES_PER_HOST, hot_factor=3)
    pages_dict = {r[0]: {"html": r[2], "text": r[3], "lang": r[4]} for r in rows}
    return rows, pages_dict


def _visited_key(rows):
    return sorted(
        (r["url"], r["depth"], r["root_page_id"], r["parent_url"],
         r["fetch_round"], r["host_seq"], r["action"], r["text"],
         tuple(sorted((r.get("headers") or {}).items())))
        for r in rows
    )


def _run_engine(spark, warehouse, rows, config, resume=False, seeds=None, **kw):
    pages_df = spark.createDataFrame(rows, PAGES)
    eng = CrawlEngine(spark, pages_df, config=config,
                      store=SnapshotStore(spark, warehouse), **kw)
    eng.run(seeds or default_seeds(N_HOSTS), resume=resume)
    return eng


def _assert_equivalent(eng, oracle_res):
    vis = [r.asDict() for r in eng.visited().collect()] if eng.visited() is not None else []
    assert _visited_key(vis) == _visited_key(oracle_res.visited)

    hist = {r["url"]: r["id"] for r in eng.history().collect()} if eng.history() is not None else {}
    assert set(hist) == set(oracle_res.history)
    assert hist == oracle_res.history  # deterministic ids too


def test_full_crawl_equivalence(spark, warehouse):
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)  # budget 5/host/round
    # extra seed straight into host 0's robots-disallowed path so the
    # gate fires within the shallow fast-suite depth
    seeds = default_seeds(N_HOSTS) + ["http://www.site-0.com/blocked/3.html"]
    oracle_res = crawl_oracle(seeds, pages_dict, cfg)
    eng = _run_engine(spark, warehouse, rows, cfg, seeds=seeds)
    _assert_equivalent(eng, oracle_res)
    # robots actually gated something: /blocked pages of host 0 absent,
    # and the engine recorded the same denial events as the oracle
    vis_urls = {r["url"] for r in eng.visited().collect()}
    assert [u for u in vis_urls if "site-0.com/blocked/" in u] == []
    eng_denied = sorted(
        r["url"] for r in eng.events().collect() if r["kind"] == "robots_denied"
    )
    oracle_denied = sorted(e["url"] for e in oracle_res.events if e["kind"] == "robots_denied")
    assert eng_denied == oracle_denied and len(oracle_denied) > 0
    # malformed-robots host 1 never produced a denial (allow-all quirk)
    assert not any("site-1.com" in u for u in eng_denied)


def test_page_budget_equivalence(spark, warehouse):
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=-1, total_pages=17, round_seconds=1.0)
    oracle_res = crawl_oracle(default_seeds(N_HOSTS), pages_dict, cfg)
    eng = _run_engine(spark, warehouse, rows, cfg)
    _assert_equivalent(eng, oracle_res)
    assert len(oracle_res.visited) <= 17 + 3  # redirects/errors aside: bounded


@pytest.mark.slow
def test_politeness_budget_bounds_per_host_per_round(spark, warehouse):
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, politeness_delay_ms=500, round_seconds=1.0)  # budget 2
    oracle_res = crawl_oracle(default_seeds(N_HOSTS), pages_dict, cfg)
    eng = _run_engine(spark, warehouse, rows, cfg)
    _assert_equivalent(eng, oracle_res)
    from collections import Counter

    per = Counter()
    for r in eng.visited().collect():
        per[(r["host"], r["fetch_round"])] += 1
    assert max(per.values()) <= cfg.per_host_budget


@pytest.mark.slow
def test_should_visit_filter_equivalence(spark, warehouse):
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=4, round_seconds=1.0)
    oracle_res = crawl_oracle(
        default_seeds(N_HOSTS), pages_dict, cfg,
        should_visit=lambda u: not u.endswith(".png"),
    )
    eng = _run_engine(
        spark, warehouse, rows, cfg, should_visit="url NOT LIKE '%.png'"
    )
    _assert_equivalent(eng, oracle_res)


def test_resume_no_refetch(spark, tmp_path):
    rows, pages_dict = _corpus()
    cfg_full = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)

    # one-shot run
    eng_full = _run_engine(spark, str(tmp_path / "w1"), rows, cfg_full)
    full_vis = _visited_key([r.asDict() for r in eng_full.visited().collect()])

    # killed after 2 rounds, then resumed
    cfg_cut = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0, max_rounds=2)
    _run_engine(spark, str(tmp_path / "w2"), rows, cfg_cut)
    eng_resumed = _run_engine(
        spark, str(tmp_path / "w2"), rows, cfg_full, resume=True
    )
    res_vis = [r.asDict() for r in eng_resumed.visited().collect()]
    assert _visited_key(res_vis) == full_vis
    # no re-fetches: each url visited exactly once
    urls = [r["url"] for r in res_vis]
    assert len(urls) == len(set(urls))


def test_bucketed_harvest_path_equivalent(spark, tmp_path):
    """corpus_bucketed=True only changes the harvest stage's physical
    distribution (skips the de-skew respread); every output must be
    identical to the default path regardless of the corpus's actual
    layout."""
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)
    cfg_b = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0,
                        corpus_bucketed=True)
    e1 = _run_engine(spark, str(tmp_path / "a"), rows, cfg)
    e2 = _run_engine(spark, str(tmp_path / "b"), rows, cfg_b)
    v1 = _visited_key([r.asDict() for r in e1.visited().collect()])
    v2 = _visited_key([r.asDict() for r in e2.visited().collect()])
    assert v1 == v2


def test_resume_after_midround_crash(spark, tmp_path):
    """north_rule: a job killed MID-round resumes with no re-fetches
    and no URL-seen false negatives. Forge the exact torn state a
    kill between the delta write and the commit-marker rename leaves
    behind — an uncommitted delta dir containing a half-written
    parquet part — and require the resumed crawl to (a) not trip
    partition discovery on the torn file and (b) reproduce the
    uninterrupted run's visited set with every url fetched once."""
    import os
    import shutil

    rows, _ = _corpus()
    cfg_full = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)

    eng_full = _run_engine(spark, str(tmp_path / "w1"), rows, cfg_full)
    full_vis = _visited_key([r.asDict() for r in eng_full.visited().collect()])

    # two committed rounds...
    wh = str(tmp_path / "w2")
    cfg_cut = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0, max_rounds=2)
    _run_engine(spark, wh, rows, cfg_cut)
    store = SnapshotStore(spark, wh)
    assert store.last_committed() == 1
    # ...then a round-2 attempt that died mid-write: real parquet rows
    # (cloned from round 1's delta) plus a torn half-file, no marker
    src = store._table_dir("delta", 1)
    dst = store._table_dir("delta", 2)
    shutil.copytree(src, dst)
    kind_dir = next(
        os.path.join(dst, d) for d in sorted(os.listdir(dst))
        if d.startswith("kind=")
    )
    with open(os.path.join(kind_dir, "part-99999-torn.parquet"), "wb") as f:
        f.write(b"PAR1\x00half-written by a killed executor")
    assert store.last_committed() == 1  # marker never landed

    eng_resumed = _run_engine(
        spark, wh, rows, cfg_full, resume=True
    )
    res_vis = [r.asDict() for r in eng_resumed.visited().collect()]
    assert _visited_key(res_vis) == full_vis
    urls = [r["url"] for r in res_vis]
    assert len(urls) == len(set(urls))  # no re-fetches


@pytest.mark.slow
def test_bloom_and_exact_paths_agree(spark, tmp_path):
    rows, _ = _corpus()
    cfg_b = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0, use_bloom=True,
                        bloom_bits_per_bucket=1 << 14, bloom_buckets=8,
                        bloom_activation_rows=0)  # force the probe path
    cfg_e = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0, use_bloom=False)
    e1 = _run_engine(spark, str(tmp_path / "b"), rows, cfg_b)
    e2 = _run_engine(spark, str(tmp_path / "e"), rows, cfg_e)
    v1 = _visited_key([r.asDict() for r in e1.visited().collect()])
    v2 = _visited_key([r.asDict() for r in e2.visited().collect()])
    assert v1 == v2


@pytest.mark.slow
def test_extracted_text_byte_identical(spark, warehouse):
    """input_hint invariant: engine text output == corpus text column."""
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)
    eng = _run_engine(spark, warehouse, rows, cfg)
    for r in eng.visited().collect():
        assert r["text"] == pages_dict[r["url"]]["text"]


def test_salted_politeness_equivalence(spark, warehouse):
    """host_salt>1 (two-phase top-k, hot-host skew path) must be
    semantically invisible — same visited set/order as the oracle."""
    rows, pages_dict = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, politeness_delay_ms=500, round_seconds=1.0,
                      host_salt=4)  # budget 2/host/round, salted rank
    oracle_res = crawl_oracle(default_seeds(N_HOSTS), pages_dict, cfg)
    eng = _run_engine(spark, warehouse, rows, cfg)
    _assert_equivalent(eng, oracle_res)


def test_fast_redirect_chain_equivalence(spark, warehouse):
    """O14 fast strategy: chains are followed transparently; the visited
    row keeps the requested url, carries the hop chain
    (redirect_history, Requests.kt:63-78), and harvests the final
    target's content with hrefs resolved against the final url."""
    from krawler_spark.schemas import REDIRECTS

    rows, pages_dict = _corpus()
    redirects = {
        "http://www.site-0.com/moved": (301, "/hop2"),
        "http://www.site-0.com/hop2": (302, "/p/1.html"),
    }
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=2,
                      round_seconds=1.0)  # fast strategy is the default
    seeds = default_seeds(N_HOSTS) + ["http://www.site-0.com/moved"]
    oracle_res = crawl_oracle(seeds, pages_dict, cfg, redirects=redirects)
    redirects_df = spark.createDataFrame(
        [(u, s, l) for u, (s, l) in redirects.items()], REDIRECTS
    )
    eng = _run_engine(spark, warehouse, rows, cfg, seeds=seeds,
                      redirects=redirects_df)
    _assert_equivalent(eng, oracle_res)
    chains = {
        r["url"]: r["redirect_history"] for r in eng.visited().collect()
    }
    moved = chains["http://www.site-0.com/moved"]
    assert [(h["url"], h["status"]) for h in moved] == [
        ("http://www.site-0.com/moved", 301),
        ("http://www.site-0.com/hop2", 302),
    ]
    oracle_moved = next(v for v in oracle_res.visited
                        if v["url"] == "http://www.site-0.com/moved")
    assert [(h["url"], h["status"]) for h in moved] == [
        (h["url"], h["status"]) for h in oracle_moved["redirect_history"]
    ]
    # the chained row fetched the final target's content
    assert oracle_moved["text"] == pages_dict["http://www.site-0.com/p/1.html"]["text"]


def test_status_codes_and_unexpected_status_events(spark, warehouse):
    """O13/O21: a corpus `status` column flows to visited rows, and
    non-2xx/3xx hits surface as unexpected_status events — the
    side-output analogue of onUnexpectedStatusCode (Krawler.kt:150-160;
    the reference declares the hook and still harvests/visits the page,
    so the row stays a normal visit)."""
    from pyspark.sql import functions as F
    from krawler_spark.schemas import PAGES

    rows, pages_dict = _corpus()
    # mark every 5th page as a 404 (body kept — reference harvests anyway)
    statuses = {}
    for i, r in enumerate(rows):
        statuses[r[0]] = 404 if (not r[0].endswith("robots.txt") and i % 5 == 1) else 200
    for u, st in statuses.items():
        if u in pages_dict:
            pages_dict[u]["status"] = st
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)
    oracle_res = crawl_oracle(default_seeds(N_HOSTS), pages_dict, cfg)
    pages_df = spark.createDataFrame(rows, PAGES).withColumn(
        "status", F.udf(lambda u: statuses.get(u, 200), "int")("url")
    )
    eng = CrawlEngine(spark, pages_df, config=cfg,
                      store=SnapshotStore(spark, warehouse))
    eng.run(default_seeds(N_HOSTS))
    _assert_equivalent(eng, oracle_res)
    vis_status = {r["url"]: r["status"] for r in eng.visited().collect()}
    oracle_status = {v["url"]: v["status"] for v in oracle_res.visited}
    assert vis_status == oracle_status
    assert any(s == 404 for s in vis_status.values())
    eng_unexpected = sorted(
        r["url"] for r in eng.events().collect() if r["kind"] == "unexpected_status"
    )
    oracle_unexpected = sorted(
        e["url"] for e in oracle_res.events if e["kind"] == "unexpected_status"
    )
    assert eng_unexpected == oracle_unexpected and len(eng_unexpected) > 0


def test_remove_urls_by_root_page(spark, warehouse):
    """O19 (KrawlQueueDaoTest.testDeleteByRootPageId): frontier rows of
    one seed's crawl tree are deleted; others survive."""
    rows, _ = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=2,
                      round_seconds=1.0, max_rounds=1)
    eng = _run_engine(spark, warehouse, rows, cfg)
    frontier = eng.store.read_frontier(1)
    roots = {r["root_page_id"] for r in frontier.select("root_page_id").distinct().collect()}
    assert 0 in roots and len(roots) > 1
    before = frontier.count()
    victim_rows = frontier.filter("root_page_id = 0").count()
    removed = eng.remove_urls_by_root_page(0)
    assert removed == victim_rows > 0
    after = eng.store.read_frontier(1)
    assert after.count() == before - removed
    assert after.filter("root_page_id = 0").count() == 0


def test_clear_history_frees_urls(spark, warehouse):
    """O20: cleared rounds disappear from the URL-seen set."""
    rows, _ = _corpus()
    cfg = CrawlConfig(deterministic_history_ids=True, max_depth=2, round_seconds=1.0)
    eng = _run_engine(spark, warehouse, rows, cfg)
    before = eng.history().count()
    removed = eng.clear_history(before_round=1)  # retire round 0
    assert removed > 0
    after = eng.history().count()
    assert after == before - removed


def test_emit_links_surface(spark, warehouse):
    """config.emit_links attaches KrawlDocument's link surface
    (anchorTags + otherOutgoingLinks, KrawlDocument.kt:77-89) to
    visited rows: href/text/attrs/kind equal to extract_links over the
    page html. KrawlDocument always exposes lists, so body-less rows
    get [] — links is NULL only when emit_links is off."""
    from krawler_spark.functions.extract import extract_links

    rows, pages_dict = _corpus()
    cfg = CrawlConfig(max_depth=2, deterministic_history_ids=True,
                      round_seconds=1.0, emit_links=True)
    eng = _run_engine(spark, warehouse, rows, cfg)
    vis = {r["url"]: r for r in eng.visited().collect()}
    assert vis, "crawl produced no visited rows"
    for url, r in vis.items():
        assert r["links"] is not None, url  # every visit fetched a body
        want = extract_links(pages_dict[url]["html"])
        got = [(l["href"], l["text"], dict(l["attrs"] or {}), l["kind"])
               for l in r["links"]]
        assert got == [(l.href, l.text, dict(l.attrs or {}), l.kind)
                       for l in want], url


def test_links_off_by_default(spark, warehouse):
    rows, _ = _corpus()
    cfg = CrawlConfig(max_depth=1, round_seconds=1.0)
    eng = _run_engine(spark, warehouse, rows, cfg)
    assert all(r["links"] is None for r in eng.visited().collect())


def test_repeat_events_flag_off(spark, warehouse):
    """record_repeat_events=False skips the frontier-sized repeat_visit
    event partition but leaves visited/history (the north-star counts)
    bit-identical."""
    rows, pages_dict = _corpus()
    base = dict(deterministic_history_ids=True, max_depth=3, round_seconds=1.0)
    eng_off = _run_engine(spark, warehouse + "_off", rows,
                          CrawlConfig(**base, record_repeat_events=False))
    eng_on = _run_engine(spark, warehouse + "_on", rows, CrawlConfig(**base))
    key = lambda e: sorted(
        (r["url"], r["depth"], r["host_seq"], r["text"]) 
        for r in e.visited().collect()
    )
    assert key(eng_off) == key(eng_on)
    hist = lambda e: {r["url"]: r["id"] for r in e.history().collect()}
    assert hist(eng_off) == hist(eng_on)
    kinds_off = {r["kind"] for r in eng_off.events().collect()}
    kinds_on = {r["kind"] for r in eng_on.events().collect()}
    assert "repeat_visit" not in kinds_off
    assert "repeat_visit" in kinds_on
    assert kinds_off == kinds_on - {"repeat_visit"}
