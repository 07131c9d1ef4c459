"""Contract tests for the serial oracle itself — the executable spec
both implementations satisfy. Pure Python, no Spark."""

from krawler_spark.config import CrawlConfig
from krawler_spark.oracle import crawl_oracle


def _page(links, text="body"):
    html = "<html><body><p>" + text + "</p>" + "".join(
        f'<a href="{l}">x</a>' for l in links
    ) + "</body></html>"
    return {"html": html, "text": None, "lang": "en"}


def _pages():
    return {
        "http://a.com/0": _page(["/1", "/2"]),
        "http://a.com/1": _page(["/2", "/3"]),
        "http://a.com/2": _page(["/0"]),
        "http://a.com/3": _page([]),
        "http://b.com/0": _page(["http://a.com/1"]),
    }


def test_depth_cut_rows_never_enter_history():
    # depth check precedes history insert (Krawler.kt:364-377)
    res = crawl_oracle(["http://a.com/0"], _pages(), CrawlConfig(max_depth=1))
    assert set(res.history) == {"http://a.com/0"}
    cut = {e["url"] for e in res.events if e["kind"] == "depth_cut"}
    assert cut == {"http://a.com/1", "http://a.com/2"}


def test_repeat_visits_consume_without_refetch():
    res = crawl_oracle(["http://a.com/0"], _pages(), CrawlConfig(max_depth=-1))
    urls = [v["url"] for v in res.visited]
    assert len(urls) == len(set(urls))
    assert {e["kind"] for e in res.events} >= {"repeat_visit"}


def test_budget_exhausting_row_in_history_not_visited():
    res = crawl_oracle(
        ["http://a.com/0", "http://b.com/0"], _pages(),
        CrawlConfig(max_depth=-1, total_pages=1),
    )
    assert len(res.visited) == 1
    # the exhausting row got its history insert before the count check
    assert len(res.history) == 2


def test_slow_redirect_same_depth_not_counted():
    pages = _pages()
    pages["http://a.com/r"] = _page([])
    cfg = CrawlConfig(max_depth=2, use_fast_redirect_strategy=False, total_pages=-1)
    res = crawl_oracle(
        ["http://a.com/r"], pages, cfg,
        redirects={"http://a.com/r": (301, "/0")},
    )
    by_url = {v["url"]: v for v in res.visited}
    assert by_url["http://a.com/r"]["status"] == 301
    # target re-enqueued at the SAME depth (Krawler.kt:446-457)
    assert by_url["http://a.com/0"]["depth"] == 0


def test_politeness_defers_across_rounds():
    cfg = CrawlConfig(max_depth=-1, politeness_delay_ms=1000, round_seconds=1.0)
    res = crawl_oracle(["http://a.com/0"], _pages(), cfg)  # budget 1/round
    rounds = {}
    for v in res.visited:
        rounds.setdefault(v["host"], []).append(v["fetch_round"])
    for host, rs in rounds.items():
        assert len(rs) == len(set(rs))  # at most one fetch per host per round
