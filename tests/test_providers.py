"""Fetch-provider seam (sources/providers.py): the live
HttpRequestProvider must produce the same crawl as the offline
CorpusRequestProvider when a local HTTP server serves the same pages —
the RequestProviderIf parity check (http/Requests.kt:46-61)."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from krawler_spark.config import CrawlConfig
from krawler_spark.engine import CrawlEngine
from krawler_spark.schemas import PAGES
from krawler_spark.sources.corpus import build_pages_local, default_seeds


@pytest.fixture(scope="module")
def corpus_server():
    """Serve the synthetic corpus over localhost: the logical url
    http://www.site-i.com/<path> is requested as /www.site-i.com/<path>."""
    rows = build_pages_local(n_hosts=3, pages_per_host=8)
    by_url = {r[0]: r[2] for r in rows}  # url -> html bytes (robots = body)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            url = "http:/" + self.path  # /www.site-0.com/x -> http://www.site-0.com/x
            body = by_url.get(url)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield rows, srv.server_address[1]
    srv.shutdown()


def _visited_key(rows):
    # host_seq deliberately excluded: a live 404 IS a fetch (the
    # reference dispatches visit() with the error status and counts it
    # against politeness), while the offline corpus models the same url
    # as a fetch_error — so per-host ordinals shift by design.
    return sorted(
        (r["url"], r["depth"], r["root_page_id"], r["parent_url"],
         r["fetch_round"], r["action"], r["text"])
        for r in rows
    )


def test_http_provider_matches_corpus_provider(spark, tmp_path, corpus_server):
    rows, port = corpus_server
    cfg = CrawlConfig(max_depth=3, round_seconds=1.0, max_rounds=8)
    seeds = default_seeds(3)

    corpus_eng = CrawlEngine(
        spark, spark.createDataFrame(rows, PAGES), config=cfg,
        warehouse=str(tmp_path / "wh_corpus"),
    )
    corpus_eng.run(seeds)

    from krawler_spark.sources.providers import HttpRequestProvider

    provider = HttpRequestProvider(
        spark, cache_dir=str(tmp_path / "fetch_cache"),
        base_rewrite={"http://": f"http://127.0.0.1:{port}/"},
        timeout_s=5.0,
    )
    live_eng = CrawlEngine(
        spark, config=cfg, provider=provider,
        warehouse=str(tmp_path / "wh_live"),
    )
    live_eng.run(seeds)

    got = [r.asDict() for r in live_eng.visited().collect()]
    want = [r.asDict() for r in corpus_eng.visited().collect()]
    corpus_urls = {r[0] for r in rows}
    got_ok = [r for r in got if r["url"] in corpus_urls]
    got_404 = [r for r in got if r["url"] not in corpus_urls]
    # pages both providers can serve crawl identically, text byte-equal
    assert _visited_key(got_ok) == _visited_key(want)
    assert {r["status"] for r in got_ok} == {200}
    # urls absent from the server (img/script srcs) are visited with the
    # real 404 — exactly the set the corpus twin records as fetch_error
    assert got_404 and all(
        r["status"] == 404 and r["text"] == "" for r in got_404
    )
    ferr = {r["url"] for r in corpus_eng.events().collect()
            if r["kind"] == "fetch_error"}
    assert {r["url"] for r in got_404} == ferr
    # the robots gate saw the live robots.txt: /blocked urls denied on
    # the robots-bearing host exactly as in the corpus crawl
    ev_live = {(r["url"], r["kind"]) for r in live_eng.events().collect()}
    ev_corp = {(r["url"], r["kind"]) for r in corpus_eng.events().collect()}
    assert {e for e in ev_live if e[1] == "robots_denied"} == \
        {e for e in ev_corp if e[1] == "robots_denied"}


def test_http_provider_404_is_fetch_error_like(spark, tmp_path, corpus_server):
    """A 404 page is cached with its status and an empty body — the
    visited row surfaces the real code via the unexpected_status hook."""
    rows, port = corpus_server
    from krawler_spark.sources.providers import HttpRequestProvider

    provider = HttpRequestProvider(
        spark, cache_dir=str(tmp_path / "c404"),
        base_rewrite={"http://": f"http://127.0.0.1:{port}/"},
        timeout_s=5.0,
    )
    eng = CrawlEngine(
        spark, config=CrawlConfig(max_depth=1, round_seconds=1.0, max_rounds=2),
        provider=provider, warehouse=str(tmp_path / "wh404"),
    )
    eng.run(["http://www.site-0.com/p/0.html", "http://www.site-0.com/nope.html"])
    vis = {r["url"]: r for r in eng.visited().collect()}
    assert vis["http://www.site-0.com/p/0.html"]["status"] == 200
    assert vis["http://www.site-0.com/nope.html"]["status"] == 404
    events = {(r["url"], r["kind"]) for r in eng.events().collect()}
    assert ("http://www.site-0.com/nope.html", "unexpected_status") in events
