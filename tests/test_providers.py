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


# --------------------------------------------------------------------------
# Live-wire semantics: per-host pacing (the RequestsTest.kt:56-72 timing
# law), redirect capture (HistoryTrackingRedirectStrategy parity), retry
# + provider-aware error detail, robots TTL (RoboMinder.kt:39-42).
# Location headers are emitted in LOGICAL (public) url space, as a real
# server behind a rewrite/LB would do.
import time


@pytest.fixture()
def wire_server():
    state = {"robots_version": 1, "flaky_hits": 0}
    log = []  # (logical_path, monotonic time)
    lock = threading.Lock()

    page = b"<html><body><p>hello world</p></body></html>"
    final_page = b"<html><body><p>you made it</p></body></html>"

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _send(self, code, body=b"", location=None, ctype="text/html"):
            self.send_response(code)
            if location:
                self.send_header("Location", location)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            with lock:
                log.append((self.path, time.monotonic()))
            p = self.path
            if p.endswith("/robots.txt"):
                if "www.robots-ttl.com" in p:
                    body = (
                        b"User-agent: *\nDisallow: /old\n"
                        if state["robots_version"] == 1
                        else b"User-agent: *\nDisallow: /new\n"
                    )
                    self._send(200, body, ctype="text/plain")
                else:
                    self._send(404, b"")
                return
            if p == "/www.redir.com/hop1":
                self._send(302, b"", location="http://www.redir.com/hop2")
                return
            if p == "/www.redir.com/hop2":
                self._send(301, b"", location="http://www.target.com/final")
                return
            if p == "/www.target.com/final":
                self._send(200, final_page)
                return
            if p == "/www.loop.com/a":
                self._send(302, b"", location="http://www.loop.com/b")
                return
            if p == "/www.loop.com/b":
                self._send(302, b"", location="http://www.loop.com/a")
                return
            if p == "/www.flaky.com/page":
                with lock:
                    state["flaky_hits"] += 1
                    n = state["flaky_hits"]
                if n == 1:
                    # transient failure: drop the connection mid-request
                    self.close_connection = True
                    self.connection.close()
                    return
                self._send(200, page)
                return
            if p.startswith("/www.paced-") or p.startswith("/www.plain"):
                self._send(200, page)
                return
            if p == "/www.gzip.com/page":
                # serve gzip ONLY; a client that does not advertise it
                # gets 406 — proving the provider sends Accept-Encoding
                if "gzip" not in self.headers.get("Accept-Encoding", ""):
                    self._send(406, b"gzip required")
                    return
                import gzip as _gz

                gz = _gz.compress(page)
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Encoding", "gzip")
                self.send_header("Content-Length", str(len(gz)))
                self.end_headers()
                self.wfile.write(gz)
                return
            if p == "/www.gzip.com/deflate-raw":
                # raw-deflate without the zlib wrapper (seen from IIS)
                import zlib as _zl

                raw = _zl.compressobj(wbits=-_zl.MAX_WBITS)
                dz = raw.compress(page) + raw.flush()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Encoding", "deflate")
                self.send_header("Content-Length", str(len(dz)))
                self.end_headers()
                self.wfile.write(dz)
                return
            self._send(404, b"")

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield state, log, srv.server_address[1]
    srv.shutdown()


def _wire_provider(spark, tmp_path, port, **kw):
    from krawler_spark.sources.providers import HttpRequestProvider

    kw.setdefault("timeout_s", 5.0)
    return HttpRequestProvider(
        spark, cache_dir=str(tmp_path / "wire_cache"),
        base_rewrite={"http://": f"http://127.0.0.1:{port}/"},
        **kw,
    )


def test_politeness_timing_law(spark, tmp_path, wire_server):
    """RequestsTest.kt:56-72: N requests to one host span at least
    politenessDelay x (N-1) -- enforced on the wire, not just via the
    admission budget."""
    _state, log, port = wire_server
    delay_ms = 200
    provider = _wire_provider(
        spark, tmp_path, port, politeness_delay_ms=delay_ms, fetch_partitions=4
    )
    urls = [f"http://www.paced-a.com/p{i}" for i in range(5)] + [
        f"http://www.paced-b.com/p{i}" for i in range(3)
    ]
    log.clear()
    provider.refresh(0, spark.createDataFrame([(u,) for u in urls], "url string"))
    by_host = {}
    for path, t in log:
        host = path.split("/")[1]
        by_host.setdefault(host, []).append(t)
    a = sorted(by_host["www.paced-a.com"])
    assert len(a) == 5
    # the timing law: total span >= delay x (N-1), with scheduling slack
    assert a[-1] - a[0] >= (delay_ms / 1000.0) * (len(a) - 1) * 0.85
    # and consecutive same-host requests are individually spaced
    gaps = [b2 - b1 for b1, b2 in zip(a, a[1:])]
    assert min(gaps) >= (delay_ms / 1000.0) * 0.75
    # different hosts interleave: host B finished well before a serial
    # (A then B) schedule would allow
    b = sorted(by_host["www.paced-b.com"])
    assert b[0] < a[-1]


def test_redirect_capture_fast_strategy(spark, tmp_path, wire_server):
    """Fast strategy: the wire worker follows the chain, every hop lands
    in the provider's redirects table, and the engine's visited row gets
    the full redirect_history + the final document -- the
    HistoryTrackingRedirectStrategy surface (Requests.kt:63-78)."""
    _state, _log, port = wire_server
    provider = _wire_provider(spark, tmp_path, port)
    eng = CrawlEngine(
        spark, config=CrawlConfig(max_depth=1, round_seconds=1.0, max_rounds=2),
        provider=provider, warehouse=str(tmp_path / "wh_fast_redir"),
    )
    eng.run(["http://www.redir.com/hop1"])
    vis = {r["url"]: r.asDict() for r in eng.visited().collect()}
    row = vis["http://www.redir.com/hop1"]
    assert row["status"] == 200
    assert "you made it" in row["text"]
    hist = [(h["url"], h["status"]) for h in (row["redirect_history"] or [])]
    assert hist == [
        ("http://www.redir.com/hop1", 302),
        ("http://www.redir.com/hop2", 301),
    ]
    red = {(r["url"], r["status"], r["location"])
           for r in provider.redirects().collect()}
    assert ("http://www.redir.com/hop1", 302, "http://www.redir.com/hop2") in red
    assert ("http://www.redir.com/hop2", 301, "http://www.target.com/final") in red


def test_redirect_slow_strategy_requeues(spark, tmp_path, wire_server):
    """Slow strategy (use_fast_redirect_strategy=False): the 3xx itself
    is the visited row and the Location is re-enqueued at the SAME depth
    (Krawler.kt:446-457)."""
    _state, _log, port = wire_server
    provider = _wire_provider(spark, tmp_path, port)
    eng = CrawlEngine(
        spark,
        config=CrawlConfig(
            max_depth=2, round_seconds=1.0, max_rounds=4,
            use_fast_redirect_strategy=False,
        ),
        provider=provider, warehouse=str(tmp_path / "wh_slow_redir"),
    )
    eng.run(["http://www.redir.com/hop1"])
    vis = {r["url"]: r.asDict() for r in eng.visited().collect()}
    assert vis["http://www.redir.com/hop1"]["status"] == 302
    assert vis["http://www.redir.com/hop2"]["status"] == 301
    assert vis["http://www.target.com/final"]["status"] == 200
    # slow-mode requeue keeps the parent's depth
    assert vis["http://www.target.com/final"]["depth"] == \
        vis["http://www.redir.com/hop1"]["depth"]
    assert "you made it" in vis["http://www.target.com/final"]["text"]


def test_redirect_loop_is_an_error_row(spark, tmp_path, wire_server):
    _state, _log, port = wire_server
    provider = _wire_provider(spark, tmp_path, port, max_redirect_hops=4)
    provider.refresh(
        0, spark.createDataFrame([("http://www.loop.com/a",)], "url string")
    )
    errs = {r["url"]: r["detail"] for r in provider.fetch_errors().collect()}
    assert errs.get("http://www.loop.com/a") == "redirect loop"


def test_retry_recovers_transient_failure(spark, tmp_path, wire_server):
    state, _log, port = wire_server
    provider = _wire_provider(spark, tmp_path, port, retries=2)
    provider.refresh(
        0, spark.createDataFrame([("http://www.flaky.com/page",)], "url string")
    )
    rows = {r["url"]: r for r in provider.pages().collect()}
    assert rows["http://www.flaky.com/page"]["status"] == 200
    assert state["flaky_hits"] >= 2
    assert provider.fetch_errors() is None or \
        provider.fetch_errors().filter("url LIKE '%flaky%'").count() == 0


def test_gzip_content_compression(spark, tmp_path, wire_server):
    """The reference defaults allowContentCompression=true
    (crawler/KrawlConfig.kt:21-63, Apache HttpClient decodes gzip
    transparently): the provider must advertise Accept-Encoding, and a
    server forcing Content-Encoding must yield DECODED bytes in the
    cache, byte-equal to the uncompressed twin (r4 VERDICT missing #2)."""
    _state, _log, port = wire_server
    provider = _wire_provider(spark, tmp_path, port)
    provider.refresh(0, spark.createDataFrame(
        [("http://www.gzip.com/page",),
         ("http://www.gzip.com/deflate-raw",),
         ("http://www.plain.com/page",)], "url string"))
    rows = {r["url"]: r for r in provider.pages().collect()}
    plain = rows["http://www.plain.com/page"]
    gz = rows["http://www.gzip.com/page"]
    df = rows["http://www.gzip.com/deflate-raw"]
    assert gz["status"] == 200, "server rejected: Accept-Encoding not sent"
    assert bytes(gz["html"]) == bytes(plain["html"])  # decoded, not raw gzip
    assert gz["text"] == plain["text"]
    assert df["status"] == 200 and bytes(df["html"]) == bytes(plain["html"])


def test_connection_error_detail_reaches_engine(spark, tmp_path):
    """A host that refuses connections yields an explicit error row and
    the engine's fetch_error event carries the provider detail, not the
    offline 'no corpus row'."""
    import socket

    # grab a port with nothing listening on it
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    dead_port = s.getsockname()[1]
    s.close()

    provider = _wire_provider(
        spark, tmp_path, dead_port, retries=1, retry_backoff_s=0.05, timeout_s=1.0
    )
    eng = CrawlEngine(
        spark, config=CrawlConfig(max_depth=1, round_seconds=1.0, max_rounds=1),
        provider=provider, warehouse=str(tmp_path / "wh_dead"),
    )
    eng.run(["http://www.dead.com/x"])
    ev = [r.asDict() for r in eng.events().collect() if r["kind"] == "fetch_error"]
    assert len(ev) == 1
    assert ev[0]["url"] == "http://www.dead.com/x"
    assert ev[0]["detail"] == "connection error"


def test_robots_ttl_refetches(spark, tmp_path, wire_server):
    """robots_ttl_rounds: a host's robots.txt is re-fetched once it is
    TTL rounds old (RoboMinder.kt:39-42 expiry), and the cache serves
    latest-wins so rules actually change mid-crawl."""
    state, log, port = wire_server
    provider = _wire_provider(spark, tmp_path, port, robots_ttl_rounds=2)
    urls = spark.createDataFrame(
        [("http://www.robots-ttl.com/old",)], "url string"
    )

    def rules():
        rows = provider.robots_rules("krawler-spark").collect()
        return {r["robots_url"]: r["rules"] for r in rows}

    provider.refresh_robots(0, urls)
    assert rules()["http://www.robots-ttl.com/robots.txt"] == ["/old"]
    state["robots_version"] = 2
    provider.refresh_robots(1, urls)  # 1 round old: within TTL, no refetch
    assert rules()["http://www.robots-ttl.com/robots.txt"] == ["/old"]
    provider.refresh_robots(2, urls)  # 2 rounds old: expired -> refetch
    assert rules()["http://www.robots-ttl.com/robots.txt"] == ["/new"]
    # latest-wins: the pages view serves exactly one row per url
    n = provider.pages().filter("url = 'http://www.robots-ttl.com/robots.txt'")
    assert n.count() == 1
