"""WARC source tests: spec-shaped archives → pages rows, plain and
gzipped, plus engine compatibility of the produced frame."""

import datetime as dt
import os

import pytest

from krawler_spark.functions.extract import extract_text
from krawler_spark.sources.warc import build_warc_bytes, parse_warc, warc_to_pages

H1 = b"<html><body><h1>One</h1><a href='/p/1.html'>x</a></body></html>"
H2 = b"<html><body><p>two words here</p></body></html>"

RECS = [
    ("http://www.site-0.com/p/0.html", "2024-01-01T00:00:00Z", 200, H1),
    ("http://www.site-0.com/p/1.html", "2024-01-01T00:00:01Z", 404, H2),
]


def test_parse_warc_roundtrip():
    recs = list(parse_warc(build_warc_bytes(RECS)))
    assert [r["url"] for r in recs] == [u for u, *_ in RECS]
    assert recs[0]["status"] == 200 and recs[1]["status"] == 404
    assert recs[0]["html"] == H1
    assert recs[0]["warc_ts"] == dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    assert recs[0]["http_headers"]["content-type"].startswith("text/html")


def test_parse_warc_gzip_and_skip_nonresponse():
    raw = build_warc_bytes(RECS, compress=True)
    # splice a request record in front — must be skipped
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: http://www.site-0.com/p/0.html\r\n"
        b"Content-Length: 4\r\n\r\nGET \r\n\r\n"
    )
    import gzip

    recs = list(parse_warc(req + gzip.decompress(raw)))
    assert len(recs) == 2
    recs_gz = list(parse_warc(raw))
    assert [r["url"] for r in recs_gz] == [r["url"] for r in recs]


def test_warc_to_pages_spark(spark, tmp_path):
    p = tmp_path / "a.warc.gz"
    p.write_bytes(build_warc_bytes(RECS, compress=True))
    from krawler_spark.sources.warc import read_warc_dir

    pages = read_warc_dir(spark, str(tmp_path), with_status=True)
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {u for u, *_ in RECS}
    r0 = rows["http://www.site-0.com/p/0.html"]
    assert bytes(r0["html"]) == H1
    assert r0["text"] == extract_text(H1)
    assert r0["status"] == 200
    assert rows["http://www.site-0.com/p/1.html"]["status"] == 404


def test_warc_pages_drive_the_engine(spark, tmp_path):
    """A WARC-ingested corpus is a drop-in pages table for the crawl."""
    from krawler_spark.config import CrawlConfig
    from krawler_spark.engine import CrawlEngine
    from krawler_spark.plans.store import SnapshotStore

    p = tmp_path / "c.warc"
    p.write_bytes(build_warc_bytes(RECS))
    pages = warc_to_pages(
        spark.read.format("binaryFile").load(str(p))
    )
    eng = CrawlEngine(
        spark, pages, config=CrawlConfig(max_depth=2, round_seconds=1.0),
        store=SnapshotStore(spark, str(tmp_path / "wh")),
    )
    eng.run(["http://www.site-0.com/p/0.html"])
    vis = {r["url"] for r in eng.visited().collect()}
    # seed + its harvested /p/1.html link
    assert vis == {u for u, *_ in RECS}


def test_parse_warc_bad_content_length_resyncs():
    """A record with a damaged Content-Length is skipped by resyncing to
    the next WARC marker — the archive tail is NOT discarded."""
    good = build_warc_bytes(RECS)
    damaged = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad.example/x\r\n"
        b"Content-Length: oops\r\n\r\ngarbage bytes"
    )
    recs = list(parse_warc(damaged + b"\r\n" + good))
    assert [r["url"] for r in recs] == [u for u, *_ in RECS]
