"""WARC ingestion — Common-Crawl's native archive format → the pages
table ``(url, warc_ts, html, text, lang)`` mandated by the input hint.

Parsing is from the public WARC/1.0–1.1 spec (ISO 28500): records are
``WARC/1.x`` header blocks terminated by CRLFCRLF, a ``Content-Length``-
delimited body, and a CRLFCRLF record separator. Common Crawl response
records carry an HTTP response (status line + headers + entity body);
the entity body is the page HTML.

Scale shape (how Common Crawl is actually processed): ``.warc.gz``
files are NOT splittable — each member-gzipped archive is one work
unit, and parallelism comes from the file count (a CC monthly crawl is
~64k files, far above any cluster's core count). The Spark path here
reads whole files via the ``binaryFile`` source and record-splits
inside ``mapInPandas``, so one task handles one archive and nothing
funnels through the driver. For splittable custom layouts, pass any
DataFrame with a ``content`` binary column (one archive/segment per
row).

Text extraction reuses the engine's ``extract_text`` so the
byte-identical-per-url invariant holds for WARC-ingested pages too.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io
from typing import Iterator, List, Optional, Tuple

from ..functions.extract import extract_text

__all__ = ["parse_warc", "warc_to_pages", "read_warc_dir", "build_warc_bytes"]

_CRLF = b"\r\n"


def _maybe_gunzip(data: bytes) -> bytes:
    """Decompress (multi-member) gzip, else return as-is."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as g:
        # GzipFile reads across members transparently
        while True:
            chunk = g.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def _parse_headers(block: bytes) -> dict:
    """Header block → lower-cased name → value (first wins, like the
    reference's KrawlDocument header map)."""
    headers: dict = {}
    for line in block.split(_CRLF):
        if b":" not in line:
            continue
        name, _, val = line.partition(b":")
        key = name.strip().lower().decode("latin-1")
        if key not in headers:
            headers[key] = val.strip().decode("latin-1")
    return headers


def _split_http_payload(payload: bytes) -> Tuple[Optional[int], dict, bytes]:
    """HTTP response payload → (status, lower-cased headers, body)."""
    head, sep, body = payload.partition(_CRLF + _CRLF)
    if not sep or not head.startswith(b"HTTP/"):
        return None, {}, payload
    status_line, _, header_block = head.partition(_CRLF)
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, _parse_headers(header_block), body


def parse_warc(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC *response* record:
    ``url, warc_ts, status, http_headers, html``. Request/metadata/
    warcinfo records are skipped (they carry no page payload)."""
    data = _maybe_gunzip(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            # resync: find the next record marker (tolerates damage the
            # way CC tooling does rather than dropping the archive tail)
            nxt = data.find(b"\r\nWARC/", pos)
            if nxt == -1:
                break
            pos = nxt + 2
            continue
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end == -1:
            break
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            # damaged/absent Content-Length: resync to the next record
            # marker (same CC-style tolerance as the non-WARC-prefix
            # branch) instead of discarding the whole archive tail
            nxt = data.find(b"\r\nWARC/", head_end)
            if nxt == -1:
                break
            pos = nxt + 2
            continue
        body_start = head_end + 4
        body = data[body_start:body_start + length]
        pos = body_start + length
        if headers.get("warc-type") == "response":
            status, http_headers, html = _split_http_payload(body)
            ts = None
            raw_ts = headers.get("warc-date")
            if raw_ts:
                try:
                    ts = _dt.datetime.fromisoformat(raw_ts.replace("Z", "+00:00"))
                except ValueError:
                    ts = None
            yield dict(
                url=headers.get("warc-target-uri"),
                warc_ts=ts,
                status=status,
                http_headers=http_headers,
                html=html,
            )


def warc_to_pages(archives, content_col: str = "content", with_status: bool = False):
    """DataFrame with a binary WARC column → pages rows
    ``(url, warc_ts, html, text, lang)`` (+ ``status`` when
    ``with_status``, feeding the engine's unexpected-status hook).
    One input row = one archive; record-splitting happens inside the
    task, so a directory of archives fans out across the cluster with
    no shuffle at all."""
    import pandas as pd

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    if with_status:
        schema += ", status int"

    def _records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"] + (
            ["status"] if with_status else []
        )
        for b in batches:
            rows: List[tuple] = []
            for blob in b[content_col]:
                for rec in parse_warc(bytes(blob)):
                    if not rec["url"]:
                        continue
                    html = rec["html"]
                    row = [
                        rec["url"],
                        rec["warc_ts"],
                        html,
                        extract_text(html),
                        rec["http_headers"].get("content-language"),
                    ]
                    if with_status:
                        row.append(rec["status"])
                    rows.append(tuple(row))
            yield pd.DataFrame(rows, columns=cols)

    return archives.select(content_col).mapInPandas(_records, schema=schema)


def read_warc_dir(spark, path: str, with_status: bool = False):
    """Read every ``*.warc`` / ``*.warc.gz`` under ``path`` into pages
    rows — the spark-submit ingestion entry point for CC-style dumps."""
    archives = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )
    return warc_to_pages(archives, with_status=with_status)


# ----------------------------------------------------------------- test aid
def build_warc_bytes(records, compress: bool = False) -> bytes:
    """Serialize (url, ts_iso, status, html_bytes) tuples as a WARC/1.0
    archive (response records with HTTP payloads) — the writer twin of
    ``parse_warc`` for tests and fixtures."""
    out = io.BytesIO()
    for url, ts_iso, status, html in records:
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            "Content-Type: text/html; charset=utf-8\r\n"
            f"Content-Length: {len(html)}\r\n\r\n"
        ).encode() + html
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts_iso}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        out.write(head + http + _CRLF + _CRLF)
    data = out.getvalue()
    return gzip.compress(data) if compress else data
