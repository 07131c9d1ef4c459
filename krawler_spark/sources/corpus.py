"""Deterministic synthetic web corpus — the offline fetch stand-in.

Shape mandated by ``BASELINE.json`` ``input_hint``:
``pages(url, warc_ts, html, text, lang)``. Robots.txt files are ordinary
rows at ``http://host/robots.txt`` so the robots gate exercises the same
join as fetches (FIXTURES.md §1).

The link graph is a hash-chain: page ``j`` on host ``i`` links to
children at arithmetic positions derived from ``(i, j)`` — fully
reproducible in pure Python, so the serial oracle can re-derive the
transitive closure. ``text`` is computed by running the engine's own
``extract_text`` over the generated HTML, which makes the
byte-identical-per-url invariant testable end-to-end.

Host 0 has a robots.txt disallowing the ``/blocked`` segment; host 1
has a malformed robots.txt (colon-less line ⇒ allow-all per
``RoboMinder`` semantics); host 2 has no robots.txt row (fetch error ⇒
allow-all). Host ``n_hosts-1`` is the "hot" host with ``hot_factor``×
the pages (skew-handling tests). Every 7th page is a redirect hop when
``with_redirects`` is set.

Two construction paths share one row builder:

* ``build_pages_local`` — pure Python lists, for unit/equivalence tests.
* ``build_pages_spark`` — ``spark.range`` + ``mapInPandas`` over the
  same builder, for the 500k-page bench corpus (generation itself is
  distributed; nothing funnels through the driver).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator, List, Optional, Tuple

from ..functions.extract import extract_text

__all__ = [
    "host_name",
    "page_url",
    "build_page_row",
    "corpus_layout",
    "build_pages_local",
    "build_pages_spark",
    "default_seeds",
]

_EPOCH = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu ochre umber sable viridian cerulean madder"
).split()


def host_name(i: int, n_hosts: int) -> str:
    if i == n_hosts - 1 and n_hosts > 1:
        return "www.hot-site.com"
    return f"www.site-{i}.com"


def _pages_on_host(i: int, n_hosts: int, pages_per_host: int, hot_factor: int) -> int:
    if i == n_hosts - 1 and n_hosts > 1:
        return pages_per_host * hot_factor
    return pages_per_host


def page_url(host: str, j: int) -> str:
    if j % 17 == 3:
        return f"http://{host}/blocked/{j}.html"
    return f"http://{host}/p/{j}.html"


def _filler(i: int, j: int, n_words: int = 24) -> str:
    # deterministic pseudo-text; some pages share text (near/exact dup tests)
    base = (i * 2654435761 + j * 40503) & 0xFFFFFFFF
    return " ".join(_WORDS[(base + k * 7919) % len(_WORDS)] for k in range(n_words))


def _children(
    i: int, j: int, n_hosts: int, pages_per_host: int, hot_factor: int,
    avg_links: Optional[int] = None,
) -> List[Tuple[str, str]]:
    """(href, style) pairs for page j of host i — arithmetic hash chain.
    ``avg_links=None`` keeps the tiny unit-test graph (2-4 links);
    Common-Crawl-style benches pass ~40."""
    n_here = _pages_on_host(i, n_hosts, pages_per_host, hot_factor)
    if avg_links is None:
        k = 2 + (i + j) % 3  # 2-4 children
    else:
        k = max(2, avg_links - 2 + (i + j) % 5)
    out: List[Tuple[str, str]] = []
    for c in range(k):
        tgt = (j * 7 + 13 * c + 1) % n_here
        if n_hosts > 1 and (j + c) % 5 == 0:
            # cross-host edge
            hi = (i + 1 + c) % n_hosts
            tgt_n = _pages_on_host(hi, n_hosts, pages_per_host, hot_factor)
            out.append((page_url(host_name(hi, n_hosts), tgt % tgt_n), "abs"))
        elif c % 3 == 2:
            out.append((_rel_path(tgt), "rel"))
        else:
            out.append((_abs_path(tgt), "abspath"))
    return out


def _abs_path(j: int) -> str:
    return f"/blocked/{j}.html" if j % 17 == 3 else f"/p/{j}.html"


def _rel_path(j: int) -> str:
    return f"blocked/{j}.html" if j % 17 == 3 else f"p/{j}.html"


def build_page_row(
    i: int,
    j: int,
    n_hosts: int,
    pages_per_host: int,
    hot_factor: int = 10,
    with_redirects: bool = False,
    avg_links: Optional[int] = None,
    n_words: int = 24,
):
    """One pages-table row as a plain tuple matching schemas.PAGES.
    Defaults give the tiny unit-test pages; ``avg_links≈40,
    n_words≈400`` gives Common-Crawl-shaped pages (tens of KB, dozens
    of out-links) for throughput benches."""
    host = host_name(i, n_hosts)
    url = page_url(host, j)
    links = _children(i, j, n_hosts, pages_per_host, hot_factor, avg_links)
    parts = [
        f"<html><head><title>{host} p{j}</title>",
        f'<script src="/app-{j % 5}.js"></script>' if j % 11 == 0 else "",
        "</head><body>",
        f"<h1>Page {j} of {host}</h1>",
        f"<p>{_filler(i, j, n_words)}</p>",
    ]
    for n, (href, _style) in enumerate(links):
        parts.append(f'<a href="{href}">link {n}</a>')
    if j % 13 == 0:
        parts.append('<a href="#top">to top</a>')
        parts.append('<a href="mailto:ops@example.com">mail us</a>')
        parts.append(f'<img src="/img/{j}.png">')
    parts.append("</body></html>")
    html = "".join(parts)
    text = extract_text(html)
    ts = _EPOCH + _dt.timedelta(seconds=int(j) + 100000 * int(i))
    return (url, ts, html.encode("utf-8"), text, "en")


def corpus_layout(n_hosts: int, pages_per_host: int, hot_factor: int = 10):
    """[(host_idx, page_idx)] for the whole corpus."""
    out = []
    for i in range(n_hosts):
        for j in range(_pages_on_host(i, n_hosts, pages_per_host, hot_factor)):
            out.append((i, j))
    return out


def _robots_rows(n_hosts: int):
    rows = []
    ts = _EPOCH
    if n_hosts >= 1:
        h = host_name(0, n_hosts)
        body = "User-Agent: *\nDisallow: /blocked"
        rows.append((f"http://{h}/robots.txt", ts, body.encode(), body, "en"))
    if n_hosts >= 2:
        h = host_name(1, n_hosts)
        body = "User-Agent: *\nthis line has no colon\nDisallow: /blocked"
        rows.append((f"http://{h}/robots.txt", ts, body.encode(), body, "en"))
    # host 2 (and the rest): no robots row at all → fetch error → allow-all
    for i in range(3, n_hosts):
        if i % 2 == 1:
            h = host_name(i, n_hosts)
            body = "User-Agent: *\nDisallow: /blocked"
            rows.append((f"http://{h}/robots.txt", ts, body.encode(), body, "en"))
    return rows


def build_pages_local(
    n_hosts: int = 2,
    pages_per_host: int = 25,
    hot_factor: int = 10,
    avg_links: Optional[int] = None,
    n_words: int = 24,
) -> list:
    """Pure-Python corpus rows (url, warc_ts, html, text, lang)."""
    rows = [
        build_page_row(i, j, n_hosts, pages_per_host, hot_factor,
                       avg_links=avg_links, n_words=n_words)
        for i, j in corpus_layout(n_hosts, pages_per_host, hot_factor)
    ]
    rows.extend(_robots_rows(n_hosts))
    return rows


def build_pages_spark(
    spark,
    n_hosts: int,
    pages_per_host: int,
    hot_factor: int = 10,
    partitions: Optional[int] = None,
    avg_links: Optional[int] = None,
    n_words: int = 24,
):
    """Distributed corpus generation: one Spark task per slice of the
    (host, page) layout; the driver never materializes page HTML."""
    import pandas as pd
    from pyspark.sql import functions as F

    from ..schemas import PAGES

    n_hot = pages_per_host * hot_factor if n_hosts > 1 else pages_per_host
    total = (n_hosts - 1) * pages_per_host + n_hot if n_hosts > 1 else pages_per_host
    parts = partitions or spark.sparkContext.defaultParallelism * 2

    idx = spark.range(0, total, 1, parts).withColumnRenamed("id", "k")

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for k in b["k"]:
                k = int(k)
                if k < (n_hosts - 1) * pages_per_host:
                    i, j = divmod(k, pages_per_host)
                else:
                    i = n_hosts - 1
                    j = k - (n_hosts - 1) * pages_per_host
                rows.append(build_page_row(i, j, n_hosts, pages_per_host, hot_factor,
                                           avg_links=avg_links, n_words=n_words))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    pages = idx.mapInPandas(_gen, schema=PAGES)
    robots = spark.createDataFrame(_robots_rows(n_hosts), PAGES)
    return pages.unionByName(robots)


def default_seeds(n_hosts: int) -> List[str]:
    """One seed per distinct host archetype: robots-gated, malformed-
    robots, robots-less (and the hot host when present)."""
    seeds = [f"http://{host_name(0, n_hosts)}/p/0.html"]
    if n_hosts >= 2:
        seeds.append(f"http://{host_name(1, n_hosts)}/p/0.html")
    if n_hosts >= 3:
        seeds.append(f"http://{host_name(2, n_hosts)}/p/0.html")
    if n_hosts > 3:
        seeds.append(f"http://{host_name(n_hosts - 1, n_hosts)}/p/0.html")
    return seeds
