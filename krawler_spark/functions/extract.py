"""HTML link + text extraction — the engine's harvest stage.

Reference behavior being matched:

* ``http/KrawlDocument.kt:77-81`` — ``anchorTags``: every ``<a>``
  element carrying an ``href`` attribute, in document order.
* ``http/KrawlDocument.kt:86-89`` — ``otherOutgoingLinks``: the ``src``
  attribute value of *every* element that has one, in document order.
* ``crawler/Krawler.kt:460-481`` — harvest filters: anchors drop
  ``#``-prefixed and >2048-char hrefs and invalid/blank canonical
  forms; src links drop only ``#``-prefixed and >2048-char values (no
  validity filter — a reference quirk kept intact); children are
  enqueued at ``depth+1``.
* anchor attribute keys are lowercased (``http/KrawlUrl.kt:62``);
  boolean attributes get ``""`` values (Jsoup behavior).

Extraction runs as pure Python over one HTML string; the Spark layer
always calls the pandas batch wrappers at the bottom (Arrow batches in,
pandas out — no per-row Python at the JVM boundary).

Text extraction contract: whitespace-normalized visible text
(script/style/template excluded, entities unescaped, tokens joined by
single spaces). The synthetic corpus stores this exact string in
``pages.text``, making the byte-identical-per-url invariant testable.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Optional, Tuple

from .kanon import parse_url

__all__ = [
    "Link",
    "extract_links",
    "extract_hrefs",
    "extract_text",
    "harvest_links",
    "extract_links_frame",
    "extract_text_series",
]

_SKIP_TEXT_TAGS = frozenset({"script", "style", "template"})

# Tags rendered as block-level: Jsoup inserts whitespace between their
# text runs; with our normalize-then-join contract any whitespace
# collapses to a single space, so emitting a separator token suffices.
_VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
})


class Link:
    __slots__ = ("href", "text", "attrs", "kind")

    def __init__(self, href: str, text: Optional[str], attrs: Optional[dict], kind: str):
        self.href = href
        self.text = text
        self.attrs = attrs
        self.kind = kind

    def __repr__(self):  # pragma: no cover
        return f"Link({self.kind}:{self.href!r})"


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.anchors: List[Link] = []
        self.srcs: List[str] = []
        self.text_parts: List[str] = []
        self._skip_depth = 0
        # stack of (attrs, text_parts) for open <a> elements
        self._open_anchors: List[Tuple[dict, List[str]]] = []

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _attr_dict(attrs) -> dict:
        out = {}
        for k, v in attrs:
            k = k.lower()
            if k not in out:  # first occurrence wins, like Jsoup
                out[k] = v if v is not None else ""
        return out

    def _handle_tag_open(self, tag, attrs):
        ad = self._attr_dict(attrs)
        if "src" in ad:
            self.srcs.append(ad["src"])
        if tag == "a":
            if "href" in ad:
                self._open_anchors.append((ad, []))
            else:
                self._open_anchors.append((None, []))  # track for close matching
        if tag in _SKIP_TEXT_TAGS:
            self._skip_depth += 1

    # -- HTMLParser hooks ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        self._handle_tag_open(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        ad = self._attr_dict(attrs)
        if "src" in ad:
            self.srcs.append(ad["src"])
        if tag == "a" and "href" in ad:
            self.anchors.append(Link(ad["href"], "", ad, "anchor"))

    def handle_endtag(self, tag):
        if tag in _SKIP_TEXT_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "a" and self._open_anchors:
            ad, parts = self._open_anchors.pop()
            if ad is not None:
                text = " ".join(" ".join(parts).split())
                self.anchors.append(Link(ad["href"], text, ad, "anchor"))

    def handle_data(self, data):
        if self._skip_depth:
            return
        if data:
            self.text_parts.append(data)
            for _, parts in self._open_anchors:
                parts.append(data)

    def close(self):
        super().close()
        # unclosed <a> elements still count (parser-repair behavior)
        while self._open_anchors:
            ad, parts = self._open_anchors.pop()
            if ad is not None:
                text = " ".join(" ".join(parts).split())
                self.anchors.append(Link(ad["href"], text, ad, "anchor"))


def _parse_html(html) -> _Extractor:
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    return ex


# ---------------------------------------------------------------------------
# Fast link scanner (the harvest hot path)
#
# html.parser's tokenizer costs ~0.45 ms on a typical 3.5 KB corpus page
# — with ~40 links/page that is the single largest python cost of the
# engine's harvest stage (measured: ~70% of the per-page python time).
# The scanner below handles the common well-formed subset with a couple
# of compiled regexes and BAILS OUT (returns None → full HTMLParser)
# whenever the page contains any construct whose semantics the regex
# cannot reproduce: comments, script/style/template elements (their
# content is not markup), CDATA/conditional sections, processing
# instructions/doctypes mid-page, tags the tolerant tokenizer would
# accept but the strict pattern does not, attribute soup it cannot
# consume exactly, or a bare "<" that is not a tag start. The fallback
# gate is checked byte-for-byte by tests/test_extract.py's fast-vs-
# parser property test. Semantics replicated from _Extractor: anchors
# appended at their END tag (document close order, unclosed reversed at
# EOF), startend anchors immediately with text "", src collected at
# every start/startend tag, duplicate attrs first-wins, names
# lowercased, values entity-unescaped, anchor text = whitespace-
# normalized data of all chunks inside the element.
# ---------------------------------------------------------------------------

_FAST_GATE_BAD = ("<!", "<?", "<script", "<style", "<template")
_FAST_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9:._-]*)"
    r"((?:\s+[^\s/=><]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s><]*))?)*)"
    r"\s*(/?)>"
)
_FAST_ATTR = re.compile(
    r"\s+([^\s/=><]+)(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s><]*))?"
)


def _fast_links(s: str) -> Optional[List[Link]]:
    # NOTE: _fast_hrefs below is this scanner's collect-nothing twin —
    # any change to the gate, tokenizer or bail conditions here must be
    # mirrored there (the fuzz test asserts output AND bail parity).
    from html import unescape as _unesc

    low = s.lower()
    for bad in _FAST_GATE_BAD:
        if bad in low:
            return None
    anchors: List[Link] = []
    srcs: List[str] = []
    open_anchors: List[Tuple[Optional[dict], List[str]]] = []
    pos = 0
    n = len(s)
    while True:
        lt = s.find("<", pos)
        end = lt if lt != -1 else n
        if open_anchors and end > pos:
            chunk = s[pos:end]
            if "&" in chunk:
                chunk = _unesc(chunk)
            for _, parts in open_anchors:
                parts.append(chunk)
        if lt == -1:
            break
        m = _FAST_TAG.match(s, lt)
        if m is None:
            return None  # exotic construct → full parser
        closing, name, attrstr, selfclose = m.groups()
        name = name.lower()
        if name in _SKIP_TEXT_TAGS:
            return None  # content-skipping element → full parser
        if closing:
            if name == "a" and open_anchors:
                ad, parts = open_anchors.pop()
                if ad is not None:
                    text = " ".join(" ".join(parts).split())
                    anchors.append(Link(ad["href"], text, ad, "anchor"))
        else:
            ad: dict = {}
            apos = 0
            for am in _FAST_ATTR.finditer(attrstr):
                if am.start() != apos:
                    return None  # unconsumed attr soup → full parser
                apos = am.end()
                k = am.group(1).lower()
                v = am.group(2)
                if v is None:
                    v = ""
                else:
                    if v[:1] in "\"'":
                        if len(v) < 2 or v[-1] != v[0]:
                            return None  # unterminated quote
                        v = v[1:-1]
                    if "&" in v:
                        v = _unesc(v)
                if k not in ad:
                    ad[k] = v
            if attrstr[apos:].strip():
                return None
            if "src" in ad:
                srcs.append(ad["src"])
            if name == "a":
                if selfclose:
                    if "href" in ad:
                        anchors.append(Link(ad["href"], "", ad, "anchor"))
                else:
                    open_anchors.append((ad if "href" in ad else None, []))
        pos = m.end()
    while open_anchors:
        ad, parts = open_anchors.pop()
        if ad is not None:
            text = " ".join(" ".join(parts).split())
            anchors.append(Link(ad["href"], text, ad, "anchor"))
    return anchors + [Link(x, None, None, "src") for x in srcs]


def extract_links(html) -> List[Link]:
    """All outgoing links of a page: anchors (with text + attrs) in
    document order followed by src links, mirroring the harvest order of
    ``Krawler.kt:460-481``. Well-formed pages take the fast scanner;
    anything it cannot reproduce byte-identically falls back to the
    full tolerant parser."""
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    fast = _fast_links(html)
    if fast is not None:
        return fast
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    return ex.anchors + [Link(s, None, None, "src") for s in ex.srcs]


def _fast_hrefs(s: str) -> Optional[List[Tuple[str, str]]]:
    """(href, kind) pairs via the fast scanner, skipping anchor-text
    assembly and Link construction — the engine's harvest uses only
    href + kind. Same tokenization, attribute handling, ordering and
    BAIL-OUT conditions as ``_fast_links`` (the bail gates depend only
    on markup structure, never on what is collected); equality with
    ``extract_links`` is fuzz-pinned by
    ``test_extract.py::test_extract_hrefs_matches_extract_links``."""
    from html import unescape as _unesc

    low = s.lower()
    for bad in _FAST_GATE_BAD:
        if bad in low:
            return None
    anchors: List[str] = []
    srcs: List[str] = []
    open_anchors: List[Optional[str]] = []  # href of each open <a>, or None
    pos = 0
    while True:
        lt = s.find("<", pos)
        if lt == -1:
            break
        m = _FAST_TAG.match(s, lt)
        if m is None:
            return None  # exotic construct → full parser
        closing, name, attrstr, selfclose = m.groups()
        name = name.lower()
        if name in _SKIP_TEXT_TAGS:
            return None  # content-skipping element → full parser
        if closing:
            if name == "a" and open_anchors:
                href = open_anchors.pop()
                if href is not None:
                    anchors.append(href)
        else:
            ad: dict = {}
            apos = 0
            for am in _FAST_ATTR.finditer(attrstr):
                if am.start() != apos:
                    return None  # unconsumed attr soup → full parser
                apos = am.end()
                k = am.group(1).lower()
                v = am.group(2)
                if v is None:
                    v = ""
                else:
                    if v[:1] in "\"'":
                        if len(v) < 2 or v[-1] != v[0]:
                            return None  # unterminated quote
                        v = v[1:-1]
                    if "&" in v:
                        v = _unesc(v)
                if k not in ad:
                    ad[k] = v
            if attrstr[apos:].strip():
                return None
            if "src" in ad:
                srcs.append(ad["src"])
            if name == "a":
                if selfclose:
                    if "href" in ad:
                        anchors.append(ad["href"])
                else:
                    open_anchors.append(ad.get("href"))
        pos = m.end()
    while open_anchors:
        href = open_anchors.pop()
        if href is not None:
            anchors.append(href)
    return [(h, "anchor") for h in anchors] + [(x, "src") for x in srcs]


def extract_hrefs(html) -> List[Tuple[str, str]]:
    """(href, kind) pairs in exactly ``extract_links`` order — the
    harvest hot path, which never reads anchor text or attrs. Falls back
    to the full tolerant parser on anything the fast scanner bails on."""
    if html is None:
        html = ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    fast = _fast_hrefs(html)
    if fast is not None:
        return fast
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    return [(a.href, "anchor") for a in ex.anchors] + [(s, "src") for s in ex.srcs]


def extract_text(html) -> str:
    """Whitespace-normalized visible text of a page."""
    ex = _parse_html(html)
    return " ".join(" ".join(ex.text_parts).split())


def harvest_links(html, page_url: str) -> List[dict]:
    """Harvest-stage output for one page: canonicalized out-links after
    the reference's filters (Krawler.kt:460-481). Redirect handling and
    depth/priority assignment happen in the engine, which owns those
    columns."""
    page = parse_url(page_url)
    out: List[dict] = []
    for link in extract_links(html):
        href = link.href
        if href.startswith("#") or len(href) > 2048:
            continue
        # string-based KrawlUrl.new(href, url) like the reference's
        # harvestLinks (Krawler.kt:466): anchor attrs are metadata only
        # and never reach the canonicalizer, so the rel=canonical
        # raw-URL passthrough (KrawlUrl.kt:317-320) cannot leak an
        # unresolved href into the frontier.
        child = parse_url(href, page)
        canonical = child.canonical
        if link.kind == "anchor":
            # anchors: validity + non-blank canonical filter (:467)
            if canonical == "http:///" or not canonical.strip():
                continue
        out.append(
            {
                "out_url": canonical,
                "kind": link.kind,
                "anchor_text": link.text,
                "host": child.host,
            }
        )
    return out


# ---------------------------------------------------------------------------
# Arrow-vectorized batch wrappers
# ---------------------------------------------------------------------------

def extract_links_frame(urls, htmls):
    """pd.Series[url], pd.Series[html] → pd.DataFrame(url, out_url, kind,
    anchor_text, host) — one row per harvested link (pre-exploded)."""
    import pandas as pd

    rows = []
    for u, h in zip(urls, htmls):
        if not isinstance(u, str):
            continue
        for d in harvest_links(h, u):
            rows.append((u, d["out_url"], d["kind"], d["anchor_text"], d["host"]))
    return pd.DataFrame(rows, columns=["url", "out_url", "kind", "anchor_text", "host"])


def extract_text_series(htmls):
    """pd.Series[html(binary|str)] → pd.Series[str] extracted text."""
    import pandas as pd

    return pd.Series([extract_text(h) for h in htmls], index=htmls.index, dtype="object")
