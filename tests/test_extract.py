"""Ported extraction goldens: KrawlDocumentTest.kt:100-115 and
KrawlerTest.kt testHarvestLinks (:130-138)."""

import pandas as pd

from krawler_spark.functions.extract import (
    extract_links,
    extract_links_frame,
    extract_text,
    extract_text_series,
    harvest_links,
)

DOC_HTML = (
    "<html><head><title>ABC</title></head>"
    "<body><a href='http://www.google.com' rel='canonical'>ABC LINK</a></body>"
    '<img src="/foo.html" /></html>'
)

HARVEST_HTML = (
    "<html><head><title>Test</title></head><body>"
    '<div><a href="http://www.testone.com">Test One</a>'
    '<img src="imgone.jpg" /></div></body></html>'
)


def test_anchor_tags():  # KrawlDocumentTest.kt:100-110
    anchors = [l for l in extract_links(DOC_HTML) if l.kind == "anchor"]
    assert len(anchors) == 1
    assert anchors[0].href == "http://www.google.com"
    assert anchors[0].text == "ABC LINK"
    assert anchors[0].attrs == {"href": "http://www.google.com", "rel": "canonical"}
    assert extract_links("") == []
    assert [l for l in extract_links("<html><body>404 Not Found!</body></html>")] == []


def test_other_outgoing_links():  # KrawlDocumentTest.kt:112-115
    srcs = [l.href for l in extract_links(DOC_HTML) if l.kind == "src"]
    assert srcs == ["/foo.html"]


def test_harvest_links_golden():  # KrawlerTest.kt:130-138
    links = harvest_links(HARVEST_HTML, "http://www.example.org")
    urls = [l["out_url"] for l in links]
    assert len(links) == 2
    assert "http://www.testone.com/" in urls
    assert "http://www.example.org/imgone.jpg" in urls


def test_harvest_filters():
    html = (
        '<a href="#frag">skip</a>'
        '<a href="' + "x" * 3000 + '">too long</a>'
        '<a href="mailto:a@b.com">invalid scheme</a>'
        '<a href="/ok">fine</a>'
        '<img src="#alsoskip"><script src="s.js"></script>'
    )
    links = harvest_links(html, "http://h.example.com/base/")
    urls = [(l["kind"], l["out_url"]) for l in links]
    # anchors: #, >2048, invalid all dropped; src: only # dropped
    assert ("anchor", "http://h.example.com/ok") in urls
    assert ("src", "http://h.example.com/s.js") in urls
    assert len(urls) == 2


def test_relative_src_resolution():
    links = harvest_links('<img src="imgone.jpg">', "http://www.example.org/dir/page.html")
    # reference resolves relative refs against the parent *host*, not the
    # parent directory (KrawlUrl.kt:189-195 adds a leading slash)
    assert links[0]["out_url"] == "http://www.example.org/imgone.jpg"


def test_extract_text_normalizes_whitespace():
    html = "<html><head><script>var x=1;</script></head><body><h1>Title</h1>\n  <p>Hello   <b>world</b></p></body></html>"
    assert extract_text(html) == "Title Hello world"
    assert extract_text(None) == ""
    assert extract_text(b"<p>from bytes</p>") == "from bytes"


def test_batch_wrappers():
    urls = pd.Series(["http://www.example.org", "http://other.example.com/"])
    htmls = pd.Series([HARVEST_HTML, DOC_HTML])
    frame = extract_links_frame(urls, htmls)
    assert len(frame) == 4
    assert set(frame.columns) == {"url", "out_url", "kind", "anchor_text", "host"}
    texts = extract_text_series(htmls)
    assert texts[0] == "Test Test One"


# ---------------------------------------------------------------------------
# Fast-scanner equivalence (r6 optimization: _fast_links is the harvest
# hot path; it must be byte-identical to the tolerant parser on every
# page it accepts, and must REFUSE anything it cannot reproduce).
# ---------------------------------------------------------------------------

def _parser_links(html):
    from krawler_spark.functions.extract import Link, _Extractor

    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    ex = _Extractor()
    ex.feed(html)
    ex.close()
    return ex.anchors + [Link(s, None, None, "src") for s in ex.srcs]


def _links_sig(links):
    return [(l.kind, l.href, l.text, l.attrs) for l in links]


def _assert_fast_matches(html):
    from krawler_spark.functions.extract import _fast_links

    fast = _fast_links(html if isinstance(html, str) else bytes(html).decode(
        "utf-8", errors="replace"))
    if fast is None:
        return "fallback"
    assert _links_sig(fast) == _links_sig(_parser_links(html)), html[:200]
    return "fast"


def test_fast_scanner_matches_parser_on_corpus_pages():
    from krawler_spark.sources.corpus import build_page_row

    n_fast = 0
    for i in range(80):
        row = build_page_row(i % 7, i // 7, 7, 40, avg_links=12, n_words=30,
                             with_redirects=(i % 3 == 0))
        html = row[2]
        if html is None:
            continue
        if _assert_fast_matches(html) == "fast":
            n_fast += 1
    assert n_fast >= 60  # the corpus is the fast path's design target


def test_fast_scanner_matches_parser_on_goldens_and_edges():
    cases = [
        DOC_HTML,
        HARVEST_HTML,
        # entity in href + data, uppercase tags, duplicate attrs
        '<A HREF="/a?x=1&amp;y=2" href="/dup">A &amp; B</A>',
        # startend anchor, valueless attr, unquoted value
        '<a href=/x disabled/><a href=/y>t</a>',
        # nested + unclosed anchors (close-order semantics)
        '<a href="/outer">o<a href="/inner">i</a>tail',
        # src on arbitrary tags, quoted > inside attr value
        '<img src="/i.png"><div src=\'/d\'></div><a href="/q>g">x</a>',
        # no links at all, bare text
        "plain text only",
        "",
    ]
    for html in cases:
        _assert_fast_matches(html)


def test_fast_scanner_falls_back_on_ambiguous_constructs():
    from krawler_spark.functions.extract import _fast_links

    for html in [
        "<!-- <a href='/c'>x</a> -->",
        "<script>var a = '<a href=/s>';</script>",
        "<style>a{}</style><a href='/x'>y</a>",
        "<template><a href='/t'>z</a></template>",
        "<!DOCTYPE html><a href='/d'>w</a>",
        "<?php echo 1 ?><a href='/p'>v</a>",
        "<![CDATA[<a href='/cd'>u</a>]]>",
        "data with bare < then <a href='/b'>t</a>",
        "<a href='unterminated>x</a>",
        "<a href=\"x\" <bad>>y</a>",
    ]:
        assert _fast_links(html) is None, html
        # and extract_links still answers via the parser
        extract_links(html)


def test_fast_scanner_fuzz_vs_parser():
    import random

    from krawler_spark.functions.extract import _fast_links

    rng = random.Random(13)
    frags = [
        "<a href='/p{i}'>t{i}</a>", "<a href=/u{i}>", "</a>", "text {i} ",
        "<img src='/s{i}.png'>", "<br/>", "<div class=c{i}>", "</div>",
        "&amp; {i}", "<a href=\"http://h{i}.com/x?a=1&amp;b=2\">l</a>",
        "<span data-x='{i}'>s</span>", "<a name=n{i}>anon</a>",
    ]
    n_fast = 0
    for trial in range(200):
        html = "".join(
            rng.choice(frags).replace("{i}", str(rng.randrange(50)))
            for _ in range(rng.randrange(1, 25))
        )
        fast = _fast_links(html)
        if fast is None:
            continue
        n_fast += 1
        assert _links_sig(fast) == _links_sig(_parser_links(html)), html
    assert n_fast >= 150


def test_extract_hrefs_matches_extract_links():
    """extract_hrefs (the harvest hot path) must return exactly
    [(l.href, l.kind) for l in extract_links(h)] — corpus pages, golden
    /edge cases, fallback triggers, and a seeded fuzz sweep."""
    import random

    from krawler_spark.functions.extract import (
        _fast_hrefs, extract_hrefs, extract_links)
    from krawler_spark.sources.corpus import build_page_row

    def check(html):
        assert extract_hrefs(html) == [
            (l.href, l.kind) for l in extract_links(html)], str(html)[:200]

    for i in range(80):
        row = build_page_row(i % 7, i // 7, 7, 40, avg_links=12, n_words=30,
                             with_redirects=(i % 3 == 0))
        if row[2] is not None:
            check(row[2])

    cases = [
        DOC_HTML, HARVEST_HTML, None, "", b"<a href='/b'>bytes</a>",
        '<A HREF="/a?x=1&amp;y=2" href="/dup">A &amp; B</A>',
        '<a href=/x disabled/><a href=/y>t</a>',
        '<a href="/outer">o<a href="/inner">i</a>tail',
        '<img src="/i.png"><div src=\'/d\'></div><a href="/q>g">x</a>',
        "plain text only",
        # fallback triggers: both paths must agree THROUGH the parser too
        "<!-- <a href='/c'>x</a> -->",
        "<script>var a = '<a href=/s>';</script>",
        "<style>a{}</style><a href='/x'>y</a>",
        "<!DOCTYPE html><a href='/d'>w</a>",
        "data with bare < then <a href='/b'>t</a>",
        "<a href='unterminated>x</a>",
        '<a name="no-href">t</a><a href="/h">u</a>',
    ]
    for html in cases:
        check(html)

    # the two fast scanners must also bail on exactly the same inputs
    from krawler_spark.functions.extract import _fast_links

    rng = random.Random(13)
    frags = [
        "<a href='/p{i}'>t{i}</a>", "<a href=/u{i}>", "</a>", "text {i} ",
        "<img src='/s{i}.png'>", "<br/>", "<div class=c{i}>", "</div>",
        "&amp; {i}", "<a href=\"http://h{i}.com/x?a=1&amp;b=2\">l</a>",
        "<span data-x='{i}'>s</span>", "<a name=n{i}>anon</a>",
        "<script>x</script>", "<!--c-->", "< bare",
    ]
    for trial in range(300):
        html = "".join(
            rng.choice(frags).replace("{i}", str(rng.randrange(50)))
            for _ in range(rng.randrange(1, 25))
        )
        assert (_fast_hrefs(html) is None) == (_fast_links(html) is None), html
        check(html)
