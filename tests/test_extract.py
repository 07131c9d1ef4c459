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
