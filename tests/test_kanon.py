"""Ported canonicalization goldens from the reference unit suite
(KrawlUrlTest.kt:36-163). Pure-Python — no Spark session needed."""

from krawler_spark.functions.kanon import (
    INVALID,
    canonical_form,
    canonicalize_series,
    parse_struct_frame,
    parse_url,
    split_domain,
)

RAW = "HTTP://www.xyz.ABC.com:80/../%7Ezyxzzy/./abc%3a"


def test_spaces_in_urls():  # KrawlUrlTest.kt:40-44
    assert canonical_form("http://www.google.com/a bc.html") == "http://www.google.com/a%20bc.html"
    assert parse_url("tel:867 5309") is INVALID


def test_hierarchical_part():  # :46-48
    assert parse_url(RAW).hierarchical_part == "http://www.xyz.abc.com"


def test_cleans_excessive_scheme_slashes():  # :50-53
    assert canonical_form("http:////////testexample.com") == "http://testexample.com/"


def test_infer_scheme():  # :56-61
    parent = parse_url("https://somesafesite.com")
    assert parse_url("//something.org", parent).scheme == "https"


def test_parent_host_doesnt_cause_double_slashes():  # :66-70
    parent = parse_url("http://www.example.org/")
    assert parse_url("foo:bar:bas", parent).canonical == "http://www.example.org/foo:bar:bas"


def test_port():  # :72
    assert parse_url(RAW).port == 80


def test_relative_url_with_two_colons():  # :74-78
    u = parse_url("/wiki/foo:bar:bas")
    assert u.scheme == "http"
    assert u.path == "/wiki/foo:bar:bas"


def test_absolute_with_two_colons_and_no_port():  # :80-85
    u = parse_url("http://www.example.org/foo:bar:bas")
    assert u.scheme == "http"
    assert u.port == 80
    assert u.path == "/foo:bar:bas"


def test_url_with_no_path():  # :87-93
    u = parse_url("http://www.example.org")
    assert u.host == "www.example.org"
    assert u.path == "/"
    suffix, domain, subdomain = split_domain(u.host)
    assert domain == "example.org"
    assert subdomain == "www"


def test_url_with_no_host():  # :95-115
    testurl = parse_url(RAW)
    no_host = parse_url("/relative/path", testurl)
    no_host2 = parse_url("relative/path", testurl)
    rel_colon = parse_url("some/directory/Something:SomethingElse", testurl)

    assert no_host.canonical == "http://www.xyz.abc.com/relative/path"
    assert no_host.host == "www.xyz.abc.com"
    assert split_domain(no_host.host)[1] == "abc.com"
    assert no_host.path == "/relative/path"

    assert no_host2.canonical == "http://www.xyz.abc.com/relative/path"
    assert no_host2.path == "/relative/path"

    assert rel_colon.scheme == "http"
    assert rel_colon.host == "www.xyz.abc.com"
    assert rel_colon.path == "/some/directory/Something:SomethingElse"


def test_raw_url():  # :117
    assert parse_url(RAW).raw_url == RAW


def test_canonical_form():  # :119-125
    assert parse_url(RAW).canonical == "http://www.xyz.abc.com/~zyxzzy/abc%3A"
    # rel=canonical anchor keeps rawUrl
    anchor = parse_url(
        "http://www.google.com/./zxyzzy",
        anchor_attrs={"href": "http://www.google.com/./zxyzzy", "rel": "canonical", "target": "blank"},
        anchor_text="Anchor Text",
        from_anchor=True,
    )
    assert anchor.canonical == "http://www.google.com/./zxyzzy"
    assert anchor.anchor_text == "Anchor Text"
    assert anchor.from_anchor


def test_normal_form():  # :128-137
    u = parse_url(RAW)
    assert u.normal_form == "http://www.xyz.abc.com/~zyxzzy/abc%3A"
    assert u.scheme == u.scheme.lower()
    assert u.host == u.host.lower()
    assert "///..//" not in u.normal_form


def test_scheme_suffix_domain_subdomain_path_host():  # :139-149
    u = parse_url(RAW)
    assert u.scheme == "http"
    suffix, domain, subdomain = split_domain(u.host)
    assert suffix == "com"
    assert domain == "abc.com"
    assert subdomain == "www.xyz"
    assert u.path == "/~zyxzzy/abc%3A"
    assert u.host == "www.xyz.abc.com"


def test_invalid_url_canonical_is_sentinel():
    # InvalidKrawlUrl ≡ KrawlUrl.new("", null) → normalForm "http:///"
    assert INVALID.canonical == "http:///"
    # equality in the reference is canonicalForm equality (KrawlUrl.kt:324-332)
    assert parse_url("javascript:void(0)").canonical == "http:///"


def test_blacklist_schemes():
    for s in ("mailto:a@b.com", "javascript:void(0)", "tel:5551212", "ftp://x.com/f"):
        assert parse_url(s) is INVALID


def test_multi_label_suffix():
    suffix, domain, subdomain = split_domain("news.bbc.co.uk")
    assert suffix == "co.uk"
    assert domain == "bbc.co.uk"
    assert subdomain == "news"


def test_vectorized_wrappers_match_scalar():
    import pandas as pd

    urls = pd.Series([RAW, "http://www.google.com/a bc.html", "relative/path", None])
    parents = pd.Series([None, None, RAW, None])
    out = canonicalize_series(urls, parents)
    assert out[0] == "http://www.xyz.abc.com/~zyxzzy/abc%3A"
    assert out[1] == "http://www.google.com/a%20bc.html"
    assert out[2] == "http://www.xyz.abc.com/relative/path"
    assert out[3] is None

    frame = parse_struct_frame(urls, parents)
    assert frame.loc[0, "host"] == "www.xyz.abc.com"
    assert frame.loc[0, "domain"] == "abc.com"
    assert bool(frame.loc[2, "valid"])


def test_fast_child_canonical_matches_parser():
    """The harvest fast path must be byte-identical to parse_url for
    every href it accepts — property-checked over generated hrefs plus
    the corpus link shapes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from krawler_spark.functions.kanon import fast_child_canonical, parse_url

    page = parse_url("http://www.site-3.com/p/7.html")

    fixed = [
        "p/1.html", "/p/2.html", "blocked/3.html", "/blocked/4.html",
        "a/b/c", "x.html", "/", "q?x=1&y=2", "img/5.png", "a#frag",
        "http://other.com/x", "//host/y", "./rel", "../up", "a%20b",
        "has space", "mailto:x@y", "p/./q", "p/../q", "", "a:b",
        # absolute shapes (fast since r6) + their quirk arms (slow)
        "http://host15.test/page_3.html", "https://A.B.Com/Q?x=1&y=2",
        "http://h/", "http://h/a//b", "http://ho?st/x", "http://h#f/x",
        "http://h", "https://h", "http://", "http:///x", "http://h:80/x",
        "HTTP://h/x", "hTtps://h/x", "http://h/a%20b", "http://h/p/../q",
        "http://h/p/./q", "http://h/a b", "http://h/x:y", "http://.../x",
    ]
    for href in fixed:
        fast = fast_child_canonical(href, page)
        if fast is not None:
            child = parse_url(href, page)
            assert fast == (child.canonical, child.host), href

    alphabet = st.sampled_from(list("abz019./:%#?&=_- ~"))

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=0, max_size=24))
    def prop(href):
        fast = fast_child_canonical(href, page)
        if fast is not None:
            child = parse_url(href, page)
            assert fast == (child.canonical, child.host)

    prop()

    # same property over absolute-URL shapes (exercises the r6 fast arm)
    @settings(max_examples=500, deadline=None)
    @given(
        st.sampled_from(["http://", "https://", "HTTP://", "http:/", "http:///"]),
        st.text(alphabet=alphabet, min_size=0, max_size=20),
    )
    def prop_abs(prefix, rest):
        href = prefix + rest
        fast = fast_child_canonical(href, page)
        if fast is not None:
            child = parse_url(href, page)
            assert fast == (child.canonical, child.host), href

    prop_abs()

    # ... and under an https PARENT page: parse_url keeps its "http"
    # scheme default for plain relative hrefs (parent scheme is
    # inherited only by protocol-relative "//", which bails), so the
    # fast path must NOT propagate page.scheme.
    https_page = parse_url("https://secure.example/a/b.html")
    for href in fixed:
        fast = fast_child_canonical(href, https_page)
        if fast is not None:
            child = parse_url(href, https_page)
            assert fast == (child.canonical, child.host), f"https parent: {href}"
    assert fast_child_canonical("x.html", https_page) == (
        "http://secure.example/x.html", "secure.example")

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=alphabet, min_size=0, max_size=24))
    def prop_https_parent(href):
        fast = fast_child_canonical(href, https_page)
        if fast is not None:
            child = parse_url(href, https_page)
            assert fast == (child.canonical, child.host)

    prop_https_parent()


def test_fast_child_canonical_covers_common_shapes():
    from krawler_spark.functions.kanon import fast_child_canonical, parse_url

    page = parse_url("http://www.site-3.com/p/7.html")
    assert fast_child_canonical("p/1.html", page) is not None
    assert fast_child_canonical("/p/2.html", page) is not None
    # simple absolutes are fast since r6 (the corpus's cross-host links)
    assert fast_child_canonical("http://x.com/a", page) is not None
    assert fast_child_canonical("https://X.com/a?b=c", page) is not None
    # quirk arms stay slow: ports, pathless/hostless, %-octets, spaces
    assert fast_child_canonical("http://x.com:80/a", page) is None
    assert fast_child_canonical("http://x.com", page) is None
    assert fast_child_canonical("http:///a", page) is None
    assert fast_child_canonical("http://x.com/a%20b", page) is None
    assert fast_child_canonical("//x.com/a", page) is None
    assert fast_child_canonical("a b", page) is None


def test_child_seq_streaming():
    """The engine's incremental crc32 (prefix hashed once per page,
    ':{li}' continued per link) must equal oracle.child_seq exactly."""
    import zlib

    from krawler_spark.oracle import child_seq

    for url in ["http://h/x", "http://hst.example/päge?q=1", ""]:
        base = zlib.crc32(url.encode("utf-8"))
        for li in [0, 1, 7, 42, 1234567]:
            assert zlib.crc32(b":%d" % li, base) == child_seq(url, li)


def test_full_psl_long_tail():
    """The vendored file is the COMPLETE publicsuffix.org list: suffixes
    absent from the old hand-rolled snapshot must now split like Guava's
    InternetDomainName (KrawlUrl.kt:300-310)."""
    from krawler_spark.functions.kanon import public_suffix, split_domain

    # exact rules from the long tail (ICANN + private sections)
    assert public_suffix("foo.example.com.sl") == "com.sl"
    assert public_suffix("x.ac.mw") == "ac.mw"
    assert public_suffix("b.cdn.prod.atlassian-dev.net") == "cdn.prod.atlassian-dev.net"
    # IDN rule, both punycode and unicode spellings
    assert public_suffix("example.xn--p1ai") == "xn--p1ai"
    assert public_suffix("пример.рф") == "рф"
    # multi-label wildcard rule (*.compute.amazonaws.com)
    assert public_suffix("x.y.compute.amazonaws.com") == "y.compute.amazonaws.com"
    # exception rule: !www.ck carves www.ck out of *.ck
    assert public_suffix("shop.www.ck") == "ck"
    assert split_domain("shop.www.ck") == ("ck", "www.ck", "shop")
    # no-match host keeps the degraded reference behavior
    assert public_suffix("localhost") == ""
