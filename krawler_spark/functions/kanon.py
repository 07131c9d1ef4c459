"""URL canonicalization — byte-compatible with the reference parser.

Reference semantics: ``http/KrawlUrl.kt:66-291`` (single-pass parse +
normalize state machine), quirks included:

* space anywhere before the path portion ⇒ invalid URL
  (``KrawlUrl.kt:98-100``); spaces inside the path become ``%20``
  (``:203-207``).
* scheme must be http/https; ``mailto javascript tel file data irc ftp``
  are blacklisted ⇒ invalid; any other scheme token aborts scheme
  detection and the whole string is treated as a relative path
  (``:103-118``).
* a run of slashes after ``scheme:`` collapses to exactly two
  (``:121-131``).
* ``//host`` with a parent inherits the parent scheme (``:156-159``) —
  and, faithfully to the reference, captures ``"/"`` as the host.
* host is lowercased and an embedded ``:port`` is stripped
  (``:163-166``) — but only when a ``/`` terminates the host; a
  hostless-path absolute URL keeps raw case (``:186-188``).
* default ports: http→80, https→443 (``:274-277``).
* unreserved %-octets (ALPHA / DIGIT / ``- . _ ~``) are decoded, all
  other %-octets are uppercased (``:209-245``) — the uppercase branch
  compares against the *raw url* length, not the path length
  (``:238``), a reference quirk preserved here.
* ``/./`` drops two chars, ``/..`` drops three chars *without*
  removing the preceding segment (``:247-267``).
* no host and no scheme ⇒ host from parent, path gets a leading slash
  (``:189-195``).
* ``rel=canonical`` anchors keep their raw URL as the canonical form
  (``:317-320``).

Public-suffix split per ``KrawlUrl.kt:300-310`` (Guava
InternetDomainName): ``suffix`` is the public suffix, ``domain`` is
``host.replace("."+suffix, "").split(".")[-1] + "." + suffix``, and
``subdomain`` is ``host.replace("."+domain, "")`` — including the
degenerate all-dots-removed behavior when the suffix is unknown.

Spark integration: everything here is plain Python over strings; the
pandas/Arrow vectorized wrappers live at the bottom (`canonicalize_udf`
etc.) so the engine never runs per-row Python at the Spark layer —
batches arrive as Arrow arrays and are mapped with pandas.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Optional

__all__ = [
    "ParsedUrl",
    "INVALID",
    "parse_url",
    "canonical_form",
    "split_domain",
    "canonicalize_series",
    "parse_struct_frame",
]

# Unreserved octets that get %-decoded: ALPHA / DIGIT / - . _ ~
_UNRESERVED = frozenset(
    list(range(0x41, 0x5B)) + list(range(0x61, 0x7B)) + list(range(0x30, 0x3A))
    + [0x2D, 0x2E, 0x5F, 0x7E]
)

_SCHEME_BLACKLIST = frozenset({"mailto", "javascript", "tel", "file", "data", "irc", "ftp"})
_SCHEME_RE = re.compile(r"[A-Za-z][\w+\-.]*\Z")
_HEX2_RE = re.compile(r"[0-9a-fA-F]{2}\Z")
_PORT_IN_HOST_RE = re.compile(r":[0-9]+")


@dataclass(frozen=True)
class ParsedUrl:
    raw_url: str
    is_absolute: bool = False
    scheme: str = "http"
    host: str = ""
    port: int = 0
    path: str = ""
    anchor_text: Optional[str] = None
    anchor_attrs: Optional[dict] = None
    from_anchor: bool = False

    @property
    def normal_form(self) -> str:
        # KrawlUrl.kt:294
        if self.host + self.path == "":
            return ""
        return f"{self.scheme}://{self.host}{self.path}"

    @property
    def hierarchical_part(self) -> str:
        # KrawlUrl.kt:296
        return f"{self.scheme}://{self.host}"

    @property
    def canonical(self) -> str:
        # KrawlUrl.kt:317-320 — rel=canonical anchors pass through raw.
        if (
            self.anchor_attrs is not None
            and self.anchor_attrs.get("rel") == "canonical"
        ):
            return self.raw_url
        return self.normal_form

    @property
    def is_valid(self) -> bool:
        return self is not INVALID and not (self.raw_url == "" and self.host == "")


# The reference's InvalidKrawlUrl is KrawlUrl.new("", null): empty raw,
# host from absent parent = "", path "/" per the no-host no-absolute arm.
INVALID = ParsedUrl(raw_url="", is_absolute=False, scheme="http", host="", port=80, path="/")


def parse_url(
    url: str,
    parent: Optional[ParsedUrl] = None,
    *,
    from_anchor: bool = False,
    anchor_text: Optional[str] = None,
    anchor_attrs: Optional[dict] = None,
) -> ParsedUrl:
    """Single-pass parse + normalize; mirrors KrawlUrl.kt:66-291."""
    host = ""
    port = 0
    path = url
    scheme = "http"
    is_absolute = False

    n = len(url)
    idx = 0
    host_start = 0
    non_host_slash_seen = False
    host_found = False
    first_colon_found = False

    # --- pass 1: scheme / host / port ------------------------------------
    while idx < n:
        c = url[idx]

        if c == " ":
            return INVALID

        if c == ":":
            if not non_host_slash_seen and not first_colon_found:
                first_colon_found = True
                slice_ = url[:idx].lower()
                if _SCHEME_RE.match(slice_) and slice_ in ("http", "https"):
                    scheme = slice_
                elif slice_ in _SCHEME_BLACKLIST:
                    return INVALID
                else:
                    break  # unknown scheme token → whole string is a path

                if idx + 2 < n and url[idx + 1] == "/" and url[idx + 2] == "/":
                    is_absolute = True
                    k = 3
                    while idx + k < n and url[idx + k] == "/":
                        k += 1
                    idx += k
                    host_start = idx
                    continue
            if not non_host_slash_seen and not host_found and first_colon_found:
                # port digits after the colon
                k = 1
                while idx + k < n and url[idx + k].isdigit():
                    k += 1
                digits = url[idx + 1 : idx + k]
                if digits.strip():
                    port = int(digits)
                idx += k
                continue

        if c == "/":
            if idx == 1 and url[0] == "/" and parent is not None:
                scheme = parent.scheme
                is_absolute = True
            if is_absolute:
                host = _PORT_IN_HOST_RE.sub("", url[host_start:idx].lower())
                host_found = True
                path = url[idx:]
                break
            non_host_slash_seen = True

        idx += 1

    if not host_found and is_absolute:
        # hostless-path absolute URL: raw-case host, no port strip (:186-188)
        host = url[host_start:]
        path = "/"
    elif not host_found and not is_absolute:
        host = parent.host if parent is not None else ""
        if not path.startswith("/"):
            path = "/" + path

    # --- pass 2: path normalization ---------------------------------------
    idx = 0
    while idx < len(path):
        c = path[idx]

        if c == " ":
            path = path[:idx] + "%20" + path[idx + 1 :]
            idx += 3
            continue

        if c == "%":
            if idx + 1 >= len(path):
                idx += 1
                continue
            if idx + 2 >= len(path):
                idx += 2
                continue
            next_two = path[idx + 1 : idx + 3]
            if _HEX2_RE.match(next_two):
                octet = int(next_two, 16)
                if octet in _UNRESERVED:
                    if idx + 3 < len(path):
                        path = path[:idx] + chr(octet) + path[idx + 3 :]
                    else:
                        path = path[:idx] + chr(octet)
                    idx += 1
                    continue
            # uppercase the octet; bound vs *raw url* length (reference :238)
            if idx + 3 < n:
                path = path[: idx + 1] + next_two.upper() + path[idx + 3 :]
            else:
                path = path[: idx + 1] + next_two.upper()
            idx += 3
            continue

        if c == "/":
            nxt = (path[idx + 1] if idx + 1 < len(path) else " ") + (
                path[idx + 2] if idx + 2 < len(path) else " "
            )
            if nxt == "./":
                path = path[:idx] + path[idx + 2 :]
                continue
            if nxt == "..":
                if idx + 3 < len(path):
                    path = path[:idx] + path[idx + 3 :]
                else:
                    path = path[:idx]
                continue

        idx += 1

    if port == 0:
        if scheme == "http":
            port = 80
        elif scheme == "https":
            port = 443

    return ParsedUrl(
        raw_url=url,
        is_absolute=is_absolute,
        scheme=scheme,
        host=host,
        port=port,
        path=path,
        anchor_text=anchor_text,
        anchor_attrs=anchor_attrs,
        from_anchor=from_anchor,
    )


def canonical_form(url: str, parent_url: Optional[str] = None) -> str:
    """Canonical form of ``url`` resolved against ``parent_url``."""
    parent = parse_url(parent_url) if parent_url else None
    return parse_url(url, parent).canonical


# ---------------------------------------------------------------------------
# Public-suffix split (KrawlUrl.kt:298-310). Embedded snapshot of the common
# entries of the publicsuffix.org list; vendored for determinism (no network,
# no external package). Multi-label suffixes checked longest-first, matching
# Guava's longest-match behavior for these entries.
# ---------------------------------------------------------------------------

# Full publicsuffix.org data file, vendored verbatim (MPL-2.0) from the
# public artifact at https://publicsuffix.org/list/public_suffix_list.dat
# (same list Guava's InternetDomainName compiles into PublicSuffixPatterns,
# KrawlUrl.kt:300-310). Parsed once per interpreter into exact / wildcard /
# exception rule sets; IDN rules additionally get their punycode twins so
# both unicode and xn-- hosts match.
_PSL_DATA = os.path.join(os.path.dirname(__file__), "data",
                         "public_suffix_list.dat")


def _psl_lines(path):
    """Read the vendored list in a zip-safe way: executors on a real
    cluster import this package from the ``--py-files`` zip, where
    ``__file__`` points inside the archive and ``open()`` would fail —
    importlib.resources resolves through the zip loader."""
    try:
        with open(path, encoding="utf-8") as f:
            return f.read().splitlines()
    except OSError:
        if path != _PSL_DATA:
            raise
        from importlib import resources

        pkg = resources.files(__package__) / "data" / "public_suffix_list.dat"
        return pkg.read_text(encoding="utf-8").splitlines()


def _load_psl(path: str = _PSL_DATA):
    exact, wildcard, exceptions = set(), set(), set()
    for line in _psl_lines(path):
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower()
        if rule.startswith("!"):
            exceptions.add(rule[1:])
        elif rule.startswith("*."):
            wildcard.add(rule[2:])
        elif rule != "*":
            exact.add(rule)

    def _puny(s: str):
        try:
            p = ".".join(
                lbl.encode("idna").decode("ascii") for lbl in s.split(".") if lbl
            )
            return p if p != s else None
        except UnicodeError:
            return None

    for bucket in (exact, wildcard, exceptions):
        for rule in [r for r in bucket if not r.isascii()]:
            p = _puny(rule)
            if p:
                bucket.add(p)
    return frozenset(exact), frozenset(wildcard), frozenset(exceptions)


_PSL_EXACT, _PSL_WILDCARD, _PSL_EXCEPTIONS = _load_psl()


def public_suffix(host: str) -> str:
    """Longest public suffix of host per the publicsuffix.org rules
    (exact, wildcard, exception), or "" when none matches — Guava
    InternetDomainName.publicSuffix() semantics (KrawlUrl.kt:300-310)."""
    if not host or host.startswith(".") or host.endswith("."):
        return ""
    labels = host.lower().split(".")
    for i in range(len(labels)):  # longest candidate first
        cand = ".".join(labels[i:])
        if cand in _PSL_EXCEPTIONS:
            # exception rule: the suffix is the rule minus its left label
            return ".".join(labels[i + 1:])
        if cand in _PSL_EXACT:
            return cand
        if (
            i + 1 < len(labels)
            and ".".join(labels[i + 1:]) in _PSL_WILDCARD
        ):
            return cand
    return ""


def split_domain(host: str) -> tuple[str, str, str]:
    """(suffix, domain, subdomain) per KrawlUrl.kt:308-310, quirks intact:
    ``replace`` removes *all* occurrences, and an unknown suffix degrades
    to the reference's dot-stripping behavior."""
    suffix = public_suffix(host)
    domain = host.replace("." + suffix, "").split(".")[-1] + "." + suffix
    subdomain = host.replace("." + domain, "")
    return suffix, domain, subdomain


# ---------------------------------------------------------------------------
# Harvest fast path: the overwhelming majority of hrefs on real pages are
# plain relative or root-relative paths ("p/1.html", "/a/b") or simple
# absolute links ("http://other.host/x"). For those the full state machine
# reduces to scheme://host + slash-prefixed path, so the hot loop runs a
# couple of C-level string tests + a concat instead of the ~6 µs parser.
# Eligibility is CONSERVATIVE — any character class the state machine
# treats specially (port/extra colons, %-octets, whitespace, dot-segments,
# protocol-relative //, hostless or pathless absolutes, non-lowercase
# scheme spellings) falls back to the exact parser, and
# `test_kanon.py::test_fast_child_canonical_matches_parser` property-checks
# equality against parse_url over generated hrefs + the corpus link shapes.
# ---------------------------------------------------------------------------

_FAST_INELIGIBLE = re.compile(r"[:%\s]|\.\.|\./")


def fast_child_canonical(href: str, page: ParsedUrl):
    """(canonical, host) via the fast path, or None when the href needs
    the full parser. Byte-identical to parse_url(href, page).canonical
    for every href it accepts."""
    if not href:
        return None
    # Simple absolute http(s) URL: "scheme://host/path" where nothing
    # after the scheme needs normalization. The state machine would
    # lowercase the host at the first path slash and leave the path
    # untouched (no %-octets, spaces or dot-segments can be present —
    # _FAST_INELIGIBLE rejects them, and its ":" test also rejects
    # ports / second schemes). Pathless ("http://h") and hostless
    # ("http:///x") absolutes have raw-case quirk arms → full parser.
    if href.startswith("http://"):
        rest = href[7:]
        scheme = "http"
    elif href.startswith("https://"):
        rest = href[8:]
        scheme = "https"
    else:
        rest = None
        scheme = ""
    if rest is not None:
        if _FAST_INELIGIBLE.search(rest):
            return None
        i = rest.find("/")
        if i <= 0:
            return None
        host = rest[:i].lower()
        return f"{scheme}://{host}{rest[i:]}", host
    if not page.host or _FAST_INELIGIBLE.search(href):
        return None
    if href[0] == "/":
        if len(href) > 1 and href[1] == "/":
            return None  # protocol-relative
        path = href
    else:
        path = "/" + href
    # Scheme is the state machine's "http" DEFAULT, not the parent's:
    # parse_url inherits the parent scheme ONLY for protocol-relative
    # "//" hrefs (which bail above), so a relative child of an https
    # page canonicalizes to http:// — a reference quirk kept intact
    # (the previous page.scheme here silently diverged under https
    # parents; pinned by the https-parent cases in test_kanon.py).
    return f"http://{page.host}{path}", page.host

def canonicalize_series(urls, parent_urls=None):
    """pd.Series[str] (+ optional parents) → pd.Series[str] canonical forms."""
    import pandas as pd

    if parent_urls is None:
        return urls.map(lambda u: parse_url(u).canonical if isinstance(u, str) else None)

    parent_cache: dict = {}

    def _canon(u, p):
        if not isinstance(u, str):
            return None
        par = None
        if isinstance(p, str) and p:
            par = parent_cache.get(p)
            if par is None:
                par = parse_url(p)
                parent_cache[p] = par
        return parse_url(u, par).canonical

    return pd.Series(
        [_canon(u, p) for u, p in zip(urls, parent_urls)], index=urls.index, dtype="object"
    )


def parse_struct_frame(urls, parent_urls=None):
    """pd.Series[str] → pd.DataFrame(canonical, scheme, host, port, path,
    domain, subdomain, suffix, valid) — the engine's url-parse stage."""
    import pandas as pd

    parent_cache: dict = {}
    rows = []
    if parent_urls is None:
        parent_urls = pd.Series([None] * len(urls), index=urls.index)
    for u, p in zip(urls, parent_urls):
        if not isinstance(u, str):
            rows.append((None, None, None, None, None, None, None, None, False))
            continue
        par = None
        if isinstance(p, str) and p:
            par = parent_cache.get(p)
            if par is None:
                par = parse_url(p)
                parent_cache[p] = par
        pu = parse_url(u, par)
        # invalidity via VALUE equality with InvalidKrawlUrl's canonical
        # form, like the reference's equals() check (KrawlUrl.kt:312-315)
        # — identity alone misses fresh parses of '' (same degenerate
        # 'http:///' canonical through the no-host no-absolute arm).
        if pu is INVALID or (pu.canonical == INVALID.canonical and not pu.host):
            rows.append((None, None, None, None, None, None, None, None, False))
            continue
        suffix, domain, subdomain = split_domain(pu.host)
        rows.append(
            (pu.canonical, pu.scheme, pu.host, pu.port, pu.path, domain, subdomain, suffix, True)
        )
    return pd.DataFrame(
        rows,
        columns=[
            "canonical", "scheme", "host", "port", "path",
            "domain", "subdomain", "suffix", "valid",
        ],
        index=urls.index,
    )
