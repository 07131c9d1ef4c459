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

# Vendored snapshot subset of the publicsuffix.org list (ICANN +
# private sections), matching Guava InternetDomainName's longest-match
# + wildcard semantics. APPROXIMATE by construction: the full list has
# ~9k rules; this snapshot carries the high-traffic ones. At deployment
# swap _PSL_EXACT/_PSL_WILDCARD for a load of the full static data file
# — the matching logic below already implements the general rules.
_PSL_MULTI = frozenset({
    # uk / ie
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk", "police.uk", "gov.ie",
    # au / nz
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "ac.nz", "govt.nz", "school.nz", "geek.nz",
    "gen.nz", "kiwi.nz", "maori.nz",
    # jp (+ prefecture style handled by wildcards below where needed)
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp", "gr.jp",
    "lg.jp",
    # americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br", "blog.br",
    "eco.br", "mil.br",
    "com.mx", "org.mx", "gob.mx", "net.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve",
    "com.uy", "net.uy", "org.uy", "gub.uy", "edu.uy",
    "com.ec", "net.ec", "org.ec", "gob.ec",
    "com.bo", "net.bo", "org.bo", "gob.bo",
    "com.py", "net.py", "org.py", "gov.py",
    "com.gt", "com.sv", "com.ni", "com.pa", "com.do", "com.pr",
    "co.cr", "go.cr", "ac.cr", "com.cu",
    "gc.ca",
    # asia
    "co.in", "net.in", "org.in", "gen.in", "firm.in", "ac.in", "edu.in",
    "gov.in", "res.in", "mil.in", "nic.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw", "game.tw",
    "co.kr", "or.kr", "go.kr", "ne.kr", "re.kr", "pe.kr", "ac.kr", "mil.kr",
    "hs.kr", "ms.kr", "es.kr", "sc.kr", "kg.kr", "seoul.kr", "busan.kr",
    "com.sg", "org.sg", "edu.sg", "net.sg", "gov.sg", "per.sg",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    "co.id", "or.id", "ac.id", "go.id", "web.id", "sch.id", "net.id",
    "my.id", "biz.id",
    "co.th", "in.th", "ac.th", "go.th", "or.th", "net.th", "mi.th",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "ngo.ph", "mil.ph",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk", "gok.pk", "gop.pk",
    "com.bd", "net.bd", "org.bd", "edu.bd", "gov.bd",
    "com.np", "net.np", "org.np", "edu.np", "gov.np",
    "com.lk", "org.lk", "edu.lk", "gov.lk",
    "com.kh", "net.kh", "org.kh", "edu.kh", "gov.kh", "per.kh", "mil.kh",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm",
    "ac.ir", "co.ir", "gov.ir", "net.ir", "org.ir",
    "sch.ir", "id.ir",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "sch.sa",
    "com.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.qa", "net.qa", "org.qa", "edu.qa", "gov.qa", "mil.qa",
    "com.kw", "net.kw", "org.kw", "edu.kw", "gov.kw",
    "com.om", "net.om", "org.om", "edu.om", "gov.om",
    "com.bh", "com.jo", "net.jo", "org.jo", "edu.jo", "gov.jo", "mil.jo",
    "com.lb", "net.lb", "org.lb", "edu.lb", "gov.lb",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "sci.eg", "eun.eg",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "idf.il", "k12.il",
    "muni.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr", "k12.tr",
    "av.tr", "bbs.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    "com.kz", "org.kz", "edu.kz", "gov.kz", "mil.kz", "net.kz",
    "com.uz", "co.uz", "net.uz", "org.uz",
    "com.ge", "net.ge", "org.ge", "edu.ge", "gov.ge", "mil.ge", "pvt.ge",
    "com.am", "net.am", "org.am",
    "com.az", "net.az", "org.az", "edu.az", "gov.az", "mil.az",
    # africa
    "co.za", "org.za", "web.za", "net.za", "ac.za", "gov.za", "edu.za",
    "law.za", "mil.za", "nom.za", "school.za",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "me.ke", "mobi.ke",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng", "sch.ng",
    "i.ng", "mobi.ng",
    "co.tz", "or.tz", "ac.tz", "go.tz", "ne.tz", "sc.tz", "mil.tz",
    "co.ug", "or.ug", "ac.ug", "go.ug", "ne.ug", "sc.ug",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.zw", "org.zw", "gov.zw", "ac.zw", "mil.zw",
    "co.zm", "org.zm", "gov.zm", "ac.zm", "sch.zm",
    "co.mz", "org.mz", "gov.mz", "ac.mz", "edu.mz",
    "co.bw", "org.bw",
    "com.na", "org.na", "co.na",
    "co.ao", "ed.ao", "gv.ao", "og.ao", "pb.ao", "it.ao",
    "com.et", "gov.et", "org.et", "edu.et", "net.et", "biz.et", "name.et",
    "info.et",
    "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma", "press.ma",
    "com.tn", "net.tn", "org.tn", "gov.tn", "ens.tn", "fin.tn", "nat.tn",
    "com.dz", "net.dz", "org.dz", "edu.dz", "gov.dz", "pol.dz", "art.dz",
    "com.ly", "net.ly", "org.ly", "edu.ly", "gov.ly", "plc.ly", "sch.ly",
    "id.ly", "med.ly",
    # europe
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.de", "com.se",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "2000.hu", "bolt.hu", "city.hu", "film.hu", "news.hu", "shop.hu",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl", "waw.pl",
    "warszawa.pl", "krakow.pl", "poznan.pl", "wroclaw.pl", "gda.pl",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "com.ru", "net.ru", "org.ru", "pp.ru", "int.ru", "ac.ru", "edu.ru",
    "gov.ru", "mil.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "kyiv.ua", "lviv.ua", "odessa.ua", "kharkov.ua", "dp.ua", "pp.ua",
    "com.by", "net.by", "org.by", "gov.by", "mil.by", "of.by",
    "com.gr", "net.gr", "org.gr", "edu.gr", "gov.gr",
    "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt", "int.pt", "publ.pt",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.it", "edu.it", "gov.it",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "avocat.fr", "aeroport.fr",
    "co.nl", "com.nl", "net.nl",
    "ac.be", "co.no", "priv.no",
    "com.ch", "net.ch", "org.ch", "gov.ch",
    "co.dk", "biz.dk",
    "com.mt", "net.mt", "org.mt", "edu.mt", "gov.mt",
    "com.cy", "net.cy", "org.cy", "ac.cy", "gov.cy", "biz.cy", "pro.cy",
    "name.cy", "press.cy", "tm.cy",
    "com.mk", "org.mk", "net.mk", "edu.mk", "gov.mk", "inf.mk", "name.mk",
    "com.al", "net.al", "org.al", "edu.al", "gov.al", "mil.al",
    "co.rs", "org.rs", "edu.rs", "in.rs", "gov.rs", "ac.rs",
    "com.ba", "net.ba", "org.ba", "edu.ba", "gov.ba", "mil.ba",
    "com.hr", "from.hr", "iz.hr", "name.hr",
    "co.me", "net.me", "org.me", "edu.me", "gov.me", "ac.me", "its.me",
    "priv.me",
    "co.si",
    "com.lv", "net.lv", "org.lv", "edu.lv", "gov.lv", "mil.lv", "id.lv",
    "asn.lv", "conf.lv",
    "com.lt", "co.lt",
    "com.ee", "pri.ee", "fie.ee", "med.ee",
    "co.im", "com.im", "net.im", "org.im", "ac.im", "gov.im",
    "co.gg", "net.gg", "org.gg", "co.je", "net.je", "org.je",
    "com.mc", "tm.mc", "asso.mc",
    "co.gl", "com.gl", "net.gl", "org.gl", "edu.gl",
    "com.is", "net.is", "org.is", "edu.is", "gov.is", "int.is",
    "com.fo", "com.ax",
    # oceania / misc
    "com.fj", "net.fj", "org.fj", "ac.fj", "gov.fj", "mil.fj",
    "com.pg", "net.pg", "org.pg", "ac.pg", "gov.pg", "mil.pg",
    "com.sb", "net.sb", "org.sb", "edu.sb", "gov.sb",
    "com.vu", "net.vu", "org.vu", "edu.vu",
    "co.ck", "net.ck", "org.ck", "edu.ck", "gov.ck",
    "com.ws", "net.ws", "org.ws", "edu.ws", "gov.ws",
    "co.fk", "org.fk", "gov.fk", "ac.fk", "nom.fk", "net.fk",
    # private-section (Guava includes these in publicSuffix())
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "blogspot.com", "blogspot.co.uk", "blogspot.de", "blogspot.fr",
    "blogspot.in", "blogspot.jp", "blogspot.kr", "blogspot.mx",
    "blogspot.com.br", "blogspot.com.au", "blogspot.ca", "blogspot.ch",
    "wordpress.com", "tumblr.com", "weebly.com", "wixsite.com",
    "herokuapp.com", "appspot.com", "netlify.app", "vercel.app",
    "pages.dev", "web.app", "firebaseapp.com", "azurewebsites.net",
    "cloudapp.net", "cloudfront.net", "elasticbeanstalk.com",
    "s3.amazonaws.com", "fastlylb.net",
    "fly.dev", "onrender.com", "surge.sh",
    "repl.co", "glitch.me", "neocities.org", "readthedocs.io",
    "streamlit.app", "hf.space", "ngrok.io", "loca.lt", "workers.dev",
    "pythonanywhere.com", "koyeb.app", "deno.dev", "supabase.co",
    "cloudfunctions.net", "linodeusercontent.com",
    "duckdns.org", "no-ip.org", "dyndns.org", "hopto.org", "zapto.org",
})
_PSL_SINGLE = frozenset({
    # gTLDs / sponsored
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz", "name",
    "pro", "museum", "aero", "coop", "jobs", "travel", "cat", "tel", "post",
    "asia", "mobi", "xxx", "arpa",
    # new gTLDs (high-traffic)
    "io", "co", "ai", "app", "dev", "me", "tv", "cc", "xyz", "site",
    "online", "store", "shop", "blog", "cloud", "club", "design", "digital",
    "email", "fun", "games", "global", "guru", "host", "icu", "ink", "lat",
    "life", "link", "live", "ltd", "media", "network", "news", "ninja",
    "one", "page", "party", "pics", "pink", "plus", "press", "pw", "red",
    "rocks", "run", "sale", "sbs", "services", "social", "software",
    "solutions", "space", "studio", "tech", "today", "tools", "top",
    "vip", "website", "wiki", "work", "world", "ws", "zone", "bot", "fyi",
    "gg", "gl", "im", "je", "sh", "so", "st", "su", "to", "vc",
    # ccTLDs
    "ac", "ad", "ae", "af", "ag", "al", "am", "ao", "ar", "as", "at", "au",
    "aw", "ax", "az", "ba", "bb", "be", "bf", "bg", "bh", "bi", "bj", "bm",
    "bn", "bo", "br", "bs", "bt", "bw", "by", "bz", "ca", "cd", "cf", "cg",
    "ch", "ci", "cl", "cm", "cn", "cr", "cu", "cv", "cw", "cx", "cy", "cz",
    "de", "dj", "dk", "dm", "do", "dz", "ec", "ee", "eg", "es", "et", "eu",
    "fi", "fm", "fo", "fr", "ga", "gd", "ge", "gf", "gh", "gi", "gm", "gn",
    "gp", "gq", "gr", "gs", "gt", "gw", "gy", "hk", "hn", "hr", "ht", "hu",
    "id", "ie", "il", "in", "iq", "ir", "is", "it", "jo", "jp", "ke", "kg",
    "ki", "km", "kn", "kp", "kr", "kw", "ky", "kz", "la", "lb", "lc", "li",
    "lk", "lr", "ls", "lt", "lu", "lv", "ly", "ma", "mc", "md", "mg", "mk",
    "ml", "mn", "mo", "mq", "mr", "ms", "mt", "mu", "mv", "mw", "mx", "my",
    "mz", "na", "nc", "ne", "nf", "ng", "ni", "nl", "no", "nr", "nu", "nz",
    "om", "pa", "pe", "pf", "ph", "pk", "pl", "pm", "pn", "pr", "ps", "pt",
    "py", "qa", "re", "ro", "rs", "ru", "rw", "sa", "sb", "sc", "sd", "se",
    "sg", "si", "sk", "sl", "sm", "sn", "sr", "ss", "sv", "sx", "sy", "sz",
    "tc", "td", "tf", "tg", "th", "tj", "tk", "tl", "tm", "tn", "tr", "tt",
    "tw", "tz", "ua", "ug", "uk", "us", "uy", "uz", "va", "ve", "vg", "vi",
    "vn", "vu", "wf", "ye", "yt", "za", "zm", "zw",
})
# wildcard rules (*.tld): any single extra label under these is a suffix
_PSL_WILDCARD = frozenset({"bd", "ck", "er", "fj", "fk", "jm", "kh", "mm",
                           "np", "pg", "ye"})
# exception rules (!host): carved out of a wildcard's coverage
_PSL_EXCEPTIONS = frozenset({"www.ck"})

_PSL_EXACT = frozenset(
    s for s in (_PSL_MULTI | _PSL_SINGLE) if isinstance(s, str)
)


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
# plain relative or root-relative paths ("p/1.html", "/a/b"). For those the
# full state machine reduces to scheme://host + slash-prefixed href, so the
# hot loop runs a single C-level regex test + concat instead of the ~6 µs
# parser. Eligibility is CONSERVATIVE — any character class the state
# machine treats specially (scheme/port colon, %-octets, whitespace,
# dot-segments, protocol-relative //) falls back to the exact parser, and
# `test_kanon.py::test_fast_child_canonical_matches_parser` property-checks
# equality against parse_url over generated hrefs + the corpus link shapes.
# ---------------------------------------------------------------------------

_FAST_INELIGIBLE = re.compile(r"[:%\s]|\.\.|\./")


def fast_child_canonical(href: str, page: ParsedUrl):
    """(canonical, host) via the fast path, or None when the href needs
    the full parser. Byte-identical to parse_url(href, page).canonical
    for every href it accepts."""
    if not href or not page.host or _FAST_INELIGIBLE.search(href):
        return None
    if href[0] == "/":
        if len(href) > 1 and href[1] == "/":
            return None  # protocol-relative
        path = href
    else:
        path = "/" + href
    return f"{page.scheme}://{page.host}{path}", page.host

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
