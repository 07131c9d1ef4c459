"""Serial reference oracle — the executable BSP contract.

The reference's concurrent pop order is timing-dependent; the testable
contract (pinned by its unit suite) is the *serial* semantics: pop
lowest ``(priority, enqueue-order)`` first, depth check before history
insert (``Krawler.kt:364-377``), history insert before shouldVisit /
robots / fetch (seen-before-filter invariant), politeness bounding the
per-host fetch rate (``http/Requests.kt:150-186``), ``depth+1`` for
harvested children, and ``totalPages`` counting only non-Noop actions
(``Krawler.kt:348-354``).

This module re-expresses those semantics as a deterministic BSP round
loop in pure Python. The Spark engine (``krawler_spark.engine``)
implements the *same* contract as a distributed DataFrame program; the
equivalence tests diff their visited sets, depth assignments, history
contents, and per-host fetch order.

Round contract (shared by both implementations)
------------------------------------------------
Entries carry a total pop order ``K = (priority, enq_round, seq)``.
For each round over frontier ``F_r``:

1.  depth cut: ``max_depth != -1 and depth >= max_depth`` → consumed,
    **no** history insert (Krawler.kt:364-367).
2.  in-batch dedup by url keeping the min-K entry; duplicates →
    repeat-visit events (first pop wins).
3.  urls already in history → repeat-visit, consumed.
4.  shouldVisit/shouldCheck: neither → consumed **with** history
    insert (insert precedes the predicates per-URL in the reference,
    Krawler.kt:369-380). Noop rows do not issue requests, so they do
    not consume politeness budget.
5.  robots gate: denied → consumed **with** history insert (also no
    budget consumed — the page request never happens).
6.  politeness: remaining (fetchable) rows ranked per host by K;
    rank > ``per_host_budget`` → deferred to ``F_{r+1}`` untouched
    (no history insert — in serial semantics they simply have not
    been popped yet).
7.  page budget: the round's consumed rows (noops + admitted fetches)
    are processed in global K order; once ``total_pages`` counting
    actions (successful visits/checks, excluding slow-mode redirects)
    have been dispatched crawl-wide, the crawl terminates immediately
    — later rows are not processed at all (job.cancel semantics).
8.  fetch = corpus lookup by canonical url; miss → fetch-error event
    (history inserted, nothing counted — ErrorResponse → Noop).
9.  slow-redirect mode: status ∈ {300,301,302,303,307,308} → enqueue
    ``location`` resolved against the current url at the SAME depth,
    default priority 0 (Krawler.kt:446-457); the row is emitted to
    visited but not counted (visitCount decrement).
10. harvest (both actions per Krawler.kt:409-415; a check's HEAD
    response carries no body, so only GET bodies yield links):
    anchors + srcs with the reference filters; children at ``depth+1``,
    priority = ``assign_priority`` (default 1), enqueued with
    ``seq = crc32(parent_url + ":" + link_index)`` — a deterministic,
    engine-portable tiebreak that avoids any global ordering shuffle
    at scale. ``K`` always ends with ``url`` as the final tiebreak, so
    the pop order is total even on crc collisions.
11. history ids: sequential in processing (K) order within the round.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Set, Tuple

from .config import CrawlConfig
from .functions.extract import harvest_links
from .functions.kanon import parse_url
from .functions.robots import allowed_for

REDIRECT_CODES = {300, 301, 302, 303, 307, 308}


def child_seq(parent_url: str, link_index) -> int:
    """Deterministic enqueue tiebreak, identical in oracle and engine:
    CRC32 of "parent:index" (zlib.crc32 == Spark's crc32)."""
    return zlib.crc32(f"{parent_url}:{link_index}".encode("utf-8"))


@dataclass
class OracleResult:
    visited: List[dict] = field(default_factory=list)
    history: Dict[str, int] = field(default_factory=dict)  # url → id
    events: List[dict] = field(default_factory=list)
    rounds: int = 0
    frontier_left: int = 0


def crawl_oracle(
    seeds: List[str],
    pages: Dict[str, dict],
    config: CrawlConfig,
    should_visit: Callable[[str], bool] = lambda u: True,
    should_check: Callable[[str], bool] = lambda u: False,
    assign_priority: Callable[[str, int], int] = lambda u, d: 1,
    redirects: Optional[Dict[str, Tuple[int, str]]] = None,
    submissions: Optional[Dict[int, List[Tuple[str, int]]]] = None,
) -> OracleResult:
    """pages: canonical url → {"html":..., "text":..., "lang":...};
    redirects: url → (status, location); submissions: round →
    [(url, priority)] live-enqueued at that round's boundary — the
    serial twin of ``CrawlEngine.submit_urls`` + ``_drain_submissions``
    (Krawler.kt:205-214): root/seq are crc32-derived, depth 0, and a
    submission can refill an otherwise-drained frontier (O7)."""
    res = OracleResult()
    redirects = redirects or {}
    submissions = submissions or {}

    frontier: List[dict] = []
    for order, s in enumerate(seeds):  # O1: priority 0, depth 0
        pu = parse_url(s)
        frontier.append(
            dict(url=pu.canonical, host=pu.host, root=order, parent=None,
                 depth=0, priority=0, enq_round=0, seq=order)
        )

    robots_cache: Dict[str, Optional[str]] = {}

    def robots_allows(pu) -> bool:
        if not config.respect_robots_txt:
            return True
        key = pu.hierarchical_part
        if key not in robots_cache:
            row = pages.get(f"{key}/robots.txt")
            robots_cache[key] = row["text"] if row is not None else None
        return allowed_for(robots_cache[key], config.user_agent, pu.path)

    counted = 0
    host_seq: Dict[str, int] = {}
    budget = config.per_host_budget
    exhausted = False
    K = lambda e: (e["priority"], e["enq_round"], e["seq"], e["url"])

    for rnd in range(config.max_rounds):
        for u, pr in submissions.get(rnd, []):
            pu = parse_url(u)
            crc = zlib.crc32(pu.canonical.encode())
            frontier.append(
                dict(url=pu.canonical, host=pu.host, root=crc % (1 << 31),
                     parent=None, depth=0, priority=pr, enq_round=rnd, seq=crc)
            )
        if not frontier or exhausted:
            break
        res.rounds = rnd + 1

        # 1. depth cut
        live: List[dict] = []
        for e in sorted(frontier, key=K):
            if config.max_depth != -1 and e["depth"] >= config.max_depth:
                res.events.append(dict(url=e["url"], parent_url=e["parent"], round=rnd,
                                       kind="depth_cut", detail=None))
            else:
                live.append(e)

        # 2+3. in-batch dedup + history anti-join
        new: List[dict] = []
        seen_batch: Set[str] = set()
        for e in live:
            if e["url"] in res.history or e["url"] in seen_batch:
                res.events.append(dict(url=e["url"], parent_url=e["parent"], round=rnd,
                                       kind="repeat_visit", detail=None))
                continue
            seen_batch.add(e["url"])
            new.append(e)

        # 4+5. predicates + robots → classify noop-consumed vs fetchable
        consumed_noop: List[dict] = []  # history-inserted, no fetch
        fetchable: List[dict] = []
        for e in new:
            pu = parse_url(e["url"])
            visit = should_visit(e["url"])
            check = should_check(e["url"])
            if not (visit or check):
                e["_kind"] = "filtered"
                consumed_noop.append(e)
            elif not robots_allows(pu):
                e["_kind"] = "robots_denied"
                consumed_noop.append(e)
            else:
                e["_action"] = "visit" if visit else "check"
                fetchable.append(e)

        # 6. politeness over fetchable rows only
        per_host_rank: Dict[str, int] = {}
        admitted: List[dict] = []
        deferred: List[dict] = []
        for e in fetchable:  # K-sorted
            r = per_host_rank.get(e["host"], 0)
            if r < budget:
                per_host_rank[e["host"]] = r + 1
                admitted.append(e)
            else:
                deferred.append(e)

        # 7-10. process consumed rows in global K order
        children: List[dict] = []
        next_id = len(res.history)
        for e in sorted(consumed_noop + admitted, key=K):
            res.history[e["url"]] = next_id
            next_id += 1

            kind = e.pop("_kind", None)
            if kind == "robots_denied":
                res.events.append(dict(url=e["url"], parent_url=e["parent"], round=rnd,
                                       kind="robots_denied", detail=None))
                continue
            if kind == "filtered":
                continue

            # fast redirect strategy (reference default): the client
            # follows chains transparently — fetch the final target and
            # record the hops (http/Requests.kt:63-78; hop cap like a
            # real client's redirect limit)
            fetch_url = e["url"]
            chain = []
            if config.use_fast_redirect_strategy and config.follow_redirects:
                for _ in range(5):
                    hop = redirects.get(fetch_url)
                    if hop is None:
                        break
                    chain.append(dict(url=fetch_url, status=hop[0]))
                    fetch_url = parse_url(hop[1] or "", parse_url(fetch_url)).canonical

            row = pages.get(fetch_url)
            if row is None:
                res.events.append(dict(url=e["url"], parent_url=e["parent"], round=rnd,
                                       kind="fetch_error", detail="no corpus row"))
                continue

            redirect = redirects.get(e["url"]) if (
                not config.use_fast_redirect_strategy and config.follow_redirects
            ) else None

            if redirect is None:
                if config.total_pages != -1 and counted >= config.total_pages:
                    exhausted = True
                    break
                counted += 1

            hs = host_seq.get(e["host"], 0) + 1
            host_seq[e["host"]] = hs
            status = redirect[0] if redirect else row.get("status") or 200
            res.visited.append(dict(
                url=e["url"], host=e["host"], depth=e["depth"], root_page_id=e["root"],
                parent_url=e["parent"], fetch_round=rnd, host_seq=hs,
                action=e["_action"],
                status=status,
                text=row["text"], lang=row.get("lang"),
                redirect_history=chain or None,
                # synthesized lower-cased response headers — must mirror
                # the engine's offline-fetch pair byte for byte
                headers={
                    "content-type": "text/html; charset=utf-8",
                    "content-length": str(len(row["html"])),
                },
            ))
            if redirect is None and not (200 <= status < 400):
                # onUnexpectedStatusCode analogue: page still visited +
                # harvested (Krawler.kt:150-160 declares the hook only)
                res.events.append(dict(url=e["url"], parent_url=e["parent"],
                                       round=rnd, kind="unexpected_status",
                                       detail=str(status)))

            if redirect is not None:
                pu = parse_url(e["url"])
                loc = parse_url(redirect[1], pu)
                children.append(dict(url=loc.canonical, host=loc.host, root=e["root"],
                                     parent=e["url"], depth=e["depth"], priority=0,
                                     enq_round=rnd + 1,
                                     seq=child_seq(e["url"], "redirect")))
            else:
                # the reference harvests BOTH actions (Krawler.kt:409-415)
                # — but a check is a HEAD fetch (Requests.kt:137) whose
                # response has no body, so its harvest yields no links.
                # Relative hrefs resolve against the chain's final url
                # (the content base); parent + seq stay on the requested
                # url, matching the engine's harvest.
                body = row["html"] if e["_action"] == "visit" else b""
                for li, link in enumerate(harvest_links(body, fetch_url)):
                    children.append(dict(
                        url=link["out_url"], host=link["host"], root=e["root"],
                        parent=e["url"], depth=e["depth"] + 1,
                        priority=assign_priority(link["out_url"], e["depth"]),
                        enq_round=rnd + 1, seq=child_seq(e["url"], li),
                    ))

        frontier = deferred + children

    res.frontier_left = len(frontier)
    return res
