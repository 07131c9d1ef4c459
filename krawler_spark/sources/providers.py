"""Fetch providers — the engine's ``RequestProviderIf`` seam.

The reference abstracts "how a URL becomes a document" behind
``RequestProviderIf`` (``http/Requests.kt:46-61``: ``getUrl``,
``checkUrl``, ``fetchRobotsTxt``). The BSP engine's equivalent is a
provider that maintains the round's *pages frame*: a DataFrame
``(url, warc_ts, html, text, lang[, status])`` the round DAG joins
against for the fetch mark, the visited payload, and the harvest body.

Two implementations:

* ``CorpusRequestProvider`` — the offline default (BASELINE.json
  input_hint): a static url-bucketed corpus table. ``refresh`` is a
  no-op; robots rules are parsed once per crawl and cached.
* ``HttpRequestProvider`` — the live deployment path: each round, the
  not-yet-cached admitted URLs (plus robots.txt for new hosts) are
  fetched over HTTP inside an Arrow-batched ``mapInPandas`` stage
  (stdlib ``urllib`` — one worker fetches one partition's URLs), and
  appended to a parquet *fetch cache* that then serves as the round's
  pages frame. The downstream plan is IDENTICAL to the corpus path, so
  every correctness property (oracle equivalence, politeness, dedup)
  carries over; only the cache-fill stage is new. Politeness of the
  actual wire requests follows from the engine's admission budget
  (at most ``budget`` URLs per host per round).

Scale notes: the fetch cache is append-only parquet partitioned by
round — on a cluster this is an Iceberg table and the per-round append
an atomic snapshot. The cache join stays url-bucketed exactly like the
offline corpus. Fetch fan-out is bounded by the politeness budget per
host and round, and URLs are repartitioned before fetching so one slow
host never serializes the round.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def build_robots_rules(pages: DataFrame, user_agent: str) -> DataFrame:
    """Parse robots.txt rows of a pages frame into per-host disallow
    arrays with the user-agent resolved (RoboMinder.kt:71). Pure
    python over a tiny input; the engine's per-round gate joins the
    result as JVM column algebra."""

    def _parse_rules(batches: Iterator) -> Iterator:
        import pandas as pd

        from ..functions.robots import (
            RobotsParseError,
            parse_robots,
            rules_for_agent,
        )

        for pdf in batches:
            out = []
            for u, body in zip(pdf["robots_url"], pdf["robots_body"]):
                try:
                    rules = sorted(rules_for_agent(parse_robots(body), user_agent))
                except RobotsParseError:
                    rules = None
                out.append((u, rules))
            yield pd.DataFrame(out, columns=["robots_url", "rules"])

    return (
        pages.filter(F.col("url").endswith("/robots.txt"))
        .select(F.col("url").alias("robots_url"), F.col("text").alias("robots_body"))
        .mapInPandas(_parse_rules, schema="robots_url string, rules array<string>")
        .withColumn("has_robots", F.lit(True))
    )


class CorpusRequestProvider:
    """Offline fetch: a static pages corpus (the input_hint table)."""

    dynamic = False

    def __init__(self, pages: DataFrame):
        self._pages = pages
        self._robots = None

    def pages(self) -> DataFrame:
        return self._pages

    def robots_rules(self, user_agent: str) -> DataFrame:
        if self._robots is None:
            # parsed ONCE per crawl (tiny python stage), cached
            self._robots = build_robots_rules(self._pages, user_agent).cache()
        return self._robots

    def refresh(self, rnd: int, admitted_urls: DataFrame) -> None:
        """Static corpus — nothing to fetch."""

    def refresh_robots(self, rnd: int, urls: DataFrame) -> None:
        """Static corpus — robots rows are already in the table."""


class HttpRequestProvider:
    """Live fetch: fill a parquet fetch-cache over HTTP each round.

    ``base_rewrite`` optionally maps url prefixes (e.g. a test rewrites
    ``http://www.site-0.com/`` → ``http://127.0.0.1:PORT/site-0/``) so
    the provider can be driven against a local server; the CACHE always
    stores the logical url the engine asked for.
    """

    dynamic = True

    def __init__(
        self,
        spark: SparkSession,
        cache_dir: str,
        user_agent: str = "krawler-spark",
        timeout_s: float = 10.0,
        base_rewrite: Optional[dict] = None,
        fetch_partitions: Optional[int] = None,
    ):
        self.spark = spark
        self.cache_dir = cache_dir
        self.user_agent = user_agent
        self.timeout_s = timeout_s
        self.base_rewrite = dict(base_rewrite or {})
        self.fetch_partitions = fetch_partitions
        os.makedirs(cache_dir, exist_ok=True)

    # -- cache views -----------------------------------------------------------
    def _cache_nonempty(self) -> bool:
        for _root, _dirs, files in os.walk(self.cache_dir):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def pages(self) -> DataFrame:
        if not self._cache_nonempty():
            return self.spark.createDataFrame([], self._cache_schema())
        return (
            self.spark.read.schema(self._cache_schema())
            .option("recursiveFileLookup", "true")
            .parquet(self.cache_dir)
        )

    @staticmethod
    def _cache_schema():
        from pyspark.sql.types import IntegerType, StructField, StructType

        return StructType(schemas.PAGES.fields + [StructField("status", IntegerType(), True)])

    def robots_rules(self, user_agent: str) -> DataFrame:
        # the cache grows every round — rebuild (tiny python stage over
        # only the robots rows)
        return build_robots_rules(self.pages(), user_agent)

    # -- the wire --------------------------------------------------------------
    @staticmethod
    def _robots_urls(urls: DataFrame) -> DataFrame:
        scheme = F.substring_index(F.col("url"), "://", 1)
        host = F.substring_index(F.substring_index(F.col("url"), "://", -1), "/", 1)
        return urls.select(
            F.concat(scheme, F.lit("://"), host, F.lit("/robots.txt")).alias("url")
        ).distinct()

    def refresh_robots(self, rnd: int, urls: DataFrame) -> None:
        """Prefetch robots.txt for the hosts of ``urls`` (cache misses
        only) so the round's robots gate sees them — the BSP twin of
        fetch-robots-before-request (RoboMinder.kt:46-53)."""
        self._fetch_into(self._robots_urls(urls), f"round_{rnd}_robots")

    def refresh(self, rnd: int, admitted_urls: DataFrame) -> None:
        """Fetch the admitted URLs absent from the cache and append
        them as round ``rnd``'s cache partition. ``admitted_urls``:
        DataFrame with a ``url`` column — the round's post-politeness
        admission set, so wire traffic per host is budget-bounded."""
        self._fetch_into(admitted_urls.select("url").distinct(), f"round_{rnd}")

    def _fetch_into(self, urls: DataFrame, subdir: str) -> None:
        cached = self.pages().select("url")
        todo = urls.join(cached, "url", "left_anti")
        parts = self.fetch_partitions or self.spark.sparkContext.defaultParallelism
        todo = todo.repartition(parts)

        rewrites = sorted(self.base_rewrite.items(), key=lambda kv: -len(kv[0]))
        ua, timeout = self.user_agent, self.timeout_s

        def _fetch(batches: Iterator) -> Iterator:
            import datetime as dt
            import urllib.error
            import urllib.request

            import pandas as pd

            from ..functions.extract import extract_text

            for pdf in batches:
                rows = []
                for url in pdf["url"]:
                    wire = url
                    for pref, repl in rewrites:
                        if wire.startswith(pref):
                            wire = repl + wire[len(pref):]
                            break
                    status, body = None, None
                    try:
                        req = urllib.request.Request(
                            wire, headers={"User-Agent": ua}
                        )
                        with urllib.request.urlopen(req, timeout=timeout) as resp:
                            status, body = resp.status, resp.read()
                    except urllib.error.HTTPError as exc:
                        status, body = exc.code, b""
                    except Exception:
                        # connection error: no cache row ⇒ the engine
                        # records fetch_error, like a corpus miss
                        continue
                    # robots.txt is plain text — store the raw body as
                    # `text` (the rules parser reads it verbatim, like
                    # the corpus's robots rows); pages get the engine's
                    # html→text extraction.
                    if url.endswith("/robots.txt"):
                        text = (body or b"").decode("utf-8", errors="replace")
                    else:
                        text = extract_text(body)
                    rows.append((
                        url,
                        dt.datetime.now(dt.timezone.utc),
                        body,
                        text,
                        None,
                        int(status) if status is not None else None,
                    ))
                yield pd.DataFrame(
                    rows,
                    columns=["url", "warc_ts", "html", "text", "lang", "status"],
                )

        fetched = todo.mapInPandas(_fetch, schema=self._cache_schema())
        fetched.write.mode("overwrite").parquet(
            os.path.join(self.cache_dir, subdir)
        )
