"""Explicit schemas for every engine table — declared once, never
inferred (reference declares its DDL in ``KrawlQueue/Dao.kt:65-66`` and
``History/Dao.kt:57-58``; SURVEY.md §1.2)."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The offline web corpus — the fetch stand-in (BASELINE.json input_hint).
PAGES = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# KrawlDocument's harvested-link surface (anchorTags +
# otherOutgoingLinks, KrawlDocument.kt:77-89) as a DDL string — shared
# by the engine's delta writer and the store's visited view.
LINKS_T = "array<struct<href:string,text:string,attrs:map<string,string>,kind:string>>"

# Frontier — the priority queue (KrawlQueue/Model.kt:24-36, Dao.kt:65-66).
# `enq_round` + `seq` replace the reference's TIMESTAMP column with a
# deterministic total order; `host` is materialized because it is the
# politeness/affinity partitioning key (ScheduledQueue.kt:48-73).
FRONTIER = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), True),
    StructField("root_page_id", IntegerType(), True),
    StructField("parent_url", StringType(), True),
    StructField("depth", IntegerType(), False),
    StructField("priority", IntegerType(), False),   # byte 0-255, 0 = highest
    StructField("enq_round", IntegerType(), False),
    StructField("seq", LongType(), False),           # pop-order tiebreak
])

# URL-seen set (History/Model.kt:23-25, Dao.kt:57-58).
HISTORY = StructType([
    StructField("id", LongType(), False),
    StructField("url", StringType(), False),
    StructField("url_hash64", LongType(), False),
    StructField("seen_round", IntegerType(), False),
])

# Visited/checked output (KrawlAction dispatch, Krawler.kt:424-433).
# redirect_history mirrors KrawlDocument's RedirectHistoryNode chain
# (http/Requests.kt:63-78) in fast-redirect mode; null otherwise.
VISITED = StructType([
    StructField("url", StringType(), False),
    StructField("host", StringType(), True),
    StructField("depth", IntegerType(), False),
    StructField("root_page_id", IntegerType(), True),
    StructField("parent_url", StringType(), True),
    StructField("fetch_round", IntegerType(), False),
    StructField("host_seq", IntegerType(), False),   # per-host fetch ordinal
    StructField("action", StringType(), False),      # visit | check
    StructField("status", IntegerType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
    StructField(
        "redirect_history",
        ArrayType(StructType([
            StructField("url", StringType(), True),
            StructField("status", IntegerType(), True),
        ])),
        True,
    ),
    # lower-cased response headers (KrawlDocument.kt:51-61)
    StructField("headers", MapType(StringType(), StringType()), True),
])

SEEDS = StructType([
    StructField("url", StringType(), False),
    StructField("seed_order", IntegerType(), False),
])

REDIRECTS = StructType([
    StructField("url", StringType(), False),
    StructField("status", IntegerType(), False),
    StructField("location", StringType(), True),
])

# Side outputs (O21 hooks as DataFrames).
SIDE_EVENTS = StructType([
    StructField("url", StringType(), False),
    StructField("parent_url", StringType(), True),
    StructField("round", IntegerType(), False),
    StructField("kind", StringType(), False),  # repeat_visit | fetch_error | robots_denied | depth_cut
    StructField("detail", StringType(), True),
])

# Per-round metrics / lineage (north_rule: per-partition lineage + metrics).
METRICS = StructType([
    StructField("round", IntegerType(), False),
    StructField("metric", StringType(), False),
    StructField("value", LongType(), False),
])

BLOOM = StructType([
    StructField("bucket", IntegerType(), False),
    StructField("bits", BinaryType(), False),
])
