"""Structured Streaming operators.

The crawl loop itself is deliberately BSP (SURVEY.md §1.3 — the
equivalence contract needs deterministic round boundaries), but two
reference behaviors are genuinely streaming-shaped and get first-class
streaming implementations:

* ``submitUrls`` live enqueue (``Krawler.kt:205-214``, SURVEY §3.2):
  URLs arriving while a crawl runs. ``submissions_stream`` ingests a
  file-source stream of raw URLs, canonicalizes them in the engine's
  Arrow UDF, and appends to a staging directory the engine drains at
  each round boundary — snapshot isolation makes this race-free where
  the reference needed a concurrent-insert queue.
* the per-host politeness tracker (``http/Requests.kt:203-250``):
  ``politeness_decisions`` is a stateful streaming operator
  (``applyInPandasWithState``) that keeps each host's simulated clock
  and assigns every request its earliest allowed fetch time — the
  streaming twin of the engine's per-round budget accounting.

Plus ``events_rollup``: watermarked tumbling-window aggregation whose
batch twin is ``__spark_entry__.q_events_window_agg`` (same column
algebra, so the batch oracle checks the streaming semantics).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..schemas import FRONTIER, SEEDS


def events_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour windowed counts with late-data watermark. Works
    on a streaming OR batch DataFrame (same plan either way)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("sum_value_c"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type", "n_events", "sum_value_c",
        )
    )


def submissions_stream(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    checkpoint_dir: str,
    priority: int = 0,
):
    """Live ``submitUrls``: stream raw-URL files → canonicalized
    frontier rows in a staging dir. Returns the StreamingQuery."""
    from ..engine import CrawlEngine  # seed_frontier_df's UDF, reused

    raw = (
        spark.readStream.schema(SEEDS)
        .option("maxFilesPerTrigger", 16)
        .json(input_dir)
    )

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        eng_like = _SeedCanonicalizer(spark)
        rows = eng_like.canonicalize(batch_df, priority)
        rows.write.mode("append").parquet(staging_dir)

    return (
        raw.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


class _SeedCanonicalizer:
    """Thin wrapper reusing the engine's distributed seed-injection UDF."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def canonicalize(self, seeds: DataFrame, priority: int) -> DataFrame:
        from ..engine import CrawlEngine

        dummy = CrawlEngine.__new__(CrawlEngine)
        dummy.spark = self.spark
        out = CrawlEngine.seed_frontier_df(dummy, seeds)
        return out.withColumn("priority", F.lit(priority).cast("int"))


_DECISION_SCHEMA = "host string, url string, req_ts double, allowed_ts double"
_STATE_SCHEMA = "last_allowed double"


def _politeness_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-host politeness clock (Requests.kt:150-186 as streaming
    state): each request is granted the max(request time, last grant +
    delay); the grant time persists across micro-batches."""
    (host,) = key
    delay_s = 0.2  # politenessDelay default, 200 ms (KrawlConfig.kt:28-30)
    last = state.get[0] if state.exists else float("-inf")
    for pdf in pdfs:
        pdf = pdf.sort_values("req_ts")
        grants = []
        for t in pdf["req_ts"]:
            g = max(float(t), last + delay_s)
            grants.append(g)
            last = g
        out = pdf[["host", "url", "req_ts"]].copy()
        out["allowed_ts"] = grants
        yield out
    state.update((last,))


def politeness_decisions(requests: DataFrame) -> DataFrame:
    """Stateful streaming rate limiter: input stream of
    (host, url, req_ts[sec]) → each row stamped with its earliest
    allowed fetch time, ≥ politenessDelay apart per host."""
    return requests.groupBy("host").applyInPandasWithState(
        _politeness_fn,
        outputStructType=_DECISION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def urlseen_stream(
    urls: DataFrame,
    watermark: str = "1 hour",
    url_col: str = "url",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the URL-seen dedup (O9) for continuous
    ingestion: first occurrence of each canonical url passes, repeats
    within the watermark horizon are dropped, and the dedup state is
    bounded by that horizon (``dropDuplicatesWithinWatermark`` evicts
    keys once the watermark passes them). An unbounded crawl pairs this
    with the bloom-sharded batch anti-join at round boundaries — the
    stream bounds state, the snapshot store holds the full history.

    Expects CANONICAL urls (the engine canonicalizes at harvest; the
    seen key must match the batch path's key). The dedup key is the URL
    STRING itself — exactly the batch engine's anti-join key, so a
    64-bit hash collision can never drop a never-seen URL (at 10^9-10^10
    URLs collisions are expected; O9 promises no false negatives).
    ``url_key`` (xxhash64) rides along as a shuffle/partition hint only.
    The batch twin keeps the FIRST occurrence by ``ts`` (min_by), the
    same row the in-order stream admits — not an arbitrary survivor."""
    keyed = urls.withColumn("url_key", F.xxhash64(F.col(url_col)))
    if urls.isStreaming:
        return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            [url_col]
        )
    if ts_col not in keyed.columns:
        # no event time → only the key set is defined; arbitrary survivor
        return keyed.dropDuplicates([url_col])
    others = [c for c in keyed.columns if c != url_col]
    return (
        keyed.groupBy(url_col)
        .agg(*[F.min_by(c, ts_col).alias(c) for c in others])
        .select(*keyed.columns)
    )
