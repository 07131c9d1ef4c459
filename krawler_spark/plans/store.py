"""Snapshot state store — atomic per-round commits with resume.

Plays the role the reference's HSQLDB tables play
(``HSQLConnection.kt:40-54``; in-memory vs ``persistentCrawl``
file-backed), redesigned for a lakehouse: every crawl round commits a
consistent multi-table snapshot, and a killed job resumes from the last
committed round with no re-fetches and no URL-seen false negatives
(north_rule resumability).

Layout::

    warehouse/
      frontier/r=<N>/        full snapshot per round (the queue state)
      bloom/r=<N>/           full snapshot of per-bucket bloom shards
      host_state/r=<N>/      per-host cumulative fetch ordinals
      history/r=<N>/         append-only delta (rows first seen in round N)
      visited/r=<N>/         append-only delta
      events/r=<N>/          append-only delta (side outputs, O21)
      metrics/r=<N>/         append-only delta
      _commits/r<N>.json     commit marker — written LAST, atomically

A round is visible iff its marker exists; a crash mid-round leaves
orphan data directories that are ignored and overwritten on retry —
the same snapshot-isolation contract an Iceberg catalog provides. On a
real cluster this class is swapped for Iceberg tables (``writeTo(...)
.append()`` / ``overwritePartitions`` + snapshot tags); the engine only
touches the methods below, so the swap is config-level.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Dict, Iterable, List, Optional

from pyspark.sql import DataFrame, SparkSession

SNAPSHOT_TABLES = ("frontier", "bloom", "host_state")
DELTA_TABLES = ("history", "visited", "events", "metrics")


class SnapshotStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(os.path.join(path, "_commits"), exist_ok=True)

    # -- commit protocol ----------------------------------------------------
    def _table_dir(self, name: str, round_no: int) -> str:
        return os.path.join(self.path, name, f"r={round_no}")

    def _marker(self, round_no: int) -> str:
        return os.path.join(self.path, "_commits", f"r{round_no}.json")

    def write_table(self, name: str, round_no: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._table_dir(name, round_no))

    def write_rows_local(self, name: str, round_no: int, rows: list, schema) -> None:
        """Driver-side write for tiny tables (metrics) — one pyarrow
        file, no Spark job."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = self._table_dir(name, round_no)
        os.makedirs(d, exist_ok=True)
        cols = list(zip(*rows)) if rows else [[] for _ in schema.fields]
        table = pa.table(
            {f.name: list(c) for f, c in zip(schema.fields, cols)}
        )
        pq.write_table(table, os.path.join(d, "part-0.parquet"))

    def commit_round(self, round_no: int, state: Optional[dict] = None) -> None:
        """Write the commit marker — tables must already be written."""
        payload = {"round": round_no, "state": state or {}}
        fd, tmp = tempfile.mkstemp(dir=os.path.join(self.path, "_commits"))
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self._marker(round_no))  # atomic rename = commit

    def last_committed(self) -> Optional[int]:
        rounds = []
        for fn in os.listdir(os.path.join(self.path, "_commits")):
            if fn.startswith("r") and fn.endswith(".json"):
                try:
                    rounds.append(int(fn[1:-5]))
                except ValueError:
                    pass
        return max(rounds) if rounds else None

    def committed_state(self, round_no: int) -> dict:
        with open(self._marker(round_no)) as f:
            return json.load(f)["state"]

    # -- reads ----------------------------------------------------------------
    def read_snapshot(self, name: str, round_no: int) -> Optional[DataFrame]:
        d = self._table_dir(name, round_no)
        if not os.path.isdir(d):
            return None
        return self.spark.read.parquet(d)

    def delta_dirs(self, name: str, upto_round: int) -> List[str]:
        base = os.path.join(self.path, name)
        if not os.path.isdir(base):
            return []
        out = []
        for fn in sorted(os.listdir(base)):
            if fn.startswith("r="):
                r = int(fn.split("=")[1])
                if r <= upto_round:
                    out.append(os.path.join(base, fn))
        return out

    def read_deltas(self, name: str, upto_round: int) -> Optional[DataFrame]:
        dirs = self.delta_dirs(name, upto_round)
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    # -- maintenance ----------------------------------------------------------
    def prune_snapshots(self, keep_from_round: int) -> None:
        """Drop snapshot rounds older than keep_from_round (deltas are
        kept — they are the history/lineage)."""
        for name in SNAPSHOT_TABLES:
            base = os.path.join(self.path, name)
            if not os.path.isdir(base):
                continue
            for fn in os.listdir(base):
                if fn.startswith("r=") and int(fn.split("=")[1]) < keep_from_round:
                    shutil.rmtree(os.path.join(base, fn), ignore_errors=True)

    def destroy(self) -> None:
        shutil.rmtree(self.path, ignore_errors=True)
