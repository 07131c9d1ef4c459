"""Distributed total-order prefix operations.

``Window.orderBy(...)`` with no partition key collapses the whole frame
into ONE task — fine for a unit test, fatal at 10^10 rows. The engine's
two oracle-exact modes (sequential history ids, the totalPages
cumulative cut) both need a global cumulative sum in the pop order K,
so this module provides the scale-safe classic instead:

1. range-partition the frame by K (global order across partitions) and
   sort within partitions (JVM sort — exact Spark ordering semantics),
2. pass 1: per-partition (min key, value total) → driver (one tiny row
   per partition) → exclusive offsets,
3. pass 2: partition-local cumulative sum + offset in one Arrow batch
   stage (each task owns a whole partition, batches arrive in order).

Pass 2 identifies its partition by the DATA (the partition's first
order key), never by task/partition indices: when the cumsum branch is
evaluated inside a larger job (e.g. as one leg of the round-delta
union), task partition ids are offset by the enclosing union and would
silently corrupt the offsets. The first-row key is stable under any
execution plan.

Wall-clock is two linear passes and one range shuffle; no stage ever
sees more than 1/parts of the data.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.storagelevel import StorageLevel


def _py(v):
    """numpy / pandas scalar → plain python (dict-key-stable)."""
    return v.item() if hasattr(v, "item") else v


def ordered_cumsum(
    df: DataFrame,
    order_cols: List[str],
    value_col: Optional[str] = None,
    out_col: str = "_cum",
    persist_registry: Optional[list] = None,
) -> DataFrame:
    """Adds ``out_col`` = cumulative sum of ``value_col`` (cast to long;
    row count when None) over the GLOBAL order ``order_cols``, inclusive
    of the current row — semantically identical to
    ``sum(value).over(Window.orderBy(*order_cols).rowsBetween(
    unboundedPreceding, currentRow))`` but with no single-partition
    stage. The range-partitioned intermediate is persisted so both
    passes see identical partitions; hand a list via
    ``persist_registry`` to unpersist it when the caller's job ends."""
    spark = df.sparkSession
    parts = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*[F.col(c) for c in order_cols])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    if persist_registry is not None:
        persist_registry.append(ranged)

    val = (
        F.lit(1).cast("long") if value_col is None
        else F.col(value_col).cast("long")
    )
    # pass 1 (a dedicated job, so spark_partition_id is the true range
    # order): per-partition first key + value total → exclusive offsets
    # keyed by the first key, which pass 2 can re-derive from data alone.
    stats = (
        ranged.select(
            F.spark_partition_id().alias("p"),
            F.struct(*[F.col(c) for c in order_cols]).alias("k"),
            val.alias("v"),
        )
        .groupBy("p")
        .agg(F.min("k").alias("k"), F.sum("v").alias("c"))
        .collect()
    )
    offsets_by_key = {}
    acc = 0
    for r in sorted(stats, key=lambda r: r["p"]):
        offsets_by_key[tuple(_py(x) for x in r["k"])] = acc
        acc += int(r["c"] or 0)

    out_schema = StructType(
        list(ranged.schema.fields) + [StructField(out_col, LongType())]
    )
    vname = value_col
    ocols = list(order_cols)

    def _cumsum(batches: Iterator) -> Iterator:
        import pandas as pd

        run = None
        for pdf in batches:  # batches arrive in partition order, pre-sorted
            if run is None:
                first_key = tuple(_py(pdf[c].iloc[0]) for c in ocols)
                run = offsets_by_key[first_key]
            if vname is None:
                v = pd.Series([1] * len(pdf), index=pdf.index, dtype="int64")
            else:
                v = pdf[vname].fillna(False).astype("int64")
            cs = v.cumsum() + run
            run += int(v.sum())
            out = pdf.copy()
            out[out_col] = cs
            yield out

    return ranged.mapInPandas(_cumsum, schema=out_schema)
