"""Keyed-window operators: latest-per-key, top-k-per-group, running aggs.

latest_per_key is the batch formulation of the reference's device
cache upsert — ``ephem.devices[id] = feat`` is last-write-wins per key
(/root/reference/task.ts:146-149), and the poll API's
``latestPositionOnly=true`` (task.ts:178) is the same operator pushed
into the source. On Spark this is one hash-shuffle on the key and a
per-partition sort — linear, skew-handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Newest row per key; deterministic via an explicit unique tiebreak."""
    ordering = [F.col(order_col).desc()]
    if tiebreak:
        ordering.append(F.col(tiebreak).desc())
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    rank_name: str = "rnk",
) -> DataFrame:
    """Top-k rows per group with the rank kept as a column.

    Ranks flow through a single window (one shuffle); callers supply a
    total order (include a unique key) for determinism.
    """
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )


def ttl_filter(
    df: DataFrame,
    time_col: str,
    now_ms: int,
    retention_ms: int,
) -> DataFrame:
    """Retention eviction: keep rows with time >= now - retention.

    Preserves the reference's null-time trap: a missing time is coalesced
    to epoch 0 and therefore always evicted (task.ts:252's ``?? 0``).
    """
    cutoff_ms = now_ms - retention_ms
    t = F.coalesce(F.unix_millis(F.col(time_col).cast("timestamp")), F.lit(0))
    return df.filter(t >= F.lit(cutoff_ms))
