"""Skew mitigation helpers (SURVEY §4 / 100 TB posture).

AQE's skew-join handling covers sort-merge joins at runtime; these
helpers cover the cases AQE can't re-plan:

- ``salted_aggregate``: two-phase aggregation for a groupBy whose key
  distribution is pathological (one key ≫ everything). Phase 1
  aggregates on (key, salt) — the hot key's rows spread over
  ``n_salts`` reducers — phase 2 merges the partials. Works for any
  algebraic aggregate expressed as (partial, merge) columns.
- ``salted_broadcast_left``: when the right side is broadcastable the
  join is already skew-immune; this helper exists to make that choice
  explicit at call sites that would otherwise shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: name → aggregate over the raw rows (phase 1,
    grouped by keys + salt). ``merge_aggs``: name → aggregate over the
    phase-1 partials (phase 2, grouped by keys), referencing phase-1
    output names. Example::

        salted_aggregate(
            df, ["k"],
            partial_aggs={"cnt": F.count(F.lit(1)), "s": F.sum("v")},
            merge_aggs={"cnt": F.sum("cnt"), "s": F.sum("s")},
        )

    The salt is a deterministic spread (monotonically increasing id mod
    n_salts would be nondeterministic across retries; spark_partition_id
    + a per-row hash of all columns is stable enough for spreading and
    never appears in results).
    """
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[agg.alias(name) for name, agg in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[agg.alias(name) for name, agg in merge_aggs.items()]
    )


def salted_broadcast_left(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Skew-immune join: broadcast the (small) right side so the hot
    left keys never shuffle."""
    return left.join(F.broadcast(right), on=on)
