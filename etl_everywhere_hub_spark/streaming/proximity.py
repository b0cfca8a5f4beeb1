"""Streaming spatial proximity detection — the geofence-alert twin of
q127's grid-bucketed batch join (SURVEY.md §2.B trajectory ops ×
streaming; the reference ecosystem's domain question "which tracked
devices are near each other", answered incrementally).

Batch q127 buckets points into r-sized grid cells, explodes one side
to its 3x3 neighborhood and equi-joins on the cell key. The streaming
form replaces the join with CELL-KEYED STATE, exactly the way
streaming/neardup.py replaces the LSH band self-join with bucket
state:

- every position update routes to its 3x3 cell neighborhood (9 rows,
  map-only) — the home cell marked `resident`, the 8 neighbors
  `visitor`;
- state per cell holds the resident entities' positions;
- an arriving row compares against its cell's residents (exact
  distance on collision candidates only — O(cell density) per
  update), then, if resident, upserts its own position.

Every qualifying pair is emitted exactly once per position pair: the
later-arriving entity finds the earlier one in exactly one cell (the
earlier one's home cell; intra-batch arrivals are ordered by entity
id, making any batch split of the same stream emit the same set —
the property the equivalence test pins). Re-positioning an entity
re-emits pairs for its new location; consumers dedupe/expire alerts
by (pair, position) as fits the application.

State is bounded by cell occupancy (spatial density), the same bound
as the batch join's bucket width; `max_cell` caps pathological
co-located floods with the same keep-matching/stop-accumulating
policy as the LSH bucket cap.
"""

from __future__ import annotations

import json
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PROX_PAIR_SCHEMA = StructType(
    [
        StructField("a", LongType()),
        StructField("b", LongType()),
        StructField("dist_sq", DoubleType()),
    ]
)

_CELL_STATE_SCHEMA = StructType([StructField("members", StringType())])


def cell_routed(
    points: DataFrame,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    cell: float = 0.25,
) -> DataFrame:
    """Route each point to its 3x3 cell neighborhood (map-only, works
    on streams): 9 rows per point, home cell flagged resident."""
    pts = points.select(
        F.col(id_col).alias("id"),
        F.col(lon_col).alias("lon"),
        F.col(lat_col).alias("lat"),
        F.floor(F.col(lon_col) / cell).cast("long").alias("cx"),
        F.floor(F.col(lat_col) / cell).cast("long").alias("cy"),
    )
    return (
        pts.withColumn("dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id",
            "lon",
            "lat",
            (F.col("cx") + F.col("dx")).alias("jx"),
            (F.col("cy") + F.col("dy")).alias("jy"),
            ((F.col("dx") == 0) & (F.col("dy") == 0)).alias("resident"),
        )
    )


def _cell_fn(r2: float, max_cell: int, idle_timeout_ms: int | None):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if idle_timeout_ms is not None and state.hasTimedOut:
            # cell idle for the full TTL: drop all resident positions
            # (bounds state for entities that jumped far away and will
            # never route a row back through this cell).
            state.remove()
            return
        members: dict = (
            {int(k): v for k, v in json.loads(state.get[0]).items()}
            if state.exists
            else {}
        )
        out_a, out_b, out_d = [], [], []
        # Accumulate EVERY chunk before sorting: applyInPandasWithState
        # feeds a group as multiple ~10k-row chunks, and the
        # batch-split-invariant equivalence (streaming == batch grid
        # join for any batching of the stream) requires one global
        # id-order over the whole micro-batch group, not per-chunk
        # order — same pattern as stateful_ewma in streaming/jobs.py.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        rows = (
            pd.concat(chunks, ignore_index=True).sort_values("id")
            if chunks
            else pd.DataFrame(columns=["id", "lon", "lat", "resident"])
        )
        for row in rows.itertuples(index=False):
            eid, lon, lat = int(row.id), float(row.lon), float(row.lat)
            for mid, (mlon, mlat) in members.items():
                if mid == eid:
                    continue
                d2 = (lon - mlon) * (lon - mlon) + (lat - mlat) * (lat - mlat)
                if d2 <= r2:
                    out_a.append(min(eid, mid))
                    out_b.append(max(eid, mid))
                    out_d.append(d2)
            if bool(row.resident):
                if eid in members or len(members) < max_cell:
                    members[eid] = [lon, lat]
            elif eid in members:
                # A visitor row for a current member means this cell is
                # now only a NEIGHBOR of the entity's home cell — the
                # entity re-positioned, so its residency here is stale.
                # Evict it so later arrivals don't pair against a ghost
                # position. (Far jumps route no row through the old
                # cell at all; those are reclaimed by idle_timeout_ms.)
                del members[eid]
        state.update((json.dumps(members),))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        if out_a:
            yield pd.DataFrame({"a": out_a, "b": out_b, "dist_sq": out_d})

    return fn


def streaming_proximity_pairs(
    point_stream: DataFrame,
    id_col: str = "id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    radius: float = 0.25,
    max_cell: int = 10_000,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """(a < b, dist_sq) pairs within `radius` from an unbounded
    position stream. Cell size equals the radius (the q127 lossless
    choice: any pair within r sits in the same or adjacent cells).

    Staleness: a re-positioned entity is evicted from any prior cell
    its new position still routes a (visitor) row through; cells the
    entity left entirely keep its last position until `idle_timeout_ms`
    of processing-time inactivity drops the whole cell's state. With
    idle_timeout_ms=None the state is append-only per cell (bounded by
    cell occupancy x entity churn) — fine for replay/backfill, set a
    TTL for long-running deployments."""
    routed = cell_routed(point_stream, id_col, lon_col, lat_col, cell=radius)
    timeout = (
        GroupStateTimeout.NoTimeout
        if idle_timeout_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return routed.groupBy("jx", "jy").applyInPandasWithState(
        _cell_fn(radius * radius, max_cell, idle_timeout_ms),
        outputStructType=PROX_PAIR_SCHEMA,
        stateStructType=_CELL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
