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


def _cell_fn(r2: float, max_cell: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        members: dict = (
            {int(k): v for k, v in json.loads(state.get[0]).items()}
            if state.exists
            else {}
        )
        out_a, out_b, out_d = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values("id")
            for row in pdf.itertuples(index=False):
                eid, lon, lat = int(row.id), float(row.lon), float(row.lat)
                for mid, (mlon, mlat) in members.items():
                    if mid == eid:
                        continue
                    d2 = (lon - mlon) * (lon - mlon) + (lat - mlat) * (lat - mlat)
                    if d2 <= r2:
                        out_a.append(min(eid, mid))
                        out_b.append(max(eid, mid))
                        out_d.append(d2)
                if bool(row.resident) and (
                    eid in members or len(members) < max_cell
                ):
                    members[eid] = [lon, lat]
        state.update((json.dumps(members),))
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
) -> DataFrame:
    """(a < b, dist_sq) pairs within `radius` from an unbounded
    position stream. Cell size equals the radius (the q127 lossless
    choice: any pair within r sits in the same or adjacent cells)."""
    routed = cell_routed(point_stream, id_col, lon_col, lat_col, cell=radius)
    return routed.groupBy("jx", "jy").applyInPandasWithState(
        _cell_fn(radius * radius, max_cell),
        outputStructType=PROX_PAIR_SCHEMA,
        stateStructType=_CELL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
