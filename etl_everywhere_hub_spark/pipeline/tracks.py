"""The reference connector's semantics as a declarative Spark pipeline.

Reproduces, operator for operator, what dfpc-coe/etl-everywhere-hub
computes (citations into /root/reference/task.ts):

- wire schema ``EverywhereItem``            task.ts:14-39
- config ``Input`` with defaults            task.ts:48-64
- webhook transform → GeoJSON Feature       task.ts:121-143
- poll transform (UNKNOWN deviceId trap)    task.ts:212-231 (:226)
- emergency CoT type mapping                task.ts:125,216
- callsign = alias || name (JS falsy: ""    task.ts:128,219
  falls through like null)
- epoch-ms → ISO-8601 'Z' strings           task.ts:129-130,136
- keyed last-write-wins device cache        task.ts:146-149,237-240
- TTL eviction with null-time → epoch 0     task.ts:251-256 (?? 0 at :252)

Everything is columnar expressions — one narrow select per transform,
one hash shuffle for the keyed cache — so the same pipeline that
handles one webhook record handles 100 TB of track history.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from etl_everywhere_hub_spark.functions.timeutil import epoch_ms_to_iso
from etl_everywhere_hub_spark.operators.windows import latest_per_key

# CoT types chosen by the reference at task.ts:125,216.
COT_EMERGENCY = "b-a-o-tbl"
COT_NORMAL = "a-f-G-U-U-S-X"


@dataclass(frozen=True)
class InputConfig:
    """Typed job config mirroring ``Input`` (task.ts:48-64) incl. defaults."""

    token_id: str | None = None
    cache_refresh_ms: int = 300_000  # task.ts:53
    retention_ms: int = 3_600_000  # task.ts:57
    debug: bool = False  # task.ts:61


def everywhere_item_schema() -> StructType:
    """``EverywhereItem`` (task.ts:14-39) as an explicit StructType.

    Used with from_json/read.schema — FAILFAST is the validated path,
    PERMISSIVE + corrupt-record column is DEBUG mode (task.ts:110).
    """
    point = StructType(
        [
            StructField("x", DoubleType()),  # lon
            StructField("y", DoubleType()),  # lat
        ]
    )
    alert = StructType(
        [
            StructField("id", LongType()),
            StructField("description", StringType()),
            StructField("type", StringType()),
        ]
    )
    track_point = StructType(
        [
            StructField("time", LongType(), nullable=True),  # epoch ms
            StructField("direction", LongType()),
            StructField("inboundMessageId", LongType()),
            StructField("isEmergency", BooleanType(), nullable=True),
            StructField("source", StringType(), nullable=True),
            StructField("point", point),
            StructField("alertsList", ArrayType(alert), nullable=True),
        ]
    )
    return StructType(
        [
            StructField("msg_id", LongType()),  # delivery order tiebreak (fixture-only)
            StructField("converterId", StringType()),
            StructField("deviceId", LongType()),
            StructField("teamId", LongType()),
            StructField("entityId", LongType()),
            StructField("deviceType", StringType()),
            StructField("name", StringType()),
            StructField("alias", StringType(), nullable=True),
            StructField("source", StringType()),
            StructField("trackPoint", track_point),
        ]
    )


def js_falsy_coalesce(*cols) -> F.Column:
    """JS ``a || b``: empty string and null both fall through
    (task.ts:128 treats alias='' like missing)."""
    return F.coalesce(*[F.nullif(c, F.lit("")) for c in cols])


def transform_features(items: DataFrame, path: str = "webhook") -> DataFrame:
    """EverywhereItem rows → GeoJSON point Features.

    ``path='webhook'`` carries the real deviceId (task.ts:135);
    ``path='poll'`` hard-codes 'UNKNOWN' (task.ts:226) — a reference
    trap preserved deliberately.
    """
    device_id = (
        F.col("deviceId").cast("string") if path == "webhook" else F.lit("UNKNOWN")
    )
    tp = F.col("trackPoint")
    return items.select(
        F.concat(F.lit("inreach-"), F.col("entityId").cast("string")).alias("id"),
        F.lit("Feature").alias("type"),
        F.struct(
            F.when(tp.getField("isEmergency") == True, F.lit(COT_EMERGENCY))  # noqa: E712
            .otherwise(F.lit(COT_NORMAL))
            .alias("type"),
            F.lit("m-g").alias("how"),  # constant CoT 'how' (task.ts:126,217)
            js_falsy_coalesce(F.col("alias"), F.col("name")).alias("callsign"),
            epoch_ms_to_iso(tp.getField("time")).alias("time"),
            epoch_ms_to_iso(tp.getField("time")).alias("start"),
            tp.getField("time").alias("time_ms"),
            F.col("trackPoint").getField("direction").cast("double").alias("course"),
            F.struct(
                F.col("entityId").alias("inreachId"),
                F.col("name").alias("inreachName"),
                F.col("deviceType").alias("inreachDeviceType"),
                device_id.alias("inreachDeviceId"),
                epoch_ms_to_iso(tp.getField("time")).alias("inreachReceive"),
            ).alias("metadata"),
        ).alias("properties"),
        F.struct(
            F.lit("Point").alias("type"),
            F.array(
                tp.getField("point").getField("x"),
                tp.getField("point").getField("y"),
            ).alias("coordinates"),
        ).alias("geometry"),
        F.col("msg_id"),
    )


def device_cache_snapshot(
    features: DataFrame,
    now_ms: int,
    retention_ms: int = 3_600_000,
) -> DataFrame:
    """Batch formulation of the device cache + eviction pass.

    upsert last-write-wins per feature id (task.ts:148) = latest by
    arrival order; TTL eviction keeps time >= now - retention, with
    null time coalesced to 0 → always evicted (task.ts:252).
    """
    latest = latest_per_key(features, ["id"], "msg_id")
    cutoff = now_ms - retention_ms
    t = F.coalesce(F.col("properties").getField("time_ms"), F.lit(0))
    return latest.filter(t >= F.lit(cutoff))
