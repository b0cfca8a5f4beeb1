"""CoT (Cursor-on-Target) XML codec — reference capability F1.

The reference delegates CoT serialization to the public `@tak-ps/
node-cot` package (imported at /root/reference/task.ts:5 as
`CoT, { Feature }`; features are submitted as GeoJSON and converted to
CoT events by the framework on emission). This module is the
Spark-native equivalent: the GeoJSON features produced by
`pipeline.tracks.transform_features` are rendered to / parsed from CoT
`<event>` XML entirely with Spark 4's built-in XML expressions
(`to_xml` / `from_xml`) — JVM-side, codegen-friendly, no Python in the
row path.

CoT shape (standard MIL-STD-2525-adjacent schema): an `<event>`
element whose identity/type/time fields are ATTRIBUTES, one nested
`<point>` with lat/lon/hae/ce/le attributes, and a `<detail>` block
carrying the callsign. Spark's XML expressions map struct fields named
`_x` to attribute `x`, which gives the codec a purely declarative
schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# Unknowns in CoT are conventionally 9999999.0 (node-cot defaults).
COT_UNKNOWN = 9999999.0


def cot_event_schema() -> StructType:
    """Schema of a parsed CoT <event>: `_name` fields are attributes."""
    point = StructType(
        [
            StructField("_lat", DoubleType()),
            StructField("_lon", DoubleType()),
            StructField("_hae", DoubleType()),
            StructField("_ce", DoubleType()),
            StructField("_le", DoubleType()),
        ]
    )
    contact = StructType([StructField("_callsign", StringType())])
    detail = StructType([StructField("contact", contact)])
    return StructType(
        [
            StructField("_version", StringType()),
            StructField("_uid", StringType()),
            StructField("_type", StringType()),
            StructField("_how", StringType()),
            StructField("_time", StringType()),
            StructField("_start", StringType()),
            StructField("_stale", StringType()),
            StructField("point", point),
            StructField("detail", detail),
        ]
    )


def _cot_struct(stale_ms: int) -> Column:
    """Feature row (tracks.transform_features shape) → CoT event struct.

    stale = time + stale_ms, mirroring the reference's retention
    horizon semantics (task.ts:57 RetentionDuration as staleness).
    """
    from etl_everywhere_hub_spark.functions.timeutil import epoch_ms_to_iso

    p = F.col("properties")
    return F.struct(
        F.lit("2.0").alias("_version"),
        F.col("id").alias("_uid"),
        p.getField("type").alias("_type"),
        p.getField("how").alias("_how"),
        p.getField("time").alias("_time"),
        p.getField("start").alias("_start"),
        epoch_ms_to_iso(p.getField("time_ms") + F.lit(stale_ms)).alias("_stale"),
        F.struct(
            F.col("geometry").getField("coordinates")[1].alias("_lat"),
            F.col("geometry").getField("coordinates")[0].alias("_lon"),
            F.lit(COT_UNKNOWN).alias("_hae"),
            F.lit(COT_UNKNOWN).alias("_ce"),
            F.lit(COT_UNKNOWN).alias("_le"),
        ).alias("point"),
        F.struct(
            F.struct(p.getField("callsign").alias("_callsign")).alias("contact")
        ).alias("detail"),
    )


def to_cot_xml(features: DataFrame, stale_ms: int = 3_600_000) -> DataFrame:
    """Features → (id, cot_xml) with one CoT <event> document per row."""
    return features.select(
        "id",
        F.to_xml(_cot_struct(stale_ms), {"rowTag": "event"}).alias("cot_xml"),
    )


def from_cot_xml(df: DataFrame, xml_col: str = "cot_xml") -> DataFrame:
    """Parse CoT <event> XML back to typed columns (codec inverse)."""
    ev = F.from_xml(F.col(xml_col), cot_event_schema(), {"rowTag": "event"})
    return df.select(
        ev.getField("_uid").alias("uid"),
        ev.getField("_type").alias("cot_type"),
        ev.getField("_how").alias("how"),
        ev.getField("_time").alias("time"),
        ev.getField("_start").alias("start"),
        ev.getField("_stale").alias("stale"),
        ev.getField("point").getField("_lat").alias("lat"),
        ev.getField("point").getField("_lon").alias("lon"),
        ev.getField("detail")
        .getField("contact")
        .getField("_callsign")
        .alias("callsign"),
    )
