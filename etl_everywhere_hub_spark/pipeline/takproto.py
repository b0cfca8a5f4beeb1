"""TAK protobuf CoT codec — reference capability F1 (second half).

The reference's framework emits CoT both as XML and as TAK protobuf
(`@tak-ps/node-cot` depends on `protobufjs`,
/root/reference/package-lock.json:1581); every modern TAK transport is
protobuf-first. This module is a dependency-free fixed-schema codec
for the PUBLIC TAK protocol version 1 message (the `TakMessage` /
`CotEvent` schema published by TAK.gov and mirrored in takproto /
node-cot), hand-rolled because this container has no protobuf package:
protobuf wire format is just tagged varints + length-delimited bytes,
and the schema is small and frozen, so a few dozen lines of pure
Python cover encode and decode exactly.

Wire schema (field numbers from the public takmessage.proto):

    TakMessage { CotEvent cotEvent = 2; }
    CotEvent {
        string type = 1;  string uid = 5;
        uint64 sendTime = 6; uint64 startTime = 7; uint64 staleTime = 8;
        string how = 9;
        double lat = 10; double lon = 11;
        double hae = 12; double ce = 13; double le = 14;
        Detail detail = 15;
    }
    Detail  { Contact contact = 2; }
    Contact { string endpoint = 1; string callsign = 2; }

Mesh-SA framing: the 3-byte header 0xbf 0x01 0xbf precedes the
TakMessage payload (TAK protocol version 1 announcement).

Spark integration is Arrow-batched (pandas UDFs over the feature
frame) — binary packing is genuinely Python-side work here, never
row-at-a-time. The XML codec (pipeline/cot.py) stays the codegen path
for XML transports; tests pin field equivalence between the two.
"""

from __future__ import annotations

import struct
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MESH_HEADER = b"\xbf\x01\xbf"

_WT_VARINT = 0
_WT_I64 = 1
_WT_LEN = 2


# --- wire primitives -------------------------------------------------------


def _uvarint(n: int) -> bytes:
    if n < 0:
        raise ValueError("uvarint encodes non-negative integers only")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated uvarint: buffer ended mid-value")
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 63:
            raise ValueError("uvarint longer than 64 bits")


def _tag(field: int, wt: int) -> bytes:
    return _uvarint((field << 3) | wt)


def _f_varint(field: int, n: int) -> bytes:
    return _tag(field, _WT_VARINT) + _uvarint(n) if n else b""


def _f_double(field: int, x: float) -> bytes:
    # proto3 default-elision: 0.0 is omitted
    return _tag(field, _WT_I64) + struct.pack("<d", x) if x != 0.0 else b""


def _f_bytes(field: int, b: bytes) -> bytes:
    return _tag(field, _WT_LEN) + _uvarint(len(b)) + b if b else b""


def _f_str(field: int, s: str | None) -> bytes:
    return _f_bytes(field, s.encode("utf-8")) if s else b""


# --- CotEvent encode -------------------------------------------------------


def encode_cot_event(
    *,
    uid: str,
    cot_type: str,
    how: str | None = None,
    send_ms: int = 0,
    start_ms: int = 0,
    stale_ms: int = 0,
    lat: float = 0.0,
    lon: float = 0.0,
    hae: float = 0.0,
    ce: float = 0.0,
    le: float = 0.0,
    callsign: str | None = None,
    endpoint: str | None = None,
    mesh_header: bool = True,
) -> bytes:
    """One feature → TAK protocol v1 bytes (TakMessage, mesh-framed)."""
    contact = _f_str(1, endpoint) + _f_str(2, callsign)
    detail = _f_bytes(2, contact)
    ev = (
        _f_str(1, cot_type)
        + _f_str(5, uid)
        + _f_varint(6, send_ms)
        + _f_varint(7, start_ms)
        + _f_varint(8, stale_ms)
        + _f_str(9, how)
        + _f_double(10, lat)
        + _f_double(11, lon)
        + _f_double(12, hae)
        + _f_double(13, ce)
        + _f_double(14, le)
        + _f_bytes(15, detail)
    )
    msg = _f_bytes(2, ev)
    return (MESH_HEADER + msg) if mesh_header else msg


# --- decode (schema-directed, skips unknown fields per proto rules) --------


def _parse_fields(buf: bytes) -> dict[int, Any]:
    """One pass over a message's fields; last-one-wins per proto3."""
    out: dict[int, Any] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_uvarint(buf, pos)
        field, wt = key >> 3, key & 0x07
        if wt == _WT_VARINT:
            out[field], pos = _read_uvarint(buf, pos)
        elif wt == _WT_I64:
            if pos + 8 > len(buf):
                raise ValueError("truncated i64 field")
            out[field] = struct.unpack_from("<d", buf, pos)[0]
            pos += 8
        elif wt == _WT_LEN:
            ln, pos = _read_uvarint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError(
                    f"truncated length-delimited field: need {ln} bytes, "
                    f"have {len(buf) - pos}"
                )
            out[field] = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit — not in this schema, skip by width
            if pos + 4 > len(buf):
                raise ValueError("truncated i32 field")
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
    return out


def decode_tak_message(b: bytes) -> dict[str, Any]:
    """TAK bytes (mesh-framed or bare TakMessage) → flat dict."""
    if b[:3] == MESH_HEADER:
        b = b[3:]
    msg = _parse_fields(bytes(b))
    ev = _parse_fields(msg.get(2, b""))
    detail = _parse_fields(ev.get(15, b""))
    contact = _parse_fields(detail.get(2, b""))

    def s(v: Any) -> str | None:
        return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else v

    return {
        "cot_type": s(ev.get(1)),
        "uid": s(ev.get(5)),
        "send_ms": int(ev.get(6, 0)),
        "start_ms": int(ev.get(7, 0)),
        "stale_ms": int(ev.get(8, 0)),
        "how": s(ev.get(9)),
        "lat": float(ev.get(10, 0.0)),
        "lon": float(ev.get(11, 0.0)),
        "hae": float(ev.get(12, 0.0)),
        "ce": float(ev.get(13, 0.0)),
        "le": float(ev.get(14, 0.0)),
        "callsign": s(contact.get(2)),
        "endpoint": s(contact.get(1)),
    }


# --- Spark plumbing (Arrow-batched) ----------------------------------------

TAK_DECODED_SCHEMA = StructType(
    [
        StructField("uid", StringType()),
        StructField("cot_type", StringType()),
        StructField("how", StringType()),
        StructField("send_ms", LongType()),
        StructField("start_ms", LongType()),
        StructField("stale_ms", LongType()),
        StructField("lat", DoubleType()),
        StructField("lon", DoubleType()),
        StructField("hae", DoubleType()),
        StructField("ce", DoubleType()),
        StructField("le", DoubleType()),
        StructField("callsign", StringType()),
    ]
)


def to_tak_protobuf(features: DataFrame, stale_ms: int = 3_600_000) -> DataFrame:
    """Feature frame (pipeline.tracks.transform_features shape) →
    (id, tak_pb binary). The same staleness rule as to_cot_xml:
    stale = time + stale_ms."""
    from etl_everywhere_hub_spark.pipeline.cot import COT_UNKNOWN

    flat = features.select(
        "id",
        F.col("properties.type").alias("cot_type"),
        F.col("properties.how").alias("how"),
        F.col("properties.time_ms").alias("time_ms"),
        F.col("properties.callsign").alias("callsign"),
        F.col("geometry.coordinates")[1].alias("lat"),
        F.col("geometry.coordinates")[0].alias("lon"),
    )

    @F.pandas_udf(BinaryType())
    def _enc(
        uid: pd.Series,
        cot_type: pd.Series,
        how: pd.Series,
        time_ms: pd.Series,
        callsign: pd.Series,
        lat: pd.Series,
        lon: pd.Series,
    ) -> pd.Series:
        out = [
            encode_cot_event(
                uid=u,
                cot_type=t,
                how=h,
                send_ms=int(tm),
                start_ms=int(tm),
                stale_ms=int(tm) + stale_ms,
                lat=float(la),
                lon=float(lo),
                hae=COT_UNKNOWN,
                ce=COT_UNKNOWN,
                le=COT_UNKNOWN,
                callsign=c,
            )
            for u, t, h, tm, c, la, lo in zip(
                uid, cot_type, how, time_ms, callsign, lat, lon
            )
        ]
        return pd.Series(out)

    return flat.select(
        "id",
        _enc("id", "cot_type", "how", "time_ms", "callsign", "lat", "lon").alias(
            "tak_pb"
        ),
    )


def from_tak_protobuf(df: DataFrame, pb_col: str = "tak_pb") -> DataFrame:
    """(.., tak_pb) → typed columns (codec inverse), Arrow-batched."""

    @F.pandas_udf(TAK_DECODED_SCHEMA)
    def _dec(pb: pd.Series) -> pd.DataFrame:
        rows = [decode_tak_message(b) for b in pb]
        return pd.DataFrame(
            {
                name: [r[name] for r in rows]
                for name in TAK_DECODED_SCHEMA.fieldNames()
            }
        )

    ev = _dec(F.col(pb_col))
    return df.select(ev.alias("ev")).select("ev.*")
