"""Parquet footer reader — Thrift compact protocol from spec,
dependency-free — round 12.

Why this belongs in the engine: at 100 TB the mechanism that makes
queries cheap is not reading data — it's NOT reading data, and the
thing that decides is the parquet FOOTER: per-row-group, per-column
min/max/null-count statistics plus page offsets. Spark's scan uses
them internally, but an engine that plans its own file skipping
(deltalite's add-stats pruning, a catalog sweep over millions of
files, a "which shards could hold key K" planner) needs to read
footers WITHOUT launching a JVM scan per file — a footer is a ~KB
range request at the file tail, the canonical object-store pattern.
Reference analog: none (task.ts has no file formats) — north-star
scale surface, same posture as sources/avro_ocf.py.

Implemented from the public specs:
- Thrift compact protocol (apache/thrift
  doc/specs/thrift-compact-protocol.md): short-form field headers
  (delta<<4 | type) with long-form zigzag field ids, bool-in-header,
  zigzag varints for i16/i32/i64, fixed 8-byte little-endian
  doubles, varint-length binary, list/set headers (size<<4 | elem
  type, 15 -> varint size), map headers, nested structs with the
  stop byte. The decoder is GENERIC (field-id -> value dicts), so
  the parquet layer below it is a plain schema mapping, not a
  hand-woven parser.
- Parquet file format (apache/parquet-format
  src/main/thrift/parquet.thrift): the PAR1 magic at both ends, the
  4-byte little-endian footer length, FileMetaData / SchemaElement /
  RowGroup / ColumnChunk / ColumnMetaData / Statistics field ids,
  the physical-type / codec / encoding enums, and the plain-encoded
  statistics values (INT32/INT64 little-endian, FLOAT/DOUBLE IEEE
  LE, BYTE_ARRAY raw UTF-8 bytes, BOOLEAN single byte). Both the
  modern min_value/max_value (field 5/6, order defined by the
  column's logical type) and the legacy min/max (field 1/2) pairs
  are surfaced; readers must prefer 5/6.

Foreign pins (tests/test_parquet_meta.py): DuckDB's
``parquet_metadata()`` table function over the SAME files — every
offset, size, count, codec, encoding list, and rendered stat value
matches row for row — plus pyarrow's metadata API on multi-row-group
files with nulls, and files written by Spark itself, DuckDB, and
pyarrow (three independent writers; ours is read-only by design —
the engine writes parquet through Spark).

Scale posture: ``footer_stats`` needs only the file TAIL (the
``tail_bytes`` contract states how much: footer length + 8; a 1 MiB
tail covers every real footer we've seen and the decoder tells you
loudly when it doesn't). A catalog sweep is then: list files, range-
read tails in parallel tasks, decode worker-side — bytes moved are
O(files x footer), not O(data). The q372 query does exactly that
shape over the testdata tables and proves the decoded stats against
the data itself relationally.
"""
from __future__ import annotations

import struct

_MAGIC = b"PAR1"

# thrift compact wire types
_STOP, _TRUE, _FALSE, _BYTE, _I16, _I32, _I64 = 0, 1, 2, 3, 4, 5, 6
_DOUBLE, _BINARY, _LIST, _SET, _MAP, _STRUCT = 7, 8, 9, 10, 11, 12

PHYSICAL_TYPES = {
    0: "BOOLEAN", 1: "INT32", 2: "INT64", 3: "INT96", 4: "FLOAT",
    5: "DOUBLE", 6: "BYTE_ARRAY", 7: "FIXED_LEN_BYTE_ARRAY",
}
CODECS = {
    0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO", 4: "BROTLI",
    5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW",
}
ENCODINGS = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}


class ThriftCompactReader:
    """Generic thrift compact-protocol decoder. Structs decode to
    {field_id: value}; lists/sets to python lists, maps to dicts,
    binary to bytes. Unknown field TYPES raise (a skipped-but-
    undecodable field would silently drop data)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("thrift: truncated input")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def _varint(self) -> int:
        shift = acc = 0
        while True:
            if self.pos >= len(self.data):
                raise ValueError("thrift: truncated varint")
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return acc
            shift += 7
            if shift >= 70:
                # 10 groups carry 70 bits > 64 — an 11th byte is
                # malformed (round-12 review: the old `> 70` let an
                # 11-byte varint through)
                raise ValueError("thrift: varint too long")

    def _zigzag(self) -> int:
        z = self._varint()
        return (z >> 1) ^ -(z & 1)

    def _value(self, wt: int, in_field: bool = False):
        if wt in (_TRUE, _FALSE):
            # bools carry their value IN the field header only for
            # struct fields; as list/set/map ELEMENTS each bool is
            # one byte (round-12 review: the old code consumed zero
            # bytes there and silently desynced)
            if in_field:
                return wt == _TRUE
            b = self._take(1)[0]
            if b == 1:
                return True
            if b in (0, 2):
                return False
            raise ValueError(f"thrift: invalid bool element {b}")
        if wt == _BYTE:
            return struct.unpack("b", self._take(1))[0]
        if wt in (_I16, _I32, _I64):
            return self._zigzag()
        if wt == _DOUBLE:
            return struct.unpack("<d", self._take(8))[0]
        if wt == _BINARY:
            return self._take(self._varint())
        if wt in (_LIST, _SET):
            hdr = self._take(1)[0]
            size = hdr >> 4
            et = hdr & 0x0F
            if size == 15:
                size = self._varint()
            return [self._value(et) for _ in range(size)]
        if wt == _MAP:
            size = self._varint()
            if size == 0:
                return {}
            hdr = self._take(1)[0]
            kt, vt = hdr >> 4, hdr & 0x0F
            return {self._value(kt): self._value(vt)
                    for _ in range(size)}
        if wt == _STRUCT:
            return self.read_struct()
        raise ValueError(f"thrift: unknown wire type {wt}")

    def read_struct(self) -> dict:
        out = {}
        last_fid = 0
        while True:
            b = self._take(1)[0]
            if b == _STOP:
                return out
            delta = b >> 4
            wt = b & 0x0F
            if delta == 0:
                fid = self._zigzag()
            else:
                fid = last_fid + delta
            out[fid] = self._value(wt, in_field=True)
            last_fid = fid


# ------------------------------------------------------------- parquet

def parse_footer(data: bytes) -> dict:
    """Parse a parquet footer from ``data``, which may be the whole
    file or just a TAIL slice that still contains the full footer
    (length + 8 trailing bytes). Returns the raw FileMetaData struct
    plus convenience fields."""
    if len(data) < 12:
        raise ValueError("parquet: shorter than the minimal file")
    if data[-4:] != _MAGIC:
        raise ValueError("parquet: missing trailing PAR1 magic")
    meta_len = struct.unpack("<I", data[-8:-4])[0]
    if meta_len + 8 > len(data):
        raise ValueError(
            f"parquet: footer is {meta_len} bytes but only "
            f"{len(data) - 8} tail bytes were provided — widen the "
            "tail range request"
        )
    raw = data[len(data) - 8 - meta_len: len(data) - 8]
    fmd = ThriftCompactReader(raw).read_struct()
    if 3 not in fmd or 4 not in fmd:
        raise ValueError("parquet: FileMetaData missing num_rows/row_groups")
    return {
        "version": fmd.get(1),
        "num_rows": fmd[3],
        "created_by": (fmd.get(6) or b"").decode("utf-8", "replace"),
        "schema": fmd.get(2, []),
        "row_groups": fmd[4],
        "raw": fmd,
    }


def _decode_stat(val: bytes | None, ptype: int):
    """Plain-decode one statistics value per physical type. BYTE_ARRAY
    renders as UTF-8 text (parquet string stats are raw bytes; all
    engine uses are string columns). INT96 has no defined stats
    order — refuse rather than guess."""
    if val is None:
        return None
    t = PHYSICAL_TYPES.get(ptype)
    if t == "BOOLEAN":
        return val != b"\x00"
    if t == "INT32":
        return struct.unpack("<i", val)[0]
    if t == "INT64":
        return struct.unpack("<q", val)[0]
    if t == "FLOAT":
        return struct.unpack("<f", val)[0]
    if t == "DOUBLE":
        return struct.unpack("<d", val)[0]
    if t in ("BYTE_ARRAY", "FIXED_LEN_BYTE_ARRAY"):
        return val.decode("utf-8", "replace")
    raise ValueError(f"parquet: no stats decode for {t}")


def footer_stats(data: bytes) -> list:
    """Flatten the footer into one dict per (row group, column chunk):
    path, physical type, codec, encodings, num_values, sizes, page
    offsets, and decoded statistics (min/max prefer the modern
    min_value/max_value fields 5/6, falling back to legacy 1/2 —
    identical for the integer columns the engine prunes on). This is
    the file-skipping planner's input."""
    f = parse_footer(data)
    # flat-leaf logical annotation: SchemaElement field 10 is the
    # LogicalType union per parquet.thrift — 1 STRING, 2 MAP, 3 LIST,
    # 4 ENUM, 5 DECIMAL, 6 DATE, 7 TIME, 8 TIMESTAMP, 10 INTEGER
    # (IntType{bitWidth=1, isSigned=2}), 11 UNKNOWN, 12 JSON,
    # 13 BSON, 14 UUID, 15 FLOAT16 (round-12 review: 10/11 were
    # previously mislabeled UUID/FLOAT16, which defeated the
    # catalog-sweep prune gate for sized-int columns); field 6 is
    # the legacy ConvertedType enum
    _LOGICAL = {1: "STRING", 2: "MAP", 3: "LIST", 4: "ENUM",
                5: "DECIMAL", 6: "DATE", 7: "TIME", 8: "TIMESTAMP",
                10: "INTEGER", 11: "UNKNOWN", 12: "JSON", 13: "BSON",
                14: "UUID", 15: "FLOAT16"}
    _UNIT = {1: "MILLIS", 2: "MICROS", 3: "NANOS"}
    logical = {}
    for el in f["schema"][1:]:
        name = el.get(4, b"").decode("utf-8")
        lt = el.get(10)
        if isinstance(lt, dict) and lt:
            fid = next(iter(lt))
            tag = _LOGICAL.get(fid, f"?{fid}")
            if tag in ("TIMESTAMP", "TIME"):
                unit = lt[fid].get(2, {})
                u = next(iter(unit)) if isinstance(unit, dict) and unit \
                    else None
                tag = f"{tag}({_UNIT.get(u, '?')})"
            elif tag == "INTEGER":
                it = lt[fid]
                tag = "INTEGER(%s,%s)" % (
                    it.get(1, "?"),
                    "signed" if it.get(2, True) else "unsigned")
            logical[name] = tag
        elif 6 in el:
            logical[name] = f"CONVERTED:{el[6]}"
    out = []
    for rg_ix, rg in enumerate(f["row_groups"]):
        rg_rows = rg.get(3)
        for cc in rg.get(1, []):
            md = cc.get(3)
            if md is None:
                raise ValueError(
                    "parquet: ColumnChunk without inline metadata "
                    "(external column metadata unsupported)"
                )
            ptype = md[1]
            stats = md.get(12, {})
            out.append({
                "row_group": rg_ix,
                "rg_num_rows": rg_rows,
                "path": ".".join(
                    p.decode("utf-8") for p in md.get(3, [])),
                "type": PHYSICAL_TYPES.get(ptype, f"?{ptype}"),
                # annotations are declared on schema ELEMENTS; for
                # nested paths (list/map wrappers) the leaf element
                # name carries the leaf's annotation
                "logical": logical.get(
                    ".".join(p.decode("utf-8") for p in md.get(3, [])))
                or logical.get(
                    md[3][-1].decode("utf-8") if md.get(3) else ""),
                "codec": CODECS.get(md[4], f"?{md[4]}"),
                "encodings": sorted(
                    ENCODINGS.get(e, f"?{e}") for e in md.get(2, [])),
                "num_values": md[5],
                "total_uncompressed_size": md.get(6),
                "total_compressed_size": md.get(7),
                "data_page_offset": md.get(9),
                "dictionary_page_offset": md.get(11),
                "null_count": stats.get(3),
                "distinct_count": stats.get(4),
                "min": _decode_stat(
                    stats.get(6, stats.get(2)), ptype),
                "max": _decode_stat(
                    stats.get(5, stats.get(1)), ptype),
            })
    return out


def read_footer_tail(path: str, tail: int = 1 << 20) -> bytes:
    """The range-request shape: read at most ``tail`` bytes from the
    file end — what an object-store catalog sweep issues per file.
    parse_footer raises with a widen-the-range message if the footer
    is larger."""
    import os

    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        if size > tail:
            fh.seek(size - tail)
        return fh.read()
