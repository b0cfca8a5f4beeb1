"""Avro Object Container File codec: from-spec reader/writer
(sources/avro_ocf.py) pinned against Spark's own JVM Avro library
(avro-1.12.1.jar, reached via py4j) as the FOREIGN encoder/decoder —
both directions, under all six spec codecs (the JVM side routes
snappy through snappy-java, zstandard through zstd-jni, bzip2/xz
through commons-compress; our side routes every one of them through
the repo's own from-spec codec modules)."""
from __future__ import annotations

import json
import struct

import pytest

from etl_everywhere_hub_spark.sources.avro_ocf import (
    OCF_CODECS,
    _Reader,
    _Writer,
    avro_schema_to_spark,
    ocf_block_records,
    ocf_blocks,
    ocf_header,
    ocf_records,
    ocf_write,
    parse_schema,
)

_SCHEMA = json.dumps({
    "type": "record", "name": "R", "namespace": "t", "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "f", "type": "double"},
        {"name": "b", "type": "bytes"},
        {"name": "ok", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "e", "type": {
            "type": "enum", "name": "E", "symbols": ["A", "B", "C"]}},
        {"name": "fx", "type": {"type": "fixed", "name": "FX", "size": 4}},
        {"name": "alt", "type": ["null", "string"]},
    ],
})


def _recs(n: int) -> list:
    return [
        {
            "id": (-1) ** i * i * 3_000_000_007,
            "s": "doc %d é中" % i,
            "f": i / 7.0,
            "b": bytes([i % 256, 255 - i % 256]),
            "ok": i % 2 == 0,
            "tags": ["t%d" % (i % 5)] * (i % 3),
            "m": {"k%d" % (i % 4): i, "n": -i},
            "e": "ABC"[i % 3],
            "fx": struct.pack(">I", i),
            "alt": None if i % 3 == 0 else "alt%d" % i,
        }
        for i in range(n)
    ]


# ---------------------------------------------------------- pure binary

def test_zigzag_spec_vectors():
    """The spec's own zigzag table: 0->00 -1->01 1->02 -2->03 2->04,
    and 64 crossing the 1-byte varint boundary (-> 80 01)."""
    w = _Writer()
    for v in (0, -1, 1, -2, 2, 64, -65):
        w.write_long(v)
    assert bytes(w.buf) == bytes([0, 1, 2, 3, 4, 0x80, 1, 0x81, 1])
    r = _Reader(bytes(w.buf))
    assert [r.read_long() for _ in range(7)] == [0, -1, 1, -2, 2, 64, -65]


def test_long_range_edges():
    w = _Writer()
    w.write_long(2**63 - 1)
    w.write_long(-(2**63))
    r = _Reader(bytes(w.buf))
    assert r.read_long() == 2**63 - 1
    assert r.read_long() == -(2**63)
    with pytest.raises(ValueError, match="out of 64-bit"):
        w.write_long(2**63)
    with pytest.raises(ValueError, match="truncated varint"):
        _Reader(b"\x80").read_long()
    with pytest.raises(ValueError, match="longer than 10"):
        _Reader(b"\x80" * 11).read_long()


def test_negative_block_count_arrays_and_maps():
    """The spec's skip-aid form: a NEGATIVE item count followed by the
    block's byte size. Real writers emit it for large blocks; we
    hand-build it and the reader must accept both forms."""
    sch = parse_schema(json.dumps(
        {"type": "record", "name": "N", "fields": [
            {"name": "a", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
        ]}))
    body = _Writer()
    inner = _Writer()
    for v in (5, 6, 7):
        inner.write_long(v)
    body.write_long(-3)                    # negative count
    body.write_long(len(inner.buf))        # ... then byte size
    body.buf += inner.buf
    body.write_long(0)                     # array terminator
    kv = _Writer()
    kv.write_value(parse_schema('"string"'), "k")
    kv.write_value(parse_schema('"string"'), "v")
    body.write_long(-1)
    body.write_long(len(kv.buf))
    body.buf += kv.buf
    body.write_long(0)
    r = _Reader(bytes(body.buf))
    assert r.read_value(sch) == {"a": [5, 6, 7], "m": {"k": "v"}}
    assert r.pos == len(body.buf)


def test_schema_parse_errors_and_refs():
    with pytest.raises(ValueError, match="unknown type reference"):
        parse_schema('"nosuch"')
    with pytest.raises(ValueError, match="malformed schema"):
        parse_schema('{"name": "x"}')
    # named reference + namespace fullname resolution
    s = parse_schema(json.dumps({
        "type": "record", "name": "Outer", "namespace": "ns", "fields": [
            {"name": "e1", "type": {
                "type": "enum", "name": "E", "symbols": ["X"]}},
            {"name": "e2", "type": "E"},
            {"name": "e3", "type": "ns.E"},
        ]}))
    assert s.fields[1][1] is s.fields[0][1]
    assert s.fields[2][1] is s.fields[0][1]
    # recursion is legal through a union (a linked list)
    lst = parse_schema(json.dumps({
        "type": "record", "name": "Cell", "fields": [
            {"name": "v", "type": "long"},
            {"name": "next", "type": ["null", "Cell"]},
        ]}))
    w = _Writer()
    w.write_value(lst, {"v": 1, "next": {"v": 2, "next": None}})
    back = _Reader(bytes(w.buf)).read_value(lst)
    assert back == {"v": 1, "next": {"v": 2, "next": None}}
    with pytest.raises(ValueError, match="no Spark type"):
        avro_schema_to_spark(lst)


# ------------------------------------------------------------ container

@pytest.mark.parametrize("codec", OCF_CODECS)
def test_roundtrip_all_codecs(codec):
    recs = _recs(157)
    blob = ocf_write(_SCHEMA, recs, codec=codec, block_records=40)
    hdr = ocf_header(blob)
    assert hdr["codec"] == codec
    assert ocf_records(blob) == recs
    blks = ocf_blocks(blob)
    assert [b["count"] for b in blks] == [40, 40, 40, 37]
    # the split-point story: decode ONE block independently from its
    # own bytes and get exactly the full walk's slice
    mid = ocf_block_records(blks[1]["data"], blks[1]["count"], codec,
                            hdr["schema"])
    assert mid == recs[40:80]


def test_deterministic_output():
    recs = _recs(30)
    assert ocf_write(_SCHEMA, recs, codec="deflate") == \
        ocf_write(_SCHEMA, recs, codec="deflate")


def test_container_corruption_is_loud():
    blob = bytearray(ocf_write(_SCHEMA, _recs(50), block_records=20))
    with pytest.raises(ValueError, match="bad magic"):
        ocf_header(b"PAR1" + bytes(blob[4:]))
    # flip one byte of the FIRST block's sync marker
    hdr = ocf_header(bytes(blob))
    first = ocf_blocks(bytes(blob))[0]
    sync_at = first["offset"] + 2 + first["size"]  # 2 varint bytes here
    # locate precisely instead: find the sync right after block data
    sync_at = bytes(blob).index(hdr["sync"], hdr["pos"])
    blob[sync_at] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker mismatch"):
        ocf_blocks(bytes(blob))
    with pytest.raises(ValueError, match="unsupported codec"):
        ocf_write(_SCHEMA, [], codec="lzo")
    # truncated mid-block
    good = ocf_write(_SCHEMA, _recs(50), block_records=50)
    with pytest.raises(ValueError, match="truncated"):
        ocf_blocks(good[:-20])


def test_snappy_block_crc_is_checked():
    blob = bytearray(ocf_write(_SCHEMA, _recs(20), codec="snappy",
                               block_records=20))
    hdr = ocf_header(bytes(blob))
    blk = ocf_blocks(bytes(blob))[0]
    # the 4 CRC bytes are the block's tail: flip one
    crc_at = bytes(blob).index(blk["data"]) + blk["size"] - 1
    blob[crc_at] ^= 0x01
    with pytest.raises(ValueError, match="CRC-32 mismatch|snappy"):
        ocf_records(bytes(blob))
    assert hdr["codec"] == "snappy"


def test_trailing_bytes_in_block_are_loud():
    sch = parse_schema(_SCHEMA)
    w = _Writer()
    w.write_value(sch, _recs(1)[0])
    w.buf += b"JUNK"
    with pytest.raises(ValueError, match="trailing bytes"):
        ocf_block_records(bytes(w.buf), 1, "null", sch)


# ------------------------------------------------------- JVM foreign pin

def _jvm_write(spark, tmp_path, schema_json, rows, codec_call):
    """Write an OCF via org.apache.avro DataFileWriter (the foreign
    encoder living in this Spark's own classpath)."""
    jvm = spark._jvm
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema_json)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    cf = jvm.org.apache.avro.file.CodecFactory
    w.setCodec(codec_call(cf))
    f = str(tmp_path / "jvm.avro")
    w.create(sch, jvm.java.io.File(f))
    for r in rows:
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        for k, v in r.items():
            rec.put(k, v)
        w.append(rec)
    w.close()
    return open(f, "rb").read()


_JVM_CODECS = [
    ("null", lambda cf: cf.nullCodec()),
    ("deflate", lambda cf: cf.deflateCodec(6)),
    ("snappy", lambda cf: cf.snappyCodec()),
    ("bzip2", lambda cf: cf.bzip2Codec()),
    ("xz", lambda cf: cf.xzCodec(6)),
    ("zstandard", lambda cf: cf.zstandardCodec(3)),
]


@pytest.mark.parametrize("codec,call", _JVM_CODECS,
                         ids=[c for c, _ in _JVM_CODECS])
def test_jvm_writes_we_read(spark, tmp_path, codec, call):
    """Avro 1.12 (the JVM library Spark itself ships) writes under
    every spec codec; our from-spec reader decodes it exactly —
    including the random sync markers and whatever block split the
    JVM chose."""
    schema = json.dumps({
        "type": "record", "name": "J", "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
        ]})
    rows = [{"id": i * 77, "s": "payload %d " % i + "x" * (i % 40)}
            for i in range(400)]
    blob = _jvm_write(spark, tmp_path, schema, rows, call)
    hdr = ocf_header(blob)
    assert hdr["codec"] == codec
    assert ocf_records(blob) == rows


def test_jvm_reads_what_we_write(spark, tmp_path):
    """The reverse pin: our writer's files (engine codecs inside) open
    in the JVM DataFileReader and yield the same records."""
    jvm = spark._jvm
    schema = json.dumps({
        "type": "record", "name": "J", "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "alt", "type": ["null", "long"]},
        ]})
    rows = [{"id": i, "s": "r%d" % i, "alt": None if i % 2 else i * i}
            for i in range(300)]
    for codec in OCF_CODECS:
        f = str(tmp_path / f"ours-{codec}.avro")
        with open(f, "wb") as fh:
            fh.write(ocf_write(schema, rows, codec=codec,
                               block_records=64))
        rd = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(f),
            jvm.org.apache.avro.generic.GenericDatumReader())
        got = []
        while rd.hasNext():
            rec = rd.next()
            alt = rec.get("alt")
            got.append({"id": rec.get("id"),
                        "s": rec.get("s").toString(),
                        "alt": alt})
        rd.close()
        assert got == rows, codec


def test_jvm_complex_types_pin(spark, tmp_path):
    """Arrays/maps/enums/fixed/bytes through the JVM writer, decoded
    by us — the full binary-encoding surface against the foreign
    encoder, not just scalars."""
    jvm = spark._jvm
    schema = json.dumps({
        "type": "record", "name": "C", "fields": [
            {"name": "tags", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "e", "type": {
                "type": "enum", "name": "E2", "symbols": ["P", "Q"]}},
            {"name": "fx", "type": {
                "type": "fixed", "name": "F2", "size": 3}},
            {"name": "raw", "type": "bytes"},
        ]})
    sch = jvm.org.apache.avro.Schema.Parser().parse(schema)
    w = jvm.org.apache.avro.file.DataFileWriter(
        jvm.org.apache.avro.generic.GenericDatumWriter(sch))
    f = str(tmp_path / "cplx.avro")
    w.create(sch, jvm.java.io.File(f))
    for i in range(50):
        rec = jvm.org.apache.avro.generic.GenericData.Record(sch)
        arr = jvm.java.util.ArrayList()
        for v in range(i % 4):
            arr.add(v * 11)
        rec.put("tags", arr)
        m = jvm.java.util.HashMap()
        m.put("k%d" % i, "v%d" % i)
        rec.put("m", m)
        rec.put("e", jvm.org.apache.avro.generic.GenericData.EnumSymbol(
            sch.getField("e").schema(), "PQ"[i % 2]))
        rec.put("fx", jvm.org.apache.avro.generic.GenericData.Fixed(
            sch.getField("fx").schema(),
            bytearray([i % 256, 1, 2])))
        rec.put("raw", jvm.java.nio.ByteBuffer.wrap(
            bytearray([i % 256] * (i % 5))))
        w.append(rec)
    w.close()
    got = ocf_records(open(f, "rb").read())
    assert len(got) == 50
    for i, r in enumerate(got):
        assert r["tags"] == [v * 11 for v in range(i % 4)]
        assert r["m"] == {"k%d" % i: "v%d" % i}
        assert r["e"] == "PQ"[i % 2]
        assert r["fx"] == bytes([i % 256, 1, 2])
        assert r["raw"] == bytes([i % 256] * (i % 5))


# ------------------------------------------------------------ spark side

def test_read_avro_dataframe(spark, tmp_path):
    """binaryFile -> mapInPandas path: two files, multi-block, deflate;
    schema mapped to Spark types; [null,X] union -> nullable."""
    schema = json.dumps({
        "type": "record", "name": "D", "fields": [
            {"name": "id", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "alt", "type": ["null", "double"]},
        ]})
    rows = [{"id": i, "s": "s%d" % i, "alt": None if i % 3 else i / 2.0}
            for i in range(200)]
    d = tmp_path / "tbl"
    d.mkdir()
    for part in range(2):
        with open(str(d / f"part-{part}.avro"), "wb") as fh:
            fh.write(ocf_write(schema, rows[part * 100:(part + 1) * 100],
                               codec="deflate", block_records=30))
    from etl_everywhere_hub_spark.sources.avro_ocf import read_avro
    df = read_avro(spark, str(d))
    assert [f.name for f in df.schema.fields] == ["id", "s", "alt"]
    got = sorted(
        ((r.id, r.s, r.alt) for r in df.collect()), key=lambda t: t[0])
    want = [(r["id"], r["s"], r["alt"]) for r in rows]
    assert got == want


def test_read_avro_schema_drift_is_loud(spark, tmp_path):
    s1 = json.dumps({"type": "record", "name": "D", "fields": [
        {"name": "id", "type": "long"}]})
    s2 = json.dumps({"type": "record", "name": "D", "fields": [
        {"name": "id", "type": "string"}]})
    d = tmp_path / "drift"
    d.mkdir()
    open(str(d / "a.avro"), "wb").write(ocf_write(s1, [{"id": 1}]))
    open(str(d / "b.avro"), "wb").write(ocf_write(s2, [{"id": "x"}]))
    from etl_everywhere_hub_spark.sources.avro_ocf import read_avro
    with pytest.raises(Exception, match="schema drift"):
        read_avro(spark, str(d)).collect()
