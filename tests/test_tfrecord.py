"""TFRecord + tf.Example (multimodal/tfrecord.py): framing with both
masked CRC-32Cs verified, protobuf wire walk, packed/expanded repeated
decode. Honest pin boundary (module docstring): no tensorflow/protobuf
exists in this container, so the pins are the public CRC-32C
known-answer vector, hand-derived golden wire bytes (each byte written
out from the spec), and both-direction roundtrips."""
from __future__ import annotations

import struct

import pytest

from etl_everywhere_hub_spark.multimodal.snappy import crc32c
from etl_everywhere_hub_spark.multimodal.tfrecord import (
    example_decode,
    example_encode,
    masked_crc32c,
    pb_fields,
    tfrecord_records,
    tfrecord_write,
)


def test_crc32c_known_answer():
    """The public CRC catalog check value for CRC-32C/Castagnoli, and
    the mask of the empty CRC (rotr15(0) + 0xA282EAD8)."""
    assert crc32c(b"123456789") == 0xE3069283
    assert masked_crc32c(b"") == 0xA282EAD8


def test_example_golden_bytes():
    """{"a": [1]} written out by hand from the spec:
    Example.features (fid1,wt2) > Features.feature map entry
    (fid1,wt2) > key "a" (fid1) + Feature (fid2) > Int64List
    (fid3,wt2) > packed value field (fid1,wt2) holding varint 1."""
    int64_list = b"\x0a\x01\x01"            # Int64List.value packed [1]
    feature = b"\x1a\x03" + int64_list      # Feature.int64_list (5 B)
    entry = b"\x0a\x01a" + b"\x12\x05" + feature      # key + value, 10 B
    features = b"\x0a\x0a" + entry          # Features.feature entry
    example = b"\x0a\x0c" + features        # Example.features
    assert example_encode({"a": [1]}) == example
    assert example_decode(example) == {"a": ("int64", [1])}


def test_packed_and_expanded_decode_agree():
    """The spec requires parsers to accept repeated scalars in BOTH
    encodings; hand-build the expanded forms."""
    # expanded floats: two (fid1,wt5) fixed32 fields
    fl = (b"\x0d" + struct.pack("<f", 1.5)
          + b"\x0d" + struct.pack("<f", -2.25))
    feature = b"\x12" + bytes([len(fl)]) + fl
    entry = b"\x0a\x01f" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert example_decode(example) == {"f": ("float", [1.5, -2.25])}
    packed = example_encode({"f": [1.5, -2.25]})
    assert example_decode(packed) == {"f": ("float", [1.5, -2.25])}
    # expanded int64s: two (fid1,wt0) varints, one negative (10 bytes)
    neg = b"\x08" + b"\xff" * 9 + b"\x01"   # -1 two's complement
    il = b"\x08\x2a" + neg
    feature = b"\x1a" + bytes([len(il)]) + il
    entry = b"\x0a\x01i" + b"\x12" + bytes([len(feature)]) + feature
    features = b"\x0a" + bytes([len(entry)]) + entry
    example = b"\x0a" + bytes([len(features)]) + features
    assert example_decode(example) == {"i": ("int64", [42, -1])}


def test_int64_extremes_roundtrip():
    vals = [0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)]
    ex = example_encode({"v": vals})
    assert example_decode(ex) == {"v": ("int64", vals)}


def test_bytes_and_unicode_roundtrip():
    ex = example_encode({"t": ["é中".encode(), b"\x00\xff" * 10]})
    assert example_decode(ex) == {
        "t": ("bytes", ["é中".encode(), b"\x00\xff" * 10])}


def test_duplicate_map_key_last_wins():
    a1 = example_encode({"k": [1]})
    a2 = example_encode({"k": [2]})
    # splice both Features messages' entries into one Example
    def features_of(ex):
        (_, _, f), = pb_fields(ex)
        return f
    merged_features = features_of(a1) + features_of(a2)
    ex = (b"\x0a" + bytes([len(merged_features)]) + merged_features)
    assert example_decode(ex) == {"k": ("int64", [2])}


def test_encode_type_errors():
    with pytest.raises(ValueError, match="empty feature"):
        example_encode({"x": []})
    with pytest.raises(ValueError, match="mixed kinds"):
        example_encode({"x": [1, "no"]})
    with pytest.raises(ValueError, match="mixed kinds"):
        example_encode({"x": [b"b", 1]})
    with pytest.raises(ValueError, match="unsupported value type"):
        example_encode({"x": [object()]})


def test_pb_wire_errors():
    with pytest.raises(ValueError, match="truncated varint"):
        list(pb_fields(b"\x80"))
    with pytest.raises(ValueError, match="field number 0"):
        list(pb_fields(b"\x00"))
    with pytest.raises(ValueError, match="unsupported wire type"):
        list(pb_fields(b"\x0b"))  # wt=3 (group start)
    with pytest.raises(ValueError, match="truncated length"):
        list(pb_fields(b"\x0a\x05ab"))


def test_tfrecord_framing_roundtrip_and_offsets():
    recs = [b"", b"x", b"123456789" * 100]
    shard = tfrecord_write(recs)
    walked = tfrecord_records(shard)
    assert [r for _, r in walked] == recs
    # offsets: each record costs 16 + len bytes, forward-only (no
    # sync marker exists in this format — the module docstring's
    # split-story boundary)
    assert [o for o, _ in walked] == [0, 16, 33]
    # framing internals for the known-answer record
    (ln,) = struct.unpack("<Q", shard[0:8])
    assert ln == 0
    assert struct.unpack("<I", shard[8:12])[0] == masked_crc32c(
        struct.pack("<Q", 0))


def test_tfrecord_corruption_every_region_is_loud():
    shard = bytearray(tfrecord_write([b"payload one", b"payload two"]))
    for at, what in [(0, "length"), (8, "length CRC"), (12, "data"),
                     (23, "data CRC")]:
        bad = bytearray(shard)
        bad[at] ^= 0x01
        with pytest.raises(ValueError):
            tfrecord_records(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        tfrecord_records(bytes(shard[:-2]))
    with pytest.raises(ValueError, match="truncated length header"):
        tfrecord_records(b"\x01\x02\x03")


def test_varint_eleven_bytes_is_loud():
    """Round-12 review regression: an 11-byte varint (malformed —
    protobuf caps at 10) must raise, never decode to a bogus huge
    value."""
    from etl_everywhere_hub_spark.multimodal.tfrecord import (
        _varint_decode,
    )
    ok = b"\xff" * 9 + b"\x01"          # legal 10-byte varint (-1)
    v, pos = _varint_decode(ok, 0)
    assert pos == 10
    with pytest.raises(ValueError, match="varint too long"):
        _varint_decode(b"\xff" * 10 + b"\x01", 0)
