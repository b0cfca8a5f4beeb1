"""CBOR (multimodal/cbor.py) pinned against RFC 8949 Appendix A —
the spec's OWN encoding<->value table, byte-for-byte in both
directions where the canonical encoder applies, decode-only for the
indefinite-length / alternate-width rows the appendix lists."""
from __future__ import annotations

import math

import pytest

from etl_everywhere_hub_spark.multimodal.cbor import (
    Tag,
    UNDEFINED,
    cbor_decode,
    cbor_encode,
    cbor_sequence,
)


def h(s: str) -> bytes:
    return bytes.fromhex(s)


# RFC 8949 Appendix A rows where our canonical encoder produces the
# listed bytes exactly — pinned BOTH directions.
BIDIRECTIONAL = [
    (0, "00"), (1, "01"), (10, "0a"), (23, "17"),
    (24, "1818"), (25, "1819"), (100, "1864"), (1000, "1903e8"),
    (1000000, "1a000f4240"),
    (1000000000000, "1b000000e8d4a51000"),
    (18446744073709551615, "1bffffffffffffffff"),
    (-1, "20"), (-10, "29"), (-100, "3863"), (-1000, "3903e7"),
    (-18446744073709551616, "3bffffffffffffffff"),
    (False, "f4"), (True, "f5"), (None, "f6"),
    (b"", "40"), (h("01020304"), "4401020304"),
    ("", "60"), ("a", "6161"), ("IETF", "6449455446"),
    ('"\\', "62225c"), ("ü", "62c3bc"), ("水", "63e6b0b4"),
    ([], "80"), ([1, 2, 3], "83010203"),
    ([1, [2, 3], [4, 5]], "8301820203820405"),
    (list(range(1, 26)),
     "98190102030405060708090a0b0c0d0e0f101112131415161718181819"),
    ({}, "a0"), ({1: 2, 3: 4}, "a201020304"),
    ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
    ({"a": "A", "b": "B", "c": "C", "d": "D", "e": "E"},
     "a56161614161626142616361436164614461656145"),
    (["a", {"b": "c"}], "826161a161626163"),
    # floats at their preferred (smallest round-tripping) width
    (0.0, "f90000"), (-0.0, "f98000"), (1.0, "f93c00"),
    (1.5, "f93e00"), (65504.0, "f97bff"),
    (5.960464477539063e-8, "f90001"),
    (0.00006103515625, "f90400"), (-4.0, "f9c400"),
    (100000.0, "fa47c35000"),
    (3.4028234663852886e38, "fa7f7fffff"),
    (1.1, "fb3ff199999999999a"), (-4.1, "fbc010666666666666"),
    (1.0e300, "fb7e37e43c8800759c"),
    (math.inf, "f97c00"), (-math.inf, "f9fc00"),
    # tags
    (Tag(0, "2013-03-21T20:04:00Z"),
     "c074323031332d30332d32315432303a30343a30305a"),
    (Tag(1, 1363896240), "c11a514b67b0"),
    (Tag(23, h("01020304")), "d74401020304"),
    (Tag(32, "http://www.example.com"),
     "d82076687474703a2f2f7777772e6578616d706c652e636f6d"),
]


@pytest.mark.parametrize("value,hexs", BIDIRECTIONAL,
                         ids=[r[1] for r in BIDIRECTIONAL])
def test_rfc_appendix_a_bidirectional(value, hexs):
    assert cbor_decode(h(hexs)) == value
    assert cbor_encode(value) == h(hexs)


# Appendix A rows that only DECODE to the value (non-canonical
# widths, indefinite lengths, NaN identity).
DECODE_ONLY = [
    ("f97e00", math.nan), ("fa7fc00000", math.nan),
    ("fb7ff8000000000000", math.nan),
    ("f9fc00", -math.inf), ("fb7ff0000000000000", math.inf),
    ("5f42010243030405ff", h("0102030405")),       # indefinite bytes
    ("7f657374726561646d696e67ff", "streaming"),   # indefinite text
    ("9fff", []),
    ("9f018202039f0405ffff", [1, [2, 3], [4, 5]]),
    ("83018202039f0405ff", [1, [2, 3], [4, 5]]),
    ("9f0102030405060708090a0b0c0d0e0f101112131415161718181819ff",
     list(range(1, 26))),
    ("bf61610161629f0203ffff", {"a": 1, "b": [2, 3]}),
    ("826161bf61626163ff", ["a", {"b": "c"}]),
    ("bf6346756ef563416d7421ff", {"Fun": True, "Amt": -2}),
]


@pytest.mark.parametrize("hexs,value", DECODE_ONLY,
                         ids=[r[0] for r in DECODE_ONLY])
def test_rfc_appendix_a_decode_only(hexs, value):
    got = cbor_decode(h(hexs))
    if isinstance(value, float) and math.isnan(value):
        assert isinstance(got, float) and math.isnan(got)
    else:
        assert got == value


def test_undefined_and_simple_values():
    assert cbor_decode(h("f7")) is UNDEFINED
    assert cbor_encode(UNDEFINED) == h("f7")
    assert cbor_decode(h("f0")) == ("simple", 16)
    assert cbor_decode(h("f8ff")) == ("simple", 255)
    with pytest.raises(ValueError, match="invalid two-byte simple"):
        cbor_decode(h("f810"))


def test_malformed_is_loud():
    with pytest.raises(ValueError, match="truncated"):
        cbor_decode(h("19"))
    with pytest.raises(ValueError, match="truncated"):
        cbor_decode(h("6449455446")[:-1])
    with pytest.raises(ValueError, match="reserved additional"):
        cbor_decode(h("1c"))
    with pytest.raises(ValueError, match="unexpected break"):
        cbor_decode(h("ff"))
    with pytest.raises(ValueError, match="trailing bytes"):
        cbor_decode(h("0000"))
    with pytest.raises(ValueError, match="invalid UTF-8"):
        cbor_decode(h("61ff"))
    with pytest.raises(ValueError, match="wrong type"):
        cbor_decode(h("5f6161ff"))     # text chunk in byte string
    with pytest.raises(ValueError, match="integer too large"):
        cbor_encode(1 << 64)


def test_sequence_walk_offsets():
    blob = (cbor_encode({"id": 1}) + cbor_encode("x")
            + cbor_encode([1, 2]) + cbor_encode(7))
    seq = cbor_sequence(blob)
    assert [v for _, v in seq] == [{"id": 1}, "x", [1, 2], 7]
    offs = [o for o, _ in seq]
    assert offs[0] == 0 and offs == sorted(offs)
    # truncation MID-ITEM (not at an item boundary) is loud
    with pytest.raises(ValueError, match="truncated"):
        cbor_sequence(blob + cbor_encode("hello")[:-2])


def test_half_float_subnormal_sweep():
    """Every finite half value round-trips decode->encode->decode
    bit-exactly (the §3.3 surface, subnormals included)."""
    import struct as _s

    for bits in list(range(0, 0x7C00, 37)) + [0x7BFF, 0x03FF, 0x0400]:
        blob = b"\xf9" + _s.pack(">H", bits)
        v = cbor_decode(blob)
        assert cbor_encode(v) == blob, hex(bits)
        neg = b"\xf9" + _s.pack(">H", 0x8000 | bits)
        assert cbor_encode(cbor_decode(neg)) == neg, hex(bits)


def test_tagged_and_nested_list_map_keys():
    """Round-12 review regression: Tag and nested-list map keys are
    legal CBOR; they must decode (hashable), and map-typed keys must
    refuse with ValueError, not crash with TypeError."""
    got = cbor_decode(h("a1c10001"))   # {Tag(1, 0): 1}
    assert got == {Tag(1, 0): 1}
    # [[1]] as a key: 0x81 0x81 0x01
    got2 = cbor_decode(h("a1818101f5"))
    assert got2 == {((1,),): True}
    with pytest.raises(ValueError, match="map-typed map key"):
        cbor_decode(h("a1a0f5"))       # {{}: true}
