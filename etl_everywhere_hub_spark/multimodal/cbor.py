"""CBOR codec (RFC 8949) + CBOR sequences (RFC 8742),
dependency-free — round 12.

Why this belongs in the engine: CBOR is the IETF's standard binary
JSON — the wire format of WebAuthn/COSE, CoAP/IoT telemetry, and a
growing share of event-stream dumps — and it completes the engine's
record-serialization family as the third binary dialect beside Avro
binary and protobuf (three different integer encodings: Avro zigzag
varints, protobuf varints, CBOR's major-type + width-argument
heads). A `.cbors` sequence file (RFC 8742: concatenated top-level
items) is the JSONL analog this layer walks.

Implemented from RFC 8949:
- Major types 0-7: unsigned/negative integers (all argument widths
  0-23 inline / 1/2/4/8-byte), byte and text strings, arrays, maps,
  tags (preserved as ("tag", n, item) — the engine does not guess
  at tag semantics), simple values, and floats in ALL THREE widths
  — including the HALF-PRECISION decode (§3.3: 5-bit exponent,
  10-bit mantissa, subnormals, ±Infinity, NaN) that most ad-hoc
  readers skip.
- Indefinite-length strings/arrays/maps (§3.2) with the "break"
  stop code, including the rule that indefinite string chunks must
  be definite strings of the SAME major type.
- Well-formedness loudness: reserved additional-info values 28-30,
  break outside indefinite context, truncation anywhere, and text
  strings that are not valid UTF-8 all raise.
- The encoder emits CANONICAL deterministic form (§4.2.1
  preferred serialization): smallest-width integer arguments,
  definite lengths only — the house determinism rule; floats encode
  at the smallest width that round-trips exactly (half -> single ->
  double), which is RFC preferred serialization as well.

Foreign pin: RFC 8949 Appendix A is itself a table of
encoding<->value test vectors — tests/test_cbor.py pins dozens of
them byte-for-byte in BOTH directions (the strongest kind of pin:
the spec's own numbers), plus corruption loudness and sequence
walks. No cbor library exists in this container; the RFC vectors
stand in for one by construction.

Scale posture: a .cbors shard walk returns per-item byte offsets
(forward-only — like TFRecord, CBOR sequences carry no sync marker,
so the shard is the parallel unit); decode runs worker-side per
Arrow batch (q379).
"""
from __future__ import annotations

import math
import struct


class Tag:
    """A tagged item, preserved verbatim: Tag(n, value)."""

    __slots__ = ("number", "value")

    def __init__(self, number: int, value):
        self.number = number
        self.value = value

    def __eq__(self, other):
        return (isinstance(other, Tag) and other.number == self.number
                and other.value == self.value)

    def __hash__(self):
        # tags are legal CBOR map keys (round-12 review: __eq__
        # without __hash__ made {Tag(1,0): 1} crash with TypeError);
        # an unhashable tagged value falls back to the number alone —
        # equality still discriminates
        try:
            return hash(("cbor-tag", self.number, self.value))
        except TypeError:
            return hash(("cbor-tag", self.number))

    def __repr__(self):  # pragma: no cover - debug aid
        return f"Tag({self.number}, {self.value!r})"


UNDEFINED = object()     # CBOR 'undefined' (0xf7), distinct from null

_BREAK = object()


def _half_to_float(h: int) -> float:
    """§3.3 half-precision decode: 1/5/10 bit layout with
    subnormals and the exp==31 infinities/NaN."""
    sign = -1.0 if h & 0x8000 else 1.0
    exp = (h >> 10) & 0x1F
    mant = h & 0x3FF
    if exp == 0:
        return sign * mant * 2.0 ** -24
    if exp == 31:
        return sign * math.inf if mant == 0 else math.nan
    return sign * (mant + 1024) * 2.0 ** (exp - 25)


def _float_to_half(f: float) -> int | None:
    """Smallest-width search helper: the half encoding if it
    round-trips exactly, else None."""
    if math.isnan(f):
        return 0x7E00
    sign = 0x8000 if math.copysign(1.0, f) < 0 else 0
    a = abs(f)
    if math.isinf(f):
        return sign | 0x7C00
    if a == 0.0:
        return sign
    # subnormal range
    if a < 2.0 ** -14:
        mant = a / 2.0 ** -24
        if mant != int(mant) or int(mant) > 0x3FF:
            return None
        return sign | int(mant)
    exp = math.floor(math.log2(a))
    if not -14 <= exp <= 15:
        return None
    mant = a / 2.0 ** exp - 1.0
    steps = mant * 1024
    if steps != int(steps):
        return None
    return sign | ((exp + 15) << 10) | int(steps)


class _Decoder:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("cbor: truncated input")
        b = self.data[self.pos:self.pos + n]
        self.pos += n
        return b

    def _arg(self, ai: int):
        """Decode the additional-info argument; None for indefinite
        (ai=31)."""
        if ai < 24:
            return ai
        if ai == 24:
            return self._take(1)[0]
        if ai == 25:
            return struct.unpack(">H", self._take(2))[0]
        if ai == 26:
            return struct.unpack(">I", self._take(4))[0]
        if ai == 27:
            return struct.unpack(">Q", self._take(8))[0]
        if ai == 31:
            return None
        raise ValueError(f"cbor: reserved additional info {ai}")

    def item(self, allow_break: bool = False):
        head = self._take(1)[0]
        mt, ai = head >> 5, head & 0x1F
        if mt == 7 and ai == 31:
            if not allow_break:
                raise ValueError("cbor: unexpected break code")
            return _BREAK
        if mt == 0:
            v = self._arg(ai)
            if v is None:
                raise ValueError("cbor: indefinite integer")
            return v
        if mt == 1:
            v = self._arg(ai)
            if v is None:
                raise ValueError("cbor: indefinite integer")
            return -1 - v
        if mt in (2, 3):
            n = self._arg(ai)
            if n is None:                      # indefinite string
                chunks = []
                while True:
                    at = self.pos
                    c = self.item(allow_break=True)
                    if c is _BREAK:
                        break
                    want = bytes if mt == 2 else str
                    if not isinstance(c, want):
                        raise ValueError(
                            "cbor: indefinite string chunk of wrong "
                            f"type at offset {at}")
                    chunks.append(c)
                return (b"" if mt == 2 else "").join(chunks)
            raw = self._take(n)
            if mt == 2:
                return raw
            try:
                return raw.decode("utf-8", "strict")
            except UnicodeDecodeError as exc:
                raise ValueError("cbor: invalid UTF-8 text") from exc
        if mt == 4:
            n = self._arg(ai)
            out = []
            if n is None:
                while True:
                    c = self.item(allow_break=True)
                    if c is _BREAK:
                        return out
                    out.append(c)
            for _ in range(n):
                out.append(self.item())
            return out
        if mt == 5:
            n = self._arg(ai)
            out = {}
            if n is None:
                while True:
                    k = self.item(allow_break=True)
                    if k is _BREAK:
                        return out
                    out[_key(k)] = self.item()
            for _ in range(n):
                k = self.item()
                out[_key(k)] = self.item()
            return out
        if mt == 6:
            n = self._arg(ai)
            if n is None:
                raise ValueError("cbor: indefinite tag")
            return Tag(n, self.item())
        # mt == 7: simple / float
        if ai == 20:
            return False
        if ai == 21:
            return True
        if ai == 22:
            return None
        if ai == 23:
            return UNDEFINED
        if ai == 24:
            v = self._take(1)[0]
            if v < 32:
                raise ValueError("cbor: invalid two-byte simple value")
            return ("simple", v)
        if ai == 25:
            return _half_to_float(struct.unpack(">H", self._take(2))[0])
        if ai == 26:
            return struct.unpack(">f", self._take(4))[0]
        if ai == 27:
            return struct.unpack(">d", self._take(8))[0]
        if ai < 20:
            return ("simple", ai)
        raise ValueError(f"cbor: reserved additional info {ai}")


def _key(k):
    """Map keys must be hashable: lists become tuples RECURSIVELY,
    tagged keys keep their Tag wrapper with a hashable inner value,
    and map-typed keys refuse loudly (a dict key has no faithful
    hashable rendering; RFC 8949 permits them but the engine's
    dict-based decode cannot represent them silently)."""
    if isinstance(k, list):
        return tuple(_key(x) for x in k)
    if isinstance(k, Tag):
        return Tag(k.number, _key(k.value))
    if isinstance(k, dict):
        raise ValueError("cbor: map-typed map key unsupported")
    return k


def cbor_decode(data: bytes) -> object:
    """Decode exactly ONE item; trailing bytes raise (use
    cbor_sequence for streams)."""
    d = _Decoder(data)
    v = d.item()
    if d.pos != len(data):
        raise ValueError(
            f"cbor: {len(data) - d.pos} trailing bytes after item")
    return v


def cbor_sequence(data: bytes) -> list:
    """RFC 8742 CBOR sequence walk: [(offset, item)] for each
    concatenated top-level item — the .cbors corpus layout. No sync
    marker exists (the TFRecord posture): shard-level parallelism."""
    d = _Decoder(data)
    out = []
    while d.pos < len(data):
        at = d.pos
        out.append((at, d.item()))
    return out


def _head(out: bytearray, mt: int, n: int):
    if n < 24:
        out.append((mt << 5) | n)
    elif n < 0x100:
        out.append((mt << 5) | 24)
        out.append(n)
    elif n < 0x10000:
        out.append((mt << 5) | 25)
        out += struct.pack(">H", n)
    elif n < 0x100000000:
        out.append((mt << 5) | 26)
        out += struct.pack(">I", n)
    else:
        out.append((mt << 5) | 27)
        out += struct.pack(">Q", n)


def cbor_encode(v) -> bytes:
    """Canonical (preferred-serialization) encode: smallest integer
    heads, definite lengths, smallest exactly-round-tripping float
    width."""
    out = bytearray()
    _enc(out, v)
    return bytes(out)


def _enc(out: bytearray, v):
    if v is None:
        out.append(0xF6)
        return
    if v is UNDEFINED:
        out.append(0xF7)
        return
    if isinstance(v, bool):
        out.append(0xF5 if v else 0xF4)
        return
    if isinstance(v, int):
        if v >= 0:
            if v >= 1 << 64:
                raise ValueError("cbor: integer too large")
            _head(out, 0, v)
        else:
            if -v - 1 >= 1 << 64:
                raise ValueError("cbor: integer too small")
            _head(out, 1, -v - 1)
        return
    if isinstance(v, float):
        h = _float_to_half(v)
        if h is not None:
            out.append(0xF9)
            out += struct.pack(">H", h)
            return
        (f32,) = struct.unpack(">f", struct.pack(">f", v)) \
            if abs(v) <= 3.4028235e38 else (None,)
        if f32 is not None and (f32 == v or (math.isnan(v))):
            out.append(0xFA)
            out += struct.pack(">f", v)
            return
        out.append(0xFB)
        out += struct.pack(">d", v)
        return
    if isinstance(v, (bytes, bytearray)):
        _head(out, 2, len(v))
        out += v
        return
    if isinstance(v, str):
        raw = v.encode("utf-8")
        _head(out, 3, len(raw))
        out += raw
        return
    if isinstance(v, (list, tuple)):
        _head(out, 4, len(v))
        for item in v:
            _enc(out, item)
        return
    if isinstance(v, dict):
        _head(out, 5, len(v))
        for k, val in v.items():
            _enc(out, k)
            _enc(out, val)
        return
    if isinstance(v, Tag):
        _head(out, 6, v.number)
        _enc(out, v.value)
        return
    raise ValueError(f"cbor: unencodable type {type(v).__name__}")
