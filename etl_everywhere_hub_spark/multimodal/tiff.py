"""Dependency-free baseline TIFF codec — decode + encode.

Implements the public TIFF 6.0 specification (Adobe, 1992) the same
way multimodal/jpeg.py implements ITU-T T.81: pure stdlib + numpy, no
imaging libraries. Reference parity target: ``dfpc-coe/
etl-everywhere-hub`` has no codecs (``task.ts`` is a connector); this
exists for the repo's multimodal ingest surface (SURVEY §2
LLM-pipeline ops; VERDICT r10 item #2 — TIFF is a top real-crawl
format still raising in decode_image before round 11).

Decoder coverage:
- both byte orders ("II" little-endian, "MM" big-endian), the 42
  magic, multi-entry IFD walk (first IFD only; multi-page rejected
  loudly rather than silently truncated)
- inline (<=4 byte) and offset-addressed tag values, all five
  baseline field types it needs (BYTE/ASCII/SHORT/LONG/RATIONAL)
- strips: any RowsPerStrip, multiple strips, chunky planar config
- compression 1 (none), 32773 (PackBits), and 5 (LZW — the TIFF
  variant: MSB-first bit packing, 9-bit start, CLEAR=256, EOI=257,
  and the spec's "early change" width bump one code EARLY at
  511/1023/2047), with Predictor 2 (horizontal differencing)
- photometric 0 (WhiteIsZero — inverted to the returned BlackIsZero
  convention), 1 (BlackIsZero), 2 (RGB), 3 (palette via ColorMap,
  16-bit entries returned as their high byte, the c*257 convention)
- BitsPerSample 8 everywhere plus 16 for grayscale (returned uint16,
  like 16-bit PNG/PNM)

Encoder coverage (exercises every decoder path under property test):
gray8/gray16/RGB8/palette images, either endianness, any RowsPerStrip
(multi-strip), all three compressions, optional horizontal predictor,
optional WhiteIsZero. decode(encode(x)) is bit-exact for all of them
— TIFF is a lossless container here.

Bit order note: TIFF LZW packs code bits MSB-first (GIF packs
LSB-first — see multimodal/gif.py); the "early change" off-by-one is
the TIFF spec's own documented quirk (compression section), matched
by every mainstream reader.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids (TIFF 6.0 §8)
_WIDTH = 256
_LENGTH = 257
_BITS = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES = 277
_ROWS_PER_STRIP = 278
_STRIP_COUNTS = 279
_PLANAR = 284
_PREDICTOR = 317
_COLORMAP = 320

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


# ---------------------------------------------------------------------------
# PackBits (TIFF 6.0 §9)
# ---------------------------------------------------------------------------


def packbits_encode(row: bytes) -> bytes:
    """PackBits one byte run: literal copies for non-repeats, (257-n)
    headers for runs >= 3 (and for 2-byte runs when convenient —
    decoder-neutral)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        j = i + 1
        while j < n and j - i < 128 and row[j] == row[i]:
            j += 1
        run = j - i
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i = j
            continue
        # literal stretch: until a >=3 run starts or 128 bytes
        j = i
        while j < n and j - i < 128:
            if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                break
            j += 1
        out.append(j - i - 1)
        out += row[i:j]
        i = j
    return bytes(out)


def packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_expected:
        if i >= len(data):
            raise ValueError("PackBits stream truncated")
        h = data[i]
        i += 1
        if h < 128:  # literal h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += bytes([data[i]]) * (257 - h)
            i += 1
        # h == 128: no-op per spec
    if len(out) != n_expected:
        raise ValueError("PackBits output overran strip size")
    return bytes(out)


# ---------------------------------------------------------------------------
# TIFF LZW (TIFF 6.0 §13: MSB-first, early change)
# ---------------------------------------------------------------------------

_CLEAR = 256
_EOI = 257


def lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF-variant LZW compress (MSB-first, 9-bit start, CLEAR=256,
    EOI=257, early-change width bumps, reset before the table fills)."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_CLEAR, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        # EARLY CHANGE: bump width right after assigning code
        # (1<<width)-1 — one code earlier than GIF (TIFF 6.0 spec);
        # mirrors the decoder's len(table) == (1<<width)-1 rule
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # reset before the 12-bit space fills
            emit(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def lzw_decode_tiff(
    data: bytes, n_expected: int | None, early_change: bool = True
) -> bytes:
    """TIFF-variant LZW decompress to exactly ``n_expected`` bytes
    (early-change rule: the code width grows one code earlier than
    GIF's — see the module docstring); truncation raises.

    ``n_expected=None`` decodes until EOI / end of data with no
    length contract — the PDF LZWDecode form (PDF 32000-1 §7.4.4 is
    this exact codec; its EarlyChange=0 variant defers the width
    bump by one code, selected via ``early_change=False``)."""
    out = bytearray()
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    width = 9
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    ln = len(data)
    while True:
        while nbits < width:
            if pos >= ln:
                if n_expected is not None and len(out) != n_expected:
                    raise ValueError(
                        f"TIFF LZW truncated: {len(out)}/{n_expected} bytes"
                    )
                return bytes(out)
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if code == _EOI:
            if n_expected is not None and len(out) != n_expected:
                raise ValueError(
                    f"TIFF LZW EOI at {len(out)}/{n_expected} bytes"
                )
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError(f"TIFF LZW first code {code} not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(
                f"TIFF LZW code {code} beyond table {len(table)}"
            )
        # early change: decoder grows one code EARLIER than GIF's rule
        # (PDF EarlyChange=0 defers it by that one code)
        grow_at = (1 << width) - 1 if early_change else (1 << width)
        if len(table) == grow_at and width < 12:
            width += 1
        out += entry
        if n_expected is not None and len(out) > n_expected:
            raise ValueError("TIFF LZW output exceeds strip size")
        prev = entry
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def _read_tag_values(payload: bytes, e: str, entry: bytes) -> tuple[int, list[int]]:
    tag, ftype, count = struct.unpack(e + "HHI", entry[:8])
    if ftype not in _TYPE_SIZES:
        raise ValueError(f"TIFF tag {tag}: unsupported field type {ftype}")
    size = _TYPE_SIZES[ftype] * count
    if size <= 4:
        raw = entry[8 : 8 + size]
    else:
        (off,) = struct.unpack(e + "I", entry[8:12])
        raw = payload[off : off + size]
        if len(raw) != size:
            raise ValueError(f"TIFF tag {tag}: value block truncated")
    if ftype == 1:
        vals = list(raw)
    elif ftype == 2:
        vals = list(raw)  # ASCII; callers don't use these tags
    elif ftype == 3:
        vals = list(struct.unpack(e + "H" * count, raw))
    elif ftype == 4:
        vals = list(struct.unpack(e + "I" * count, raw))
    else:  # RATIONAL: return numerators (resolution tags, unused)
        vals = [
            struct.unpack(e + "II", raw[i : i + 8])[0]
            for i in range(0, size, 8)
        ]
    return tag, vals


def decode_tiff(payload: bytes) -> np.ndarray:
    """Decode a baseline TIFF to (h, w) uint8/uint16 grayscale or
    (h, w, 3) uint8 RGB (palette expanded, WhiteIsZero inverted)."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF stream")
    (ifd_off,) = struct.unpack_from(e + "I", payload, 4)
    (n_entries,) = struct.unpack_from(e + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        entry = payload[ifd_off + 2 + 12 * i : ifd_off + 2 + 12 * (i + 1)]
        tag, vals = _read_tag_values(payload, e, entry)
        tags[tag] = vals
    (next_ifd,) = struct.unpack_from(
        e + "I", payload, ifd_off + 2 + 12 * n_entries
    )
    if next_ifd != 0:
        raise NotImplementedError("multi-page TIFF (second IFD present)")
    w = tags[_WIDTH][0]
    h = tags[_LENGTH][0]
    spp = tags.get(_SAMPLES, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    comp = tags.get(_COMPRESSION, [1])[0]
    photo = tags[_PHOTOMETRIC][0]
    planar = tags.get(_PLANAR, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    if planar != 1:
        raise NotImplementedError("planar (non-chunky) TIFF")
    if len(set(bits)) != 1:
        raise ValueError(f"mixed BitsPerSample {bits}")
    bps = bits[0]
    if bps not in (8, 16):
        raise NotImplementedError(f"BitsPerSample {bps}")
    if bps == 16 and spp != 1:
        raise NotImplementedError("16-bit TIFF only for grayscale")
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("StripOffsets/StripByteCounts length mismatch")
    row_bytes = w * spp * (bps // 8)
    raw = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        if n_rows <= 0:
            raise ValueError("more strips than image rows")
        expected = n_rows * row_bytes
        strip = payload[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("strip data truncated")
        if comp == 1:
            if len(strip) != expected:
                raise ValueError("uncompressed strip size mismatch")
        elif comp == 32773:
            strip = packbits_decode(strip, expected)
        elif comp == 5:
            strip = lzw_decode_tiff(strip, expected)
        else:
            raise NotImplementedError(f"TIFF compression {comp}")
        raw += strip
    dt = np.uint8 if bps == 8 else np.dtype(e + "u2")
    arr = np.frombuffer(bytes(raw), dt).reshape(h, w * spp if bps == 8 else w)
    if bps == 16:
        arr = arr.astype(np.uint16)
    if predictor == 2:
        # horizontal differencing: cumulative sum per row per channel
        if bps == 8:
            a = arr.reshape(h, w, spp).astype(np.int64)
            arr = (np.cumsum(a, axis=1) % 256).astype(np.uint8).reshape(h, w * spp)
        else:
            arr = (np.cumsum(arr.astype(np.int64), axis=1) % 65536).astype(
                np.uint16
            )
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photo == 2:
        if spp < 3:
            raise ValueError("RGB photometric with <3 samples")
        px = arr.reshape(h, w, spp)[:, :, :3]  # extra samples dropped
        return px.copy()
    if photo == 3:
        cmap = tags.get(_COLORMAP)
        if cmap is None:
            raise ValueError("palette TIFF without ColorMap")
        n = 1 << bps
        if len(cmap) != 3 * n:
            raise ValueError(f"ColorMap length {len(cmap)} != 3*{n}")
        cm = (np.asarray(cmap, dtype=np.uint32).reshape(3, n) >> 8).astype(
            np.uint8
        )
        idx = arr.reshape(h, w)
        return np.stack([cm[0][idx], cm[1][idx], cm[2][idx]], axis=2)
    if photo in (0, 1):
        g = arr.reshape(h, w)
        if photo == 0:  # WhiteIsZero → invert to BlackIsZero
            g = ((1 << bps) - 1 - g.astype(np.int64)).astype(g.dtype)
        return g.copy()
    raise NotImplementedError(f"TIFF photometric {photo}")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_tiff(
    img: np.ndarray,
    compression: str = "none",
    endian: str = "<",
    rows_per_strip: int | None = None,
    predictor: bool = False,
    white_is_zero: bool = False,
    palette: np.ndarray | None = None,
) -> bytes:
    """Encode gray8 (h,w) uint8, gray16 (h,w) uint16, RGB (h,w,3)
    uint8, or — with ``palette`` (n,3) uint8 — a paletted (h,w) uint8
    index image. ``compression``: none | packbits | lzw."""
    if endian not in ("<", ">"):
        raise ValueError("endian must be '<' or '>'")
    comp_id = {"none": 1, "packbits": 32773, "lzw": 5}[compression]
    if palette is not None:
        if img.ndim != 2 or img.dtype != np.uint8:
            raise ValueError("palette image must be (h,w) uint8 indexes")
        photo, spp, bps = 3, 1, 8
        data = img
    elif img.ndim == 3:
        if img.shape[2] != 3 or img.dtype != np.uint8:
            raise ValueError("RGB image must be (h,w,3) uint8")
        photo, spp, bps = 2, 3, 8
        data = img
    elif img.dtype == np.uint16:
        photo, spp, bps = 1, 1, 16
        data = img
    else:
        if img.dtype != np.uint8:
            raise ValueError(f"unsupported dtype {img.dtype}")
        photo, spp, bps = 1, 1, 8
        data = img
    if white_is_zero:
        if photo != 1:
            raise ValueError("white_is_zero only for grayscale")
        photo = 0
        data = ((1 << bps) - 1 - data.astype(np.int64)).astype(data.dtype)
    h, w = data.shape[:2]
    rps = rows_per_strip or h
    samples = data.reshape(h, -1).astype(np.int64)
    if predictor:
        if spp > 1:
            a = samples.reshape(h, w, spp)
            d = np.empty_like(a)
            d[:, 0] = a[:, 0]
            d[:, 1:] = (a[:, 1:] - a[:, :-1]) % 256
            samples = d.reshape(h, -1)
        else:
            d = np.empty_like(samples)
            d[:, 0] = samples[:, 0]
            d[:, 1:] = (samples[:, 1:] - samples[:, :-1]) % (1 << bps)
            samples = d
    if bps == 8:
        rowdata = samples.astype(np.uint8)
    else:
        rowdata = samples.astype(np.dtype(endian + "u2"))
    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        block = rowdata[y0 : y0 + rps].tobytes()
        if comp_id == 32773:
            block = packbits_encode(block)
        elif comp_id == 5:
            block = lzw_encode_tiff(block)
        strips.append(block)

    entries: list[tuple[int, int, int, list[int]]] = []  # tag,type,count,vals
    entries.append((_WIDTH, 3, 1, [w]))
    entries.append((_LENGTH, 3, 1, [h]))
    entries.append((_BITS, 3, spp, [bps] * spp))
    entries.append((_COMPRESSION, 3, 1, [comp_id]))
    entries.append((_PHOTOMETRIC, 3, 1, [photo]))
    entries.append((_STRIP_OFFSETS, 4, len(strips), [0] * len(strips)))
    entries.append((_SAMPLES, 3, 1, [spp]))
    entries.append((_ROWS_PER_STRIP, 3, 1, [rps]))
    entries.append((_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]))
    if predictor:
        entries.append((_PREDICTOR, 3, 1, [2]))
    if palette is not None:
        n = 1 << bps
        pal = np.zeros((n, 3), dtype=np.uint32)
        pal[: len(palette)] = palette
        cmap = (pal * 257).T.reshape(-1).tolist()  # c*257: exact >>8 inverse
        entries.append((_COLORMAP, 3, 3 * n, cmap))
    entries.sort(key=lambda t: t[0])

    # layout: header(8) IFD, then value blocks, then strips
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    # first pass: compute overflow block sizes
    heap_off = ifd_off + ifd_size
    heap = bytearray()
    packed_entries = []
    strip_offsets_pos = None  # (heap position, inline?) to patch later
    for tag, ftype, count, vals in entries:
        size = _TYPE_SIZES[ftype] * count
        fmt = {1: "B", 3: "H", 4: "I"}[ftype]
        blob = struct.pack(endian + fmt * count, *vals)
        if size <= 4:
            inline = blob + b"\x00" * (4 - size)
            if tag == _STRIP_OFFSETS:
                strip_offsets_pos = ("inline", len(packed_entries))
            packed_entries.append((tag, ftype, count, inline))
        else:
            if tag == _STRIP_OFFSETS:
                strip_offsets_pos = ("heap", len(heap))
            packed_entries.append(
                (tag, ftype, count, struct.pack(endian + "I", heap_off + len(heap)))
            )
            heap += blob
    strips_start = heap_off + len(heap)
    # patch strip offsets now that the data start is known
    offs = []
    acc = strips_start
    for s in strips:
        offs.append(acc)
        acc += len(s)
    kind, where = strip_offsets_pos
    blob = struct.pack(endian + "I" * len(offs), *offs)
    if kind == "inline":
        tag, ftype, count, _ = packed_entries[where]
        packed_entries[where] = (tag, ftype, count, blob + b"\x00" * (4 - len(blob)))
    else:
        heap[where : where + len(blob)] = blob

    out = bytearray()
    out += (b"II*\x00" if endian == "<" else b"MM\x00*")
    out += struct.pack(endian + "I", ifd_off)
    out += struct.pack(endian + "H", len(packed_entries))
    for tag, ftype, count, val4 in packed_entries:
        out += struct.pack(endian + "HHI", tag, ftype, count) + val4
    out += struct.pack(endian + "I", 0)  # no next IFD
    out += heap
    for s in strips:
        out += s
    return bytes(out)
