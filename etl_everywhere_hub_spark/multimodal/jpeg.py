"""Dependency-free baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Closes the last compressed-media gap in ``decode_image`` (VERDICT r5
"what's missing" #4): JPEG was the one format gated behind an absent
imaging library. Baseline sequential DCT needs no library — huffman
entropy coding is table-driven bit twiddling, the 8x8 DCT is a pair of
matrix multiplies, and numpy carries the block math — so both
directions are implemented here from the public spec, like the PNG
(stdlib zlib) and WAV (struct) codecs beside it.

Decoder (``decode_jpeg_baseline``): full marker walk (SOI/APPn/COM
skipped, DQT 8- and 16-bit precision, SOF0/SOF1/SOF2, DHT, DRI, SOS,
EOI), canonical huffman table build from BITS/HUFFVAL *as embedded in
the file* (so arbitrary huffman JPEGs decode — the encoder's
constants are not load-bearing for decode), entropy-coded segments
with 0xFF00 byte unstuffing and RSTn restart handling, DC prediction,
zigzag, dequantization, float IDCT (vectorized once over all blocks
at EOI), every huffman scan layout — one interleaved baseline MCU
scan, per-component non-interleaved baseline scans, and PROGRESSIVE
(SOF2) scans with spectral selection, successive approximation, and
EOBRUN (DC/AC x first/refinement, spec G.1.2/G.2) — for any
(h_i, v_i) sampling factors incl. 4:2:0/4:2:2, box chroma upsampling,
JFIF YCbCr->RGB. Arithmetic-coded frames — sequential SOF9 AND
progressive SOFA (round 10) — dispatch to multimodal/jpeg_arith.py;
LOSSLESS frames — huffman SOF3 AND QM-arithmetic SOF11 (Annex H,
round 10) — dispatch to multimodal/jpeg_lossless.py; HIERARCHICAL
lossless pyramids (Annex J, later round 10) decode via the DHP/EXP
frame-fold state machine in decode_jpeg_baseline plus differential
SOF7/SOF15 scans (Ss=0) in jpeg_lossless.py; only differential DCT
frames (SOF5/6/13/14 — the lossy-pyramid variant with no mainstream
encoder) raise NotImplementedError; 12-bit precision raises
ValueError for DCT processes (lossless carries the full 2..16-bit
range per H.1).

Encoder (``encode_jpeg_baseline``): JFIF APP0, Annex-K quantization
tables scaled by libjpeg's quality curve (or caller-supplied tables —
``quant_scale=0`` emits all-ones tables for the exactness harness),
Annex-K huffman tables, 4:4:4 / 4:2:2 / 4:2:0, optional restart
intervals, grayscale or RGB. Deterministic: same array -> same bytes.

Exactness contract used by q331: a grayscale image whose 8x8 blocks
are each CONSTANT is reproduced EXACTLY through encode(quant=1) ->
decode: constant blocks have a pure-DC spectrum (all AC exactly 0),
DC = 8*(c-128) is integral so quantization at step 1 is lossless, and
the IDCT of a pure-DC block is the constant itself — no rounding
anywhere. That makes the full huffman/marker/IDCT pipeline
oracle-checkable with integer SQL, the same trick q329 uses for PNG
filters. Natural-image fidelity is asserted separately by tolerance
tests (tests/test_sources_multimodal.py).

Per-image cost: entropy coding is a python loop per nonzero
coefficient (JPEGs are small; this runs worker-side inside
mapInPandas batches, never on the driver); DCT/IDCT are vectorized
einsum over all blocks of a component at once.

Reference parity: /root/reference has no media path at all (task.ts
is geo-event ETL); this belongs to the SURVEY §2.B multimodal-column
contract (binary payloads + worker-side decode), where the reference
engine family delegates to external codec libs the container lacks.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

__all__ = ["encode_jpeg_baseline", "decode_jpeg_baseline"]

# ---------------------------------------------------------------- tables

# Annex K.1/K.2 quantization tables (natural row-major order).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    np.int32,
)

# Annex K.3 huffman specs: (BITS[1..16], HUFFVAL). Self-consistency is
# asserted at import (kraft inequality + length match); the decoder
# never relies on these — it builds from the DHT segments in the file.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Generate the 8x8 zigzag scan (spec figure 5) instead of
    hardcoding 64 constants: walk anti-diagonals, alternating
    direction. Returns flat indices into a row-major block."""
    order = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        for i in rng if d % 2 else reversed(rng):
            order.append(i * 8 + (d - i))
    return np.array(order, np.int64)


ZIGZAG = _zigzag_order()  # zigzag position -> natural index
UNZIGZAG = np.argsort(ZIGZAG)  # natural index -> zigzag position


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix: FDCT = D @ B @ D.T over a
    level-shifted block B; IDCT = D.T @ S @ D. C(0)=1/sqrt2 folded in,
    so the overall scale matches the spec's 1/4*C(u)C(v) convention."""
    x = np.arange(8)
    d = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    d[0] /= np.sqrt(2)
    return d


DCT = _dct_matrix()


def _check_huffspec(bits, vals):
    if sum(bits) != len(vals):
        raise AssertionError("huffman BITS/HUFFVAL length mismatch")
    k = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
    if k > 1:
        raise AssertionError("huffman BITS violates kraft inequality")


for _b, _v in [
    (DC_LUMA_BITS, DC_LUMA_VALS),
    (DC_CHROMA_BITS, DC_CHROMA_VALS),
    (AC_LUMA_BITS, AC_LUMA_VALS),
    (AC_CHROMA_BITS, AC_CHROMA_VALS),
]:
    _check_huffspec(_b, _v)


def _canonical_codes(bits: list) -> list:
    """Canonical huffman code assignment (spec C.2): codes of each
    length are consecutive, starting from (prev_start + count) << 1."""
    codes = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes.append((code, ln))
            code += 1
        code <<= 1
    return codes


# Encoder LUTs for the FIXED Annex-K tables, built once per process
# (round 12): every encode call rebuilt four canonical-code dicts —
# ~8% of the per-image codec cost in the q331 profile. The tables are
# module constants, so the symbol->(code,len) maps are too.
_ANNEXK_LUTS: dict | None = None


def _annexk_luts() -> dict:
    global _ANNEXK_LUTS
    if _ANNEXK_LUTS is None:
        _ANNEXK_LUTS = {
            "dc": [
                {v: c for v, c in zip(vals, _canonical_codes(bits))}
                for bits, vals in [
                    (DC_LUMA_BITS, DC_LUMA_VALS),
                    (DC_CHROMA_BITS, DC_CHROMA_VALS),
                ]
            ],
            "ac": [
                {v: c for v, c in zip(vals, _canonical_codes(bits))}
                for bits, vals in [
                    (AC_LUMA_BITS, AC_LUMA_VALS),
                    (AC_CHROMA_BITS, AC_CHROMA_VALS),
                ]
            ],
        }
    return _ANNEXK_LUTS


# ------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (spec F.1.2.3)
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_to_byte(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)  # 1-fill padding


def _magnitude_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_coef_bits(v: int) -> tuple[int, int]:
    """(category, appended-bits): negative values use the one's-
    complement convention (spec F.1.2.1.1)."""
    s = _magnitude_category(v)
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality curve: 1..100 -> linear scaling of the
    Annex-K tables, clamped to [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _fdct_quant(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a (H, W) uint8 plane -> quantized zigzag
    coefficients of shape (H//8 * W//8, 64), block raster order."""
    h, w = plane.shape
    b = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    b = b.reshape(-1, 8, 8).astype(np.float64) - 128.0
    s = np.einsum("ux,nxy,vy->nuv", DCT, b, DCT)
    q = np.round(s / qt[None]).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _pad_replicate(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mh
    pw = (-w) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, rounded to uint8."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.clip(
        np.round(np.stack([y, cb, cr], axis=2)), 0, 255
    ).astype(np.uint8)


def encode_jpeg_baseline(
    img: "np.ndarray",
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    quant_scale: int | None = None,
    interleaved: bool = True,
) -> bytes:
    """Baseline sequential JFIF encoder for 8-bit grayscale (h, w) or
    RGB (h, w, 3). ``subsampling`` is '444', '422' or '420' (RGB
    only).
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path). ``quant_scale=0``
    bypasses the quality curve with ALL-ONES quantization tables — the
    exactness mode q331 relies on (see module docstring).
    ``interleaved=False`` writes one SOS per component (the
    non-interleaved baseline layout, spec A.2.2) — exercises the
    decoder's multi-scan path."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"encode_jpeg_baseline: unsupported shape {a.shape}")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if quant_scale == 0:
        qt_l = np.ones((8, 8), np.int32)
        qt_c = np.ones((8, 8), np.int32)
    else:
        qt_l = _scale_quant(QUANT_LUMA, quality)
        qt_c = _scale_quant(QUANT_CHROMA, quality)

    # components: (id, h_samp, v_samp, quant-table#, plane)
    if gray:
        comps = [(1, 1, 1, 0, _pad_replicate(a, 8, 8))]
        hmax = vmax = 1
    else:
        ycc = _rgb_to_ycbcr(a)
        if subsampling == "444":
            hmax = vmax = 1
            planes = [_pad_replicate(ycc[:, :, i], 8, 8) for i in range(3)]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            # chroma box-average: 2x2 for 4:2:0, 2x1 (horizontal
            # only) for 4:2:2, over the padded even grid
            cv = 2 if subsampling == "420" else 1
            hmax, vmax = 2, cv
            ypad = _pad_replicate(ycc[:, :, 0], 8 * vmax, 16)
            cpad = [
                _pad_replicate(ycc[:, :, i], cv, 2).astype(np.float64)
                for i in (1, 2)
            ]
            if subsampling == "420":
                sub = [
                    (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
                    / 4.0
                    for c in cpad
                ]
            else:
                sub = [(c[:, 0::2] + c[:, 1::2]) / 2.0 for c in cpad]
            planes = [ypad] + [
                _pad_replicate(
                    np.clip(np.round(s), 0, 255).astype(np.uint8), 8, 8
                )
                for s in sub
            ]
            samp = [(2, cv), (1, 1), (1, 1)]
        comps = [
            (i + 1, samp[i][0], samp[i][1], 0 if i == 0 else 1, planes[i])
            for i in range(3)
        ]

    # quantized zigzag coefficients per component, block raster order
    coefs = []
    for cid, hs, vs, tq, plane in comps:
        qt = qt_l if tq == 0 else qt_c
        coefs.append(_fdct_quant(plane, qt))

    # huffman code tables (encoder side uses the Annex-K constants;
    # process-cached — see _annexk_luts)
    luts = _annexk_luts()
    dc_lut = luts["dc"]
    ac_lut = luts["ac"]

    # ------------------------------------------------ entropy segment
    mcu_w = 8 * hmax
    mcu_h = 8 * vmax
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h
    pred = [0] * len(comps)
    blocks_per_row = [  # blocks per row within each component plane
        comps[i][4].shape[1] // 8 for i in range(len(comps))
    ]

    def emit_block(ci: int, zz: np.ndarray, table: int) -> None:
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s, bits = _encode_coef_bits(diff)
        code, ln = dc_lut[table][s]
        wtr.put(code, ln)
        if s:
            wtr.put(bits, s)
        run = 0
        last_nz = 0
        nz = np.nonzero(zz[1:])[0]
        last_nz = (nz[-1] + 1) if len(nz) else 0
        for k in range(1, last_nz + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_lut[table][0xF0]  # ZRL
                wtr.put(code, ln)
                run -= 16
            s, bits = _encode_coef_bits(v)
            code, ln = ac_lut[table][(run << 4) | s]
            wtr.put(code, ln)
            wtr.put(bits, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_lut[table][0x00]  # EOB
            wtr.put(code, ln)

    # each entry: (sos_component_list, entropy_bytes)
    scan_chunks: list[tuple[list[int], bytes]] = []
    if interleaved or len(comps) == 1:
        wtr = _BitWriter()
        mcu_count = 0
        rst = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    wtr.pad_to_byte()
                    wtr.out.extend((0xFF, 0xD0 + rst))
                    rst = (rst + 1) % 8
                    pred = [0] * len(comps)
                for ci, (cid, hs, vs, tq, plane) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            bi = (my * vs + by) * blocks_per_row[ci] + (
                                mx * hs + bx
                            )
                            emit_block(ci, coefs[ci][bi], 0 if ci == 0 else 1)
                mcu_count += 1
        wtr.pad_to_byte()
        scan_chunks.append((list(range(len(comps))), bytes(wtr.out)))
    else:
        # non-interleaved: one scan per component, MCU = one block
        # (spec A.2.2); restart counter and DC predictor reset per scan
        for ci, (cid, hs, vs, tq, plane) in enumerate(comps):
            wtr = _BitWriter()
            pred[ci] = 0
            bw = (-(-w * hs // hmax) + 7) // 8
            bh = (-(-h * vs // vmax) + 7) // 8
            rst = 0
            blk = 0
            for my in range(bh):
                for mx in range(bw):
                    if restart_interval and blk and blk % restart_interval == 0:
                        wtr.pad_to_byte()
                        wtr.out.extend((0xFF, 0xD0 + rst))
                        rst = (rst + 1) % 8
                        pred[ci] = 0
                    bi = my * blocks_per_row[ci] + mx
                    emit_block(ci, coefs[ci][bi], 0 if ci == 0 else 1)
                    blk += 1
            wtr.pad_to_byte()
            scan_chunks.append(([ci], bytes(wtr.out)))

    # --------------------------------------------------------- markers
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qts = [(0, qt_l)] + ([(1, qt_c)] if not gray else [])
    for tq, qt in qts:
        out += seg(0xDB, bytes([tq]) + bytes(qt.reshape(64)[ZIGZAG].astype(np.uint8)))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq, _ in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    for cis, entropy in scan_chunks:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([comps[ci][0], 0x00 if ci == 0 else 0x11])
        sos += b"\x00\x3f\x00"
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------- decoder


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers.
    Restart markers are consumed by ``sync_restart``."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None:
                # past a marker: feed zeros (spec: decoder pads)
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            if self.pos >= len(d):
                self.marker = 0xD9
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFFFF
            self.nbits += 8

    def get(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Byte-align (discarding pad bits), consume the pending RSTn,
        resume reading. The marker may not have been buffered yet —
        the reader prefetches whole bytes and stops early once it has
        >24 bits — so scan forward over any remaining pad bytes to the
        RST (the standard resync procedure)."""
        self.nbits = 0
        self.acc = 0
        if self.marker is None:
            d = self.data
            while self.pos + 1 < len(d) and not (
                d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
            ):
                self.pos += 1
            if self.pos + 1 < len(d):
                self.pos += 2
            return
        if 0xD0 <= self.marker <= 0xD7:
            self.pos += 2
            self.marker = None


@lru_cache(maxsize=64)
def _huff_table_cached(bits: tuple, vals: bytes) -> "_HuffTable":
    """Process-cached decoder table (round 12): _HuffTable is
    immutable after construction and real streams reuse a handful of
    (bits, vals) specs — every builder fixture ships Annex-K — so the
    per-image rebuild was pure waste. Keyed on the exact parsed spec;
    an unseen spec still builds (and then caches) its own table."""
    return _HuffTable(list(bits), vals)


class _HuffTable:
    """Canonical decode via per-length (min_code, max_code, val_base)
    — O(code length) per symbol, no lookup table blowup."""

    def __init__(self, bits: list, vals: bytes) -> None:
        _check_huffspec(bits, vals)
        self.vals = vals
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_base = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = bits[ln - 1]
            self.min_code[ln] = code
            self.val_base[ln] = k
            code += n
            k += n
            self.max_code[ln] = code - 1 if n else -1
            code <<= 1

    def decode(self, rd: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | rd.get(1)
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                if code >= self.min_code[ln]:
                    return self.vals[self.val_base[ln] + code - self.min_code[ln]]
        raise ValueError("invalid huffman code in entropy segment")


def _extend(v: int, s: int) -> int:
    """Sign-extend a magnitude-category value (spec F.2.2.1)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136286 * cbf - 0.714136286 * crf
    b = yf + 1.772 * cbf
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)


def _decode_block_coefs(rd, dct_tbl, act_tbl, pred, oi):
    """One baseline entropy-coded 8x8 block: huffman DC diff + AC
    run-lengths. Returns the 64 quantized coefficients in ZIGZAG
    order; updates pred[oi] in place. (IDCT happens once per image,
    vectorized, after all scans — see decode_jpeg_baseline.)"""
    zz = np.zeros(64, np.int64)
    s = dct_tbl.decode(rd)
    diff = _extend(rd.get(s), s) if s else 0
    pred[oi] += diff
    zz[0] = pred[oi]
    k = 1
    while k < 64:
        rs = act_tbl.decode(rd)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run overflows block")
        zz[k] = _extend(rd.get(s), s)
        k += 1
    return zz


def _next_marker_pos(d: bytes, p: int) -> int:
    """Position of the next real marker (not stuffing, not RSTn) at or
    after p — where the outer marker walk resumes after a scan."""
    while p + 1 < len(d):
        if d[p] == 0xFF and d[p + 1] != 0x00 and not (0xD0 <= d[p + 1] <= 0xD7):
            return p
        p += 1
    return len(d)


def count_sos_scans(d: bytes) -> int:
    """Number of SOS scans in a JPEG stream, counted by walking marker
    segments — skipping each header segment by its length field and
    each entropy-coded span by the byte-stuffing rules — instead of a
    raw ``count(b"\\xff\\xda")`` substring search (ADVICE r7: a raw
    search silently couples the count to table segment CONTENTS, and
    would miscount if a DQT/DHT value pair ever formed FF DA)."""
    n = 0
    p = 2  # past SOI
    end = len(d)
    while p + 1 < end:
        if d[p] != 0xFF:
            p += 1  # garbage between segments: resync on FF
            continue
        m = d[p + 1]
        if m in (0xFF, 0x00):  # fill byte / stuffed-zero remnant
            p += 1
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / RSTn: standalone
            p += 2
            continue
        if p + 3 >= end:
            break
        seg_len = (d[p + 2] << 8) | d[p + 3]
        p += 2 + seg_len
        if m == 0xDA:  # SOS: entropy data follows the header
            n += 1
            p = _next_marker_pos(d, p)
    return n


def _comp_blocks(fh, fw, hs, vs, hmax, vmax):
    """(true_block_rows, true_block_cols, padded_rows, padded_cols)
    for one component: true counts per A.1.1 (component dims are
    ceil(f*samp/max)), padded counts sized for the interleaved MCU
    grid, which covers every scan layout."""
    bh = (-(-fh * vs // vmax) + 7) // 8
    bw = (-(-fw * hs // hmax) + 7) // 8
    ph = ((fh + 8 * vmax - 1) // (8 * vmax)) * vs
    pw = ((fw + 8 * hmax - 1) // (8 * hmax)) * hs
    return bh, bw, ph, pw


def _expand_axis(a: "np.ndarray", axis: int) -> "np.ndarray":
    """Annex J.1.1.2 reference-doubling filter along one axis:
    P(2i) = R(i), P(2i+1) = (R(i) + R(i+1) + 1) >> 1, with the last
    odd output repeating R(n-1) (R(n) := R(n-1))."""
    a = a.astype(np.int32)
    n = a.shape[axis]
    nxt = np.concatenate(
        [a.take(range(1, n), axis=axis), a.take([n - 1], axis=axis)],
        axis=axis,
    )
    odd = (a + nxt + 1) >> 1
    out = np.stack([a, odd], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def decode_jpeg_baseline(payload: bytes) -> "np.ndarray":
    """Decode a baseline OR progressive (huffman) JPEG/JFIF payload to
    a uint8 ndarray — (h, w) for single-component streams, (h, w, 3)
    RGB for three-component YCbCr. Baseline covers both scan layouts
    (one interleaved MCU scan, or per-component non-interleaved
    scans); progressive (SOF2) covers spectral selection and
    successive approximation, DC and AC, first and refinement scans
    (spec G.1.2 / G.2). Scans accumulate QUANTIZED COEFFICIENTS per
    component; dequantization + IDCT run once at EOI, vectorized over
    every block. Arithmetic-coded streams (sequential SOF9 and
    progressive SOFA) dispatch to jpeg_arith.decode_scan_arith;
    lossless streams (SOF3) to jpeg_lossless.decode_scan_lossless
    (spatial DPCM — assembled without IDCT or color transform);
    12-bit precision raises ValueError for DCT processes."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps, progressive)
    coefs: dict[int, np.ndarray] = {}  # cid -> (pad_bh, pad_bw, 64) zigzag
    samples: dict[int, np.ndarray] = {}  # lossless: cid -> (h, w) plane
    arith = False  # SOF9 sequential arithmetic (Annex G via jpeg_arith)
    lossless_prec: int | None = None  # SOF3 (Annex H via jpeg_lossless)
    cond_dc: dict[int, tuple[int, int]] = {}  # DAC: table -> (L, U)
    cond_ac: dict[int, int] = {}  # DAC: table -> Kx
    # hierarchical (Annex J, round 10 — LOSSLESS pyramids only):
    hier = None  # DHP: (fh, fw, comps, prec)
    ref: dict[int, np.ndarray] = {}  # accumulated reference planes
    exp_pending = (0, 0)  # EXP Eh/Ev awaiting the next differential SOF
    frame_exp = (0, 0)  # the EXP captured by the CURRENT frame
    differential = False  # current frame is SOF7/SOF15

    def _fold_frame():
        """Finish the just-decoded hierarchical frame: crop each
        component plane to the frame's true dims, expand the reference
        by the frame's captured EXP (J.1.1.2 doubling filter), and
        either install (non-differential) or add modulo 65536
        (differential, J lossless)."""
        fh_f, fw_f, comps_f, _ = frame
        hx = max(c[1] for c in comps_f)
        vx = max(c[2] for c in comps_f)
        for cid, hs, vs, _tq in comps_f:
            rows = (fh_f * vs + vx - 1) // vx
            cols = (fw_f * hs + hx - 1) // hx
            if cid not in samples:
                raise ValueError(f"hierarchical frame: component {cid} "
                                 "never scanned")
            plane = samples[cid][:rows, :cols].astype(np.int32)
            if differential:
                if cid not in ref:
                    raise ValueError(
                        "differential frame before a reference frame"
                    )
                base = ref[cid]
                eh, ev = frame_exp
                if eh:
                    base = _expand_axis(base, axis=1)
                if ev:
                    base = _expand_axis(base, axis=0)
                if base.shape[0] < rows or base.shape[1] < cols:
                    raise ValueError("EXP reference smaller than frame")
                ref[cid] = (base[:rows, :cols] + plane) & 0xFFFF
            else:
                ref[cid] = plane
        samples.clear()

    while pos + 2 <= len(d):
        if d[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = d[pos + 1]
        while marker == 0xFF and pos + 2 < len(d):  # fill bytes (B.1.1.2)
            pos += 1
            marker = d[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(d):
            raise ValueError("truncated JPEG header")
        (ln,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        body = d[pos + 4 : pos + 2 + ln]
        if len(body) != ln - 2:
            raise ValueError("JPEG segment overruns payload")
        if marker == 0xDB:  # DQT — possibly several tables per segment
            at = 0
            while at < len(body):
                pq, tq = body[at] >> 4, body[at] & 0x0F
                at += 1
                if pq == 0:
                    tab = np.frombuffer(body, np.uint8, 64, at).astype(np.int32)
                    at += 64
                elif pq == 1:
                    tab = (
                        np.frombuffer(body, ">u2", 64, at).astype(np.int32)
                    )
                    at += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = tab
                qt[tq] = nat.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0/1 baseline/extended, SOF2 progressive huffman,
            # SOF9 sequential arithmetic, SOFA progressive arithmetic
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps, marker in (0xC2, 0xCA))
            arith = marker in (0xC9, 0xCA)
        elif marker == 0xCB:  # SOF11 — lossless arithmetic (Annex H)
            if hier is not None and samples:
                _fold_frame()
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"bad lossless precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps, False)
            lossless_prec = prec
            arith = True
            differential = False
            frame_exp = exp_pending
            exp_pending = (0, 0)
        elif marker in (0xCD, 0xCE):
            raise NotImplementedError(
                "differential DCT (hierarchical) arithmetic JPEG frame "
                "type — hierarchical LOSSLESS pyramids decode"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning (B.2.4.3)
            if len(body) % 2:
                raise ValueError("DAC segment has a trailing odd byte")
            at = 0
            while at + 1 < len(body):
                tc_tb, cs = body[at], body[at + 1]
                tc, tb = tc_tb >> 4, tc_tb & 0x0F
                if tc == 0:
                    cond_dc[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    cond_ac[tb] = cs  # Kx
                at += 2
        elif marker == 0xDE:  # DHP — hierarchical progression (Annex J)
            prec, fh_h, fw_h, nc = struct.unpack(">BHHB", body[:6])
            comps_h = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps_h.append((cid, hv >> 4, hv & 0x0F, tq))
            hier = (fh_h, fw_h, comps_h, prec)
        elif marker == 0xDF:  # EXP — expand reference (B.3.3)
            exp_pending = (body[0] >> 4, body[0] & 0x0F)
        elif marker == 0xC3:  # SOF3 — lossless huffman (Annex H)
            if hier is not None and samples:
                _fold_frame()
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if not 2 <= prec <= 16:  # H.1: lossless allows the full range
                raise ValueError(f"bad lossless precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps, False)
            lossless_prec = prec
            arith = False
            differential = False
            frame_exp = exp_pending
            exp_pending = (0, 0)
        elif marker in (0xC7, 0xCF):  # SOF7/SOF15 — differential lossless
            if hier is None:
                raise ValueError(
                    "differential frame outside a hierarchical (DHP) stream"
                )
            if samples:
                _fold_frame()
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if not 2 <= prec <= 16:
                raise ValueError(f"bad lossless precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps, False)
            lossless_prec = prec
            arith = marker == 0xCF
            differential = True
            frame_exp = exp_pending
            exp_pending = (0, 0)
        elif marker in (0xC5, 0xC6):
            raise NotImplementedError(
                "differential DCT (hierarchical) JPEG frame type — "
                "hierarchical LOSSLESS pyramids decode"
            )
        elif marker == 0xC4:  # DHT — possibly several tables
            at = 0
            while at < len(body):
                tc, th = body[at] >> 4, body[at] & 0x0F
                bits = list(body[at + 1 : at + 17])
                n = sum(bits)
                vals = body[at + 17 : at + 17 + n]
                huff[(tc, th)] = _huff_table_cached(tuple(bits), bytes(vals))
                at += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if lossless_prec is not None and arith:
                from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
                    decode_scan_lossless_arith,
                )

                pos = decode_scan_lossless_arith(
                    d, pos + 2 + ln, frame, scan, cond_dc,
                    restart_interval, samples, (ss, se, ah, al),
                    lossless_prec, differential=differential,
                )
            elif lossless_prec is not None:
                from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
                    decode_scan_lossless,
                )

                pos = decode_scan_lossless(
                    d, pos + 2 + ln, frame, scan, huff,
                    restart_interval, samples, (ss, se, ah, al),
                    lossless_prec, differential=differential,
                )
            elif arith:
                from etl_everywhere_hub_spark.multimodal.jpeg_arith import (
                    decode_scan_arith,
                )

                pos = decode_scan_arith(
                    d, pos + 2 + ln, frame, scan, cond_dc, cond_ac,
                    restart_interval, coefs, (ss, se, ah, al),
                )
            else:
                pos = _decode_scan(
                    d, pos + 2 + ln, frame, scan, qt, huff,
                    restart_interval, coefs, (ss, se, ah, al),
                )
            continue
        # APPn/COM/unknown: skip
        pos += 2 + ln

    if frame is None:
        raise ValueError("no SOF segment found")
    fh, fw, comps, _prog = frame
    if hier is not None:
        # Annex-J assembly: fold the last frame, then emit the
        # accumulated reference planes at the DHP canvas dims
        if lossless_prec is None:
            raise ValueError(
                "hierarchical stream without lossless frames"
            )
        if not samples:
            raise ValueError("no SOS segment found")
        _fold_frame()
        fh_h, fw_h, comps_h, prec_h = hier
        hx = max(c[1] for c in comps_h)
        vx = max(c[2] for c in comps_h)
        dt = np.uint8 if prec_h <= 8 else np.uint16
        planes = []
        for cid, hs, vs, _tq in comps_h:
            if cid not in ref:
                raise ValueError(f"component {cid} never scanned")
            plane = ref[cid]
            ry, rx = vx // vs, hx // hs
            if ry > 1 or rx > 1:
                plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
            crop = plane[:fh_h, :fw_h]
            # DPCM only masks mod 65536 — validate against the declared
            # precision so a corrupt 8-bit stream raises instead of
            # silently wrapping through the uint8 cast (ADVICE r10).
            if crop.size and int(crop.max()) > (1 << prec_h) - 1:
                raise ValueError(
                    f"component {cid} sample {int(crop.max())} exceeds "
                    f"{prec_h}-bit precision"
                )
            planes.append(crop.astype(dt))
        if len(planes) == 1:
            return planes[0]
        if len(planes) == 3:
            return np.stack(planes, axis=2)
        raise ValueError(f"unsupported component count {len(planes)}")
    if lossless_prec is not None:
        # Annex-H assembly: samples are spatial already — no IDCT, no
        # color transform (T.81 defines none for lossless; planes are
        # carried verbatim, the DNG/TIFF-EP convention).
        if not samples:
            raise ValueError("no SOS segment found")
        missing = [c[0] for c in comps if c[0] not in samples]
        if missing:
            raise ValueError(f"components {missing} never scanned")
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        dt = np.uint8 if lossless_prec <= 8 else np.uint16
        planes = []
        for cid, hs, vs, _tq in comps:
            plane = samples[cid]
            ry, rx = vmax // vs, hmax // hs
            if ry > 1 or rx > 1:  # box-replicate subsampled components
                plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
            crop = plane[:fh, :fw]
            # same precision guard as the hierarchical branch above
            if crop.size and int(crop.max()) > (1 << lossless_prec) - 1:
                raise ValueError(
                    f"component {cid} sample {int(crop.max())} exceeds "
                    f"{lossless_prec}-bit precision"
                )
            planes.append(crop.astype(dt))
        if len(planes) == 1:
            return planes[0]
        if len(planes) == 3:
            return np.stack(planes, axis=2)
        raise ValueError(f"unsupported component count {len(planes)}")
    if not coefs:
        raise ValueError("no SOS segment found")
    missing = [c[0] for c in comps if c[0] not in coefs]
    if missing:
        raise ValueError(f"components {missing} never scanned")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    qt_zig = {tq: t.reshape(64)[ZIGZAG] for tq, t in qt.items()}
    out = []
    for cid, hs, vs, tq in comps:
        zz = coefs[cid]  # (ph, pw, 64) zigzag-order quantized
        ph, pw = zz.shape[:2]
        if tq not in qt_zig:
            raise ValueError(f"missing quant table {tq}")
        spec = np.zeros((ph * pw, 64), np.float64)
        spec[:, ZIGZAG] = zz.reshape(-1, 64) * qt_zig[tq]
        spec = spec.reshape(-1, 8, 8)
        # batch IDCT: D.T @ S @ D per block
        px = np.einsum("ux,nuv,vy->nxy", DCT, spec, DCT) + 128.0
        px = np.clip(np.round(px), 0, 255).astype(np.uint8)
        plane = (
            px.reshape(ph, pw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph * 8, pw * 8)
        )
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:  # box-replicate chroma upsample
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:fh, :fw])
    if len(out) == 1:
        return out[0]
    if len(out) == 3:
        return _ycbcr_to_rgb(out[0], out[1], out[2])
    raise ValueError(f"unsupported component count {len(out)}")


def _decode_scan(d, pos, frame, scan, qt, huff, restart_interval, coefs, band):
    """Decode one scan's entropy data into the per-component quantized
    coefficient stores. Handles every huffman scan kind: baseline
    full-band (interleaved or single-component), progressive DC
    first/refinement (interleaved allowed), progressive AC
    first/refinement (single-component by spec). Returns the payload
    position of the next marker."""
    fh, fw, comps, progressive = frame
    ss, se, ah, al = band
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    by_id = {c[0]: c for c in comps}
    is_dc = ss == 0
    if progressive and not is_dc and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if progressive and is_dc and se != 0:
        raise ValueError("progressive DC scan must have Se=0")

    order = []  # (cid, hs, vs, dc_table|None, ac_table|None)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        cid, hs, vs, tq = by_id[cs]
        need_dc = (not progressive) or (is_dc and ah == 0)
        need_ac = (not progressive) or (not is_dc and True)
        if need_dc and (0, td) not in huff:
            raise ValueError("missing DC huffman table for scan")
        if need_ac and (1, ta) not in huff:
            raise ValueError("missing AC huffman table for scan")
        order.append(
            (cid, hs, vs, huff.get((0, td)), huff.get((1, ta)))
        )
        if cid not in coefs:
            _bh, _bw, ph, pw = _comp_blocks(fh, fw, hs, vs, hmax, vmax)
            coefs[cid] = np.zeros((ph, pw, 64), np.int64)

    rd = _BitReader(d, pos)
    pred = [0] * len(order)
    state = {"eobrun": 0}
    mcu_count = 0

    def decode_block(oi, by_idx, bx_idx):
        cid, hs, vs, dct_tbl, act_tbl = order[oi]
        zz = coefs[cid][by_idx, bx_idx]
        if not progressive:
            coefs[cid][by_idx, bx_idx] = _decode_block_coefs(
                rd, dct_tbl, act_tbl, pred, oi
            )
        elif is_dc and ah == 0:  # DC first (G.2, F.2.2.1 + point transform)
            s = dct_tbl.decode(rd)
            diff = _extend(rd.get(s), s) if s else 0
            pred[oi] += diff
            zz[0] = pred[oi] << al
        elif is_dc:  # DC refinement: one raw bit per block
            if rd.get(1):
                zz[0] |= 1 << al
        elif ah == 0:  # AC first scan over band ss..se (G.2.2)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            k = ss
            while k <= se:
                rs = act_tbl.decode(rd)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r != 15:
                        state["eobrun"] = (1 << r) - 1
                        if r:
                            state["eobrun"] += rd.get(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run overflows band")
                zz[k] = _extend(rd.get(s), s) << al
                k += 1
        else:  # AC refinement (G.1.2.3 / spec figure G.7)
            p1, m1 = 1 << al, -1 << al

            def correct(k):
                if rd.get(1) and (zz[k] & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1

            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    rs = act_tbl.decode(rd)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r != 15:
                            state["eobrun"] = 1 << r
                            if r:
                                state["eobrun"] += rd.get(r)
                            break
                        # ZRL: pass over 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("AC refinement size must be 1")
                        val = p1 if rd.get(1) else m1
                    while k <= se:
                        if zz[k] != 0:
                            correct(k)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if val and k <= se:
                        zz[k] = val
                    k += 1
            if state["eobrun"] > 0:
                while k <= se:
                    if zz[k] != 0:
                        correct(k)
                    k += 1
                state["eobrun"] -= 1

    interleaved = len(order) > 1
    if interleaved:
        mcux = (fw + 8 * hmax - 1) // (8 * hmax)
        mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
        for my in range(mcuy):
            for mx in range(mcux):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    rd.sync_restart()
                    pred = [0] * len(order)
                    state["eobrun"] = 0
                for oi, (cid, hs, vs, _dt, _at) in enumerate(order):
                    for by in range(vs):
                        for bx in range(hs):
                            decode_block(oi, my * vs + by, mx * hs + bx)
                mcu_count += 1
    else:  # single-component scan: MCU = one block (A.2.2)
        cid, hs, vs, _dt, _at = order[0]
        bh, bw, _ph, _pw = _comp_blocks(fh, fw, hs, vs, hmax, vmax)
        for my in range(bh):
            for mx in range(bw):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    rd.sync_restart()
                    pred = [0]
                    state["eobrun"] = 0
                decode_block(0, my, mx)
                mcu_count += 1

    return _next_marker_pos(d, rd.pos)


# ------------------------------------------------- progressive encoder


def _refine_flush(wtr, bits):
    for b in bits:
        wtr.put(b, 1)
    bits.clear()


def encode_jpeg_progressive(
    img: "np.ndarray",
    quality: int = 90,
    subsampling: str = "444",
    quant_scale: int | None = None,
) -> bytes:
    """Progressive (SOF2) JFIF encoder — libjpeg's default scan script
    (DC first at Al=1 interleaved; luma AC in two spectral bands at
    Al=2 with two refinement passes; chroma AC at Al=1 with one
    refinement; DC refinement to Al=0) — emitted with the same Annex-K
    tables and point-transform semantics the decoder reverses
    (spec G.1.2). Exists to generate test vectors: for any image,
    decode(progressive bytes) must be BIT-IDENTICAL to decode(baseline
    bytes) at the same quantization, because both streams carry the
    same quantized coefficients. Gray images use the luma script rows
    only."""
    a = np.ascontiguousarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"encode_jpeg_progressive: unsupported shape {a.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")

    if quant_scale == 0:
        qt_l = np.ones((8, 8), np.int32)
        qt_c = np.ones((8, 8), np.int32)
    else:
        qt_l = _scale_quant(QUANT_LUMA, quality)
        qt_c = _scale_quant(QUANT_CHROMA, quality)

    if gray:
        comps = [(1, 1, 1, 0, _pad_replicate(a, 8, 8))]
        hmax = vmax = 1
    else:
        ycc = _rgb_to_ycbcr(a)
        if subsampling == "444":
            hmax = vmax = 1
            planes = [_pad_replicate(ycc[:, :, i], 8, 8) for i in range(3)]
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            hmax = vmax = 2
            ypad = _pad_replicate(ycc[:, :, 0], 16, 16)
            cpad = [
                _pad_replicate(ycc[:, :, i], 2, 2).astype(np.float64)
                for i in (1, 2)
            ]
            sub = [
                (c[0::2, 0::2] + c[0::2, 1::2] + c[1::2, 0::2] + c[1::2, 1::2])
                / 4.0
                for c in cpad
            ]
            planes = [ypad] + [
                _pad_replicate(
                    np.clip(np.round(s), 0, 255).astype(np.uint8), 8, 8
                )
                for s in sub
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        comps = [
            (i + 1, samp[i][0], samp[i][1], 0 if i == 0 else 1, planes[i])
            for i in range(3)
        ]

    coef = []  # per comp: (pad_bh, pad_bw, 64) zigzag quantized
    for cid, hs, vs, tq, plane in comps:
        qtab = qt_l if tq == 0 else qt_c
        zz = _fdct_quant(plane, qtab)
        coef.append(zz.reshape(plane.shape[0] // 8, plane.shape[1] // 8, 64))

    luts = _annexk_luts()  # process-cached Annex-K encoder LUTs
    dc_lut = luts["dc"]
    ac_lut = luts["ac"]

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def dc_first_scan(al):
        wtr = _BitWriter()
        pred = [0] * len(comps)
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (cid, hs, vs, tq, _p) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            v = int(coef[ci][my * vs + by, mx * hs + bx, 0]) >> al
                            diff = v - pred[ci]
                            pred[ci] = v
                            s, bits = _encode_coef_bits(diff)
                            code, ln = dc_lut[0 if ci == 0 else 1][s]
                            wtr.put(code, ln)
                            if s:
                                wtr.put(bits, s)
        wtr.pad_to_byte()
        return [(ci, 0, 0) for ci in range(len(comps))], 0, 0, 0, al, bytes(wtr.out)

    def dc_refine_scan(al):
        wtr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (cid, hs, vs, tq, _p) in enumerate(comps):
                    for by in range(vs):
                        for bx in range(hs):
                            wtr.put(
                                (int(coef[ci][my * vs + by, mx * hs + bx, 0]) >> al)
                                & 1,
                                1,
                            )
        wtr.pad_to_byte()
        return (
            [(ci, 0, 0) for ci in range(len(comps))],
            0, 0, al + 1, al, bytes(wtr.out),
        )

    def pt(v, al):
        return v >> al if v >= 0 else -((-v) >> al)

    def ac_first_scan(ci, ss_, se_, al):
        cid, hs, vs, tq, plane = comps[ci]
        table = ac_lut[0 if ci == 0 else 1]
        # true block counts (non-interleaved geometry)
        bh = (-(-h * vs // vmax) + 7) // 8
        bw = (-(-w * hs // hmax) + 7) // 8
        wtr = _BitWriter()
        # NOTE: EOBn runs (n>0) need huffman symbols 0x10..0xE0, which
        # the Annex-K baseline AC tables do not define — libjpeg ships
        # custom tables for progressive scans. We keep the Annex-K
        # tables and emit one EOB0 per ended block: bigger stream,
        # identical decode semantics (EOBRUN covers one block).
        for my in range(bh):
            for mx in range(bw):
                zz = coef[ci][my, mx]
                band = [pt(int(zz[k]), al) for k in range(ss_, se_ + 1)]
                last_nz = -1
                for i, v in enumerate(band):
                    if v:
                        last_nz = i
                run = 0
                for i in range(last_nz + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = table[0xF0]
                        wtr.put(code, ln)
                        run -= 16
                    s, bits = _encode_coef_bits(v)
                    code, ln = table[(run << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(bits, s)
                    run = 0
                if last_nz < se_ - ss_:
                    code, ln = table[0x00]  # EOB0: this block only
                    wtr.put(code, ln)
        wtr.pad_to_byte()
        return [(ci, 0, 0)], ss_, se_, 0, al, bytes(wtr.out)

    def ac_refine_scan(ci, ss_, se_, al):
        """Spec G.1.2.3: newly-significant coefficients are coded as
        (run-of-zero-history, size 1) + sign bit; correction bits of
        already-significant coefficients passed over are appended
        after each symbol's bits; EOB carries the trailing correction
        bits."""
        cid, hs, vs, tq, plane = comps[ci]
        table = ac_lut[0 if ci == 0 else 1]
        bh = (-(-h * vs // vmax) + 7) // 8
        bw = (-(-w * hs // hmax) + 7) // 8
        wtr = _BitWriter()
        # Per-block EOB0 (see ac_first_scan note on Annex-K tables):
        # the decoder's EOBRUN=1 correction pass consumes exactly this
        # block's trailing correction bits.
        for my in range(bh):
            for mx in range(bw):
                zz = coef[ci][my, mx]
                absb = [abs(int(zz[k])) for k in range(ss_, se_ + 1)]
                signs = [1 if int(zz[k]) >= 0 else 0 for k in range(ss_, se_ + 1)]
                # newly significant at this level: (abs>>al)==1; history
                # nonzero: (abs>>(al+1)) != 0
                last_new = -1
                for i, v in enumerate(absb):
                    if (v >> al) == 1:
                        last_new = i
                run = 0
                pending: list[int] = []
                for i in range(last_new + 1):
                    v = absb[i]
                    if (v >> al) == 0:  # still zero at this level
                        run += 1
                        continue
                    # Nonzero at this level (newly OR already
                    # significant): emit any pending ZRLs FIRST, so
                    # every buffered correction bit stays inside the
                    # span of the symbol the decoder reads it under
                    # (the decoder's ZRL pass consumes exactly 16
                    # zero-history positions plus the correction bits
                    # of nonzero-history positions interleaved among
                    # them — G.1.2.3 / figure G.7). After this loop
                    # run <= 15, so a correction bit buffered below
                    # can never straddle a ZRL boundary.
                    while run > 15:
                        code, ln = table[0xF0]
                        wtr.put(code, ln)
                        _refine_flush(wtr, pending)  # clears in place
                        run -= 16
                    if (v >> (al + 1)) != 0:  # already significant
                        pending.append((v >> al) & 1)
                        continue
                    # newly significant
                    code, ln = table[(run << 4) | 1]
                    wtr.put(code, ln)
                    wtr.put(signs[i], 1)
                    _refine_flush(wtr, pending)  # clears in place
                    run = 0
                # trailing positions: correction bits ride the EOB
                trailing = [
                    (absb[i] >> al) & 1
                    for i in range(last_new + 1, len(absb))
                    if (absb[i] >> (al + 1)) != 0
                ]
                if last_new < se_ - ss_:
                    # any position remains after the last new
                    # coefficient — the decoder reads a symbol there,
                    # so an EOB0 is required (its correction pass then
                    # consumes the trailing bits)
                    code, ln = table[0x00]
                    wtr.put(code, ln)
                    for b in trailing:
                        wtr.put(b, 1)
                # else: band completed exactly at last_new, no EOB
        wtr.pad_to_byte()
        return [(ci, 0, 0)], ss_, se_, al + 1, al, bytes(wtr.out)

    # libjpeg's default progressive script (gray keeps comp-0 rows)
    scans = [dc_first_scan(1)]
    scans.append(ac_first_scan(0, 1, 5, 2))
    if not gray:
        scans.append(ac_first_scan(1, 1, 63, 1))
        scans.append(ac_first_scan(2, 1, 63, 1))
    scans.append(ac_first_scan(0, 6, 63, 2))
    scans.append(ac_refine_scan(0, 1, 63, 1))
    scans.append(dc_refine_scan(0))
    scans.append(ac_refine_scan(0, 1, 63, 0))
    if not gray:
        scans.append(ac_refine_scan(1, 1, 63, 0))
        scans.append(ac_refine_scan(2, 1, 63, 0))

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    qts = [(0, qt_l)] + ([(1, qt_c)] if not gray else [])
    for tq, qtab in qts:
        out += seg(
            0xDB, bytes([tq]) + bytes(qtab.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq, _p in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC2, sof)  # SOF2: progressive
    hts = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        hts += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in hts:
        out += seg(0xC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    for cis, ss_, se_, ah_, al_, entropy in scans:
        sos = bytes([len(cis)])
        for ci, _td, _ta in cis:
            sos += bytes([comps[ci][0], 0x00 if ci == 0 else 0x11])
        sos += bytes([ss_, se_, (ah_ << 4) | al_])
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
