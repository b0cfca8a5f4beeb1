"""Lossless JPEG (T.81 Annex H, SOF3) codec tests — round 10.

The headline property is the Annex-H exactness contract q337 rides
on: ``decode(encode(img, Pt)) == (img >> Pt) << Pt`` for ARBITRARY
images — every predictor (1..7), every point transform, 8- and
full-range 2..16-bit precision, restart intervals including mid-line
anchors, interleaved and per-component scan layouts. There is no
error term to bound: any single wrong prediction, category, or
modulo-65536 step breaks equality.

Decoder-only coverage: a hand-built stream (huffman table and
entropy bytes written out longhand from the spec procedures, not via
the encoder) pins the decode path against an independent derivation,
and malformed-stream cases pin the error channel.

INTEROP CAVEAT (mirrors the module docstring): mid-line restart
anchors keep encoder and decoder bit-exact with each other; foreign
encoders restart on line boundaries, which these tests also cover
(ri == multiple of the line width). Foreign-stream interop runs via
``tools/cluster_smoke.py --codec-interop`` on equipped hosts.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_everywhere_hub_spark.multimodal import decode_image
from etl_everywhere_hub_spark.multimodal.jpeg import decode_jpeg_baseline
from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
    LL_BITS,
    LL_VALS,
    encode_jpeg_lossless,
)


def _img(seed: int, h: int, w: int, lo: int = 0, hi: int = 256, ch: int = 0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 0 else (h, w, ch)
    dt = np.uint8 if hi <= 256 else np.uint16
    return rng.integers(lo, hi, shape).astype(dt)


# ------------------------------------------------------------ roundtrip


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    pred=st.integers(1, 7),
    pt=st.integers(0, 3),
    ri=st.sampled_from([0, 1, 3, 8, 16]),
)
@settings(max_examples=200, deadline=None)
def test_gray8_roundtrip_exact(seed, h, w, pred, pt, ri):
    img = _img(seed, h, w)
    jpg = encode_jpeg_lossless(
        img, predictor=pred, point_transform=pt, restart_interval=ri
    )
    assert jpg[:2] == b"\xff\xd8" and jpg[-2:] == b"\xff\xd9"
    dec = decode_jpeg_baseline(jpg)
    assert dec.dtype == np.uint8 and dec.shape == (h, w)
    assert np.array_equal(dec, (img >> pt) << pt), (pred, pt, ri)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    prec=st.integers(2, 16),
    pred=st.integers(1, 7),
    ri=st.sampled_from([0, 4]),
)
@settings(max_examples=200, deadline=None)
def test_full_precision_range_roundtrip(seed, h, w, prec, pred, ri):
    """Annex H allows P in 2..16 — all of them roundtrip exactly,
    with output dtype uint8 at P<=8 and uint16 above."""
    img = _img(seed, h, w, hi=1 << prec).astype(
        np.uint8 if prec <= 8 else np.uint16
    )
    jpg = encode_jpeg_lossless(
        img, predictor=pred, precision=prec, restart_interval=ri
    )
    dec = decode_jpeg_baseline(jpg)
    assert dec.dtype == (np.uint8 if prec <= 8 else np.uint16)
    assert np.array_equal(dec, img)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    pred=st.integers(1, 7),
    interleave=st.booleans(),
    ri=st.sampled_from([0, 5]),
)
@settings(max_examples=100, deadline=None)
def test_rgb_both_scan_layouts(seed, h, w, pred, interleave, ri):
    """Three components as ONE interleaved scan or per-component
    scans — both decoder layouts, planes carried verbatim (no color
    transform, the DNG/TIFF-EP convention)."""
    img = _img(seed, h, w, ch=3)
    jpg = encode_jpeg_lossless(
        img, predictor=pred, interleave=interleave, restart_interval=ri
    )
    dec = decode_jpeg_baseline(jpg)
    assert dec.shape == (h, w, 3)
    assert np.array_equal(dec, img)


def test_decode_image_dispatches_sof3():
    img = _img(7, 9, 11)
    assert np.array_equal(decode_image(encode_jpeg_lossless(img)), img)


def test_ssss16_escape_diff_of_exactly_32768():
    """First sample 0 under default prediction 2^15 codes a modulo
    difference of exactly 32768 — the lossless-only SSSS=16 symbol
    with no appended bits (H.1.2.2)."""
    img = np.array([[0, 65535], [32768, 1]], np.uint16)
    for pred in range(1, 8):
        dec = decode_jpeg_baseline(encode_jpeg_lossless(img, predictor=pred))
        assert np.array_equal(dec, img), pred


def test_line_boundary_restarts_match_spec_reading():
    """ri == line width: every interval starts a line, so each line
    is coded default + 1-D Ra — the unambiguous spec case foreign
    encoders emit."""
    img = _img(3, 8, 16)
    jpg = encode_jpeg_lossless(img, predictor=4, restart_interval=16)
    assert jpg.count(b"\xff\xd0") >= 1  # RST0 actually emitted
    assert np.array_equal(decode_jpeg_baseline(jpg), img)


def test_gradient_exercises_negative_and_positive_diffs():
    r, c = np.mgrid[0:20, 0:20]
    img = ((r * 13 - c * 7) % 256).astype(np.uint8)
    for pred in range(1, 8):
        assert np.array_equal(
            decode_jpeg_baseline(encode_jpeg_lossless(img, predictor=pred)),
            img,
        )


# ----------------------------------------------------- decoder-only


def _hand_stream() -> tuple[bytes, np.ndarray]:
    """A 2x3 8-bit stream written out LONGHAND (independent of the
    encoder): predictor 1, Pt 0, huffman table {0:'00', 1:'01',
    2:'10', 3:'110'}.

    Samples 130 128 129 / 131 130 127. Derivation (H.1.2.1):
      (0,0) default Px=128, diff +2  -> cat 2, bits '10'   => 10 10
      (0,1) Ra=130,  diff -2         -> cat 2, bits '01'   => 10 01
      (0,2) Ra=128,  diff +1         -> cat 1, bit  '1'    => 01 1
      (1,0) Rb=130,  diff +1         -> cat 1, bit  '1'    => 01 1
      (1,1) Ra=131,  diff -1         -> cat 1, bit  '0'    => 01 0
      (1,2) Ra=130,  diff -3         -> cat 2, bits '00'   => 10 00
    Bitstring: 1010 1001 011 011 010 1000 -> pad with 1s to 24 bits
    = 10101001 01101101 01000111 = 0xA9 0x6D 0x47.
    """
    # lengths: cat0='00', cat1='01', cat2='10' (len 2), cat3='110' (len 3)
    bits = [0, 3, 1] + [0] * 13
    vals = [0, 1, 2, 3]
    dht = bytes([0x00] + bits + vals)
    sof = struct.pack(">BHHB", 8, 2, 3, 1) + bytes([1, 0x11, 0])
    sos = bytes([1, 1, 0x00, 1, 0, 0])  # ns=1, c1/Td0, Ss=1, Se=0, AhAl=0
    stream = (
        b"\xff\xd8"
        + b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
        + b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        + bytes([0xA9, 0x6D, 0x47])
        + b"\xff\xd9"
    )
    want = np.array([[130, 128, 129], [131, 130, 127]], np.uint8)
    return stream, want


def test_hand_built_stream_decodes():
    stream, want = _hand_stream()
    assert np.array_equal(decode_jpeg_baseline(stream), want)


def test_hand_built_stream_point_transform():
    """Same entropy bytes with AhAl=1: decoder must output
    (reconstructed << 1), default prediction halves to 64."""
    stream, want = _hand_stream()
    # patch Al in the SOS tail (last byte before entropy data)
    i = stream.index(b"\xff\xda")
    body_end = i + 2 + 2 + 6  # marker + len + 6-byte scan header
    patched = stream[: body_end - 1] + b"\x01" + stream[body_end:]
    dec = decode_jpeg_baseline(patched)
    # re-derive: same diffs over halved default (64): 66 64 65/67 66 63
    assert np.array_equal(
        dec, (np.array([[66, 64, 65], [67, 66, 63]]) << 1).astype(np.uint8)
    )


# ------------------------------------------------------------- errors


def test_encode_validation():
    z = np.zeros((2, 2), np.uint8)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(z, predictor=0)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(z, predictor=8)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(z, point_transform=8)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(np.full((2, 2), 300, np.int32), precision=8)
    with pytest.raises(ValueError):
        encode_jpeg_lossless(np.zeros((0, 2), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_lossless(np.zeros((2, 2, 2), np.uint8))


def test_malformed_streams_raise():
    jpg = encode_jpeg_lossless(_img(1, 4, 4))
    with pytest.raises(ValueError):
        decode_jpeg_baseline(jpg[:20])  # truncated header
    # bad predictor selector in SOS (Ss=0)
    i = jpg.index(b"\xff\xda")
    end = i + 2 + 2 + 6
    bad = jpg[: end - 3] + b"\x00" + jpg[end - 2 :]
    with pytest.raises(ValueError):
        decode_jpeg_baseline(bad)
    # Se != 0
    bad = jpg[: end - 2] + b"\x07" + jpg[end - 1 :]
    with pytest.raises(ValueError):
        decode_jpeg_baseline(bad)
    # differential DCT frames raise NotImplementedError; a
    # differential LOSSLESS frame outside a DHP stream fails loudly
    for m in (0xC5, 0xC6):
        k = jpg.index(b"\xff\xc3")
        with pytest.raises(NotImplementedError):
            decode_jpeg_baseline(jpg[:k] + bytes([0xFF, m]) + jpg[k + 2 :])
    k = jpg.index(b"\xff\xc3")
    with pytest.raises(ValueError, match="hierarchical"):
        decode_jpeg_baseline(jpg[:k] + bytes([0xFF, 0xC7]) + jpg[k + 2 :])


def test_huffspec_is_kraft_valid():
    assert sum(LL_BITS) == len(LL_VALS) == 17
    assert sum(n * 2.0 ** -(i + 1) for i, n in enumerate(LL_BITS)) <= 1.0


# ----------------------------------------------- arithmetic (SOF11)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    pred=st.integers(1, 7),
    pt=st.integers(0, 3),
    ri=st.sampled_from([0, 1, 3, 8, 16]),
)
@settings(max_examples=200, deadline=None)
def test_arith_gray8_roundtrip_exact(seed, h, w, pred, pt, ri):
    """SOF11: the same Annex-H DPCM through the QM coder's 158-bin
    H.1.2.2 model — exact for arbitrary images, every predictor,
    point transform, and restart interval (incl. ri=1: restart after
    every sample, the encoder-reinit worst case)."""
    img = _img(seed, h, w)
    jpg = encode_jpeg_lossless(
        img, predictor=pred, point_transform=pt, restart_interval=ri,
        arithmetic=True,
    )
    assert b"\xff\xcb" in jpg  # SOF11 marker
    dec = decode_jpeg_baseline(jpg)
    assert dec.dtype == np.uint8 and dec.shape == (h, w)
    assert np.array_equal(dec, (img >> pt) << pt), (pred, pt, ri)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 14),
    w=st.integers(1, 14),
    prec=st.integers(2, 16),
    L=st.integers(0, 2),
    du=st.integers(0, 3),
)
@settings(max_examples=200, deadline=None)
def test_arith_full_precision_and_conditioning(seed, h, w, prec, L, du):
    """2..16-bit precision with DAC conditioning bounds cycled — the
    L/U classification drives context selection, so every (L, U)
    reshapes the bin walk and must still roundtrip exactly."""
    U = L + 1 + du
    img = _img(seed, h, w, hi=1 << prec).astype(
        np.uint8 if prec <= 8 else np.uint16
    )
    jpg = encode_jpeg_lossless(
        img, precision=prec, arithmetic=True, dc_cond=(L, U)
    )
    assert b"\xff\xcc" in jpg  # DAC emitted
    assert np.array_equal(decode_jpeg_baseline(jpg), img)


@given(
    seed=st.integers(0, 2**32 - 1),
    interleave=st.booleans(),
    ri=st.sampled_from([0, 5]),
)
@settings(max_examples=60, deadline=None)
def test_arith_rgb_both_layouts(seed, interleave, ri):
    img = _img(seed, 9, 11, ch=3)
    jpg = encode_jpeg_lossless(
        img, predictor=6, interleave=interleave, restart_interval=ri,
        arithmetic=True,
    )
    assert np.array_equal(decode_jpeg_baseline(jpg), img)


def test_arith_equals_huffman_decode():
    """Both entropy layers carry the identical DPCM stream — decodes
    must agree bit-for-bit on the same source."""
    img = _img(11, 17, 13)
    for pred in range(1, 8):
        a = decode_jpeg_baseline(
            encode_jpeg_lossless(img, predictor=pred, arithmetic=True)
        )
        hh = decode_jpeg_baseline(encode_jpeg_lossless(img, predictor=pred))
        assert np.array_equal(a, hh)


def test_arith_max_magnitude_diff():
    img = np.array([[0, 65535], [32768, 1]], np.uint16)
    for pred in range(1, 8):
        dec = decode_jpeg_baseline(
            encode_jpeg_lossless(img, predictor=pred, arithmetic=True)
        )
        assert np.array_equal(dec, img), pred


def test_arith_adapts_on_smooth_content():
    """The context model must actually adapt: a smooth gradient's
    arithmetic stream should be far smaller than the huffman one
    (a broken estimator would code near-random bits)."""
    r, c = np.mgrid[0:64, 0:64]
    smooth = ((r + c) // 2).astype(np.uint8)
    a = encode_jpeg_lossless(smooth, arithmetic=True)
    hh = encode_jpeg_lossless(smooth)
    assert len(a) * 5 < len(hh), (len(a), len(hh))


def test_arith_validation():
    with pytest.raises(ValueError, match="arithmetic"):
        encode_jpeg_lossless(np.zeros((2, 2), np.uint8), dc_cond=(0, 1))
    # differential arithmetic DCT frames still raise; differential
    # arithmetic LOSSLESS outside a DHP stream fails loudly
    jpg = encode_jpeg_lossless(_img(1, 4, 4), arithmetic=True)
    k = jpg.index(b"\xff\xcb")
    for m in (0xCD, 0xCE):
        with pytest.raises(NotImplementedError):
            decode_jpeg_baseline(jpg[:k] + bytes([0xFF, m]) + jpg[k + 2 :])
    with pytest.raises(ValueError, match="hierarchical"):
        decode_jpeg_baseline(jpg[:k] + bytes([0xFF, 0xCF]) + jpg[k + 2 :])


# --------------------------------------------- hierarchical (Annex J)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(2, 33),
    w=st.integers(2, 33),
    levels=st.integers(0, 3),
    pred=st.integers(1, 7),
    arith=st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_hierarchical_roundtrip_exact(seed, h, w, levels, pred, arith):
    """DHP + initial frame + EXP-expanded differential frames: the
    pyramid reconstructs the source EXACTLY at every level count,
    with either entropy layer, because every differential frame is a
    lossless modulo-65536 correction over the deterministic J.1.1.2
    doubling filter."""
    from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
        encode_jpeg_hierarchical,
    )

    img = _img(seed, h, w)
    try:
        jpg = encode_jpeg_hierarchical(
            img, levels=levels, predictor=pred, arithmetic=arith
        )
    except ValueError as e:
        assert "too many levels" in str(e)
        return
    assert b"\xff\xde" in jpg  # DHP
    assert (b"\xff\xc7" in jpg or b"\xff\xcf" in jpg) == (levels > 0)
    dec = decode_jpeg_baseline(jpg)
    assert dec.shape == (h, w) and np.array_equal(dec, img)


def test_hierarchical_rgb_and_16bit():
    from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
        encode_jpeg_hierarchical,
    )

    rgb = _img(5, 19, 23, ch=3)
    for ar in (False, True):
        dec = decode_jpeg_baseline(
            encode_jpeg_hierarchical(rgb, levels=2, arithmetic=ar)
        )
        assert np.array_equal(dec, rgb), ar
    img16 = _img(6, 14, 11, hi=65536)
    dec = decode_jpeg_baseline(
        encode_jpeg_hierarchical(img16, levels=2, arithmetic=True)
    )
    assert dec.dtype == np.uint16 and np.array_equal(dec, img16)


def test_hierarchical_expand_filter_order():
    """The J.1.1.2 doubling is NOT commutative across axes (rounding);
    both sides apply horizontal-then-vertical. A checker image that
    rounds differently per order pins the convention."""
    from etl_everywhere_hub_spark.multimodal.jpeg import _expand_axis

    a = np.array(
        [[130, 69, 78], [10, 19, 4], [44, 208, 166], [233, 128, 155]],
        np.int32,
    )
    hv = _expand_axis(_expand_axis(a, 1), 0)
    vh = _expand_axis(_expand_axis(a, 0), 1)
    assert not np.array_equal(hv, vh)  # the pin is meaningful
    from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
        encode_jpeg_hierarchical,
    )

    img = ((np.arange(9)[:, None] * 3 + np.arange(11)[None, :] * 7) % 256
           ).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_baseline(encode_jpeg_hierarchical(img, levels=2)), img
    )


def test_hierarchical_errors():
    from etl_everywhere_hub_spark.multimodal.jpeg_lossless import (
        encode_jpeg_hierarchical,
    )

    with pytest.raises(ValueError, match="levels"):
        encode_jpeg_hierarchical(np.zeros((4, 4), np.uint8), levels=9)
    jpg = encode_jpeg_hierarchical(_img(1, 8, 8), levels=1)
    # a differential frame without DHP must fail loudly: strip DHP
    i = jpg.index(b"\xff\xde")
    ln = struct.unpack(">H", jpg[i + 2 : i + 4])[0]
    with pytest.raises(ValueError, match="hierarchical"):
        decode_jpeg_baseline(jpg[:i] + jpg[i + 2 + ln :])
    # differential DCT frames still raise
    for m in (0xC5, 0xC6, 0xCD, 0xCE):
        k = jpg.index(b"\xff\xc3")
        with pytest.raises(NotImplementedError, match="differential DCT"):
            decode_jpeg_baseline(jpg[:k] + bytes([0xFF, m]) + jpg[k + 2 :])
