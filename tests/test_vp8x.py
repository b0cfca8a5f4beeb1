"""VP8X extended WebP container tests — round 10 (closes the last
WebP raise: ALPH alpha planes + ANIM/ANMF animation compositing).

Contracts pinned here:
- ALPH filtering methods 0-3 are lossless round-trips (forward ==
  inverse⁻¹), in both raw (C=0) and headerless-VP8L (C=1)
  compression, so still-image alpha decodes EXACTLY;
- VP8X stills pair ALPH with lossy VP8 (the spec's pairing; VP8L
  carries its own alpha) and decode_webp_frames returns RGBA;
- animations composite deterministically: background-color init,
  per-frame blend-or-overwrite at (2x, 2y) offsets, snapshot, then
  dispose-to-background — with the floor-division alpha-over
  operator asserted against an independent integer rendering;
- the top-level decode_vp8l/decode_image API returns frames[0]
  collapsed to the RGB schema.

Compositor-rounding caveat (mirrors webp.py): the spec's over
operator is real-valued; this codec's floor rendering is
self-consistent and oracle-mirrored, with foreign-compositor interop
deferred to tools/cluster_smoke.py --codec-interop.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_everywhere_hub_spark.multimodal import decode_image
from etl_everywhere_hub_spark.multimodal.webp import (
    _decode_alph,
    _encode_alph,
    _forward_alpha_filter,
    _inverse_alpha_filter,
    decode_vp8l,
    decode_webp_frames,
    encode_webp_anim,
    encode_webp_vp8x_still,
)


def _rng(seed):
    return np.random.default_rng(seed)


# -------------------------------------------------------------- ALPH


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
    method=st.integers(0, 3),
    lossless=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_alph_roundtrip_every_filter_and_compression(
    seed, h, w, method, lossless
):
    a = _rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    body = _encode_alph(a, method, lossless)
    assert body[0] & 3 == (1 if lossless else 0)
    assert (body[0] >> 2) & 3 == method
    assert np.array_equal(_decode_alph(body, w, h), a)


@given(
    seed=st.integers(0, 2**32 - 1),
    h=st.integers(1, 16),
    w=st.integers(1, 16),
    method=st.integers(0, 3),
)
@settings(max_examples=200, deadline=None)
def test_alpha_filter_inverse_of_forward(seed, h, w, method):
    a = _rng(seed).integers(0, 256, (h, w)).astype(np.uint8)
    assert np.array_equal(
        _inverse_alpha_filter(_forward_alpha_filter(a, method), method), a
    )


def test_alph_errors():
    with pytest.raises(ValueError, match="empty"):
        _decode_alph(b"", 2, 2)
    with pytest.raises(ValueError, match="compression"):
        _decode_alph(bytes([2]) + bytes(4), 2, 2)
    with pytest.raises(ValueError, match="shorter"):
        _decode_alph(bytes([0]) + bytes(3), 2, 2)


# ----------------------------------------------------------- stills


def test_vp8x_still_vp8l_with_alpha_rgba_exact():
    rng = _rng(1)
    img = rng.integers(0, 256, (10, 12, 3)).astype(np.uint8)
    alpha = rng.integers(0, 256, (10, 12)).astype(np.uint8)
    payload = encode_webp_vp8x_still(
        img, alpha=alpha, alpha_filter=2, alpha_lossless=True
    )
    frames = decode_webp_frames(payload)
    assert len(frames) == 1 and frames[0].shape == (10, 12, 4)
    assert np.array_equal(frames[0][:, :, :3], img)
    assert np.array_equal(frames[0][:, :, 3], alpha)
    # top-level schema API: RGB, alpha dropped
    assert np.array_equal(decode_vp8l(payload), img)
    assert np.array_equal(decode_image(payload), img)


def test_vp8x_still_lossy_vp8_with_alpha():
    """The spec's canonical pairing: lossy VP8 pixels + ALPH plane.
    exact_dc constant-16x16-block source (q335's contract) makes the
    VP8 side pixel-exact, so both channels assert equality."""
    rng = _rng(2)
    vals = rng.integers(32, 127, 16).astype(np.uint8)
    img = np.repeat(np.repeat(vals.reshape(4, 4), 16, 0), 16, 1)
    alpha = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    payload = encode_webp_vp8x_still(
        img, alpha=alpha, alpha_filter=3, lossy=True,
        exact_dc=True, qindex=0,
    )
    f = decode_webp_frames(payload)[0]
    assert np.array_equal(f[:, :, 0], img)
    assert np.array_equal(f[:, :, 3], alpha)


def test_vp8x_flags_and_dims_in_header():
    img = np.zeros((6, 4, 3), np.uint8)
    payload = encode_webp_vp8x_still(
        img, alpha=np.zeros((6, 4), np.uint8)
    )
    i = payload.index(b"VP8X") + 8
    assert payload[i] & 0x10  # Alpha flag
    assert payload[i + 4] == 3 and payload[i + 7] == 5  # w-1, h-1


# -------------------------------------------------------- animation


def test_animation_composites_blend_dispose_and_offsets():
    rng = _rng(3)
    imgs = [rng.integers(0, 256, (16, 16)).astype(np.uint8) for _ in range(3)]
    frames_in = [
        dict(img=imgs[0], x=0, y=0),
        dict(img=imgs[1], x=16, y=0, blend=False, dispose=True),
        dict(img=imgs[2], x=0, y=16),
    ]
    payload = encode_webp_anim(frames_in, (32, 32), bg=(7, 11, 13, 255))
    out = decode_webp_frames(payload)
    assert len(out) == 3
    c0, c1, c2 = out
    assert np.array_equal(c0[0:16, 0:16, 0], imgs[0])
    assert (c0[16:, :, 0] == 7).all() and (c0[16:, :, 1] == 11).all()
    assert (c0[16:, :, 2] == 13).all()
    assert np.array_equal(c1[0:16, 16:32, 0], imgs[1])
    assert (c2[0:16, 16:32, 0] == 7).all()  # frame 1 disposed to bg
    assert np.array_equal(c2[16:32, 0:16, 0], imgs[2])
    assert np.array_equal(c2[0:16, 0:16, 0], imgs[0])  # frame 0 persists
    # top-level API = first composited frame, RGB
    assert np.array_equal(decode_image(payload)[0:16, 0:16, 0], imgs[0])


def test_animation_translucent_blend_floor_operator():
    base = dict(img=np.full((8, 8), 200, np.uint8), x=0, y=0, blend=False)
    top = dict(
        img=np.full((8, 8), 100, np.uint8), x=0, y=0,
        alpha=np.full((8, 8), 128, np.uint8),
    )
    payload = encode_webp_anim([base, top], (8, 8), bg=(0, 0, 0, 255))
    f1 = decode_webp_frames(payload)[1]
    fa, ca = 128, 255
    oa255 = fa * 255 + ca * (255 - fa)
    want = (100 * fa * 255 + 200 * ca * (255 - fa)) // oa255
    assert (f1[:, :, 0] == want).all()
    assert (f1[:, :, 3] == oa255 // 255).all()


def test_animation_zero_alpha_regions_blend_to_canvas():
    base = dict(img=np.full((4, 4), 50, np.uint8), x=0, y=0, blend=False)
    top = dict(
        img=np.full((4, 4), 99, np.uint8), x=0, y=0,
        alpha=np.zeros((4, 4), np.uint8),  # fully transparent frame
    )
    payload = encode_webp_anim([base, top], (4, 4), bg=(0, 0, 0, 255))
    f1 = decode_webp_frames(payload)[1]
    assert (f1[:, :, 0] == 50).all()  # canvas shows through


def test_anim_encode_validation_and_malformed_decode():
    img = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim([dict(img=img, x=1, y=0)], (8, 8))
    with pytest.raises(ValueError, match="exceeds"):
        encode_webp_anim([dict(img=img, x=6, y=0)], (8, 8))
    ok = encode_webp_anim([dict(img=img, x=0, y=0)], (8, 8))
    # truncate the ANMF header
    i = ok.index(b"ANMF")
    bad = ok[: i + 8] + ok[i + 8 : i + 16]
    with pytest.raises(ValueError):
        decode_webp_frames(bad)
    # ANMF before ANIM
    j = ok.index(b"ANIM")
    anim_len = 8 + struct.unpack("<I", ok[j + 4 : j + 8])[0]
    no_anim = ok[:j] + ok[j + anim_len :]
    with pytest.raises(ValueError, match="before ANIM"):
        decode_webp_frames(no_anim)


def test_simple_containers_still_single_frame():
    """decode_webp_frames also handles non-VP8X files: one frame."""
    from etl_everywhere_hub_spark.multimodal.webp import encode_vp8l

    rng = _rng(4)
    img = rng.integers(0, 256, (5, 7, 3)).astype(np.uint8)
    frames = decode_webp_frames(encode_vp8l(img))
    assert len(frames) == 1
    assert np.array_equal(frames[0][:, :, :3], img)
    assert (frames[0][:, :, 3] == 255).all()
