"""Codec sniffing tests (multimodal/sniff.py): every magic in the
family routes to its own decoder, ambiguity-adjacent prefixes stay
decisive, tar is recognized at offset 257, and unknown bytes refuse
loudly instead of guessing."""

from __future__ import annotations

import bz2
import io
import lzma
import tarfile

import pytest

from etl_everywhere_hub_spark.multimodal.deflate import gzip_member
from etl_everywhere_hub_spark.multimodal.lz4 import lz4_compress
from etl_everywhere_hub_spark.multimodal.lz4 import (
    skippable_frame as lz4_skippable,
)
from etl_everywhere_hub_spark.multimodal.sniff import decode_auto, sniff_codec
from etl_everywhere_hub_spark.multimodal.zstd import (
    skippable_frame,
    zstd_compress,
)

_PLAIN = b"mixed codec corpus payload " * 64


def test_every_family_member_routes_home():
    blobs = {
        "gzip": gzip_member(_PLAIN),
        "zstd": zstd_compress(_PLAIN),
        "bzip2": bz2.compress(_PLAIN),
        "lz4": lz4_compress(_PLAIN),
        "xz": lzma.compress(_PLAIN),
    }
    for want, blob in blobs.items():
        codec, out = decode_auto(blob)
        assert (codec, out) == (want, _PLAIN), want


def test_skippable_led_streams():
    # a zstd stream led by a skippable frame is still zstd
    blob = skippable_frame(b"meta", 2) + zstd_compress(_PLAIN)
    assert decode_auto(blob) == ("zstd", _PLAIN)
    # the zstd and LZ4 SKIPPABLE magic ranges are IDENTICAL in both
    # specs (0x184D2A50..5F) — a stream whose first frame is
    # skippable is genuinely ambiguous from magic alone. The contract
    # is loud-not-silent: the sniff picks zstd, and if the payload
    # frames are actually LZ4 the zstd walk raises instead of
    # returning garbage.
    blob = lz4_skippable(b"meta", 2) + lz4_compress(_PLAIN)
    assert sniff_codec(blob) == "zstd"
    with pytest.raises(ValueError):
        decode_auto(blob)
    # payload-first frames are never ambiguous
    assert sniff_codec(zstd_compress(_PLAIN)) == "zstd"
    assert sniff_codec(lz4_compress(_PLAIN)) == "lz4"


def test_tar_at_offset_257():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tf:
        ti = tarfile.TarInfo("a.txt")
        ti.size = 2
        tf.addfile(ti, io.BytesIO(b"hi"))
    codec, out = decode_auto(buf.getvalue())
    assert codec == "tar" and out == buf.getvalue()


def test_bzh_needs_a_level_digit():
    assert sniff_codec(bz2.compress(b"x", 7)) == "bzip2"
    with pytest.raises(ValueError, match="refusing"):
        sniff_codec(b"BZhX not a stream")


def test_unknown_bytes_refuse():
    for junk in (b"plain text here", b"", b"\x00\x01\x02\x03",
                 b"{\"json\": 1}\n"):
        with pytest.raises(ValueError, match="refusing"):
            sniff_codec(junk)
