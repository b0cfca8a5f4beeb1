"""Harness-level pins for tools/cluster_smoke.py (round 10 — VERDICT
r9 item #3 added --codec-interop).

The smoke's real assertions need external tools this container lacks;
what CAN rot silently in here is the harness itself — flag plumbing,
skip messages, exit-code semantics, vector determinism. These tests
run the script in-process and pin that behavior, so an equipped host
gets a working harness the first time.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import cluster_smoke  # noqa: E402


def test_interop_vectors_deterministic_and_shaped():
    a = cluster_smoke._interop_vectors()
    b = cluster_smoke._interop_vectors()
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    grad_gray, grad_rgb, noise_rgb, gray16 = a
    assert grad_gray.dtype == np.uint8 and grad_gray.ndim == 2
    assert grad_rgb.shape[2] == 3 and noise_rgb.shape == (32, 32, 3)
    assert gray16.dtype == np.uint16 and gray16.max() > 255


def test_codec_interop_skips_cleanly_without_tools():
    """In this container every sub-check must SKIP(env) — never FAIL,
    never raise — and name the missing tool."""
    lines = cluster_smoke.smoke_codec_interop()
    subs = {ln.split("codec-interop/")[1].split(":")[0].split(" ")[0]: ln
            for ln in lines}
    assert set(subs) == {
        "png16", "adam7", "jpeg", "jpeg-arith", "vp8l", "vp8",
        "jpeg-lossless", "vp8x-alph", "vp8x-anim",  # round 10
        "gif", "tiff",  # round 11
        "zstd",  # round 12 (the one tool this container DOES have)
        "bzip2",  # round 12 (stdlib libbzip2 always present)
        "lz4",  # round 12 (CLI present in this container)
        "xz",  # round 12 (stdlib liblzma always present)
        "snappy",  # round 12 (Spark's JVM codec is the pin)
        "seqfile-zstd",  # round 12 format wave (Spark JVM SequenceFile pin)
        "tfrecord",  # round 12 format wave (tensorflow is the foreign coder)
    }
    for name, ln in subs.items():
        if ln.startswith("SKIP(env)"):
            continue
        # a PASS is legitimate if the host actually has the tool
        assert ln.startswith("PASS"), ln
    # the lossy-VP8 line must carry the placeholder-table warning either way
    assert "INTEROP_TABLES_VERIFIED" in subs["vp8"] or subs["vp8"].startswith(
        "PASS"
    )


def test_main_exit_zero_on_all_skips(capsys):
    rc = cluster_smoke.main(["--codec-interop"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "cluster_smoke summary" in out
    assert "codec-interop/" in out


def test_main_without_flag_mentions_recipe(capsys):
    rc = cluster_smoke.main([])
    out = capsys.readouterr().out
    assert rc == 0
    assert "--codec-interop" in out  # the skip line tells the user how
