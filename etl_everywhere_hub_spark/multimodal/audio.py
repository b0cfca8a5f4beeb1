"""Audio as an opaque binary column: real RIFF/WAVE PCM codec.

Unlike the image path (where the container lacks compressed-format
codecs and q231 runs on uncompressed PPM/BMP), WAV PCM needs no
library at all — the RIFF container and 16-bit little-endian PCM
frames are parsed here byte-for-byte with struct/numpy, so the whole
encode → binary column → decode → window-stats pipeline runs on REAL
audio bytes end-to-end.

Scale posture mirrors the image path (multimodal/__init__.py): payloads
travel as Arrow binary batches through mapInPandas, per-track work is
map-only (zero shuffles before any aggregation), and the decoded
samples never leave the task as a Python-object column — only typed
stats/frames do. Reference parity: the reference treats attachments as
opaque payloads on the item (task.ts's item model); decode/feature
steps are the engine-side generalization SURVEY §2.B row "multimodal
columns" calls for.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

WAV_STATS_SCHEMA = (
    "track_id long, sample_rate int, n_samples long, byte_len long, "
    "sum_abs long, max_s int, min_s int"
)


def wav_encode_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Mono 16-bit PCM WAV writer: 44-byte canonical RIFF header +
    little-endian frames. Deterministic byte-for-byte (fixed chunk
    layout, no metadata chunks)."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    hdr = b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", n) + pcm


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a mono PCM-16 WAV payload: validates RIFF/WAVE magic,
    walks chunks to 'fmt ' and 'data' (tolerates extra chunks between
    them), checks format tag 1 (PCM), 1 channel, 16 bits. Returns
    (sample_rate, int16 sample array). Raises ValueError on any
    malformed header — the error-channel contract (R22): corrupt
    payloads fail loudly, not silently."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + sz > len(payload):
            # a corrupt oversized size field would otherwise silently
            # truncate the slice (fewer samples, or an odd frombuffer
            # length) — fail loudly per the R22 contract
            raise ValueError(
                f"chunk {cid!r} size {sz} overruns payload ({len(payload)} bytes)"
            )
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            if sz < 16:
                raise ValueError(f"fmt chunk too short ({sz} < 16 bytes)")
            tag, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or ch != 1 or bits != 16:
                raise ValueError(f"unsupported wav format {tag}/{ch}/{bits}")
        elif cid == b"data":
            if sz & 1:
                raise ValueError(f"odd data chunk size {sz} for 16-bit PCM")
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + sz + (sz & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return int(rate), data


def encode_wav_tracks(df: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """(track_id long, samples array<int>) → (track_id, payload binary):
    Arrow-batched map-only encode; the samples column dies inside the
    task, only the opaque payload column leaves."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "track_id": pdf["track_id"],
                    "payload": [
                        wav_encode_pcm16(s, sample_rate)
                        for s in pdf["samples"]
                    ],
                }
            )

    return df.select("track_id", "samples").mapInPandas(
        enc, schema="track_id long, payload binary"
    )


def wav_stats(media: DataFrame) -> DataFrame:
    """(track_id, payload) → per-track integer stats decoded from the
    real WAV bytes: parsed sample_rate, frame count, payload length,
    sum(|sample|) (int64 — the rectified energy the oracle can state in
    closed form), max/min sample. Map-only; int64 accumulation in
    numpy so the result is exact and engine-comparable."""

    def st(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tid, payload in zip(pdf["track_id"], pdf["payload"]):
                rate, s = wav_decode(bytes(payload))
                s64 = s.astype(np.int64)
                rows.append(
                    (
                        tid,
                        rate,
                        len(s),
                        len(payload),
                        int(np.abs(s64).sum()),
                        int(s64.max()),
                        int(s64.min()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "track_id",
                    "sample_rate",
                    "n_samples",
                    "byte_len",
                    "sum_abs",
                    "max_s",
                    "min_s",
                ],
            )

    return media.select("track_id", "payload").mapInPandas(
        st, schema=WAV_STATS_SCHEMA
    )


FRAME_SCHEMA = (
    "track_id long, frame_idx int, n_samples int, sum_sq long, peak int"
)


def wav_frame_energy(media: DataFrame, frame_len: int = 16) -> DataFrame:
    """(track_id, payload) → per-frame energy contour decoded from the
    real WAV bytes: non-overlapping ``frame_len``-sample frames, each
    emitting the exact int64 sum of squares and the peak |sample| —
    the VAD / silence-detection / loudness-normalization primitive.
    Map-only fan-out of n_samples/frame_len rows per track; int64
    numpy accumulation so the contour is engine-comparable exactly."""

    def fr(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for tid, payload in zip(pdf["track_id"], pdf["payload"]):
                _, s = wav_decode(bytes(payload))
                s64 = s.astype(np.int64)
                for i in range(0, len(s64), frame_len):
                    w = s64[i : i + frame_len]
                    rows.append(
                        (
                            tid,
                            i // frame_len,
                            len(w),
                            int((w * w).sum()),
                            int(np.abs(w).max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["track_id", "frame_idx", "n_samples", "sum_sq", "peak"],
            )

    return media.select("track_id", "payload").mapInPandas(
        fr, schema=FRAME_SCHEMA
    )
