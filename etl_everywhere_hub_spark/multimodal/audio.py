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


# ---------------------------------------------------------------------------
# IMA ADPCM (WAV format tag 0x11) — round 11, VERDICT r10 item #7
# ---------------------------------------------------------------------------

# IMA "Recommended Practices for Enhancing Digital Audio Compatibility"
# (public spec; also Microsoft WAVE format docs for the block layout)
_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_decode_nibble(pred: int, idx: int, n: int) -> tuple[int, int]:
    """One IMA ADPCM step: (predictor, step_index, 4-bit code) →
    (new predictor, new index). The spec's bit-serial reconstruction
    — diff = step/8 (+step if b2)(+step/2 if b1)(+step/4 if b0)."""
    step = int(_IMA_STEPS[idx])
    diff = step >> 3
    if n & 4:
        diff += step
    if n & 2:
        diff += step >> 1
    if n & 1:
        diff += step >> 2
    pred = pred - diff if n & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + int(_IMA_INDEX[n & 7])))
    return pred, idx


def ima_adpcm_decode_block(
    data: bytes, predictor: int, index: int
) -> np.ndarray:
    """Decode one mono IMA block body (nibble bytes AFTER the 4-byte
    header): low nibble first, then high. Returns int16 samples, one
    per nibble (the header predictor itself is sample 0 — the caller
    prepends it, matching every mainstream reader)."""
    out = np.empty(len(data) * 2, dtype=np.int16)
    pred, idx = predictor, index
    k = 0
    for b in data:
        for n in (b & 0x0F, b >> 4):
            pred, idx = _ima_decode_nibble(pred, idx, n)
            out[k] = pred
            k += 1
    return out


def ima_adpcm_encode_block(
    samples: np.ndarray, predictor: int, index: int
) -> bytes:
    """Greedy IMA quantizer (the spec's bit-serial form — the exact
    inverse of the decoder's reconstruction wherever no clamp engages,
    so re-encoding a CLAMP-FREE decoded stream reproduces it
    value-for-value; once the ±32767 or index clamp hits, ADPCM is
    genuinely lossy and only the error-bound property holds — both
    regimes pinned in tests/test_audio_codecs.py). ``samples`` are
    the targets AFTER the header sample."""
    out = bytearray()
    pred, idx = predictor, index
    nibbles = []
    for target in np.asarray(samples, dtype=np.int64):
        step = int(_IMA_STEPS[idx])
        diff = int(target) - pred
        n = 8 if diff < 0 else 0
        diff = abs(diff)
        if diff >= step:
            n |= 4
            diff -= step
        if diff >= step >> 1:
            n |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            n |= 1
        pred, idx = _ima_decode_nibble(pred, idx, n)
        nibbles.append(n)
    if len(nibbles) % 2:
        nibbles.append(0)
    for lo, hi in zip(nibbles[::2], nibbles[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out)


def wav_encode_ima_adpcm(
    blocks: list[tuple[int, int, bytes]], sample_rate: int = 8000
) -> bytes:
    """Mono IMA-ADPCM WAV writer. Each block is (initial_predictor,
    initial_step_index, nibble_bytes); all blocks must share one
    nibble length (WAV block_align is global). Writes the canonical
    fmt (tag 0x11, cbSize=2 samples-per-block) + fact + data layout."""
    if not blocks:
        raise ValueError("need at least one block")
    body_len = len(blocks[0][2])
    if any(len(b[2]) != body_len for b in blocks):
        raise ValueError("all blocks must share one nibble length")
    block_align = 4 + body_len
    spb = 1 + body_len * 2  # header sample + two samples per byte
    data = bytearray()
    for pred, idx, body in blocks:
        if not -32768 <= pred <= 32767 or not 0 <= idx <= 88:
            raise ValueError("block header out of range")
        data += struct.pack("<hBB", pred, idx, 0)
        data += body
    # fmt body (20 bytes): tag, channels, rate, avg bytes/sec,
    # block align, bits/sample(4), cbSize(2), samples-per-block
    fmt = b"fmt " + struct.pack(
        "<IHHIIHHHH",
        20, 0x11, 1, sample_rate,
        (sample_rate * block_align) // spb, block_align, 4, 2, spb,
    )
    fact = b"fact" + struct.pack("<II", 4, spb * len(blocks))
    n = len(data)
    hdr = b"RIFF" + struct.pack("<I", 4 + (8 + 20) + len(fact) + 8 + n)
    return (
        hdr + b"WAVE" + fmt + fact
        + b"data" + struct.pack("<I", n) + bytes(data)
    )


def wav_decode_ima_adpcm(payload: bytes) -> tuple[int, np.ndarray]:
    """Parse a mono IMA-ADPCM WAV: walks chunks to fmt (tag 0x11) and
    data, decodes every block (header sample + nibbles), honors the
    fact-chunk sample count when present (trailing-block truncation).
    Returns (sample_rate, int16 samples)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, block_align, spb, data, n_fact = 12, None, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            tag, ch, rate, _avg, block_align, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 0x11:
                raise ValueError(f"not IMA ADPCM (fmt tag {tag})")
            if ch != 1 or bits != 4:
                raise ValueError("only mono 4-bit IMA supported")
            if len(body) >= 20:
                (spb,) = struct.unpack("<H", body[18:20])
        elif cid == b"fact":
            (n_fact,) = struct.unpack("<I", body[:4])
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if rate is None or data is None or block_align is None:
        raise ValueError("missing fmt /data chunk")
    if spb is None:
        spb = 1 + (block_align - 4) * 2
    out = []
    for b0 in range(0, len(data), block_align):
        block = data[b0 : b0 + block_align]
        if len(block) < 4:
            raise ValueError("truncated IMA block header")
        pred, idx, _rsv = struct.unpack("<hBB", block[:4])
        if not 0 <= idx <= 88:
            raise ValueError(f"IMA step index {idx} out of range")
        out.append(np.array([pred], dtype=np.int16))
        out.append(ima_adpcm_decode_block(block[4:], pred, idx))
    samples = np.concatenate(out) if out else np.empty(0, np.int16)
    if n_fact is not None:
        if n_fact > len(samples):
            raise ValueError("fact count exceeds decoded samples")
        samples = samples[:n_fact]
    return rate, samples


# ---------------------------------------------------------------------------
# MP3 frame-header walk (demux only) — round 11, VERDICT r10 item #7
# ---------------------------------------------------------------------------

# ISO/IEC 11172-3 Layer III (MPEG1) header tables (public spec)
MP3_BITRATES_V1L3 = [  # kbps, index 1..14 (0=free, 15=bad)
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320,
]
MP3_RATES_V1 = [44100, 48000, 32000]  # index 0..2 (3=reserved)


def mp3_frame_header(
    bitrate_idx: int, rate_idx: int, padding: bool, channel_mode: int = 3
) -> bytes:
    """Build one MPEG1 Layer III frame header (sync + fields)."""
    if not 1 <= bitrate_idx <= 14 or not 0 <= rate_idx <= 2:
        raise ValueError("bitrate/samplerate index out of range")
    b0 = 0xFF
    b1 = 0xFB  # sync(3) + MPEG1(11) + Layer III(01) + no-CRC(1)
    b2 = (bitrate_idx << 4) | (rate_idx << 2) | (0x02 if padding else 0)
    b3 = (channel_mode & 3) << 6
    return bytes([b0, b1, b2, b3])


def mp3_frame_size(bitrate_idx: int, rate_idx: int, padding: bool) -> int:
    """MPEG1 Layer III: floor(144 * bitrate / samplerate) + padding."""
    return (
        144 * MP3_BITRATES_V1L3[bitrate_idx] * 1000
    ) // MP3_RATES_V1[rate_idx] + (1 if padding else 0)


def build_mp3(frames: list[tuple[int, int, bool]], junk: bytes = b"") -> bytes:
    """Concatenate MPEG1-L3 frames (bitrate_idx, rate_idx, padding)
    with deterministic filler bodies, preceded by ``junk`` bytes the
    walker must scan past (ID3/garbage prefix in real files)."""
    out = bytearray(junk)
    for k, (bi, ri, pad) in enumerate(frames):
        size = mp3_frame_size(bi, ri, pad)
        hdr = mp3_frame_header(bi, ri, pad)
        out += hdr + bytes([(k * 37 + 11) & 0xFF]) * (size - 4)
    return bytes(out)


def mp3_frame_walk(payload: bytes):
    """Scan to the first syncword, then walk frame headers by size.
    Returns (first_offset, [(offset, bitrate_kbps, samplerate,
    padding, size), ...]). MPEG1 Layer III only — other versions/
    layers raise (narrow, loud, like the image codecs). Resyncs are
    NOT attempted: a mid-stream bad header is a hard error, which the
    property tests pin (silent resync hides corrupt ranges from a
    curation pipeline)."""
    i = 0
    n = len(payload)
    while i + 1 < n and not (
        payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0
    ):
        i += 1
    if i + 4 > n:
        raise ValueError("no MP3 syncword found")
    first = i
    frames = []
    while i + 4 <= n:
        if not (payload[i] == 0xFF and (payload[i + 1] & 0xE0) == 0xE0):
            raise ValueError(f"lost sync at {i}")
        version = (payload[i + 1] >> 3) & 3
        layer = (payload[i + 1] >> 1) & 3
        if version != 3 or layer != 1:
            raise NotImplementedError(
                "only MPEG1 Layer III frame walk implemented"
            )
        bi = payload[i + 2] >> 4
        ri = (payload[i + 2] >> 2) & 3
        pad = bool(payload[i + 2] & 0x02)
        if bi in (0, 15) or ri == 3:
            raise ValueError(f"invalid bitrate/rate index at {i}")
        size = mp3_frame_size(bi, ri, pad)
        if i + size > n:
            raise ValueError(f"frame at {i} truncated ({size} bytes)")
        frames.append(
            (i, MP3_BITRATES_V1L3[bi], MP3_RATES_V1[ri], int(pad), size)
        )
        i += size
    if i != n:
        raise ValueError("trailing bytes after the last frame")
    return first, frames
