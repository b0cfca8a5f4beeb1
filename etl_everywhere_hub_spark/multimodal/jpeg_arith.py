"""Arithmetic-coded sequential JPEG (ITU-T T.81 Annexes D/F/G) —
decode AND encode, closing VERDICT r8 item #6 (the last JPEG decode
raise with a fully public spec).

Scope: 8-bit SEQUENTIAL arithmetic DCT frames (SOF9 / X'C9'), one
interleaved scan or per-component scans, DRI/RSTn restart intervals,
DAC conditioning markers (DC L/U bounds, AC Kx). Progressive
arithmetic (SOFA) still raises in jpeg.py — narrow and documented.

Structure follows the SPEC, not any library:

- The QM-coder pair implements the Annex D flowcharts directly:
  decoder D.2 (DECODE with conditional MPS/LPS exchange, RENORMD,
  BYTEIN with the X'FF00' unstuffing rule and zero-feed after a
  marker), encoder D.1 (CODEMPS/CODELPS, RENORME, BYTEOUT with the
  carry-over-stacked-X'FF' logic, INITENC/FLUSH). The LPS subinterval
  sits at the TOP of [0, A) — C accumulates the bottom — and
  conditional exchange applies when A < Qe after the subtraction.
- The probability estimation state machine is Table D.3 (113 states +
  the non-adapting "fixed" state used for AC sign decisions, Qe =
  X'5A1D' with self-loops). MEMORY-RISK NOTE (same class as the VP8L
  distance map, multimodal/webp.py:32): the table below is this
  author's transcription of the public Table D.3. Encoder and decoder
  share it, so every roundtrip in the test suite pins the PAIR
  self-consistently at any table content; a transcription error in
  the estimator tail would affect interop with OTHER codecs'
  streams (slightly different adaptation path), not correctness of
  this module's own streams. q334 exercises decode-under-oracle over
  streams from this encoder, exactly as q331/q333 do for
  baseline-huffman and VP8L.
- The statistics models are Annex F sequential: DC per component uses
  the 4-way diff classification (zero/small/large × sign) over a
  64-bin table with magnitude-category escalation at X1=20; AC uses
  3 bins per K (EOB decision, run continuation, magnitude) over a
  256-bin table, low/high magnitude split at Kx, and the FIXED
  (non-adapting) bin for sign — F.1.4.4.1.2 / F.2.4.2 procedures.

Reference parity: dfpc-coe/etl-everywhere-hub has no codecs (task.ts
is a connector); this closes the repo's own multimodal coverage
ledger (COVERAGE.md item 3).
"""

from __future__ import annotations

import struct

import numpy as np

# Table D.3 — Qe value and probability estimation state machine.
# (Qe, NMPS, NLPS, SWITCH); index 113 is the non-adapting fixed bin.
_QE = [
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
]

_FIXED = 113  # the non-adapting bin (AC sign decisions, F.2.4.2)

DC_BINS = 64
AC_BINS = 256


class Stats:
    """One statistics area: per-bin (state index, MPS sense)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = [0] * n
        self.mps = [0] * n
        # the fixed bin lives past the end of every area
        self.idx.append(_FIXED)
        self.mps.append(0)

    def reset(self) -> None:
        n = len(self.idx) - 1
        self.idx[:n] = [0] * n
        self.mps[:n] = [0] * n


class ArithDecoder:
    """Annex D.2 decoder, shifting-C software convention. Consumes the
    entropy segment starting at ``pos``; stops feeding at any marker
    (then supplies zero bytes, D.2.8 note)."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.p = pos
        self.ended = False
        self.c = self._byte() << 16
        self._bytein()
        # software-convention alignment for INITENC's A = X'10000',
        # CT = 11 (probed self-consistent across biased random streams
        # incl. the carry/stacked-FF paths — see tests)
        self.c = (self.c << 8) & 0xFFFFFFFF
        self.ct -= 8
        self.a = 0x10000

    def _byte(self) -> int:
        if self.ended or self.p >= len(self.d):
            self.ended = True
            return 0
        b = self.d[self.p]
        if b == 0xFF:
            nxt = self.d[self.p + 1] if self.p + 1 < len(self.d) else 0xD9
            if nxt == 0x00:
                self.p += 2
                return 0xFF
            self.ended = True  # marker: leave p AT the 0xFF
            return 0
        self.p += 1
        return b

    def _bytein(self) -> None:
        self.c = (self.c + (self._byte() << 8)) & 0xFFFFFFFF
        self.ct = 8

    def decode(self, st: Stats, k: int) -> int:
        idx = st.idx[k]
        mps = st.mps[k]
        qe, nmps, nlps, sw = _QE[idx]
        self.a -= qe
        chigh = (self.c >> 16) & 0xFFFF
        if chigh >= self.a:
            # LPS subinterval (size Qe, top of [0, A))
            self.c = (self.c - (self.a << 16)) & 0xFFFFFFFF
            if self.a < qe:  # conditional exchange: MPS decoded
                d = mps
                st.idx[k] = nmps
            else:
                d = 1 - mps
                if sw:
                    st.mps[k] = 1 - mps
                st.idx[k] = nlps
            self.a = qe
        else:
            if self.a & 0x8000:
                return mps  # no renorm, no estimation update
            if self.a < qe:  # conditional exchange: LPS decoded
                d = 1 - mps
                if sw:
                    st.mps[k] = 1 - mps
                st.idx[k] = nlps
            else:
                d = mps
                st.idx[k] = nmps
        while self.a < 0x8000:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
        return d

    def marker_pos(self) -> int:
        """Position of the terminating marker's X'FF' (valid once the
        caller has decoded a full scan)."""
        return self.p


class ArithEncoder:
    """Annex D.1 encoder: CODEMPS/CODELPS + RENORME + BYTEOUT with
    carry propagation over stacked X'FF' bytes and X'FF00' stuffing."""

    def __init__(self):
        self.a = 0x10000  # INITENC (D.1.7): full interval, CT = 11
        self.c = 0
        self.ct = 11
        self.st_count = 0  # stacked 0xFF bytes awaiting carry resolution
        self.buffer = -1  # pending byte (-1 = none yet)
        self.out = bytearray()

    def _emit(self, b: int) -> None:
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0x00)  # D.1.6 zero-byte stuffing

    def _byteout(self) -> None:
        t = self.c >> 19
        if t > 0xFF:
            # carry ripples into the buffered byte and every stacked FF
            if self.buffer >= 0:
                self._emit(self.buffer + 1)
            while self.st_count:
                self._emit(0x00)  # 0xFF + carry -> 0x00 (carry consumed)
                self.st_count -= 1
            self.buffer = t & 0xFF
        elif t == 0xFF:
            self.st_count += 1  # may still absorb a future carry
        else:
            if self.buffer >= 0:
                self._emit(self.buffer)
            while self.st_count:
                self._emit(0xFF)
                self.st_count -= 1
            self.buffer = t
        self.c &= 0x7FFFF

    def _renorm(self) -> None:
        while self.a < 0x8000:
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
                self.ct = 8

    def encode(self, st: Stats, k: int, d: int) -> None:
        idx = st.idx[k]
        mps = st.mps[k]
        qe, nmps, nlps, sw = _QE[idx]
        if d == mps:
            self.a -= qe
            if self.a & 0x8000:
                return
            if self.a < qe:  # conditional exchange
                self.c = (self.c + self.a) & 0xFFFFFFFF
                self.a = qe
            st.idx[k] = nmps
            self._renorm()
        else:
            self.a -= qe
            if self.a >= qe:  # no exchange: LPS takes the top interval
                self.c = (self.c + self.a) & 0xFFFFFFFF
                self.a = qe
            # else (exchange): LPS keeps the bottom — C unchanged
            st.idx[k] = nlps
            if sw:
                st.mps[k] = 1 - mps
            self._renorm()

    def flush(self) -> bytes:
        # CLEARBITS (D.1.8): set as many low C bits to 0 as possible
        temp = (self.c + self.a - 1) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        # FINALWRITES
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << 8) & 0xFFFFFFFF
        self._byteout()
        if self.buffer >= 0:
            self._emit(self.buffer)
        while self.st_count:
            self._emit(0xFF)
            self.st_count -= 1
        self.buffer = -1
        # trailing zero bytes may be discarded (D.1.8); keep them for
        # simplicity — decoders feed zeros past the end anyway
        data = bytes(self.out)
        self.out = bytearray()
        return data


# ---------------------------------------------------------------------------
# Annex F sequential statistical model — decode side
# ---------------------------------------------------------------------------


def decode_scan_arith(
    d: bytes,
    pos: int,
    frame,
    scan,
    cond_dc: dict,
    cond_ac: dict,
    restart_interval: int,
    coefs: dict,
) -> int:
    """Decode one sequential arithmetic scan (F.2.4) into the
    per-component quantized-coefficient stores (same contract as
    jpeg.py's huffman ``_decode_scan``). ``cond_dc[tbl] = (L, U)``,
    ``cond_ac[tbl] = Kx`` (DAC marker or the T.81 defaults 0/1/5).
    Returns the payload position of the next marker."""
    fh, fw, comps, progressive = frame
    if progressive:
        raise NotImplementedError(
            "progressive arithmetic JPEG (SOFA) not supported"
        )
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    by_id = {c[0]: c for c in comps}
    from etl_everywhere_hub_spark.multimodal.jpeg import _comp_blocks

    order = []  # (cid, hs, vs, dc_tbl, ac_tbl)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError(f"scan references unknown component {cs}")
        cid, hs, vs, _tq = by_id[cs]
        order.append((cid, hs, vs, td, ta))
        if cid not in coefs:
            _bh, _bw, ph, pw = _comp_blocks(fh, fw, hs, vs, hmax, vmax)
            coefs[cid] = np.zeros((ph, pw, 64), np.int64)

    dc_stats: dict[int, Stats] = {}
    ac_stats: dict[int, Stats] = {}
    for _cid, _hs, _vs, td, ta in order:
        dc_stats.setdefault(td, Stats(DC_BINS))
        ac_stats.setdefault(ta, Stats(AC_BINS))
    fixed = Stats(0)  # only the trailing fixed bin

    dec = ArithDecoder(d, pos)
    last_dc = [0] * len(order)
    dc_ctx = [0] * len(order)

    def decode_block(oi, by_idx, bx_idx):
        cid, _hs, _vs, td, ta = order[oi]
        zz = coefs[cid][by_idx, bx_idx]
        dst = dc_stats[td]
        L, U = cond_dc.get(td, (0, 1))
        # --- DC difference (F.2.4.1 / Figure F.19-F.24) ---
        ctx = dc_ctx[oi]
        if dec.decode(dst, ctx) == 0:
            dc_ctx[oi] = 0
        else:
            sign = dec.decode(dst, ctx + 1)
            st = ctx + 2 + sign
            m = dec.decode(dst, st)
            if m:
                st = 20  # X1 (Table F.4)
                while dec.decode(dst, st):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arith JPEG: DC magnitude overflow")
                    st += 1
            if m < (1 << L) >> 1:
                dc_ctx[oi] = 0
            elif m > (1 << U) >> 1:
                dc_ctx[oi] = 12 + sign * 4
            else:
                dc_ctx[oi] = 4 + sign * 4
            v = m
            st += 14  # magnitude bit-pattern bins (Figure F.24)
            while m >> 1:
                m >>= 1
                if dec.decode(dst, st):
                    v |= m
            v += 1
            last_dc[oi] += -v if sign else v
        zz[0] = last_dc[oi]
        # --- AC coefficients (F.2.4.2 / Figure F.20) ---
        ast = ac_stats[ta]
        kx = cond_ac.get(ta, 5)
        k = 1
        while k <= 63:
            st = 3 * (k - 1)
            if dec.decode(ast, st):
                break  # EOB
            while dec.decode(ast, st + 1) == 0:
                st += 3
                k += 1
                if k > 63:
                    raise ValueError("arith JPEG: AC run past k=63")
            sign = dec.decode(fixed, 0)
            st += 2
            m = dec.decode(ast, st)
            if m:
                if dec.decode(ast, st):
                    m <<= 1
                    st = 189 if k <= kx else 217
                    while dec.decode(ast, st):
                        m <<= 1
                        if m == 0x8000:
                            raise ValueError(
                                "arith JPEG: AC magnitude overflow"
                            )
                        st += 1
            v = m
            st += 14
            while m >> 1:
                m >>= 1
                if dec.decode(ast, st):
                    v |= m
            v += 1
            zz[k] = -v if sign else v
            k += 1

    def restart():
        nonlocal dec, last_dc, dc_ctx
        # decoder stops feeding at the RSTn marker; skip it, re-init
        p2 = dec.marker_pos()
        if not (d[p2] == 0xFF and 0xD0 <= d[p2 + 1] <= 0xD7):
            raise ValueError("arith JPEG: expected RSTn at restart")
        dec = ArithDecoder(d, p2 + 2)
        for stt in dc_stats.values():
            stt.reset()
        for stt in ac_stats.values():
            stt.reset()
        last_dc = [0] * len(order)
        dc_ctx = [0] * len(order)

    mcu_count = 0
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
                    restart()
                for oi, (cid, hs, vs, _td, _ta) in enumerate(order):
                    for by in range(vs):
                        for bx in range(hs):
                            decode_block(oi, my * vs + by, mx * hs + bx)
                mcu_count += 1
    else:
        cid, hs, vs, _td, _ta = order[0]
        bh, bw, _ph, _pw = _comp_blocks(fh, fw, hs, vs, hmax, vmax)
        for my in range(bh):
            for mx in range(bw):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    restart()
                decode_block(0, my, mx)
                mcu_count += 1

    # the decoder's byte pointer rests at (or before) the next marker
    p2 = dec.marker_pos()
    while p2 + 1 < len(d) and not (d[p2] == 0xFF and d[p2 + 1] != 0x00):
        p2 += 1
    return p2


# ---------------------------------------------------------------------------
# Annex F sequential statistical model — encode side
# ---------------------------------------------------------------------------


def _encode_dc(enc, dst, dc_ctx, oi, diff, L, U):
    ctx = dc_ctx[oi]
    if diff == 0:
        enc.encode(dst, ctx, 0)
        dc_ctx[oi] = 0
        return
    enc.encode(dst, ctx, 1)
    if diff > 0:
        enc.encode(dst, ctx + 1, 0)
        sign = 0
        v = diff
    else:
        enc.encode(dst, ctx + 1, 1)
        sign = 1
        v = -diff
    st = ctx + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(dst, st, 1)
        m = 1
        st = 20
        v2 = v
        while v2 >> 1:
            v2 >>= 1
            enc.encode(dst, st, 1)
            m <<= 1
            st += 1
    enc.encode(dst, st, 0)
    if m < (1 << L) >> 1:
        dc_ctx[oi] = 0
    elif m > (1 << U) >> 1:
        dc_ctx[oi] = 12 + sign * 4
    else:
        dc_ctx[oi] = 4 + sign * 4
    st += 14
    while m >> 1:
        m >>= 1
        enc.encode(dst, st, 1 if (m & v) else 0)


def _encode_ac_block(enc, ast, fixed, zz, kx):
    ke = 63
    while ke > 0 and zz[ke] == 0:
        ke -= 1
    k = 1
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ast, st, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(ast, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ast, st + 1, 1)
        v = int(zz[k])
        if v > 0:
            enc.encode(fixed, 0, 0)
            sign = 0
        else:
            enc.encode(fixed, 0, 1)
            sign = 1
            v = -v
        st += 2
        m = 0
        v -= 1
        if v:
            enc.encode(ast, st, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                v2 >>= 1
                enc.encode(ast, st, 1)
                m <<= 1
                st = 189 if k <= kx else 217
                while v2 >> 1:
                    v2 >>= 1
                    enc.encode(ast, st, 1)
                    m <<= 1
                    st += 1
        enc.encode(ast, st, 0)
        st += 14
        while m >> 1:
            m >>= 1
            enc.encode(ast, st, 1 if (m & v) else 0)
        k += 1
    if k <= 63:
        enc.encode(ast, 3 * (k - 1), 1)  # EOB


def encode_jpeg_arith(
    img: "np.ndarray",
    quality: int = 90,
    quant_scale: int | None = None,
    restart_interval: int = 0,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
    interleaved: bool = True,
) -> bytes:
    """Sequential arithmetic-coded JFIF encoder (SOF9) for 8-bit gray
    (h, w) or RGB (h, w, 3), 4:4:4. ``dc_cond=(L, U)`` / ``ac_kx``
    set the conditioning; non-default values emit a DAC segment
    (B.2.4.3) so the decoder's DAC parse and the classification /
    Kx-split boundaries are exercised end-to-end.
    ``interleaved=False`` writes one SOS per component (A.2.2) — each
    scan gets its OWN coder and statistics per spec. The entropy layer
    is the Annex D coder above; everything upstream (color transform,
    FDCT, quantization, headers) is shared with
    ``encode_jpeg_baseline``."""
    from etl_everywhere_hub_spark.multimodal.jpeg import (
        QUANT_CHROMA,
        QUANT_LUMA,
        ZIGZAG,
        _fdct_quant,
        _pad_replicate,
        _rgb_to_ycbcr,
        _scale_quant,
    )

    a = np.ascontiguousarray(img, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and not (a.ndim == 3 and a.shape[2] == 3):
        raise ValueError(f"encode_jpeg_arith: unsupported shape {a.shape}")
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
    else:
        ycc = _rgb_to_ycbcr(a)
        comps = [
            (i + 1, 1, 1, 0 if i == 0 else 1,
             _pad_replicate(ycc[:, :, i], 8, 8))
            for i in range(3)
        ]
    coefs = []
    for _cid, _hs, _vs, tq, plane in comps:
        qt = qt_l if tq == 0 else qt_c
        zz = _fdct_quant(plane, qt)
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        coefs.append(zz.reshape(bh, bw, 64))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    # SOF9: arithmetic sequential
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq, _p in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xC9, sof)
    L, U = dc_cond
    if (L, U) != (0, 1) or ac_kx != 5:
        # DAC (B.2.4.3): Tc/Tb byte + conditioning byte per table
        out += seg(0xCC, bytes([0x00, (U << 4) | L, 0x10, ac_kx]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))

    def encode_scan(scan_comps: list[int]) -> bytes:
        """One SOS segment + entropy data for the given component
        indices; fresh coder and statistics per scan (F.1.4)."""
        body = bytearray()
        sos = bytes([len(scan_comps)])
        for oi in scan_comps:
            sos += bytes([comps[oi][0], 0x00])
        sos += bytes([0, 63, 0])
        body += seg(0xDA, sos)
        dc_st = Stats(DC_BINS)
        ac_st = Stats(AC_BINS)
        fixed = Stats(0)
        enc = ArithEncoder()
        last_dc = {oi: 0 for oi in scan_comps}
        dc_ctx = {oi: 0 for oi in scan_comps}
        bh, bw = coefs[scan_comps[0]].shape[:2]
        mcu_count = 0
        rst = 0
        for my in range(bh):
            for mx in range(bw):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    body += enc.flush()
                    body += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) & 7
                    dc_st.reset()
                    ac_st.reset()
                    enc = ArithEncoder()
                    last_dc = {oi: 0 for oi in scan_comps}
                    dc_ctx = {oi: 0 for oi in scan_comps}
                for oi in scan_comps:
                    zz = coefs[oi][my, mx]
                    diff = int(zz[0]) - last_dc[oi]
                    last_dc[oi] = int(zz[0])
                    _encode_dc(enc, dc_st, dc_ctx, oi, diff, L, U)
                    _encode_ac_block(enc, ac_st, fixed, zz, ac_kx)
                mcu_count += 1
        body += enc.flush()
        return bytes(body)

    if interleaved:
        out += encode_scan(list(range(len(comps))))
    else:
        for oi in range(len(comps)):
            out += encode_scan([oi])
    out += b"\xff\xd9"
    return bytes(out)
