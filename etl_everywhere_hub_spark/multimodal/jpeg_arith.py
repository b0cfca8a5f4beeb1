"""Arithmetic-coded sequential JPEG (ITU-T T.81 Annexes D/F/G) —
decode AND encode, closing VERDICT r8 item #6 (the last JPEG decode
raise with a fully public spec).

Scope: 8-bit SEQUENTIAL arithmetic DCT frames (SOF9 / X'C9'), one
interleaved scan or per-component scans, DRI/RSTn restart intervals,
DAC conditioning markers (DC L/U bounds, AC Kx) — and, since round 10
(VERDICT r9 item #2), PROGRESSIVE arithmetic frames (SOFA / X'CA'):
spectral-selection + successive-approximation scans composed from the
same QM coder and Annex F statistics models per Annex G.2 (DC first =
sequential DC over point-transformed diffs; DC refinement = one
FIXED-bin bit per block; AC first = sequential AC over the band at
1 << Al; AC refinement = the figure-G.10 flow with EOB decisions past
the previous stage's end-of-block). With SOFA landed, every
JPEG/WebP-lossless decode raise on spec-valid 8-bit streams is gone.

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
    band: tuple = (0, 63, 0, 0),
) -> int:
    """Decode one arithmetic scan into the per-component quantized-
    coefficient stores (same contract as jpeg.py's huffman
    ``_decode_scan``). Sequential (SOF9) scans are F.2.4; progressive
    (SOFA) scans are G.2 — DC first/refinement and AC first/refinement
    over the ``band = (Ss, Se, Ah, Al)`` spectral window, round 10
    (VERDICT r9 item #2): the DC-first path is the sequential DC
    procedure over point-transformed diffs, DC refinement is one
    FIXED-bin decision per block, AC first is the sequential AC
    procedure bounded to the band with values scaled by 1 << Al, and
    AC refinement follows the spec's decode_AC_refinement flow
    (figure G.10): per-k EOB decisions only past the previous stage's
    end-of-block index, correction bits in the magnitude context
    (st+2), newly-significant bits in the run context (st+1) with the
    FIXED-bin sign. ``cond_dc[tbl] = (L, U)``, ``cond_ac[tbl] = Kx``
    (DAC marker or the T.81 defaults 0/1/5). Returns the payload
    position of the next marker."""
    fh, fw, comps, progressive = frame
    ss, se, ah, al = band
    is_dc = ss == 0
    if progressive and not is_dc and len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if progressive and is_dc and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
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

    def decode_dc(oi, zz, shift):
        """Sequential DC diff procedure (F.2.4.1 / Figures F.19-F.24);
        for progressive DC-first scans the decoded value is in the
        point-transformed domain and stored scaled by 1 << shift."""
        _cid, _hs, _vs, td, _ta = order[oi]
        dst = dc_stats[td]
        L, U = cond_dc.get(td, (0, 1))
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
        zz[0] = last_dc[oi] << shift

    def decode_ac_first(oi, zz, lo, hi, shift):
        """Sequential AC procedure (F.2.4.2 / Figure F.20) bounded to
        the band [lo, hi]; progressive AC-first values scale by
        1 << shift (G.2.3 is the sequential flow over the band)."""
        _cid, _hs, _vs, _td, ta = order[oi]
        ast = ac_stats[ta]
        kx = cond_ac.get(ta, 5)
        k = lo
        while k <= hi:
            st = 3 * (k - 1)
            if dec.decode(ast, st):
                break  # EOB
            while dec.decode(ast, st + 1) == 0:
                st += 3
                k += 1
                if k > hi:
                    raise ValueError("arith JPEG: AC run past band end")
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
            zz[k] = (-v if sign else v) << shift
            k += 1

    def decode_ac_refine(oi, zz, lo, hi, shift):
        """AC successive-approximation refinement (G.2 / the spec's
        decode_AC_refinement flow): EOB decisions only past the
        previous stage's end-of-block, correction bits for already-
        significant coefficients in the magnitude context st+2,
        newly-significant coefficients via st+1 + FIXED-bin sign."""
        _cid, _hs, _vs, _td, ta = order[oi]
        ast = ac_stats[ta]
        p1 = 1 << shift
        m1 = -1 << shift
        kex = hi  # previous-stage end-of-block index
        while kex >= lo and zz[kex] == 0:
            kex -= 1
        k = lo
        while k <= hi:
            st = 3 * (k - 1)
            if k > kex:
                if dec.decode(ast, st):
                    break  # EOB
            while True:
                if zz[k] != 0:  # already significant: correction bit
                    if dec.decode(ast, st + 2):
                        zz[k] += m1 if zz[k] < 0 else p1
                    break
                if dec.decode(ast, st + 1):  # newly significant
                    zz[k] = m1 if dec.decode(fixed, 0) else p1
                    break
                st += 3
                k += 1
                if k > hi:
                    raise ValueError("arith JPEG: AC refinement past band")
            k += 1

    def decode_block(oi, by_idx, bx_idx):
        cid, _hs, _vs, _td, _ta = order[oi]
        zz = coefs[cid][by_idx, bx_idx]
        if not progressive:
            decode_dc(oi, zz, 0)
            decode_ac_first(oi, zz, 1, 63, 0)
        elif is_dc and ah == 0:  # progressive DC first
            decode_dc(oi, zz, al)
        elif is_dc:  # progressive DC refinement: one FIXED-bin bit
            if dec.decode(fixed, 0):
                zz[0] |= 1 << al
        elif ah == 0:  # progressive AC first over the band
            decode_ac_first(oi, zz, ss, se, al)
        else:  # progressive AC refinement
            decode_ac_refine(oi, zz, ss, se, al)

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


def _encode_ac_mag(enc, ast, st, k, kx, t):
    """Magnitude of a nonzero AC value ``t`` (>= 1) at position ``k``:
    the category escalation with the Kx low/high split, then the
    bit-pattern bins — shared by the sequential and progressive
    AC-first scans (F.1.4.4.1.2 over the point-transformed value)."""
    m = 0
    v = t - 1
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


def _encode_ac_band(enc, ast, fixed, zz, kx, lo=1, hi=63, al=0):
    """AC coefficients of one block over the band [lo, hi] with point
    transform ``al`` — F.2.4.2's flow for sequential (lo=1, hi=63,
    al=0) and G.1's AC-first flow for progressive scans (magnitudes
    are abs(v) >> al, EOB is the last position nonzero AT THIS
    LEVEL)."""
    ke = hi
    while ke >= lo and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    k = lo
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(ast, st, 0)  # not EOB
        while (abs(int(zz[k])) >> al) == 0:
            enc.encode(ast, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ast, st + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(fixed, 0, sign)
        t = abs(v) >> al
        _encode_ac_mag(enc, ast, st + 2, k, kx, t)
        k += 1
    if k <= hi:
        enc.encode(ast, 3 * (k - 1), 1)  # EOB


def _encode_ac_block(enc, ast, fixed, zz, kx):
    _encode_ac_band(enc, ast, fixed, zz, kx, 1, 63, 0)


def _encode_ac_refine_band(enc, ast, fixed, zz, lo, hi, al):
    """AC successive-approximation refinement scan for one block —
    the encoder mirror of decode_ac_refine (spec G.1's
    encode_AC_refinement flow): EOB decisions only past the previous
    stage's end-of-block (kex), correction bits (the shifted LSB) in
    the magnitude context st+2 for already-significant coefficients,
    newly-significant coefficients via st+1 + FIXED-bin sign."""
    ke = hi  # end-of-block at THIS level
    while ke >= lo and (abs(int(zz[ke])) >> al) == 0:
        ke -= 1
    kex = ke  # end-of-block at the PREVIOUS level
    while kex >= lo and (abs(int(zz[kex])) >> (al + 1)) == 0:
        kex -= 1
    k = lo
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(ast, st, 0)  # not EOB
        while True:
            t = abs(int(zz[k])) >> al
            if t:
                if t > 1:  # already significant: correction bit
                    enc.encode(ast, st + 2, t & 1)
                    break
                enc.encode(ast, st + 1, 1)  # newly significant
                enc.encode(fixed, 0, 1 if int(zz[k]) < 0 else 0)
                break
            enc.encode(ast, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= hi:
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


def encode_jpeg_arith_progressive(
    img: "np.ndarray",
    quality: int = 90,
    quant_scale: int | None = None,
    dc_cond: tuple[int, int] = (0, 1),
    ac_kx: int = 5,
) -> bytes:
    """Progressive ARITHMETIC-coded JFIF encoder (SOFA / X'CA'), round
    10 (VERDICT r9 item #2): the same libjpeg-default scan script
    encode_jpeg_progressive emits with huffman (DC first at Al=1
    interleaved; luma AC in two spectral bands at Al=2 with
    refinements; chroma AC at Al=1 with refinements; DC refinement to
    Al=0), entropy-coded by the Annex D QM coder with the Annex G
    progressive statistics models — DC first scans run the sequential
    DC procedure over point-transformed diffs, DC refinements code one
    FIXED-bin bit per block, AC first scans run the sequential AC flow
    over the band on abs(v) >> Al, AC refinements use the
    encode_AC_refinement flow (EOB decisions past the previous
    stage's end-of-block, correction bits in st+2). 4:4:4 gray/RGB
    like encode_jpeg_arith; each scan gets a FRESH coder and
    statistics (F.1.4). Exists to generate test vectors: decode of
    this stream must be BIT-IDENTICAL to decode of the baseline/
    sequential-arithmetic stream at the same quantization, because
    every scan script carries the same quantized coefficients."""
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
        raise ValueError(
            f"encode_jpeg_arith_progressive: unsupported shape {a.shape}"
        )
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
    L, U = dc_cond

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(
            0xDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].astype(np.uint8))
        )
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs, tq, _p in comps:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += seg(0xCA, sof)  # SOFA: progressive arithmetic
    if (L, U) != (0, 1) or ac_kx != 5:
        out += seg(0xCC, bytes([0x00, (U << 4) | L, 0x10, ac_kx]))

    def sos_header(cis: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        sos = bytes([len(cis)])
        for ci in cis:
            sos += bytes([comps[ci][0], 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, sos)

    def dc_first_scan(al: int) -> bytes:
        body = bytearray(sos_header(list(range(len(comps))), 0, 0, 0, al))
        enc = ArithEncoder()
        dc_st = Stats(DC_BINS)
        last_dc = [0] * len(comps)
        dc_ctx = [0] * len(comps)
        bh, bw = coefs[0].shape[:2]
        for my in range(bh):
            for mx in range(bw):
                for ci in range(len(comps)):
                    v = int(coefs[ci][my, mx, 0]) >> al
                    diff = v - last_dc[ci]
                    last_dc[ci] = v
                    _encode_dc(enc, dc_st, dc_ctx, ci, diff, L, U)
        body += enc.flush()
        return bytes(body)

    def dc_refine_scan(al: int) -> bytes:
        body = bytearray(
            sos_header(list(range(len(comps))), 0, 0, al + 1, al)
        )
        enc = ArithEncoder()
        fixed = Stats(0)
        bh, bw = coefs[0].shape[:2]
        for my in range(bh):
            for mx in range(bw):
                for ci in range(len(comps)):
                    enc.encode(
                        fixed, 0, (int(coefs[ci][my, mx, 0]) >> al) & 1
                    )
        body += enc.flush()
        return bytes(body)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        body = bytearray(sos_header([ci], ss, se, 0, al))
        enc = ArithEncoder()
        ac_st = Stats(AC_BINS)
        fixed = Stats(0)
        bh, bw = coefs[ci].shape[:2]
        for my in range(bh):
            for mx in range(bw):
                _encode_ac_band(
                    enc, ac_st, fixed, coefs[ci][my, mx], ac_kx, ss, se, al
                )
        body += enc.flush()
        return bytes(body)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        body = bytearray(sos_header([ci], ss, se, al + 1, al))
        enc = ArithEncoder()
        ac_st = Stats(AC_BINS)
        fixed = Stats(0)
        bh, bw = coefs[ci].shape[:2]
        for my in range(bh):
            for mx in range(bw):
                _encode_ac_refine_band(
                    enc, ac_st, fixed, coefs[ci][my, mx], ss, se, al
                )
        body += enc.flush()
        return bytes(body)

    # libjpeg's default progressive script (gray keeps comp-0 rows)
    out += dc_first_scan(1)
    out += ac_first_scan(0, 1, 5, 2)
    if not gray:
        out += ac_first_scan(1, 1, 63, 1)
        out += ac_first_scan(2, 1, 63, 1)
    out += ac_first_scan(0, 6, 63, 2)
    out += ac_refine_scan(0, 1, 63, 1)
    out += dc_refine_scan(0)
    out += ac_refine_scan(0, 1, 63, 0)
    if not gray:
        out += ac_refine_scan(1, 1, 63, 0)
        out += ac_refine_scan(2, 1, 63, 0)
    out += b"\xff\xd9"
    return bytes(out)
