"""Dependency-free GIF codec — decode + encode (GIF87a / GIF89a).

Implements the public CompuServe GIF specification (GIF87a, 1987;
GIF89a, 1990 — the spec text is public domain) the same way
multimodal/jpeg.py implements ITU-T T.81: pure stdlib + numpy, no
imaging libraries. Reference parity target: ``dfpc-coe/
etl-everywhere-hub`` has no codecs at all (``task.ts`` is a
connector); this exists for the repo's multimodal ingest surface
(SURVEY §2 LLM-pipeline ops) — GIF is by far the most common animated
raster format in real web crawls (VERDICT r10 item #2).

Decoder coverage:
- header + logical screen descriptor, global AND local color tables
- LZW decompression: variable code width (min_code_size+1 .. 12
  bits, LSB-first bit packing), CLEAR / END-OF-INFORMATION handling,
  the 4096-entry table freeze until the next CLEAR, data sub-block
  reassembly
- interlaced images (the 4-pass 8/8-4/8-2/4-1/2 row schedule)
- GIF89a extensions: Graphic Control (disposal method, transparency
  index, delay), Netscape 2.0 looping application extension, comment
  and plain-text extensions (skipped per spec sub-block framing)
- animation compositing with all three defined disposal methods:
  1 = do not dispose (leave canvas), 2 = restore to background,
  3 = restore to previous (canvas state before the frame was drawn);
  0 (unspecified) composites like 1, the universal renderer default

Compositing contract (documented, deterministic): the canvas starts
as the background COLOR (global color table entry indexed by the
logical-screen background field) or black when there is no global
table; transparent pixels (GCE transparency index) leave the
underlying canvas untouched; "restore to background" refills only the
frame's rectangle. decode_gif() returns the FIRST composited frame as
(h, w, 3) uint8 RGB; decode_gif_frames() returns every composited
canvas (the frame-sampling surface, mirroring webp.decode_webp_frames).

Encoder coverage (enough to exercise every decoder path under
property test, not a rate-optimised compressor): grayscale (implicit
256-gray palette) and paletted RGB stills, optional interlace,
multi-frame animations with per-frame placement rectangles, local
color tables, delays, transparency, and per-frame disposal; real LZW
compression with mid-stream table resets so decode(encode(x)) crosses
the CLEAR-handling path. Both versions are emitted: plain stills as
GIF87a, anything using an extension as GIF89a.

Bit order: GIF packs LZW code bits LSB-first into each byte (the
opposite of TIFF's MSB-first LZW — see multimodal/tiff.py).
"""

from __future__ import annotations

import struct

import numpy as np

GIF87A = b"GIF87a"
GIF89A = b"GIF89a"

# interlace pass schedule: (first row, row step) per spec appendix E
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    """Row permutation: output[i] = source row index of the i-th
    transmitted row (so deinterlace scatters transmitted rows back)."""
    order = []
    for first, step in _INTERLACE_PASSES:
        order.extend(range(first, h, step))
    return np.asarray(order, dtype=np.int64)


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first, CLEAR/EOI, 12-bit cap)
# ---------------------------------------------------------------------------


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Decode a GIF LZW stream (sub-blocks already reassembled) to
    exactly ``n_expected`` palette indexes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0
    # table: list of byte strings; indexes < clear are single bytes
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    ln = len(data)
    while True:
        while nbits < width:
            if pos >= ln:
                if n_out != n_expected:
                    raise ValueError(
                        f"GIF LZW stream truncated: {n_out}/{n_expected} pixels"
                    )
                return out
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            if n_out != n_expected:
                raise ValueError(
                    f"GIF EOI with {n_out}/{n_expected} pixels decoded"
                )
            return out
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF LZW first code {code} not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} beyond table {len(table)}")
        # width grows when the table reaches the current code space
        # (12-bit cap; a full table freezes until the next CLEAR)
        if len(table) == (1 << width) and width < 12:
            width += 1
        if n_out + len(entry) > n_expected:
            raise ValueError("GIF LZW output exceeds image size")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, np.uint8)
        n_out += len(entry)
        prev = entry
    raise AssertionError("unreachable")


def _lzw_encode(indexes: np.ndarray, min_code_size: int) -> bytes:
    """Encode palette indexes as a GIF LZW stream (starts with CLEAR,
    resets the table when it fills, ends with EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run = b""
    for b in bytes(indexes.astype(np.uint8).tobytes()):
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap a byte stream into <=255-byte GIF data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-blocks truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos : pos + n]
        if pos + n > len(payload):
            raise ValueError("GIF sub-block truncated")
        pos += n
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode_gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF to composited (h, w, 3) uint8 RGB
    canvases per the module-docstring compositing contract."""
    if payload[:6] not in (GIF87A, GIF89A):
        raise ValueError("not a GIF stream")
    w, h, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    if gct is not None and bg_idx < len(gct):
        canvas = np.broadcast_to(gct[bg_idx], (h, w, 3)).copy()
        bg_color = gct[bg_idx].copy()
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
        bg_color = np.zeros(3, dtype=np.uint8)
    frames: list[np.ndarray] = []
    # pending graphic-control state for the NEXT image block
    disposal = 0
    transparent: int | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                if size != 4:
                    raise ValueError(f"GCE block size {size} != 4")
                gpack = payload[pos + 1]
                disposal = (gpack >> 2) & 0x07
                # size byte, packed, delay u16le, transparent index
                transparent = payload[pos + 4] if gpack & 0x01 else None
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("GCE missing terminator")
                pos += 1
            else:  # comment / plain text / application: skip sub-blocks
                if label == 0x01 or label == 0xFF:
                    # these carry a fixed-size first sub-block, but the
                    # generic sub-block walk consumes it identically
                    pass
                _, pos = _read_sub_blocks(payload, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        fx, fy, fw, fh, fpack = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rectangle outside logical screen")
        lct = gct
        if fpack & 0x80:
            n = 2 << (fpack & 0x07)
            lct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if lct is None:
            raise ValueError("GIF image with neither global nor local palette")
        interlaced = bool(fpack & 0x40)
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 8:
            raise ValueError(f"GIF LZW min code size {min_code_size}")
        data, pos = _read_sub_blocks(payload, pos)
        idx = _lzw_decode(data, min_code_size, fw * fh).reshape(fh, fw)
        if interlaced:
            deint = np.empty_like(idx)
            deint[_interlace_order(fh)] = idx
            idx = deint
        if int(idx.max(initial=0)) >= len(lct):
            raise ValueError("GIF pixel index beyond palette")
        saved = canvas[fy : fy + fh, fx : fx + fw].copy()
        region = canvas[fy : fy + fh, fx : fx + fw]
        rgb = lct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = bg_color
        elif disposal == 3:
            canvas[fy : fy + fh, fx : fx + fw] = saved
        disposal = 0
        transparent = None
    if not frames:
        raise ValueError("GIF stream contains no image")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def _build_palette(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(palette (n,3) uint8, indexes (h,w)) for an RGB or gray image."""
    if img.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        return pal, img.astype(np.uint8)
    flat = img.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"GIF palette overflow: {len(pal)} distinct colors")
    return pal.astype(np.uint8), inv.reshape(img.shape[:2]).astype(np.uint8)


def _palette_block(pal: np.ndarray) -> tuple[bytes, int]:
    """Pad a palette to a power-of-two size; returns (bytes, size_bits)."""
    n = len(pal)
    bits = max(1, (max(n, 2) - 1).bit_length())
    full = 1 << bits
    padded = np.zeros((full, 3), dtype=np.uint8)
    padded[:n] = pal
    return padded.tobytes(), bits - 1


def encode_gif(
    img: np.ndarray,
    interlace: bool = False,
    lzw_min_code_size: int | None = None,
) -> bytes:
    """Encode one still image (grayscale (h,w) with the implicit
    256-gray palette, or (h,w,3) RGB with <=256 distinct colors) as
    GIF87a."""
    pal, idx = _build_palette(img)
    h, w = idx.shape
    pal_bytes, size_bits = _palette_block(pal)
    mcs = lzw_min_code_size or max(2, size_bits + 1)
    out = bytearray(GIF87A)
    out += struct.pack("<HHBBB", w, h, 0x80 | size_bits, 0, 0)
    out += pal_bytes
    out.append(0x2C)  # image separator
    out += struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    rows = idx[_interlace_order(h)] if interlace else idx
    out.append(mcs)
    out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)


def encode_gif_animation(
    screen: tuple[int, int],
    frames: list[dict],
    global_palette: np.ndarray | None = None,
    background_index: int = 0,
    loop: int | None = 0,
) -> bytes:
    """Encode a GIF89a animation.

    ``screen`` is (w, h). Each frame dict: ``indexes`` (fh, fw) uint8,
    ``palette`` (n,3) uint8 or None to use the global one, ``left``/
    ``top`` placement (default 0), ``disposal`` (0-3, default 0),
    ``delay_cs`` centiseconds (default 4), ``transparent`` index or
    None, ``interlace`` bool (default False).
    """
    w, h = screen
    out = bytearray(GIF89A)
    if global_palette is not None:
        pal_bytes, size_bits = _palette_block(global_palette)
        out += struct.pack(
            "<HHBBB", w, h, 0x80 | size_bits, background_index, 0
        )
        out += pal_bytes
    else:
        out += struct.pack("<HHBBB", w, h, 0, 0, 0)
    if loop is not None:
        out += b"\x21\xff\x0bNETSCAPE2.0"
        out += bytes([3, 1]) + struct.pack("<H", loop) + b"\x00"
    for fr in frames:
        idx = np.asarray(fr["indexes"], dtype=np.uint8)
        fh, fw = idx.shape
        disposal = int(fr.get("disposal", 0))
        transparent = fr.get("transparent")
        gpack = (disposal & 0x07) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04"
        out += bytes([gpack])
        out += struct.pack("<H", int(fr.get("delay_cs", 4)))
        out += bytes([transparent if transparent is not None else 0, 0])
        lct = fr.get("palette")
        fpack = 0x40 if fr.get("interlace") else 0
        out.append(0x2C)  # image separator
        out += struct.pack(
            "<HHHHB",
            int(fr.get("left", 0)),
            int(fr.get("top", 0)),
            fw,
            fh,
            fpack | (0x80 | _palette_block(lct)[1] if lct is not None else 0),
        )
        if lct is not None:
            out += _palette_block(lct)[0]
        n_pal = len(lct) if lct is not None else (
            len(global_palette) if global_palette is not None else 0
        )
        if n_pal == 0:
            raise ValueError("frame without any palette")
        mcs = max(2, (max(n_pal, 2) - 1).bit_length())
        rows = idx[_interlace_order(fh)] if fr.get("interlace") else idx
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out.append(0x3B)
    return bytes(out)
