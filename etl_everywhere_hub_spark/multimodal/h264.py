"""H.264/AVC parameter-set parsing — the codec-METADATA step after
MP4 demux (round 11; extends mp4.py per VERDICT r10 item #4's scope
note: "demux-to-keyframe-ranges ... even if H.264 decode stays out of
scope").

What a 100 TB multimodal crawl needs from video before any transcode
decision is the stream's shape: resolution, profile/level, bit
depth, chroma format, reference-frame count, frame rate. All of it
lives in the SPS/PPS parameter sets carried by the ``avcC``
configuration box (ISO/IEC 14496-15 §5.2.4.1) inside the stsd sample
entry — a few dozen BYTES per file, parsed without touching a single
coded slice. This module implements, from the public specs:

- ITU-T H.264 §7.3.2.1.1 ``seq_parameter_set_rbsp`` — full syntax:
  the high-profile branch (chroma_format_idc, separate colour
  planes, bit depths, seq scaling matrices with the §7.3.2.1.1.1
  delta-scale lists), all three pic_order_cnt types, frame cropping
  with the §7.4.2.1.1 CropUnitX/Y arithmetic (chroma-subsampling-
  and field-coding-dependent), and VUI timing/HRD (§E.1.1-E.1.2) for
  frame-rate extraction.
- §7.3.2.2 ``pic_parameter_set_rbsp`` through the trailing
  more_rbsp_data() tail (transform_8x8, second chroma QP offset);
  FMO slice-group maps raise loudly (NotImplementedError) rather
  than mis-parse.
- §7.3.1/§7.4.1 NAL wrapping: emulation-prevention byte removal and
  insertion (00 00 0x → 00 00 03 0x), rbsp_stop_one_bit trailing.
- 14496-15 ``AVCDecoderConfigurationRecord`` parse/build, including
  the high-profile extension tail.

Encoders exist for every parser (bit-exact roundtrip property in
tests/test_h264.py) — the house codec-module contract: fixtures are
hand-built streams, so a parser bug cannot hide behind its own
writer.

Scale shape: parameter sets are parsed worker-side per Arrow batch in
mapInPandas (q351); the driver never sees a NAL byte.
"""

from __future__ import annotations

import struct

HIGH_PROFILE_IDCS = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}

# §6.2 Table 6-1: chroma_format_idc -> (SubWidthC, SubHeightC)
_SUBSAMPLING = {1: (2, 2), 2: (2, 1), 3: (1, 1)}


class BitReader:
    """MSB-first bit reader with H.264's ue(v)/se(v) exp-Golomb."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def more_rbsp_data(self) -> bool:
        """§7.2: data remains iff bits exist past the last-set
        rbsp_stop_one_bit."""
        total = len(self.data) * 8
        if self.pos >= total:
            return False
        last = total - 1
        while last >= 0:
            byte = last >> 3
            if (self.data[byte] >> (7 - (last & 7))) & 1:
                break
            last -= 1
        return self.pos < last


class BitWriter:
    def __init__(self):
        self.bits: list = []

    def u(self, v: int, n: int) -> "BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v: int) -> "BitWriter":
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)
        return self

    def se(self, v: int) -> "BitWriter":
        return self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp_trailing(self) -> bytes:
        self.bits.append(1)
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention bytes (00 00 03 -> 00 00, §7.4.1)."""
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(data):
        b = data[i]
        if zeros >= 2 and b == 3 and i + 1 <= len(data):
            # emulation_prevention_three_byte: skip, reset run
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 followed by
    0/1/2/3 gets an 03 interposed (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _scaling_list(r: BitReader, size: int) -> list:
    """§7.3.2.1.1.1 — delta-coded scaling list; next_scale==0 freezes
    the remainder at last_scale (or flags the default matrix at j=0,
    which we record as an all-zero sentinel handled by the caller)."""
    last, nxt = 8, 8
    scale = []
    for _j in range(size):
        if nxt != 0:
            delta = r.se()
            nxt = (last + delta + 256) % 256
        scale.append(last if nxt == 0 else nxt)
        last = scale[-1]
    return scale


def _write_scaling_list(w: BitWriter, scale: list) -> None:
    last = 8
    for v in scale:
        w.se((v - last + 256 + 128) % 256 - 128)
        last = v
    # always writes every delta (no early freeze) — decodes identically


def parse_sps(nal: bytes) -> dict:
    """Parse a complete SPS NAL unit (header byte + EBSP payload) into
    a flat dict, including derived ``width``/``height`` (§7.4.2.1.1
    crop-unit arithmetic) and ``fps`` when VUI timing is present."""
    if not nal:
        raise ValueError("empty NAL")
    if nal[0] & 0x80:
        raise ValueError("forbidden_zero_bit set")
    if nal[0] & 0x1F != 7:
        raise ValueError(f"not an SPS NAL (type {nal[0] & 0x1F})")
    r = BitReader(ebsp_to_rbsp(nal[1:]))
    s: dict = {}
    s["profile_idc"] = r.u(8)
    s["constraint_flags"] = r.u(8)
    s["level_idc"] = r.u(8)
    s["seq_parameter_set_id"] = r.ue()
    s["chroma_format_idc"] = 1
    s["separate_colour_plane_flag"] = 0
    s["bit_depth_luma"] = 8
    s["bit_depth_chroma"] = 8
    s["scaling_lists"] = None
    if s["profile_idc"] in HIGH_PROFILE_IDCS:
        s["chroma_format_idc"] = r.ue()
        if s["chroma_format_idc"] == 3:
            s["separate_colour_plane_flag"] = r.u(1)
        s["bit_depth_luma"] = 8 + r.ue()
        s["bit_depth_chroma"] = 8 + r.ue()
        s["qpprime_y_zero_transform_bypass_flag"] = r.u(1)
        if r.u(1):  # seq_scaling_matrix_present_flag
            n = 8 if s["chroma_format_idc"] != 3 else 12
            lists = []
            for i in range(n):
                if r.u(1):
                    lists.append(_scaling_list(r, 16 if i < 6 else 64))
                else:
                    lists.append(None)
            s["scaling_lists"] = lists
    s["log2_max_frame_num"] = 4 + r.ue()
    s["pic_order_cnt_type"] = r.ue()
    if s["pic_order_cnt_type"] == 0:
        s["log2_max_pic_order_cnt_lsb"] = 4 + r.ue()
    elif s["pic_order_cnt_type"] == 1:
        s["delta_pic_order_always_zero_flag"] = r.u(1)
        s["offset_for_non_ref_pic"] = r.se()
        s["offset_for_top_to_bottom_field"] = r.se()
        n = r.ue()
        s["offsets_for_ref_frame"] = [r.se() for _ in range(n)]
    s["max_num_ref_frames"] = r.ue()
    s["gaps_in_frame_num_value_allowed_flag"] = r.u(1)
    pw_mbs = r.ue() + 1
    ph_map = r.ue() + 1
    s["pic_width_in_mbs"] = pw_mbs
    s["pic_height_in_map_units"] = ph_map
    s["frame_mbs_only_flag"] = r.u(1)
    if not s["frame_mbs_only_flag"]:
        s["mb_adaptive_frame_field_flag"] = r.u(1)
    s["direct_8x8_inference_flag"] = r.u(1)
    crop = (0, 0, 0, 0)
    if r.u(1):  # frame_cropping_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())
    s["crop"] = crop
    # §7.4.2.1.1: crop units depend on chroma subsampling + field mode
    chroma_array_type = (
        0 if s["separate_colour_plane_flag"] else s["chroma_format_idc"]
    )
    if chroma_array_type == 0:
        cux, cuy = 1, 2 - s["frame_mbs_only_flag"]
    else:
        sw, sh = _SUBSAMPLING[chroma_array_type]
        cux, cuy = sw, sh * (2 - s["frame_mbs_only_flag"])
    s["width"] = pw_mbs * 16 - cux * (crop[0] + crop[1])
    s["height"] = (
        (2 - s["frame_mbs_only_flag"]) * ph_map * 16 - cuy * (crop[2] + crop[3])
    )
    s["fps"] = None
    if r.u(1):  # vui_parameters_present_flag
        _parse_vui(r, s)
    return s


def _parse_vui(r: BitReader, s: dict) -> None:
    """§E.1.1 — enough of VUI to recover timing (fps) and pass
    through the rest structurally."""
    if r.u(1):  # aspect_ratio_info_present
        idc = r.u(8)
        if idc == 255:  # Extended_SAR
            r.u(16)
            r.u(16)
    if r.u(1):  # overscan_info_present
        r.u(1)
    if r.u(1):  # video_signal_type_present
        r.u(3)
        r.u(1)
        if r.u(1):  # colour_description_present
            r.u(24)
    if r.u(1):  # chroma_loc_info_present
        r.ue()
        r.ue()
    if r.u(1):  # timing_info_present
        num_units_in_tick = r.u(32)
        time_scale = r.u(32)
        r.u(1)  # fixed_frame_rate_flag
        if num_units_in_tick:
            # §E.2.1: field rate = time_scale / num_units_in_tick;
            # frame rate is half that for frame-coded content
            s["fps"] = time_scale / (2 * num_units_in_tick)
            s["num_units_in_tick"] = num_units_in_tick
            s["time_scale"] = time_scale
    nal_hrd = r.u(1)
    if nal_hrd:
        _parse_hrd(r)
    vcl_hrd = r.u(1)
    if vcl_hrd:
        _parse_hrd(r)
    if nal_hrd or vcl_hrd:
        r.u(1)  # low_delay_hrd_flag
    r.u(1)  # pic_struct_present
    if r.u(1):  # bitstream_restriction (§E.1.1 tail, in spec order)
        r.u(1)  # motion_vectors_over_pic_boundaries_flag
        for _ in range(4):  # max_bytes/bits denoms, mv length log2s
            r.ue()
        s["max_num_reorder_frames"] = r.ue()
        s["max_dec_frame_buffering"] = r.ue()


def _parse_hrd(r: BitReader) -> None:
    """§E.1.2 hypothetical reference decoder parameters."""
    cpb_cnt = r.ue() + 1
    r.u(4)  # bit_rate_scale
    r.u(4)  # cpb_size_scale
    for _ in range(cpb_cnt):
        r.ue()
        r.ue()
        r.u(1)
    r.u(5)
    r.u(5)
    r.u(5)
    r.u(5)


def build_sps(
    profile_idc: int = 66,
    level_idc: int = 30,
    sps_id: int = 0,
    width_mbs: int = 40,
    height_map_units: int = 30,
    frame_mbs_only: int = 1,
    crop: tuple = (0, 0, 0, 0),
    chroma_format_idc: int = 1,
    bit_depth_luma: int = 8,
    bit_depth_chroma: int = 8,
    scaling_lists: list | None = None,
    log2_max_frame_num: int = 4,
    pic_order_cnt_type: int = 0,
    max_num_ref_frames: int = 1,
    fps_timing: tuple | None = None,
) -> bytes:
    """Encode an SPS NAL (header + EBSP). Inverse of ``parse_sps`` for
    every exposed knob — the roundtrip is bit-semantics-exact (the
    reparse returns the same values)."""
    w = BitWriter()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(sps_id)
    if profile_idc in HIGH_PROFILE_IDCS:
        w.ue(chroma_format_idc)
        if chroma_format_idc == 3:
            w.u(0, 1)
        w.ue(bit_depth_luma - 8)
        w.ue(bit_depth_chroma - 8)
        w.u(0, 1)  # qpprime bypass
        if scaling_lists is None:
            w.u(0, 1)
        else:
            w.u(1, 1)
            n = 8 if chroma_format_idc != 3 else 12
            assert len(scaling_lists) == n
            for i, sl in enumerate(scaling_lists):
                if sl is None:
                    w.u(0, 1)
                else:
                    assert len(sl) == (16 if i < 6 else 64)
                    w.u(1, 1)
                    _write_scaling_list(w, sl)
    w.ue(log2_max_frame_num - 4)
    w.ue(pic_order_cnt_type)
    if pic_order_cnt_type == 0:
        w.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        w.u(0, 1)
        w.se(0)
        w.se(0)
        w.ue(0)
    w.ue(max_num_ref_frames)
    w.u(0, 1)  # gaps_in_frame_num
    w.ue(width_mbs - 1)
    w.ue(height_map_units - 1)
    w.u(frame_mbs_only, 1)
    if not frame_mbs_only:
        w.u(0, 1)  # mb_adaptive_frame_field
    w.u(1, 1)  # direct_8x8_inference
    if any(crop):
        w.u(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.u(0, 1)
    if fps_timing is None:
        w.u(0, 1)  # no VUI
    else:
        num_units, time_scale = fps_timing
        w.u(1, 1)  # vui present
        w.u(0, 1)  # aspect ratio
        w.u(0, 1)  # overscan
        w.u(0, 1)  # video signal
        w.u(0, 1)  # chroma loc
        w.u(1, 1)  # timing info
        w.u(num_units, 32)
        w.u(time_scale, 32)
        w.u(1, 1)  # fixed_frame_rate
        w.u(0, 1)  # nal hrd
        w.u(0, 1)  # vcl hrd
        w.u(0, 1)  # pic_struct
        w.u(0, 1)  # bitstream restriction
    return bytes([0x67]) + rbsp_to_ebsp(w.rbsp_trailing())


def parse_pps(nal: bytes) -> dict:
    """§7.3.2.2 picture parameter set (FMO maps raise)."""
    if not nal or nal[0] & 0x1F != 8:
        raise ValueError("not a PPS NAL")
    r = BitReader(ebsp_to_rbsp(nal[1:]))
    p: dict = {}
    p["pic_parameter_set_id"] = r.ue()
    p["seq_parameter_set_id"] = r.ue()
    p["entropy_coding_mode"] = "cabac" if r.u(1) else "cavlc"
    p["bottom_field_pic_order_in_frame_present_flag"] = r.u(1)
    num_slice_groups = r.ue() + 1
    if num_slice_groups > 1:
        raise NotImplementedError(
            f"FMO slice groups ({num_slice_groups}) not supported"
        )
    p["num_ref_idx_l0"] = r.ue() + 1
    p["num_ref_idx_l1"] = r.ue() + 1
    p["weighted_pred_flag"] = r.u(1)
    p["weighted_bipred_idc"] = r.u(2)
    p["pic_init_qp"] = 26 + r.se()
    p["pic_init_qs"] = 26 + r.se()
    p["chroma_qp_index_offset"] = r.se()
    p["deblocking_filter_control_present_flag"] = r.u(1)
    p["constrained_intra_pred_flag"] = r.u(1)
    p["redundant_pic_cnt_present_flag"] = r.u(1)
    p["transform_8x8_mode_flag"] = 0
    p["second_chroma_qp_index_offset"] = p["chroma_qp_index_offset"]
    if r.more_rbsp_data():
        p["transform_8x8_mode_flag"] = r.u(1)
        if r.u(1):  # pic_scaling_matrix_present
            n = 6 + (2 if p["transform_8x8_mode_flag"] else 0)
            for i in range(n):
                if r.u(1):
                    _scaling_list(r, 16 if i < 6 else 64)
        p["second_chroma_qp_index_offset"] = r.se()
    return p


def build_pps(
    pps_id: int = 0,
    sps_id: int = 0,
    cabac: bool = True,
    num_ref_idx_l0: int = 1,
    pic_init_qp: int = 26,
    transform_8x8: bool = False,
) -> bytes:
    w = BitWriter()
    w.ue(pps_id)
    w.ue(sps_id)
    w.u(1 if cabac else 0, 1)
    w.u(0, 1)
    w.ue(0)  # one slice group
    w.ue(num_ref_idx_l0 - 1)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 2)
    w.se(pic_init_qp - 26)
    w.se(0)
    w.se(0)
    w.u(1, 1)
    w.u(0, 1)
    w.u(0, 1)
    if transform_8x8:
        w.u(1, 1)
        w.u(0, 1)  # no pic scaling matrix
        w.se(0)
    return bytes([0x68]) + rbsp_to_ebsp(w.rbsp_trailing())


def build_avcc(
    sps_list: list, pps_list: list, nal_length_size: int = 4
) -> bytes:
    """ISO 14496-15 §5.2.4.1.1 AVCDecoderConfigurationRecord."""
    if not sps_list:
        raise ValueError("avcC needs at least one SPS")
    prof = parse_sps(sps_list[0])
    out = bytearray()
    out += bytes(
        [
            1,
            prof["profile_idc"],
            prof["constraint_flags"],
            prof["level_idc"],
            0xFC | (nal_length_size - 1),
            0xE0 | len(sps_list),
        ]
    )
    for sps in sps_list:
        out += struct.pack(">H", len(sps)) + sps
    out.append(len(pps_list))
    for pps in pps_list:
        out += struct.pack(">H", len(pps)) + pps
    if prof["profile_idc"] in (100, 110, 122, 144):
        out += bytes(
            [
                0xFC | prof["chroma_format_idc"],
                0xF8 | (prof["bit_depth_luma"] - 8),
                0xF8 | (prof["bit_depth_chroma"] - 8),
                0,  # numOfSequenceParameterSetExt
            ]
        )
    return bytes(out)


def parse_avcc(data: bytes) -> dict:
    if len(data) < 7 or data[0] != 1:
        raise ValueError("not an AVCDecoderConfigurationRecord")
    nal_length_size = (data[4] & 3) + 1
    n_sps = data[5] & 0x1F
    pos = 6
    sps_list = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", data, pos)
        pos += 2
        sps_list.append(data[pos : pos + ln])
        if len(sps_list[-1]) != ln:
            raise ValueError("avcC truncated in SPS")
        pos += ln
    n_pps = data[pos]
    pos += 1
    pps_list = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", data, pos)
        pos += 2
        pps_list.append(data[pos : pos + ln])
        if len(pps_list[-1]) != ln:
            raise ValueError("avcC truncated in PPS")
        pos += ln
    return {
        "configuration_version": 1,
        "profile_idc": data[1],
        "level_idc": data[3],
        "nal_length_size": nal_length_size,
        "sps": sps_list,
        "pps": pps_list,
    }
