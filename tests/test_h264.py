"""H.264 parameter-set codec tests (multimodal/h264.py): exp-Golomb,
emulation prevention, SPS/PPS roundtrips across the profile grid,
crop-unit arithmetic, VUI timing, avcC config records, MP4 embedding."""

from __future__ import annotations

import pytest

from etl_everywhere_hub_spark.multimodal.h264 import (
    BitReader,
    BitWriter,
    build_avcc,
    build_pps,
    build_sps,
    ebsp_to_rbsp,
    parse_avcc,
    parse_pps,
    parse_sps,
    rbsp_to_ebsp,
)


def test_exp_golomb_roundtrip():
    w = BitWriter()
    vals = [0, 1, 2, 3, 7, 8, 254, 255, 256, 65535]
    for v in vals:
        w.ue(v)
    svals = [0, 1, -1, 2, -2, 127, -128, 4096]
    for v in svals:
        w.se(v)
    data = w.rbsp_trailing()
    r = BitReader(data)
    assert [r.ue() for _ in vals] == vals
    assert [r.se() for _ in svals] == svals


@pytest.mark.parametrize(
    "tail", [b"\x00", b"\x01", b"\x02", b"\x03", b"\x04", b"\xff"]
)
def test_emulation_prevention_roundtrip(tail):
    for prefix in [b"", b"\x00", b"\x00\x00", b"ab\x00\x00", b"\x00\x00\x00\x00"]:
        rbsp = prefix + tail + b"\x00\x00" + tail
        eb = rbsp_to_ebsp(rbsp)
        assert ebsp_to_rbsp(eb) == rbsp
        # no forbidden 00 00 0x (x <= 2) remains; 00 00 03 IS the escape
        for i in range(len(eb) - 2):
            assert not (eb[i] == 0 and eb[i + 1] == 0 and eb[i + 2] <= 2)


def test_sps_baseline_roundtrip():
    nal = build_sps(
        profile_idc=66, level_idc=31, width_mbs=80, height_map_units=45,
        max_num_ref_frames=3, log2_max_frame_num=8,
    )
    s = parse_sps(nal)
    assert s["profile_idc"] == 66 and s["level_idc"] == 31
    assert s["width"] == 1280 and s["height"] == 720
    assert s["max_num_ref_frames"] == 3
    assert s["log2_max_frame_num"] == 8
    assert s["chroma_format_idc"] == 1 and s["bit_depth_luma"] == 8
    assert s["fps"] is None


def test_sps_crop_arithmetic_420():
    # 1920x1080: 120x68 MBs with 8-line bottom crop (CropUnitY=2 for
    # 4:2:0 frame-coded -> crop_bottom counts in 2-pixel units)
    nal = build_sps(
        profile_idc=100, width_mbs=120, height_map_units=68,
        crop=(0, 0, 0, 4),
    )
    s = parse_sps(nal)
    assert s["width"] == 1920 and s["height"] == 1080


def test_sps_crop_arithmetic_monochrome_and_444():
    # 4:4:4 -> CropUnit 1x1
    nal = build_sps(
        profile_idc=244, chroma_format_idc=3, width_mbs=10,
        height_map_units=10, crop=(3, 2, 5, 1),
    )
    s = parse_sps(nal)
    assert s["width"] == 160 - 5 and s["height"] == 160 - 6
    # 4:2:2 -> CropUnit 2x1
    nal = build_sps(
        profile_idc=122, chroma_format_idc=2, width_mbs=10,
        height_map_units=10, crop=(1, 1, 2, 2),
    )
    s = parse_sps(nal)
    assert s["width"] == 160 - 4 and s["height"] == 160 - 4


def test_sps_interlaced_height_doubles():
    nal = build_sps(width_mbs=45, height_map_units=18, frame_mbs_only=0)
    s = parse_sps(nal)
    assert s["height"] == 2 * 18 * 16 and s["frame_mbs_only_flag"] == 0
    # field coding doubles the bottom-crop unit: CropUnitY = 2*2
    nal = build_sps(
        width_mbs=45, height_map_units=18, frame_mbs_only=0, crop=(0, 0, 0, 1)
    )
    assert parse_sps(nal)["height"] == 2 * 18 * 16 - 4


def test_sps_high_profile_bit_depth_and_scaling():
    lists = [list(range(1, 17))] + [None] * 5 + [list(range(1, 65)), None]
    nal = build_sps(
        profile_idc=110, bit_depth_luma=10, bit_depth_chroma=10,
        scaling_lists=lists, width_mbs=8, height_map_units=8,
    )
    s = parse_sps(nal)
    assert s["bit_depth_luma"] == 10 and s["bit_depth_chroma"] == 10
    assert s["scaling_lists"][0] == list(range(1, 17))
    assert s["scaling_lists"][1] is None
    assert s["scaling_lists"][6] == list(range(1, 65))


def test_sps_vui_fps():
    nal = build_sps(fps_timing=(1001, 60000))  # 29.97 fps
    s = parse_sps(nal)
    assert abs(s["fps"] - 30000 / 1001) < 1e-9
    assert s["num_units_in_tick"] == 1001 and s["time_scale"] == 60000


def test_sps_poc_type1_roundtrip():
    nal = build_sps(pic_order_cnt_type=1)
    s = parse_sps(nal)
    assert s["pic_order_cnt_type"] == 1
    assert s["offsets_for_ref_frame"] == []


def test_sps_rejects_garbage():
    with pytest.raises(ValueError):
        parse_sps(b"")
    with pytest.raises(ValueError):
        parse_sps(b"\x68\x00")  # PPS NAL type
    with pytest.raises(ValueError):
        parse_sps(b"\xe7\x00")  # forbidden bit
    with pytest.raises(ValueError):
        parse_sps(bytes([0x67]))  # truncated


def test_pps_roundtrips():
    p = parse_pps(build_pps(cabac=True, num_ref_idx_l0=4, pic_init_qp=20))
    assert p["entropy_coding_mode"] == "cabac"
    assert p["num_ref_idx_l0"] == 4 and p["pic_init_qp"] == 20
    assert p["transform_8x8_mode_flag"] == 0
    p = parse_pps(build_pps(cabac=False, transform_8x8=True))
    assert p["entropy_coding_mode"] == "cavlc"
    assert p["transform_8x8_mode_flag"] == 1


def test_pps_fmo_raises():
    from etl_everywhere_hub_spark.multimodal.h264 import BitWriter

    w = BitWriter()
    w.ue(0)
    w.ue(0)
    w.u(0, 1)
    w.u(0, 1)
    w.ue(1)  # num_slice_groups_minus1 = 1 -> FMO
    nal = bytes([0x68]) + w.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="FMO"):
        parse_pps(nal)


def test_avcc_roundtrip_and_high_profile_ext():
    sps = build_sps(profile_idc=100, width_mbs=20, height_map_units=15)
    pps = build_pps()
    rec = build_avcc([sps], [pps], nal_length_size=4)
    cfg = parse_avcc(rec)
    assert cfg["profile_idc"] == 100 and cfg["nal_length_size"] == 4
    assert cfg["sps"] == [sps] and cfg["pps"] == [pps]
    s = parse_sps(cfg["sps"][0])
    assert (s["width"], s["height"]) == (320, 240)
    # baseline record carries no extension tail but still roundtrips
    rec2 = build_avcc([build_sps(profile_idc=66)], [pps], nal_length_size=2)
    assert parse_avcc(rec2)["nal_length_size"] == 2
    with pytest.raises(ValueError):
        parse_avcc(rec[:5])
    with pytest.raises(ValueError):
        parse_avcc(b"\x02" + rec[1:])


def test_avcc_travels_through_mp4():
    from etl_everywhere_hub_spark.multimodal.mp4 import build_mp4, demux_mp4

    sps = build_sps(width_mbs=40, height_map_units=30, fps_timing=(1, 50))
    rec = build_avcc([sps], [build_pps()])
    mp4 = build_mp4(
        [
            dict(
                handler="vide", codec="avc1", timescale=90000,
                sample_sizes=[10, 12], stts_runs=[(2, 3000)],
                samples_per_chunk=1, sync=[1], avcc=rec,
            )
        ]
    )
    f = demux_mp4(mp4)
    tr = f.tracks[0]
    assert tr.avcc == rec
    s = parse_sps(parse_avcc(tr.avcc)["sps"][0])
    assert (s["width"], s["height"], s["fps"]) == (640, 480, 25.0)
    # absence stays None
    mp4b = build_mp4(
        [
            dict(
                handler="vide", codec="avc1", timescale=1000,
                sample_sizes=[5], stts_runs=[(1, 100)], samples_per_chunk=1,
            )
        ]
    )
    assert demux_mp4(mp4b).tracks[0].avcc is None


def test_sps_zero_heavy_timing_roundtrips():
    # 32-bit timing fields full of zero bytes stress the emulation
    # escape at whatever bit alignment they land on (the raw escape
    # mechanics are pinned byte-exactly above); sweep several values
    for nu, ts in [(0x100, 0x200000), (1, 0x1000000), (0x10000, 0x2000000)]:
        s = parse_sps(build_sps(fps_timing=(nu, ts)))
        assert s["num_units_in_tick"] == nu and s["time_scale"] == ts
