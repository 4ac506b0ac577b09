"""HEVC parameter-set writers: structural parse-back with the in-repo
BitReader (dimensions, profile/level, flags land where the spec says)."""

from vcp_tpu.codec.h265.headers import (HevcParams, write_pps, write_sps,
                                        write_vps, write_slice_header,
                                        NAL_IDR_W_RADL, hevc_nal)
from vcp_tpu.utils.bitstream import BitReader, BitWriter, emulation_remove


def _rbsp(nal: bytes) -> bytes:
    assert nal[:4] == b"\x00\x00\x00\x01"
    return emulation_remove(nal[6:])        # strip start code + 2B header


def _skip_ptl(br: BitReader) -> int:
    br.u(2); br.u(1)
    profile_idc = br.u(5)
    br.u(32)                                 # compatibility flags
    br.u(1); br.u(1); br.u(1); br.u(1)       # source/constraint flags
    br.u(32); br.u(12)                       # reserved 44 bits
    level = br.u(8)
    return profile_idc, level


def test_nal_headers():
    p = HevcParams(width=64, height=64)
    assert write_vps(p)[4:6] == bytes([0x40, 0x01])
    assert write_sps(p)[4:6] == bytes([0x42, 0x01])
    assert write_pps(p)[4:6] == bytes([0x44, 0x01])


def test_sps_roundtrip_dimensions_and_profile():
    p = HevcParams(width=1920, height=1080, qp=32, level_idc=123,
                   conf_win_bottom=8)
    br = BitReader(_rbsp(write_sps(p)))
    assert br.u(4) == 0                      # sps_video_parameter_set_id
    assert br.u(3) == 0                      # sps_max_sub_layers_minus1
    assert br.u(1) == 1                      # temporal_id_nesting
    profile, level = _skip_ptl(br)
    assert profile == 1 and level == 123     # Main, level 4.1
    assert br.ue() == 0                      # sps id
    assert br.ue() == 1                      # chroma 4:2:0
    assert br.ue() == 1920
    assert br.ue() == 1080
    assert br.u(1) == 1                      # conformance_window_flag
    assert br.ue() == 0 and br.ue() == 0     # left, right
    assert br.ue() == 0 and br.ue() == 4     # top, bottom (chroma units)
    assert br.ue() == 0 and br.ue() == 0     # bit depths


def test_vps_profile_level():
    p = HevcParams(width=640, height=480, level_idc=93)
    br = BitReader(_rbsp(write_vps(p)))
    assert br.u(4) == 0
    assert br.u(1) == 1 and br.u(1) == 1
    assert br.u(6) == 0 and br.u(3) == 0 and br.u(1) == 1
    assert br.u(16) == 0xFFFF
    profile, level = _skip_ptl(br)
    assert profile == 1 and level == 93


def test_pps_qp():
    p = HevcParams(width=64, height=64, qp=37)
    br = BitReader(_rbsp(write_pps(p)))
    assert br.ue() == 0 and br.ue() == 0
    br.u(1); br.u(1); br.u(3); br.u(1); br.u(1)
    assert br.ue() == 0 and br.ue() == 0     # ref idx defaults
    assert br.se() == 11                     # init_qp_minus26 = 37-26


def test_idr_slice_header_alignment():
    p = HevcParams(width=128, height=128, qp=30)
    bw = BitWriter()
    write_slice_header(bw, p, is_idr=True)
    payload = bw.to_bytes()                  # raises if not byte-aligned
    nal = hevc_nal(NAL_IDR_W_RADL, payload)
    assert nal[4] == (NAL_IDR_W_RADL << 1)
    br = BitReader(emulation_remove(nal[6:]))
    assert br.u(1) == 1                      # first_slice_segment_in_pic
    assert br.u(1) == 0                      # no_output_of_prior_pics
    assert br.ue() == 0                      # pps id
    assert br.ue() == 2                      # slice_type I
    assert br.se() == 0                      # slice_qp_delta
    assert br.u(1) == 1                      # alignment bit
