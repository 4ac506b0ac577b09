"""Closed-loop H.264 intra tests: encode → decode → exact recon match."""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
from vcp_tpu.codec.mp4 import split_annexb

from video_util import synth_frame


def encode_one(w, h, qp, t=0):
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop_size=1))
    y, u, v = synth_frame(w, h, t)
    au, is_idr = enc.encode_frame(y, u, v)
    assert is_idr
    return enc, (y, u, v), au


@pytest.mark.parametrize("qp", [18, 28, 38])
def test_intra_encode_decode_exact_recon(qp):
    w, h = 64, 48
    enc, (y, u, v), au = encode_one(w, h, qp)
    dec = H264Decoder()
    frames = dec.decode_annexb(enc.headers_annexb() + au)
    assert len(frames) == 1
    f = frames[0]
    assert f.is_idr
    ry, ru, rv = enc.recon_planes
    # decoder recon MUST match encoder recon bit-for-bit
    np.testing.assert_array_equal(f.y, np.asarray(ry))
    np.testing.assert_array_equal(f.u, np.asarray(ru))
    np.testing.assert_array_equal(f.v, np.asarray(rv))


def test_intra_quality_scales_with_qp():
    w, h = 64, 48
    psnrs = {}
    for qp in (18, 30, 42):
        enc, (y, u, v), au = encode_one(w, h, qp)
        dec = H264Decoder()
        f = dec.decode_annexb(enc.headers_annexb() + au)[0]
        psnrs[qp] = psnr(f.y, y)
    assert psnrs[18] > psnrs[30] > psnrs[42]
    assert psnrs[18] > 40, psnrs
    assert psnrs[30] > 30, psnrs


def test_intra_rate_scales_with_qp():
    sizes = {}
    for qp in (18, 30, 42):
        _, _, au = encode_one(64, 48, qp)
        sizes[qp] = len(au)
    assert sizes[18] > sizes[30] > sizes[42]


def test_dc_row0_closed_loop_and_quality():
    """MB row 0 is I16x16-DC (top unavailable; left-column fallback per
    spec 8.3.3.3 / 8.3.4.2). The independent decoder must reproduce the
    encoder recon exactly, including the sequential left-DC chain."""
    w, h = 64, 48
    enc, (y, u, v), au = encode_one(w, h, qp=28)
    dec = H264Decoder()
    f = dec.decode_annexb(enc.headers_annexb() + au)[0]
    ry, ru, rv = (np.asarray(p) for p in enc.recon_planes)
    np.testing.assert_array_equal(f.y, ry)
    np.testing.assert_array_equal(f.u, ru)
    np.testing.assert_array_equal(f.v, rv)
    # row 0 is coded (lossy) but must still be decent at qp 28
    assert psnr(f.y[:16], y[:16]) > 30


def test_non_multiple_of_16_dimensions():
    w, h = 50, 38   # pads to 64x48, crops back
    enc, (y, u, v), au = encode_one(w, h, qp=24)
    dec = H264Decoder()
    f = dec.decode_annexb(enc.headers_annexb() + au)[0]
    assert f.y.shape == (38, 50)
    ry, _, _ = enc.recon_planes
    np.testing.assert_array_equal(f.y, np.asarray(ry))
    assert psnr(f.y, y) > 33


def test_sps_pps_parse_roundtrip():
    from vcp_tpu.codec.h264 import headers as H
    from vcp_tpu.utils.bitstream import emulation_remove
    sp = H.SeqParams(width=1920, height=1080)
    pp = H.PicParams(init_qp=30)
    sps_nal = H.write_sps(sp)
    pps_nal = H.write_pps(pp)
    sp2 = H.parse_sps(emulation_remove(sps_nal[5:]))
    assert (sp2.width, sp2.height) == (1920, 1080)
    assert sp2.log2_max_frame_num == sp.log2_max_frame_num
    pp2 = H.parse_pps(emulation_remove(pps_nal[5:]))
    assert pp2.init_qp == 30
    assert pp2.deblocking_filter_control_present


def test_annexb_nal_structure():
    enc, _, au = encode_one(32, 32, qp=30)
    hdr = enc.headers_annexb()
    nals = split_annexb(hdr + au)
    types = [n[0] & 0x1F for n in nals]
    assert types == [7, 8, 5]  # SPS, PPS, IDR
    # no emulation patterns survive in any NAL payload
    for n in nals:
        assert b"\x00\x00\x00" not in n
        assert b"\x00\x00\x01" not in n
        assert b"\x00\x00\x02" not in n
