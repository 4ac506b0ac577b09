"""End-to-end tests for the High-profile adaptive 8x8 transform
(EncoderConfig.transform8): closed-loop bit-exactness of the in-repo
decoder vs the encoder's device reconstruction, for both entropy modes,
plus High SPS/PPS round-trips. Oracle conformance (ffmpeg decodes the
same streams bit-exactly) lives in test_conformance-style checks at the
bottom, gated on the oracle being buildable.
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264 import headers as H
from vcp_tpu.codec.h264.decoder import H264Decoder
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video


def _roundtrip(cabac: bool, n=6, w=96, h=64, qp=26):
    frames = synth_video(w, h, n)
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop_size=n,
                                    cabac=cabac, deblock=True, effort=4,
                                    transform8=True))
    out = enc.encode_gop(frames)
    bs = enc.headers_annexb() + b"".join(s[0] for s in out)
    dec = H264Decoder().decode_annexb(bs)
    assert len(dec) == n
    ry, ru, rv = enc.recon_planes
    np.testing.assert_array_equal(np.asarray(dec[-1].y), ry)
    np.testing.assert_array_equal(np.asarray(dec[-1].u), ru)
    np.testing.assert_array_equal(np.asarray(dec[-1].v), rv)
    return bs, enc


def test_high_profile_headers_roundtrip():
    sp = H.SeqParams(width=100, height=60, profile_idc=100)
    pp = H.PicParams(cabac=True, transform_8x8=True)
    sp2 = H.parse_sps(H.write_sps(sp)[5:])
    assert (sp2.width, sp2.height, sp2.profile_idc) == (100, 60, 100)
    pp2 = H.parse_pps(H.write_pps(pp)[5:])
    assert pp2.cabac and pp2.transform_8x8


def test_t8_closed_loop_cavlc():
    bs, enc = _roundtrip(cabac=False)
    assert enc.sp.profile_idc == 100


def test_t8_closed_loop_cabac():
    _roundtrip(cabac=True)


def test_t8_actually_selects_8x8_somewhere():
    # smooth-gradient content at moderate QP should pick the 8x8
    # transform for at least some macroblocks (else the path is dead)
    from vcp_tpu.codec.h264 import pframe
    from vcp_tpu.ops.transform import chroma_qp
    rng = np.random.default_rng(0)
    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    y0 = ((xx * 2 + yy) % 256).astype(np.uint8)
    y1 = np.roll(y0, 3, axis=1)
    u = np.full((h // 2, w // 2), 120, np.uint8)
    out = pframe.encode_pframe(
        y1.astype(np.int32), u.astype(np.int32), u.astype(np.int32),
        y0.astype(np.int32), u.astype(np.int32), u.astype(np.int32),
        28, chroma_qp(28), search_range=8, deblock=False, subpel=0,
        t8=True)
    assert bool(np.asarray(out["t8"]).any())


@pytest.mark.parametrize("cabac", [False, True])
def test_t8_oracle_conformance(cabac):
    """ffmpeg's independent H.264 decoder must reproduce our recon
    bit-exactly on High-profile 8x8 streams."""
    import av_oracle
    if av_oracle.get_oracle() is None:
        pytest.skip("libavcodec oracle unavailable")
    bs, enc = _roundtrip(cabac=cabac, n=5, w=96, h=64, qp=24)
    frames = av_oracle.decode_video("h264", bs)
    assert len(frames) == 5
    ry, ru, rv = enc.recon_planes
    np.testing.assert_array_equal(frames[-1][0], ry)
    np.testing.assert_array_equal(frames[-1][1], ru)
    np.testing.assert_array_equal(frames[-1][2], rv)


def test_t8_with_bframes_oracle_conformance():
    """The quality-preset default shape — CABAC + adaptive 8x8 + B
    pictures under a High PPS (transform_size_8x8_flag coded in P AND B
    slices) — must decode bit-exactly in ffmpeg."""
    import av_oracle
    if av_oracle.get_oracle() is None:
        pytest.skip("libavcodec oracle unavailable")
    frames = synth_video(96, 64, 7)
    enc = H264Encoder(EncoderConfig(width=96, height=64, qp=26,
                                    gop_size=7, cabac=True, deblock=True,
                                    effort=4, transform8=True, bframes=2))
    out = enc.encode_gop(frames)
    bs = enc.headers_annexb() + b"".join(s[0] for s in out)
    theirs = av_oracle.decode_video("h264", bs)
    ours = H264Decoder().decode_annexb(bs)
    assert len(theirs) == len(ours) == 7
    for o, t in zip(ours, theirs):
        np.testing.assert_array_equal(np.asarray(o.y), t[0])
        np.testing.assert_array_equal(np.asarray(o.u), t[1])
        np.testing.assert_array_equal(np.asarray(o.v), t[2])
