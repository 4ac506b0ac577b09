"""I_NxN/i8x8 intra (encoder): RD wavefront, CABAC syntax, intra-in-P.

x264 medium codes gradient content almost entirely as i8 (99.6%% of its
gradmotion I-frame MBs, 65%% of its P MBs — measured on the committed
golden streams, round 5); these tests pin the encoder-side i8 family:
the slope-2 wavefront (intra_rd.encode_iframe_rd8), the I_NxN CABAC
writer, and the intra overlay inside P pictures, each against the
in-repo decoder and (when present) the ffmpeg oracle.
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video


def _grad_frames(n):
    import rdbench
    return rdbench.load_clip("gradmotion_320x192")[:n]


def _enc(frames, qp, **kw):
    h, w = frames[0][0].shape
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop_size=len(frames), cabac=True,
                                    deblock=True, **kw))
    out = enc.encode_gop(frames)
    return enc, enc.headers_annexb() + b"".join(s[0] for s in out)


@pytest.mark.parametrize("qp", [20, 30, 42])
def test_i8_iframe_selfdecode_bit_exact(qp):
    frames = _grad_frames(1)
    enc, data = _enc(frames, qp, effort=6, transform8=True)
    dec = H264Decoder()
    dec.collect_stats = True
    got = dec.decode_annexb(data)
    ry, ru, rv = enc.recon_planes
    np.testing.assert_array_equal(got[0].y, np.asarray(ry))
    np.testing.assert_array_equal(got[0].u, np.asarray(ru))
    np.testing.assert_array_equal(got[0].v, np.asarray(rv))
    # on gradients the RD choice must lean i8 (x264: 99.6% at crf26;
    # at very high QP I16 becomes competitive — measured 49.6% at qp42)
    if qp <= 30:
        assert dec.mb_stats[0]["t8_frac"] > 0.5


def test_i8_wins_bits_vs_i16_on_gradients():
    """The point of the feature: i8 must beat the I16-only RD path on
    gradient content by a wide margin."""
    frames = _grad_frames(1)
    _, data8 = _enc(frames, 26, effort=6, transform8=True)
    _, data16 = _enc(frames, 26, effort=6, transform8=False)
    assert len(data8) < 0.75 * len(data16), (len(data8), len(data16))


def test_intra_in_p_engages_and_selfdecodes():
    # bframes=2: the B-GOP path is where the per-frame parts/intra
    # anchor coder lives (the bframes=0 chunked path is the speed shape)
    frames = _grad_frames(8)
    enc, data = _enc(frames, 26, effort=6, transform8=True, parts=True,
                     bframes=2)
    dec = H264Decoder()
    dec.collect_stats = True
    got = dec.decode_annexb(data)
    assert len(got) == 8
    ps = [psnr(got[i].y, frames[i][0]) for i in range(8)]
    assert min(ps) > 35
    pstats = [s for s in dec.mb_stats if s["type"] == "P"]
    # gradient P frames must carry substantial intra (x264 medium: 65%)
    assert np.mean([s["intra_frac"] for s in pstats]) > 0.3


O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    lib = O.get_oracle()
    if lib is None:
        pytest.skip("system libavcodec unavailable")
    return lib


@pytest.mark.parametrize("qp", [22, 34])
def test_i8_iframe_ffmpeg_conformance(oracle, qp):
    frames = _grad_frames(1)
    enc, data = _enc(frames, qp, effort=6, transform8=True)
    ff = O.decode_video("h264", data, max_frames=4)
    ry, ru, rv = enc.recon_planes
    for a, b in zip((ry, ru, rv), ff[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("qp", [26, 36])
def test_intra_in_p_quality_shape_ffmpeg_conformance(oracle, qp):
    """The full shipping quality shape (t8 + parts + B + intra-in-P)
    must stay bit-exact against ffmpeg."""
    frames = _grad_frames(10)
    _, data = _enc(frames, qp, effort=6, transform8=True, parts=True,
                   bframes=2)
    ours = H264Decoder().decode_annexb(data)
    ff = O.decode_video("h264", data, max_frames=32)
    assert len(ff) == 10
    for i in range(10):
        for a, b in zip((ours[i].y, ours[i].u, ours[i].v), ff[i]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_intra_in_p_synth_ffmpeg_conformance(oracle):
    """Non-gradient content: overlay rarely fires, stream stays valid."""
    frames = synth_video(96, 64, 8)
    _, data = _enc(frames, 28, effort=6, transform8=True, parts=True,
                   bframes=2)
    ours = H264Decoder().decode_annexb(data)
    ff = O.decode_video("h264", data, max_frames=32)
    assert len(ff) == 8
    for i in range(8):
        for a, b in zip((ours[i].y, ours[i].u, ours[i].v), ff[i]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
