"""Conformance against the system libavcodec reference decoders.

The framework's validation decoders prove encode/decode *consistency*;
these tests prove *spec conformance*: streams from our H.264/H.265
encoders must decode in ffmpeg's independent implementations to exactly
the reconstruction our own closed loop predicts (deblocking, CABAC,
quarter-pel MC and all). Skipped when the system libraries are absent.
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video

O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    lib = O.get_oracle()
    if lib is None:
        pytest.skip("system libavcodec unavailable")
    return lib


def _h264_stream(w=80, h=64, n=5, qp=27, cabac=False, deblock=False,
                 effort=4, gop=5):
    frames = synth_video(w, h, n)
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop_size=gop,
                                    cabac=cabac, deblock=deblock,
                                    effort=effort))
    aus = [au for au, _ in enc.encode_gop(frames)]
    data = enc.headers_annexb() + b"".join(aus)
    from vcp_tpu.codec.h264.decoder import H264Decoder
    ours = H264Decoder().decode_annexb(data)
    return data, ours


@pytest.mark.parametrize("cabac", [False, True])
@pytest.mark.parametrize("deblock", [False, True])
def test_h264_ffmpeg_decodes_to_our_recon(oracle, cabac, deblock):
    """CAVLC+CABAC, deblock on/off: ffmpeg's h264 decoder must produce
    exactly our closed-loop reconstruction for every frame."""
    data, ours = _h264_stream(cabac=cabac, deblock=deblock)
    theirs = O.decode_video("h264", data)
    assert len(theirs) == len(ours)
    for i, ((ty, tu, tv), f) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(
            ty, np.asarray(f.y, np.uint8),
            err_msg=f"luma frame {i} cabac={cabac} deblock={deblock}")
        np.testing.assert_array_equal(tu, np.asarray(f.u, np.uint8))
        np.testing.assert_array_equal(tv, np.asarray(f.v, np.uint8))


def test_h264_highmotion_subpel_conformance(oracle):
    """Quarter-pel MVs + skip runs at high effort: the MC interpolation
    and mv prediction chain must be spec-exact."""
    data, ours = _h264_stream(w=96, h=80, n=6, qp=30, cabac=True,
                              deblock=True, effort=6, gop=6)
    theirs = O.decode_video("h264", data)
    assert len(theirs) == len(ours)
    for i, ((ty, tu, tv), f) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(ty, np.asarray(f.y, np.uint8),
                                      err_msg=f"frame {i}")
        np.testing.assert_array_equal(tu, np.asarray(f.u, np.uint8))
        np.testing.assert_array_equal(tv, np.asarray(f.v, np.uint8))


@pytest.mark.parametrize("w,h,qp,n", [(64, 64, 30, 3), (96, 64, 27, 5),
                                      (64, 96, 35, 4)])
def test_h265_ffmpeg_decodes_to_our_recon(oracle, w, h, qp, n):
    """Our HEVC encoder's stream must decode identically in ffmpeg's
    hevc decoder (I + P frames, conformance-window crops, several QPs)."""
    from vcp_tpu.codec.h265.encoder import HevcEncoder, HevcEncoderConfig
    from vcp_tpu.codec.h265.decoder import decode_annexb

    frames = synth_video(w, h, n)
    enc = HevcEncoder(HevcEncoderConfig(width=w, height=h, qp=qp,
                                        gop_size=n))
    aus = [enc.encode_frame(*f)[0] for f in frames]
    data = enc.headers_annexb() + b"".join(aus)
    ours = list(decode_annexb(data))
    theirs = O.decode_video("hevc", data)
    assert len(theirs) == len(ours)
    for i, ((ty, tu, tv), f) in enumerate(zip(theirs, ours)):
        oy, ou, ov = (np.asarray(p, np.uint8) for p in f)
        np.testing.assert_array_equal(ty, oy, err_msg=f"hevc luma {i}")
        np.testing.assert_array_equal(tu, ou)
        np.testing.assert_array_equal(tv, ov)
