"""Foreign High-profile INTRA decode: real libx264-medium streams
(CABAC, I_NxN with 4x4 and 8x8 intra prediction, per-MB mb_qp_delta
from adaptive quant, I16 incl. Plane, in-loop deblock) must decode
bit-exactly against the system-ffmpeg oracle. First slice of VERDICT
item 2 (ref cmd/consumer.go:376-380: the reference ingests anything
ffmpeg reads)."""

import numpy as np
import pytest

import av_oracle as O
from video_util import synth_video

from vcp_tpu.codec.h264.decoder import H264Decoder


def _oracle_or_skip():
    if O.get_oracle() is None:
        pytest.skip("libavcodec oracle unavailable")


def _split_nals(data: bytes):
    nals, i = [], 0
    while True:
        j = data.find(b"\x00\x00\x01", i)
        if j < 0:
            return nals
        k = data.find(b"\x00\x00\x01", j + 3)
        nals.append(data[j + 3:k if k > 0 else len(data)])
        if k < 0:
            return nals
        i = k


@pytest.mark.parametrize("crf", [14, 23, 35, 45])
def test_x264_medium_allintra_bit_exact(crf):
    _oracle_or_skip()
    frames = synth_video(160, 96, 3)
    bs = O.encode_video("libx264", frames, preset="medium", crf=crf, gop=1)
    theirs = O.decode_video("h264", bs)
    ours = H264Decoder().decode_annexb(bs)
    assert len(ours) == len(theirs) == 3
    for i, (o, t) in enumerate(zip(ours, theirs)):
        np.testing.assert_array_equal(np.asarray(o.y), t[0], f"y {i}")
        np.testing.assert_array_equal(np.asarray(o.u), t[1], f"u {i}")
        np.testing.assert_array_equal(np.asarray(o.v), t[2], f"v {i}")


def test_golden_stream_idr_bit_exact():
    """The committed libx264-medium golden stream's IDR picture (the
    exact encoder configuration the reference's h264-cpu preset runs)."""
    _oracle_or_skip()
    data = open("tests/golden/gradmotion_320x192_x264_crf26.264",
                "rb").read()
    nals = _split_nals(data)
    types = [(n[0] & 0x1F) for n in nals]
    keep = [n for n, t in zip(nals, types) if t in (7, 8)] \
        + [n for n, t in zip(nals, types) if t == 5][:1]
    theirs = O.decode_video("h264", data)
    ours = H264Decoder().decode_nals(keep)
    np.testing.assert_array_equal(np.asarray(ours[0].y), theirs[0][0])
    np.testing.assert_array_equal(np.asarray(ours[0].u), theirs[0][1])
    np.testing.assert_array_equal(np.asarray(ours[0].v), theirs[0][2])
