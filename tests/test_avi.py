"""RIFF/AVI ingest: the reference's producer publishes .avi inputs
(ref cmd/producer.go:485-488), so a watched .avi must transcode rather
than fail at the consumer (round-3 VERDICT item 6). The AVI under test
is written by the system libavformat — a genuine foreign muxer."""

import numpy as np
import pytest

from vcp_tpu.codec import ingest
from vcp_tpu.utils.fs import is_video_file
from video_util import synth_video

O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    if O.get_oracle() is None:
        pytest.skip("system libavcodec unavailable")
    return O


def test_avi_is_published_and_ingestible():
    # the producer filter and the consumer ingest must agree on .avi
    assert is_video_file("clip.avi")


def test_avi_demux_headers(oracle, tmp_path):
    frames = synth_video(128, 96, 6)
    es = oracle.encode_video("libx264", frames, preset="veryfast", crf=30,
                             gop=6, fps=25)
    avi = oracle.mux_avi(es, 128, 96, fps=25)
    p = tmp_path / "in.avi"
    p.write_bytes(avi)

    from vcp_tpu.codec.avi import AviDemuxer
    d = AviDemuxer(str(p))
    assert d.video is not None
    assert (d.video.width, d.video.height) == (128, 96)
    assert d.video.rate // d.video.scale == 25
    assert len(d.video.chunks) == 6


def test_avi_ingest_bit_exact(oracle, tmp_path):
    """open_video() on a libavformat-written AVI reproduces libavcodec's
    own reconstruction exactly (H.264 Annex-B chunks, incl. B-frames)."""
    frames = synth_video(128, 96, 8)
    es = oracle.encode_video("libx264", frames, preset="veryfast", crf=28,
                             gop=8)
    avi = oracle.mux_avi(es, 128, 96, fps=30)
    p = tmp_path / "in.avi"
    p.write_bytes(avi)

    vid = ingest.open_video(str(p))
    ours = list(vid.frames)
    theirs = oracle.decode_video("h264", es)
    assert len(ours) == len(theirs) == 8
    for i, ((ty, tu, tv), (y, u, v)) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(ty, np.asarray(y, np.uint8),
                                      err_msg=f"avi luma frame {i}")
        np.testing.assert_array_equal(tu, np.asarray(u, np.uint8))
        np.testing.assert_array_equal(tv, np.asarray(v, np.uint8))


def test_avi_bad_fourcc_fails_precisely(tmp_path):
    import struct

    def chunk(ckid, payload):
        pad = b"\0" if len(payload) & 1 else b""
        return ckid + struct.pack("<I", len(payload)) + payload + pad

    strh = (b"vids" + b"MJPG" + b"\0" * 12 + struct.pack("<IIII", 1, 30, 0, 1)
            + b"\0" * 16)
    strf = struct.pack("<iiiHH4s", 40, 64, 48, 1, 24, b"MJPG") + b"\0" * 20
    strl = b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)
    hdrl = b"hdrl" + chunk(b"avih", b"\0" * 56) + chunk(b"LIST", strl)
    movi = b"movi" + chunk(b"00dc", b"\xff\xd8\xff")
    body = b"AVI " + chunk(b"LIST", hdrl) + chunk(b"LIST", movi)
    p = tmp_path / "mjpeg.avi"
    p.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)

    with pytest.raises(ingest.IngestError, match="fourcc"):
        ingest.open_video(str(p))
