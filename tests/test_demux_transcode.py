"""MP4 demux + mp4→mp4 self-transcode tests."""

import os

import numpy as np
import pytest

from vcp_tpu.codec import mp4 as m
from vcp_tpu.codec.args import parse_encode_args
from vcp_tpu.codec.h264.decoder import psnr
from vcp_tpu.codec.h264.encoder import encode_file, EncoderConfig, \
    H264Encoder, encode_stream, mux_mp4
from vcp_tpu.codec.ingest import IngestError, open_video

from video_util import synth_video


@pytest.fixture(scope="module")
def sample_mp4(tmp_path_factory):
    d = tmp_path_factory.mktemp("demux")
    path = str(d / "src.mp4")
    frames = synth_video(64, 48, 6)
    cfg = EncoderConfig(width=64, height=48, qp=24, gop_size=3, effort=2)
    sps, pps, samples = encode_stream(iter(frames), cfg)
    mux_mp4(path, sps, pps, samples, 64, 48, 30, 1)
    return path, frames


def test_demuxer_tables(sample_mp4):
    path, frames = sample_mp4
    demux = m.Mp4Demuxer(path)
    t = demux.video
    assert t is not None and t.codec == "avc1"
    assert t.sample_count == 6
    assert (t.width, t.height) == (64, 48)
    assert t.sps and t.pps and t.nal_length_size == 4
    assert t.sync_samples == {0, 3}           # two GOPs of 3
    assert len(t.sample_offsets) == 6
    assert all(d == 1000 for d in t.sample_durations)
    # sizes sum to mdat payload coverage; every sample parses into NALs
    for i in range(6):
        nals = demux.sample_nals(t, i)
        assert nals and all(len(n) > 0 for n in nals)
        assert (nals[0][0] & 0x1F) in (1, 5)


def test_open_video_mp4_decodes(sample_mp4):
    path, frames = sample_mp4
    vid = open_video(path)
    assert (vid.width, vid.height) == (64, 48)
    assert vid.num_frames == 6
    decoded = list(vid.frames)
    assert len(decoded) == 6
    for i, (y, u, v) in enumerate(decoded):
        assert psnr(y, frames[i][0]) > 35


def test_mp4_to_mp4_transcode(sample_mp4, tmp_path):
    path, frames = sample_mp4
    out = str(tmp_path / "re.mp4")
    size = encode_file(path, out, parse_encode_args("-c:v libx264 -crf 34"))
    assert size > 0
    r = m.probe(out)
    assert r.valid and r.has_video and r.video.sample_count == 6
    # re-encoded at higher QP: must be smaller than the source
    assert size < os.path.getsize(path)


def test_unsupported_inputs_fail_cleanly(tmp_path):
    bad = tmp_path / "a.mkv"
    bad.write_bytes(b"xx")
    with pytest.raises(IngestError):
        open_video(str(bad))
