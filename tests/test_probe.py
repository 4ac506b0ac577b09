"""Publish-time codec probe (codec.probe): unsupported payloads are
rejected at the producer with a precise reason, instead of failing at
the consumer after the move to shared storage (round-4 verdict #6 —
the reference publishes anything and lets ffmpeg fail downstream,
ref cmd/producer.go:485-488; our consumer decodes in-process, so the
support matrix is known up front)."""

import os

import numpy as np
import pytest

from vcp_tpu.codec.probe import probe_reject_reason
from vcp_tpu.config import Config
from vcp_tpu.pipeline.producer import Producer

from test_mkv import _el, _uint, write_test_mkv
from vcp_tpu.codec import mkv as mkvmod


def _write_vp9_webm(path):
    """Minimal Matroska header whose single video track is V_VP9."""
    import struct
    video = _uint(mkvmod.PIXEL_WIDTH, 64) + _uint(mkvmod.PIXEL_HEIGHT, 64)
    entry = (_uint(mkvmod.TRACK_NUMBER, 1)
             + _uint(mkvmod.TRACK_TYPE, 1)
             + _el(mkvmod.CODEC_ID, b"V_VP9")
             + _el(mkvmod.VIDEO, video))
    tracks = _el(mkvmod.TRACKS, _el(mkvmod.TRACK_ENTRY, entry))
    info = _el(mkvmod.INFO, _uint(mkvmod.TIMESTAMP_SCALE, 1_000_000))
    segment = _el(mkvmod.SEGMENT, info + tracks)
    ebml = _el(0x1A45DFA3, b"")
    with open(path, "wb") as f:
        f.write(ebml + segment)


def _h264_webm(path):
    from vcp_tpu.codec.h264.encoder import EncoderConfig, encode_stream
    from vcp_tpu.codec.mp4 import annexb_to_length_prefixed
    from video_util import synth_video
    frames = synth_video(64, 64, 2)
    cfg = EncoderConfig(width=64, height=64, qp=30, gop_size=2,
                        cabac=False, deblock=False)
    sps, pps, samples = encode_stream(iter(frames), cfg)
    write_test_mkv(path, sps, pps,
                   [(annexb_to_length_prefixed(au), is_idr)
                    for au, is_idr in samples], 64, 64)


def test_probe_rejects_vp9_webm(tmp_path):
    p = str(tmp_path / "clip.webm")
    _write_vp9_webm(p)
    reason = probe_reject_reason(p)
    assert reason is not None and "V_VP9" in reason, reason


def test_probe_accepts_h264_webm(tmp_path):
    p = str(tmp_path / "clip.webm")
    _h264_webm(p)
    assert probe_reject_reason(p) is None


def test_probe_accepts_y4m_and_unknown(tmp_path):
    p = str(tmp_path / "x.y4m")
    open(p, "wb").write(b"YUV4MPEG2 W2 H2 F30:1\n")
    assert probe_reject_reason(p) is None


def test_producer_rejects_vp9_at_publish(redis_address, tmp_path):
    """handle_new_file must refuse the file BEFORE moving it to shared
    storage and count it failed; a supported file still publishes."""
    cfg = Config()
    cfg.redis.address = redis_address
    cfg.producer.watch_directory = str(tmp_path / "raw")
    cfg.producer.shared_directory = str(tmp_path / "shared")
    cfg.producer.output_directory = str(tmp_path / "enc")
    cfg.producer.ffmpeg_preset = "copy"
    os.makedirs(cfg.producer.watch_directory)
    os.makedirs(cfg.producer.shared_directory)

    producer = Producer(cfg, poll_interval=0.05)
    bad = os.path.join(cfg.producer.watch_directory, "vp9.webm")
    _write_vp9_webm(bad)
    assert producer.handle_new_file(bad, wait_stable=False) is None
    assert producer.failed == 1 and producer.published == 0
    assert os.path.exists(bad), "rejected file must stay in the watch dir"
    assert os.listdir(cfg.producer.shared_directory) == []

    good = os.path.join(cfg.producer.watch_directory, "ok.webm")
    _h264_webm(good)
    assert producer.handle_new_file(good, wait_stable=False) is not None
    assert producer.published == 1
    producer.stream.close()
