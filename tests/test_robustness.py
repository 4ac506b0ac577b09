"""Robustness: scene-cut IDR placement + decoder survives hostile input."""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import DecodeError, H264Decoder
from vcp_tpu.codec.h264.encoder import (
    EncoderConfig, H264Encoder, _is_scene_cut, encode_stream)
from vcp_tpu.codec.mp4 import probe_bytes

from video_util import synth_video, synth_frame


def test_scene_cut_detector():
    y1, _, _ = synth_frame(64, 48, 0)
    y2, _, _ = synth_frame(64, 48, 1)
    assert not _is_scene_cut(y1, y2)          # adjacent frames: no cut
    inverted = (255 - y1).astype(np.uint8)
    assert _is_scene_cut(y1, inverted)        # hard content change


@pytest.mark.slow
def test_scene_cut_inserts_idr():
    w, h = 64, 48
    a = synth_video(w, h, 4)
    # different content after frame 4 (inverted scene)
    b = [(255 - y, u, v) for y, u, v in synth_video(w, h, 4)]
    cfg = EncoderConfig(width=w, height=h, qp=28, gop_size=16, effort=2)
    sps, pps, samples = encode_stream(iter(a + b), cfg)
    idrs = [i for i, (_, idr) in enumerate(samples) if idr]
    assert idrs == [0, 4], idrs               # IDR lands exactly on the cut
    dec = H264Decoder()
    enc = H264Encoder(cfg)
    out = dec.decode_annexb(enc.headers_annexb()
                            + b"".join(au for au, _ in samples))
    assert len(out) == 8


def _stream():
    frames = synth_video(48, 48, 3)
    enc = H264Encoder(EncoderConfig(width=48, height=48, qp=28, gop_size=3,
                                    effort=2))
    aus = enc.encode_gop(frames)
    return enc.headers_annexb() + b"".join(a for a, _ in aus)


@pytest.mark.slow
def test_decoder_survives_bit_corruption():
    """Randomly corrupted streams must raise a clean error or produce
    frames — never crash with an unrelated exception."""
    base = bytearray(_stream())
    rng = np.random.default_rng(0)
    survived, errored = 0, 0
    for trial in range(40):
        data = bytearray(base)
        for _ in range(3):
            pos = int(rng.integers(30, len(data)))   # keep SPS/PPS intact
            data[pos] ^= 1 << int(rng.integers(0, 8))
        dec = H264Decoder()
        try:
            dec.decode_annexb(bytes(data))
            survived += 1
        except (DecodeError, ValueError, IndexError):
            errored += 1
    assert survived + errored == 40


def test_decoder_rejects_garbage():
    dec = H264Decoder()
    out = dec.decode_annexb(b"\x00" * 100)   # no start codes → no frames
    assert out == []
    with pytest.raises(Exception):
        dec2 = H264Decoder()
        # a slice NAL with no SPS/PPS context
        dec2.decode_annexb(b"\x00\x00\x01\x65" + bytes(20))


def test_probe_survives_truncation():
    import tests  # noqa
    from test_mp4 import make_test_mp4
    import os
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        p = make_test_mp4(os.path.join(d, "t.mp4"))
        data = open(p, "rb").read()
        for cut in (1, 7, 20, len(data) // 2, len(data) - 3):
            r = probe_bytes(data[:cut])       # must not raise
            assert r.valid in (True, False)
