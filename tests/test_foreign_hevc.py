"""Foreign HEVC decode: real libx265 intra streams, bit-exact.

The reference transcodes anything ffmpeg reads
(/root/reference/cmd/consumer.go:376-380), including HEVC sources.
These tests pin codec/h265/foreign.py against the system-ffmpeg oracle
on real libx265 output: full coding quadtree (32x32 CTU down to 8x8
NxN), all 35 intra modes, DST-VII 4x4 luma, sign-data hiding, strong
intra smoothing — every plane of every frame EXACTLY.

Covered x265 tools — the full medium-defaults intra surface: WPP
(entry points + per-row context propagation), AQ (cu_qp_delta with the
per-row QP chain), deblocking (general TU/CU-edge read side), SAO
(band + edge offsets, merge), CTU 64 and 32. Remaining: inter
pictures.
"""

import numpy as np
import pytest

from vcp_tpu.codec.h265.foreign import ForeignHevcDecoder
from vcp_tpu.codec.mp4 import split_annexb

O = pytest.importorskip("av_oracle")

X265_BASE = ("x265-params=ctu=32:no-wpp=1:no-sao=1:aq-mode=0:"
             "no-deblock=1:keyint=1")


@pytest.fixture(scope="module")
def oracle():
    if O.get_oracle() is None:
        pytest.skip("system libavcodec unavailable")
    return O


def _assert_bit_exact(oracle, frames, crf, opts=X265_BASE):
    es = oracle.encode_video("libx265", frames, preset="medium", crf=crf,
                             gop=1, opts=opts)
    theirs = oracle.decode_video("hevc", es)
    dec = ForeignHevcDecoder()
    ours = []
    for nal in split_annexb(es):
        out = dec.decode_nal(nal)
        if out is not None:
            ours.append(out)
    assert len(ours) == len(theirs) == len(frames)
    for i, (t, o) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(t[0], o[0], err_msg=f"f{i} luma")
        np.testing.assert_array_equal(t[1], o[1], err_msg=f"f{i} cb")
        np.testing.assert_array_equal(t[2], o[2], err_msg=f"f{i} cr")


def _clip(name, n=2):
    import rdbench
    return rdbench.load_clip(name)[:n]


@pytest.mark.parametrize("crf", [20, 28, 38])
def test_x265_intra_gradmotion(oracle, crf):
    _assert_bit_exact(oracle, _clip("gradmotion_320x192"), crf)


def test_x265_intra_texture(oracle):
    _assert_bit_exact(oracle, _clip("texture_256x160"), 24)


def test_x265_intra_noise_odd_dims(oracle):
    """Noise maximizes residual-coding coverage; non-CTU-multiple dims
    exercise the conformance window and boundary quadtree splits."""
    rng = np.random.default_rng(11)
    y = rng.integers(0, 256, (150, 190)).astype(np.uint8)
    u = rng.integers(0, 256, (75, 95)).astype(np.uint8)
    v = rng.integers(0, 256, (75, 95)).astype(np.uint8)
    _assert_bit_exact(oracle, [(y, u, v)], 18)


def test_x265_intra_flat_gradient(oracle):
    """Flat + ramp content drives planar/DC/angular and strong
    smoothing paths."""
    yy, xx = np.mgrid[0:96, 0:128]
    y = ((xx * 2 + yy) % 256).astype(np.uint8)
    u = np.full((48, 64), 100, np.uint8)
    v = np.full((48, 64), 150, np.uint8)
    _assert_bit_exact(oracle, [(y, u, v)], 30)


# -- the real bar: untouched x265 medium defaults (WPP + AQ + SAO +
# deblock + CTU 64, keyint pinned to keep the stream all-intra)

X265_MEDIUM = "x265-params=keyint=1"


@pytest.mark.parametrize("clip,crf", [
    ("gradmotion_320x192", 26), ("texture_256x160", 30)])
def test_x265_medium_defaults(oracle, clip, crf):
    _assert_bit_exact(oracle, _clip(clip), crf, opts=X265_MEDIUM)


def test_x265_medium_defaults_odd_dims(oracle):
    rng = np.random.default_rng(3)
    y = rng.integers(0, 256, (150, 190)).astype(np.uint8)
    u = rng.integers(0, 256, (75, 95)).astype(np.uint8)
    v = rng.integers(0, 256, (75, 95)).astype(np.uint8)
    _assert_bit_exact(oracle, [(y, u, v)], 32, opts=X265_MEDIUM)


def test_hevc_mp4_transcode_end_to_end(oracle, tmp_path):
    """Foreign HEVC MP4 -> our H.264 encoder: the arbitrary-input
    transcode path the reference serves for HEVC sources
    (ref cmd/consumer.go:376-380)."""
    import struct

    from vcp_tpu.codec.ingest import open_video
    from vcp_tpu.codec.mp4 import Mp4Writer, Sample, VideoTrack

    frames = _clip("gradmotion_320x192", 3)
    es = oracle.encode_video("libx265", frames, preset="medium", crf=26,
                             gop=1, opts=X265_MEDIUM)
    nals = split_annexb(es)
    by_type = {}
    for nal in nals:
        by_type.setdefault((nal[0] >> 1) & 0x3F, []).append(nal)
    tr = VideoTrack(codec="h265", width=320, height=192,
                    timescale=30000, vps=by_type[32][:1],
                    sps=by_type[33][:1], pps=by_type[34][:1])
    au = []
    for nal in nals:
        t = (nal[0] >> 1) & 0x3F
        if t in (32, 33, 34):
            continue
        au.append(nal)
        if t <= 31:                      # a slice NAL ends the AU
            data = b"".join(struct.pack(">I", len(x)) + x for x in au)
            tr.samples.append(Sample(data=data, duration=1000,
                                     is_sync=True))
            au = []
    w = Mp4Writer()
    w.add_track(tr)
    path = str(tmp_path / "in_hevc.mp4")
    w.write(path)

    vid = open_video(path)
    decoded = list(vid.frames)
    assert len(decoded) == 3
    for (y, u, v), (ry, ru, rv) in zip(decoded,
                                       oracle.decode_video("hevc", es)):
        np.testing.assert_array_equal(y, ry)

    from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
    from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
    enc = H264Encoder(EncoderConfig(width=320, height=192, qp=26,
                                    gop_size=3, cabac=True, deblock=True,
                                    effort=4))
    items = enc.encode_gop(decoded)
    out = H264Decoder().decode_annexb(
        enc.headers_annexb() + b"".join(it[0] for it in items))
    for i, f in enumerate(out):
        assert psnr(np.asarray(f.y), frames[i][0]) > 30, i
