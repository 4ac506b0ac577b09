"""P_8x8 sub-partitions: round-trip, conformance, and RD sanity.

x264 medium runs p8x8 partition analysis (ref internal/config/config.go:49
— the `h264-cpu` preset is libx264 medium); the rebuild's quality presets
mirror it with a device-side 16x16-vs-4x8x8 decision per MB
(pframe._encode_pframe_device_parts). These tests pin:
  * own encode → own decode bit-exact recon (CAVLC + CABAC, t8, deblock)
  * partitions are actually chosen on partition-friendly content
  * B GOPs with P_8x8 anchors stay consistent (colZero uniformity guard)
  * ffmpeg decodes partitioned streams bit-exactly (conformance)
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_frame, synth_video


def _encode_perframe(frames, **kw):
    cfg = EncoderConfig(**kw)
    enc = H264Encoder(cfg)
    aus, recons, parts = [], [], 0
    for y, u, v in frames:
        au, is_idr = enc.encode_frame(y, u, v)
        aus.append(au)
        recons.append(tuple(np.asarray(p) for p in enc.recon_planes))
        d = getattr(enc, "_last_p_data", None)
        if d is not None and not is_idr and d.get("parts") is not None:
            parts += int(np.asarray(d["parts"]).sum())
    return enc, aus, recons, parts


def _split_frames(w, h, n):
    """Content where MB halves move differently: two boxes drifting in
    opposite directions inside shared MBs — 16x16 vectors must compromise,
    8x8 partitions win."""
    out = []
    for t in range(n):
        y, u, v = synth_frame(w, h, 0)
        y = y.copy()
        a = (5 * t) % (w - 8)
        b = (w - 16) - (5 * t) % (w - 16)
        y[8:16, a:a + 8] = 235
        y[16:24, b:b + 8] = 16
        out.append((y, u, v))
    return out


@pytest.mark.parametrize("cabac", [False, True])
def test_parts_roundtrip_exact(cabac):
    frames = _split_frames(64, 48, 5)
    enc, aus, recons, parts = _encode_perframe(
        frames, width=64, height=48, qp=26, gop_size=8, effort=5,
        cabac=cabac, deblock=True, parts=True)
    assert parts > 0, "partition decision never fired on split-motion clip"
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb() + b"".join(aus))
    for i, (f, r) in enumerate(zip(out, recons)):
        np.testing.assert_array_equal(f.y, r[0], err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(f.u, r[1], err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(f.v, r[2], err_msg=f"frame {i} cr")


def test_parts_t8_roundtrip_exact():
    """High-profile 8x8 transform + P_8x8 partitions together."""
    frames = _split_frames(96, 64, 5)
    enc, aus, recons, parts = _encode_perframe(
        frames, width=96, height=64, qp=28, gop_size=8, effort=6,
        cabac=True, deblock=True, transform8=True, parts=True)
    assert parts > 0
    out = H264Decoder().decode_annexb(enc.headers_annexb() + b"".join(aus))
    for i, (f, r) in enumerate(zip(out, recons)):
        np.testing.assert_array_equal(f.y, r[0], err_msg=f"frame {i} luma")
        np.testing.assert_array_equal(f.u, r[1])
        np.testing.assert_array_equal(f.v, r[2])


def test_parts_bgop_roundtrip_exact():
    """B GOP with P_8x8 anchors: the colZero-uniformity guard must keep
    B_Skip derivation consistent between encoder and decoder."""
    cfg = EncoderConfig(width=96, height=80, qp=28, gop_size=9, effort=6,
                        cabac=True, deblock=True, transform8=True,
                        parts=True, bframes=2)
    enc = H264Encoder(cfg)
    frames = synth_video(96, 80, 9)
    items = enc.encode_gop(frames)
    data = enc.headers_annexb() + b"".join(it[0] for it in items)
    out = H264Decoder().decode_annexb(data)
    assert len(out) == len(frames)
    # closed-loop sanity: decoded frames track the source
    from vcp_tpu.codec.h264.decoder import psnr
    for i, f in enumerate(out):
        assert psnr(np.asarray(f.y), frames[i][0]) > 28, i


def test_parts_uniform_mv_demoted():
    """A static scene must not code P_8x8 anywhere (uniform quadrant MVs
    demote to 16x16 / skip — no wasted sub_mb_type bits)."""
    y, u, v = synth_frame(64, 48, 0)
    frames = [(y, u, v)] * 4
    enc, aus, recons, parts = _encode_perframe(
        frames, width=64, height=48, qp=26, gop_size=8, effort=5,
        cabac=True, parts=True)
    out = H264Decoder().decode_annexb(enc.headers_annexb() + b"".join(aus))
    np.testing.assert_array_equal(out[-1].y, recons[-1][0])
    # P frames of a static scene stay tiny (all-skip)
    assert all(len(a) < 40 for a in aus[1:]), [len(a) for a in aus]


def test_parts_beats_16x16_on_split_motion():
    """The partition decision must pay off: fewer bits at equal-or-better
    PSNR (or better PSNR at equal bits) on split-motion content."""
    from vcp_tpu.codec.h264.decoder import psnr
    frames = _split_frames(96, 64, 6)
    kw = dict(width=96, height=64, qp=30, gop_size=8, effort=5, cabac=True)
    _, aus_off, rec_off, _ = _encode_perframe(frames, parts=False, **kw)
    _, aus_on, rec_on, nparts = _encode_perframe(frames, parts=True, **kw)
    assert nparts > 0
    bits_off = sum(len(a) for a in aus_off)
    bits_on = sum(len(a) for a in aus_on)
    ps_off = np.mean([psnr(r[0], f[0]) for r, f in zip(rec_off, frames)])
    ps_on = np.mean([psnr(r[0], f[0]) for r, f in zip(rec_on, frames)])
    # accept either axis of dominance; reject strictly-worse
    assert (bits_on <= bits_off and ps_on >= ps_off - 0.05) or \
           (ps_on > ps_off and bits_on <= bits_off * 1.02), \
        (bits_off, bits_on, ps_off, ps_on)


# -- conformance (needs the system libavcodec oracle) ----------------------

O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    lib = O.get_oracle()
    if lib is None:
        pytest.skip("system libavcodec unavailable")
    return lib


@pytest.mark.parametrize("cabac", [False, True])
def test_parts_ffmpeg_conformance(oracle, cabac):
    frames = _split_frames(96, 64, 5)
    enc, aus, recons, parts = _encode_perframe(
        frames, width=96, height=64, qp=27, gop_size=8, effort=6,
        cabac=cabac, deblock=True, transform8=cabac, parts=True)
    assert parts > 0
    data = enc.headers_annexb() + b"".join(aus)
    ours = H264Decoder().decode_annexb(data)
    theirs = O.decode_video("h264", data)
    assert len(theirs) == len(ours)
    for i, ((ty, tu, tv), f) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(ty, np.asarray(f.y, np.uint8),
                                      err_msg=f"frame {i} cabac={cabac}")
        np.testing.assert_array_equal(tu, np.asarray(f.u, np.uint8))
        np.testing.assert_array_equal(tv, np.asarray(f.v, np.uint8))


def test_parts_bgop_ffmpeg_conformance(oracle):
    cfg = EncoderConfig(width=96, height=80, qp=28, gop_size=9, effort=6,
                        cabac=True, deblock=True, transform8=True,
                        parts=True, bframes=2)
    enc = H264Encoder(cfg)
    frames = synth_video(96, 80, 9)
    items = enc.encode_gop(frames)
    data = enc.headers_annexb() + b"".join(it[0] for it in items)
    ours = H264Decoder().decode_annexb(data)
    theirs = O.decode_video("h264", data)
    assert len(theirs) == len(ours)
    for i, ((ty, tu, tv), f) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(ty, np.asarray(f.y, np.uint8),
                                      err_msg=f"frame {i}")
        np.testing.assert_array_equal(tu, np.asarray(f.u, np.uint8))
        np.testing.assert_array_equal(tv, np.asarray(f.v, np.uint8))


def _hsplit_frames(w, h, n):
    """Top halves of MBs move, bottom halves static: 16x8 partitions win."""
    out = []
    ys, us, vs = synth_frame(w, h, 0)
    for t in range(n):
        y = ys.copy()
        for mby in range(h // 16):
            r = 16 * mby
            y[r:r + 8, :] = np.roll(ys[r:r + 8, :], 4 * t, axis=1)
        out.append((y, us, vs))
    return out


@pytest.mark.parametrize("cabac", [False, True])
def test_two_part_roundtrip_exact(cabac):
    """16x8/8x16 partitions: own encode -> own decode bit-exact, and the
    decision actually selects two-partition shapes on split-half motion."""
    frames = _hsplit_frames(96, 64, 5)
    enc, aus, recons, parts = _encode_perframe(
        frames, width=96, height=64, qp=26, gop_size=8, effort=5,
        cabac=cabac, deblock=True, parts=True)
    types = set()
    # re-derive canonical ptypes from the last P frame's data
    d = enc._last_p_data
    from vcp_tpu.codec.h264.pframe import _mv8_grid_xy
    _, pt = _mv8_grid_xy(d, 64 // 16, 96 // 16)
    types |= set(np.unique(pt).tolist())
    assert 1 in types or 2 in types, f"no 16x8/8x16 chosen: {types}"
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb() + b"".join(aus))
    for i, (f, r) in enumerate(zip(out, recons)):
        np.testing.assert_array_equal(f.y, r[0], err_msg=f"frame {i}")
        np.testing.assert_array_equal(f.u, r[1])
        np.testing.assert_array_equal(f.v, r[2])


def test_two_part_ffmpeg_conformance():
    if O.get_oracle() is None:
        pytest.skip("system libavcodec unavailable")
    frames = _hsplit_frames(96, 64, 5)
    enc, aus, recons, parts = _encode_perframe(
        frames, width=96, height=64, qp=27, gop_size=8, effort=6,
        cabac=True, deblock=True, transform8=True, parts=True)
    data = enc.headers_annexb() + b"".join(aus)
    theirs = O.decode_video("h264", data)
    for i, ((ty, tu, tv), r) in enumerate(zip(theirs, recons)):
        np.testing.assert_array_equal(ty, r[0], err_msg=f"frame {i}")
        np.testing.assert_array_equal(tu, r[1])
        np.testing.assert_array_equal(tv, r[2])
