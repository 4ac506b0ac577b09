"""B-frame coding: self round-trip, B_Skip, MP4 reorder, conformance.

The encoder's B path (codec.h264.bframe + gop_ops.encode_bframe) codes
IDR + P anchors + non-reference B pictures with spatial-direct B_Skip;
streams follow libx264's conventions (Main profile, poc_type 0). These
tests close the loop with the in-repo decoder and — when the system
libavcodec is present — assert bit-exactness against ffmpeg's h264
decoder (the same bar as tests/test_conformance.py).
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video


def _encode(frames, *, cabac, deblock, bframes, qp=28, effort=4,
            t8=False, parts=False):
    h, w = frames[0][0].shape
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop_size=len(frames), cabac=cabac,
                                    deblock=deblock, bframes=bframes,
                                    effort=effort, transform8=t8,
                                    parts=parts))
    out = enc.encode_gop(frames)
    assert all(len(s) == 3 for s in out), "B GOPs carry cts offsets"
    return enc, enc.headers_annexb() + b"".join(s[0] for s in out), out


@pytest.mark.parametrize("cabac", [False, True])
@pytest.mark.parametrize("deblock", [False, True])
def test_b_roundtrip(cabac, deblock):
    """Our decoder reproduces B streams in display order at sane PSNR."""
    w, h, n = 192, 128, 7
    frames = synth_video(w, h, n)
    _, data, out = _encode(frames, cabac=cabac, deblock=deblock, bframes=2)
    dec = H264Decoder().decode_annexb(data)
    assert len(dec) == n
    ps = [psnr(dec[i].y, frames[i][0]) for i in range(n)]
    assert min(ps) > 35, ps
    # decode order I P B B P B B -> cts offsets disp - dec + 1
    assert [s[2] for s in out] == [1, 3, 0, 0, 3, 0, 0]


def test_b_skip_compresses_static():
    """A static tail must collapse to B_Skip runs: the B pictures of a
    static clip must be tiny compared to its P anchors."""
    w, h = 192, 128
    still = synth_video(w, h, 1)[0]
    frames = [still] * 7
    _, data, out = _encode(frames, cabac=True, deblock=True, bframes=2)
    sizes = [len(s[0]) for s in out]
    # out[1] is the first P anchor, out[2]/out[3] its B pictures
    assert sizes[2] < 40 and sizes[3] < 40, sizes
    dec = H264Decoder().decode_annexb(data)
    assert psnr(dec[3].y, still[0]) > 35


def test_b_mp4_roundtrip(tmp_path):
    """MP4 mux with ctts + demux + decode returns display order."""
    from vcp_tpu.codec.h264.encoder import encode_stream, mux_mp4
    from vcp_tpu.codec.ingest import open_video
    w, h, n = 192, 128, 8
    frames = synth_video(w, h, n)
    cfg = EncoderConfig(width=w, height=h, qp=28, gop_size=n, cabac=True,
                        deblock=True, bframes=2)
    sps, pps, samples = encode_stream(iter(frames), cfg)
    path = str(tmp_path / "b.mp4")
    mux_mp4(path, sps, pps, samples, w, h, 30, 1)
    vid = open_video(path)
    got = list(vid.frames)
    assert len(got) == n
    for i in range(n):
        assert psnr(got[i][0], frames[i][0]) > 35, i


def test_b_deblock_two_list_bs():
    """compute_bs_luma's (mv0, mv1, use) form: P-equivalent inputs must
    reproduce the single-list result; differing list usage raises bS."""
    from vcp_tpu.ops.deblock import compute_bs_luma
    rng = np.random.default_rng(3)
    n_mby, n_mbx = 2, 3
    nz = np.zeros((4 * n_mby, 4 * n_mbx), bool)
    intra = np.zeros((n_mby, n_mbx), bool)
    mv = rng.integers(-8, 8, (n_mby, n_mbx, 2)).astype(np.int32)
    use_l0 = np.ones((n_mby, n_mbx), bool)
    ref = compute_bs_luma(intra, nz, mv, True, xp=np)
    two = compute_bs_luma(
        intra, nz,
        (mv, np.zeros_like(mv), np.stack([use_l0, ~use_l0], -1)),
        True, xp=np)
    np.testing.assert_array_equal(ref, two)
    # one MB flips to Bi with equal mvs -> its MB edge gets bS 1
    use = np.stack([use_l0, ~use_l0], -1)
    use[0, 1, 1] = True
    mixed = compute_bs_luma(intra, nz, (mv, mv, use), True, xp=np)
    assert mixed[3, :16].max() >= 1     # edge at column 16 (MB 0|1)


O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    lib = O.get_oracle()
    if lib is None:
        pytest.skip("system libavcodec unavailable")
    return lib


@pytest.mark.parametrize("cabac", [False, True])
@pytest.mark.parametrize("deblock", [False, True])
def test_b_ffmpeg_conformance(oracle, cabac, deblock):
    """ffmpeg's h264 decoder must reproduce our B streams bit-exactly
    (validates Main-profile headers, POC/reorder, B slice syntax incl.
    B_Skip spatial direct, bi-prediction, two-list deblock bS)."""
    w, h, n = 192, 128, 7
    frames = synth_video(w, h, n)
    _, data, _ = _encode(frames, cabac=cabac, deblock=deblock, bframes=2)
    ours = H264Decoder().decode_annexb(data)
    ff = O.decode_video("h264", data, max_frames=32)
    assert len(ff) == n
    for i in range(n):
        for a, b in zip((ours[i].y, ours[i].u, ours[i].v), ff[i]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_b_ffmpeg_conformance_quality_shape(oracle):
    """The SHIPPING quality-preset shape (effort>=5: t8 + partitions +
    B pictures — the two-phase B-GOP path with the pfields mv8/parts
    branch and mv reconstruction via mv8[::2, ::2]) must be bit-exact
    against ffmpeg (advisor round 4: this combination was only verified
    manually)."""
    w, h, n = 192, 128, 7
    frames = synth_video(w, h, n)
    _, data, _ = _encode(frames, cabac=True, deblock=True, bframes=2,
                         effort=6, t8=True, parts=True)
    ours = H264Decoder().decode_annexb(data)
    ff = O.decode_video("h264", data, max_frames=32)
    assert len(ff) == n
    for i in range(n):
        for a, b in zip((ours[i].y, ours[i].u, ours[i].v), ff[i]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_b_ffmpeg_conformance_bf3_tail(oracle):
    """bframes=3 with a partial tail group, high effort (quarter-pel)."""
    w, h, n = 192, 128, 9
    frames = synth_video(w, h, n)
    _, data, _ = _encode(frames, cabac=True, deblock=True, bframes=3,
                         effort=7)
    ours = H264Decoder().decode_annexb(data)
    ff = O.decode_video("h264", data, max_frames=32)
    assert len(ff) == n
    for i in range(n):
        for a, b in zip((ours[i].y, ours[i].u, ours[i].v), ff[i]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
