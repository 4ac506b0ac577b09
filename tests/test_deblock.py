"""In-loop deblocking: closed-loop exactness + filter behavior."""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
from vcp_tpu.ops import deblock as dbf

from video_util import synth_video


def test_tables_shapes():
    assert dbf.ALPHA.shape == (52,) and dbf.BETA.shape == (52,)
    assert dbf.TC0.shape == (3, 52)
    # monotone non-decreasing thresholds
    assert np.all(np.diff(dbf.ALPHA) >= 0)
    assert np.all(np.diff(dbf.BETA) >= 0)
    assert np.all(np.diff(dbf.TC0, axis=1) >= 0)


def test_filter_smooths_blocking_edge():
    """A hard step across a block edge inside beta/alpha range must be
    smoothed by the normal filter."""
    h = 16
    plane = np.full((h, 32), 100, np.int32)
    plane[:, 16:] = 108                     # step at a MB edge
    bs = np.full((7, h), 0, np.int32)
    bs[3] = 4                               # only the x=16 edge (e=3), intra
    qp = np.full((7, h), 32, np.int32)
    out = np.asarray(dbf._edge_pass(plane, bs, qp, luma=True))
    # edge difference reduced
    assert abs(int(out[0, 16]) - int(out[0, 15])) < 8
    # untouched away from the edge
    np.testing.assert_array_equal(out[:, :12], plane[:, :12])
    np.testing.assert_array_equal(out[:, 20:], plane[:, 20:])


def test_large_edges_not_filtered():
    """Real content edges (difference >= alpha) must be preserved."""
    plane = np.full((8, 32), 30, np.int32)
    plane[:, 16:] = 220
    bs = np.zeros((7, 8), np.int32)
    bs[3] = 4
    qp = np.full((7, 8), 30, np.int32)
    out = np.asarray(dbf._edge_pass(plane, bs, qp, luma=True))
    np.testing.assert_array_equal(out, plane)


@pytest.mark.parametrize("qp,gop", [(30, 1), (34, 4)])
def test_deblock_closed_loop_exact(qp, gop):
    """Encoder (device filter) and decoder (same ops) must agree
    bit-for-bit with in-loop filtering enabled."""
    w, h, n = 64, 48, 4
    frames = synth_video(w, h, n)
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp, gop_size=gop,
                                    effort=2, deblock=True))
    aus = enc.encode_gop(frames) if gop > 1 else \
        [enc.encode_frame(*f) for f in frames]
    stream = enc.headers_annexb() + b"".join(a for a, _ in aus)
    dec = H264Decoder()
    out = dec.decode_annexb(stream)
    assert len(out) == n
    ry, ru, rv = (np.asarray(p) for p in enc.recon_planes)
    np.testing.assert_array_equal(out[-1].y, ry)
    np.testing.assert_array_equal(out[-1].u, ru)
    np.testing.assert_array_equal(out[-1].v, rv)


def test_deblock_improves_or_preserves_quality_high_qp():
    """At high QP the filter should not hurt (and usually helps) PSNR."""
    w, h, n = 64, 48, 6
    frames = synth_video(w, h, n)

    def run(deblock):
        enc = H264Encoder(EncoderConfig(width=w, height=h, qp=38, gop_size=n,
                                        effort=2, deblock=deblock))
        aus = enc.encode_gop(frames)
        dec = H264Decoder()
        out = dec.decode_annexb(enc.headers_annexb()
                                + b"".join(a for a, _ in aus))
        return np.mean([psnr(out[i].y, frames[i][0]) for i in range(n)])

    p_off = run(False)
    p_on = run(True)
    assert p_on > p_off - 0.3, (p_on, p_off)


def test_slice_header_signals_filtering():
    w, h = 32, 32
    frames = synth_video(w, h, 1)
    for deblock in (False, True):
        enc = H264Encoder(EncoderConfig(width=w, height=h, qp=30,
                                        gop_size=1, deblock=deblock))
        au, _ = enc.encode_frame(*frames[0])
        dec = H264Decoder()
        out = dec.decode_annexb(enc.headers_annexb() + au)
        ry, _, _ = (np.asarray(p) for p in enc.recon_planes)
        np.testing.assert_array_equal(out[0].y, ry)
