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


def _grids(intra, nz, mv, qp_mb, cqp):
    import jax.numpy as jnp

    def grid_v(bs_e, qp_e, rep):
        pad = jnp.zeros((1, bs_e.shape[1]), jnp.int32)
        bs = jnp.concatenate([pad, bs_e], axis=0).T
        qp = jnp.concatenate([pad, qp_e], axis=0).T
        return dbf._thr_stack(dbf._repeat_rows(bs.T, rep).T,
                              dbf._repeat_rows(qp.T, rep).T)

    n_mby, n_mbx = qp_mb.shape
    hc, wc = 8 * n_mby, 8 * n_mbx
    bs_v = dbf.compute_bs_luma(intra, nz, mv, True)
    bs_h = dbf.compute_bs_luma(intra, nz, mv, False)
    vthr = grid_v(bs_v, dbf.compute_qp_edges(qp_mb, True, False), 4)
    hthr = jnp.swapaxes(
        grid_v(bs_h, dbf.compute_qp_edges(qp_mb, False, False), 4), 1, 2)
    cvthr = grid_v(
        dbf._repeat_rows(bs_v[1::2], 2).reshape(wc // 4 - 1, hc),
        dbf._repeat_rows(dbf.compute_qp_edges(qp_mb, True, True, cqp), 4),
        1)
    chthr = jnp.swapaxes(grid_v(
        dbf._repeat_rows(bs_h[1::2], 2).reshape(hc // 4 - 1, wc),
        dbf._repeat_rows(dbf.compute_qp_edges(qp_mb, False, True, cqp), 4),
        1), 1, 2)
    return vthr, hthr, cvthr, chthr


def test_pallas_wavefront_matches_xla():
    """The Pallas wavefront kernel (interpret mode) must be bit-identical
    to the XLA wavefront on random inter/intra content."""
    import jax.numpy as jnp
    from vcp_tpu.ops import transform as tf

    rng = np.random.default_rng(11)
    for (h, w), intra_all in (((64, 80), False), ((48, 64), True)):
        n_mby, n_mbx = h // 16, w // 16
        y = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
        u = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
        v = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
        qp_mb = jnp.full((n_mby, n_mbx), 30, jnp.int32)
        intra = jnp.full((n_mby, n_mbx), intra_all, bool)
        nz = jnp.asarray(rng.random((h // 4, w // 4)) < 0.5)
        mv = jnp.asarray(rng.integers(-8, 9, (n_mby, n_mbx, 2)), jnp.int32)
        ref = dbf.deblock_frame(y, u, v, qp_mb, intra, nz, mv,
                                tf.CHROMA_QP_FULL)
        grids = _grids(intra, nz, mv, qp_mb, tf.CHROMA_QP_FULL)
        out = dbf._deblock_pallas(y, u, v, *grids, n_mby, n_mbx,
                                  interpret=True)
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_wavefront_no_strong_matches_xla():
    """The strong=False kernel variant (P/B-frame fast path — the bS==4
    branch statically removed) must stay bit-identical to the full XLA
    wavefront on all-inter content, where bS never reaches 4."""
    import jax.numpy as jnp
    from vcp_tpu.ops import transform as tf

    rng = np.random.default_rng(17)
    h, w = 64, 80
    n_mby, n_mbx = h // 16, w // 16
    y = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
    u = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
    v = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
    qp_mb = jnp.full((n_mby, n_mbx), 30, jnp.int32)
    intra = jnp.zeros((n_mby, n_mbx), bool)
    nz = jnp.asarray(rng.random((h // 4, w // 4)) < 0.5)
    mv = jnp.asarray(rng.integers(-8, 9, (n_mby, n_mbx, 2)), jnp.int32)
    ref = dbf.deblock_frame(y, u, v, qp_mb, intra, nz, mv,
                            tf.CHROMA_QP_FULL)
    grids = _grids(intra, nz, mv, qp_mb, tf.CHROMA_QP_FULL)
    out = dbf._deblock_pallas(y, u, v, *grids, n_mby, n_mbx,
                              interpret=True, strong=False)
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pallas_fast_path_matches_xla():
    """The uniform-QP bS-only fast path (_deblock_pallas_fast, interpret
    mode) must be bit-identical to the general XLA wavefront on
    all-inter content at several QPs, including sparse-activity frames
    (the per-diagonal skip gates must be conservative)."""
    import jax.numpy as jnp
    from vcp_tpu.ops import transform as tf

    rng = np.random.default_rng(23)
    h, w = 64, 80
    n_mby, n_mbx = h // 16, w // 16
    for qp, density in ((30, 0.5), (22, 0.05), (40, 0.0)):
        y = jnp.asarray(rng.integers(0, 256, (h, w)), jnp.int32)
        u = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
        v = jnp.asarray(rng.integers(0, 256, (h // 2, w // 2)), jnp.int32)
        qp_mb = jnp.full((n_mby, n_mbx), qp, jnp.int32)
        intra = jnp.zeros((n_mby, n_mbx), bool)
        nz = jnp.asarray(rng.random((h // 4, w // 4)) < density)
        mv = jnp.asarray(
            (rng.random((n_mby, n_mbx, 1)) < max(density, 0.2))
            * rng.integers(-8, 9, (n_mby, n_mbx, 2)), jnp.int32)
        ref = dbf.deblock_frame(y, u, v, qp_mb, intra, nz, mv,
                                tf.CHROMA_QP_FULL)
        bs_v = dbf.compute_bs_luma(intra, nz, mv, True)
        bs_h = dbf.compute_bs_luma(intra, nz, mv, False)
        out = dbf._deblock_pallas_fast(y, u, v, bs_v, bs_h, qp,
                                       tf.CHROMA_QP_FULL, n_mby, n_mbx,
                                       interpret=True)
        for a, b in zip(out, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_numpy_deblock_matches_device():
    """deblock_frame_host (native C++ raster filter when available, pure
    NumPy otherwise) must be bit-identical to the jnp wavefront — both
    engines are exercised."""
    import os

    import jax.numpy as jnp
    from vcp_tpu.ops import transform as tf

    rng = np.random.default_rng(13)
    for (h, w), intra_all in (((64, 80), False), ((48, 64), True)):
        n_mby, n_mbx = h // 16, w // 16
        y = rng.integers(0, 256, (h, w)).astype(np.int64)
        u = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int64)
        v = rng.integers(0, 256, (h // 2, w // 2)).astype(np.int64)
        qp_mb = np.full((n_mby, n_mbx), 30, np.int32)
        intra = np.full((n_mby, n_mbx), intra_all, bool)
        nz = np.asarray(rng.random((h // 4, w // 4)) < 0.5)
        mv = rng.integers(-8, 9, (n_mby, n_mbx, 2)).astype(np.int32)
        ref = dbf.deblock_frame(jnp.asarray(y, jnp.int32),
                                jnp.asarray(u, jnp.int32),
                                jnp.asarray(v, jnp.int32),
                                jnp.asarray(qp_mb), jnp.asarray(intra),
                                jnp.asarray(nz), jnp.asarray(mv),
                                tf.CHROMA_QP_FULL)
        host = dbf.deblock_frame_host(y, u, v, qp_mb, intra, nz, mv,
                                      np.asarray(tf.CHROMA_QP_FULL))
        os.environ["VCP_NO_NATIVE"] = "1"
        try:
            hostnp = dbf.deblock_frame_host(
                y, u, v, qp_mb, intra, nz, mv,
                np.asarray(tf.CHROMA_QP_FULL))
        finally:
            del os.environ["VCP_NO_NATIVE"]
        for a, b, c in zip(host, ref, hostnp):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            np.testing.assert_array_equal(np.asarray(c), np.asarray(b))
