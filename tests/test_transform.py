"""Exact-integer transform/quant tests (H.264 8.5.9-8.5.13)."""

import numpy as np
import pytest

from vcp_tpu.ops import transform as tf


def rng():
    return np.random.default_rng(42)


def test_idct_dc_impulse_exact():
    """idct of 64*E00 is the all-ones block ((64+32)>>6 per pixel) — a
    spec-exact property of the inverse transform."""
    w = np.zeros((1, 4, 4), np.int32)
    w[0, 0, 0] = 64
    np.testing.assert_array_equal(np.asarray(tf.idct4(w)),
                                  np.ones((1, 4, 4), np.int32))


def test_fdct_flat_block_energy():
    """fdct of a flat block concentrates everything in DC with gain 16."""
    x = np.full((1, 4, 4), 7, np.int32)
    w = np.asarray(tf.fdct4(x))
    assert w[0, 0, 0] == 7 * 16
    assert np.abs(w).sum() == 7 * 16


@pytest.mark.parametrize("qp", [0, 4, 10, 17, 23, 29, 35, 44, 51])
@pytest.mark.parametrize("intra", [True, False])
def test_quant_roundtrip_error_bounded(qp, intra):
    """quant→dequant→idct reconstruction error must shrink with QP and be
    zero-ish at QP0 for small residuals."""
    x = rng().integers(-200, 201, size=(200, 4, 4)).astype(np.int32)
    w = tf.fdct4(x)
    z = tf.quant4(w, qp, intra)
    wd = tf.dequant4(z, qp)
    r = np.asarray(tf.idct4(wd))
    err = np.abs(r - x).max()
    # Qstep doubles every 6 QP; QP0 step = 0.625 → max error small
    qstep = 0.625 * 2 ** (qp / 6)
    # pixel error accumulates up to ~16 weighted coefficient errors
    bound = qstep * 1.8 + 2
    assert err <= bound, (qp, intra, err, qstep)


def test_quant_zero_preserving():
    z = tf.quant4(np.zeros((3, 4, 4), np.int32), 30, True)
    assert np.asarray(z).sum() == 0


def test_quant_sign_symmetry():
    x = rng().integers(-500, 501, size=(50, 4, 4)).astype(np.int32)
    zp = np.asarray(tf.quant4(x, 24, True))
    zn = np.asarray(tf.quant4(-x, 24, True))
    np.testing.assert_array_equal(zp, -zn)


@pytest.mark.parametrize("qp", [0, 8, 20, 26, 32, 40, 51])
def test_luma_dc_path_roundtrip(qp):
    """Intra16x16 DC: hadamard→>>1→quant → decoder hadamard→scale.

    The recovered DC must approximate the original core-transform DC at
    the AC path's dequant scale (W' ≈ 4 * Qstep-rounded)."""
    dc = rng().integers(-2000, 2001, size=(20, 4, 4)).astype(np.int32)
    fwd = np.asarray(tf.hadamard4(dc)) >> 1
    z = tf.quant_dc4(fwd, qp)
    rec = np.asarray(tf.dequant_dc4(z, qp))
    # Compare against what the plain AC path would give for the same DC.
    z_ac = tf.quant4(np.broadcast_to(dc[..., None, None] * 0, dc.shape
                                     + (1, 1))[..., 0, 0] * 0, qp, True)
    del z_ac
    # Reference: dequantized-DC should approximate dc * 4 (the AC-path
    # scale) within quantization error of the doubled-Qstep DC quant.
    qstep = 0.625 * 2 ** (qp / 6)
    err = np.abs(rec / 4.0 - dc).max()
    # Hadamard-domain quant error spreads over all 16 DCs on inverse:
    # worst case ~4x the doubled quant step.
    assert err <= qstep * 4.5 + 8, (qp, err, qstep)


@pytest.mark.parametrize("qp", [0, 12, 25, 38, 51])
def test_chroma_dc_path_roundtrip(qp):
    dc = rng().integers(-2000, 2001, size=(30, 2, 2)).astype(np.int32)
    fwd = tf.hadamard2(dc)
    z = tf.quant_dc2(fwd, qp, intra=True)
    rec = np.asarray(tf.dequant_dc2(z, qp))
    qstep = 0.625 * 2 ** (qp / 6)
    err = np.abs(rec / 4.0 - dc).max()
    assert err <= qstep * 4.5 + 8, (qp, err, qstep)


def test_chroma_qp_table():
    assert tf.chroma_qp(0) == 0
    assert tf.chroma_qp(29) == 29
    assert tf.chroma_qp(30) == 29
    assert tf.chroma_qp(39) == 35
    assert tf.chroma_qp(51) == 39
    assert tf.chroma_qp(51, offset=-51) == 0


def test_blocks_tiling_roundtrip():
    x = rng().integers(0, 256, size=(32, 48)).astype(np.int32)
    b = tf.to_blocks4(x)
    assert b.shape == (8, 12, 4, 4)
    np.testing.assert_array_equal(np.asarray(tf.from_blocks4(b)), x)
    # block (i,j) holds plane[4i:4i+4, 4j:4j+4]
    np.testing.assert_array_equal(np.asarray(b[2, 3]), x[8:12, 12:16])


def test_full_16x16_intra_dc_reconstruction():
    """End-to-end I16x16 luma: residual → fdct → split DC/AC → quantize
    both paths → decode both paths → idct → residual', error bounded."""
    qp = 24
    res = rng().integers(-64, 65, size=(16, 16)).astype(np.int32)
    blocks = tf.to_blocks4(res)                      # (4,4,4,4)
    w = np.asarray(tf.fdct4(blocks))
    dc = w[..., 0, 0]                                 # (4,4)
    # encoder
    z_dc = tf.quant_dc4(np.asarray(tf.hadamard4(dc)) >> 1, qp)
    z_ac = np.asarray(tf.quant4(w, qp, True))
    # decoder
    dc_rec = np.asarray(tf.dequant_dc4(z_dc, qp))     # (4,4)
    w_rec = np.array(tf.dequant4(z_ac, qp))
    w_rec[..., 0, 0] = dc_rec
    res_rec = np.asarray(tf.from_blocks4(tf.idct4(w_rec)))
    err = np.abs(res_rec - res).max()
    qstep = 0.625 * 2 ** (qp / 6)
    assert err < qstep * 5, err
