"""HEVC transform/quant layer tests (ops.transform_hevc)."""

import numpy as np
import pytest

from vcp_tpu.ops import transform_hevc as th


def test_matrix_known_rows():
    m4 = th.trans_matrix(4)
    assert m4.tolist() == [
        [64, 64, 64, 64],
        [83, 36, -36, -83],
        [64, -64, -64, 64],
        [36, -83, 83, -36],
    ]
    m8 = th.trans_matrix(8)
    assert m8[1].tolist() == [89, 75, 50, 18, -18, -50, -75, -89]
    assert m8[0].tolist() == [64] * 8
    m32 = th.trans_matrix(32)
    assert m32[0].tolist() == [64] * 32
    # odd rows of M32 start with the famous odd coefficient 90
    assert m32[1][0] == 90 and m32[1][-1] == -90
    # embedding: M_N rows are every (32/N)-th row of M32 truncated
    m16 = th.trans_matrix(16)
    for k in range(16):
        assert m16[k].tolist() == m32[2 * k][:16].tolist()


def test_matrix_near_orthogonal():
    for n in (4, 8, 16, 32):
        m = th.trans_matrix(n).astype(np.float64)
        g = m @ m.T
        norm = np.diag(g).mean()
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() / norm < 0.02, n


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_np_jax_twins_agree(log2):
    rng = np.random.default_rng(log2)
    n = 1 << log2
    x = rng.integers(-255, 256, (3, n, n)).astype(np.int32)
    c_np = th.fwd_np(x, log2)
    c_j = np.asarray(th.fwd(x, log2))
    np.testing.assert_array_equal(c_np, c_j)
    for qp in (0, 17, 30, 51):
        q_np = th.quant_np(c_np, qp, log2, intra=True)
        q_j = np.asarray(th.quant(c_j, qp, log2, intra=True))
        np.testing.assert_array_equal(q_np, q_j)
        d_np = th.dequant_np(q_np, qp, log2)
        d_j = np.asarray(th.dequant(q_j, qp, log2))
        np.testing.assert_array_equal(d_np, d_j)
        r_np = th.inv_np(d_np, log2)
        r_j = np.asarray(th.inv(d_j, log2))
        np.testing.assert_array_equal(r_np, r_j)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_roundtrip_accuracy_low_qp(log2):
    """At QP 0-4 the transform+quant chain must be near-lossless."""
    rng = np.random.default_rng(7)
    n = 1 << log2
    x = rng.integers(-255, 256, (4, n, n)).astype(np.int32)
    for qp in (0, 4):
        c = th.fwd_np(x, log2)
        r = th.inv_np(th.dequant_np(th.quant_np(c, qp, log2, True), qp, log2),
                      log2)
        err = np.abs(r - x)
        # the integer approximations aren't exactly orthogonal; worst-case
        # per-sample error grows with transform size (4 at 32x32)
        assert err.max() <= 1 + log2, (log2, qp, err.max())
        assert err.mean() < 1.0


def test_roundtrip_flat_block_exact():
    # constant residual must reconstruct exactly at qp 0
    for log2 in (2, 3, 4, 5):
        n = 1 << log2
        for v in (-100, -1, 1, 77):
            x = np.full((1, n, n), v, np.int32)
            c = th.fwd_np(x, log2)
            r = th.inv_np(
                th.dequant_np(th.quant_np(c, 0, log2, True), 0, log2), log2)
            assert np.all(r == v), (log2, v)


def test_high_qp_zeroes_small_residual():
    rng = np.random.default_rng(3)
    x = rng.integers(-2, 3, (2, 32, 32)).astype(np.int32)
    q = th.quant_np(th.fwd_np(x, 5), 51, 5, intra=False)
    assert np.count_nonzero(q) == 0


def test_chroma_qp_map():
    assert th.chroma_qp(20) == 20
    assert th.chroma_qp(29) == 29
    assert th.chroma_qp(30) == 29
    assert th.chroma_qp(33) == 32
    assert th.chroma_qp(43) == 37
    assert th.chroma_qp(44) == 38
    assert th.chroma_qp(51) == 45
