"""HEVC residual_coding round-trip tests (codec.h265.residual)."""

import numpy as np
import pytest

from vcp_tpu.codec.cabac import CabacDecoder, CabacEncoder
from vcp_tpu.codec.h265.ctx import (HevcContexts, coeff_scan, diag_scan)
from vcp_tpu.codec.h265.residual import decode_residual, encode_residual


def test_diag_scan_4():
    s = diag_scan(4)
    assert s[:6] == ((0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0))
    assert len(s) == 16 and len(set(s)) == 16
    assert s[-1] == (3, 3)


def test_coeff_scan_hierarchical():
    s = coeff_scan(3)  # 8x8: 4 subblocks
    assert len(s) == 64 and len(set(s)) == 64
    # first 16 positions stay inside the DC subblock
    assert all(x < 4 and y < 4 for x, y in s[:16])
    # next subblock in diagonal order is (0,1) i.e. y in 4..7, x in 0..3
    assert all(x < 4 and 4 <= y < 8 for x, y in s[16:32])


def _roundtrip(blocks):
    """blocks: list of (coeffs, log2, c_idx). One CABAC stream."""
    qp = 30
    enc = CabacEncoder()
    cxe = HevcContexts(qp)
    for coeffs, log2, c_idx in blocks:
        encode_residual(enc, cxe, coeffs, log2, c_idx)
    enc.encode_terminate(1)
    data = enc.flush()

    dec = CabacDecoder(data)
    cxd = HevcContexts(qp)
    out = []
    for _, log2, c_idx in blocks:
        out.append(decode_residual(dec, cxd, log2, c_idx))
    assert dec.decode_terminate() == 1
    return out


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("c_idx", [0, 1])
def test_roundtrip_random_sparse(log2, c_idx):
    rng = np.random.default_rng(10 * log2 + c_idx)
    n = 1 << log2
    blocks = []
    for density in (0.02, 0.1, 0.5, 1.0):
        c = rng.integers(-40, 41, (n, n)).astype(np.int32)
        mask = rng.random((n, n)) < density
        c = c * mask
        if not np.any(c):
            c[0, 0] = 1
        blocks.append((c, log2, c_idx))
    outs = _roundtrip(blocks)
    for (orig, _, _), dec in zip(blocks, outs):
        np.testing.assert_array_equal(orig, dec)


def test_roundtrip_extremes():
    blocks = []
    # single DC
    c = np.zeros((32, 32), np.int32); c[0, 0] = 1
    blocks.append((c.copy(), 5, 0))
    # single coefficient at the very last scan position
    c = np.zeros((32, 32), np.int32); c[31, 31] = -7
    blocks.append((c.copy(), 5, 0))
    # large magnitudes exercising the EGk escape at every rice level
    c = np.zeros((16, 16), np.int32)
    c[0, 0] = 30000; c[0, 1] = -20000; c[1, 0] = 12345; c[1, 1] = 1
    c[5, 5] = -32768 + 1
    blocks.append((c.copy(), 4, 1))
    # full block of +/-1
    rng = np.random.default_rng(0)
    c = rng.choice([-1, 1], size=(8, 8)).astype(np.int32)
    blocks.append((c.copy(), 3, 0))
    # empty DC subblock (last in a middle subblock, DC region all zero)
    c = np.zeros((16, 16), np.int32); c[9, 9] = 3
    blocks.append((c.copy(), 4, 0))
    # value exactly at base-level boundaries 1/2/3/4
    c = np.zeros((4, 4), np.int32)
    c[0, 0], c[0, 1], c[1, 0], c[1, 1] = 1, 2, 3, 4
    blocks.append((c.copy(), 2, 0))
    outs = _roundtrip(blocks)
    for (orig, _, _), dec in zip(blocks, outs):
        np.testing.assert_array_equal(orig, dec)


def test_roundtrip_many_blocks_context_adaptation():
    """Long stream: contexts adapt far from init; decode must track."""
    rng = np.random.default_rng(42)
    blocks = []
    for i in range(60):
        log2 = int(rng.choice([2, 3, 4, 5]))
        n = 1 << log2
        c_idx = int(rng.integers(0, 2))
        c = (rng.integers(-9, 10, (n, n)) *
             (rng.random((n, n)) < 0.15)).astype(np.int32)
        if not np.any(c):
            c[n - 1, n - 1] = 2
        blocks.append((c, log2, c_idx))
    outs = _roundtrip(blocks)
    for (orig, _, _), dec in zip(blocks, outs):
        np.testing.assert_array_equal(orig, dec)


def test_compression_beats_raw():
    """Sanity: typical quantized-residual blocks compress well below
    16 bits/coeff."""
    rng = np.random.default_rng(1)
    enc = CabacEncoder()
    cx = HevcContexts(30)
    total = 0
    for _ in range(20):
        c = (rng.integers(-3, 4, (32, 32)) *
             (rng.random((32, 32)) < 0.05)).astype(np.int32)
        if not np.any(c):
            c[0, 0] = 1
        encode_residual(enc, cx, c, 5, 0)
        total += 32 * 32
    enc.encode_terminate(1)
    bits = len(enc.flush()) * 8
    assert bits < total  # < 1 bit per coefficient on sparse data
