"""8x8 transform/quant unit tests (High profile, ops.transform8).

Exactness bar: the inverse path (dequant8 + idct8) is normative
(spec 8.5.13) — the oracle conformance tests pin it to ffmpeg once the
encoder emits 8x8 MBs; here we pin internal consistency:
* fdct8→idct8 round-trips exactly at quant-free scaling,
* jax and numpy twins agree bit-for-bit,
* quant/dequant monotonicity + clamp,
* zig-zag + CAVLC interleave are inverses.
"""

import numpy as np
import pytest

from vcp_tpu.ops import transform8 as t8


def rand_blocks(shape, lo=-255, hi=255, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi, size=shape, dtype=np.int64).astype(np.int32)


def test_forward_matches_decoder_inverse_exactly():
    # Numerically invert the NORMATIVE decoder map D = idct8∘dequant8
    # (at a shift-exact qp) and check that fdct8+MF8 produces levels on
    # the same scale at every coefficient position — i.e. the forward is
    # the matched companion of the spec inverse (ratio 1.0, 64/64).
    qp = 24
    eye = np.zeros((64, 8, 8), np.int64)
    for k in range(64):
        eye[k, k // 8, k % 8] = 512
    dmat = t8.idct8_np(t8.dequant8_np(eye, qp)).reshape(64, 64).T / 512.0
    fmat = np.linalg.inv(dmat)
    rng = np.random.default_rng(1)
    x = rng.integers(-1000, 1000, size=(200, 64)).astype(np.float64)
    opt = x @ fmat.T                        # optimal unrounded levels
    w = np.asarray(t8.fdct8(
        x.astype(np.int32).reshape(-1, 8, 8))).reshape(-1, 64)
    mf = t8.MF8_TABLE[qp % 6].reshape(64) / 2.0 ** (16 + qp // 6)
    ratio = (w * mf) / np.where(np.abs(opt) > 3, opt, np.nan)
    med = np.nanmedian(ratio, axis=0)
    assert np.all(np.abs(med - 1.0) < 0.01), med.reshape(8, 8)


def test_idct8_np_twin_matches_jax():
    w = rand_blocks((64, 8, 8), -20000, 20000, seed=1)
    assert np.array_equal(t8.idct8_np(w), np.asarray(t8.idct8(w)))


@pytest.mark.parametrize("qp", [0, 10, 22, 28, 35, 36, 40, 51])
def test_dequant8_np_twin_matches_jax(qp):
    lv = rand_blocks((16, 8, 8), -500, 500, seed=qp)
    assert np.array_equal(t8.dequant8_np(lv, qp),
                          np.asarray(t8.dequant8(lv, qp)))


@pytest.mark.parametrize("qp", [22, 28, 36, 44])
@pytest.mark.parametrize("intra", [True, False])
def test_quant_dequant_recon_close(qp, intra):
    # closed loop: residual -> fdct -> quant -> dequant -> idct stays
    # within the quantization step of the original.
    x = rand_blocks((16, 8, 8), -100, 100, seed=qp)
    w = t8.fdct8(x)
    z = t8.quant8(w, qp, intra=intra)
    rec = np.asarray(t8.idct8(t8.dequant8(z, qp)))
    qstep = 2.0 ** ((qp - 4) / 6)
    assert np.abs(rec - x).max() <= max(6, qstep * 2.0)


def test_quant8_clamps_to_max_level():
    w = np.full((1, 8, 8), 10 ** 7, np.int32)
    z = np.asarray(t8.quant8(w, 0, intra=True))
    assert z.max() == t8.MAX_LEVEL
    z = np.asarray(t8.quant8(-w, 0, intra=True))
    assert z.min() == -t8.MAX_LEVEL


def test_zigzag8_scan_is_permutation():
    zz = np.asarray(t8.ZIGZAG_8x8)
    assert sorted(zz.tolist()) == list(range(64))
    # spec Table 8-8 spot checks
    assert zz[0] == 0 and zz[1] == 1 and zz[2] == 8 and zz[3] == 16
    assert zz[63] == 63


def test_zigzag_unzigzag_roundtrip():
    blocks = rand_blocks((5, 8, 8), seed=3)
    scan = np.asarray(t8.zigzag8(blocks))
    assert np.array_equal(t8.unzigzag8_np(scan), blocks)


def test_cavlc_interleave_roundtrip():
    scan = rand_blocks((7, 64), seed=4)
    four = t8.split8_to_4x4_np(scan)
    assert four.shape == (7, 4, 16)
    # sub-block k, coefficient i == scan position 4*i + k (spec 8.5.6)
    assert np.array_equal(four[:, 2, 5], scan[:, 4 * 5 + 2])
    assert np.array_equal(t8.merge4x4_to_8_np(four), scan)


def test_blocks8_tiling_roundtrip():
    plane = rand_blocks((64, 128), 0, 255, seed=5)
    blocks = t8.to_blocks8(plane)
    assert blocks.shape == (8, 16, 8, 8)
    assert np.array_equal(np.asarray(t8.from_blocks8(blocks)), plane)


def test_v8_mf8_tables_shape_and_classes():
    assert t8.V8_TABLE.shape == (6, 8, 8)
    # spec examples: position (0,0) class 0, (1,1) class 1, (2,2) class 2
    assert t8.V8_TABLE[0, 0, 0] == 20
    assert t8.V8_TABLE[0, 1, 1] == 18
    assert t8.V8_TABLE[0, 2, 2] == 32
    assert t8.V8_TABLE[0, 0, 1] == 19   # class 3
    assert t8.V8_TABLE[0, 0, 2] == 25   # class 4
    assert t8.V8_TABLE[0, 1, 2] == 24   # class 5
