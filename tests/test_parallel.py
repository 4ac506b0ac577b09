"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax

from vcp_tpu.codec.h264.gop_ops import encode_pchunk
from vcp_tpu.parallel.mesh import encode_pchunk_sharded, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["data"] * mesh.shape["tile"] == 8


@pytest.mark.parametrize("subpel,deblock", [(0, False), (1, True), (2, True)])
def test_sharded_pchunk_bit_identical(mesh, subpel, deblock):
    """The band-sharded production P step (full sub-pel ladder, chroma,
    decimation, deblock) must be BIT-identical to the single-chip
    encode_pchunk — the sharded path IS the production path."""
    rng = np.random.default_rng(3)
    t = mesh.shape["tile"]
    b = mesh.shape["data"]          # one stream per data shard
    n = 3                           # P frames per stream
    h, w = 32 * t, 64
    qp, qpc, sr, lam = 26, 26, 4, 4
    ys = rng.integers(0, 256, (b, n, h, w)).astype(np.int32)
    us = rng.integers(0, 256, (b, n, h // 2, w // 2)).astype(np.int32)
    vs = rng.integers(0, 256, (b, n, h // 2, w // 2)).astype(np.int32)
    ref_y = np.roll(ys[:, 0], (0, 2, -1), (0, 1, 2)).astype(np.int32)
    ref_u = np.roll(us[:, 0], (0, 1, 1), (0, 1, 2)).astype(np.int32)
    ref_v = np.roll(vs[:, 0], (0, 1, 1), (0, 1, 2)).astype(np.int32)

    packed_s, ry_s, ru_s, rv_s = encode_pchunk_sharded(
        mesh, ys, us, vs, ref_y, ref_u, ref_v, qp, qpc, sr, lam,
        subpel=subpel, deblock=deblock)
    packed_s, ry_s, ru_s, rv_s = map(np.asarray,
                                     (packed_s, ry_s, ru_s, rv_s))

    for i in range(b):
        packed1, ry1, ru1, rv1 = encode_pchunk(
            ys[i], us[i], vs[i], ref_y[i], ref_u[i], ref_v[i],
            qp, qpc, sr, lam, deblock, subpel)
        np.testing.assert_array_equal(packed_s[i], np.asarray(packed1),
                                      err_msg=f"stream {i} packed")
        np.testing.assert_array_equal(ry_s[i], np.asarray(ry1))
        np.testing.assert_array_equal(ru_s[i], np.asarray(ru1))
        np.testing.assert_array_equal(rv_s[i], np.asarray(rv1))


def test_graft_entry_and_dryrun():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out["recon_y"].shape == args[0].shape
    if len(jax.devices()) >= 8:
        g.dryrun_multichip(8)
