"""Multi-chip sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax

from vcp_tpu.ops import motion as mops
from vcp_tpu.ops import transform as tf
from vcp_tpu.parallel.mesh import encode_pframe_sharded, make_mesh


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.shape["data"] * mesh.shape["tile"] == 8


def test_sharded_pframe_matches_single_chip(mesh):
    """Band-sharded ME/MC/transform must be numerically identical to the
    single-chip step (all-gather of ref rows makes the search global)."""
    rng = np.random.default_rng(3)
    t = mesh.shape["tile"]
    b = 2 * mesh.shape["data"]
    h, w = 32 * t, 64
    qp, sr, lam = 26, 4, 4
    y = rng.integers(0, 256, (b, h, w)).astype(np.int32)
    ref = np.roll(y, (0, 2, -1), (0, 1, 2)).astype(np.int32)

    mv_s, z_s, rec_s = encode_pframe_sharded(mesh, y, ref, qp=qp, sr=sr,
                                             lam=lam)
    mv_s, z_s, rec_s = map(np.asarray, (mv_s, z_s, rec_s))

    for i in range(b):
        mv1, _ = mops.full_search(y[i], ref[i], sr, lam)
        pred1 = mops.mc_luma(ref[i], mv1, sr)
        coef = tf.fdct4(tf.to_blocks4(y[i] - pred1))
        z1 = tf.quant4(coef, qp, intra=False)
        rec1 = np.clip(np.asarray(pred1)
                       + np.asarray(tf.from_blocks4(
                           tf.idct4(tf.dequant4(z1, qp)))), 0, 255)
        np.testing.assert_array_equal(mv_s[i], np.asarray(mv1),
                                      err_msg=f"frame {i} mv")
        np.testing.assert_array_equal(z_s[i], np.asarray(z1))
        np.testing.assert_array_equal(rec_s[i], rec1)


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
