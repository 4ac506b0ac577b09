"""Hierarchical (pyramid) full-pel search (ops.motion.hier_search*).

The quality presets' wide windows (R >= 12) route here by default
(gop_ops._use_hier_me); these tests pin (a) the MV window invariant,
(b) near-optimality vs the exhaustive search on realistic content,
(c) the zero-vector fallback on decorrelating (noise) content, and
(d) the parts variant's geometry.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vcp_tpu.ops import motion as m

from video_util import synth_video


def _cost_of(mv, cur, ref, sr, lam=4):
    pred = np.asarray(m.mc_luma(jnp.asarray(ref), jnp.asarray(mv), sr))
    h, w = cur.shape
    sad = np.abs(cur - pred).reshape(h // 16, 16, w // 16, 16).sum(
        axis=(1, 3))
    return sad + lam * np.abs(mv).sum(-1)


@pytest.mark.parametrize("sr", [12, 16, 24])
def test_hier_matches_full_on_synth(sr):
    frames = synth_video(192, 128, 3)
    ref = frames[0][0].astype(np.int32)
    cur = frames[2][0].astype(np.int32)
    mvh = np.asarray(m.hier_search(jnp.asarray(cur), jnp.asarray(ref),
                                   sr, 4))
    assert np.abs(mvh).max() <= sr          # window invariant
    mvf, _ = m.full_search(jnp.asarray(cur), jnp.asarray(ref), sr, 4)
    ch = _cost_of(mvh, cur, ref, sr).sum()
    cf = _cost_of(np.asarray(mvf), cur, ref, sr).sum()
    # near-optimal: within 2% of the exhaustive cost (exact on this clip)
    assert ch <= cf * 1.02, (ch, cf)


def test_hier_zero_fallback_on_noise():
    """Pure noise decorrelates under the 4x box filter; the zero-vector
    guard must keep the result no worse than not searching at all."""
    rng = np.random.default_rng(0)
    ref = rng.integers(0, 255, (128, 192)).astype(np.int32)
    cur = np.roll(ref, (6, -9), axis=(0, 1))
    mvh = np.asarray(m.hier_search(jnp.asarray(cur), jnp.asarray(ref),
                                   16, 4))
    c_h = _cost_of(mvh, cur, ref, 16).sum()
    c_0 = _cost_of(np.zeros_like(mvh), cur, ref, 16).sum()
    assert c_h <= c_0


def test_hier_parts_geometry_and_window():
    frames = synth_video(192, 128, 2)
    ref = frames[0][0].astype(np.int32)
    cur = frames[1][0].astype(np.int32)
    mv16, mv8, mvh_, mvv = (np.asarray(a) for a in m.hier_search_parts(
        jnp.asarray(cur), jnp.asarray(ref), 16, 4))
    nby, nbx = 128 // 16, 192 // 16
    assert mv16.shape == (nby, nbx, 2)
    assert mv8.shape == (2 * nby, 2 * nbx, 2)
    assert mvh_.shape == (2 * nby, nbx, 2)
    assert mvv.shape == (nby, 2 * nbx, 2)
    for a in (mv16, mv8, mvh_, mvv):
        assert np.abs(a).max() <= 16
    # 16x16 track agrees with hier_search (same sweep, same tie-break)
    mvs = np.asarray(m.hier_search(jnp.asarray(cur), jnp.asarray(ref),
                                   16, 4))
    np.testing.assert_array_equal(mv16, mvs)


def test_hier_finds_global_translation():
    """A textured frame under pure translation: interior MBs must
    recover the exact displacement (checked against full_search to stay
    honest about rate-bias tie-breaks)."""
    rng = np.random.default_rng(1)
    # low-frequency texture that survives 4x downsampling
    base = rng.integers(0, 255, (16, 24)).astype(np.int32)
    tex = np.kron(base, np.ones((8, 8), np.int32))    # 128x192
    cur = np.roll(tex, (6, -9), axis=(0, 1))
    mvh = np.asarray(m.hier_search(jnp.asarray(cur), jnp.asarray(tex),
                                   16, 4))
    mvf, _ = m.full_search(jnp.asarray(cur), jnp.asarray(tex), 16, 4)
    inner_h = mvh[1:-1, 1:-1]
    inner_f = np.asarray(mvf)[1:-1, 1:-1]
    np.testing.assert_array_equal(inner_h, inner_f)
