"""Pallas SAD search kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

from vcp_tpu.ops import motion as mops
from vcp_tpu.ops.motion_pallas import full_search_pallas


@pytest.mark.parametrize("sr,shape", [(4, (48, 64)), (8, (64, 128))])
def test_pallas_matches_xla(sr, shape):
    rng = np.random.default_rng(sr)
    h, w = shape
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    # construct a ref with known global motion + noise
    ref = np.roll(cur, (3, -2), (0, 1))
    ref = np.clip(ref + rng.integers(-2, 3, ref.shape), 0, 255).astype(np.int32)

    mv_ref, _ = mops.full_search(cur, ref, sr, 4)
    mv_pal = full_search_pallas(cur, ref, sr, 4, interpret=True)
    np.testing.assert_array_equal(np.asarray(mv_pal), np.asarray(mv_ref))


def test_pallas_finds_known_motion():
    rng = np.random.default_rng(9)
    h, w = 48, 64
    ref = rng.integers(0, 256, (h, w)).astype(np.int32)
    # cur = roll(ref, (2,-3)) ⇒ cur[y,x] = ref[y-2, x+3] ⇒ the matching
    # reference block sits at offset (dy=-2, dx=+3)
    cur = np.roll(ref, (2, -3), (0, 1)).astype(np.int32)
    mv = np.asarray(full_search_pallas(cur, ref, 4, 1, interpret=True))
    assert tuple(mv[1, 1]) == (-2, 3)
    assert tuple(mv[1, 2]) == (-2, 3)


@pytest.mark.parametrize("sr", [4, 8])
def test_pallas_fused_pred_matches_mc_luma(sr):
    """with_pred=True must emit exactly mc_luma(ref, mv, sr) and the same
    MVs as the plain search."""
    rng = np.random.default_rng(sr + 100)
    h, w = 64, 128
    cur = rng.integers(0, 256, (h, w)).astype(np.int32)
    ref = np.clip(np.roll(cur, (1, -2), (0, 1))
                  + rng.integers(-3, 4, (h, w)), 0, 255).astype(np.int32)
    mv0 = full_search_pallas(cur, ref, sr, 4, interpret=True)
    mv, pred = full_search_pallas(cur, ref, sr, 4, interpret=True,
                                  with_pred=True)
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(mv0))
    want = np.asarray(mops.mc_luma(ref, mv0, sr))
    np.testing.assert_array_equal(np.asarray(pred), want)


@pytest.mark.parametrize("sr", [4, 8])
def test_chroma_mc_pair_matches_gather(sr):
    """mc_chroma_q_pair (select-accumulate) == mc_chroma_q (gather)."""
    rng = np.random.default_rng(sr)
    m = sr // 2 + 2
    hc, wc = 48, 64
    mby, mbx = hc // 8, wc // 8
    ru = rng.integers(0, 255, (hc, wc)).astype(np.int32)
    rv = rng.integers(0, 255, (hc, wc)).astype(np.int32)
    mvq = rng.integers(-4 * sr - 2, 4 * sr + 3, (mby, mbx, 2)).astype(np.int32)
    gu = np.asarray(mops.mc_chroma_q(ru, mvq, m))
    gv = np.asarray(mops.mc_chroma_q(rv, mvq, m))
    su, sv = mops.mc_chroma_q_pair(ru, rv, mvq, m)
    np.testing.assert_array_equal(gu, np.asarray(su))
    np.testing.assert_array_equal(gv, np.asarray(sv))
