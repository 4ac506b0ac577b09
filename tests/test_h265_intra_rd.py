"""codec.h265.intra_rd device predictors vs the spec-proven numpy
twins in codec.h265.foreign (which tests/test_foreign_hevc.py pins
against libx265 bitstreams and the libavcodec oracle).

Every lane case: reference substitution at all four CTU-availability
corners, [1 2 1] smoothing, and every intra mode 0..34 at n=32 must be
bit-exact with foreign.intra_refs/_filter_refs/intra_pred.
"""

import numpy as np
import pytest

from vcp_tpu.codec.h265 import foreign, intra_rd


def _plane(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w), np.int32)


def _raw_reads(plane, mby, mbx, nbx):
    """Raw (unsubstituted) plane reads the device path would gather."""
    y0, x0 = 32 * mby, 32 * mbx
    left32 = np.zeros(32, np.int32)
    top64 = np.zeros(64, np.int32)
    corner = np.int32(0)
    if mbx > 0:
        left32[:] = plane[y0:y0 + 32, x0 - 1]
    if mby > 0:
        hi = min(64, plane.shape[1] - x0)
        top64[:hi] = plane[y0 - 1, x0:x0 + hi]
    if mby > 0 and mbx > 0:
        corner = plane[y0 - 1, x0 - 1]
    return left32, top64, corner


def _cases(nby=3, nbx=4):
    # all availability corners incl. last column (no top-right)
    return [(0, 0), (0, 1), (0, nbx - 1), (1, 0), (2, 0),
            (1, 1), (1, nbx - 1), (2, 2), (nby - 1, nbx - 1)]


def _both_refs(plane, mby, mbx, nby, nbx):
    pw, ph = 32 * nbx, 32 * nby
    l32, t64, c = _raw_reads(plane, mby, mbx, nbx)
    got = intra_rd.build_refs(
        np.asarray([l32]), np.asarray([t64]), np.asarray([c]),
        np.asarray([mbx > 0]), np.asarray([mby > 0]),
        np.asarray([(mby > 0) and (mbx < nbx - 1)]))
    l64, corner, top64 = (np.asarray(a)[0] for a in got)
    want_l, want_c, want_t = foreign.intra_refs(
        plane, 32 * mbx, 32 * mby, 32, 5, nbx, pw, ph)
    return (l64, corner, top64), (want_l, want_c, want_t)


@pytest.mark.parametrize("mby,mbx", _cases())
def test_build_refs_matches_foreign(mby, mbx):
    nby, nbx = 3, 4
    plane = _plane(32 * nby, 32 * nbx, seed=mby * 7 + mbx)
    (l64, c, t64), (wl, wc, wt) = _both_refs(plane, mby, mbx, nby, nbx)
    np.testing.assert_array_equal(l64, wl, err_msg="left")
    assert c == wc
    np.testing.assert_array_equal(t64, wt, err_msg="top")


def test_filter_refs_matches_foreign():
    plane = _plane(96, 128, seed=3)
    (l64, c, t64), _ = _both_refs(plane, 1, 1, 3, 4)
    fl, fc, ft = (np.asarray(a)[0] for a in intra_rd.filter_refs(
        np.asarray([l64]), np.asarray([c]), np.asarray([t64])))
    wl, wcf, wtf = foreign._filter_refs(l64, int(c), t64, 32, mode=0,
                                        strong_ok=False)
    np.testing.assert_array_equal(fl, wl)
    assert fc == wcf
    np.testing.assert_array_equal(ft, wtf)


@pytest.mark.parametrize("mode", list(range(35)))
def test_pred_modes_match_foreign(mode):
    nby, nbx = 3, 4
    # batch the availability corners as lanes in one call
    plane = _plane(96, 128, seed=11)
    cases = _cases(nby, nbx)
    l32s, t64s, cs, avls, avts, avtrs = [], [], [], [], [], []
    for mby, mbx in cases:
        l32, t64, c = _raw_reads(plane, mby, mbx, nbx)
        l32s.append(l32)
        t64s.append(t64)
        cs.append(c)
        avls.append(mbx > 0)
        avts.append(mby > 0)
        avtrs.append((mby > 0) and (mbx < nbx - 1))
    refs_plain = intra_rd.build_refs(
        np.asarray(l32s), np.asarray(t64s), np.asarray(cs),
        np.asarray(avls), np.asarray(avts), np.asarray(avtrs))
    refs_filt = intra_rd.filter_refs(*refs_plain)
    got = np.asarray(intra_rd.pred_mode(refs_plain, refs_filt, mode))
    for i, (mby, mbx) in enumerate(cases):
        wl, wc, wt = foreign.intra_refs(plane, 32 * mbx, 32 * mby, 32,
                                        5, nbx, 32 * nbx, 32 * nby)
        fl, fc, ft = foreign._filter_refs(wl, wc, wt, 32, mode,
                                          strong_ok=False)
        want = foreign.intra_pred(fl, fc, ft, 32, mode, luma=True)
        np.testing.assert_array_equal(
            got[i], want, err_msg=f"mode {mode} ctu ({mby},{mbx})")


def test_diagonal_maps2_schedule():
    """Slope-2 wavefront: every dependency (left, top, top-left,
    top-right) runs at a strictly earlier step."""
    MBY, MBX, VALID, DMAP, KMAP = intra_rd.diagonal_maps2(5, 7)
    # inverse maps round-trip
    for y in range(5):
        for x in range(7):
            d, k = DMAP[y, x], KMAP[y, x]
            assert VALID[d, k] and MBY[d, k] == y and MBX[d, k] == x
    for y in range(5):
        for x in range(7):
            d = DMAP[y, x]
            for ny, nx in ((y, x - 1), (y - 1, x), (y - 1, x - 1),
                           (y - 1, x + 1)):
                if 0 <= ny < 5 and 0 <= nx < 7:
                    assert DMAP[ny, nx] < d, (y, x, ny, nx)
    # every CTU appears exactly once
    assert VALID.sum() == 5 * 7
