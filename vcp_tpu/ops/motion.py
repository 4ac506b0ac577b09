"""Block motion estimation + motion compensation (device ops).

The per-frame hot path of the P-frame encoder (SURVEY.md §2.5 "block
motion estimation SAD search"). TPU-first shape: the *whole frame's*
macroblocks are evaluated against each candidate offset at once — one
shifted-difference pass per offset, reduced per-MB on the VPU — inside a
``lax.fori_loop`` over the (2R+1)^2 window. HBM traffic per frame is
window² · plane bytes, which at R=8 / 1080p is ~0.6 GB ≈ sub-millisecond
on a v5e; no scalar loops, no dynamic shapes.

Motion compensation is a vectorized gather; chroma applies the spec's
1/8-pel bilinear (8.4.2.2.2) — full-pel luma MVs land on 0 or 1/2 chroma
phase.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2,))
def full_search(cur, ref, search_range: int, lam=4, row0=0):
    """Full-pel exhaustive SAD search over ±search_range, 16x16 MBs.

    cur: (Hb, W) int32 — a full frame, or one horizontal band of it when
    ``row0`` is the band's first row (multi-chip tile sharding; ref is
    then the taller full-frame plane). Hb, W multiples of 16.
    Returns (mv (nMBy, nMBx, 2) int32 [dy, dx], best_cost).
    Cost = SAD + lam * (|dx| + |dy|) — a rate bias toward short vectors.
    """
    hb, w = cur.shape
    n_mby, n_mbx = hb // 16, w // 16
    sr = search_range
    side = 2 * sr + 1
    ref_pad = jnp.pad(ref, sr, mode="edge")
    cur_mb = cur.reshape(n_mby, 16, n_mbx, 16)

    def body(o, carry):
        best_cost, best_o = carry
        dy = o // side - sr
        dx = o % side - sr
        shifted = jax.lax.dynamic_slice(
            ref_pad, (row0 + dy + sr, dx + sr), (hb, w))
        diff = jnp.abs(cur_mb - shifted.reshape(n_mby, 16, n_mbx, 16))
        sad = diff.sum(axis=(1, 3))
        cost = sad + lam * (jnp.abs(dx) + jnp.abs(dy))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, o, best_o))

    init = (jnp.full((n_mby, n_mbx), 2**30, jnp.int32),
            jnp.zeros((n_mby, n_mbx), jnp.int32))
    best_cost, best_o = jax.lax.fori_loop(0, side * side, body, init)
    mv = jnp.stack([best_o // side - sr, best_o % side - sr], axis=-1)
    return mv, best_cost


@functools.partial(jax.jit, static_argnums=(2,))
def full_search_parts(cur, ref, search_range: int, lam=4):
    """Full-pel exhaustive search at EVERY partition granularity in one
    sweep: the per-offset absolute differences reduce once per 8x8
    block, and the 16x16 / 16x8 / 8x16 SADs are sums of those quadrants
    — tracking four argmins costs bookkeeping, not extra searches.
    Powers the x264-medium-style partition decision (quality presets).
    Returns full-pel (mv16 (nMBy, nMBx, 2), mv8 (2nMBy, 2nMBx, 2),
    mv16x8 (2nMBy, nMBx, 2), mv8x16 (nMBy, 2nMBx, 2)).
    """
    h, w = cur.shape
    n_mby, n_mbx = h // 16, w // 16
    nby2, nbx2 = 2 * n_mby, 2 * n_mbx
    sr = search_range
    side = 2 * sr + 1
    ref_pad = jnp.pad(ref, sr, mode="edge")
    cur_b8 = cur.reshape(nby2, 8, nbx2, 8)

    def body(o, carry):
        dy = o // side - sr
        dx = o % side - sr
        shifted = jax.lax.dynamic_slice(ref_pad, (dy + sr, dx + sr), (h, w))
        diff = jnp.abs(cur_b8 - shifted.reshape(nby2, 8, nbx2, 8))
        sad8 = diff.sum(axis=(1, 3))                       # (nby2, nbx2)
        sad16 = sad8.reshape(n_mby, 2, n_mbx, 2).sum(axis=(1, 3))
        sad_h = sad8[:, 0::2] + sad8[:, 1::2]              # 16x8 halves
        sad_v = sad8[0::2, :] + sad8[1::2, :]              # 8x16 halves
        rate = lam * (jnp.abs(dx) + jnp.abs(dy))
        out = []
        for (cost, best_c, best_o) in zip(
                (sad16 + rate, sad8 + rate, sad_h + rate, sad_v + rate),
                carry[0::2], carry[1::2]):
            bet = cost < best_c
            out.append(jnp.where(bet, cost, best_c))
            out.append(jnp.where(bet, o, best_o))
        return tuple(out)

    def init_pair(shape):
        return (jnp.full(shape, 2**30, jnp.int32),
                jnp.zeros(shape, jnp.int32))
    init = (init_pair((n_mby, n_mbx)) + init_pair((nby2, nbx2))
            + init_pair((nby2, n_mbx)) + init_pair((n_mby, nbx2)))
    res = jax.lax.fori_loop(0, side * side, body, init)

    def mv_of(o):
        return jnp.stack([o // side - sr, o % side - sr], axis=-1)
    return (mv_of(res[1]), mv_of(res[3]), mv_of(res[5]), mv_of(res[7]))


# ---------------------------------------------------------------------------
# Hierarchical (two-level) full-pel search
# ---------------------------------------------------------------------------
#
# The exhaustive sweep costs (2R+1)^2 full-plane passes; at the quality
# presets' R=16..24 that is 1k-2.4k passes and dominates the whole encode
# (round-4 profile: ~1.5 s/frame of device time at effort 6). The
# classical pyramid cuts this ~20x: a 4x-downsampled coarse sweep finds
# each MB's neighborhood (a 4x4 coarse block IS one full-res MB), then a
# +-REFINE_R full-pel sweep over per-MB re-centered windows polishes it.
# The re-centering is ONE dense gather; the refine sweep is then plain
# shifted-difference passes over a compact (nMBy*(16+2r), nMBx*(16+2r))
# plane. Not bit-identical to full_search (it is an encoder-side choice,
# not normative); rdbench pins the BD-rate impact.

REFINE_R = 4            # +-4 full-pel refine window around the coarse MV


def _downsample4(a):
    """4x4 box mean (H, W) -> (H/4, W/4), int32 (rounded)."""
    h, w = a.shape
    return (a.reshape(h // 4, 4, w // 4, 4).sum(axis=(1, 3)) + 8) >> 4


def _coarse_search(cur4, ref4, sr4: int, lam):
    """full_search with 4x4 blocks on the quarter-res plane (one block
    per full-res MB). Returns TWO full-res full-pel base candidates per
    MB (x4 scale):

    * per-block argmin — accurate where the 16-px coarse SAD is
      trustworthy (distinct local motion, small objects),
    * 3x3-block context argmin (48x48 full-res support) — robust where
      box decimation aliases the tiny per-block SAD (textures, noise).

    The refine stage sweeps around BOTH and keeps the winner, so each
    failure mode covers the other's."""
    h4, w4 = cur4.shape
    nby, nbx = h4 // 4, w4 // 4
    side = 2 * sr4 + 1
    ref_pad = jnp.pad(ref4, sr4, mode="edge")
    cur_b = cur4.reshape(nby, 4, nbx, 4)

    def body(o, carry):
        bc_blk, bo_blk, bc_ctx, bo_ctx = carry
        dy = o // side - sr4
        dx = o % side - sr4
        shifted = jax.lax.dynamic_slice(
            ref_pad, (dy + sr4, dx + sr4), (h4, w4))
        sad = jnp.abs(cur_b - shifted.reshape(nby, 4, nbx, 4)) \
            .sum(axis=(1, 3))
        rate = jnp.abs(dx) + jnp.abs(dy)
        cost_blk = sad * 16 + lam * 4 * rate
        sp = jnp.pad(sad, 1, mode="edge")
        ctx = sum(sp[dy2:dy2 + nby, dx2:dx2 + nbx]
                  for dy2 in range(3) for dx2 in range(3))
        cost_ctx = ctx * 16 + lam * 4 * 9 * rate
        bb = cost_blk < bc_blk
        bx_ = cost_ctx < bc_ctx
        return (jnp.where(bb, cost_blk, bc_blk), jnp.where(bb, o, bo_blk),
                jnp.where(bx_, cost_ctx, bc_ctx), jnp.where(bx_, o, bo_ctx))

    z = jnp.zeros((nby, nbx), jnp.int32)
    full = jnp.full((nby, nbx), 2**30, jnp.int32)
    _, bo_blk, _, bo_ctx = jax.lax.fori_loop(
        0, side * side, body, (full, z, full, z))

    def mv_of(o):
        return jnp.stack([o // side - sr4, o % side - sr4], axis=-1) * 4

    return mv_of(bo_blk), mv_of(bo_ctx)


def _rebase_windows(ref, mv_base, sr: int, r: int):
    """Per-MB (16+2r)^2 reference windows centered at each MB's base MV
    as one dense plane (nMBy*(16+2r), nMBx*(16+2r)).

    The bases come from the 4x-downsampled coarse sweep, so they are
    multiples of 4 within +-(sr - r): the windows assemble from ~11
    masked shift-selects per axis (dense VPU work) instead of a generic
    2-D gather, which lowers to scalar loads on TPU (~77 ms at 1080p —
    profiled as the hierarchical-ME wall, round 5). Falls back to the
    gather when the clip bound isn't 4-aligned."""
    nby, nbx = mv_base.shape[:2]
    pad = sr + r
    ws = 16 + 2 * r
    lim = sr - r
    if lim % 4:
        ref_pad = jnp.pad(ref, pad, mode="edge")
        i = jnp.arange(nby * ws)
        j = jnp.arange(nbx * ws)
        by = i // ws
        bx = j // ws
        rows = (by * 16 + (i % ws))[:, None] \
            + mv_base[:, :, 0][by][:, bx] + (pad - r)
        cols = (bx * 16 + (j % ws))[None, :] \
            + mv_base[:, :, 1][by][:, bx] + (pad - r)
        return ref_pad[rows, cols]

    # extra right padding so the +dx band slice below never overruns
    ref_pad = jnp.pad(ref, ((pad, pad), (pad, pad + 16)), mode="edge")
    wp = ref_pad.shape[1]
    band_rows = ws + 2 * lim
    # per-MB-row bands covering every vertical base (static slices)
    band = jnp.stack([
        jax.lax.dynamic_slice(ref_pad, (16 * by + pad - r - lim, 0),
                              (band_rows, wp))
        for by in range(nby)])                 # (nby, band_rows, wp)

    dx_base = mv_base[..., 1]                  # (nby, nbx), multiples of 4
    dy_base = mv_base[..., 0]
    csel = jnp.zeros((nby, band_rows, nbx, ws), ref.dtype)
    for dx in range(-lim, lim + 1, 4):
        start = pad - r + dx
        a = band[:, :, start:start + 16 * nbx] \
            .reshape(nby, band_rows, nbx, 16)
        b = band[:, :, start + 16:start + 16 + 16 * nbx] \
            .reshape(nby, band_rows, nbx, 16)[..., :ws - 16]
        w_dx = jnp.concatenate([a, b], axis=-1)
        csel = jnp.where((dx_base == dx)[:, None, :, None], w_dx, csel)

    out = jnp.zeros((nby, ws, nbx, ws), ref.dtype)
    for dy in range(-lim, lim + 1, 4):
        sl = csel[:, dy + lim:dy + lim + ws]
        out = jnp.where((dy_base == dy)[:, None, :, None], sl, out)
    return out.reshape(nby * ws, nbx * ws)


def _refine_sweep(cur, windows, mv_base, lam, r: int, track_parts: bool):
    """+-r full-pel sweep over the rebased windows. With track_parts,
    also tracks 8x8 / 16x8 / 8x16 argmins (full_search_parts analogue).
    Returns mv16 or (mv16, mv8, mv16x8, mv8x16), full-pel."""
    h, w = cur.shape
    nby, nbx = h // 16, w // 16
    ws = 16 + 2 * r
    side = 2 * r + 1
    cur_mb = cur.reshape(nby, 16, nbx, 16)
    win4 = windows.reshape(nby, ws, nbx, ws)

    def sads_of(o):
        """(sad8 (2nby, 2nbx), per-MB rate) at refine offset o."""
        dy = o // side
        dx = o % side
        sh = jax.lax.dynamic_slice(
            win4, (0, dy, 0, dx), (nby, 16, nbx, 16))
        diff = jnp.abs(cur_mb - sh)
        sad8 = diff.reshape(nby, 2, 8, nbx, 2, 8).sum(axis=(2, 5)) \
            .reshape(2 * nby, 2 * nbx)
        mvy = mv_base[..., 0] + dy - r
        mvx = mv_base[..., 1] + dx - r
        rate = lam * (jnp.abs(mvx) + jnp.abs(mvy))
        return sad8, rate

    def mv_of(o, base=None):
        b = mv_base if base is None else base
        return b + jnp.stack([o // side - r, o % side - r], axis=-1)

    if not track_parts:
        def body16(o, carry):
            best_cost, best_o = carry
            sad8, rate = sads_of(o)
            sad16 = sad8.reshape(nby, 2, nbx, 2).sum(axis=(1, 3))
            cost = sad16 + rate
            better = cost < best_cost
            return (jnp.where(better, cost, best_cost),
                    jnp.where(better, o, best_o))

        init = (jnp.full((nby, nbx), 2**30, jnp.int32),
                jnp.zeros((nby, nbx), jnp.int32))
        best_cost, best_o = jax.lax.fori_loop(0, side * side, body16, init)
        return mv_of(best_o), best_cost

    def body_parts(o, carry):
        sad8, rate = sads_of(o)
        s4 = sad8.reshape(nby, 2, nbx, 2)
        sad16 = s4.sum(axis=(1, 3))
        sad_h = sad8[:, 0::2] + sad8[:, 1::2]       # (2nby, nbx) 16x8
        sad_v = sad8[0::2, :] + sad8[1::2, :]       # (nby, 2nbx) 8x16
        costs = (sad16 + rate,
                 sad8 + jnp.repeat(jnp.repeat(rate, 2, 0), 2, 1),
                 sad_h + jnp.repeat(rate, 2, 0),
                 sad_v + jnp.repeat(rate, 2, 1))
        out = []
        for cost, best_c, best_o in zip(costs, carry[0::2], carry[1::2]):
            bet = cost < best_c
            out.append(jnp.where(bet, cost, best_c))
            out.append(jnp.where(bet, o, best_o))
        return tuple(out)

    def init_pair(shape):
        return (jnp.full(shape, 2**30, jnp.int32),
                jnp.zeros(shape, jnp.int32))

    init = (init_pair((nby, nbx)) + init_pair((2 * nby, 2 * nbx))
            + init_pair((2 * nby, nbx)) + init_pair((nby, 2 * nbx)))
    res = jax.lax.fori_loop(0, side * side, body_parts, init)

    def base_rep(ry, rx):
        return jnp.repeat(jnp.repeat(mv_base, ry, 0), rx, 1)

    return ((mv_of(res[1]), mv_of(res[3], base_rep(2, 2)),
             mv_of(res[5], base_rep(2, 1)), mv_of(res[7], base_rep(1, 2))),
            (res[0], res[2], res[4], res[6]))


def _zero_sad(cur, ref, gran):
    """Per-block SAD of the zero vector at granularity 16/8/h/v."""
    h, w = cur.shape
    nby, nbx = h // 16, w // 16
    d = jnp.abs(cur - ref)
    sad8 = d.reshape(2 * nby, 8, 2 * nbx, 8).sum(axis=(1, 3))
    if gran == 8:
        return sad8
    if gran == 16:
        return sad8.reshape(nby, 2, nbx, 2).sum(axis=(1, 3))
    if gran == "h":
        return sad8[:, 0::2] + sad8[:, 1::2]
    return sad8[0::2, :] + sad8[1::2, :]


def _coarse_bases(cur, ref, sr: int, lam):
    """Both coarse candidates, clamped so base + refine never leaves the
    +-sr window (downstream sub-pel margins are sized for sr)."""
    sr4 = max(1, -(-sr // 4))
    b_blk, b_ctx = _coarse_search(_downsample4(cur), _downsample4(ref),
                                  sr4, lam)
    lim = sr - REFINE_R
    return jnp.clip(b_blk, -lim, lim), jnp.clip(b_ctx, -lim, lim)


@functools.partial(jax.jit, static_argnums=(2,))
def hier_search(cur, ref, search_range: int, lam=4):
    """Two-level pyramid full-pel search (quality presets, R >= 12).
    Same MV output convention as full_search. Refines around both coarse
    candidates (per-block + context vote) and keeps the per-MB winner;
    a zero-vector candidate guards content where the whole coarse level
    decorrelates (noise): the winner must beat SAD(0,0) or the MV is 0."""
    sr = search_range
    b_blk, b_ctx = _coarse_bases(cur, ref, sr, lam)
    mv, cost = _refine_sweep(
        cur, _rebase_windows(ref, b_blk, sr, REFINE_R), b_blk, lam,
        REFINE_R, False)
    mv2, cost2 = _refine_sweep(
        cur, _rebase_windows(ref, b_ctx, sr, REFINE_R), b_ctx, lam,
        REFINE_R, False)
    take2 = cost2 < cost
    mv = jnp.where(take2[..., None], mv2, mv)
    cost = jnp.minimum(cost, cost2)
    zero_better = _zero_sad(cur, ref, 16) <= cost
    return jnp.where(zero_better[..., None], 0, mv)


@functools.partial(jax.jit, static_argnums=(2,))
def hier_search_parts(cur, ref, search_range: int, lam=4):
    """Pyramid counterpart of full_search_parts: one coarse 16x16 sweep,
    dual +-r refines (both coarse candidates) tracking all partition
    granularities, each granularity with its own per-block winner and
    zero-vector fallback."""
    sr = search_range
    b_blk, b_ctx = _coarse_bases(cur, ref, sr, lam)
    mvs, costs = _refine_sweep(
        cur, _rebase_windows(ref, b_blk, sr, REFINE_R), b_blk, lam,
        REFINE_R, True)
    mvs2, costs2 = _refine_sweep(
        cur, _rebase_windows(ref, b_ctx, sr, REFINE_R), b_ctx, lam,
        REFINE_R, True)
    out = []
    for mv, cost, mv2, cost2, gran in zip(mvs, costs, mvs2, costs2,
                                          (16, 8, "h", "v")):
        take2 = cost2 < cost
        mv = jnp.where(take2[..., None], mv2, mv)
        cost = jnp.minimum(cost, cost2)
        zb = _zero_sad(cur, ref, gran) <= cost
        out.append(jnp.where(zb[..., None], 0, mv))
    return tuple(out)


@functools.partial(jax.jit, static_argnums=(2,))
def mc_luma(ref, mv, search_range: int, row0=0):
    """Full-pel luma MC: gather each MB's 16x16 block at its MV.

    ref: (H, W) int32; mv: (nMBy, nMBx, 2) [dy, dx] full-pel covering a
    band starting at frame row ``row0`` (0 = whole frame).
    """
    w = ref.shape[1]
    hb = 16 * mv.shape[0]
    sr = search_range
    ref_pad = jnp.pad(ref, sr, mode="edge")
    dy = jnp.repeat(jnp.repeat(mv[..., 0], 16, axis=0), 16, axis=1)
    dx = jnp.repeat(jnp.repeat(mv[..., 1], 16, axis=0), 16, axis=1)
    rows = jnp.arange(hb)[:, None] + row0 + dy + sr
    cols = jnp.arange(w)[None, :] + dx + sr
    return ref_pad[rows, cols]


# ---------------------------------------------------------------------------
# Sub-pel interpolation (spec 8.4.2.2.1: 6-tap half-pel + quarter averages)
# ---------------------------------------------------------------------------

def _tap6_x(a):
    """6-tap (1,-5,20,20,-5,1) along x; result at x is the half sample
    between x and x+1. Input must carry >=3 columns of margin."""
    return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
            + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])


def _tap6_y(a):
    return (a[0:-5, :] - 5 * a[1:-4, :] + 20 * a[2:-3, :]
            + 20 * a[3:-2, :] - 5 * a[4:-1, :] + a[5:, :])


def half_planes(ref_pad):
    """Compute the three half-pel planes of an (edge-padded) int32 plane.

    Returns (G, b, h, j), each cropped by 3 pixels on every side relative
    to ref_pad (callers account for the margin). Edge replication in
    ref_pad reproduces the spec's coordinate clamping exactly.
    """
    a = ref_pad.astype(jnp.int32)
    b1 = _tap6_x(a)                           # (Hp, Wp-5)
    h1 = _tap6_y(a)                           # (Hp-5, Wp)
    j1 = _tap6_y(b1)                          # (Hp-5, Wp-5)
    b = jnp.clip((b1 + 16) >> 5, 0, 255)
    h = jnp.clip((h1 + 16) >> 5, 0, 255)
    j = jnp.clip((j1 + 512) >> 10, 0, 255)
    # Align all planes on one origin: sample (y, x) of every plane refers
    # to integer position (y, x) of g = ref_pad[3:-3, 3:-3]; b is the
    # half sample to its right, h below, j diagonal. b1[:, k] sits between
    # ref_pad columns k+2 / k+3, so column x+1 of b1 is "right of x+3".
    g = a[3:-3, 3:-3]
    b = b[3:-3, 1:]
    h = h[1:, 3:-3]
    j = j[1:, 1:]
    return g, b, h, j


# quarter-pel case table: case = fy*4+fx → (plane1, dy1, dx1, plane2, ...)
# planes: 0=G (integer), 1=b (half-x), 2=h (half-y), 3=j (half-xy)
_QPEL_TABLE = np.array([
    # fy=0
    (0, 0, 0, 0, 0, 0), (0, 0, 0, 1, 0, 0), (1, 0, 0, 1, 0, 0),
    (1, 0, 0, 0, 0, 1),
    # fy=1
    (0, 0, 0, 2, 0, 0), (1, 0, 0, 2, 0, 0), (1, 0, 0, 3, 0, 0),
    (1, 0, 0, 2, 0, 1),
    # fy=2
    (2, 0, 0, 2, 0, 0), (2, 0, 0, 3, 0, 0), (3, 0, 0, 3, 0, 0),
    (3, 0, 0, 2, 0, 1),
    # fy=3
    (0, 1, 0, 2, 0, 0), (2, 0, 0, 1, 1, 0), (3, 0, 0, 1, 1, 0),
    (2, 0, 1, 1, 1, 0),
], dtype=np.int32)


# The distinct (plane, dy, dx) sample sources the 16 quarter-pel cases use.
# p1 draws from the first 6, p2 from all 7 (indices into _QPEL_SOURCES).
_QPEL_SOURCES = (
    (0, 0, 0),   # G(0,0)
    (0, 1, 0),   # G(1,0)
    (0, 0, 1),   # G(0,1)
    (1, 0, 0),   # b(0,0)
    (1, 1, 0),   # b(1,0)
    (2, 0, 0),   # h(0,0)
    (2, 0, 1),   # h(0,1)
    (3, 0, 0),   # j(0,0)
)
_SRC_INDEX = {src: i for i, src in enumerate(_QPEL_SOURCES)}
_QPEL_P1 = np.array([_SRC_INDEX[tuple(r[:3])] for r in _QPEL_TABLE],
                    np.int32)
_QPEL_P2 = np.array([_SRC_INDEX[tuple(r[3:])] for r in _QPEL_TABLE],
                    np.int32)


def mc_luma_q(planes, mvq, margin: int, row0=0, bs=16):
    """Quarter-pel luma MC from precomputed half-pel planes.

    planes: (4, Hp, Wp) stacked [G, b, h, j], aligned so that index
    (margin + y, margin + x) is integer position (y, x) of the frame.
    mvq: (nBy, nBx, 2) [dy, dx] in QUARTER-pel units, one vector per
    ``bs`` x ``bs`` block (bs=16 whole MBs, bs=8 P_8x8 partitions),
    covering a band starting at frame row ``row0`` (0 = whole frame).

    TPU shape: one dense 2D gather per distinct sample source (8 total)
    plus per-pixel where-chains — a per-pixel plane-index gather lowers to
    a catastrophically slow generic gather on TPU.
    """
    bh, bw = _bs2(bs)
    n_mby, n_mbx = mvq.shape[:2]
    h, w = bh * n_mby, bw * n_mbx
    iy = jnp.repeat(jnp.repeat(mvq[..., 0] >> 2, bh, 0), bw, 1)
    ix = jnp.repeat(jnp.repeat(mvq[..., 1] >> 2, bh, 0), bw, 1)
    fy = jnp.repeat(jnp.repeat(mvq[..., 0] & 3, bh, 0), bw, 1)
    fx = jnp.repeat(jnp.repeat(mvq[..., 1] & 3, bh, 0), bw, 1)
    case = fy * 4 + fx
    rows = jnp.arange(h)[:, None] + row0 + iy + margin
    cols = jnp.arange(w)[None, :] + ix + margin

    srcs = [planes[p][rows + dy, cols + dx] for p, dy, dx in _QPEL_SOURCES]

    def pick(src_ids):
        ids = jnp.asarray(src_ids)[case]          # (h, w) in 0..7
        out = srcs[0]
        for k in range(1, len(srcs)):
            out = jnp.where(ids == k, srcs[k], out)
        return out

    p1 = pick(_QPEL_P1)
    p2 = pick(_QPEL_P2)
    return (p1 + p2 + 1) >> 1


def mc_chroma_q(ref_c, mvq_luma, margin: int, row0c=0, bs: int = 16):
    """Chroma MC for quarter-pel luma MVs: chroma vector in 1/8 units
    equals the quarter-luma value (spec 8.4.1.4); full 1/8 bilinear.
    ``row0c`` is the band's first CHROMA row (0 = whole frame); ``bs``
    the LUMA block size the MV grid covers (chroma blocks are bs//2)."""
    cs = bs // 2
    hc, wc = cs * mvq_luma.shape[0], cs * mvq_luma.shape[1]
    ref_pad = jnp.pad(ref_c, ((margin, margin + 1), (margin, margin + 1)),
                      mode="edge")
    dy_i = jnp.repeat(jnp.repeat(mvq_luma[..., 0] >> 3, cs, 0), cs, 1)
    dx_i = jnp.repeat(jnp.repeat(mvq_luma[..., 1] >> 3, cs, 0), cs, 1)
    fy = jnp.repeat(jnp.repeat(mvq_luma[..., 0] & 7, cs, 0), cs, 1)
    fx = jnp.repeat(jnp.repeat(mvq_luma[..., 1] & 7, cs, 0), cs, 1)
    rows = jnp.arange(hc)[:, None] + row0c + dy_i + margin
    cols = jnp.arange(wc)[None, :] + dx_i + margin
    a = ref_pad[rows, cols]
    b = ref_pad[rows, cols + 1]
    c = ref_pad[rows + 1, cols]
    d = ref_pad[rows + 1, cols + 1]
    num = ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
           + (8 - fx) * fy * c + fx * fy * d + 32)
    return num >> 6


def mc_chroma_q_pair(ref_u, ref_v, mvq_luma, margin: int, row0c=0,
                     bs: int = 16):
    """Both chroma planes' 1/8-pel MC via shift-and-select accumulation.

    Numerically identical to ``mc_chroma_q`` (asserted by tests) but
    TPU-shaped: per-MB MVs make the generic gather formulation lower to
    scalar loads (~30 ms/plane @1080p on v5e); instead we loop over the
    (2·margin+2)² possible integer offsets with ``dynamic_slice`` +
    per-MB masks — dense VPU selects, ~10x faster. The four bilinear taps
    A/B/C/D of offset (dy, dx) are served by the slices at (dy, dx),
    (dy, dx+1), (dy+1, dx), (dy+1, dx+1), so one slice per iteration
    feeds all four accumulators. ``bs`` is the LUMA block size of the MV
    grid (chroma bands are bs//2 rows).
    """
    cs = bs // 2
    n_mby, n_mbx = mvq_luma.shape[:2]
    hc, wc = cs * n_mby, cs * n_mbx
    m = margin
    stack = jnp.stack([ref_u, ref_v]).astype(jnp.int32)
    ref_pad = jnp.pad(stack, ((0, 0), (m, m + 1), (m, m + 1)), mode="edge")

    dy_map = mvq_luma[..., 0] >> 3            # (mby, mbx) integer offsets
    dx_map = mvq_luma[..., 1] >> 3
    fy = jnp.repeat(jnp.repeat(mvq_luma[..., 0] & 7, cs, 0), cs, 1)
    fx = jnp.repeat(jnp.repeat(mvq_luma[..., 1] & 7, cs, 0), cs, 1)

    # The 2-D offset select is SEPARATED per axis: overlapping MB-row
    # bands make the vertical offset constant along each band, then a
    # column pass selects each output column's horizontal shift and a
    # row pass its vertical shift — 2·(2m+2) masked slice-selects
    # instead of (2m+2)² (≈4 ms/frame saved at 1080p, m=6). Pass order
    # matters: within a band both masks depend only on the OUTPUT
    # column, which the passes preserve. C0/C1 carry the dx / dx+1
    # columns; the row pass derives all four bilinear taps from them.
    rows_per = cs + 2 * m + 1
    wpad = ref_pad.shape[2]
    band = jnp.stack(
        [jax.lax.dynamic_slice(ref_pad, (0, row0c + cs * r, 0),
                               (2, rows_per, wpad))
         for r in range(n_mby)], axis=1)      # (2, nMBy, rows_per, wpad)

    dx_cols = jnp.repeat(dx_map, cs, axis=1)[None, :, None, :]
    dy_cols = jnp.repeat(dy_map, cs, axis=1)[None, :, None, :]

    z = jnp.zeros((2, n_mby, rows_per, wc), jnp.int32)
    c0, c1 = z, z
    for dx in range(-m, m + 2):
        w = band[:, :, :, dx + m: dx + m + wc]
        c0 = jnp.where(dx_cols == dx, w, c0)
        c1 = jnp.where(dx_cols == dx - 1, w, c1)

    z8 = jnp.zeros((2, n_mby, cs, wc), jnp.int32)
    a, bt, c, d = z8, z8, z8, z8
    for dy in range(-m, m + 2):
        w0 = c0[:, :, dy + m: dy + m + cs, :]
        w1 = c1[:, :, dy + m: dy + m + cs, :]
        a = jnp.where(dy_cols == dy, w0, a)
        bt = jnp.where(dy_cols == dy, w1, bt)
        c = jnp.where(dy_cols == dy - 1, w0, c)
        d = jnp.where(dy_cols == dy - 1, w1, d)

    a, bt, c, d = (t.reshape(2, hc, wc) for t in (a, bt, c, d))
    num = ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * bt
           + (8 - fx) * fy * c + fx * fy * d + 32)
    pred = num >> 6
    return pred[0], pred[1]


def _bs2(bs):
    """Block size spec -> (bh, bw): int = square, tuple = rectangular
    (16x8 / 8x16 partitions)."""
    return (bs, bs) if isinstance(bs, int) else bs


def _mb_sad(cur_mb, pred, n_mby, n_mbx, bs=16):
    bh, bw = _bs2(bs)
    return jnp.abs(cur_mb - pred.reshape(n_mby, bh, n_mbx, bw)
                   ).sum(axis=(1, 3))


def refine_half(cur, planes, mv_full, lam, margin: int, row0=0,
                bs=16):
    """Half-pel refinement with single-plane gathers.

    Every half-step candidate delta shares one fractional phase across
    all MBs (mv_full*4 has phase 0), so its prediction is ONE gather from
    ONE interpolated plane — ~10x cheaper on TPU than the general
    16-case MC, which needs 8 gathers plus per-pixel selects.
    Returns mvq in quarter-pel units (phases 0/2). ``bs`` is the block
    size the MV grid covers (16 = MBs, 8 = P_8x8 partitions).
    """
    bh, bw = _bs2(bs)
    n_mby, n_mbx = mv_full.shape[:2]
    h, w = cur.shape
    cur_mb = cur.reshape(n_mby, bh, n_mbx, bw)
    rows = jnp.arange(h)[:, None] + row0
    cols = jnp.arange(w)[None, :]
    dy_f = jnp.repeat(jnp.repeat(mv_full[..., 0], bh, 0), bw, 1)
    dx_f = jnp.repeat(jnp.repeat(mv_full[..., 1], bh, 0), bw, 1)

    base = mv_full * 4
    mvq = base
    best = jnp.full((n_mby, n_mbx), 2**30, jnp.int32)
    # candidate deltas in quarter units around the FIXED full-pel base
    # (the gathers below index from mv_full, so candidates must too);
    # plane index from the half phase
    for dy in (-2, 0, 2):
        for dx in (-2, 0, 2):
            p = (2 if dy else 0) + (1 if dx else 0)   # 0=G 1=b 2=h 3=j
            iy = -1 if dy < 0 else 0
            ix = -1 if dx < 0 else 0
            pred = planes[p][rows + dy_f + iy + margin,
                             cols + dx_f + ix + margin]
            cand = base + jnp.asarray([dy, dx], jnp.int32)
            cost = _mb_sad(cur_mb, pred, n_mby, n_mbx, bs) + lam * (
                (jnp.abs(cand[..., 0]) + jnp.abs(cand[..., 1])) >> 1)
            better = (cost < best)[..., None]
            mvq = jnp.where(better, cand, mvq)
            best = jnp.minimum(cost, best)
    return mvq


def refine_quarter(cur, planes, mvq, lam, margin: int, row0=0,
                   bs=16):
    """Quarter-pel refinement around a half-pel result (general MC per
    candidate — expensive; reserved for high-effort presets)."""
    bh, bw = _bs2(bs)
    n_mby, n_mbx = mvq.shape[:2]
    cur_mb = cur.reshape(n_mby, bh, n_mbx, bw)

    def cost_of(m):
        pred = mc_luma_q(planes, m, margin, row0, bs)
        sad = _mb_sad(cur_mb, pred, n_mby, n_mbx, bs)
        return sad + lam * ((jnp.abs(m[..., 0]) + jnp.abs(m[..., 1])) >> 1)

    best = cost_of(mvq)
    for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1),
                   (0, 1), (1, -1), (1, 0), (1, 1)):
        cand = mvq + jnp.asarray([dy, dx], jnp.int32)
        c = cost_of(cand)
        better = (c < best)[..., None]
        mvq = jnp.where(better, cand, mvq)
        best = jnp.minimum(c, best)
    return mvq


def refine_subpel(cur, planes, mv_full, lam, margin: int, quarter=False,
                  row0=0, bs=16):
    """Full-pel MVs → sub-pel: half-pel always (cheap single-plane
    gathers), quarter-pel optionally on top."""
    mvq = refine_half(cur, planes, mv_full, lam, margin, row0, bs)
    if quarter:
        mvq = refine_quarter(cur, planes, mvq, lam, margin, row0, bs)
    return mvq


def aligned_windows(planes, mv_full, margin: int, row0=0, bs=16, e=1):
    """ONE batched gather of per-block aligned interpolation windows.

    W[p, by, y, bx, x] = planes[p] at integer position
    (row0 + bh*by + y - e + mv_full[by,bx,0], bw*bx + x - e +
    mv_full[by,bx,1]) — i.e. every block's (bh+2e)x(bw+2e) neighborhood
    of all four half-pel planes, aligned at its own full-pel vector.

    Why: each dense 2-D gather at 1080p costs ~30 ms on tunneled v5e
    (generic gather lowers to scalar loads), and the half-pel refine +
    MC chain of the quality presets issues 13 of them PER GEOMETRY
    (52/frame with partitions — profiled as the effort-6 wall, round 5).
    After this single gather, every refine candidate and the final MC
    are static slices / per-block selects of W — pure VPU work.
    """
    bh, bw = _bs2(bs)
    n_mby, n_mbx = mv_full.shape[:2]
    rows = (row0 + bh * jnp.arange(n_mby)[:, None, None, None]
            + (jnp.arange(bh + 2 * e) - e)[None, :, None, None]
            + mv_full[:, None, :, None, 0] + margin)
    cols = (bw * jnp.arange(n_mbx)[None, None, :, None]
            + (jnp.arange(bw + 2 * e) - e)[None, None, None, :]
            + mv_full[:, None, :, None, 1] + margin)
    return planes[:, rows, cols]    # (4, n_mby, bh+2e, n_mbx, bw+2e)


def refine_half_mc(cur, planes, mv_full, lam, margin: int, row0=0, bs=16):
    """Fused half-pel refinement + MC: returns (mvq, pred) with mvq
    bit-identical to refine_half and pred to mc_luma_h(planes, mvq) —
    but from ONE aligned-window gather instead of 13 full-frame gathers
    (see aligned_windows). The winning candidate's prediction is
    accumulated alongside the cost argmin, so no second MC pass."""
    bh, bw = _bs2(bs)
    n_mby, n_mbx = mv_full.shape[:2]
    W = aligned_windows(planes, mv_full, margin, row0, bs, e=1)
    cur_b = cur.reshape(n_mby, bh, n_mbx, bw)
    base = mv_full * 4
    mvq = base
    best = jnp.full((n_mby, n_mbx), 2**30, jnp.int32)
    pred = jnp.zeros_like(cur_b)
    for dy in (-2, 0, 2):
        for dx in (-2, 0, 2):
            p = (2 if dy else 0) + (1 if dx else 0)   # 0=G 1=b 2=h 3=j
            iy = 1 + (-1 if dy < 0 else 0)            # e + int offset
            ix = 1 + (-1 if dx < 0 else 0)
            pr = W[p, :, iy:iy + bh, :, ix:ix + bw]
            cand = base + jnp.asarray([dy, dx], jnp.int32)
            cost = jnp.abs(cur_b - pr).sum(axis=(1, 3)) + lam * (
                (jnp.abs(cand[..., 0]) + jnp.abs(cand[..., 1])) >> 1)
            better = cost < best
            mvq = jnp.where(better[..., None], cand, mvq)
            pred = jnp.where(better[:, None, :, None], pr, pred)
            best = jnp.minimum(cost, best)
    h, w = cur.shape
    return mvq, pred.reshape(h, w)


def mc_luma_uniform(planes, g, margin: int, row0: int, h: int, w: int):
    """Luma MC for ONE frame-uniform quarter-pel vector ``g`` (2,) with
    half-pel phases (g & 1 == 0): four dynamic slices + a scalar plane
    select — replaces a full-frame gather for the B path's dominant-MV
    candidates. Bit-identical to mc_luma_h with a broadcast grid."""
    iy = (g[0] >> 2) + margin + row0
    ix = (g[1] >> 2) + margin
    hy = (g[0] >> 1) & 1
    hx = (g[1] >> 1) & 1
    sl = [jax.lax.dynamic_slice(planes[p], (iy, ix), (h, w))
          for p in range(4)]
    top = jnp.where(hx == 1, sl[1], sl[0])
    bot = jnp.where(hx == 1, sl[3], sl[2])
    return jnp.where(hy == 1, bot, top)


def mc_luma_h(planes, mvq, margin: int, row0=0, bs=16):
    """Half-pel-only luma MC: mvq phases are in {0, 2}² (the refine_half
    output), so each pixel needs exactly one of the four planes — 4
    gathers + a 2-bit select instead of mc_luma_q's 8 gathers."""
    bh, bw = _bs2(bs)
    n_mby, n_mbx = mvq.shape[:2]
    h, w = bh * n_mby, bw * n_mbx
    iy = jnp.repeat(jnp.repeat(mvq[..., 0] >> 2, bh, 0), bw, 1)
    ix = jnp.repeat(jnp.repeat(mvq[..., 1] >> 2, bh, 0), bw, 1)
    hy = jnp.repeat(jnp.repeat((mvq[..., 0] >> 1) & 1, bh, 0), bw, 1)
    hx = jnp.repeat(jnp.repeat((mvq[..., 1] >> 1) & 1, bh, 0), bw, 1)
    rows = jnp.arange(h)[:, None] + row0 + iy + margin
    cols = jnp.arange(w)[None, :] + ix + margin
    g = planes[0][rows, cols]
    b = planes[1][rows, cols]
    hh = planes[2][rows, cols]
    j = planes[3][rows, cols]
    top = jnp.where(hx == 1, b, g)
    bot = jnp.where(hx == 1, j, hh)
    return jnp.where(hy == 1, bot, top)


@functools.partial(jax.jit, static_argnums=(2,))
def mc_chroma(ref_c, mv_luma, search_range: int):
    """Chroma MC for full-pel luma MVs (spec 8.4.2.2.2).

    ref_c: (Hc, Wc) int32 chroma plane; mv_luma full-pel per MB.
    Chroma vector in 1/8 units equals 4*mv_luma; integer part mv>>1,
    fraction 4*(mv&1) → bilinear with weights {0,4}.
    """
    hc, wc = ref_c.shape
    sr = search_range // 2 + 1
    ref_pad = jnp.pad(ref_c, (
        (sr, sr + 1), (sr, sr + 1)), mode="edge")
    # per-chroma-pixel MB fields (8x8 chroma pixels per MB)
    dy_i = jnp.repeat(jnp.repeat(mv_luma[..., 0] >> 1, 8, axis=0), 8, axis=1)
    dx_i = jnp.repeat(jnp.repeat(mv_luma[..., 1] >> 1, 8, axis=0), 8, axis=1)
    fy = jnp.repeat(jnp.repeat((mv_luma[..., 0] & 1) * 4, 8, axis=0), 8, axis=1)
    fx = jnp.repeat(jnp.repeat((mv_luma[..., 1] & 1) * 4, 8, axis=0), 8, axis=1)
    rows = jnp.arange(hc)[:, None] + dy_i + sr
    cols = jnp.arange(wc)[None, :] + dx_i + sr
    a = ref_pad[rows, cols]
    b = ref_pad[rows, cols + 1]
    c = ref_pad[rows + 1, cols]
    d = ref_pad[rows + 1, cols + 1]
    num = ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
           + (8 - fx) * fy * c + fx * fy * d + 32)
    return num >> 6
