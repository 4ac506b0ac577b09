"""H.264 in-loop deblocking filter (spec 8.7) as device ops.

One jnp implementation serves both sides: the encoder applies it inside
the jitted GOP step (the filtered picture is the next frame's reference),
and the validation decoder calls the same functions eagerly on CPU — so
closed-loop bit-exactness is structural.

Parallelization: H.264's filter order is normatively SEQUENTIAL across
macroblocks (per-MB raster, vertical then horizontal edges, each edge
reading previously filtered samples — spec 8.7; HEVC relaxed this, not
H.264). deblock_frame realizes the exact order as a skewed-diagonal
wavefront over d = mbx + 2*mby: MBs on one diagonal have disjoint
neighbor sets, so each step is dense vector work. Three bit-identical
engines: an XLA fori_loop, a Pallas TPU kernel (deblock_pallas, default
on TPU, VCP_PALLAS_DEBLOCK=0 opts out), and a pure-NumPy twin for the
host validation decoder (deblock_frame_host). Conformance asserted
against the system-ffmpeg decoder (tests/test_conformance.py).

Boundary strengths: bS=4 on intra MB edges, 3 on intra internal edges,
2 where either adjacent 4x4 block has residual, 1 on >=1-pel MV
difference, else 0. PCM macroblocks participate with QP 0.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Table 8-16: alpha / beta per index 0..51.
ALPHA = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113,
    127, 144, 162, 182, 203, 226, 255, 255], dtype=np.int32)

BETA = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14,
    15, 15, 16, 16, 17, 17, 18, 18], dtype=np.int32)

# Table 8-17: tc0 per (bS-1, index). Round-2 conformance fix: the bS=2
# and bS=3 rows of the round-1 transcription were shifted by one/four
# index positions; the system-ffmpeg oracle (tests/test_conformance.py)
# caught the divergence and these now match the spec exactly.
TC0 = np.array([
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
     2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
     2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3,
     4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 23, 25],
], dtype=np.int32)


def _clip1(x, xp=jnp):
    return xp.clip(x, 0, 255)


def filter_core_luma(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta,
                     tc0, xp=jnp, strong: bool = True):
    """Elementwise luma edge filter (spec 8.7.2.3-4), shape-polymorphic.

    All inputs same-shape int32 (bs/alpha/beta/tc0 pre-looked-up per
    sample). Returns (out_p2, out_p1, out_p0, out_q0, out_q1, out_q2).
    Shared by the XLA edge loop below and the Pallas edge-scan kernel
    (ops.deblock_pallas). ``strong=False`` statically drops the bS==4
    path (~40% of the op count): bit-identical whenever no bS is 4,
    which holds for any all-inter frame — intra MB edges are the only
    source of bS 4 (spec 8.7.2.1)."""
    filt = ((bs > 0)
            & (xp.abs(p0 - q0) < alpha)
            & (xp.abs(p1 - p0) < beta)
            & (xp.abs(q1 - q0) < beta))
    ap = xp.abs(p2 - p0) < beta
    aq = xp.abs(q2 - q0) < beta

    # --- normal filter (bS 1..3)
    tc = tc0 + ap.astype(xp.int32) + aq.astype(xp.int32)
    delta = xp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip1(p0 + delta, xp)
    nq0 = _clip1(q0 - delta, xp)
    dp1 = xp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    dq1 = xp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    np1 = xp.where(ap, p1 + dp1, p1)
    nq1 = xp.where(aq, q1 + dq1, q1)

    if not strong:
        return (p2,
                xp.where(filt, np1, p1),
                xp.where(filt, np0, p0),
                xp.where(filt, nq0, q0),
                xp.where(filt, nq1, q1),
                q2)

    # --- strong filter (bS == 4)
    strong_cond = xp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp0 = xp.where(ap & strong_cond,
                    (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = xp.where(ap & strong_cond, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = xp.where(ap & strong_cond,
                    (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = xp.where(aq & strong_cond,
                    (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = xp.where(aq & strong_cond, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = xp.where(aq & strong_cond,
                    (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    out_p2 = xp.where(filt & is4, sp2, p2)
    out_p1 = xp.where(filt, xp.where(is4, sp1, np1), p1)
    out_p0 = xp.where(filt, xp.where(is4, sp0, np0), p0)
    out_q0 = xp.where(filt, xp.where(is4, sq0, nq0), q0)
    out_q1 = xp.where(filt, xp.where(is4, sq1, nq1), q1)
    out_q2 = xp.where(filt & is4, sq2, q2)
    return out_p2, out_p1, out_p0, out_q0, out_q1, out_q2


def filter_core_chroma(p1, p0, q0, q1, bs, alpha, beta, tc0, xp=jnp):
    """Elementwise chroma edge filter (spec 8.7.2.3-4); see
    filter_core_luma. Returns (out_p0, out_q0)."""
    filt = ((bs > 0)
            & (xp.abs(p0 - q0) < alpha)
            & (xp.abs(p1 - p0) < beta)
            & (xp.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = xp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip1(p0 + delta, xp)
    nq0 = _clip1(q0 - delta, xp)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    out_p0 = xp.where(filt, xp.where(is4, sp0, np0), p0)
    out_q0 = xp.where(filt, xp.where(is4, sq0, nq0), q0)
    return out_p0, out_q0


def lookup_tables(bs, qp_av, xp=jnp):
    """(alpha, beta, tc0) per sample from the spec tables.

    Gather-free on device: per-sample indexing of a 52-entry table lowers
    to a slow generic gather on TPU (~6 ms per 479x1088 pass); instead
    unroll a 52-way select-sum — dense VPU compares XLA fuses into one
    pass. On HOST (xp is numpy) fancy indexing is the fast path."""
    idx = xp.clip(qp_av, 0, 51)
    bsc = xp.clip(bs, 1, 3)
    if xp is np:
        return (ALPHA[idx], BETA[idx],
                TC0[np.asarray(bsc) - 1, idx].astype(np.int64))
    alpha = xp.zeros_like(idx)
    beta = xp.zeros_like(idx)
    tc0 = xp.zeros_like(idx)
    for k in range(16, 52):         # all tables are 0 below index 16
        m = idx == k
        alpha = xp.where(m, int(ALPHA[k]), alpha)
        beta = xp.where(m, int(BETA[k]), beta)
        tc0 = xp.where(
            m,
            xp.where(bsc == 1, int(TC0[0, k]),
                      xp.where(bsc == 2, int(TC0[1, k]), int(TC0[2, k]))),
            tc0)
    return alpha, beta, tc0


def _filter_segment_luma(seg, bs, qp_av):
    """Filter one vertical luma edge for all rows.

    seg: (H, 8) int32 columns [p3 p2 p1 p0 | q0 q1 q2 q3];
    bs:  (H,) boundary strength; qp_av: (H,) averaged QP.
    Returns the filtered (H, 8) segment.
    """
    p3, p2, p1, p0 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    q0, q1, q2, q3 = seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7]
    alpha, beta, tc0 = lookup_tables(bs, qp_av)
    out = filter_core_luma(p3, p2, p1, p0, q0, q1, q2, q3,
                           bs, alpha, beta, tc0)
    return jnp.stack([p3, *out, q3], axis=1)


def _filter_segment_chroma(seg, bs, qp_av):
    """Chroma edge filter: seg (H, 4) columns [p1 p0 | q0 q1]."""
    p1, p0, q0, q1 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    alpha, beta, tc0 = lookup_tables(bs, qp_av)
    out_p0, out_q0 = filter_core_chroma(p1, p0, q0, q1,
                                        bs, alpha, beta, tc0)
    return jnp.stack([p1, out_p0, out_q0, q1], axis=1)


def _edge_pass(plane, bs_edges, qp_edges, luma: bool):
    """Filter all vertical edges of a plane, left to right.

    plane: (H, W) int32; bs_edges/qp_edges: (n_edges, H) per-row values
    for edges at x = 4*(e+1) (luma) / 4*(e+1) (chroma, 8-px luma grid
    already selected by the caller). Returns the filtered plane.
    """
    plane = jnp.asarray(plane, jnp.int32)
    bs_edges = jnp.asarray(bs_edges, jnp.int32)
    qp_edges = jnp.asarray(qp_edges, jnp.int32)
    h, w = plane.shape
    n_edges = bs_edges.shape[0]
    width = 8 if luma else 4
    half = width // 2
    fn = _filter_segment_luma if luma else _filter_segment_chroma

    def body(e, pl):
        xe = 4 * (e + 1)
        seg = jax.lax.dynamic_slice(pl, (0, xe - half), (h, width))
        out = fn(seg, bs_edges[e], qp_edges[e])
        return jax.lax.dynamic_update_slice(pl, out, (0, xe - half))

    return jax.lax.fori_loop(0, n_edges, body, plane)


def _repeat_rows(block_vals, factor):
    """(n_edges, Hb) block-row values → (n_edges, Hb*factor) pixel rows."""
    return jnp.repeat(block_vals, factor, axis=1)


def compute_bs_luma(intra_mb, nz_blk, mvq, vertical: bool, xp=jnp,
                    t8=None):
    """Boundary strengths for all internal luma edges in one direction.

    intra_mb: (nMBy, nMBx) bool; nz_blk: (H/4, W/4) bool (block has
    residual); mvq: (nMBy, nMBx, 2) quarter-pel — or (2nMBy, 2nMBx, 2)
    for frames with P_8x8 partitions (one vector per 8x8 block; the
    granularity is inferred from the shape) — OR, for B pictures,
    a tuple ``(mv0, mv1, use)`` with mv0/mv1 (nMBy, nMBx, 2) per-list
    quarter-pel MVs and use (nMBy, nMBx, 2) bool list-usage flags
    (L0-only / L1-only / Bi per MB). ``t8`` (nMBy, nMBx) bool flags
    transform_size_8x8 MBs, whose interior 4-offset edges are not
    filtered (spec 8.7: luma edges fall on the transform-block grid).
    Returns (n_edges, H/4 or W/4) int32 — transposed appropriately so
    edge e's values run along the edge.
    """
    two_list = isinstance(mvq, tuple)
    general = isinstance(mvq, dict)
    if not vertical:
        intra_mb = intra_mb.T
        nz_blk = nz_blk.T
        if t8 is not None:
            t8 = t8.T
        if two_list:
            mvq = tuple(xp.swapaxes(a, 0, 1) for a in mvq)
        elif general:
            mvq = {k: xp.swapaxes(a, 0, 1) for k, a in mvq.items()}
        else:
            mvq = xp.swapaxes(mvq, 0, 1)
    bh, bw = nz_blk.shape
    # per-block expansions are repeat+shift (gather-free; edge j sits
    # between block cols j and j+1, j = 0..bw-2)
    intra_e4 = xp.repeat(xp.repeat(intra_mb, 4, 0), 4, 1)   # (bh, bw)
    intra_e = intra_e4[:, :-1] | intra_e4[:, 1:]
    j = np.arange(bw - 1)
    is_mb_edge = xp.asarray(((j + 1) % 4 == 0)[None, :])
    nz_e = nz_blk[:, :-1] | nz_blk[:, 1:]
    if two_list:
        # 8.7.2.1 for B: bS=1 when the two sides use different reference
        # sets, or any shared list's MVs differ by >= 1 luma sample. In
        # this encoder L0/L1 are distinct pictures (prev/next anchor),
        # so list identity == reference identity.
        mv0, mv1, use = mvq

        def exp(a):
            return xp.repeat(xp.repeat(a, 4, 0), 4, 1)
        u_e, m0, m1 = exp(use), exp(mv0), exp(mv1)
        use_diff = xp.any(u_e[:, :-1] != u_e[:, 1:], axis=-1)
        d0 = xp.any(xp.abs(m0[:, :-1] - m0[:, 1:]) >= 4, axis=-1)
        d1 = xp.any(xp.abs(m1[:, :-1] - m1[:, 1:]) >= 4, axis=-1)
        both0 = u_e[:, :-1, 0] & u_e[:, 1:, 0]
        both1 = u_e[:, :-1, 1] & u_e[:, 1:, 1]
        mv_diff = use_diff | (both0 & d0) | (both1 & d1)
    elif general:
        # full 8.7.2.1 on the 8x8-block grid with per-list reference
        # PICTURE ids (foreign multi-ref / weighted / B-pyramid
        # streams): bS=1 when the sides use different MV counts,
        # different reference sets, or any matched-by-picture MV pair
        # differs by >= 1 luma sample (both pairings tried when one
        # picture serves both lists).
        rep = bh // mvq["mv0"].shape[0]

        def exp2(a):
            return xp.repeat(xp.repeat(a, rep, 0), rep, 1)
        m0, i0 = exp2(mvq["mv0"]), exp2(mvq["id0"])
        if "mv1" in mvq:
            m1, i1 = exp2(mvq["mv1"]), exp2(mvq["id1"])
        else:
            m1, i1 = xp.zeros_like(m0), xp.full_like(i0, -1)
        m0p, m0q = m0[:, :-1], m0[:, 1:]
        m1p, m1q = m1[:, :-1], m1[:, 1:]
        i0p, i0q = i0[:, :-1], i0[:, 1:]
        i1p, i1q = i1[:, :-1], i1[:, 1:]
        cnt_p = (i0p >= 0).astype(xp.int32) + (i1p >= 0)
        cnt_q = (i0q >= 0).astype(xp.int32) + (i1q >= 0)

        def dmv(a, b):
            return xp.any(xp.abs(a - b) >= 4, axis=-1)
        # single-MV sides: the one used (mv, id), whichever list
        sp_mv = xp.where((i0p >= 0)[..., None], m0p, m1p)
        sq_mv = xp.where((i0q >= 0)[..., None], m0q, m1q)
        sp_id = xp.where(i0p >= 0, i0p, i1p)
        sq_id = xp.where(i0q >= 0, i0q, i1q)
        single = (sp_id != sq_id) | dmv(sp_mv, sq_mv)
        # bi sides: compare reference SETS, then picture-matched pairs
        straight = (i0p == i0q) & (i1p == i1q)
        crossed = (i0p == i1q) & (i1p == i0q)
        d_ss = dmv(m0p, m0q) | dmv(m1p, m1q)
        d_cx = dmv(m0p, m1q) | dmv(m1p, m0q)
        same_pic = i0p == i1p            # one picture in both lists
        bi = xp.where(
            ~(straight | crossed), True,
            xp.where(same_pic, d_ss & d_cx,
                     xp.where(straight, d_ss, d_cx)))
        mv_diff = xp.where(cnt_p != cnt_q, True,
                           xp.where(cnt_p == 2, bi, single))
    else:
        rep = bh // mvq.shape[0]          # 4 = per-MB grid, 2 = per-8x8
        mv_e = xp.repeat(xp.repeat(mvq, rep, 0), rep, 1)    # (bh, bw, 2)
        mv_diff = xp.any(xp.abs(mv_e[:, :-1] - mv_e[:, 1:]) >= 4, axis=-1)
    bs = xp.where(
        intra_e,
        xp.where(is_mb_edge, 4, 3),
        xp.where(nz_e, 2, xp.where(mv_diff, 1, 0)))
    if t8 is not None:
        # interior 4-offset edges of 8x8-transform MBs are not filtered:
        # edge j (at x = 4(j+1)) is interior-odd when (j+1) % 2 == 1,
        # and belongs to MB column (j+1) // 4
        t8_e = xp.repeat(xp.repeat(t8, 4, 0), 4, 1)[:, :-1]  # per edge
        interior_odd = xp.asarray(((j + 1) % 2 == 1)[None, :])
        bs = xp.where(t8_e & interior_odd, 0, bs)
    return bs.T.astype(xp.int32)          # (n_edges, bh)


def compute_qp_edges(qp_mb, vertical: bool, chroma: bool,
                     chroma_qp_table=None, xp=jnp):
    """Per-edge averaged QP, expanded per block row: (n_edges, Hb)."""
    if not vertical:
        qp_mb = qp_mb.T
    if chroma:
        # gather-free 52-way select (tiny per-MB array, but generic
        # gathers are disproportionately slow on TPU)
        tbl = np.asarray(chroma_qp_table)
        qpc = xp.zeros_like(qp_mb)
        idx = xp.clip(qp_mb, 0, 51)
        for k in range(52):
            qpc = xp.where(idx == k, int(tbl[k]), qpc)
        qp_mb = qpc
    blocks_per_mb = 2 if chroma else 4
    qp_e = xp.repeat(xp.repeat(qp_mb, blocks_per_mb, 0),
                      blocks_per_mb, 1)
    qp_p = qp_e[:, :-1]
    qp_q = qp_e[:, 1:]
    return (((qp_p + qp_q + 1) >> 1).T).astype(xp.int32)


def _skew(a, band: int, shift: int, extra: int = 0):
    """Systolic skew: shift row band b right by ``b*shift`` columns.

    Turns the deblocking wavefront's diagonals d = mbx + 2*mby into
    contiguous column strips so every wavefront step is ONE static-shape
    dynamic_slice (no per-MB gathers). ``extra`` adds right padding for
    the final window slices.
    """
    h, w = a.shape
    nb = h // band
    out = jnp.zeros((h, w + shift * (nb - 1) + extra), a.dtype)
    for b in range(nb):
        out = jax.lax.dynamic_update_slice(
            out, a[b * band:(b + 1) * band], (b * band, b * shift))
    return out


def _unskew(a, band: int, shift: int, w: int):
    h = a.shape[0]
    return jnp.concatenate(
        [a[b * band:(b + 1) * band, b * shift:b * shift + w]
         for b in range(h // band)], axis=0)


def _thr_stack(bs_grid, qp_grid):
    """(bs, alpha, beta, tc0) stacked (4, ...) from per-edge grids."""
    al, be, tc = lookup_tables(bs_grid, qp_grid)
    return jnp.stack([bs_grid, al, be, tc]).astype(jnp.int32)


def _wavefront_luma(y, vthr, hthr, n_mby, n_mbx):
    """Spec-order luma filtering as a wavefront over diagonals d=x+2y.

    Every MB's eight edges (Vb, Vi1-3 then Hb, Hi1-3) run in spec
    sequence; MBs on one diagonal are independent (their neighbor sets
    are disjoint), so each step is fully vectorized over the diagonal.
    vthr: (4, H, W/4) thresholds for the vertical edge AT column 4m;
    hthr: (4, H/4, W) for the horizontal edge AT row 4m (m=0 → bS 0).
    """
    h, w = y.shape
    d_steps = n_mbx + 2 * (n_mby - 1)
    ys = jnp.pad(_skew(y, 16, 32, extra=16), ((0, 0), (32, 0)))
    vs = jnp.stack([_skew(vthr[i], 16, 8, extra=8) for i in range(4)])
    hs = jnp.stack([_skew(hthr[i], 4, 32, extra=16) for i in range(4)])

    def step(d, ys):
        win = jax.lax.dynamic_slice(ys, (0, 16 * d), (h, 48))
        vt = jax.lax.dynamic_slice(vs, (0, 0, 4 * d), (4, h, 4))
        ht = jax.lax.dynamic_slice(hs, (0, 0, 16 * d), (4, h // 4, 16))
        # vertical edges of the diagonal's MBs, left to right (window
        # cols 32+4k); bS=0 padding makes out-of-range MBs no-ops
        for k in range(4):
            c = 32 + 4 * k
            cols = [win[:, c - 4 + i] for i in range(8)]
            out = filter_core_luma(*cols, vt[0, :, k], vt[1, :, k],
                                   vt[2, :, k], vt[3, :, k])
            win = jax.lax.dynamic_update_slice(
                win, jnp.stack(out, axis=1), (0, c - 3))
        # horizontal edges; p-rows of the MB-top edge live in the TOP
        # NEIGHBOR's band, which sits at window cols 0:16 (skew offset)
        r = win.reshape(n_mby, 16, 48)
        ht = ht.reshape(4, n_mby, 4, 16)
        p = r[:-1, 12:16, 0:16]
        q = r[1:, 0:4, 32:48]
        out = filter_core_luma(
            p[:, 0], p[:, 1], p[:, 2], p[:, 3],
            q[:, 0], q[:, 1], q[:, 2], q[:, 3],
            ht[0, 1:, 0], ht[1, 1:, 0], ht[2, 1:, 0], ht[3, 1:, 0])
        r = r.at[:-1, 13:16, 0:16].set(jnp.stack(out[:3], axis=1))
        r = r.at[1:, 0:3, 32:48].set(jnp.stack(out[3:], axis=1))
        for k in range(1, 4):
            seg = r[:, 4 * k - 4:4 * k + 4, 32:48]
            out = filter_core_luma(
                seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3],
                seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7],
                ht[0, :, k], ht[1, :, k], ht[2, :, k], ht[3, :, k])
            r = r.at[:, 4 * k - 3:4 * k + 3, 32:48].set(
                jnp.stack(out, axis=1))
        return jax.lax.dynamic_update_slice(ys, r.reshape(h, 48),
                                            (0, 16 * d))

    ys = jax.lax.fori_loop(0, d_steps, step, ys)
    return _unskew(ys[:, 32:], 16, 32, w)


def _wavefront_chroma(u, v, vthr, hthr, n_mby, n_mbx):
    """Chroma wavefront (8-px MBs, 2 edges per direction); u and v ride
    the same steps stacked along rows (bands aligned per plane)."""
    hc, wc = u.shape
    d_steps = n_mbx + 2 * (n_mby - 1)

    ys = jnp.concatenate([_skew(u, 8, 16, extra=8),
                          _skew(v, 8, 16, extra=8)], axis=0)
    ys = jnp.pad(ys, ((0, 0), (16, 0)))
    vs = jnp.stack([jnp.concatenate([_skew(vthr[i], 8, 4, extra=4)] * 2,
                                    axis=0) for i in range(4)])
    hs = jnp.stack([jnp.concatenate([_skew(hthr[i], 2, 16, extra=8)] * 2,
                                    axis=0) for i in range(4)])
    h2 = 2 * hc

    def step(d, ys):
        win = jax.lax.dynamic_slice(ys, (0, 8 * d), (h2, 24))
        vt = jax.lax.dynamic_slice(vs, (0, 0, 2 * d), (4, h2, 2))
        ht = jax.lax.dynamic_slice(hs, (0, 0, 8 * d), (4, h2 // 4, 8))
        for k in range(2):
            c = 16 + 4 * k
            p1, p0, q0, q1 = (win[:, c - 2 + i] for i in range(4))
            op0, oq0 = filter_core_chroma(p1, p0, q0, q1, vt[0, :, k],
                                          vt[1, :, k], vt[2, :, k],
                                          vt[3, :, k])
            win = jax.lax.dynamic_update_slice(
                win, jnp.stack([op0, oq0], axis=1), (0, c - 1))
        r = win.reshape(2 * n_mby, 8, 24)
        ht = ht.reshape(4, 2 * n_mby, 2, 8)
        # MB-top edge: p-rows from the neighbor band at window cols 0:8;
        # the v-plane's first band has bS=0, so the cross-plane pairing
        # at band index n_mby is a guaranteed no-op
        p = r[:-1, 6:8, 0:8]
        q = r[1:, 0:2, 16:24]
        op0, oq0 = filter_core_chroma(
            p[:, 0], p[:, 1], q[:, 0], q[:, 1],
            ht[0, 1:, 0], ht[1, 1:, 0], ht[2, 1:, 0], ht[3, 1:, 0])
        r = r.at[:-1, 7, 0:8].set(op0)
        r = r.at[1:, 0, 16:24].set(oq0)
        seg = r[:, 2:6, 16:24]
        op0, oq0 = filter_core_chroma(
            seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3],
            ht[0, :, 1], ht[1, :, 1], ht[2, :, 1], ht[3, :, 1])
        r = r.at[:, 3, 16:24].set(op0)
        r = r.at[:, 4, 16:24].set(oq0)
        return jax.lax.dynamic_update_slice(ys, r.reshape(h2, 24),
                                            (0, 8 * d))

    ys = jax.lax.fori_loop(0, d_steps, step, ys)
    ys = ys[:, 16:]
    u = _unskew(ys[:hc], 8, 16, wc)
    v = _unskew(ys[hc:], 8, 16, wc)
    return u, v


def _skew_np(a, band: int, shift: int, extra: int = 0):
    h, w = a.shape
    nb = h // band
    out = np.zeros((h, w + shift * (nb - 1) + extra), a.dtype)
    for b in range(nb):
        out[b * band:(b + 1) * band, b * shift:b * shift + w] = \
            a[b * band:(b + 1) * band]
    return out


def _unskew_np(a, band: int, shift: int, w: int):
    h = a.shape[0]
    return np.concatenate(
        [a[b * band:(b + 1) * band, b * shift:b * shift + w]
         for b in range(h // band)], axis=0)


def _wavefront_luma_np(y, vthr, hthr, n_mby, n_mbx):
    """NumPy twin of _wavefront_luma for the HOST decoder path (the
    validation decoder must not run XLA eagerly — long-lived processes
    accumulate XLA:CPU state that has produced compiler crashes — and
    plain ndarray slicing beats per-op dispatch here anyway).
    Bit-identical (asserted by tests/test_deblock.py)."""
    h, w = y.shape
    d_steps = n_mbx + 2 * (n_mby - 1)
    ys = np.pad(_skew_np(y, 16, 32, extra=16), ((0, 0), (32, 0)))
    vs = np.stack([_skew_np(vthr[i], 16, 8, extra=8) for i in range(4)])
    hs = np.stack([_skew_np(hthr[i], 4, 32, extra=16) for i in range(4)])
    for d in range(d_steps):
        win = ys[:, 16 * d:16 * d + 48]
        vt = vs[:, :, 4 * d:4 * d + 4]
        ht = hs[:, :, 16 * d:16 * d + 16].reshape(4, n_mby, 4, 16)
        for k in range(4):
            c = 32 + 4 * k
            out = filter_core_luma(
                *(win[:, c - 4 + i] for i in range(8)),
                vt[0, :, k], vt[1, :, k], vt[2, :, k], vt[3, :, k], xp=np)
            win[:, c - 3:c + 3] = np.stack(out, axis=1)
        r = win.reshape(n_mby, 16, 48)
        p = r[:-1, 12:16, 0:16]
        q = r[1:, 0:4, 32:48]
        out = filter_core_luma(
            p[:, 0], p[:, 1], p[:, 2], p[:, 3],
            q[:, 0], q[:, 1], q[:, 2], q[:, 3],
            ht[0, 1:, 0], ht[1, 1:, 0], ht[2, 1:, 0], ht[3, 1:, 0], xp=np)
        r[:-1, 13:16, 0:16] = np.stack(out[:3], axis=1)
        r[1:, 0:3, 32:48] = np.stack(out[3:], axis=1)
        for k in range(1, 4):
            seg = r[:, 4 * k - 4:4 * k + 4, 32:48]
            out = filter_core_luma(
                seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3],
                seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7],
                ht[0, :, k], ht[1, :, k], ht[2, :, k], ht[3, :, k], xp=np)
            r[:, 4 * k - 3:4 * k + 3, 32:48] = np.stack(out, axis=1)
    return _unskew_np(ys[:, 32:], 16, 32, w)


def _wavefront_chroma_np(u, v, vthr, hthr, n_mby, n_mbx):
    hc, wc = u.shape
    d_steps = n_mbx + 2 * (n_mby - 1)
    ys = np.concatenate([_skew_np(u, 8, 16, extra=8),
                         _skew_np(v, 8, 16, extra=8)], axis=0)
    ys = np.pad(ys, ((0, 0), (16, 0)))
    vs = np.stack([
        np.concatenate([_skew_np(vthr[i], 8, 4, extra=4)] * 2, axis=0)
        for i in range(4)])
    hs = np.stack([
        np.concatenate([_skew_np(hthr[i], 2, 16, extra=8)] * 2, axis=0)
        for i in range(4)])
    for d in range(d_steps):
        win = ys[:, 8 * d:8 * d + 24]
        vt = vs[:, :, 2 * d:2 * d + 2]
        ht = hs[:, :, 8 * d:8 * d + 8].reshape(4, 2 * n_mby, 2, 8)
        for k in range(2):
            c = 16 + 4 * k
            op0, oq0 = filter_core_chroma(
                win[:, c - 2], win[:, c - 1], win[:, c], win[:, c + 1],
                vt[0, :, k], vt[1, :, k], vt[2, :, k], vt[3, :, k], xp=np)
            win[:, c - 1] = op0
            win[:, c] = oq0
        r = win.reshape(2 * n_mby, 8, 24)
        p = r[:-1, 6:8, 0:8]
        q = r[1:, 0:2, 16:24]
        op0, oq0 = filter_core_chroma(
            p[:, 0], p[:, 1], q[:, 0], q[:, 1],
            ht[0, 1:, 0], ht[1, 1:, 0], ht[2, 1:, 0], ht[3, 1:, 0], xp=np)
        r[:-1, 7, 0:8] = op0
        r[1:, 0, 16:24] = oq0
        seg = r[:, 2:6, 16:24]
        op0, oq0 = filter_core_chroma(
            seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3],
            ht[0, :, 1], ht[1, :, 1], ht[2, :, 1], ht[3, :, 1], xp=np)
        r[:, 3, 16:24] = op0
        r[:, 4, 16:24] = oq0
    ys = ys[:, 16:]
    return (_unskew_np(ys[:hc], 8, 16, wc), _unskew_np(ys[hc:], 8, 16, wc))


def _deblock_host_native(y, u, v, qp_mb, intra_mb, nz_y, mvq,
                         chroma_qp_table, t8):
    """C++ direct-threshold filter (native/deblock.cpp): bS/alpha/beta/
    tc0 computed inline per edge segment, no grids materialized.
    Returns the filtered (y, u, v) or None when native is absent."""
    from .. import native
    lib = native.get_lib()
    if lib is None or not hasattr(lib, "vcp_deblock_frame_direct"):
        return None
    import ctypes
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    null = ctypes.cast(None, i32p)

    h, w = y.shape
    yi = np.ascontiguousarray(y, np.int32)
    ui = np.ascontiguousarray(u, np.int32)
    vi = np.ascontiguousarray(v, np.int32)
    qp = np.ascontiguousarray(qp_mb, np.int32)
    intra = np.ascontiguousarray(intra_mb, bool).view(np.uint8)
    nz = np.ascontiguousarray(nz_y, bool).view(np.uint8)
    t8u = np.ascontiguousarray(t8, bool).view(np.uint8) \
        if t8 is not None else None
    cq = np.ascontiguousarray(chroma_qp_table, np.int32)

    if isinstance(mvq, dict):
        mv_mode = 2
        mv0 = np.ascontiguousarray(mvq["mv0"], np.int32)
        id0 = np.ascontiguousarray(mvq["id0"], np.int32)
        mv1 = np.ascontiguousarray(mvq["mv1"], np.int32) \
            if "mv1" in mvq else None
        id1 = np.ascontiguousarray(mvq["id1"], np.int32) \
            if "mv1" in mvq else None
        gh = gw = 0
    else:
        mv_mode = 1
        mv0 = np.ascontiguousarray(mvq, np.int32)
        id0 = mv1 = id1 = None
        gh, gw = mv0.shape[:2]

    def p(a):
        return a.ctypes.data_as(i32p) if a is not None else null
    lib.vcp_deblock_frame_direct(
        p(yi), p(ui), p(vi), h, w,
        intra.ctypes.data_as(u8p), nz.ctypes.data_as(u8p), p(qp),
        t8u.ctypes.data_as(u8p) if t8u is not None
        else ctypes.cast(None, u8p),
        mv_mode, p(mv0), p(id0), p(mv1), p(id1), gh, gw, p(cq))
    return yi, ui, vi


def deblock_frame_host(y, u, v, qp_mb, intra_mb, nz_y, mvq,
                       chroma_qp_table, t8=None):
    """Host deblock for the validation decoder — same spec order as
    deblock_frame, zero XLA involvement. Native C++ direct-threshold
    filter when available; pure-NumPy prep + filter otherwise. The
    tuple-form mvq (encoder two-list) always uses the numpy prep."""
    if not isinstance(mvq, tuple):
        out = _deblock_host_native(np.asarray(y), np.asarray(u),
                                   np.asarray(v), np.asarray(qp_mb),
                                   np.asarray(intra_mb), np.asarray(nz_y),
                                   mvq if isinstance(mvq, dict)
                                   else np.asarray(mvq),
                                   np.asarray(chroma_qp_table),
                                   np.asarray(t8) if t8 is not None
                                   else None)
        if out is not None:
            return out
    y = np.asarray(y, np.int64)
    u = np.asarray(u, np.int64)
    v = np.asarray(v, np.int64)
    qp_mb = np.asarray(qp_mb)
    intra_mb = np.asarray(intra_mb)
    nz_y = np.asarray(nz_y)
    if isinstance(mvq, tuple):
        mvq = tuple(np.asarray(a) for a in mvq)
    elif isinstance(mvq, dict):
        mvq = {k: np.asarray(a) for k, a in mvq.items()}
    else:
        mvq = np.asarray(mvq)
    hc, wc = u.shape
    n_mby, n_mbx = qp_mb.shape

    def grid_v(bs_e, qp_e, rep):
        pad = np.zeros((1, bs_e.shape[1]), np.int64)
        bs = np.concatenate([pad, bs_e], axis=0).T
        qp = np.concatenate([pad, qp_e], axis=0).T
        bs = np.repeat(bs.T, rep, axis=1).T
        qp = np.repeat(qp.T, rep, axis=1).T
        al, be, tc = lookup_tables(bs, qp, xp=np)
        return np.stack([bs, al, be, tc]).astype(np.int64)

    if t8 is not None:
        t8 = np.asarray(t8)
    bs_v = compute_bs_luma(intra_mb, nz_y, mvq, True, xp=np, t8=t8)
    qp_v = compute_qp_edges(qp_mb, True, False, xp=np)
    vthr = grid_v(bs_v, qp_v, 4)
    bs_h = compute_bs_luma(intra_mb, nz_y, mvq, False, xp=np, t8=t8)
    qp_h = compute_qp_edges(qp_mb, False, False, xp=np)
    hthr = np.swapaxes(grid_v(bs_h, qp_h, 4), 1, 2)

    bs_cv = np.repeat(bs_v[1::2], 2, axis=1).reshape(wc // 4 - 1, hc)
    qp_cv = np.repeat(compute_qp_edges(qp_mb, True, True,
                                       chroma_qp_table, xp=np), 4, axis=1)
    cvthr = grid_v(bs_cv, qp_cv, 1)
    bs_ch = np.repeat(bs_h[1::2], 2, axis=1).reshape(hc // 4 - 1, wc)
    qp_ch = np.repeat(compute_qp_edges(qp_mb, False, True,
                                       chroma_qp_table, xp=np), 4, axis=1)
    chthr = np.swapaxes(grid_v(bs_ch, qp_ch, 1), 1, 2)

    from .. import native
    lib = native.get_lib()
    if lib is not None and hasattr(lib, "vcp_deblock_frame"):
        import ctypes
        i32p = ctypes.POINTER(ctypes.c_int32)
        arrs = [np.ascontiguousarray(a, np.int32)
                for a in (y, u, v, vthr, hthr, cvthr, chthr)]
        lib.vcp_deblock_frame(
            *[a.ctypes.data_as(i32p) for a in arrs[:3]],
            y.shape[0], y.shape[1],
            *[a.ctypes.data_as(i32p) for a in arrs[3:]])
        return tuple(arrs[:3])
    y = _wavefront_luma_np(y, vthr, hthr, n_mby, n_mbx)
    u, v = _wavefront_chroma_np(u, v, cvthr, chthr, n_mby, n_mbx)
    return y, u, v


def deblock_frame(y, u, v, qp_mb, intra_mb, nz_y, mvq, chroma_qp_table,
                  no_strong: bool = False, qp_scalar=None, t8=None):
    """Apply the full in-loop filter to one reconstructed frame in SPEC
    ORDER (8.7: per-MB raster, vertical edges then horizontal, each edge
    reading previously filtered samples) — realized as a skewed-diagonal
    wavefront so every step is dense VPU work. Conformance asserted
    against the system-ffmpeg h264 decoder (tests/test_conformance.py).

    y: (H, W) int32 recon; u, v: (H/2, W/2); qp_mb (nMBy, nMBx) int32
    (PCM MBs carry 0); intra_mb bool; nz_y (H/4, W/4) bool; mvq
    (nMBy, nMBx, 2) quarter-pel (zeros for intra frames).

    ``no_strong=True`` (static) lets the Pallas kernel drop the bS==4
    filter path — valid for all-inter frames, where no edge reaches
    bS 4 (P/B steps pass it; the intra frame must not).

    ``qp_scalar`` (traced or static int): when the slice QP is uniform
    (every qp_mb entry equals it — true for every P/B frame this encoder
    emits), the no_strong Pallas path collapses the four per-sample
    threshold channels to one bS grid + ten scalars, skipping the bulk
    of the grid construction that dominated the filter's device time.
    """
    y = jnp.asarray(y, jnp.int32)
    u = jnp.asarray(u, jnp.int32)
    v = jnp.asarray(v, jnp.int32)
    hp, wp = y.shape
    hc, wc = u.shape
    n_mby, n_mbx = qp_mb.shape

    import os
    if (no_strong and qp_scalar is not None
            and jax.default_backend() not in ("cpu",)
            and os.environ.get("VCP_PALLAS_DEBLOCK", "1") != "0"):
        bs_v = compute_bs_luma(intra_mb, nz_y, mvq, vertical=True, t8=t8)
        bs_h = compute_bs_luma(intra_mb, nz_y, mvq, vertical=False, t8=t8)
        return _deblock_pallas_fast(y, u, v, bs_v, bs_h, qp_scalar,
                                    chroma_qp_table, n_mby, n_mbx)

    def grid_v(bs_e, qp_e, rep):
        """(n_edges, blkrows) per-edge arrays → (4, rows*rep, n_edges+1)
        grids keyed by the edge's own block column (col 0 = frame edge,
        bS 0). The table lookups run at BLOCK resolution (rep× fewer
        elements than the pixel grid — the 36-way select loop was ~40%
        of the whole filter's device time at pixel resolution) and the
        finished (4, ...) stack is expanded afterwards."""
        pad = jnp.zeros((1, bs_e.shape[1]), jnp.int32)
        bs = jnp.concatenate([pad, bs_e], axis=0).T       # (blkrows, Wblk)
        qp = jnp.concatenate([pad, qp_e], axis=0).T
        thr = _thr_stack(bs, qp)                          # (4, blkrows, W)
        if rep == 1:
            return thr
        return jnp.repeat(thr, rep, axis=1)

    # --- luma thresholds, keyed by edge position
    bs_v = compute_bs_luma(intra_mb, nz_y, mvq, vertical=True, t8=t8)
    qp_v = compute_qp_edges(qp_mb, True, False)
    vthr = grid_v(bs_v, qp_v, 4)             # (4, H, W/4)

    bs_h = compute_bs_luma(intra_mb, nz_y, mvq, vertical=False, t8=t8)
    qp_h = compute_qp_edges(qp_mb, False, False)
    # horizontal: same construction, then transpose to (4, H/4, W)
    hthr = jnp.swapaxes(grid_v(bs_h, qp_h, 4), 1, 2)

    # --- chroma: edges on the 8-px luma grid (every other luma edge);
    # luma block-row bS covers 2 chroma rows
    bs_cv = _repeat_rows(bs_v[1::2], 2).reshape(wc // 4 - 1, hc)
    qp_cv = _repeat_rows(compute_qp_edges(qp_mb, True, True,
                                          chroma_qp_table), 4)
    cvthr = grid_v(bs_cv, qp_cv, 1)
    bs_ch = _repeat_rows(bs_h[1::2], 2).reshape(hc // 4 - 1, wc)
    qp_ch = _repeat_rows(compute_qp_edges(qp_mb, False, True,
                                          chroma_qp_table), 4)
    chthr = jnp.swapaxes(grid_v(bs_ch, qp_ch, 1), 1, 2)

    import os
    if (jax.default_backend() not in ("cpu",)
            and os.environ.get("VCP_PALLAS_DEBLOCK", "1") != "0"):
        return _deblock_pallas(y, u, v, vthr, hthr, cvthr, chthr,
                               n_mby, n_mbx, strong=not no_strong)
    y = _wavefront_luma(y, vthr, hthr, n_mby, n_mbx)
    u, v = _wavefront_chroma(u, v, cvthr, chthr, n_mby, n_mbx)
    return y, u, v


def _lane_pad(a, mult: int = 128):
    pad = (-a.shape[-1]) % mult
    if pad:
        a = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, pad)])
    return a


def _deblock_pallas(y, u, v, vthr, hthr, cvthr, chthr, n_mby, n_mbx,
                    interpret: bool = False, strong: bool = True):
    """Pre-skew + transpose the planes/thresholds and run the Pallas
    wavefront kernel (ops.deblock_pallas); bit-identical to the XLA
    wavefront above. The diagonal count (and every row extent) is padded
    to a multiple of the kernel's diagonals-per-step K — the padding
    rows carry bS=0 thresholds, so their filters are identity."""
    from .deblock_pallas import diags_per_step, wavefront_pallas

    hp, wp = y.shape
    hc, wc = u.shape
    d_steps = n_mbx + 2 * (n_mby - 1)
    kdiag = diags_per_step(-(-hp // 128) * 128)
    d_pad = -(-d_steps // kdiag) * kdiag

    # per-diagonal activity: an MB whose 8 luma edges all carry bS=0 is
    # an identity filter for luma AND chroma (chroma bS is the even-edge
    # subset of luma bS), so a diagonal of such MBs can be skipped
    # bit-exactly inside the kernel. Reduce the edge-keyed bS grids per
    # MB, then OR along diagonals d = mbx + 2*mby with one tiny matmul
    # (gather/scatter-free).
    act_v = vthr[0].reshape(n_mby, 16, n_mbx, 4).max(axis=(1, 3))
    act_h = hthr[0].reshape(n_mby, 4, n_mbx, 16).max(axis=(1, 3))
    act_mb = ((act_v + act_h) > 0).astype(jnp.float32).reshape(1, -1)
    dm = (jnp.arange(n_mbx)[None, :] + 2 * jnp.arange(n_mby)[:, None])
    onehot = (dm.reshape(-1, 1) ==
              jnp.arange(d_pad)[None, :]).astype(jnp.float32)
    act = (jnp.dot(act_mb, onehot,
                   preferred_element_type=jnp.float32)[0] > 0)

    def skew_t(a, band, shift, lead, rows):
        s = _skew(a, band, shift)
        if lead:
            s = jnp.pad(s, ((0, 0), (lead, 0)))
        s = _lane_pad(s.T)
        if s.shape[0] < rows:
            s = jnp.pad(s, ((0, rows - s.shape[0]), (0, 0)))
        return s

    ys = skew_t(y, 16, 32, 32, 16 * d_pad + 32).astype(jnp.int32)
    # vertical-edge thresholds (already at pixel-lane resolution)
    vts = jnp.stack([skew_t(vthr[t], 16, 8, 0, 4 * d_pad)
                     for t in range(4)]).astype(jnp.int32)
    # horizontal-edge thresholds at anchor-lane resolution
    hthr_px = jnp.repeat(hthr, 4, axis=1)           # edge rows -> anchors
    hts = jnp.stack([skew_t(hthr_px[t], 16, 32, 0, 16 * d_pad)
                     for t in range(4)]).astype(jnp.int32)

    cs = jnp.concatenate(
        [skew_t(u, 8, 16, 16, 8 * d_pad + 16),
         skew_t(v, 8, 16, 16, 8 * d_pad + 16)],
        axis=1).astype(jnp.int32)
    cvs = jnp.stack([
        jnp.concatenate([skew_t(cvthr[t], 8, 4, 0, 2 * d_pad)] * 2, axis=1)
        for t in range(4)]).astype(jnp.int32)
    chthr_px = jnp.repeat(chthr, 4, axis=1)
    chs = jnp.stack([
        jnp.concatenate([skew_t(chthr_px[t], 8, 16, 0, 8 * d_pad)] * 2,
                        axis=1)
        for t in range(4)]).astype(jnp.int32)

    ys_o, cs_o = wavefront_pallas(ys, vts, hts, cs, cvs, chs, d_pad,
                                  interpret=interpret, strong=strong,
                                  act=act.astype(jnp.int32))
    # drop the lead pad rows and lane padding, transpose, unskew
    y_out = _unskew(ys_o[32:, :hp].T, 16, 32, wp)
    half = -(-hc // 128) * 128
    u_out = _unskew(cs_o[16:, :hc].T, 8, 16, wc)
    v_out = _unskew(cs_o[16:, half:half + hc].T, 8, 16, wc)
    return y_out, u_out, v_out


def _deblock_pallas_fast(y, u, v, bs_v, bs_h, qp, chroma_qp_table,
                         n_mby, n_mbx, interpret: bool = False):
    """Uniform-QP all-inter Pallas path: one bS grid per edge direction
    (channel 0 of _deblock_pallas's threshold stacks, same geometry) and
    ten SMEM scalars. Bit-identical to the general path whenever every
    qp_mb entry equals ``qp`` and no edge has bS 4."""
    from .deblock_pallas import diags_per_step, wavefront_pallas_fast

    hp, wp = y.shape
    hc, wc = u.shape
    d_steps = n_mbx + 2 * (n_mby - 1)
    kdiag = diags_per_step(-(-hp // 128) * 128)
    d_pad = -(-d_steps // kdiag) * kdiag

    def bs_grid(bs_e):
        pad = jnp.zeros((1, bs_e.shape[1]), jnp.int32)
        return jnp.concatenate([pad, bs_e], axis=0).T   # (blkrows, Wblk)

    vthr0 = jnp.repeat(bs_grid(bs_v), 4, axis=0)        # (H, W/4)
    hthr0 = jnp.repeat(bs_grid(bs_h), 4, axis=0).swapaxes(0, 1)  # (H/4, W)
    bs_cv = _repeat_rows(bs_v[1::2], 2).reshape(wc // 4 - 1, hc)
    cvthr0 = bs_grid(bs_cv)                             # (hc, wc/4)
    bs_ch = _repeat_rows(bs_h[1::2], 2).reshape(hc // 4 - 1, wc)
    chthr0 = bs_grid(bs_ch).swapaxes(0, 1)              # (hc/4, wc)

    # per-diagonal activity (see _deblock_pallas)
    act_v = vthr0.reshape(n_mby, 16, n_mbx, 4).max(axis=(1, 3))
    act_h = hthr0.reshape(n_mby, 4, n_mbx, 16).max(axis=(1, 3))
    act_mb = ((act_v + act_h) > 0).astype(jnp.float32).reshape(1, -1)
    dm = (jnp.arange(n_mbx)[None, :] + 2 * jnp.arange(n_mby)[:, None])
    onehot = (dm.reshape(-1, 1) ==
              jnp.arange(d_pad)[None, :]).astype(jnp.float32)
    act = (jnp.dot(act_mb, onehot,
                   preferred_element_type=jnp.float32)[0] > 0)

    qi = jnp.clip(jnp.asarray(qp, jnp.int32), 0, 51)
    qc = jnp.asarray(chroma_qp_table)[qi]
    al = jnp.asarray(ALPHA)
    be = jnp.asarray(BETA)
    tc = jnp.asarray(TC0)
    scal = jnp.stack([al[qi], be[qi], tc[0, qi], tc[1, qi], tc[2, qi],
                      al[qc], be[qc], tc[0, qc], tc[1, qc], tc[2, qc]])

    def skew_t(a, band, shift, lead, rows):
        s = _skew(a, band, shift)
        if lead:
            s = jnp.pad(s, ((0, 0), (lead, 0)))
        s = _lane_pad(s.T)
        if s.shape[0] < rows:
            s = jnp.pad(s, ((0, rows - s.shape[0]), (0, 0)))
        return s

    ys = skew_t(y, 16, 32, 32, 16 * d_pad + 32).astype(jnp.int32)
    vts = skew_t(vthr0, 16, 8, 0, 4 * d_pad).astype(jnp.int32)
    hts = skew_t(jnp.repeat(hthr0, 4, axis=0), 16, 32, 0,
                 16 * d_pad).astype(jnp.int32)
    cs = jnp.concatenate(
        [skew_t(u, 8, 16, 16, 8 * d_pad + 16),
         skew_t(v, 8, 16, 16, 8 * d_pad + 16)],
        axis=1).astype(jnp.int32)
    cvs = jnp.concatenate([skew_t(cvthr0, 8, 4, 0, 2 * d_pad)] * 2,
                          axis=1).astype(jnp.int32)
    chs = jnp.concatenate(
        [skew_t(jnp.repeat(chthr0, 4, axis=0), 8, 16, 0, 8 * d_pad)] * 2,
        axis=1).astype(jnp.int32)

    ys_o, cs_o = wavefront_pallas_fast(ys, vts, hts, cs, cvs, chs, scal,
                                       d_pad, act.astype(jnp.int32),
                                       interpret=interpret)
    y_out = _unskew(ys_o[32:, :hp].T, 16, 32, wp)
    half = -(-hc // 128) * 128
    u_out = _unskew(cs_o[16:, :hc].T, 8, 16, wc)
    v_out = _unskew(cs_o[16:, half:half + hc].T, 8, 16, wc)
    return y_out, u_out, v_out