"""H.264 in-loop deblocking filter (spec 8.7) as device ops.

One jnp implementation serves both sides: the encoder applies it inside
the jitted GOP step (the filtered picture is the next frame's reference),
and the validation decoder calls the same functions eagerly on CPU — so
closed-loop bit-exactness is structural.

Parallelization: filtering is sequential across edges 4 px apart (a later
edge reads samples an earlier edge may have written), but each edge
filters all H rows at once. Vertical edges run as a ``lax.scan`` over
edge columns; horizontal edges reuse the same pass on the transposed
plane (the spec's filter is symmetric under transpose, and the full
vertical pass completes before the horizontal one, per 8.7).

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

# Table 8-17: tc0 per (bS-1, index).
TC0 = np.array([
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
     2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2,
     2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11, 12, 13, 15, 17],
    [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
     3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20],
], dtype=np.int32)


def _clip1(x):
    return jnp.clip(x, 0, 255)


def filter_core_luma(p3, p2, p1, p0, q0, q1, q2, q3, bs, alpha, beta, tc0):
    """Elementwise luma edge filter (spec 8.7.2.3-4), shape-polymorphic.

    All inputs same-shape int32 (bs/alpha/beta/tc0 pre-looked-up per
    sample). Returns (out_p2, out_p1, out_p0, out_q0, out_q1, out_q2).
    Shared by the XLA edge loop below and the Pallas edge-scan kernel
    (ops.deblock_pallas)."""
    filt = ((bs > 0)
            & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    # --- normal filter (bS 1..3)
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip1(p0 + delta)
    nq0 = _clip1(q0 - delta)
    dp1 = jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    dq1 = jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)
    np1 = jnp.where(ap, p1 + dp1, p1)
    nq1 = jnp.where(aq, q1 + dq1, q1)

    # --- strong filter (bS == 4)
    strong_cond = jnp.abs(p0 - q0) < ((alpha >> 2) + 2)
    sp0 = jnp.where(ap & strong_cond,
                    (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                    (2 * p1 + p0 + q1 + 2) >> 2)
    sp1 = jnp.where(ap & strong_cond, (p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = jnp.where(ap & strong_cond,
                    (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = jnp.where(aq & strong_cond,
                    (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                    (2 * q1 + q0 + p1 + 2) >> 2)
    sq1 = jnp.where(aq & strong_cond, (q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = jnp.where(aq & strong_cond,
                    (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    is4 = bs == 4
    out_p2 = jnp.where(filt & is4, sp2, p2)
    out_p1 = jnp.where(filt, jnp.where(is4, sp1, np1), p1)
    out_p0 = jnp.where(filt, jnp.where(is4, sp0, np0), p0)
    out_q0 = jnp.where(filt, jnp.where(is4, sq0, nq0), q0)
    out_q1 = jnp.where(filt, jnp.where(is4, sq1, nq1), q1)
    out_q2 = jnp.where(filt & is4, sq2, q2)
    return out_p2, out_p1, out_p0, out_q0, out_q1, out_q2


def filter_core_chroma(p1, p0, q0, q1, bs, alpha, beta, tc0):
    """Elementwise chroma edge filter (spec 8.7.2.3-4); see
    filter_core_luma. Returns (out_p0, out_q0)."""
    filt = ((bs > 0)
            & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    tc = tc0 + 1
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip1(p0 + delta)
    nq0 = _clip1(q0 - delta)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    out_p0 = jnp.where(filt, jnp.where(is4, sp0, np0), p0)
    out_q0 = jnp.where(filt, jnp.where(is4, sq0, nq0), q0)
    return out_p0, out_q0


def lookup_tables(bs, qp_av):
    """(alpha, beta, tc0) per sample from the spec tables.

    Gather-free: per-sample indexing of a 52-entry table lowers to a slow
    generic gather on TPU (~6 ms per 479x1088 pass); instead unroll a
    52-way select-sum — dense VPU compares XLA fuses into one pass.
    Call at block-row resolution where possible (4x fewer samples)."""
    idx = jnp.clip(qp_av, 0, 51)
    bsc = jnp.clip(bs, 1, 3)
    alpha = jnp.zeros_like(idx)
    beta = jnp.zeros_like(idx)
    tc0 = jnp.zeros_like(idx)
    for k in range(16, 52):         # all tables are 0 below index 16
        m = idx == k
        alpha = jnp.where(m, int(ALPHA[k]), alpha)
        beta = jnp.where(m, int(BETA[k]), beta)
        tc0 = jnp.where(
            m,
            jnp.where(bsc == 1, int(TC0[0, k]),
                      jnp.where(bsc == 2, int(TC0[1, k]), int(TC0[2, k]))),
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


def _edge_scan(blocks, bs_edges, alpha, beta, tc0, luma: bool):
    """Filter all edges of one direction as a ``lax.scan`` over 4-sample
    blocks — the TPU-shaped formulation of the edge chain.

    The naive per-edge loop does a tiny (L, 8) dynamic slice + update of
    the whole plane per edge (~19 µs/edge on v5e ≈ 33 ms/frame at 1080p).
    Here the plane is pre-blocked to (n_blocks, 4, L) with the along-edge
    dimension LAST (vector lanes); the scan carries the current block —
    exactly the filter's data dependency (edge k modifies block k's tail
    and block k+1's head) — so each step is pure elementwise VPU work on
    static shapes. Bit-identical to _edge_pass (asserted by tests).

    blocks: (n_blocks, 4, L) int32; bs/alpha/beta/tc0: (n_blocks-1, L)
    (thresholds pre-looked-up via lookup_tables, ideally at block-row
    resolution). Returns filtered blocks, same shape.

    On TPU backends the chain runs as a single Pallas kernel
    (ops.deblock_pallas, bit-identical) — the XLA scan pays ~30 µs/step
    of op dispatch on tiny (4, L) blocks; VCP_PALLAS_DEBLOCK=0 opts out.
    """
    import os
    if (jax.default_backend() not in ("cpu",)
            and os.environ.get("VCP_PALLAS_DEBLOCK", "1") != "0"):
        from .deblock_pallas import edge_scan_pallas
        return edge_scan_pallas(blocks, bs_edges, alpha, beta, tc0, luma)
    bs_edges = jnp.asarray(bs_edges, jnp.int32)

    if luma:
        def step(carry, xs):
            nxt, bs, al, be, tc = xs
            p3, p2, p1, p0 = carry[0], carry[1], carry[2], carry[3]
            q0, q1, q2, q3 = nxt[0], nxt[1], nxt[2], nxt[3]
            op2, op1, op0, oq0, oq1, oq2 = filter_core_luma(
                p3, p2, p1, p0, q0, q1, q2, q3, bs, al, be, tc)
            return (jnp.stack([oq0, oq1, oq2, q3]),
                    jnp.stack([p3, op2, op1, op0]))
    else:
        def step(carry, xs):
            nxt, bs, al, be, tc = xs
            p1, p0 = carry[2], carry[3]
            q0, q1 = nxt[0], nxt[1]
            op0, oq0 = filter_core_chroma(p1, p0, q0, q1, bs, al, be, tc)
            return (jnp.stack([oq0, nxt[1], nxt[2], nxt[3]]),
                    jnp.stack([carry[0], carry[1], p1, op0]))

    carry, outs = jax.lax.scan(
        step, blocks[0], (blocks[1:], bs_edges, alpha, beta, tc0))
    return jnp.concatenate([outs, carry[None]], axis=0)


def _scan_pass(plane, bs_px, alpha_px, beta_px, tc0_px, luma: bool,
               transpose: bool):
    """One direction's full edge pass via _edge_scan. ``transpose=True``
    filters vertical edges (chain along x): the plane is transposed so
    the along-edge dim lands on vector lanes."""
    p = plane.T if transpose else plane
    n, l = p.shape
    out = _edge_scan(p.reshape(n // 4, 4, l), bs_px, alpha_px, beta_px,
                     tc0_px, luma)
    out = out.reshape(n, l)
    return out.T if transpose else out


def compute_bs_luma(intra_mb, nz_blk, mvq, vertical: bool):
    """Boundary strengths for all internal luma edges in one direction.

    intra_mb: (nMBy, nMBx) bool; nz_blk: (H/4, W/4) bool (block has
    residual); mvq: (nMBy, nMBx, 2) quarter-pel. Returns (n_edges, H/4 or
    W/4) int32 — transposed appropriately so edge e's values run along
    the edge.
    """
    if not vertical:
        intra_mb = intra_mb.T
        nz_blk = nz_blk.T
        mvq = jnp.swapaxes(mvq, 0, 1)
    bh, bw = nz_blk.shape
    # per-block expansions are repeat+shift (gather-free; edge j sits
    # between block cols j and j+1, j = 0..bw-2)
    intra_e4 = jnp.repeat(jnp.repeat(intra_mb, 4, 0), 4, 1)   # (bh, bw)
    intra_e = intra_e4[:, :-1] | intra_e4[:, 1:]
    j = np.arange(bw - 1)
    is_mb_edge = jnp.asarray(((j + 1) % 4 == 0)[None, :])
    nz_e = nz_blk[:, :-1] | nz_blk[:, 1:]
    mv_e = jnp.repeat(jnp.repeat(mvq, 4, 0), 4, 1)            # (bh, bw, 2)
    mv_diff = jnp.any(jnp.abs(mv_e[:, :-1] - mv_e[:, 1:]) >= 4, axis=-1)
    bs = jnp.where(
        intra_e,
        jnp.where(is_mb_edge, 4, 3),
        jnp.where(nz_e, 2, jnp.where(mv_diff, 1, 0)))
    return bs.T.astype(jnp.int32)          # (n_edges, bh)


def compute_qp_edges(qp_mb, vertical: bool, chroma: bool,
                     chroma_qp_table=None):
    """Per-edge averaged QP, expanded per block row: (n_edges, Hb)."""
    if not vertical:
        qp_mb = qp_mb.T
    if chroma:
        # gather-free 52-way select (tiny per-MB array, but generic
        # gathers are disproportionately slow on TPU)
        tbl = np.asarray(chroma_qp_table)
        qpc = jnp.zeros_like(qp_mb)
        idx = jnp.clip(qp_mb, 0, 51)
        for k in range(52):
            qpc = jnp.where(idx == k, int(tbl[k]), qpc)
        qp_mb = qpc
    blocks_per_mb = 2 if chroma else 4
    qp_e = jnp.repeat(jnp.repeat(qp_mb, blocks_per_mb, 0),
                      blocks_per_mb, 1)
    qp_p = qp_e[:, :-1]
    qp_q = qp_e[:, 1:]
    return (((qp_p + qp_q + 1) >> 1).T).astype(jnp.int32)


def deblock_frame(y, u, v, qp_mb, intra_mb, nz_y, mvq, chroma_qp_table):
    """Apply the full in-loop filter to one reconstructed frame.

    y: (H, W) int32 recon; u, v: (H/2, W/2); qp_mb (nMBy, nMBx) int32
    (PCM MBs carry 0); intra_mb bool; nz_y (H/4, W/4) bool; mvq
    (nMBy, nMBx, 2) quarter-pel (zeros for intra frames).
    Vertical edges first (full pass), then horizontal (spec 8.7).
    """
    y = jnp.asarray(y, jnp.int32)
    u = jnp.asarray(u, jnp.int32)
    v = jnp.asarray(v, jnp.int32)
    hc, wc = u.shape

    def expand(bs, qp, factor):
        """Threshold lookup at block-row resolution, then pixel expand."""
        al, be, tc = lookup_tables(bs, qp)
        return tuple(_repeat_rows(a, factor) for a in (bs, al, be, tc))

    # --- luma
    bs_v = compute_bs_luma(intra_mb, nz_y, mvq, vertical=True)
    qp_v = compute_qp_edges(qp_mb, True, False)
    y = _scan_pass(y, *expand(bs_v, qp_v, 4), luma=True, transpose=True)

    bs_h = compute_bs_luma(intra_mb, nz_y, mvq, vertical=False)
    qp_h = compute_qp_edges(qp_mb, False, False)
    y = _scan_pass(y, *expand(bs_h, qp_h, 4), luma=True, transpose=False)

    # --- chroma: only edges on the 8-px luma grid (every other luma
    # edge); u and v share bS/QP, so both planes ride one scan stacked
    # along the (along-edge) lane dimension
    def two(args):
        return tuple(jnp.concatenate([a, a], axis=1) for a in args)

    # chroma row yc maps to luma rows 2yc → luma block row yc//2, so
    # each luma-block-row bS value covers 2 chroma rows
    bs_cv_blk = bs_v[1::2]                # (n_ce, n_mby*4)
    qp_cv = _repeat_rows(compute_qp_edges(qp_mb, True, True,
                                          chroma_qp_table), 2)
    al, be, tc = lookup_tables(bs_cv_blk, qp_cv)
    cv_args = two((_repeat_rows(bs_cv_blk, 2), _repeat_rows(al, 2),
                   _repeat_rows(be, 2), _repeat_rows(tc, 2)))
    cv = jnp.concatenate([u.T, v.T], axis=1)          # (wc, 2*hc)
    cv = _edge_scan(cv.reshape(wc // 4, 4, 2 * hc), *cv_args,
                    luma=False).reshape(wc, 2 * hc)
    u, v = cv[:, :hc].T, cv[:, hc:].T

    bs_ch_blk = bs_h[1::2]
    qp_ch = _repeat_rows(compute_qp_edges(qp_mb, False, True,
                                          chroma_qp_table), 2)
    al, be, tc = lookup_tables(bs_ch_blk, qp_ch)
    ch_args = two((_repeat_rows(bs_ch_blk, 2), _repeat_rows(al, 2),
                   _repeat_rows(be, 2), _repeat_rows(tc, 2)))
    ch = jnp.concatenate([u, v], axis=1)              # (hc, 2*wc)
    ch = _edge_scan(ch.reshape(hc // 4, 4, 2 * wc), *ch_args,
                    luma=False).reshape(hc, 2 * wc)
    return y, ch[:, :wc], ch[:, wc:]