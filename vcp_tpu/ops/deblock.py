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


def _filter_segment_luma(seg, bs, qp_av):
    """Filter one vertical luma edge for all rows.

    seg: (H, 8) int32 columns [p3 p2 p1 p0 | q0 q1 q2 q3];
    bs:  (H,) boundary strength; qp_av: (H,) averaged QP.
    Returns the filtered (H, 8) segment.
    """
    p3, p2, p1, p0 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    q0, q1, q2, q3 = seg[:, 4], seg[:, 5], seg[:, 6], seg[:, 7]
    idx = jnp.clip(qp_av, 0, 51)
    alpha = jnp.asarray(ALPHA)[idx]
    beta = jnp.asarray(BETA)[idx]

    filt = ((bs > 0)
            & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    ap = jnp.abs(p2 - p0) < beta
    aq = jnp.abs(q2 - q0) < beta

    # --- normal filter (bS 1..3)
    tc0 = jnp.asarray(TC0)[jnp.clip(bs, 1, 3) - 1, idx]
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
    return jnp.stack([p3, out_p2, out_p1, out_p0,
                      out_q0, out_q1, out_q2, q3], axis=1)


def _filter_segment_chroma(seg, bs, qp_av):
    """Chroma edge filter: seg (H, 4) columns [p1 p0 | q0 q1]."""
    p1, p0, q0, q1 = seg[:, 0], seg[:, 1], seg[:, 2], seg[:, 3]
    idx = jnp.clip(qp_av, 0, 51)
    alpha = jnp.asarray(ALPHA)[idx]
    beta = jnp.asarray(BETA)[idx]
    filt = ((bs > 0)
            & (jnp.abs(p0 - q0) < alpha)
            & (jnp.abs(p1 - p0) < beta)
            & (jnp.abs(q1 - q0) < beta))
    tc0 = jnp.asarray(TC0)[jnp.clip(bs, 1, 3) - 1, idx]
    tc = tc0 + 1
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = _clip1(p0 + delta)
    nq0 = _clip1(q0 - delta)
    sp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    out_p0 = jnp.where(filt, jnp.where(is4, sp0, np0), p0)
    out_q0 = jnp.where(filt, jnp.where(is4, sq0, nq0), q0)
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
    mb_of_blk = jnp.arange(bw) // 4
    # blocks p = col j, q = col j+1 for edge j (j = 0..bw-2)
    j = jnp.arange(bw - 1)
    mb_p = mb_of_blk[j]
    mb_q = mb_of_blk[j + 1]
    rows_mb = jnp.arange(bh) // 4
    intra_p = intra_mb[rows_mb[:, None], mb_p[None, :]]
    intra_q = intra_mb[rows_mb[:, None], mb_q[None, :]]
    intra_e = intra_p | intra_q
    is_mb_edge = ((j + 1) % 4 == 0)[None, :]
    nz_e = nz_blk[:, :-1] | nz_blk[:, 1:]
    mv_p = mvq[rows_mb[:, None], mb_p[None, :]]
    mv_q = mvq[rows_mb[:, None], mb_q[None, :]]
    mv_diff = jnp.any(jnp.abs(mv_p - mv_q) >= 4, axis=-1)
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
    n_mby, n_mbx = qp_mb.shape
    if chroma:
        qp_mb = jnp.asarray(chroma_qp_table)[jnp.clip(qp_mb, 0, 51)]
    blocks_per_mb = 2 if chroma else 4
    bw = n_mbx * blocks_per_mb
    j = jnp.arange(bw - 1)
    mb_p = j // blocks_per_mb
    mb_q = (j + 1) // blocks_per_mb
    rows = jnp.arange(n_mby * blocks_per_mb) // blocks_per_mb
    qp_p = qp_mb[rows[:, None], mb_p[None, :]]
    qp_q = qp_mb[rows[:, None], mb_q[None, :]]
    return (((qp_p + qp_q + 1) >> 1).T).astype(jnp.int32)


def deblock_frame(y, u, v, qp_mb, intra_mb, nz_y, mvq, chroma_qp_table):
    """Apply the full in-loop filter to one reconstructed frame.

    y: (H, W) int32 recon; u, v: (H/2, W/2); qp_mb (nMBy, nMBx) int32
    (PCM MBs carry 0); intra_mb bool; nz_y (H/4, W/4) bool; mvq
    (nMBy, nMBx, 2) quarter-pel (zeros for intra frames).
    Vertical edges first (full pass), then horizontal (spec 8.7).
    """
    h, w = y.shape
    # --- luma
    bs_v = compute_bs_luma(intra_mb, nz_y, mvq, vertical=True)
    qp_v = compute_qp_edges(qp_mb, True, False)
    bs_vr = _repeat_rows(bs_v, 4)
    qp_vr = _repeat_rows(qp_v, 4)
    y = _edge_pass(y, bs_vr, qp_vr, luma=True)

    bs_h = compute_bs_luma(intra_mb, nz_y, mvq, vertical=False)
    qp_h = compute_qp_edges(qp_mb, False, False)
    y = _edge_pass(y.T, _repeat_rows(bs_h, 4), _repeat_rows(qp_h, 4),
                   luma=True).T

    # --- chroma: only edges on the 8-px luma grid (every other luma edge)
    def chroma_plane(c):
        # chroma row yc maps to luma rows 2yc → luma block row yc//2, so
        # each luma-block-row bS value covers 2 chroma rows
        bs_cv = bs_v[1::2]                      # luma edges at x%8==0
        qp_cv = compute_qp_edges(qp_mb, True, True, chroma_qp_table)
        c1 = _edge_pass(c, _repeat_rows(bs_cv, 2),
                        _repeat_rows(qp_cv, 4), luma=False)
        bs_ch = bs_h[1::2]
        qp_ch = compute_qp_edges(qp_mb, False, True, chroma_qp_table)
        return _edge_pass(c1.T, _repeat_rows(bs_ch, 2),
                          _repeat_rows(qp_ch, 4), luma=False).T

    u = chroma_plane(u)
    v = chroma_plane(v)
    return y, u, v