"""HEVC in-loop deblocking filter (spec 8.7.2), device ops + NumPy twin.

Unlike H.264's normatively sequential per-MB filter (ops.deblock's
wavefront), HEVC deblocking is embarrassingly parallel by construction:
ALL vertical edges of the picture filter first (reading unfiltered
samples), then ALL horizontal edges (reading the vertical pass's
output). Edges live on the 8x8 luma grid only, with per-4-line-segment
on/off and normal/strong decisions. This maps straight onto dense VPU
work — two whole-frame elementwise passes, no wavefront, no Pallas
needed.

Scope matching the current HEVC engine: uniform slice QP, bS uniform
per frame type (2 for intra pictures, derived from nz/mv grids for
inter), 4:2:0. Conformance is pinned by the system-ffmpeg hevc decoder
(tests/test_h265_e2e.py oracle checks).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# Table 8-12: beta' and tc' by Q.
BETA_TABLE = np.array(
    [0] * 16 + [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22,
                24, 26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50,
                52, 54, 56, 58, 60, 62, 64], np.int32)      # Q 0..51
TC_TABLE = np.array(
    [0] * 18 + [1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4,
                4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16, 18, 20,
                22, 24], np.int32)                           # Q 0..53


def _clip1(x, xp):
    return xp.clip(x, 0, 255)


def _luma_edge_filter(p, q, bs_seg, beta, tc_e, xp):
    """Filter one direction's luma edges.

    p, q: (..., n_seg, 4 lines, 4 samples) int32 — p[..., :, 3] is p0
    (adjacent to the edge), q[..., :, 0] is q0. bs_seg: (..., n_seg)
    int32 per-segment boundary strength; beta scalar; tc_e (..., n_seg)
    per-segment tc (already bS-indexed). Returns filtered (p, q).
    """
    p3 = p[..., 0]
    p2 = p[..., 1]
    p1 = p[..., 2]
    p0 = p[..., 3]
    q0 = q[..., 0]
    q1 = q[..., 1]
    q2 = q[..., 2]
    q3 = q[..., 3]
    # segment decisions from lines 0 and 3 (spec 8.7.2.5.3)
    dpl = xp.abs(p2 - 2 * p1 + p0)            # (..., n_seg, 4)
    dql = xp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = dpl[..., 0], dpl[..., 3]
    dq0, dq3 = dql[..., 0], dql[..., 3]
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3
    tc = tc_e
    filt = (bs_seg > 0) & (d < beta)

    def strong_line(i):
        return ((2 * (dpl[..., i] + dql[..., i]) < (beta >> 2))
                & (xp.abs(p3[..., i] - p0[..., i])
                   + xp.abs(q0[..., i] - q3[..., i]) < (beta >> 3))
                & (xp.abs(p0[..., i] - q0[..., i])
                   < ((5 * tc + 1) >> 1)))

    strong = strong_line(0) & strong_line(3)
    dep1 = (dp0 + dp3) < ((beta + (beta >> 1)) >> 3)
    deq1 = (dq0 + dq3) < ((beta + (beta >> 1)) >> 3)

    tc4 = tc[..., None]
    filt4 = filt[..., None]
    strong4 = (strong & filt)[..., None]
    # --- normal filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    small = xp.abs(delta) < 10 * tc4
    delta = xp.clip(delta, -tc4, tc4)
    np0 = _clip1(p0 + delta, xp)
    nq0 = _clip1(q0 - delta, xp)
    tc2 = tc4 >> 1
    dp1v = xp.clip((((p2 + p0 + 1) >> 1) - p1 + delta) >> 1, -tc2, tc2)
    dq1v = xp.clip((((q2 + q0 + 1) >> 1) - q1 - delta) >> 1, -tc2, tc2)
    np1 = _clip1(p1 + dp1v, xp)
    nq1 = _clip1(q1 + dq1v, xp)
    normal = filt4 & ~strong4 & small
    dep14 = dep1[..., None]
    deq14 = deq1[..., None]
    # --- strong filter (clips to +-2tc around the original sample)
    t2 = 2 * tc4

    def near(v, orig):
        return xp.clip(v, orig - t2, orig + t2)

    sp0 = near((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3, p0)
    sp1 = near((p2 + p1 + p0 + q0 + 2) >> 2, p1)
    sp2 = near((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3, p2)
    sq0 = near((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3, q0)
    sq1 = near((q2 + q1 + q0 + p0 + 2) >> 2, q1)
    sq2 = near((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3, q2)

    out_p0 = xp.where(strong4, sp0, xp.where(normal, np0, p0))
    out_p1 = xp.where(strong4, sp1,
                      xp.where(normal & dep14, np1, p1))
    out_p2 = xp.where(strong4, sp2, p2)
    out_q0 = xp.where(strong4, sq0, xp.where(normal, nq0, q0))
    out_q1 = xp.where(strong4, sq1,
                      xp.where(normal & deq14, nq1, q1))
    out_q2 = xp.where(strong4, sq2, q2)

    stk = jnp.stack if xp is jnp else np.stack
    pf = stk([p3, out_p2, out_p1, out_p0], axis=-1)
    qf = stk([out_q0, out_q1, out_q2, q3], axis=-1)
    return pf, qf


def _chroma_edge_filter(p, q, bs_seg, tc_e, xp):
    """Chroma edges filter only at bS==2 (intra): p (..., n, 2) cols
    [p1 p0], q (..., n, 2) cols [q0 q1]; per-line tc."""
    p1, p0 = p[..., 0], p[..., 1]
    q0, q1 = q[..., 0], q[..., 1]
    tc = tc_e
    delta = xp.clip((((q0 - p0) * 4) + p1 - q1 + 4) >> 3, -tc, tc)
    on = bs_seg == 2
    out_p0 = xp.where(on, _clip1(p0 + delta, xp), p0)
    out_q0 = xp.where(on, _clip1(q0 - delta, xp), q0)
    stk = jnp.stack if xp is jnp else np.stack
    return stk([p1, out_p0], axis=-1), stk([out_q0, q1], axis=-1)


def _vertical_pass_luma(y, bs_v, qp: int, xp):
    """bs_v: (H/4 segments? ...) — (n_edges, H/4) per vertical edge at
    x = 8*(e+1), per 4-line segment. y: (H, W)."""
    h, w = y.shape
    ne = w // 8 - 1
    beta = int(BETA_TABLE[min(max(qp, 0), 51)])
    blocks = y.reshape(h, w // 8, 8)
    p = blocks[:, :-1, 4:8]                  # (H, ne, 4)
    q = blocks[:, 1:, 0:4]
    # group rows by 4 → segments: (H/4, 4, ne, 4) → (ne, H/4, 4, 4)
    p = p.reshape(h // 4, 4, ne, 4).transpose(2, 0, 1, 3) if xp is np \
        else jnp.transpose(p.reshape(h // 4, 4, ne, 4), (2, 0, 1, 3))
    q = q.reshape(h // 4, 4, ne, 4).transpose(2, 0, 1, 3) if xp is np \
        else jnp.transpose(q.reshape(h // 4, 4, ne, 4), (2, 0, 1, 3))
    bs = bs_v                                 # (ne, H/4)
    tcq = np.asarray(TC_TABLE)
    tc1 = int(tcq[min(qp + 0, 53)])           # bS=1
    tc2 = int(tcq[min(qp + 2, 53)])           # bS=2
    tc_e = xp.where(bs == 2, tc2, tc1)
    pf, qf = _luma_edge_filter(p, q, bs, beta, tc_e, xp)
    # scatter back
    pf = pf.transpose(1, 2, 0, 3).reshape(h, ne, 4) if xp is np \
        else jnp.transpose(pf, (1, 2, 0, 3)).reshape(h, ne, 4)
    qf = qf.transpose(1, 2, 0, 3).reshape(h, ne, 4) if xp is np \
        else jnp.transpose(qf, (1, 2, 0, 3)).reshape(h, ne, 4)
    if xp is np:
        blocks = blocks.copy()
        blocks[:, :-1, 4:8] = pf
        blocks[:, 1:, 0:4] = qf
        return blocks.reshape(h, w)
    blocks = blocks.at[:, :-1, 4:8].set(pf)
    blocks = blocks.at[:, 1:, 0:4].set(qf)
    return blocks.reshape(h, w)


def _vertical_pass_chroma(c, bs_v, qpc: int, xp):
    """Chroma vertical edges on the 8-chroma-sample grid (16 luma px).
    bs_v: (ne_c, Hc) per chroma edge per LINE."""
    hc, wc = c.shape
    ne = wc // 8 - 1
    blocks = c.reshape(hc, wc // 8, 8)
    p = blocks[:, :-1, 6:8]                  # (Hc, ne, 2)
    q = blocks[:, 1:, 0:2]
    p = p.transpose(1, 0, 2) if xp is np else jnp.transpose(p, (1, 0, 2))
    q = q.transpose(1, 0, 2) if xp is np else jnp.transpose(q, (1, 0, 2))
    tc = int(TC_TABLE[min(qpc + 2, 53)])
    tc_e = xp.full(bs_v.shape, tc, xp.int32) if xp is np \
        else jnp.full(bs_v.shape, tc, jnp.int32)
    pf, qf = _chroma_edge_filter(p, q, bs_v, tc_e, xp)
    pf = pf.transpose(1, 0, 2) if xp is np else jnp.transpose(pf, (1, 0, 2))
    qf = qf.transpose(1, 0, 2) if xp is np else jnp.transpose(qf, (1, 0, 2))
    if xp is np:
        blocks = blocks.copy()
        blocks[:, :-1, 6:8] = pf
        blocks[:, 1:, 0:2] = qf
        return blocks.reshape(hc, wc)
    blocks = blocks.at[:, :-1, 6:8].set(pf)
    blocks = blocks.at[:, 1:, 0:2].set(qf)
    return blocks.reshape(hc, wc)


def _bs_grids(intra: bool, nz32, mv, h, w, xp):
    """(bs_v (ne, H/4), bs_h (ne_h, W/4)) luma boundary strengths.

    Current engine granularity: 32x32 CUs/TUs, one MV per CTU. bS=2 on
    every 8-grid edge of an intra picture; for P pictures bS=1 on CTU
    boundaries where the MV differs by >= 4 quarter-pel or either side
    has coded coefficients; interior edges of a CTU are transform-
    interior (no edge) → bS=0.
    """
    if intra:
        # only TU/PU boundaries are filtered (spec 8.7.2.2): with one
        # 32x32 CU/TU per CTU those are the 32-grid edges (e = 4k+3)
        bs_v = xp.zeros((w // 8 - 1, h // 4), xp.int32)
        bs_h = xp.zeros((h // 8 - 1, w // 4), xp.int32)
        if xp is np:
            bs_v[3::4] = 2
            bs_h[3::4] = 2
        else:
            bs_v = bs_v.at[3::4].set(2)
            bs_h = bs_h.at[3::4].set(2)
        return bs_v, bs_h
    def one_dir(nz, mvg, hh, ww):
        # vertical edges between CTU cols of an (hh, ww) plane; only
        # every 4th 8-edge is a CTU boundary (32/8)
        diff = xp.any(xp.abs(mvg[:, :-1] - mvg[:, 1:]) >= 4, axis=-1)
        nz_e = nz[:, :-1] | nz[:, 1:]
        bs_ctu = xp.where(diff | nz_e, 1, 0)    # (hh/32, ww/32-1)
        ne = (ww // 8) - 1
        bs = xp.zeros((hh // 4, ne), xp.int32)
        # CTU-boundary edges sit at e = 4k+3 (x = 32(k+1))
        col = xp.repeat(bs_ctu, 8, axis=0)      # rows → 8 segs per CTU
        if xp is np:
            bs[:, 3::4] = col
        else:
            bs = bs.at[:, 3::4].set(col)
        return bs.T                              # (ne, hh/4)

    bs_v = one_dir(nz32, mv, h, w)
    bs_h = one_dir(nz32.T, xp.swapaxes(mv, 0, 1), w, h)
    return bs_v, bs_h


def deblock_frame_hevc(y, u, v, qp: int, qpc: int, intra: bool,
                       nz32=None, mv=None, xp=jnp):
    """Deblock one reconstructed picture (device by default, xp=np for
    the host validation decoder — bit-identical by construction).

    y (H, W) int32 (H, W multiples of 32); u/v (H/2, W/2); ``nz32``
    (H/32, W/32) bool per-CTU any-coeff flags and ``mv`` (H/32, W/32, 2)
    quarter-pel MVs for P pictures (ignored for intra).
    """
    h, w = y.shape
    if not intra and (nz32 is None or mv is None):
        raise ValueError("P-picture deblock needs nz32 + mv grids")
    bs_v, bs_h = _bs_grids(intra, nz32, mv, h, w, xp)
    y = _vertical_pass_luma(y, bs_v, qp, xp)
    y = _vertical_pass_luma(
        y.T if xp is np else jnp.swapaxes(y, 0, 1), bs_h, qp, xp)
    y = y.T if xp is np else jnp.swapaxes(y, 0, 1)

    # chroma: edges on the 16-luma-px grid AND on a TU boundary — with
    # 16x16 chroma TUs those are the chroma 16-grid edges (e = 2k+1);
    # bS=2 (intra) only
    hc, wc = u.shape
    if intra:
        bs_cv = xp.zeros((wc // 8 - 1, hc), xp.int32)
        bs_ch = xp.zeros((hc // 8 - 1, wc), xp.int32)
        if xp is np:
            bs_cv[1::2] = 2
            bs_ch[1::2] = 2
        else:
            bs_cv = bs_cv.at[1::2].set(2)
            bs_ch = bs_ch.at[1::2].set(2)
        u = _vertical_pass_chroma(u, bs_cv, qpc, xp)
        v = _vertical_pass_chroma(v, bs_cv, qpc, xp)
        ut = u.T if xp is np else jnp.swapaxes(u, 0, 1)
        vt = v.T if xp is np else jnp.swapaxes(v, 0, 1)
        ut = _vertical_pass_chroma(ut, bs_ch, qpc, xp)
        vt = _vertical_pass_chroma(vt, bs_ch, qpc, xp)
        u = ut.T if xp is np else jnp.swapaxes(ut, 0, 1)
        v = vt.T if xp is np else jnp.swapaxes(vt, 0, 1)
    return y, u, v
