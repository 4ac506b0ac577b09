"""RD-selected Intra_16x16 frame encode (device, wavefront).

The baseline intra path (frame_ops.encode_iframe) fixes the prediction
mode by MB row (row 0 DC, rows 1.. Vertical) so the whole frame
vectorizes as a scan over rows. That is the speed-preset path. This
module is the quality-preset path: every MB picks its luma I16 mode
(Vertical / Horizontal / DC / Plane, spec 8.3.3) and its chroma mode
(DC / Horizontal / Vertical / Plane, spec 8.3.4) by rate-distortion
cost (SSD + lambda2 * bits estimate), mirroring x264's I16 analysis
(the reference serves `libx264 -preset medium`,
ref internal/config/config.go:49).

TPU-first shape: Horizontal/Plane/DC read the *left* neighbor's recon
column, so MBs in a row are no longer independent. Instead of a
per-MB loop (n_mby*n_mbx sequential steps) the frame runs as a
`lax.scan` over ANTI-DIAGONALS: every MB on diagonal d = mby+mbx
depends only on diagonals d-1 (left, top) and d-2 (top-left), so each
of the n_mby+n_mbx-1 steps processes a whole diagonal vectorized
(all four candidate modes transform/quantize/reconstruct in parallel
on the VPU, then argmin picks per MB).

All arithmetic is int32-exact; the chosen recon is bit-identical to
what any spec decoder produces from the emitted levels + modes
(asserted against both our decoder and the ffmpeg oracle in
tests/test_h264_intra_rd.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import transform as tf
from .frame_ops import LUMA_BLK_ORDER, _zigzag


def _diagonal_maps(n_mby: int, n_mbx: int):
    """Static wavefront index maps.

    Returns (MBY, MBX, VALID) each (D, L) and the inverse gather maps
    (DMAP, KMAP) each (n_mby, n_mbx) with
    stacked[DMAP[y,x], KMAP[y,x]] == cell (y, x).
    """
    D = n_mby + n_mbx - 1
    L = min(n_mby, n_mbx)
    MBY = np.zeros((D, L), np.int32)
    MBX = np.zeros((D, L), np.int32)
    VALID = np.zeros((D, L), bool)
    DMAP = np.zeros((n_mby, n_mbx), np.int32)
    KMAP = np.zeros((n_mby, n_mbx), np.int32)
    for d in range(D):
        i0 = max(0, d - n_mbx + 1)
        i1 = min(d, n_mby - 1)
        for k, mby in enumerate(range(i0, i1 + 1)):
            mbx = d - mby
            MBY[d, k] = mby
            MBX[d, k] = mbx
            VALID[d, k] = True
            DMAP[mby, mbx] = d
            KMAP[mby, mbx] = k
    return MBY, MBX, VALID, DMAP, KMAP


def _plane_pred(text, lext, size: int):
    """Plane prediction (spec 8.3.3.4 luma size=16 / 8.3.4.4 chroma
    size=8). text/lext: (L, size+1) int32 with [:, 0] = the above-left
    corner, [:, 1:] = the top row / left column."""
    half = size // 2
    w = jnp.arange(1, half + 1, dtype=jnp.int32)
    hh = (w * (text[:, half + 1:] - jnp.flip(text[:, :half], 1))).sum(1)
    vv = (w * (lext[:, half + 1:] - jnp.flip(lext[:, :half], 1))).sum(1)
    a = 16 * (text[:, size] + lext[:, size])
    if size == 16:
        b = (5 * hh + 32) >> 6
        c = (5 * vv + 32) >> 6
    else:
        b = (17 * hh + 16) >> 5
        c = (17 * vv + 16) >> 5
    xs = jnp.arange(size, dtype=jnp.int32) - (half - 1)
    grid = (a[:, None, None] + b[:, None, None] * xs[None, None, :]
            + c[:, None, None] * xs[None, :, None] + 16) >> 5
    return jnp.clip(grid, 0, 255)


def _bits_proxy(levels):
    """~2*log2(|z|)+1.7 bits per nonzero level (same currency as the
    gop_ops t8 RD decision)."""
    a = jnp.abs(levels.astype(jnp.float32))
    return jnp.where(a > 0, 2.0 * jnp.log2(a + 1.0) + 1.7, 0.0).sum(
        axis=tuple(range(2, levels.ndim)))


def _luma_modes(cur, top, left, corner, avt, avl, qp, lam2):
    """Batched I16 luma mode trial. cur (L,16,16); top/left (L,16);
    corner (L,); avt/avl (L,) bool. Returns per-lane chosen
    (mode (L,), z_dc (L,16) zigzag, z_ac (L,16,16) coding order+zigzag,
    recon (L,16,16))."""
    L = cur.shape[0]
    pred_v = jnp.broadcast_to(top[:, None, :], (L, 16, 16))
    pred_h = jnp.broadcast_to(left[:, :, None], (L, 16, 16))
    st, sl = top.sum(1), left.sum(1)
    dc = jnp.where(avt & avl, (st + sl + 16) >> 5,
                   jnp.where(avt, (st + 8) >> 4,
                             jnp.where(avl, (sl + 8) >> 4, 128)))
    pred_dc = jnp.broadcast_to(dc[:, None, None], (L, 16, 16))
    text = jnp.concatenate([corner[:, None], top], 1)
    lext = jnp.concatenate([corner[:, None], left], 1)
    pred_pl = _plane_pred(text, lext, 16)
    preds = jnp.stack([pred_v, pred_h, pred_dc, pred_pl])  # (4,L,16,16)
    allowed = jnp.stack([avt, avl, jnp.ones_like(avt),
                         avt & avl])                       # (4,L)

    res = cur[None] - preds
    blocks = jnp.moveaxis(res.reshape(4, L, 4, 4, 4, 4), 3, 4)
    coef = tf.fdct4(blocks)                                # (4,L,4,4,4,4)
    dc_mb = coef[..., 0, 0]                                # (4,L,4,4)
    z_dc = tf.quant_dc4(tf.hadamard4(dc_mb) >> 1, qp)
    z_ac = tf.quant4(coef, qp, intra=True)
    dc_rec = tf.dequant_dc4(z_dc, qp)
    w_rec = tf.dequant4(z_ac, qp)
    w_rec = w_rec.at[..., 0, 0].set(dc_rec)
    res_rec = jnp.moveaxis(tf.idct4(w_rec), 4, 3).reshape(4, L, 16, 16)
    recon = jnp.clip(preds + res_rec, 0, 255)

    ssd = ((cur[None] - recon).astype(jnp.float32) ** 2).sum(axis=(2, 3))
    ac_lv = z_ac.at[..., 0, 0].set(0)
    bits = _bits_proxy(ac_lv) + _bits_proxy(z_dc)
    cost = jnp.where(allowed, ssd + lam2 * bits, jnp.inf)
    mode = jnp.argmin(cost, axis=0).astype(jnp.int32)      # (L,)

    lane = jnp.arange(L)
    z_dc_b = z_dc[mode, lane]                              # (L,4,4)
    z_ac_b = z_ac[mode, lane]                              # (L,4,4,4,4)
    recon_b = recon[mode, lane]
    # entropy layout: DC zigzag; AC blocks in coding order, zigzagged
    by, bx = LUMA_BLK_ORDER[:, 0], LUMA_BLK_ORDER[:, 1]
    z_ac_ord = z_ac_b[:, by, bx]                           # (L,16,4,4)
    return (mode, _zigzag(z_dc_b), _zigzag(z_ac_ord), recon_b,
            cost[mode, lane])


_I8_TABS_J = None


def _i8_tables():
    """Stacked (6, 3, 8, 8) gather tables for directional modes 3..8
    (decoder._build_intra_tables(8) — the same normative index maps the
    bit-exact foreign decoder uses)."""
    global _I8_TABS_J
    if _I8_TABS_J is None:
        from .decoder import _I8_TABS
        _I8_TABS_J = np.stack([np.stack(_I8_TABS[m]) for m in range(3, 9)])
    return _I8_TABS_J


def _i8_filter_refs(t, le, m, avt, avl, avtl):
    """Spec 8.3.2.2.1 reference filtering, batched over lanes.
    t (L,16) top incl. top-right (caller already substituted t[7] for
    unavailable top-right), le (L,8), m (L,). All int32."""
    mf = jnp.where(avt & avl & avtl,
                   (t[:, 0] + 2 * m + le[:, 0] + 2) >> 2, m)
    t0 = jnp.where(avtl & avl,
                   (m + 2 * t[:, 0] + t[:, 1] + 2) >> 2,
                   (3 * t[:, 0] + t[:, 1] + 2) >> 2)
    tmid = (t[:, :-2] + 2 * t[:, 1:-1] + t[:, 2:] + 2) >> 2   # x=1..14
    t15 = (t[:, 14] + 3 * t[:, 15] + 2) >> 2
    ft = jnp.concatenate([t0[:, None], tmid[:, :14], t15[:, None]], axis=1)
    ft = jnp.where(avt[:, None], ft, t)
    l0 = jnp.where(avtl & avt,
                   (m + 2 * le[:, 0] + le[:, 1] + 2) >> 2,
                   (3 * le[:, 0] + le[:, 1] + 2) >> 2)
    lmid = (le[:, :-2] + 2 * le[:, 1:-1] + le[:, 2:] + 2) >> 2  # y=1..6
    l7 = (le[:, 6] + 3 * le[:, 7] + 2) >> 2
    fle = jnp.concatenate([l0[:, None], lmid, l7[:, None]], axis=1)
    fle = jnp.where(avl[:, None], fle, le)
    return ft, fle, jnp.where(avtl, mf, m)


# availability required per i8 mode 0..8: (needs_top, needs_left)
_I8_NEED_T = np.array([1, 0, 0, 1, 1, 1, 1, 1, 0], bool)
_I8_NEED_L = np.array([0, 1, 0, 0, 1, 1, 1, 0, 1], bool)


def _i8_block_trial(cur8, t_raw, le_raw, m_raw, avt, avl, avtl, avtr,
                    qp, lam2, pred_mode):
    """One 8x8 intra block, all 9 modes batched over lanes.

    cur8 (L,8,8); t_raw (L,16) top incl. top-right; le_raw (L,8);
    m_raw (L,); av* (L,) bool; pred_mode (L,) the spec-predicted mode
    for the 1-bit prev flag. Returns (mode (L,), z64 (L,64) zigzag,
    recon (L,8,8), cost (L,))."""
    from ...ops import transform8 as t8ops
    L = cur8.shape[0]
    # unavailable top-right -> replicate t[7] (spec substitution)
    t_raw = jnp.concatenate(
        [t_raw[:, :8],
         jnp.where(avtr[:, None], t_raw[:, 8:], t_raw[:, 7:8])], axis=1)
    t, le, m = _i8_filter_refs(t_raw, le_raw, m_raw, avt, avl, avtl)
    pred_v = jnp.broadcast_to(t[:, None, :8], (L, 8, 8))
    pred_h = jnp.broadcast_to(le[:, :, None], (L, 8, 8))
    st, sl = t[:, :8].sum(1), le.sum(1)
    dc = jnp.where(avt & avl, (st + sl + 8) >> 4,
                   jnp.where(avt, (st + 4) >> 3,
                             jnp.where(avl, (sl + 4) >> 3, 128)))
    pred_dc = jnp.broadcast_to(dc[:, None, None], (L, 8, 8))
    # directional modes via the normative gather tables over
    # r = [left(8) | corner | top(16)]
    r = jnp.concatenate([le, m[:, None], t], axis=1)       # (L, 25)
    tabs = jnp.asarray(_i8_tables())                       # (6,3,8,8)
    Ia, Ic, Ib = tabs[:, 0], tabs[:, 1], tabs[:, 2]
    rd_ = r[:, None]                                       # (L,1,25)
    pred_dir = (rd_[:, :, Ia.reshape(6, 64)].reshape(L, 6, 8, 8)
                + 2 * rd_[:, :, Ib.reshape(6, 64)].reshape(L, 6, 8, 8)
                + rd_[:, :, Ic.reshape(6, 64)].reshape(L, 6, 8, 8)
                + 2) >> 2
    preds = jnp.concatenate(
        [jnp.stack([pred_v, pred_h, pred_dc], axis=1), pred_dir],
        axis=1)                                            # (L,9,8,8)
    allowed = (jnp.where(jnp.asarray(_I8_NEED_T)[None, :],
                         avt[:, None], True)
               & jnp.where(jnp.asarray(_I8_NEED_L)[None, :],
                           avl[:, None], True))            # (L,9)

    res = cur8[:, None] - preds                            # (L,9,8,8)
    z = t8ops.quant8(t8ops.fdct8(res), qp, intra=True)
    rec = jnp.clip(preds + t8ops.idct8(t8ops.dequant8(z, qp)), 0, 255)
    ssd = ((cur8[:, None] - rec).astype(jnp.float32) ** 2).sum((2, 3))
    lbits = _bits_proxy(z.reshape(L, 9, 64))
    # prev_intra8x8_pred_mode: 1 bin if predicted, else 1 + 3 bins
    mbits = jnp.where(jnp.arange(9)[None, :] == pred_mode[:, None],
                      1.0, 4.0)
    cost = jnp.where(allowed, ssd + lam2 * (lbits + mbits), jnp.inf)
    mode = jnp.argmin(cost, axis=1).astype(jnp.int32)
    lane = jnp.arange(L)
    z64 = t8ops.zigzag8(z[lane, mode][:, None, None]).reshape(L, 64)
    return mode, z64, rec[lane, mode], cost[lane, mode]


def _chroma_dc_pred(top, left, avt, avl):
    """Chroma DC prediction, per-4x4-sub-block neighbor rules
    (spec 8.3.4.2). top/left (L,8). Returns (L,8,8)."""
    st0, st1 = top[:, :4].sum(1), top[:, 4:].sum(1)
    sl0, sl1 = left[:, :4].sum(1), left[:, 4:].sum(1)

    def mix(s_t, s_l, use_both):
        both = (s_t + s_l + 4) >> 3
        t_only = (s_t + 2) >> 2
        l_only = (s_l + 2) >> 2
        return jnp.where(avt & avl & use_both, both,
                         jnp.where(avt & (use_both | ~avl), t_only,
                                   jnp.where(avl, l_only, 128)))

    dc00 = mix(st0, sl0, True)
    # corner blocks prefer one side: (0,1) top (fallback left),
    # (1,0) left (fallback top)
    dc01 = jnp.where(avt, (st1 + 2) >> 2,
                     jnp.where(avl, (sl0 + 2) >> 2, 128))
    dc10 = jnp.where(avl, (sl1 + 2) >> 2,
                     jnp.where(avt, (st0 + 2) >> 2, 128))
    dc11 = mix(st1, sl1, True)
    q = jnp.stack([jnp.stack([dc00, dc01], -1),
                   jnp.stack([dc10, dc11], -1)], -2)       # (L,2,2)
    return jnp.repeat(jnp.repeat(q, 4, -2), 4, -1)


def _chroma_mode_trials(cur, top, left, corner, avt, avl, qpc):
    """Candidate chroma predictions + residual trial for one plane.
    Returns (z_dc (4,L,2,2), z_ac (4,L,2,2,4,4), recon (4,L,8,8),
    ssd (4,L), bits (4,L))."""
    L = cur.shape[0]
    pred_dc = _chroma_dc_pred(top, left, avt, avl)
    pred_h = jnp.broadcast_to(left[:, :, None], (L, 8, 8))
    pred_v = jnp.broadcast_to(top[:, None, :], (L, 8, 8))
    text = jnp.concatenate([corner[:, None], top], 1)
    lext = jnp.concatenate([corner[:, None], left], 1)
    pred_pl = _plane_pred(text, lext, 8)
    preds = jnp.stack([pred_dc, pred_h, pred_v, pred_pl])  # (4,L,8,8)

    res = cur[None] - preds
    blocks = jnp.moveaxis(res.reshape(4, L, 2, 4, 2, 4), 3, 4)
    coef = tf.fdct4(blocks)                                # (4,L,2,2,4,4)
    dc_mb = coef[..., 0, 0]                                # (4,L,2,2)
    z_dc = tf.quant_dc2(tf.hadamard2(dc_mb), qpc, intra=True)
    z_ac = tf.quant4(coef, qpc, intra=True)
    dc_rec = tf.dequant_dc2(z_dc, qpc)
    w_rec = tf.dequant4(z_ac, qpc)
    w_rec = w_rec.at[..., 0, 0].set(dc_rec)
    res_rec = jnp.moveaxis(tf.idct4(w_rec), 4, 3).reshape(4, L, 8, 8)
    recon = jnp.clip(preds + res_rec, 0, 255)
    ssd = ((cur[None] - recon).astype(jnp.float32) ** 2).sum(axis=(2, 3))
    ac_lv = z_ac.at[..., 0, 0].set(0)
    bits = _bits_proxy(ac_lv) + _bits_proxy(z_dc)
    return z_dc, z_ac, recon, ssd, bits


# intra_chroma_pred_mode ue(v) bit cost per mode 0..3
_CHROMA_UE_BITS = np.array([1.0, 3.0, 3.0, 5.0], np.float32)


@functools.partial(jax.jit, static_argnums=(5,))
def encode_iframe_rd(y, u, v, qp, qpc, deblock: bool = False):
    """Encode one intra frame with per-MB RD mode selection.

    y: (H, W) uint8/int32 (multiples of 16, pre-padded);
    u, v: (H/2, W/2). Returns the same dict as frame_ops.encode_iframe
    plus "modes" / "cmodes" (n_mby, n_mbx) int32 arrays.
    """
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    h, w = y.shape
    n_mby, n_mbx = h // 16, w // 16
    MBY, MBX, VALID, DMAP, KMAP = _diagonal_maps(n_mby, n_mbx)
    D, L = MBY.shape
    lam2 = 0.9 * jnp.power(2.0, (qp - 12) / 3.0)
    lam2c = 0.9 * jnp.power(2.0, (qpc - 12) / 3.0)

    ymb = jnp.moveaxis(y.reshape(n_mby, 16, n_mbx, 16), 1, 2)
    umb = jnp.moveaxis(u.reshape(n_mby, 8, n_mbx, 8), 1, 2)
    vmb = jnp.moveaxis(v.reshape(n_mby, 8, n_mbx, 8), 1, 2)

    # padded recon planes: +1 top/left border (masked by availability),
    # +16/+8 bottom trash rows for invalid-lane scatters
    py0 = jnp.zeros((h + 17, w + 1), jnp.int32)
    pu0 = jnp.zeros((h // 2 + 9, w // 2 + 1), jnp.int32)
    pv0 = jnp.zeros((h // 2 + 9, w // 2 + 1), jnp.int32)

    a16 = jnp.arange(16)
    a8 = jnp.arange(8)

    def gather_edges(P, y0, x0, n):
        ar = a16 if n == 16 else a8
        top = P[(y0 - 1)[:, None], x0[:, None] + ar[None, :]]
        left = P[y0[:, None] + ar[None, :], (x0 - 1)[:, None]]
        corner = P[y0 - 1, x0 - 1]
        return top, left, corner

    def scatter(P, y0, x0, blk, n):
        ar = a16 if n == 16 else a8
        rg = y0[:, None, None] + ar[None, :, None]
        cg = x0[:, None, None] + ar[None, None, :]
        return P.at[rg, cg].set(blk)

    def step(carry, xs):
        py, pu, pv = carry
        mby, mbx, valid = xs
        avt = (mby > 0) & valid
        avl = (mbx > 0) & valid
        mbyc = jnp.where(valid, mby, 0)
        mbxc = jnp.where(valid, mbx, 0)

        # luma
        y0 = mbyc * 16 + 1
        x0 = mbxc * 16 + 1
        cur = ymb[mbyc, mbxc]
        top, left, corner = gather_edges(py, y0, x0, 16)
        mode, z_dc, z_ac, recon, _cost = _luma_modes(
            cur, top, left, corner, avt, avl, qp, lam2)
        y0s = jnp.where(valid, y0, h + 1)
        py = scatter(py, y0s, x0, recon, 16)

        # chroma: shared mode across Cb/Cr, chosen jointly
        c0 = mbyc * 8 + 1
        cx0 = mbxc * 8 + 1
        curu = umb[mbyc, mbxc]
        curv = vmb[mbyc, mbxc]
        topu, leftu, cornu = gather_edges(pu, c0, cx0, 8)
        topv, leftv, cornv = gather_edges(pv, c0, cx0, 8)
        udc, uac, urec, ussd, ubits = _chroma_mode_trials(
            curu, topu, leftu, cornu, avt, avl, qpc)
        vdc, vac, vrec, vssd, vbits = _chroma_mode_trials(
            curv, topv, leftv, cornv, avt, avl, qpc)
        callowed = jnp.stack([jnp.ones_like(avt), avl, avt, avt & avl])
        ccost = jnp.where(
            callowed,
            ussd + vssd + lam2c * (ubits + vbits
                                   + jnp.asarray(_CHROMA_UE_BITS)[:, None]),
            jnp.inf)
        cmode = jnp.argmin(ccost, axis=0).astype(jnp.int32)
        lane = jnp.arange(L)
        cb_dc = udc[cmode, lane].reshape(L, 4)
        cr_dc = vdc[cmode, lane].reshape(L, 4)
        cb_ac = _zigzag(uac[cmode, lane].reshape(L, 4, 4, 4))
        cr_ac = _zigzag(vac[cmode, lane].reshape(L, 4, 4, 4))
        c0s = jnp.where(valid, c0, h // 2 + 1)
        pu = scatter(pu, c0s, cx0, urec[cmode, lane], 8)
        pv = scatter(pv, c0s, cx0, vrec[cmode, lane], 8)

        return (py, pu, pv), (mode, z_dc, z_ac, cmode,
                              cb_dc, cb_ac, cr_dc, cr_ac)

    (py, pu, pv), outs = jax.lax.scan(
        step, (py0, pu0, pv0),
        (jnp.asarray(MBY), jnp.asarray(MBX), jnp.asarray(VALID)))
    (modes_s, zdc_s, zac_s, cmodes_s,
     cbdc_s, cbac_s, crdc_s, crac_s) = outs

    dm, km = jnp.asarray(DMAP), jnp.asarray(KMAP)

    def unshuffle(a):
        return a[dm, km]

    recon_y = py[1:h + 1, 1:w + 1]
    recon_u = pu[1:h // 2 + 1, 1:w // 2 + 1]
    recon_v = pv[1:h // 2 + 1, 1:w // 2 + 1]

    if deblock:
        from ...ops import deblock as dbf
        qp_mb = jnp.full((n_mby, n_mbx), qp, jnp.int32)
        intra = jnp.ones((n_mby, n_mbx), bool)
        nz = jnp.zeros((h // 4, w // 4), bool)  # unused for all-intra
        mvq = jnp.zeros((n_mby, n_mbx, 2), jnp.int32)
        recon_y, recon_u, recon_v = dbf.deblock_frame(
            recon_y, recon_u, recon_v, qp_mb, intra, nz, mvq,
            tf.CHROMA_QP_FULL)

    return {
        "luma_dc": unshuffle(zdc_s), "luma_ac": unshuffle(zac_s),
        "cb_dc": unshuffle(cbdc_s), "cb_ac": unshuffle(cbac_s),
        "cr_dc": unshuffle(crdc_s), "cr_ac": unshuffle(crac_s),
        "modes": unshuffle(modes_s), "cmodes": unshuffle(cmodes_s),
        "recon_y": recon_y.astype(jnp.uint8),
        "recon_u": recon_u.astype(jnp.uint8),
        "recon_v": recon_v.astype(jnp.uint8),
    }


# mode-signalling overhead constants (bins) for the I16-vs-i8 decision:
# I16 mb_type carries ~5 suffix bins + always-coded qp_delta; I_NxN adds
# the transform flag and a 6-bin CBP but its mode bits ride in the block
# costs. Tuned on the golden clips.
I16_OVERHEAD_BITS = 7.0
I8_OVERHEAD_BITS = 9.0
# extra mb_type prefix bin + lost-skip opportunity for intra inside a P
# slice
P_INTRA_EXTRA_BITS = 2.0


def intra_overlay_pass(cur_y, cur_u, cur_v, ry, ru, rv, inter_cost,
                       qp, qpc):
    """Intra mode decision inside a P picture (x264-medium's dominant
    tool on gradient content: 65%% of its gradmotion P MBs are intra i8,
    measured on the committed goldens — round-5 analysis).

    Takes the inter pass's PRE-deblock reconstruction and its per-MB RD
    cost (same SSD + lambda2*bits currency); runs the slope-2 intra
    wavefront over planes initialized from that recon, and replaces the
    MBs where I16 or I_NxN/i8 wins — neighbors of later MBs then see
    the true final reconstruction, so the emitted levels reproduce
    bit-exactly in any spec decoder. Chroma switches to the intra
    prediction for chosen MBs (per-MB chroma mode trial).

    Returns (intra (nby,nbx) bool, i8 bool, modes, cmodes, luma_dc
    (nby,nbx,16), luma_mux (nby,nbx,256) — I16 AC / i8 scans for intra
    MBs, zeros elsewhere —, i8_modes (nby,nbx,4), cb_dc, cb_ac, cr_dc,
    cr_ac (intra MBs' chroma levels), recon_y/u/v int32 pre-deblock).
    """
    from ..h265.intra_rd import diagonal_maps2
    h, w = cur_y.shape
    n_mby, n_mbx = h // 16, w // 16
    MBY, MBX, VALID, DMAP, KMAP = diagonal_maps2(n_mby, n_mbx)
    D, L = MBY.shape
    lam2 = 0.9 * jnp.power(2.0, (qp - 12) / 3.0)
    lam2c = 0.9 * jnp.power(2.0, (qpc - 12) / 3.0)

    ymb = jnp.moveaxis(cur_y.reshape(n_mby, 16, n_mbx, 16), 1, 2)
    umb = jnp.moveaxis(cur_u.reshape(n_mby, 8, n_mbx, 8), 1, 2)
    vmb = jnp.moveaxis(cur_v.reshape(n_mby, 8, n_mbx, 8), 1, 2)

    # planes carry the INTER recon; +1 border, +16 right cols (i8
    # top-right gathers), +16 bottom trash rows
    py0 = jnp.zeros((h + 17, w + 17), jnp.int32) \
        .at[1:h + 1, 1:w + 1].set(ry)
    pu0 = jnp.zeros((h // 2 + 9, w // 2 + 1), jnp.int32) \
        .at[1:h // 2 + 1, 1:w // 2 + 1].set(ru)
    pv0 = jnp.zeros((h // 2 + 9, w // 2 + 1), jnp.int32) \
        .at[1:h // 2 + 1, 1:w // 2 + 1].set(rv)
    mg0 = jnp.full((2 * n_mby + 1, 2 * n_mbx), -1, jnp.int32)

    a16 = jnp.arange(16)
    a8 = jnp.arange(8)

    def gather_edges(P, y0, x0, n):
        ar = a16 if n == 16 else a8
        top = P[(y0 - 1)[:, None], x0[:, None] + ar[None, :]]
        left = P[y0[:, None] + ar[None, :], (x0 - 1)[:, None]]
        corner = P[y0 - 1, x0 - 1]
        return top, left, corner

    def scatter(P, y0, x0, blk, n):
        ar = a16 if n == 16 else a8
        rg = y0[:, None, None] + ar[None, :, None]
        cg = x0[:, None, None] + ar[None, None, :]
        return P.at[rg, cg].set(blk)

    ic_s = inter_cost[jnp.asarray(MBY), jnp.asarray(MBX)]   # (D, L)

    def step(carry, xs):
        py, pu, pv, mg = carry
        mby, mbx, valid, icost = xs
        avt = (mby > 0) & valid
        avl = (mbx > 0) & valid
        mbyc = jnp.where(valid, mby, 0)
        mbxc = jnp.where(valid, mbx, 0)
        y0 = mbyc * 16 + 1
        x0 = mbxc * 16 + 1
        cur = ymb[mbyc, mbxc]

        top, left, corner = gather_edges(py, y0, x0, 16)
        mode16, z_dc, z_ac, recon16, cost16 = _luma_modes(
            cur, top, left, corner, avt, avl, qp, lam2)

        b_modes, b_z, b_rec, b_cost = [], [], [], []
        save16 = py[y0[:, None, None] + a16[None, :, None],
                    x0[:, None, None] + a16[None, None, :]]
        for b8 in range(4):
            oy, ox = 8 * (b8 // 2), 8 * (b8 % 2)
            r0 = y0 + oy
            c0 = x0 + ox
            avt_b = (r0 > 1) & valid
            avl_b = (c0 > 1) & valid
            avtl_b = avt_b & avl_b
            if b8 == 0:
                avtr_b = avt_b
            elif b8 == 1:
                avtr_b = avt_b & (mbxc < n_mbx - 1)
            elif b8 == 2:
                avtr_b = avt_b
            else:
                avtr_b = jnp.zeros_like(avt_b)
            t_raw = py[(r0 - 1)[:, None], c0[:, None] + a16[None, :]]
            le_raw = py[r0[:, None] + a8[None, :], (c0 - 1)[:, None]]
            m_raw = py[r0 - 1, c0 - 1]
            gy = 2 * mbyc + b8 // 2
            gx = 2 * mbxc + b8 % 2
            if b8 == 0:
                a_m = jnp.where(gx > 0, mg[gy, jnp.maximum(gx - 1, 0)], -1)
                b_m = jnp.where(gy > 0, mg[jnp.maximum(gy - 1, 0), gx], -1)
            elif b8 == 1:
                a_m = b_modes[0]
                b_m = jnp.where(gy > 0, mg[jnp.maximum(gy - 1, 0), gx], -1)
            elif b8 == 2:
                a_m = jnp.where(gx > 0, mg[gy, jnp.maximum(gx - 1, 0)], -1)
                b_m = b_modes[0]
            else:
                a_m = b_modes[2]
                b_m = b_modes[1]
            pred_m = jnp.minimum(jnp.where(a_m >= 0, a_m, 2),
                                 jnp.where(b_m >= 0, b_m, 2))
            cur8 = cur[:, oy:oy + 8, ox:ox + 8]
            bm, z64, rec8, bc = _i8_block_trial(
                cur8, t_raw, le_raw, m_raw, avt_b, avl_b, avtl_b,
                avtr_b, qp, lam2, pred_m)
            r0s = jnp.where(valid, r0, h + 1)
            py = scatter(py, r0s, c0, rec8, 8)
            b_modes.append(bm)
            b_z.append(z64)
            b_rec.append(rec8)
            b_cost.append(bc)

        # ---- chroma intra trial (shared mode) ----
        c0_ = mbyc * 8 + 1
        cx0 = mbxc * 8 + 1
        curu = umb[mbyc, mbxc]
        curv = vmb[mbyc, mbxc]
        topu, leftu, cornu = gather_edges(pu, c0_, cx0, 8)
        topv, leftv, cornv = gather_edges(pv, c0_, cx0, 8)
        udc, uac, urec, ussd, ubits = _chroma_mode_trials(
            curu, topu, leftu, cornu, avt, avl, qpc)
        vdc, vac, vrec, vssd, vbits = _chroma_mode_trials(
            curv, topv, leftv, cornv, avt, avl, qpc)
        callowed = jnp.stack([jnp.ones_like(avt), avl, avt, avt & avl])
        ccost = jnp.where(
            callowed,
            ussd + vssd + lam2c * (ubits + vbits
                                   + jnp.asarray(_CHROMA_UE_BITS)[:, None]),
            jnp.inf)
        cmode = jnp.argmin(ccost, axis=0).astype(jnp.int32)
        lane = jnp.arange(L)
        chroma_cost = ccost[cmode, lane]

        # ---- MB decision: inter vs I16 vs i8 (chroma cost shared) ----
        cost_i8 = (b_cost[0] + b_cost[1] + b_cost[2] + b_cost[3]
                   + lam2 * I8_OVERHEAD_BITS)
        cost_i16f = cost16 + lam2 * I16_OVERHEAD_BITS
        intra_cost = jnp.minimum(cost_i8, cost_i16f) + chroma_cost \
            + lam2 * P_INTRA_EXTRA_BITS
        use_intra = valid & (intra_cost < icost)
        use_i8 = use_intra & (cost_i8 < cost_i16f)

        rec_i8 = jnp.concatenate(
            [jnp.concatenate([b_rec[0], b_rec[1]], axis=2),
             jnp.concatenate([b_rec[2], b_rec[3]], axis=2)], axis=1)
        rec_mb = jnp.where(use_i8[:, None, None], rec_i8, recon16)
        # losers restore the inter recon the i8 sub-steps overwrote
        final = jnp.where(use_intra[:, None, None], rec_mb, save16)
        y0s = jnp.where(valid, y0, h + 1)
        py = scatter(py, y0s, x0, final, 16)

        cb_dc = udc[cmode, lane].reshape(L, 4)
        cr_dc = vdc[cmode, lane].reshape(L, 4)
        cb_ac = _zigzag(uac[cmode, lane].reshape(L, 4, 4, 4))
        cr_ac = _zigzag(vac[cmode, lane].reshape(L, 4, 4, 4))
        c0s = jnp.where(valid & use_intra, c0_, h // 2 + 1)
        pu = scatter(pu, c0s, cx0, urec[cmode, lane], 8)
        pv = scatter(pv, c0s, cx0, vrec[cmode, lane], 8)

        gy0 = jnp.where(valid, 2 * mbyc, 2 * n_mby)
        gmodes = jnp.stack(b_modes, axis=1)
        gvals = jnp.where(use_i8[:, None], gmodes, -1)
        rg = gy0[:, None] + jnp.asarray([0, 0, 1, 1])[None, :]
        cg = (2 * mbxc)[:, None] + jnp.asarray([0, 1, 0, 1])[None, :]
        mg = mg.at[rg, cg].set(gvals, mode="drop")

        # luma_mux: i8 winners carry their 4 scans (4*64 = 256 words),
        # I16 winners their AC blocks; inter MBs zero (the P packer
        # overlays this onto the inter luma slot by the intra mask)
        z16 = (z_ac * (use_intra & ~use_i8)[:, None, None]) \
            .reshape(L, 256)
        z8 = (jnp.stack(b_z, axis=1) * use_i8[:, None, None]) \
            .reshape(L, 256)
        luma_mux = z16 + z8
        z_dc = z_dc * (use_intra & ~use_i8)[:, None]
        cb_dc = cb_dc * use_intra[:, None]
        cr_dc = cr_dc * use_intra[:, None]
        cb_ac = cb_ac * use_intra[:, None, None]
        cr_ac = cr_ac * use_intra[:, None, None]

        return (py, pu, pv, mg), (use_intra, use_i8, mode16, cmode,
                                  z_dc, luma_mux, gvals,
                                  cb_dc, cb_ac, cr_dc, cr_ac)

    (py, pu, pv, _mg), outs = jax.lax.scan(
        step, (py0, pu0, pv0, mg0),
        (jnp.asarray(MBY), jnp.asarray(MBX), jnp.asarray(VALID), ic_s))
    (intra_s, i8_s, m16_s, cm_s, zdc_s, mux_s, i8m_s,
     cbdc_s, cbac_s, crdc_s, crac_s) = outs

    dm, km = jnp.asarray(DMAP), jnp.asarray(KMAP)

    def unshuffle(a):
        return a[dm, km]

    return {
        "intra": unshuffle(intra_s), "i8": unshuffle(i8_s),
        "modes": unshuffle(m16_s), "cmodes": unshuffle(cm_s),
        "luma_dc": unshuffle(zdc_s), "luma_mux": unshuffle(mux_s),
        "i8_modes": unshuffle(i8m_s),
        "cb_dc": unshuffle(cbdc_s), "cb_ac": unshuffle(cbac_s),
        "cr_dc": unshuffle(crdc_s), "cr_ac": unshuffle(crac_s),
        "recon_y": py[1:h + 1, 1:w + 1],
        "recon_u": pu[1:h // 2 + 1, 1:w // 2 + 1],
        "recon_v": pv[1:h // 2 + 1, 1:w // 2 + 1],
    }


@functools.partial(jax.jit, static_argnums=(5,))
def encode_iframe_rd8(y, u, v, qp, qpc, deblock: bool = False):
    """Intra frame with per-MB RD choice between I_16x16 (4 modes) and
    I_NxN/transform-8x8 (four 8x8 blocks, 9 directional modes each, the
    x264-medium workhorse on gradients — its gradmotion I/P frames are
    ~91-99%% i8, measured on the committed goldens).

    Wavefront: slope-2 diagonals (d = 2*mby + mbx) because an i8 block 1
    reads the above-RIGHT MB's bottom row (top-right references), which
    slope-1 anti-diagonals process concurrently. Within a step the four
    8x8 blocks run sequentially (block raster order), each predicting
    from the carried plane updated by the previous sub-step; the MB-level
    argmin then overwrites the MB with the winning recon.

    Returns the encode_iframe_rd dict plus "i8" (nby, nbx) bool,
    "i8_modes" (nby, nbx, 4) and "i8_luma" (nby, nbx, 4, 64) zigzag
    scans (High-profile CABAC entropy inputs).
    """
    from ..h265.intra_rd import diagonal_maps2
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    h, w = y.shape
    n_mby, n_mbx = h // 16, w // 16
    MBY, MBX, VALID, DMAP, KMAP = diagonal_maps2(n_mby, n_mbx)
    D, L = MBY.shape
    lam2 = 0.9 * jnp.power(2.0, (qp - 12) / 3.0)
    lam2c = 0.9 * jnp.power(2.0, (qpc - 12) / 3.0)

    ymb = jnp.moveaxis(y.reshape(n_mby, 16, n_mbx, 16), 1, 2)
    umb = jnp.moveaxis(u.reshape(n_mby, 8, n_mbx, 8), 1, 2)
    vmb = jnp.moveaxis(v.reshape(n_mby, 8, n_mbx, 8), 1, 2)

    # +1 top/left border; +16 RIGHT cols keep block-1 raw top-right
    # gathers in-bounds at the last MB column (masked by avtr); +16
    # bottom trash rows take invalid-lane scatters
    py0 = jnp.zeros((h + 17, w + 17), jnp.int32)
    pu0 = jnp.zeros((h // 2 + 9, w // 2 + 1), jnp.int32)
    pv0 = jnp.zeros((h // 2 + 9, w // 2 + 1), jnp.int32)
    mg0 = jnp.full((2 * n_mby + 1, 2 * n_mbx), -1, jnp.int32)  # +1 trash

    a16 = jnp.arange(16)
    a8 = jnp.arange(8)

    def gather_edges(P, y0, x0, n):
        ar = a16 if n == 16 else a8
        top = P[(y0 - 1)[:, None], x0[:, None] + ar[None, :]]
        left = P[y0[:, None] + ar[None, :], (x0 - 1)[:, None]]
        corner = P[y0 - 1, x0 - 1]
        return top, left, corner

    def scatter(P, y0, x0, blk, n):
        ar = a16 if n == 16 else a8
        rg = y0[:, None, None] + ar[None, :, None]
        cg = x0[:, None, None] + ar[None, None, :]
        return P.at[rg, cg].set(blk)

    def step(carry, xs):
        py, pu, pv, mg = carry
        mby, mbx, valid = xs
        avt = (mby > 0) & valid
        avl = (mbx > 0) & valid
        mbyc = jnp.where(valid, mby, 0)
        mbxc = jnp.where(valid, mbx, 0)
        y0 = mbyc * 16 + 1
        x0 = mbxc * 16 + 1
        cur = ymb[mbyc, mbxc]

        # ---- I16 trial ----
        top, left, corner = gather_edges(py, y0, x0, 16)
        mode16, z_dc, z_ac, recon16, cost16 = _luma_modes(
            cur, top, left, corner, avt, avl, qp, lam2)

        # ---- i8 trial: 4 blocks sequential ----
        b_modes, b_z, b_rec, b_cost = [], [], [], []
        for b8 in range(4):
            oy, ox = 8 * (b8 // 2), 8 * (b8 % 2)
            r0 = y0 + oy
            c0 = x0 + ox
            avt_b = (r0 > 1) & valid
            avl_b = (c0 > 1) & valid
            avtl_b = avt_b & avl_b
            if b8 == 0:
                avtr_b = avt_b
            elif b8 == 1:
                avtr_b = avt_b & (mbxc < n_mbx - 1)
            elif b8 == 2:
                avtr_b = avt_b
            else:
                avtr_b = jnp.zeros_like(avt_b)
            t_raw = py[(r0 - 1)[:, None], c0[:, None] + a16[None, :]]
            le_raw = py[r0[:, None] + a8[None, :], (c0 - 1)[:, None]]
            m_raw = py[r0 - 1, c0 - 1]
            # prev-mode prediction (spec 8.3.1.1 min rule, -1 -> DC):
            gy = 2 * mbyc + b8 // 2
            gx = 2 * mbxc + b8 % 2
            if b8 == 0:
                a_m = jnp.where(gx > 0, mg[gy, jnp.maximum(gx - 1, 0)], -1)
                b_m = jnp.where(gy > 0, mg[jnp.maximum(gy - 1, 0), gx], -1)
            elif b8 == 1:
                a_m = b_modes[0]
                b_m = jnp.where(gy > 0, mg[jnp.maximum(gy - 1, 0), gx], -1)
            elif b8 == 2:
                a_m = jnp.where(gx > 0, mg[gy, jnp.maximum(gx - 1, 0)], -1)
                b_m = b_modes[0]
            else:
                a_m = b_modes[2]
                b_m = b_modes[1]
            pred_m = jnp.minimum(jnp.where(a_m >= 0, a_m, 2),
                                 jnp.where(b_m >= 0, b_m, 2))
            cur8 = cur[:, oy:oy + 8, ox:ox + 8]
            bm, z64, rec8, bc = _i8_block_trial(
                cur8, t_raw, le_raw, m_raw, avt_b, avl_b, avtl_b,
                avtr_b, qp, lam2, pred_m)
            r0s = jnp.where(valid, r0, h + 1)
            py = scatter(py, r0s, c0, rec8, 8)
            b_modes.append(bm)
            b_z.append(z64)
            b_rec.append(rec8)
            b_cost.append(bc)

        cost_i8 = (b_cost[0] + b_cost[1] + b_cost[2] + b_cost[3]
                   + lam2 * I8_OVERHEAD_BITS)
        use_i8 = cost_i8 < cost16 + lam2 * I16_OVERHEAD_BITS

        rec_i8 = jnp.concatenate(
            [jnp.concatenate([b_rec[0], b_rec[1]], axis=2),
             jnp.concatenate([b_rec[2], b_rec[3]], axis=2)], axis=1)
        recon = jnp.where(use_i8[:, None, None], rec_i8, recon16)
        y0s = jnp.where(valid, y0, h + 1)
        py = scatter(py, y0s, x0, recon, 16)

        # 8x8-granular mode grid: i8 winners publish their modes,
        # everything else stays -1 (DC to neighbors)
        gy0 = jnp.where(valid, 2 * mbyc, 2 * n_mby)
        gmodes = jnp.stack(b_modes, axis=1)                # (L, 4)
        gvals = jnp.where(use_i8[:, None], gmodes, -1)
        rg = gy0[:, None] + jnp.asarray([0, 0, 1, 1])[None, :]
        cg = (2 * mbxc)[:, None] + jnp.asarray([0, 1, 0, 1])[None, :]
        mg = mg.at[rg, cg].set(gvals, mode="drop")

        # zero the losing representation's level arrays
        z_dc = z_dc * ~use_i8[:, None]
        z_ac = z_ac * ~use_i8[:, None, None]
        i8_luma = jnp.stack(b_z, axis=1) * use_i8[:, None, None]

        # ---- chroma (shared, unchanged) ----
        c0_ = mbyc * 8 + 1
        cx0 = mbxc * 8 + 1
        curu = umb[mbyc, mbxc]
        curv = vmb[mbyc, mbxc]
        topu, leftu, cornu = gather_edges(pu, c0_, cx0, 8)
        topv, leftv, cornv = gather_edges(pv, c0_, cx0, 8)
        udc, uac, urec, ussd, ubits = _chroma_mode_trials(
            curu, topu, leftu, cornu, avt, avl, qpc)
        vdc, vac, vrec, vssd, vbits = _chroma_mode_trials(
            curv, topv, leftv, cornv, avt, avl, qpc)
        callowed = jnp.stack([jnp.ones_like(avt), avl, avt, avt & avl])
        ccost = jnp.where(
            callowed,
            ussd + vssd + lam2c * (ubits + vbits
                                   + jnp.asarray(_CHROMA_UE_BITS)[:, None]),
            jnp.inf)
        cmode = jnp.argmin(ccost, axis=0).astype(jnp.int32)
        lane = jnp.arange(L)
        cb_dc = udc[cmode, lane].reshape(L, 4)
        cr_dc = vdc[cmode, lane].reshape(L, 4)
        cb_ac = _zigzag(uac[cmode, lane].reshape(L, 4, 4, 4))
        cr_ac = _zigzag(vac[cmode, lane].reshape(L, 4, 4, 4))
        c0s = jnp.where(valid, c0_, h // 2 + 1)
        pu = scatter(pu, c0s, cx0, urec[cmode, lane], 8)
        pv = scatter(pv, c0s, cx0, vrec[cmode, lane], 8)

        return (py, pu, pv, mg), (mode16, z_dc, z_ac, cmode,
                                  cb_dc, cb_ac, cr_dc, cr_ac,
                                  use_i8, gmodes, i8_luma)

    (py, pu, pv, _mg), outs = jax.lax.scan(
        step, (py0, pu0, pv0, mg0),
        (jnp.asarray(MBY), jnp.asarray(MBX), jnp.asarray(VALID)))
    (modes_s, zdc_s, zac_s, cmodes_s,
     cbdc_s, cbac_s, crdc_s, crac_s, i8_s, i8m_s, i8z_s) = outs

    dm, km = jnp.asarray(DMAP), jnp.asarray(KMAP)

    def unshuffle(a):
        return a[dm, km]

    recon_y = py[1:h + 1, 1:w + 1]
    recon_u = pu[1:h // 2 + 1, 1:w // 2 + 1]
    recon_v = pv[1:h // 2 + 1, 1:w // 2 + 1]
    i8_grid = unshuffle(i8_s)

    if deblock:
        from ...ops import deblock as dbf
        qp_mb = jnp.full((n_mby, n_mbx), qp, jnp.int32)
        intra = jnp.ones((n_mby, n_mbx), bool)
        nz = jnp.zeros((h // 4, w // 4), bool)  # unused for all-intra
        mvq = jnp.zeros((n_mby, n_mbx, 2), jnp.int32)
        recon_y, recon_u, recon_v = dbf.deblock_frame(
            recon_y, recon_u, recon_v, qp_mb, intra, nz, mvq,
            tf.CHROMA_QP_FULL, t8=i8_grid)

    return {
        "luma_dc": unshuffle(zdc_s), "luma_ac": unshuffle(zac_s),
        "cb_dc": unshuffle(cbdc_s), "cb_ac": unshuffle(cbac_s),
        "cr_dc": unshuffle(crdc_s), "cr_ac": unshuffle(crac_s),
        "modes": unshuffle(modes_s), "cmodes": unshuffle(cmodes_s),
        "i8": i8_grid, "i8_modes": unshuffle(i8m_s),
        "i8_luma": unshuffle(i8z_s),
        "recon_y": recon_y.astype(jnp.uint8),
        "recon_u": recon_u.astype(jnp.uint8),
        "recon_v": recon_v.astype(jnp.uint8),
    }
