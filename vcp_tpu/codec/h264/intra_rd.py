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
    return mode, _zigzag(z_dc_b), _zigzag(z_ac_ord), recon_b


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
        mode, z_dc, z_ac, recon = _luma_modes(
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
