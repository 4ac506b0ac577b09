"""HEVC RD intra: device (jax) 32x32 intra predictors + reference
assembly for the quality-preset wavefront I-frame path.

The speed-preset intra path (frame_ops._encode_iframe_core) restricts
itself to top-only modes so a frame vectorizes as a scan over CTU rows.
To approach libx265-medium RD on gradient content the encoder needs the
left-dependent modes (planar, horizontal, negative-angle families) —
this module provides the prediction math, batched over wavefront lanes,
bit-exact with the spec-proven numpy predictors in
``codec.h265.foreign`` (which are pinned against libx265 bitstreams +
the libavcodec oracle by tests/test_foreign_hevc.py).

TPU-first schedule (used by the wavefront encoder): HEVC intra at CTU
granularity depends on left, top, top-left AND top-right neighbours,
so H.264's slope-1 anti-diagonals (codec.h264.intra_rd) do not work —
the top-right CTU would land on the same diagonal. The slope-2
wavefront d = 2*mby + mbx (exactly HEVC's own WPP dependency cone,
spec 6.5.1 note) puts top-right on d-1, top on d-2, left on d-1: every
dependency is strictly earlier, and each of the 2*nby+nbx-2 scan steps
processes a whole diagonal of CTUs vectorized.

Scope notes (our encoder's stream shape: one 32x32 CU/TU per CTU,
64-px CTUs are a foreign-decode-only concern):
* n=32 only — the DC/10/26 edge smoothing (spec 8.4.4.2.6/7/8, n<32)
  never applies, which removes every per-sample conditional;
* reference smoothing (8.4.4.2.3) at n=32 with strong smoothing OFF in
  the SPS (headers.HevcParams default): DC, 10 and 26 read unfiltered
  references, every other mode reads the [1 2 1]-filtered set;
* the coded picture is CTU-padded (conformance window crops), so
  availability is purely CTU-raster: below-left never exists, the rest
  reduces to three booleans (left / top / top-right CTU present).

Reference: the substitution scan is 8.4.4.2.2 (mirrors
foreign.intra_refs); predictors are 8.4.4.2.4 (planar), .5 (DC),
.6 (angular) — asserted bit-exact against foreign.intra_pred.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from .foreign import ANGLE, INV_ANGLE

N = 32
LOG2N = 5

# encoder candidate set: planar, DC, and the angular family at ~4-mode
# spacing (the same coarse grid x265's fast mode decision seeds with).
MODESET = (0, 1, 2, 6, 10, 14, 18, 22, 26, 30, 34)


def diagonal_maps2(nby: int, nbx: int):
    """Slope-2 wavefront index maps: CTU (mby, mbx) runs at step
    d = 2*mby + mbx. Returns (MBY, MBX, VALID) each (D, L) plus inverse
    maps (DMAP, KMAP) with stacked[DMAP[y,x], KMAP[y,x]] == (y, x)."""
    D = 2 * nby + nbx - 2 if nby and nbx else 0
    lanes = []
    for d in range(D):
        cells = [(mby, d - 2 * mby) for mby in range(nby)
                 if 0 <= d - 2 * mby < nbx]
        lanes.append(cells)
    L = max(1, max(len(c) for c in lanes) if lanes else 1)
    MBY = np.zeros((D, L), np.int32)
    MBX = np.zeros((D, L), np.int32)
    VALID = np.zeros((D, L), bool)
    DMAP = np.zeros((nby, nbx), np.int32)
    KMAP = np.zeros((nby, nbx), np.int32)
    for d, cells in enumerate(lanes):
        for k, (mby, mbx) in enumerate(cells):
            MBY[d, k] = mby
            MBX[d, k] = mbx
            VALID[d, k] = True
            DMAP[mby, mbx] = d
            KMAP[mby, mbx] = k
    return MBY, MBX, VALID, DMAP, KMAP


def build_refs(left32, top64, corner, avl, avt, avtr):
    """Availability substitution (8.4.4.2.2) at CTU granularity.

    left32 (L,32), top64 (L,64), corner (L,): raw plane reads (garbage
    where the matching avail flag is False). avl/avt/avtr (L,) bool.
    Returns (left64, corner, top64) int32 — the substituted reference
    set. Below-left is never available at one-CU-per-CTU granularity,
    so left[32:] always extends left[31] (or the global fill)."""
    l32 = left32.astype(jnp.int32)
    t64 = top64.astype(jnp.int32)
    c = corner.astype(jnp.int32)
    L = l32.shape[0]

    # top[32:] when the top-right CTU is absent extends top[31]
    t_hi = jnp.where(avtr[:, None], t64[:, 32:],
                     jnp.broadcast_to(t64[:, 31:32], (L, 32)))
    t64 = jnp.concatenate([t64[:, :32], t_hi], axis=1)

    # the 8.4.4.2.2 scan order is left-bottom -> corner -> top-right;
    # with whole-CTU availability it collapses to four cases
    fill_t = jnp.where(avl, l32[:, 0], 128)      # top row when !avt
    fill_l = jnp.where(avt, t64[:, 0], 128)      # left col when !avl
    c = jnp.where(avt & avl, c, jnp.where(avt, fill_l, fill_t))
    t64 = jnp.where(avt[:, None], t64, fill_t[:, None])
    l32 = jnp.where(avl[:, None], l32, fill_l[:, None])
    l64 = jnp.concatenate(
        [l32, jnp.broadcast_to(l32[:, 31:32], (L, 32))], axis=1)
    return l64, c, t64


def filter_refs(left64, corner, top64):
    """[1 2 1] reference smoothing (8.4.4.2.3), n=32, strong smoothing
    off. Endpoints left[63]/top[63] stay unfiltered per spec."""
    l_ = left64
    t_ = top64
    c = corner
    # interior [1, 2n-2] filters; index 2n-1 stays raw (spec loop bound)
    fl0 = (l_[:, 1] + 2 * l_[:, 0] + c + 2) >> 2
    fli = (l_[:, 2:] + 2 * l_[:, 1:-1] + l_[:, :-2] + 2) >> 2
    fl = jnp.concatenate([fl0[:, None], fli, l_[:, -1:]], axis=1)[:, :64]
    ft0 = (c + 2 * t_[:, 0] + t_[:, 1] + 2) >> 2
    fti = (t_[:, :-2] + 2 * t_[:, 1:-1] + t_[:, 2:] + 2) >> 2
    ft = jnp.concatenate([ft0[:, None], fti, t_[:, -1:]], axis=1)[:, :64]
    fc = (l_[:, 0] + 2 * c + t_[:, 0] + 2) >> 2
    return fl, fc, ft


def _pred_planar(left64, corner, top64):
    l_ = left64[:, :N]
    t_ = top64[:, :N]
    tr = top64[:, N]
    bl = left64[:, N]
    xs = jnp.arange(N, dtype=jnp.int32)
    out = ((N - 1 - xs[None, None, :]) * l_[:, :, None]
           + (xs[None, None, :] + 1) * tr[:, None, None]
           + (N - 1 - xs[None, :, None]) * t_[:, None, :]
           + (xs[None, :, None] + 1) * bl[:, None, None] + N) >> 6
    return out


def _pred_dc(left64, corner, top64):
    dc = (left64[:, :N].sum(1) + top64[:, :N].sum(1) + N) >> 6
    return jnp.broadcast_to(dc[:, None, None],
                            (left64.shape[0], N, N)).astype(jnp.int32)


def _pred_angular(left64, corner, top64, mode: int):
    """Angular prediction (8.4.4.2.6), n=32, batched over lanes. All
    reference-array construction uses static indices (mode is a Python
    int), so this lowers to pure gathers/slices."""
    ang = ANGLE[mode]
    vertical = mode >= 18
    main, side = (top64, left64) if vertical else (left64, top64)
    L = main.shape[0]
    # ref[base + k] = p[k-1] along the main edge; base = N
    base = N
    parts = [jnp.broadcast_to(corner[:, None], (L, 1)),
             main, main[:, -1:]]
    ref = jnp.concatenate(parts, axis=1)        # ref[base+k] -> idx k+? :
    # layout: ref_arr[:, 0] == ref[base], ref_arr[:, 1+k] == ref[base+1+k]
    if ang < 0:
        inv = INV_ANGLE[ang]
        last = (N * ang) >> 5
        ext_idx = []
        for x in range(last, 0):                # x = last .. -1
            ext_idx.append(min(2 * N - 1,
                               max(0, ((x * inv + 128) >> 8) - 1)))
        ext = side[:, jnp.asarray(ext_idx, jnp.int32)]
        ref = jnp.concatenate([ext, ref], axis=1)
        base_col = len(ext_idx)                 # column of ref[base]
    else:
        base_col = 0
    rows = []
    for q in range(N):                          # q = y (vertical) / x
        off = ((q + 1) * ang) >> 5
        frac = ((q + 1) * ang) & 31
        i0 = base_col + 1 + off
        a = ref[:, i0:i0 + N]
        b = ref[:, i0 + 1:i0 + N + 1]
        rows.append(((32 - frac) * a + frac * b + 16) >> 5)
    out = jnp.stack(rows, axis=1)               # (L, q, N)
    return out if vertical else jnp.transpose(out, (0, 2, 1))


def pred_mode(refs_plain, refs_filt, mode: int):
    """Prediction for one mode from the (unfiltered, filtered) reference
    triples. n=32 filter rule (strong smoothing off): DC/10/26 read
    unfiltered references, everything else filtered."""
    refs = refs_plain if mode in (1, 10, 26) else refs_filt
    l64, c, t64 = refs
    if mode == 0:
        return _pred_planar(l64, c, t64)
    if mode == 1:
        return _pred_dc(l64, c, t64)
    return _pred_angular(l64, c, t64, mode)


# ---------------------------------------------------------------------------
# Wavefront I-frame encoder (quality presets)
# ---------------------------------------------------------------------------

def _bits_proxy(levels):
    """~2*log2(|z|)+1.7 bits per nonzero level (the currency every RD
    decision in this repo prices level cost in; see h264.intra_rd)."""
    a = jnp.abs(levels.astype(jnp.float32))
    return jnp.where(a > 0, 2.0 * jnp.log2(a + 1.0) + 1.7, 0.0).sum(
        axis=tuple(range(2, levels.ndim)))


# luma mode signalling estimate (bits): planar/DC usually ride the MPM
# list (prev_intra flag + <=2 bypass bins); Vertical often does via the
# degenerate [cand, cand+/-1] chain; other angular modes mostly pay the
# 1 + 5-bit rem escape.
_MODE_BITS = {0: 2.5, 1: 2.5, 26: 4.0}
_MODE_BITS_DEFAULT = 6.5


def encode_iframe_rd(y, u, v, qp: int, qpc: int):
    """Env-reading wrapper: VCP_HEVC_RDI_LAM is resolved HERE (call time)
    and passed as a static argument so an in-process calibration sweep
    re-traces instead of silently reusing the first-traced lambda."""
    lam_mult = float(os.environ.get("VCP_HEVC_RDI_LAM", "1"))
    return _encode_iframe_rd(y, u, v, qp, qpc, lam_mult)


@functools.partial(jax.jit, static_argnames=("qp", "qpc", "lam_mult"))
def _encode_iframe_rd(y, u, v, qp: int, qpc: int, lam_mult: float = 1.0):
    """Encode one HEVC intra frame with per-CTU RD mode selection over
    MODESET (planar, DC, angular 2..34 at 4-mode spacing — the
    left-dependent families the row-scan path cannot reach).

    y: (H, W) int planes padded to 32 multiples; u, v: (H/2, W/2) padded
    to 16. Returns the same dict as frame_ops.encode_iframe (deblocked
    recon + levels) plus per-CTU "modes". Chroma keeps the engine's
    fixed scheme (row 0 DC, rows >= 1 Vertical) so the existing syntax
    and validation decoder semantics are unchanged.

    Schedule: lax.scan over slope-2 diagonals (see module docstring);
    each step runs every lane's full MODESET trial batched on the MXU
    (one fwd-transform/quant/recon per mode), argmins, and scatters the
    lane recons back into the carried frame planes.
    """
    from .frame_ops import _tq

    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    h, w = y.shape
    nby, nbx = h // N, w // N
    MBY, MBX, VALID, DMAP, KMAP = diagonal_maps2(nby, nbx)
    D, L = MBY.shape
    M = len(MODESET)
    # the level-bits proxy underprices the HEVC residual coder's real
    # CABAC cost for spread-out coefficient patterns; the multiplier is
    # calibrated by BD-rate sweep (rdbench --codec hevc)
    lam2 = 0.9 * 2.0 ** ((qp - 12) / 3.0) * lam_mult
    modeset = jnp.asarray(MODESET, jnp.int32)
    base_bits = jnp.asarray([_MODE_BITS.get(m, _MODE_BITS_DEFAULT)
                             for m in MODESET], jnp.float32)

    ymb = jnp.moveaxis(y.reshape(nby, N, nbx, N), 1, 2)     # (nby,nbx,32,32)
    umb = jnp.moveaxis(u.reshape(nby, 16, nbx, 16), 1, 2)
    vmb = jnp.moveaxis(v.reshape(nby, 16, nbx, 16), 1, 2)

    # padded recon planes: +1 top/left border (masked by availability);
    # +32 right cols keep the raw top64 gather in-bounds at the last CTU
    # column (substitution masks the garbage); +32 bottom trash rows
    # take the scatters of invalid lanes
    py0 = jnp.zeros((h + N + 1, w + N + 1), jnp.int32)
    pu0 = jnp.zeros((h // 2 + 17, w // 2 + 1), jnp.int32)
    pv0 = jnp.zeros((h // 2 + 17, w // 2 + 1), jnp.int32)

    a16 = jnp.arange(16)
    a32 = jnp.arange(N)
    a64 = jnp.arange(2 * N)

    def step(carry, xs):
        py, pu, pv = carry
        mby, mbx, valid = xs
        mbyc = jnp.where(valid, mby, 0)
        mbxc = jnp.where(valid, mbx, 0)
        avl = (mbx > 0) & valid
        avt = (mby > 0) & valid
        avtr = avt & (mbx < nbx - 1)

        # ---- luma: full MODESET RD trial ----
        y0 = mbyc * N + 1
        x0 = mbxc * N + 1
        cur = ymb[mbyc, mbxc]                               # (L,32,32)
        left32 = py[y0[:, None] + a32[None, :], (x0 - 1)[:, None]]
        top64 = py[(y0 - 1)[:, None], x0[:, None] + a64[None, :]]
        corner = py[y0 - 1, x0 - 1]
        refs_plain = build_refs(left32, top64, corner, avl, avt, avtr)
        refs_filt = filter_refs(*refs_plain)
        preds = jnp.stack([pred_mode(refs_plain, refs_filt, m)
                           for m in MODESET])               # (M,L,32,32)
        z, rr = _tq(cur[None] - preds, qp, LOG2N, True)
        recon = jnp.clip(preds + rr, 0, 255)
        ssd = ((cur[None] - recon).astype(jnp.float32) ** 2).sum((2, 3))
        bits = _bits_proxy(z.reshape(M, L, -1))
        # explicit-chroma signalling (~3 bits) whenever the luma mode
        # differs from the row's fixed chroma prediction (DM otherwise)
        chroma_pred = jnp.where(mby == 0, 1, 26)            # (L,)
        pen = base_bits[:, None] + jnp.where(
            modeset[:, None] == chroma_pred[None, :], 0.0, 3.0)
        cost = ssd + lam2 * (bits + pen)
        best = jnp.argmin(cost, axis=0)                     # (L,)
        lane = jnp.arange(L)
        mode_row = modeset[best]
        zy = z[best, lane]
        recon_b = recon[best, lane]
        y0s = jnp.where(valid, y0, h + 1)
        py = py.at[y0s[:, None, None] + a32[None, :, None],
                   x0[:, None, None] + a32[None, None, :]].set(recon_b)

        # ---- chroma: fixed row scheme (row 0 DC-from-left, rows >= 1
        # Vertical), matching syntax.encode_slice_data's chroma_pred ----
        c0 = mbyc * 16 + 1
        cx0 = mbxc * 16 + 1
        row0 = (mby == 0)

        def chroma(pc, cmb):
            curc = cmb[mbyc, mbxc]                          # (L,16,16)
            leftc = pc[c0[:, None] + a16[None, :], (cx0 - 1)[:, None]]
            topc = pc[(c0 - 1)[:, None], cx0[:, None] + a16[None, :]]
            # DC with 8.4.4.2.2 substitution: top row propagates from
            # left[0]; nothing available (frame corner) -> 128
            dcc = jnp.where(avl,
                            (leftc.sum(1) + 16 * leftc[:, 0] + 16) >> 5,
                            128)
            predc = jnp.where(
                row0[:, None, None],
                jnp.broadcast_to(dcc[:, None, None], (L, 16, 16)),
                jnp.broadcast_to(topc[:, None, :], (L, 16, 16)))
            zc, rc = _tq(curc - predc, qpc, 4, True)
            reconc = jnp.clip(predc + rc, 0, 255)
            c0s = jnp.where(valid, c0, h // 2 + 1)
            pc = pc.at[c0s[:, None, None] + a16[None, :, None],
                       cx0[:, None, None] + a16[None, None, :]].set(reconc)
            return pc, zc

        pu, zu = chroma(pu, umb)
        pv, zv = chroma(pv, vmb)
        return (py, pu, pv), (mode_row, zy, zu, zv)

    (py, pu, pv), outs = jax.lax.scan(
        step, (py0, pu0, pv0),
        (jnp.asarray(MBY), jnp.asarray(MBX), jnp.asarray(VALID)))
    modes_s, zy_s, zu_s, zv_s = outs

    dm, km = jnp.asarray(DMAP), jnp.asarray(KMAP)
    rec_y = py[1:h + 1, 1:w + 1]
    rec_u = pu[1:h // 2 + 1, 1:w // 2 + 1]
    rec_v = pv[1:h // 2 + 1, 1:w // 2 + 1]
    from ...ops.deblock_hevc import deblock_frame_hevc
    rec_y, rec_u, rec_v = deblock_frame_hevc(rec_y, rec_u, rec_v,
                                             qp, qpc, intra=True)
    return {
        "levels_y": zy_s[dm, km].astype(jnp.int16),
        "levels_u": zu_s[dm, km].astype(jnp.int16),
        "levels_v": zv_s[dm, km].astype(jnp.int16),
        "modes": modes_s[dm, km],
        "recon_y": rec_y, "recon_u": rec_u, "recon_v": rec_v,
    }
