"""HEVC device frame pipeline (jit): CTU intra/inter prediction,
transform, quantization and reconstruction.

Replaces (in role) the hevc_nvenc/libx265 encode core the reference
reached through ffmpeg (ref cmd/consumer.go:370-394, presets at
internal/config/config.go:47-50). TPU-first structure, mirroring the
proven H.264 engine design (codec.h264.frame_ops):

* 32x32 CTUs, one CU per CTU, one TU per plane (luma 32, chroma 16) —
  transform stages are batched matmuls on the MXU, quant fuses in.
* Intra frames: CTU row 0 uses DC prediction (a short ``lax.scan``
  along x — DC depends only on the left neighbor's reconstructed right
  column); rows >= 1 use Vertical prediction, which depends only on the
  row above, so each row is one fully-vectorized scan step. No
  per-block wavefront, no data-dependent control flow.
* Inter (P) frames: full-pel exhaustive SAD search per 32x32 PU over
  ±sr (a ``fori_loop`` over candidate offsets — the same
  shifted-plane trick as ops.motion), luma full-pel MC, chroma MC with
  the normative 4-tap half-sample filter (-4, 36, 36, -4) when the
  luma MV is odd.

NumPy twins of the prediction/MC math live in the validation decoder's
path (``mc_chroma_np``) so the closed loop stays bit-exact.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ...ops import transform_hevc as th

CTU = 32
LOG2_CTU = 5

# normative 4:2:0 chroma interpolation taps for phases 0 and 1/2
_TAPS0 = (0, 64, 0, 0)
_TAPS4 = (-4, 36, 36, -4)

# normative luma 8-tap interpolation filters per quarter phase
# (spec 8.5.4.2.2.1, Table 8-10) and chroma 4-tap per 1/8 phase
# (Table 8-11).
LUMA_TAPS = (
    (0, 0, 0, 64, 0, 0, 0, 0),
    (-1, 4, -10, 58, 17, -5, 1, 0),
    (-1, 4, -11, 40, 40, -11, 4, -1),
    (0, 1, -5, 17, 58, -10, 4, -1),
)
CHROMA_TAPS = (
    (0, 64, 0, 0),
    (-2, 58, 10, -2),
    (-4, 54, 16, -2),
    (-6, 46, 28, -4),
    (-4, 36, 36, -4),
    (-4, 28, 46, -6),
    (-2, 16, 54, -4),
    (-2, 10, 58, -2),
)


def _tq(res, qp: int, log2: int, intra: bool):
    """Transform+quant+recon for batched residual blocks.
    Returns (levels, recon_residual)."""
    c = th.fwd(res, log2)
    z = th.quant(c, qp, log2, intra)
    r = th.inv(th.dequant(z, qp, log2), log2)
    return z, r


@functools.partial(jax.jit, static_argnames=("qp", "qpc"))
def encode_iframe(y, u, v, qp: int, qpc: int):
    out = _encode_iframe_core(y, u, v, qp, qpc)
    from ...ops.deblock_hevc import deblock_frame_hevc
    ry, ru, rv = deblock_frame_hevc(out["recon_y"], out["recon_u"],
                                    out["recon_v"], qp, qpc, intra=True)
    out["recon_y"], out["recon_u"], out["recon_v"] = ry, ru, rv
    return out


def _encode_iframe_core(y, u, v, qp: int, qpc: int):
    """Intra frame. Planes are int32, padded to CTU multiples.
    Returns dict with levels (int16) and recon planes (int32)."""
    h, w = y.shape
    nby, nbx = h // CTU, w // CTU
    hc, wc = h // 2, w // 2

    # ---- CTU row 0: DC mode, scan along x ----
    yb0 = y[:32].reshape(32, nbx, 32).transpose(1, 0, 2)
    ub0 = u[:16].reshape(16, nbx, 16).transpose(1, 0, 2)
    vb0 = v[:16].reshape(16, nbx, 16).transpose(1, 0, 2)

    def dc_of(left, first, log2n):
        n = 1 << log2n
        # top row substitutes to left[0] (spec 8.4.4.2.2 propagation)
        s = left.sum() + n * left[0] + n
        return jnp.where(first, 128, s >> (log2n + 1))

    def step(carry, blk):
        ly, lu, lv, first = carry
        by, bu, bv = blk
        zy, ryr = _tq(by - dc_of(ly, first, 5), qp, 5, True)
        zu, rur = _tq(bu - dc_of(lu, first, 4), qpc, 4, True)
        zv, rvr = _tq(bv - dc_of(lv, first, 4), qpc, 4, True)
        ry = jnp.clip(dc_of(ly, first, 5) + ryr, 0, 255)
        ru = jnp.clip(dc_of(lu, first, 4) + rur, 0, 255)
        rv = jnp.clip(dc_of(lv, first, 4) + rvr, 0, 255)
        nxt = (ry[:, -1], ru[:, -1], rv[:, -1],
               jnp.zeros((), jnp.bool_))
        return nxt, (zy, zu, zv, ry, ru, rv)

    init = (jnp.zeros(32, jnp.int32), jnp.zeros(16, jnp.int32),
            jnp.zeros(16, jnp.int32), jnp.ones((), jnp.bool_))
    _, (zy0, zu0, zv0, ry0, ru0, rv0) = lax.scan(
        step, init, (yb0, ub0, vb0))
    rec_y0 = ry0.transpose(1, 0, 2).reshape(32, w)
    rec_u0 = ru0.transpose(1, 0, 2).reshape(16, wc)
    rec_v0 = rv0.transpose(1, 0, 2).reshape(16, wc)

    levels_y = zy0[None]
    levels_u = zu0[None]
    levels_v = zv0[None]
    rec_y, rec_u, rec_v = rec_y0, rec_u0, rec_v0

    modes = jnp.full((1, nbx), 1, jnp.int32)     # row 0: DC

    # ---- CTU rows >= 1: per-CTU choice among the TOP-ONLY modes
    # (Vertical 26 and the positive angular family 27..34) — all predict
    # from the final row above (+ corner), so each CTU row stays one
    # fully-vectorized scan step. Chroma keeps Vertical.
    if nby > 1:
        rows_y = y[32:].reshape(nby - 1, 32, w)
        rows_u = u[16:].reshape(nby - 1, 16, wc)
        rows_v = v[16:].reshape(nby - 1, 16, wc)

        def vstep(carry, rows):
            bot_y, bot_u, bot_v = carry
            ry_, ru_, rv_ = rows
            preds, mode_ids = _top_mode_preds(bot_y, nbx)   # (M,nbx,32,32)
            cur_b = ry_.reshape(32, nbx, 32).transpose(1, 0, 2)
            # RD mode decision (true transform-domain cost — SAD alone
            # overrates angular modes whose residuals quantize poorly):
            # per mode, quantize the real residual and charge
            # SSD(recon) + lambda2 * level-bits proxy (+ mode bits:
            # angular modes usually pay the 5-bit rem escape + explicit
            # chroma signalling).
            lam2 = 0.9 * 2.0 ** ((qp - 12) / 3.0)

            def mode_cost(pred):
                zc, rr = _tq(cur_b - pred, qp, 5, True)
                d = (cur_b - pred - rr).astype(jnp.float32)
                dist = (d * d).sum(axis=(1, 2))
                a = jnp.abs(zc.astype(jnp.float32))
                bits = jnp.where(a > 0, 2.0 * jnp.log2(a + 1.0) + 1.7,
                                 0.0).sum(axis=(1, 2))
                return dist + lam2 * bits

            costs = jnp.stack([mode_cost(preds[m])
                               for m in range(len(mode_ids))])
            # rem escape + chroma signalling + the MPM chain broken for
            # the right neighbor — charged generously so angular only
            # wins where it clearly beats Vertical
            pen = jnp.asarray([0.0] + [20.0] * (len(mode_ids) - 1))
            costs = costs + lam2 * pen[:, None]
            best = jnp.argmin(costs, axis=0)                # (nbx,)
            mode_row = jnp.asarray(mode_ids)[best]
            py_b = jnp.take_along_axis(
                preds, best[None, :, None, None], axis=0)[0]
            py = py_b.transpose(1, 0, 2).reshape(32, w)
            pu = jnp.broadcast_to(bot_u, (16, wc))
            pv = jnp.broadcast_to(bot_v, (16, wc))
            zy, rry = _tq(th.to_blocks(ry_ - py, 32), qp, 5, True)
            zu, rru = _tq(th.to_blocks(ru_ - pu, 16), qpc, 4, True)
            zv, rrv = _tq(th.to_blocks(rv_ - pv, 16), qpc, 4, True)
            rec_yr = jnp.clip(py + th.from_blocks(rry), 0, 255)
            rec_ur = jnp.clip(pu + th.from_blocks(rru), 0, 255)
            rec_vr = jnp.clip(pv + th.from_blocks(rrv), 0, 255)
            return ((rec_yr[-1], rec_ur[-1], rec_vr[-1]),
                    (zy[0], zu[0], zv[0], rec_yr, rec_ur, rec_vr,
                     mode_row))

        init_v = (rec_y0[-1], rec_u0[-1], rec_v0[-1])
        _, (zyr, zur, zvr, recy, recu, recv, mrows) = lax.scan(
            vstep, init_v, (rows_y, rows_u, rows_v))
        levels_y = jnp.concatenate([levels_y, zyr], axis=0)
        levels_u = jnp.concatenate([levels_u, zur], axis=0)
        levels_v = jnp.concatenate([levels_v, zvr], axis=0)
        rec_y = jnp.concatenate([rec_y0, recy.reshape(-1, w)], axis=0)
        rec_u = jnp.concatenate([rec_u0, recu.reshape(-1, wc)], axis=0)
        rec_v = jnp.concatenate([rec_v0, recv.reshape(-1, wc)], axis=0)
        modes = jnp.concatenate([modes, mrows], axis=0)

    return {
        "levels_y": levels_y.astype(jnp.int16),
        "levels_u": levels_u.astype(jnp.int16),
        "levels_v": levels_v.astype(jnp.int16),
        "modes": modes,
        "recon_y": rec_y, "recon_u": rec_u, "recon_v": rec_v,
    }


# intraPredAngle for the positive vertical family (spec Table 8-5).
ANG_MODES = (26, 27, 28, 29, 30, 31, 32, 33, 34)
ANG_ANGLE = (0, 2, 5, 9, 13, 17, 21, 26, 32)


def _ctu_top_refs(bot_y, nbx: int):
    """Per-CTU top reference rows from the final row above: returns
    (corner (nbx,), top64 (nbx, 64)) with spec substitution (top-right
    beyond the frame replicates the last available sample)."""
    w = bot_y.shape[0]
    ext = jnp.concatenate([bot_y, jnp.broadcast_to(bot_y[-1], (32,))])
    idx = (32 * jnp.arange(nbx)[:, None]
           + jnp.arange(64)[None, :])
    # frame-edge clamp realizes the replicate-last substitution for the
    # right-most CTU (available samples end at w-1)
    top64 = ext[jnp.clip(idx, 0, w + 31)]
    top64 = jnp.where(idx < w, top64,
                      jnp.broadcast_to(bot_y[-1], top64.shape))
    cidx = jnp.clip(32 * jnp.arange(nbx) - 1, 0, w - 1)
    corner = bot_y[cidx]           # bx=0: substitution -> first available
    return corner, top64


def _top_mode_preds(bot_y, nbx: int):
    """Candidate predictions for the top-only intra modes: returns
    (preds (M, nbx, 32, 32), mode_ids). Mode 26 uses unfiltered refs
    (filterFlag=0: minDistVerHor=0); 27..34 use the [1 2 1] filtered
    top row (spec 8.4.4.2.3, strong smoothing off in the SPS)."""
    corner, top = _ctu_top_refs(bot_y, nbx)
    # filtered top (pF[63] stays unfiltered per spec); one extra column
    # so mode 34's zero-weight b-term slice stays in bounds
    pf = jnp.concatenate([
        ((corner + 2 * top[:, 0] + top[:, 1] + 2) >> 2)[:, None],
        (top[:, :-2] + 2 * top[:, 1:-1] + top[:, 2:] + 2) >> 2,
        top[:, -1:], top[:, -1:],
    ], axis=1)
    top = jnp.concatenate([top, top[:, -1:]], axis=1)
    preds = []
    for mode, ang in zip(ANG_MODES, ANG_ANGLE):
        ref = top if mode == 26 else pf
        rows = []
        for yy in range(32):
            ii = ((yy + 1) * ang) >> 5
            ff = ((yy + 1) * ang) & 31
            a = ref[:, ii:ii + 32]
            b = ref[:, ii + 1:ii + 33]
            rows.append(((32 - ff) * a + ff * b + 16) >> 5)
        preds.append(jnp.stack(rows, axis=1))       # (nbx, 32, 32)
    return jnp.stack(preds), ANG_MODES


def _search_fullpel(cur, ref, sr: int, lam: int):
    """Exhaustive full-pel SAD search per 32x32 block.
    cur/ref: (H, W) int32. Returns mv (nby, nbx, 2) int32 (dy, dx)."""
    h, w = cur.shape
    nby, nbx = h // CTU, w // CTU
    side = 2 * sr + 1
    ref_pad = jnp.pad(ref, sr, mode="edge")
    cur_b = cur.reshape(nby, CTU, nbx, CTU)

    def body(o, carry):
        best_cost, best_o = carry
        dy = o // side - sr
        dx = o % side - sr
        shifted = lax.dynamic_slice(ref_pad, (dy + sr, dx + sr), (h, w))
        sad = jnp.abs(cur_b - shifted.reshape(nby, CTU, nbx, CTU)
                      ).sum(axis=(1, 3))
        cost = sad + lam * (jnp.abs(dx) + jnp.abs(dy))
        better = cost < best_cost
        return (jnp.where(better, cost, best_cost),
                jnp.where(better, o, best_o))

    init = (jnp.full((nby, nbx), 2 ** 30, jnp.int32),
            jnp.zeros((nby, nbx), jnp.int32))
    _, best_o = lax.fori_loop(0, side * side, body, init)
    return jnp.stack([best_o // side - sr, best_o % side - sr], axis=-1)


def _mc_luma(ref, mv, sr: int):
    """Full-pel luma MC: per-pixel gather from the edge-padded ref."""
    h, w = ref.shape
    ref_pad = jnp.pad(ref, sr, mode="edge")
    dy = jnp.repeat(jnp.repeat(mv[..., 0], CTU, 0), CTU, 1)
    dx = jnp.repeat(jnp.repeat(mv[..., 1], CTU, 0), CTU, 1)
    rows = jnp.arange(h)[:, None] + dy + sr
    cols = jnp.arange(w)[None, :] + dx + sr
    return ref_pad[rows, cols]


def _mc_chroma(ref_c, mv, sr: int):
    """Chroma MC at luma-MV/2: integer shift + normative 4-tap filter
    for the half-sample phase (taps -4,36,36,-4, combined 2D rounding
    (acc + 2048) >> 12)."""
    hc, wc = ref_c.shape
    pad = sr // 2 + 2
    ref_pad = jnp.pad(ref_c, pad, mode="edge")
    c = CTU // 2
    dyi = jnp.repeat(jnp.repeat(mv[..., 0] >> 1, c, 0), c, 1)
    dxi = jnp.repeat(jnp.repeat(mv[..., 1] >> 1, c, 0), c, 1)
    fy = jnp.repeat(jnp.repeat(mv[..., 0] & 1, c, 0), c, 1)
    fx = jnp.repeat(jnp.repeat(mv[..., 1] & 1, c, 0), c, 1)
    rows = jnp.arange(hc)[:, None] + dyi + pad
    cols = jnp.arange(wc)[None, :] + dxi + pad

    t0 = jnp.asarray(_TAPS0, jnp.int32)
    t4 = jnp.asarray(_TAPS4, jnp.int32)
    acc = jnp.zeros((hc, wc), jnp.int32)
    for i in range(4):
        wy = jnp.where(fy == 1, t4[i], t0[i])
        for j in range(4):
            wx = jnp.where(fx == 1, t4[j], t0[j])
            acc = acc + wy * wx * ref_pad[rows + (i - 1), cols + (j - 1)]
    return (acc + 2048) >> 12


def _luma_frac_planes(ref, pad: int):
    """Edge-padded ref → dict[(fy, fx)] of CLIPPED 8-bit fractional
    planes at origin offset ``pad`` (spec 8.5.4.2.2.1: 14-bit separable
    intermediates, horizontal pass first, final (v + 32) >> 6)."""
    rp = jnp.pad(ref, pad, mode="edge").astype(jnp.int32)

    def conv(a, taps, axis):
        acc = jnp.zeros_like(a[3:-4] if axis == 0 else a[:, 3:-4])
        for i, t in enumerate(taps):
            if t == 0:
                continue
            sl = (slice(i, a.shape[0] - 7 + i) if axis == 0
                  else (slice(None), slice(i, a.shape[1] - 7 + i)))
            acc = acc + t * a[sl]
        return acc

    planes = {(0, 0): rp[3:-4, 3:-4]}
    hmid = {}
    for fx in (1, 2, 3):
        hv = conv(rp, LUMA_TAPS[fx], axis=1)       # (Hp, W') 14-bit
        hmid[fx] = hv
        planes[(0, fx)] = jnp.clip((hv[3:-4] + 32) >> 6, 0, 255)
    for fy in (1, 2, 3):
        vv = conv(rp, LUMA_TAPS[fy], axis=0)
        planes[(fy, 0)] = jnp.clip((vv[:, 3:-4] + 32) >> 6, 0, 255)
        for fx in (1, 2, 3):
            bv = conv(hmid[fx], LUMA_TAPS[fy], axis=0) >> 6
            planes[(fy, fx)] = jnp.clip((bv + 32) >> 6, 0, 255)
    return planes


def _mc_luma_q(planes, mvq, pad: int):
    """Quarter-pel luma MC: per-CTU select-accumulate over the 16
    fractional planes. All planes share shape (H + 2*pad - 7,
    W + 2*pad - 7) with the frame origin at offset pad - 3."""
    po = pad - 3
    p00 = planes[(0, 0)]
    hp = p00.shape[0] - (2 * pad - 7)
    wp = p00.shape[1] - (2 * pad - 7)
    iy = jnp.repeat(jnp.repeat(mvq[..., 0] >> 2, CTU, 0), CTU, 1)
    ix = jnp.repeat(jnp.repeat(mvq[..., 1] >> 2, CTU, 0), CTU, 1)
    fy = jnp.repeat(jnp.repeat(mvq[..., 0] & 3, CTU, 0), CTU, 1)
    fx = jnp.repeat(jnp.repeat(mvq[..., 1] & 3, CTU, 0), CTU, 1)
    rows = jnp.arange(hp)[:, None] + iy + po
    cols = jnp.arange(wp)[None, :] + ix + po
    acc = jnp.zeros((hp, wp), jnp.int32)
    for (py, px), pl in planes.items():
        m = (fy == py) & (fx == px)
        acc = acc + jnp.where(m, pl[rows, cols], 0)
    return acc


def _mc_chroma_q(ref_c, mvq, pad: int):
    """1/8-pel chroma MC with the normative 4-tap filters (chroma MV =
    luma quarter-pel MV; phase = mv & 7 on the chroma grid)."""
    hc, wc = ref_c.shape
    rp = jnp.pad(ref_c, pad, mode="edge").astype(jnp.int32)
    c = CTU // 2
    dyi = jnp.repeat(jnp.repeat(mvq[..., 0] >> 3, c, 0), c, 1)
    dxi = jnp.repeat(jnp.repeat(mvq[..., 1] >> 3, c, 0), c, 1)
    fy = jnp.repeat(jnp.repeat(mvq[..., 0] & 7, c, 0), c, 1)
    fx = jnp.repeat(jnp.repeat(mvq[..., 1] & 7, c, 0), c, 1)
    rows = jnp.arange(hc)[:, None] + dyi + pad
    cols = jnp.arange(wc)[None, :] + dxi + pad
    taps = jnp.asarray(CHROMA_TAPS, jnp.int32)      # (8 phases, 4)
    wy = taps[fy]                                   # (hc, wc, 4)
    wx = taps[fx]
    # horizontal 4-tap at 4 rows, then vertical combine; 14-bit rule
    # collapses to the combined (acc + 2048) >> 12 for 8-bit inputs
    acc = jnp.zeros((hc, wc), jnp.int32)
    for i in range(4):
        row_acc = jnp.zeros((hc, wc), jnp.int32)
        for j in range(4):
            row_acc = row_acc + wx[..., j] * rp[rows + (i - 1),
                                                cols + (j - 1)]
        acc = acc + wy[..., i] * row_acc
    return (acc + 2048) >> 12


def _refine_subpel(cur, planes, mv_full, pad: int, lam):
    """Half- then quarter-pel refinement around the full-pel winner,
    per-CTU SAD over the fractional planes. Returns quarter-pel MVs."""
    h, w = cur.shape
    nby, nbx = h // CTU, w // CTU
    cur_b = cur.reshape(nby, CTU, nbx, CTU)

    def sad_of(mvq):
        pred = _mc_luma_q(planes, mvq, pad)
        return jnp.abs(cur_b - pred.reshape(nby, CTU, nbx, CTU)
                       ).sum(axis=(1, 3))

    def stage(mvq, step):
        best = sad_of(mvq)
        out = mvq
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dy == 0 and dx == 0:
                    continue
                cand = mvq + jnp.asarray([dy, dx], jnp.int32)
                s = sad_of(cand) + lam
                better = s < best
                best = jnp.where(better, s, best)
                out = jnp.where(better[..., None], cand, out)
        return out

    mvq = mv_full * 4
    mvq = stage(mvq, 2)
    return stage(mvq, 1)


@functools.partial(jax.jit,
                   static_argnames=("qp", "qpc", "sr", "lam", "subpel"))
def encode_pframe(y, u, v, ref_y, ref_u, ref_v, qp: int, qpc: int,
                  sr: int, lam: int, subpel: bool = True):
    """Inter (P) frame: one 32x32 2Nx2N PU per CTU; quarter-pel MVs
    (full-pel search + half/quarter refinement over the normative 8-tap
    planes) when ``subpel``; ``mv`` in the output is QUARTER-pel."""
    h, w = y.shape
    mv_full = _search_fullpel(y, ref_y, sr, lam)
    if subpel:
        pad = sr + 4
        planes = _luma_frac_planes(ref_y, pad)
        mv = _refine_subpel(y, planes, mv_full, pad, lam)
        pred_y = _mc_luma_q(planes, mv, pad)
        pred_u = _mc_chroma_q(ref_u, mv, sr // 2 + 2)
        pred_v = _mc_chroma_q(ref_v, mv, sr // 2 + 2)
    else:
        mv = mv_full * 4
        pred_y = _mc_luma(ref_y, mv_full, sr)
        pred_u = _mc_chroma(ref_u, mv_full, sr)
        pred_v = _mc_chroma(ref_v, mv_full, sr)

    zy, rry = _tq(th.to_blocks(y - pred_y, 32), qp, 5, False)
    zu, rru = _tq(th.to_blocks(u - pred_u, 16), qpc, 4, False)
    zv, rrv = _tq(th.to_blocks(v - pred_v, 16), qpc, 4, False)
    rec_y = jnp.clip(pred_y + th.from_blocks(rry), 0, 255)
    rec_u = jnp.clip(pred_u + th.from_blocks(rru), 0, 255)
    rec_v = jnp.clip(pred_v + th.from_blocks(rrv), 0, 255)
    from ...ops.deblock_hevc import deblock_frame_hevc
    nby, nbx = h // CTU, w // CTU
    nz32 = jnp.any(zy != 0, axis=(-1, -2)).reshape(nby, nbx)
    rec_y, rec_u, rec_v = deblock_frame_hevc(
        rec_y, rec_u, rec_v, qp, qpc, intra=False, nz32=nz32, mv=mv)
    return {
        "mv": mv,
        "levels_y": zy.astype(jnp.int16),
        "levels_u": zu.astype(jnp.int16),
        "levels_v": zv.astype(jnp.int16),
        "recon_y": rec_y, "recon_u": rec_u, "recon_v": rec_v,
    }


# ---------------------------------------------------------------------------
# NumPy twins for the validation decoder (bit-exact with the above).
# ---------------------------------------------------------------------------

def mc_luma_np(ref: np.ndarray, mv: np.ndarray) -> np.ndarray:
    """Index-clipping form of the device's edge-padded gather (the two
    are equivalent because out-of-range reads land on edge samples)."""
    h, w = ref.shape
    dy = np.repeat(np.repeat(mv[..., 0], CTU, 0), CTU, 1)
    dx = np.repeat(np.repeat(mv[..., 1], CTU, 0), CTU, 1)
    rows = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
    cols = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
    return ref[rows, cols]


def mc_chroma_np(ref_c: np.ndarray, mv: np.ndarray) -> np.ndarray:
    hc, wc = ref_c.shape
    ref_c = ref_c.astype(np.int32)
    c = CTU // 2
    dyi = np.repeat(np.repeat(mv[..., 0] >> 1, c, 0), c, 1)
    dxi = np.repeat(np.repeat(mv[..., 1] >> 1, c, 0), c, 1)
    fy = np.repeat(np.repeat(mv[..., 0] & 1, c, 0), c, 1)
    fx = np.repeat(np.repeat(mv[..., 1] & 1, c, 0), c, 1)
    rows = np.arange(hc)[:, None] + dyi
    cols = np.arange(wc)[None, :] + dxi
    acc = np.zeros((hc, wc), np.int64)
    for i in range(4):
        wy = np.where(fy == 1, _TAPS4[i], _TAPS0[i])
        ri = np.clip(rows + (i - 1), 0, hc - 1)
        for j in range(4):
            wx = np.where(fx == 1, _TAPS4[j], _TAPS0[j])
            cj = np.clip(cols + (j - 1), 0, wc - 1)
            acc += wy * wx * ref_c[ri, cj]
    return ((acc + 2048) >> 12).astype(np.int32)


def mc_luma_q_np(ref: np.ndarray, mvq: np.ndarray) -> np.ndarray:
    """NumPy twin of the quarter-pel luma MC (plane construction +
    per-CTU select), bit-exact with _mc_luma_q over _luma_frac_planes."""
    h, w = ref.shape
    pad = int(np.abs(mvq).max() // 4) + 5
    rp = np.pad(ref, pad, mode="edge").astype(np.int64)

    def conv(a, taps, axis):
        n = a.shape[axis] - 7
        acc = np.zeros((n, a.shape[1]) if axis == 0
                       else (a.shape[0], n), np.int64)
        for i, t in enumerate(taps):
            if t == 0:
                continue
            sl = (slice(i, i + n) if axis == 0
                  else (slice(None), slice(i, i + n)))
            acc += t * a[sl]
        return acc

    planes = {(0, 0): rp[3:-4, 3:-4]}
    hmid = {}
    for fx in (1, 2, 3):
        hv = conv(rp, LUMA_TAPS[fx], axis=1)
        hmid[fx] = hv
        planes[(0, fx)] = np.clip((hv[3:-4] + 32) >> 6, 0, 255)
    for fy in (1, 2, 3):
        vv = conv(rp, LUMA_TAPS[fy], axis=0)
        planes[(fy, 0)] = np.clip((vv[:, 3:-4] + 32) >> 6, 0, 255)
        for fx in (1, 2, 3):
            bv = conv(hmid[fx], LUMA_TAPS[fy], axis=0) >> 6
            planes[(fy, fx)] = np.clip((bv + 32) >> 6, 0, 255)

    po = pad - 3
    iy = np.repeat(np.repeat(mvq[..., 0] >> 2, CTU, 0), CTU, 1)
    ix = np.repeat(np.repeat(mvq[..., 1] >> 2, CTU, 0), CTU, 1)
    fy = np.repeat(np.repeat(mvq[..., 0] & 3, CTU, 0), CTU, 1)
    fx = np.repeat(np.repeat(mvq[..., 1] & 3, CTU, 0), CTU, 1)
    rows = np.arange(h)[:, None] + iy + po
    cols = np.arange(w)[None, :] + ix + po
    out = np.zeros((h, w), np.int64)
    for (py, px), pl in planes.items():
        m = (fy == py) & (fx == px)
        if m.any():
            out[m] = pl[rows[m], cols[m]]
    return out.astype(np.int32)


def mc_chroma_q_np(ref_c: np.ndarray, mvq: np.ndarray) -> np.ndarray:
    """NumPy twin of _mc_chroma_q (1/8-pel 4-tap chroma MC)."""
    hc, wc = ref_c.shape
    pad = int(np.abs(mvq).max() // 8) + 3
    rp = np.pad(ref_c, pad, mode="edge").astype(np.int64)
    c = CTU // 2
    dyi = np.repeat(np.repeat(mvq[..., 0] >> 3, c, 0), c, 1)
    dxi = np.repeat(np.repeat(mvq[..., 1] >> 3, c, 0), c, 1)
    fy = np.repeat(np.repeat(mvq[..., 0] & 7, c, 0), c, 1)
    fx = np.repeat(np.repeat(mvq[..., 1] & 7, c, 0), c, 1)
    rows = np.arange(hc)[:, None] + dyi + pad
    cols = np.arange(wc)[None, :] + dxi + pad
    taps = np.asarray(CHROMA_TAPS, np.int64)
    wy = taps[fy]
    wx = taps[fx]
    acc = np.zeros((hc, wc), np.int64)
    for i in range(4):
        row_acc = np.zeros((hc, wc), np.int64)
        for j in range(4):
            row_acc += wx[..., j] * rp[rows + (i - 1), cols + (j - 1)]
        acc += wy[..., i] * row_acc
    return ((acc + 2048) >> 12).astype(np.int32)


def top_mode_preds_np(bot_y: np.ndarray, nbx: int) -> np.ndarray:
    """NumPy twin of _top_mode_preds: (9, nbx, 32, 32) predictions for
    modes 26..34 from the final row above (bit-exact)."""
    w = bot_y.shape[0]
    bot_y = bot_y.astype(np.int64)
    ext = np.concatenate([bot_y, np.full(32, bot_y[-1], np.int64)])
    idx = 32 * np.arange(nbx)[:, None] + np.arange(64)[None, :]
    top = ext[np.clip(idx, 0, w + 31)]
    top = np.where(idx < w, top, bot_y[-1])
    cidx = np.clip(32 * np.arange(nbx) - 1, 0, w - 1)
    corner = bot_y[cidx]
    pf = np.concatenate([
        ((corner + 2 * top[:, 0] + top[:, 1] + 2) >> 2)[:, None],
        (top[:, :-2] + 2 * top[:, 1:-1] + top[:, 2:] + 2) >> 2,
        top[:, -1:], top[:, -1:],
    ], axis=1)
    top = np.concatenate([top, top[:, -1:]], axis=1)
    preds = []
    for mode, ang in zip(ANG_MODES, ANG_ANGLE):
        ref = top if mode == 26 else pf
        rows = []
        for yy in range(32):
            ii = ((yy + 1) * ang) >> 5
            ff = ((yy + 1) * ang) & 31
            a = ref[:, ii:ii + 32]
            b = ref[:, ii + 1:ii + 33]
            rows.append(((32 - ff) * a + ff * b + 16) >> 5)
        preds.append(np.stack(rows, axis=1))
    return np.stack(preds)
