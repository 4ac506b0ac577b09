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


def _tq(res, qp: int, log2: int, intra: bool):
    """Transform+quant+recon for batched residual blocks.
    Returns (levels, recon_residual)."""
    c = th.fwd(res, log2)
    z = th.quant(c, qp, log2, intra)
    r = th.inv(th.dequant(z, qp, log2), log2)
    return z, r


@functools.partial(jax.jit, static_argnames=("qp", "qpc"))
def encode_iframe(y, u, v, qp: int, qpc: int):
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

    # ---- CTU rows >= 1: Vertical mode, scan over rows ----
    if nby > 1:
        rows_y = y[32:].reshape(nby - 1, 32, w)
        rows_u = u[16:].reshape(nby - 1, 16, wc)
        rows_v = v[16:].reshape(nby - 1, 16, wc)

        def vstep(carry, rows):
            bot_y, bot_u, bot_v = carry
            ry_, ru_, rv_ = rows
            py = jnp.broadcast_to(bot_y, (32, w))
            pu = jnp.broadcast_to(bot_u, (16, wc))
            pv = jnp.broadcast_to(bot_v, (16, wc))
            zy, rry = _tq(th.to_blocks(ry_ - py, 32), qp, 5, True)
            zu, rru = _tq(th.to_blocks(ru_ - pu, 16), qpc, 4, True)
            zv, rrv = _tq(th.to_blocks(rv_ - pv, 16), qpc, 4, True)
            rec_yr = jnp.clip(py + th.from_blocks(rry), 0, 255)
            rec_ur = jnp.clip(pu + th.from_blocks(rru), 0, 255)
            rec_vr = jnp.clip(pv + th.from_blocks(rrv), 0, 255)
            return ((rec_yr[-1], rec_ur[-1], rec_vr[-1]),
                    (zy[0], zu[0], zv[0], rec_yr, rec_ur, rec_vr))

        init_v = (rec_y0[-1], rec_u0[-1], rec_v0[-1])
        _, (zyr, zur, zvr, recy, recu, recv) = lax.scan(
            vstep, init_v, (rows_y, rows_u, rows_v))
        levels_y = jnp.concatenate([levels_y, zyr], axis=0)
        levels_u = jnp.concatenate([levels_u, zur], axis=0)
        levels_v = jnp.concatenate([levels_v, zvr], axis=0)
        rec_y = jnp.concatenate([rec_y0, recy.reshape(-1, w)], axis=0)
        rec_u = jnp.concatenate([rec_u0, recu.reshape(-1, wc)], axis=0)
        rec_v = jnp.concatenate([rec_v0, recv.reshape(-1, wc)], axis=0)

    return {
        "levels_y": levels_y.astype(jnp.int16),
        "levels_u": levels_u.astype(jnp.int16),
        "levels_v": levels_v.astype(jnp.int16),
        "recon_y": rec_y, "recon_u": rec_u, "recon_v": rec_v,
    }


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


@functools.partial(jax.jit,
                   static_argnames=("qp", "qpc", "sr", "lam"))
def encode_pframe(y, u, v, ref_y, ref_u, ref_v, qp: int, qpc: int,
                  sr: int, lam: int):
    """Inter (P) frame: one 32x32 2Nx2N PU per CTU, full-pel MVs."""
    h, w = y.shape
    mv = _search_fullpel(y, ref_y, sr, lam)
    pred_y = _mc_luma(ref_y, mv, sr)
    pred_u = _mc_chroma(ref_u, mv, sr)
    pred_v = _mc_chroma(ref_v, mv, sr)

    zy, rry = _tq(th.to_blocks(y - pred_y, 32), qp, 5, False)
    zu, rru = _tq(th.to_blocks(u - pred_u, 16), qpc, 4, False)
    zv, rrv = _tq(th.to_blocks(v - pred_v, 16), qpc, 4, False)
    rec_y = jnp.clip(pred_y + th.from_blocks(rry), 0, 255)
    rec_u = jnp.clip(pred_u + th.from_blocks(rru), 0, 255)
    rec_v = jnp.clip(pred_v + th.from_blocks(rrv), 0, 255)
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
