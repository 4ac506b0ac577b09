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

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(2,))
def full_search(cur, ref, search_range: int, lam=4):
    """Full-pel exhaustive SAD search over ±search_range, 16x16 MBs.

    cur, ref: (H, W) int32 with H, W multiples of 16.
    Returns (mv (nMBy, nMBx, 2) int32 [dy, dx], best_cost).
    Cost = SAD + lam * (|dx| + |dy|) — a rate bias toward short vectors.
    """
    h, w = cur.shape
    n_mby, n_mbx = h // 16, w // 16
    sr = search_range
    side = 2 * sr + 1
    ref_pad = jnp.pad(ref, sr, mode="edge")
    cur_mb = cur.reshape(n_mby, 16, n_mbx, 16)

    def body(o, carry):
        best_cost, best_o = carry
        dy = o // side - sr
        dx = o % side - sr
        shifted = jax.lax.dynamic_slice(ref_pad, (dy + sr, dx + sr), (h, w))
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
def mc_luma(ref, mv, search_range: int):
    """Full-pel luma MC: gather each MB's 16x16 block at its MV.

    ref: (H, W) int32; mv: (nMBy, nMBx, 2) [dy, dx] full-pel.
    """
    h, w = ref.shape
    sr = search_range
    ref_pad = jnp.pad(ref, sr, mode="edge")
    dy = jnp.repeat(jnp.repeat(mv[..., 0], 16, axis=0), 16, axis=1)
    dx = jnp.repeat(jnp.repeat(mv[..., 1], 16, axis=0), 16, axis=1)
    rows = jnp.arange(h)[:, None] + dy + sr
    cols = jnp.arange(w)[None, :] + dx + sr
    return ref_pad[rows, cols]


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
