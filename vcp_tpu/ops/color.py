"""Color-space conversion kernels (device ops).

SURVEY.md §2.5 inventory: NV12/YUV420 ↔ RGB conversion over HBM-resident
frame batches. BT.601 limited-range (the H.264 default when VUI is absent),
exact integer arithmetic so conversions are reproducible across backends.

Layouts:
* I420 planar: Y (H, W), U/V (H/2, W/2)
* NV12: Y (H, W), interleaved UV (H/2, W)
* RGB:  (H, W, 3) uint8
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nv12_to_i420(y, uv):
    """NV12 interleaved chroma → planar U, V."""
    u = uv[:, 0::2]
    v = uv[:, 1::2]
    return y, u, v


def i420_to_nv12(y, u, v):
    hc, wc = u.shape
    uv = jnp.stack([u, v], axis=-1).reshape(hc, 2 * wc)
    return y, uv


def _upsample2(plane, h, w):
    """Nearest-neighbor 2x chroma upsample to (h, w)."""
    up = jnp.repeat(jnp.repeat(plane, 2, axis=0), 2, axis=1)
    return up[:h, :w]


@jax.jit
def yuv420_to_rgb(y, u, v):
    """BT.601 limited-range YUV 4:2:0 → RGB888 (exact integer math)."""
    h, w = y.shape
    yf = (y.astype(jnp.int32) - 16) * 298
    uf = _upsample2(u.astype(jnp.int32), h, w) - 128
    vf = _upsample2(v.astype(jnp.int32), h, w) - 128
    r = (yf + 409 * vf + 128) >> 8
    g = (yf - 100 * uf - 208 * vf + 128) >> 8
    b = (yf + 516 * uf + 128) >> 8
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb, 0, 255).astype(jnp.uint8)


@jax.jit
def rgb_to_yuv420(rgb):
    """RGB888 → BT.601 limited-range YUV 4:2:0 (2x2 box chroma)."""
    x = rgb.astype(jnp.int32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = (66 * r + 129 * g + 25 * b + 128 >> 8) + 16
    u = (-38 * r - 74 * g + 112 * b + 128 >> 8) + 128
    v = (112 * r - 94 * g - 18 * b + 128 >> 8) + 128
    h, w = y.shape
    # 2x2 box filter subsample for chroma
    u4 = u.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    v4 = v.reshape(h // 2, 2, w // 2, 2).sum(axis=(1, 3))
    uc = (u4 + 2) >> 2
    vc = (v4 + 2) >> 2
    return (jnp.clip(y, 16, 235).astype(jnp.uint8),
            jnp.clip(uc, 16, 240).astype(jnp.uint8),
            jnp.clip(vc, 16, 240).astype(jnp.uint8))
