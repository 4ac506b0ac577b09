"""Frame scaling (device op).

The reference exposed scaling through ffmpeg args (``-s WxH`` /
``-vf scale=``); here it is a vectorized bilinear resampler usable inside
the jitted encode path (SURVEY.md §2.5 "scaling" kernel).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1, 2))
def bilinear_resize(plane, out_h: int, out_w: int):
    """uint8/int (H, W) → (out_h, out_w) uint8, bilinear with edge clamp."""
    h, w = plane.shape
    x = plane.astype(jnp.float32)
    # sample centers (align half-pixel, the conventional video convention)
    ys = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) * (h / out_h) - 0.5
    xs = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) * (w / out_w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)[:, None]
    wx = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)[None, :]
    a = x[y0][:, x0]
    b = x[y0][:, x1]
    c = x[y1][:, x0]
    d = x[y1][:, x1]
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    out = top * (1 - wy) + bot * wy
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def scale_yuv420(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                 out_h: int, out_w: int):
    """Scale a 4:2:0 triplet; output dims rounded to even."""
    out_h, out_w = out_h & ~1, out_w & ~1
    ys = np.asarray(bilinear_resize(y, out_h, out_w))
    us = np.asarray(bilinear_resize(u, out_h // 2, out_w // 2))
    vs = np.asarray(bilinear_resize(v, out_h // 2, out_w // 2))
    return ys, us, vs
