"""Synthetic test-video generation helpers."""

import numpy as np


def synth_frame(w, h, t, rng=None):
    """Gradient background + moving rectangle + mild texture. Returns
    (y, u, v) uint8 planes, 4:2:0."""
    yy, xx = np.mgrid[0:h, 0:w]
    y = (32 + (xx * 160) // max(1, w) + (yy * 48) // max(1, h)).astype(np.int32)
    # moving bright box
    bx = (7 * t) % max(1, w - 16)
    by = (3 * t) % max(1, h - 16)
    y[by:by + 16, bx:bx + 16] = 220
    # deterministic texture
    tex = ((xx * 7 + yy * 13 + t) % 5).astype(np.int32)
    y = np.clip(y + tex, 0, 255).astype(np.uint8)
    u = np.full((h // 2, w // 2), 110, np.uint8)
    v = np.full((h // 2, w // 2), 150, np.uint8)
    u[by // 2:by // 2 + 8, bx // 2:bx // 2 + 8] = 90
    v[by // 2:by // 2 + 8, bx // 2:bx // 2 + 8] = 170
    return y, u, v


def synth_video(w, h, n):
    return [synth_frame(w, h, t) for t in range(n)]
