"""H.264 integer transforms + quantization (device ops, exact int32).

The hot per-frame math the reference delegated to NVENC silicon, rebuilt as
vectorized JAX ops over batches of 4x4 blocks (leading dims arbitrary, so a
whole frame transforms as one fused XLA computation on the VPU). All
arithmetic is exact integer (int32) — the encoder-side reconstruction must
match any spec decoder bit-for-bit.

Formulas follow ISO/IEC 14496-10 (H.264) 8.5.9-8.5.13:
* forward/inverse 4x4 core transform (Cf / Ci with the >>6 rounding),
* 4x4 Hadamard for Intra_16x16 luma DC (forward halved; decoder-side
  scaling << (qP/6 - 2)),
* 2x2 Hadamard for chroma DC (decoder-side (f * V00 << per) >> 1),
* quantization level = (|W| * MF + f) >> qbits, qbits = 15 + qP/6,
  f = (1<<qbits)/3 intra, /6 inter; DC variants use 2f and qbits+1.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

# MF (forward quant multipliers) per qp%6 at coefficient-position classes
# a=(0,0)-like, b=(1,1)-like, c=other.
_MF_ABC = np.array([
    [13107, 5243, 8066],
    [11916, 4660, 7490],
    [10082, 4194, 6554],
    [9362, 3647, 5825],
    [8192, 3355, 5243],
    [7282, 2893, 4559],
], dtype=np.int32)

# V (dequant scale) per qp%6, same position classes.
_V_ABC = np.array([
    [10, 16, 13],
    [11, 18, 14],
    [13, 20, 16],
    [14, 23, 18],
    [16, 25, 20],
    [18, 29, 23],
], dtype=np.int32)

# Position-class map for a 4x4 block: 0 at (0,0),(0,2),(2,0),(2,2);
# 1 at (1,1),(1,3),(3,1),(3,3); 2 elsewhere.
_POS_CLASS = np.array([
    [0, 2, 0, 2],
    [2, 1, 2, 1],
    [0, 2, 0, 2],
    [2, 1, 2, 1],
], dtype=np.int32)

# Precomputed full 4x4 MF / V matrices per qp%6.
MF_TABLE = _MF_ABC[:, _POS_CLASS]          # (6, 4, 4)
V_TABLE = _V_ABC[:, _POS_CLASS]            # (6, 4, 4)

# Chroma QP mapping (Table 8-15) for qPi 30..51; below 30 QPc = qPi.
_CHROMA_QP_TAIL = np.array(
    [29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37, 38, 38,
     38, 39, 39, 39, 39], dtype=np.int32)

CHROMA_QP_FULL = np.concatenate(
    [np.arange(30, dtype=np.int32), _CHROMA_QP_TAIL])  # (52,)


def chroma_qp(qp_y: int, offset: int = 0) -> int:
    q = int(np.clip(qp_y + offset, 0, 51))
    return int(CHROMA_QP_FULL[q])


def chroma_qp_t(qp_y, offset: int = 0):
    """Traced-friendly chroma QP mapping (qp may be a jax scalar)."""
    q = jnp.clip(qp_y + offset, 0, 51)
    return jnp.asarray(CHROMA_QP_FULL)[q]


# ---------------------------------------------------------------------------
# Core 4x4 transform. Blocks shaped (..., 4, 4), int32.
# ---------------------------------------------------------------------------

def fdct4(blocks):
    """Forward core transform W = Cf X Cf^T (butterfly form, exact)."""
    x = blocks.astype(jnp.int32)
    # rows (axis -2): s/d butterflies
    a = x[..., 0, :] + x[..., 3, :]
    b = x[..., 1, :] + x[..., 2, :]
    c = x[..., 1, :] - x[..., 2, :]
    d = x[..., 0, :] - x[..., 3, :]
    r0 = a + b
    r1 = 2 * d + c
    r2 = a - b
    r3 = d - 2 * c
    y = jnp.stack([r0, r1, r2, r3], axis=-2)
    # columns (axis -1)
    a = y[..., :, 0] + y[..., :, 3]
    b = y[..., :, 1] + y[..., :, 2]
    c = y[..., :, 1] - y[..., :, 2]
    d = y[..., :, 0] - y[..., :, 3]
    c0 = a + b
    c1 = 2 * d + c
    c2 = a - b
    c3 = d - 2 * c
    return jnp.stack([c0, c1, c2, c3], axis=-1)


def idct4(coeffs):
    """Inverse core transform with the spec's (x + 32) >> 6 rounding.

    Pass order matters for exactness (the intra-pass >>1 truncates):
    spec 8.5.12.2 runs the horizontal pass (within each row) first, then
    the vertical pass.
    """
    w = coeffs.astype(jnp.int32)
    # horizontal pass: combine columns within each row
    e0 = w[..., :, 0] + w[..., :, 2]
    e1 = w[..., :, 0] - w[..., :, 2]
    e2 = (w[..., :, 1] >> 1) - w[..., :, 3]
    e3 = w[..., :, 1] + (w[..., :, 3] >> 1)
    f0 = e0 + e3
    f1 = e1 + e2
    f2 = e1 - e2
    f3 = e0 - e3
    y = jnp.stack([f0, f1, f2, f3], axis=-1)
    # vertical pass: combine rows
    e0 = y[..., 0, :] + y[..., 2, :]
    e1 = y[..., 0, :] - y[..., 2, :]
    e2 = (y[..., 1, :] >> 1) - y[..., 3, :]
    e3 = y[..., 1, :] + (y[..., 3, :] >> 1)
    g0 = e0 + e3
    g1 = e1 + e2
    g2 = e1 - e2
    g3 = e0 - e3
    out = jnp.stack([g0, g1, g2, g3], axis=-2)
    return (out + 32) >> 6


def hadamard4(blocks):
    """4x4 Hadamard (unnormalized butterflies), used both directions."""
    x = blocks.astype(jnp.int32)
    a = x[..., 0, :] + x[..., 3, :]
    b = x[..., 1, :] + x[..., 2, :]
    c = x[..., 1, :] - x[..., 2, :]
    d = x[..., 0, :] - x[..., 3, :]
    y = jnp.stack([a + b, d + c, a - b, d - c], axis=-2)
    a = y[..., :, 0] + y[..., :, 3]
    b = y[..., :, 1] + y[..., :, 2]
    c = y[..., :, 1] - y[..., :, 2]
    d = y[..., :, 0] - y[..., :, 3]
    return jnp.stack([a + b, d + c, a - b, d - c], axis=-1)


def hadamard2(blocks):
    """2x2 Hadamard for chroma DC, shape (..., 2, 2)."""
    x = blocks.astype(jnp.int32)
    s0 = x[..., 0, :] + x[..., 1, :]
    s1 = x[..., 0, :] - x[..., 1, :]
    y = jnp.stack([s0, s1], axis=-2)
    t0 = y[..., :, 0] + y[..., :, 1]
    t1 = y[..., :, 0] - y[..., :, 1]
    return jnp.stack([t0, t1], axis=-1)


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------

# All quantization entry points accept ``qp`` either as a Python int
# (static: table lookups fold into constants) or as a traced jax scalar
# (dynamic: enables per-GOP rate control without recompilation).

def _fq(qp, intra: bool):
    qbits = 15 + qp // 6
    if isinstance(qp, int):
        f = (1 << qbits) // (3 if intra else 6)
    else:
        f = jnp.left_shift(1, qbits) // (3 if intra else 6)
    return qbits, f


# Levels are clamped so the CAVLC level escape (suffixLength 0, 12-bit
# suffix → levelCode <= 4125, |level| <= 2063) can always represent them;
# the clamp is applied before recon too, so encoder and decoder agree.
MAX_LEVEL = 2000


def quant4(coeffs, qp, intra: bool):
    """Quantize 4x4 core coefficients: (..., 4, 4) int32 → levels."""
    qbits, f = _fq(qp, intra)
    mf = jnp.asarray(MF_TABLE)[qp % 6]
    w = coeffs.astype(jnp.int32)
    mag = jnp.minimum((jnp.abs(w) * mf + f) >> qbits, MAX_LEVEL)
    return jnp.where(w < 0, -mag, mag)


def dequant4(levels, qp):
    """Dequantize 4x4 AC/core levels: W' = Z * V * 2^(qp/6)."""
    v = jnp.asarray(V_TABLE)[qp % 6]
    return levels.astype(jnp.int32) * v << (qp // 6)


def quant_dc4(dc_had, qp, intra: bool = True):
    """Quantize Intra_16x16 luma DC: input = hadamard4(dc)>>1."""
    qbits, f = _fq(qp, intra)
    mf00 = jnp.asarray(MF_TABLE)[qp % 6, 0, 0]
    w = dc_had.astype(jnp.int32)
    mag = jnp.minimum((jnp.abs(w) * mf00 + 2 * f) >> (qbits + 1), MAX_LEVEL)
    return jnp.where(w < 0, -mag, mag)


def dequant_dc4(levels, qp):
    """Dequantize luma DC after inverse Hadamard (spec 8.5.10)."""
    v00 = jnp.asarray(V_TABLE)[qp % 6, 0, 0]
    per = qp // 6
    f = hadamard4(levels)
    if isinstance(qp, int):
        if per >= 2:
            return (f * v00) << (per - 2)
        return (f * v00 + (1 << (1 - per))) >> (2 - per)
    hi = (f * v00) << jnp.maximum(per - 2, 0)
    lo = (f * v00 + jnp.left_shift(1, jnp.maximum(1 - per, 0))) \
        >> jnp.maximum(2 - per, 0)
    return jnp.where(per >= 2, hi, lo)


def quant_dc2(dc_had, qp, intra: bool):
    """Quantize chroma DC: input = hadamard2(dc) (no halving)."""
    qbits, f = _fq(qp, intra)
    mf00 = jnp.asarray(MF_TABLE)[qp % 6, 0, 0]
    w = dc_had.astype(jnp.int32)
    mag = jnp.minimum((jnp.abs(w) * mf00 + 2 * f) >> (qbits + 1), MAX_LEVEL)
    return jnp.where(w < 0, -mag, mag)


def dequant_dc2(levels, qp):
    """Dequantize chroma DC after inverse 2x2 Hadamard (spec 8.5.11):
    dc = (f * V00 << per) >> 1."""
    v00 = jnp.asarray(V_TABLE)[qp % 6, 0, 0]
    per = qp // 6
    f = hadamard2(levels)
    return (f * v00 << per) >> 1


# ---------------------------------------------------------------------------
# Block (de)tiling helpers
# ---------------------------------------------------------------------------

def to_blocks4(plane):
    """(..., H, W) → (..., H/4, W/4, 4, 4)."""
    *lead, h, w = plane.shape
    x = plane.reshape(*lead, h // 4, 4, w // 4, 4)
    return jnp.moveaxis(x, -3, -2)


def from_blocks4(blocks):
    """(..., H/4, W/4, 4, 4) → (..., H, W)."""
    *lead, hb, wb, _, _ = blocks.shape
    x = jnp.moveaxis(blocks, -2, -3)
    return x.reshape(*lead, hb * 4, wb * 4)


# ---------------------------------------------------------------------------
# Pure-numpy twins (decoder hot path)
# ---------------------------------------------------------------------------
# The validation decoder calls the inverse transforms once per macroblock;
# routing those through jit'd jax functions costs a dispatch per call
# (53 s/frame at 1080p measured). These numpy twins implement the exact
# same integer math with zero dispatch overhead. Closed-loop tests assert
# decode(encode(x)) equals the device recon bit-for-bit, which pins the
# twins to the jax versions.

def idct4_np(coeffs):
    w = np.asarray(coeffs, np.int32)
    e0 = w[..., :, 0] + w[..., :, 2]
    e1 = w[..., :, 0] - w[..., :, 2]
    e2 = (w[..., :, 1] >> 1) - w[..., :, 3]
    e3 = w[..., :, 1] + (w[..., :, 3] >> 1)
    y = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-1)
    e0 = y[..., 0, :] + y[..., 2, :]
    e1 = y[..., 0, :] - y[..., 2, :]
    e2 = (y[..., 1, :] >> 1) - y[..., 3, :]
    e3 = y[..., 1, :] + (y[..., 3, :] >> 1)
    out = np.stack([e0 + e3, e1 + e2, e1 - e2, e0 - e3], axis=-2)
    return (out + 32) >> 6


def hadamard4_np(blocks):
    x = np.asarray(blocks, np.int32)
    a = x[..., 0, :] + x[..., 3, :]
    b = x[..., 1, :] + x[..., 2, :]
    c = x[..., 1, :] - x[..., 2, :]
    d = x[..., 0, :] - x[..., 3, :]
    y = np.stack([a + b, d + c, a - b, d - c], axis=-2)
    a = y[..., :, 0] + y[..., :, 3]
    b = y[..., :, 1] + y[..., :, 2]
    c = y[..., :, 1] - y[..., :, 2]
    d = y[..., :, 0] - y[..., :, 3]
    return np.stack([a + b, d + c, a - b, d - c], axis=-1)


def hadamard2_np(blocks):
    x = np.asarray(blocks, np.int32)
    s0 = x[..., 0, :] + x[..., 1, :]
    s1 = x[..., 0, :] - x[..., 1, :]
    y = np.stack([s0, s1], axis=-2)
    return np.stack([y[..., :, 0] + y[..., :, 1],
                     y[..., :, 0] - y[..., :, 1]], axis=-1)


def dequant4_np(levels, qp: int):
    v = np.asarray(V_TABLE)[qp % 6]
    return np.asarray(levels, np.int32) * v << (qp // 6)


def dequant_dc4_np(levels, qp: int):
    v00 = int(V_TABLE[qp % 6, 0, 0])
    per = qp // 6
    f = hadamard4_np(levels)
    if per >= 2:
        return (f * v00) << (per - 2)
    return (f * v00 + (1 << (1 - per))) >> (2 - per)


def dequant_dc2_np(levels, qp: int):
    v00 = int(V_TABLE[qp % 6, 0, 0])
    per = qp // 6
    f = hadamard2_np(levels)
    return (f * v00 << per) >> 1


def dequant4_np_qpmap(levels, qp_map):
    """Per-macroblock-QP 4x4 dequant: ``levels`` (nMBy, nMBx, B, 4, 4),
    ``qp_map`` (nMBy, nMBx). Foreign adaptive-quant streams carry a
    different QP on every MB (mb_qp_delta), so the decoder's batched
    residual pass dequants with a per-MB table lookup instead of the
    scalar fast path."""
    qp = np.asarray(qp_map, np.int32)
    v = np.asarray(V_TABLE)[qp % 6]                # (nMBy, nMBx, 4, 4)
    sh = (qp // 6)[..., None, None, None]
    return (np.asarray(levels, np.int32)
            * v[:, :, None, :, :]) << sh


def dequant_dc2_np_qpmap(levels, qpc_map):
    """Per-MB-QP chroma DC dequant: ``levels`` (nMBy, nMBx, 2, 2),
    ``qpc_map`` (nMBy, nMBx) CHROMA qp."""
    qp = np.asarray(qpc_map, np.int32)
    v00 = np.asarray(V_TABLE)[qp % 6, 0, 0]        # (nMBy, nMBx)
    f = hadamard2_np(levels)
    return (f * v00[..., None, None] << (qp // 6)[..., None, None]) >> 1
