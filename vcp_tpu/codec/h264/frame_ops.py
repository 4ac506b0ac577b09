"""Device-side per-frame encode math (JAX, jitted per frame geometry).

TPU-first design of the intra path: H.264 intra prediction is inherently
wavefront-sequential (prediction reads reconstructed neighbors), which maps
terribly onto a vector machine if done per-macroblock. This encoder instead:

* codes MB row 0 as Intra_16x16 **DC** — sequential only along x (a tiny
  n_mbx-step scan once per IDR), and
* codes all other rows as Intra_16x16 **Vertical** (luma) + Vertical
  (chroma), whose prediction depends only on the row above. That turns the
  frame into a ``lax.scan`` over MB rows where each step vectorizes the
  entire row (all MBs, all 4x4 blocks) through fdct/quant/dequant/idct on
  the VPU, carrying one reconstructed pixel row.

All arithmetic int32-exact (encoder recon must match spec decoders).
Outputs are zig-zag-ordered level arrays laid out for the host entropy
coder (vcp_tpu.codec.h264.cavlc / vcp_tpu.native).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import transform as tf
from .tables import ZIGZAG_4x4

# Luma 4x4 block coding order (luma4x4BlkIdx → (y, x) in 4-pel units).
LUMA_BLK_ORDER = np.array([
    (0, 0), (0, 1), (1, 0), (1, 1),
    (0, 2), (0, 3), (1, 2), (1, 3),
    (2, 0), (2, 1), (3, 0), (3, 1),
    (2, 2), (2, 3), (3, 2), (3, 3),
], dtype=np.int32)

_ZZ = np.array(ZIGZAG_4x4, dtype=np.int32)


def _zigzag(blocks):
    """(..., 4, 4) → (..., 16) in zig-zag scan order."""
    flat = blocks.reshape(*blocks.shape[:-2], 16)
    return flat[..., _ZZ]


def pad_plane(plane: np.ndarray, align: int) -> np.ndarray:
    """Edge-replicate pad to a multiple of ``align`` in both dims."""
    h, w = plane.shape
    ph = (-h) % align
    pw = (-w) % align
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _row_blocks_to_mb(arr_dc, n_mbx):
    """(4, 4*n_mbx) per-block-row DC grid → (n_mbx, 4, 4) per-MB grids."""
    return jnp.moveaxis(arr_dc.reshape(4, n_mbx, 4), 1, 0)


def _mb_to_row_blocks(arr_mb):
    """(n_mbx, 4, 4) → (4, 4*n_mbx)."""
    n_mbx = arr_mb.shape[0]
    return jnp.moveaxis(arr_mb, 0, 1).reshape(4, 4 * n_mbx)


def _intra_row_luma(cur_rows, pred, qp: int):
    """One luma MB row, Intra16x16 with an externally supplied prediction
    (Vertical rows broadcast the recon row above; the DC row 0 passes
    per-MB constants).

    cur_rows, pred: (16, W) int32.
    Returns (z_dc (nMBx,16), z_ac (nMBx,16,16), recon (16, W)).
    """
    w_pix = cur_rows.shape[1]
    n_mbx = w_pix // 16
    res = cur_rows - pred
    blocks = tf.to_blocks4(res)                       # (4, W/4, 4, 4)
    coef = tf.fdct4(blocks)
    dc = coef[..., 0, 0]                              # (4, W/4)
    dc_mb = _row_blocks_to_mb(dc, n_mbx)              # (nMBx, 4, 4)

    z_dc = tf.quant_dc4(tf.hadamard4(dc_mb) >> 1, qp)
    z_ac = tf.quant4(coef, qp, intra=True)            # (4, W/4, 4, 4)

    dc_rec_mb = tf.dequant_dc4(z_dc, qp)              # (nMBx, 4, 4)
    w_rec = tf.dequant4(z_ac, qp)
    w_rec = w_rec.at[..., 0, 0].set(_mb_to_row_blocks(dc_rec_mb))
    res_rec = tf.idct4(w_rec)
    recon = jnp.clip(pred + tf.from_blocks4(res_rec), 0, 255)

    # Entropy layout: per MB, DC block zig-zagged; AC blocks in coding order.
    z_dc_zz = _zigzag(z_dc)                           # (nMBx, 16)
    # z_ac: (4, W/4, 4, 4) → per MB 16 blocks in LUMA_BLK_ORDER
    z_ac_mb = jnp.moveaxis(z_ac.reshape(4, n_mbx, 4, 4, 4), 1, 0)
    # (nMBx, 4(blk_y), 4(blk_x), 4, 4) → gather coding order
    by, bx = LUMA_BLK_ORDER[:, 0], LUMA_BLK_ORDER[:, 1]
    z_ac_ord = z_ac_mb[:, by, bx]                     # (nMBx, 16, 4, 4)
    z_ac_zz = _zigzag(z_ac_ord)                       # (nMBx, 16, 16)
    return z_dc_zz, z_ac_zz, recon


def _intra_row_chroma(cur_rows, pred, qp_c: int):
    """One chroma MB row (8 rows of a chroma plane), prediction supplied
    by the caller (Vertical broadcast or DC constants).

    cur_rows, pred: (8, Wc).
    Returns (z_dc (nMBx,4), z_ac (nMBx,4,16), recon)."""
    wc = cur_rows.shape[1]
    n_mbx = wc // 8
    res = cur_rows - pred
    blocks = tf.to_blocks4(res)                       # (2, Wc/4, 4, 4)
    coef = tf.fdct4(blocks)
    dc = coef[..., 0, 0]                              # (2, Wc/4)
    dc_mb = jnp.moveaxis(dc.reshape(2, n_mbx, 2), 1, 0)  # (nMBx, 2, 2)

    z_dc = tf.quant_dc2(tf.hadamard2(dc_mb), qp_c, intra=True)
    z_ac = tf.quant4(coef, qp_c, intra=True)

    dc_rec = tf.dequant_dc2(z_dc, qp_c)               # (nMBx, 2, 2)
    w_rec = tf.dequant4(z_ac, qp_c)
    w_rec = w_rec.at[..., 0, 0].set(
        jnp.moveaxis(dc_rec, 0, 1).reshape(2, 2 * n_mbx))
    res_rec = tf.idct4(w_rec)
    recon = jnp.clip(pred + tf.from_blocks4(res_rec), 0, 255)

    z_dc_flat = z_dc.reshape(n_mbx, 4)                # raster c00,c01,c10,c11
    # chroma AC blocks per MB in raster order (2x2 blocks of 4x4)
    z_ac_mb = jnp.moveaxis(z_ac.reshape(2, n_mbx, 2, 4, 4), 1, 0)
    z_ac_ord = z_ac_mb.reshape(n_mbx, 4, 4, 4)
    z_ac_zz = _zigzag(z_ac_ord)                       # (nMBx, 4, 16)
    return z_dc_flat, z_ac_zz, recon


def _dc_row0_luma(row0, qp):
    """MB row 0, Intra16x16 **DC** (top unavailable): MB (0,0) predicts
    128, MBs to the right predict the mean of the left MB's recon edge
    column (spec 8.3.3.3). Sequential in x — a tiny per-IDR lax.scan
    (n_mbx steps of one 16x16 MB each)."""
    w_pix = row0.shape[1]
    n_mbx = w_pix // 16
    mbs = jnp.moveaxis(row0.reshape(16, n_mbx, 16), 1, 0)   # (nMBx, 16, 16)

    def step(left_col, xs):
        mbx, cur = xs
        dc = jnp.where(mbx == 0, 128, (left_col.sum() + 8) >> 4)
        pred = jnp.full((16, 16), dc, jnp.int32)
        z_dc, z_ac, recon = _intra_row_luma(cur, pred, qp)
        return recon[:, -1], (z_dc[0], z_ac[0], recon)

    _, (z_dc, z_ac, recon) = jax.lax.scan(
        step, jnp.zeros(16, jnp.int32), (jnp.arange(n_mbx), mbs))
    recon_row = jnp.moveaxis(recon, 0, 1).reshape(16, w_pix)
    return z_dc, z_ac, recon_row


def _dc_row0_chroma(row0, qp_c):
    """Chroma MB row 0, DC mode (top unavailable): per spec 8.3.4.2 all
    four 4x4 sub-blocks fall back to the left MB's edge column — the top
    half predicts mean(left rows 0..3), the bottom half mean(rows 4..7);
    128 for MB (0,0). Sequential in x like the luma row."""
    wc = row0.shape[1]
    n_mbx = wc // 8
    mbs = jnp.moveaxis(row0.reshape(8, n_mbx, 8), 1, 0)     # (nMBx, 8, 8)

    def step(left_col, xs):
        mbx, cur = xs
        dc_t = jnp.where(mbx == 0, 128, (left_col[:4].sum() + 2) >> 2)
        dc_b = jnp.where(mbx == 0, 128, (left_col[4:].sum() + 2) >> 2)
        pred = jnp.concatenate([jnp.full((4, 8), dc_t, jnp.int32),
                                jnp.full((4, 8), dc_b, jnp.int32)])
        z_dc, z_ac, recon = _intra_row_chroma(cur, pred, qp_c)
        return recon[:, -1], (z_dc[0], z_ac[0], recon)

    _, (z_dc, z_ac, recon) = jax.lax.scan(
        step, jnp.zeros(8, jnp.int32), (jnp.arange(n_mbx), mbs))
    recon_row = jnp.moveaxis(recon, 0, 1).reshape(8, wc)
    return z_dc, z_ac, recon_row


@functools.partial(jax.jit, static_argnums=(5,))
def encode_iframe(y, u, v, qp, qp_c, deblock: bool = False):
    """Encode one intra frame (device side).

    y: (H, W) int32 (H, W multiples of 16, already padded);
    u, v: (H/2, W/2) int32.

    Returns dict of level arrays (all n_mby MB rows; row 0 is I16x16-DC,
    rows 1.. are I16x16-Vertical) + recon planes.
    """
    y = y.astype(jnp.int32)
    u = u.astype(jnp.int32)
    v = v.astype(jnp.int32)
    h, w = y.shape
    n_mby, n_mbx = h // 16, w // 16

    y_rows = y.reshape(n_mby, 16, w)
    zl_dc0, zl_ac0, recon_row0 = _dc_row0_luma(y_rows[0], qp)

    def luma_step(top_row, cur_rows):
        pred = jnp.broadcast_to(top_row[None, :], cur_rows.shape)
        z_dc, z_ac, recon = _intra_row_luma(cur_rows, pred, qp)
        return recon[-1, :], (z_dc, z_ac, recon)

    _, (zl_dc, zl_ac, recon_rows) = jax.lax.scan(
        luma_step, recon_row0[15, :], y_rows[1:])
    zl_dc = jnp.concatenate([zl_dc0[None], zl_dc])
    zl_ac = jnp.concatenate([zl_ac0[None], zl_ac])
    recon_y = jnp.concatenate([recon_row0, recon_rows.reshape(-1, w)],
                              axis=0)

    def chroma_plane(plane):
        rows = plane.reshape(n_mby, 8, w // 2)
        z_dc0, z_ac0, rec0 = _dc_row0_chroma(rows[0], qp_c)

        def step(top_row, cur):
            pred = jnp.broadcast_to(top_row[None, :], cur.shape)
            z_dc, z_ac, recon = _intra_row_chroma(cur, pred, qp_c)
            return recon[-1, :], (z_dc, z_ac, recon)

        _, (z_dc, z_ac, rec) = jax.lax.scan(step, rec0[7, :], rows[1:])
        z_dc = jnp.concatenate([z_dc0[None], z_dc])
        z_ac = jnp.concatenate([z_ac0[None], z_ac])
        recon = jnp.concatenate([rec0, rec.reshape(-1, w // 2)], axis=0)
        return z_dc, z_ac, recon

    zu_dc, zu_ac, recon_u = chroma_plane(u)
    zv_dc, zv_ac, recon_v = chroma_plane(v)

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
        # (n_mby, nMBx, ...) — row 0 DC, rows 1.. Vertical
        "luma_dc": zl_dc, "luma_ac": zl_ac,
        "cb_dc": zu_dc, "cb_ac": zu_ac,
        "cr_dc": zv_dc, "cr_ac": zv_ac,
        "recon_y": recon_y.astype(jnp.uint8),
        "recon_u": recon_u.astype(jnp.uint8),
        "recon_v": recon_v.astype(jnp.uint8),
    }
