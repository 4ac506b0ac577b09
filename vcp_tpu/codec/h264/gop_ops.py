"""GOP-at-once device encoding (the production hot path).

Per-frame device dispatch pays a host↔device round trip per array, which
on tunneled TPU deployments dominates wall clock (measured ~0.1 s/fetch vs
~25 ms of actual 1080p P-step compute). This module keeps the whole GOP on
device:

* the P-frame recurrence (each frame predicts from the previous frame's
  reconstruction) runs as a ``lax.scan`` ON DEVICE — reference planes
  never leave HBM,
* each chunk of N P-frames is ONE jit call, and all level/mv outputs are
  packed into ONE int16 buffer → one fetch per chunk instead of ~9 per
  frame.

The math is identical to pframe._encode_pframe_device (asserted by
equivalence tests): same search, quant, recon.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import motion as mops
from ...ops import transform as tf
from .frame_ops import LUMA_BLK_ORDER, _zigzag

# per-MB int16 words in the packed layout:
#   [mv 2 | cb_dc 4 | cr_dc 4 | flags 1 | pad 1 | luma 16x16 | cb_ac 4x16
#    | cr_ac 4x16]
# flags bit 0 = transform_size_8x8 (luma words hold four 64-coeff 8x8
# scans, rows 4b..4b+4 each, instead of sixteen 4x4 scans). The 12 meta
# words lead so the 384 block words form one contiguous payload (the
# sparse fetch path gathers it row-wise without a copy).
MB_WORDS_MV = 2
MB_WORDS_LUMA = 256
MB_WORDS_CDC = 4
MB_WORDS_CAC = 64
MB_META = MB_WORDS_MV + 2 * MB_WORDS_CDC + 2              # 12
MB_PAYLOAD = MB_WORDS_LUMA + 2 * MB_WORDS_CAC             # 384
MB_WORDS = MB_META + MB_PAYLOAD


def _use_pallas_me() -> bool:
    """Pallas motion-search kernel: default on TPU backends (bit-identical
    to the XLA path — proven compiled, in-pipeline, and in interpret mode;
    see ops.motion_pallas). VCP_PALLAS_ME=0 opts out; =1 forces on."""
    import os
    import jax as _jax
    val = os.environ.get("VCP_PALLAS_ME", "")
    if val == "0":
        return False
    if val == "1":
        return _jax.default_backend() not in ("cpu",)
    return _jax.default_backend() not in ("cpu",)


def _use_hier_me(sr: int) -> bool:
    """Two-level pyramid search (ops.motion.hier_search): default on for
    the quality presets' wide windows (R >= 12), where the exhaustive
    sweep's (2R+1)^2 full-plane passes dominate device time (round-4
    profile: ~1.5 s/frame at effort 6). VCP_HIER_ME=0 opts out, =1
    forces on at every range. Read at trace time (cached per static
    sr, like _use_pallas_me)."""
    import os
    val = os.environ.get("VCP_HIER_ME", "")
    if val == "0":
        return False
    if val == "1":
        return True
    return sr >= 12


# x264-style decimation weights: an isolated ±1 coefficient preceded by
# `run` zeros contributes tab[min(run, 7)]; blocks whose total falls below
# the threshold cost more bits than the distortion they remove.
_DECIMATE_TAB = np.array([3, 2, 2, 1, 1, 1, 0, 0], np.int32)
DECIMATE_THRESHOLD = 6     # whole-MB threshold (x264's p-skip decimation)


def decimate_keep_mask(z_zz, extra: int = 0):
    """Per-MB keep mask for zig-zag level arrays (..., 16 blocks, 16).

    An entire macroblock's luma residual is dropped when every |level|
    <= 1 and the summed decimate score (position-run weighted count of
    the ±1s, x264's dead-MB heuristic) stays below threshold — i.e. the
    residual is isolated noise cheaper to drop than to code. Applied
    identically to entropy input and reconstruction, so it is simply a
    sharper quantizer — no encoder/decoder mismatch possible.
    Returns (..., ) bool per MB (leading dims of z_zz minus two).
    """
    a = jnp.abs(z_zz.astype(jnp.int32))
    nz = a > 0
    big = jnp.any(a > 1, axis=(-1, -2))
    idx = jnp.arange(z_zz.shape[-1], dtype=jnp.int32)
    marked = jnp.where(nz, idx, -1)
    prev = jax.lax.associative_scan(jnp.maximum, marked, axis=-1)
    # gap of zeros immediately before each nonzero
    prev_before = jnp.concatenate(
        [jnp.full(marked.shape[:-1] + (1,), -1, jnp.int32),
         prev[..., :-1]], axis=-1)
    gap = jnp.clip(idx - prev_before - 1, 0, 7)
    score = jnp.sum(jnp.where(nz, jnp.asarray(_DECIMATE_TAB)[gap], 0),
                    axis=(-1, -2))
    return big | (score >= DECIMATE_THRESHOLD + extra)


def _pstep(cur_y, cur_u, cur_v, ref_y, ref_u, ref_v, qp, qpc, sr, lam,
           subpel: int = 1, deblock: bool = False, t8: bool = False):
    """One P frame; returns (packed int16 (nMB, MB_WORDS), recon planes).
    MVs are in QUARTER-pel units throughout."""
    packed, recon_y, recon_u, recon_v, nz4, mv, t8g = _pstep_core(
        cur_y, cur_u, cur_v, ref_y, ref_u, ref_v, qp, qpc, sr, lam,
        subpel=subpel, t8=t8)
    if deblock:
        from ...ops import deblock as dbf
        h, w = cur_y.shape
        n_mby, n_mbx = h // 16, w // 16
        qp_mb = jnp.full((n_mby, n_mbx), qp, jnp.int32)
        intra = jnp.zeros((n_mby, n_mbx), bool)
        recon_y, recon_u, recon_v = dbf.deblock_frame(
            recon_y, recon_u, recon_v, qp_mb, intra, nz4, mv,
            tf.CHROMA_QP_FULL, no_strong=True, qp_scalar=qp,
            t8=t8g if t8 else None)
    return packed, recon_y, recon_u, recon_v


def _pstep_core(cur_y, cur_u, cur_v, ref_y, ref_u, ref_v, qp, qpc, sr, lam,
                subpel: int = 1, row0=0, t8: bool = False):
    """Band-parametrized P step shared by single-chip and tile-sharded
    paths: ``cur_*`` may be a horizontal band starting at frame row
    ``row0`` against the taller full-frame references (multi-chip mesh,
    parallel.mesh.encode_pchunk_sharded). ``row0=0`` with matching shapes
    is the whole-frame case. Deblocking (frame-global) is NOT applied
    here; returns (packed, recon bands pre-deblock, nz4 grid, mvq, t8
    grid)."""
    h, w = cur_y.shape
    n_mby, n_mbx = h // 16, w // 16
    # the Pallas search kernel is whole-frame only; a traced (band) row0
    # routes to the identical XLA search
    whole_frame = isinstance(row0, int) and row0 == 0

    pred_full = None
    if whole_frame and subpel and _use_hier_me(sr):
        mv_full = mops.hier_search(cur_y, ref_y, sr, lam)
    elif whole_frame and _use_pallas_me():
        from ...ops.motion_pallas import full_search_pallas
        if subpel:
            mv_full = full_search_pallas(cur_y, ref_y, sr, lam)
        else:
            # fused search+MC: the kernel emits the winning block while
            # the window is VMEM-resident (saves a standalone gather MC)
            mv_full, pred_full = full_search_pallas(cur_y, ref_y, sr, lam,
                                                    with_pred=True)
    else:
        mv_full, _ = mops.full_search(cur_y, ref_y, sr, lam, row0)

    if subpel == 1:
        # fused half-pel refine + MC: one aligned-window gather instead
        # of 13 full-frame gathers (ops.motion.refine_half_mc)
        pad = sr + 6
        margin = pad - 3
        planes = jnp.stack(
            mops.half_planes(jnp.pad(ref_y, pad, mode="edge")))
        mv, pred_y = mops.refine_half_mc(cur_y, planes, mv_full, lam,
                                         margin, row0=row0)
    elif subpel:
        pad = sr + 6
        margin = pad - 3
        planes = jnp.stack(
            mops.half_planes(jnp.pad(ref_y, pad, mode="edge")))
        mv = mops.refine_subpel(cur_y, planes, mv_full, lam, margin,
                                quarter=True, row0=row0)
        pred_y = mops.mc_luma_q(planes, mv, margin, row0)
    else:
        # full-pel: no interpolated planes
        mv = mv_full * 4
        pred_y = pred_full if pred_full is not None \
            else mops.mc_luma(ref_y, mv_full, sr, row0)
    # chroma MC: select-accumulate kernel on TPU (generic gathers lower
    # to scalar loads there), plain gather on CPU where it's fastest
    row0c = row0 // 2
    if jax.default_backend() == "cpu":
        pred_u = mops.mc_chroma_q(ref_u, mv, sr // 2 + 2, row0c)
        pred_v = mops.mc_chroma_q(ref_v, mv, sr // 2 + 2, row0c)
    else:
        pred_u, pred_v = mops.mc_chroma_q_pair(ref_u, ref_v, mv,
                                               sr // 2 + 2, row0c)

    (z_luma, cb_dc, cb_ac, cr_dc, cr_ac,
     recon_y, recon_u, recon_v, nz4, t8g) = _residual_recon(
        cur_y, cur_u, cur_v, pred_y, pred_u, pred_v, qp, qpc, t8=t8)
    packed = jnp.concatenate([
        mv.reshape(n_mby, n_mbx, 2),
        cb_dc, cr_dc,
        t8g.astype(jnp.int32)[..., None],
        jnp.zeros((n_mby, n_mbx, 1), jnp.int32),
        z_luma, cb_ac, cr_ac,
    ], axis=-1).astype(jnp.int16).reshape(-1)
    return packed, recon_y, recon_u, recon_v, nz4, mv, t8g


def _residual_recon(cur_y, cur_u, cur_v, pred_y, pred_u, pred_v, qp, qpc,
                    decimate_extra: int = 0, t8: bool = False):
    """Inter residual: transform/quantize/reconstruct given prediction
    planes. Shared by the P step and the B step (the only difference
    between them is how the prediction is formed). Returns zig-zagged
    level arrays, recon planes, the nz4 grid for deblocking, and the
    per-MB transform_size_8x8 grid (all-False when ``t8`` is off).
    ``decimate_extra`` raises the dead-MB threshold (non-reference B
    pictures drop marginal residuals more aggressively — nothing
    propagates from them). ``t8`` (static) enables the High-profile
    adaptive 8x8 luma transform: both paths are computed and each MB
    picks by rate-distortion cost (SSD + lambda2 * bits estimate)."""
    h, w = cur_y.shape
    n_mby, n_mbx = h // 16, w // 16
    diff = cur_y - pred_y
    coef = tf.fdct4(tf.to_blocks4(diff))
    z = tf.quant4(coef, qp, intra=False)
    # NOTE on trellis: a greedy per-coefficient level-down RDOQ (with a
    # pixel-SSD-calibrated distortion model and level+sig rate proxies)
    # was measured BD-rate-neutral to negative here (round 4) — the 1/6
    # inter deadzone in quant4 already captures that gain; x264's
    # trellis=1 wins come from sequential CABAC context/EOB costs, which
    # need a real Viterbi pass, not a per-coefficient rule.
    zb = z.reshape(n_mby, 4, n_mbx, 4, 4, 4).transpose(0, 2, 1, 3, 4, 5)
    by, bx = LUMA_BLK_ORDER[:, 0], LUMA_BLK_ORDER[:, 1]
    z_zz = _zigzag(zb[:, :, by, bx])                 # (nMBy, nMBx, 16, 16)

    # dead-MB decimation (applies to entropy AND recon identically)
    keep = decimate_keep_mask(z_zz, extra=decimate_extra)
    z_zz = z_zz * keep[..., None, None]
    keep_grid = jnp.repeat(jnp.repeat(keep, 4, axis=0), 4, axis=1)
    z = z * keep_grid[..., None, None]

    recon_y = jnp.clip(pred_y + tf.from_blocks4(tf.idct4(tf.dequant4(z, qp))),
                       0, 255)
    z_luma = z_zz.reshape(n_mby, n_mbx, 256)
    t8_grid = jnp.zeros((n_mby, n_mbx), bool)

    if t8:
        from ...ops import transform8 as t8ops
        z8 = t8ops.quant8(t8ops.fdct8(t8ops.to_blocks8(diff)), qp,
                          intra=False)              # (H/8, W/8, 8, 8)
        scan8 = t8ops.zigzag8(z8)                   # (H/8, W/8, 64)
        # per-MB scans (nMBy, nMBx, 4, 64), 8x8 blocks in raster order
        scan_mb = scan8.reshape(n_mby, 2, n_mbx, 2, 64) \
            .transpose(0, 2, 1, 3, 4).reshape(n_mby, n_mbx, 4, 64)
        # dead-MB decimation on the 8x8 path too (16-coeff chunks of the
        # scans keep the run structure the score models)
        keep8 = decimate_keep_mask(
            scan_mb.reshape(n_mby, n_mbx, 16, 16), extra=decimate_extra)
        scan_mb = scan_mb * keep8[..., None, None]
        z8k = t8ops.unzigzag8_jnp(
            scan_mb.reshape(n_mby, n_mbx, 2, 2, 64)
            .transpose(0, 2, 1, 3, 4).reshape(n_mby * 2, n_mbx * 2, 64))
        recon8_y = jnp.clip(
            pred_y + t8ops.from_blocks8(
                t8ops.idct8(t8ops.dequant8(z8k, qp))), 0, 255)

        # RD choice per MB: SSD + lambda2 * bits-proxy. lambda2 follows
        # the x264 convention 0.9 * 2^((qp-12)/3); the bits proxy charges
        # ~2*log2(|z|)+1.7 bits per nonzero level plus per-coded-block
        # overhead (4x4 blocks carry more sig-map/cbf overhead).
        lam2 = 0.9 * jnp.power(2.0, (qp - 12) / 3.0)

        def mb_ssd(rec):
            d = (cur_y - rec).astype(jnp.float32)
            return (d * d).reshape(n_mby, 16, n_mbx, 16).sum(axis=(1, 3))

        def bits_proxy(levels, per_block_words: int, blk_over: float):
            a = jnp.abs(levels.astype(jnp.float32))
            lb = jnp.where(a > 0, 2.0 * jnp.log2(a + 1.0) + 1.7, 0.0)
            grp = lb.reshape(n_mby, n_mbx, -1, per_block_words)
            nzblk = jnp.any(grp > 0, axis=-1).astype(jnp.float32)
            return grp.sum(axis=(-1, -2)) + blk_over * nzblk.sum(axis=-1)

        bits4 = bits_proxy(z_zz, 16, 3.0)
        bits8 = bits_proxy(scan_mb, 64, 6.0)
        cost4 = mb_ssd(recon_y) + lam2 * bits4
        cost8 = mb_ssd(recon8_y) + lam2 * bits8
        has8 = jnp.any(scan_mb != 0, axis=(-1, -2))
        t8_grid = (cost8 < cost4) & has8
        t8_px = jnp.repeat(jnp.repeat(t8_grid, 16, 0), 16, 1)
        recon_y = jnp.where(t8_px, recon8_y, recon_y)
        z_luma = jnp.where(t8_grid[..., None],
                           scan_mb.reshape(n_mby, n_mbx, 256), z_luma)

    def chroma(cur, pred):
        hc, wc = cur.shape
        cf = tf.fdct4(tf.to_blocks4(cur - pred))
        dc = cf[..., 0, 0]
        dc_mb = dc.reshape(n_mby, 2, n_mbx, 2).transpose(0, 2, 1, 3)
        z_dc = tf.quant_dc2(tf.hadamard2(dc_mb), qpc, intra=False)
        z_ac = tf.quant4(cf, qpc, intra=False)
        dc_rec = tf.dequant_dc2(z_dc, qpc)
        wr = tf.dequant4(z_ac, qpc)
        wr = wr.at[..., 0, 0].set(
            dc_rec.transpose(0, 2, 1, 3).reshape(hc // 4, wc // 4))
        rec = jnp.clip(pred + tf.from_blocks4(tf.idct4(wr)), 0, 255)
        zc = z_ac.reshape(n_mby, 2, n_mbx, 2, 4, 4).transpose(0, 2, 1, 3, 4, 5)
        z_ac_zz = _zigzag(zc.reshape(n_mby, n_mbx, 4, 4, 4))
        return (z_dc.reshape(n_mby, n_mbx, 4),
                z_ac_zz.reshape(n_mby, n_mbx, 64), rec)

    cb_dc, cb_ac, recon_u = chroma(cur_u, pred_u)
    cr_dc, cr_ac, recon_v = chroma(cur_v, pred_v)

    nz4 = jnp.any(z != 0, axis=(-1, -2))        # (H/4, W/4) for deblock
    if t8:
        # deblock residual presence per TRANSFORM block: 8x8 nz expanded
        # to the 4x4 grid for t8 MBs
        nz8 = jnp.any(z8k != 0, axis=(-1, -2))  # (H/8, W/8)
        nz8x = jnp.repeat(jnp.repeat(nz8, 2, 0), 2, 1)
        t8_px4 = jnp.repeat(jnp.repeat(t8_grid, 4, 0), 4, 1)
        nz4 = jnp.where(t8_px4, nz8x, nz4)
    return (z_luma, cb_dc, cb_ac, cr_dc, cr_ac,
            recon_y, recon_u, recon_v, nz4, t8_grid)


# ---------------------------------------------------------------------------
# B frames (bi-prediction against the two enclosing anchors)
# ---------------------------------------------------------------------------

B_MB_WORDS = 2 + 2 + 1 + 256 + 4 + 64 + 4 + 64   # mv0, mv1, mode, levels


def _search_mc_luma(cur_y, ref_y, sr: int, lam, subpel: int):
    """Whole-frame motion search + luma MC against one reference.
    Same tool chain as _pstep_core's whole-frame path (Pallas search
    kernel when on TPU, XLA fallback; effort-gated sub-pel refine).
    Returns (mvq quarter-pel (nMBy, nMBx, 2), pred_y, mc) where
    ``mc(mvq_grid)`` motion-compensates an arbitrary per-MB quarter-pel
    grid against the same interpolation planes (used for the uniform-MV
    B_Skip candidate)."""
    pred_full = None
    if subpel and _use_hier_me(sr):
        mv_full = mops.hier_search(cur_y, ref_y, sr, lam)
    elif _use_pallas_me():
        from ...ops.motion_pallas import full_search_pallas
        if subpel:
            mv_full = full_search_pallas(cur_y, ref_y, sr, lam)
        else:
            mv_full, pred_full = full_search_pallas(cur_y, ref_y, sr, lam,
                                                    with_pred=True)
    else:
        mv_full, _ = mops.full_search(cur_y, ref_y, sr, lam, 0)
    h, w = cur_y.shape
    n_mby, n_mbx = h // 16, w // 16
    if subpel == 1:
        pad = sr + 6
        margin = pad - 3
        planes = jnp.stack(
            mops.half_planes(jnp.pad(ref_y, pad, mode="edge")))
        mv, pred_y = mops.refine_half_mc(cur_y, planes, mv_full, lam,
                                         margin, row0=0)
        # uniform-vector MC (the B path's dominant-MV candidates): four
        # dynamic slices instead of a full-frame gather
        mcu = lambda g: mops.mc_luma_uniform(planes, g, margin,  # noqa: E731
                                             0, h, w)
    elif subpel:
        pad = sr + 6
        margin = pad - 3
        planes = jnp.stack(
            mops.half_planes(jnp.pad(ref_y, pad, mode="edge")))
        mv = mops.refine_subpel(cur_y, planes, mv_full, lam, margin,
                                quarter=True, row0=0)
        pred_y = mops.mc_luma_q(planes, mv, margin, 0)
        mcu = lambda g: mops.mc_luma_q(  # noqa: E731
            planes, jnp.broadcast_to(g, (n_mby, n_mbx, 2)), margin, 0)
    else:
        mv = mv_full * 4
        pred_y = pred_full if pred_full is not None \
            else mops.mc_luma(ref_y, mv_full, sr, 0)
        mcu = lambda g: mops.mc_luma(  # noqa: E731
            ref_y, jnp.broadcast_to(g // 4, (n_mby, n_mbx, 2)), sr, 0)
    return mv, pred_y, mcu


def _mc_chroma_pair(ref_u, ref_v, mv, sr: int):
    if jax.default_backend() == "cpu":
        return (mops.mc_chroma_q(ref_u, mv, sr // 2 + 2, 0),
                mops.mc_chroma_q(ref_v, mv, sr // 2 + 2, 0))
    return mops.mc_chroma_q_pair(ref_u, ref_v, mv, sr // 2 + 2, 0)


@functools.partial(jax.jit, static_argnums=(11, 13, 14))
def encode_bframe(cur_y, cur_u, cur_v, r0y, r0u, r0v, r1y, r1u, r1v,
                  qp, qpc, sr: int, lam, subpel: int = 1,
                  deblock: bool = False):
    """One B frame against the two enclosing anchor recons (L0 = past,
    L1 = future). Per-MB mode decision among B_L0_16x16 / B_L1_16x16 /
    B_Bi_16x16 by SAD + MV-rate cost; default (unweighted) bi-prediction
    (p0 + p1 + 1) >> 1 (spec 8.4.2.3.2). B pictures are non-references:
    the recon is returned only for PSNR/conformance, never fed back.

    Returns a dict of device arrays: per-MB mv0/mv1 (quarter-pel), mode
    (0=L0, 1=L1, 2=Bi), zig-zagged level arrays, recon planes.
    """
    cur_y, cur_u, cur_v = (a.astype(jnp.int32)
                           for a in (cur_y, cur_u, cur_v))
    r0y, r0u, r0v = (a.astype(jnp.int32) for a in (r0y, r0u, r0v))
    r1y, r1u, r1v = (a.astype(jnp.int32) for a in (r1y, r1u, r1v))
    h, w = cur_y.shape
    n_mby, n_mbx = h // 16, w // 16

    mv0, p0y, mc0 = _search_mc_luma(cur_y, r0y, sr, lam, subpel)
    mv1, p1y, mc1 = _search_mc_luma(cur_y, r1y, sr, lam, subpel)
    pby = (p0y + p1y + 1) >> 1

    # Uniform-MV candidate: the frame-dominant motion per list (median
    # over MBs, snapped to the sub-pel grid in use). Per-MB search
    # overfits noise with random small MVs that defeat B_Skip (spatial
    # direct needs mv == neighbor median); regions that adopt ONE
    # shared MV collapse to skip runs at entropy time. The uniform-Bi
    # variant additionally averages away temporal noise.
    snap = 4 if subpel == 0 else (2 if subpel == 1 else 1)

    def dominant(mv):
        g = jnp.quantile(mv.reshape(-1, 2).astype(jnp.float32), 0.5,
                         axis=0, method="nearest").astype(jnp.int32)
        return (g // snap) * snap

    g0, g1 = dominant(mv0), dominant(mv1)
    mv0_u = jnp.broadcast_to(g0, mv0.shape)
    mv1_u = jnp.broadcast_to(g1, mv1.shape)
    pu0 = mc0(g0)
    pu1 = mc1(g1)
    pub = (pu0 + pu1 + 1) >> 1

    # Rate-distortion mode decision: per candidate prediction, quantize
    # the real residual and charge SSD(recon) + lambda2 * (level-bits
    # proxy + mv bits) — the same currency the t8 decision uses, instead
    # of the round-2 SAD+|mv| heuristic that could not convert B modes
    # into BD-rate on noisy content.
    lam2 = 0.9 * jnp.power(2.0, (qp - 12) / 3.0)

    def cand_cost(pred):
        coefc = tf.fdct4(tf.to_blocks4(cur_y - pred))
        zc = tf.quant4(coefc, qp, intra=False)
        rec = jnp.clip(
            pred + tf.from_blocks4(tf.idct4(tf.dequant4(zc, qp))), 0, 255)
        d = (cur_y - rec).astype(jnp.float32)
        dist = (d * d).reshape(n_mby, 16, n_mbx, 16).sum(axis=(1, 3))
        a = jnp.abs(zc.astype(jnp.float32))
        lb = jnp.where(a > 0, 2.0 * jnp.log2(a + 1.0) + 1.7, 0.0)
        bits = lb.reshape(n_mby, 4, n_mbx, 4, 16).sum(axis=(1, 3, 4))
        return dist + lam2 * bits

    def mv_bits(mv):
        a = jnp.abs(mv).astype(jnp.float32)
        return (2.0 * jnp.log2(a[..., 0] + 1.0)
                + 2.0 * jnp.log2(a[..., 1] + 1.0) + 2.0)

    c0 = cand_cost(p0y) + lam2 * (mv_bits(mv0) + 3.0)
    c1 = cand_cost(p1y) + lam2 * (mv_bits(mv1) + 3.0)
    cbi = cand_cost(pby) + lam2 * (mv_bits(mv0) + mv_bits(mv1) + 5.0)
    # frame-level choice of ONE uniform mode (mode uniformity across a
    # region is what lets spatial direct skip it); its mv cost ~0 since
    # in-region mvd collapses to the median prediction / B_Skip
    cu0 = cand_cost(pu0)
    cub = cand_cost(pub)
    use_ub = jnp.sum(cub) < jnp.sum(cu0)
    pu = jnp.where(use_ub, pub, pu0)
    cu = jnp.where(use_ub, cub, cu0) + lam2 * 1.0

    best_exp = jnp.minimum(cbi, jnp.minimum(c0, c1))
    # SKIP candidate: the uniform prediction with the residual FORCED to
    # zero. Costs ~1 bit (skip run / skip flag); regions that adopt it
    # collapse to B_Skip runs. Without it, residual-free MBs that picked
    # per-MB vectors pay full mb_type+mvd syntax for nothing.
    ssd_pu = ((cur_y - pu).astype(jnp.float32) ** 2) \
        .reshape(n_mby, 16, n_mbx, 16).sum(axis=(1, 3))
    c_skip = ssd_pu + lam2 * 1.0
    skip_pick = c_skip <= jnp.minimum(cu, best_exp)
    pick_u = (cu <= best_exp) | skip_pick
    mode = jnp.where(cbi <= jnp.minimum(c0, c1), 2,
                     jnp.where(c1 < c0, 1, 0)).astype(jnp.int32)
    mode = jnp.where(pick_u, jnp.where(use_ub, 2, 0), mode)
    mv0 = jnp.where((pick_u & (mode != 1))[..., None], mv0_u, mv0)
    mv1 = jnp.where((pick_u & (mode != 0))[..., None], mv1_u, mv1)

    mode_px = jnp.repeat(jnp.repeat(mode, 16, 0), 16, 1)
    pick_u_px = jnp.repeat(jnp.repeat(pick_u, 16, 0), 16, 1)
    pred_y = jnp.where(pick_u_px, pu,
                       jnp.where(mode_px == 0, p0y,
                                 jnp.where(mode_px == 1, p1y, pby)))
    p0u, p0v = _mc_chroma_pair(r0u, r0v, mv0, sr)
    p1u, p1v = _mc_chroma_pair(r1u, r1v, mv1, sr)
    mode_c = jnp.repeat(jnp.repeat(mode, 8, 0), 8, 1)

    def sel_c(a, b):
        return jnp.where(mode_c == 0, a,
                         jnp.where(mode_c == 1, b, (a + b + 1) >> 1))

    pred_u = sel_c(p0u, p1u)
    pred_v = sel_c(p0v, p1v)

    (z_luma, cb_dc, cb_ac, cr_dc, cr_ac,
     recon_y, recon_u, recon_v, nz4, _t8g) = _residual_recon(
        cur_y, cur_u, cur_v, pred_y, pred_u, pred_v, qp, qpc,
        decimate_extra=3)

    # skip-forced MBs: drop the residual entirely (recon = prediction)
    keep = ~skip_pick
    z_luma = z_luma * keep.reshape(n_mby, n_mbx)[..., None]
    cb_dc = cb_dc * keep[..., None]
    cb_ac = cb_ac * keep[..., None]
    cr_dc = cr_dc * keep[..., None]
    cr_ac = cr_ac * keep[..., None]
    sk_px = jnp.repeat(jnp.repeat(skip_pick, 16, 0), 16, 1)
    sk_pxc = jnp.repeat(jnp.repeat(skip_pick, 8, 0), 8, 1)
    recon_y = jnp.where(sk_px, jnp.clip(pred_y, 0, 255), recon_y)
    recon_u = jnp.where(sk_pxc, jnp.clip(pred_u, 0, 255), recon_u)
    recon_v = jnp.where(sk_pxc, jnp.clip(pred_v, 0, 255), recon_v)
    nz4 = nz4 & ~jnp.repeat(jnp.repeat(skip_pick, 4, 0), 4, 1)

    if deblock:
        from ...ops import deblock as dbf
        qp_mb = jnp.full((n_mby, n_mbx), qp, jnp.int32)
        intra = jnp.zeros((n_mby, n_mbx), bool)
        use = jnp.stack([mode != 1, mode != 0], axis=-1)
        recon_y, recon_u, recon_v = dbf.deblock_frame(
            recon_y, recon_u, recon_v, qp_mb, intra, nz4,
            (mv0, mv1, use), tf.CHROMA_QP_FULL, no_strong=True,
            qp_scalar=qp)

    return {
        "mv0": mv0, "mv1": mv1, "mode": mode,
        "luma": z_luma.reshape(n_mby, n_mbx, 16, 16),
        "cb_dc": cb_dc, "cb_ac": cb_ac.reshape(n_mby, n_mbx, 4, 16),
        "cr_dc": cr_dc, "cr_ac": cr_ac.reshape(n_mby, n_mbx, 4, 16),
        "recon_y": recon_y.astype(jnp.uint8),
        "recon_u": recon_u.astype(jnp.uint8),
        "recon_v": recon_v.astype(jnp.uint8),
    }


@functools.partial(jax.jit, static_argnums=(8, 10, 11, 12))
def encode_pchunk(ys, us, vs, ref_y, ref_u, ref_v,
                  qp, qpc, sr: int, lam, deblock: bool = False,
                  subpel: int = 1, t8: bool = False):
    """Encode N consecutive P frames in one device call.

    ys: (N, H, W) int32; refs: (H, W) int32 (previous recon).
    Returns (packed (N, nMB*MB_WORDS) int16, recon_y/u/v of the last frame).
    """
    ys, us, vs = (a.astype(jnp.int32) for a in (ys, us, vs))
    ref_y, ref_u, ref_v = (a.astype(jnp.int32)
                           for a in (ref_y, ref_u, ref_v))

    def step(carry, xs):
        ref_y, ref_u, ref_v = carry
        cy, cu, cv = xs
        packed, ry, ru, rv = _pstep(cy, cu, cv, ref_y, ref_u, ref_v,
                                    qp, qpc, sr, lam, subpel=subpel,
                                    deblock=deblock, t8=t8)
        return (ry, ru, rv), packed

    (ry, ru, rv), packed = jax.lax.scan(
        step, (ref_y, ref_u, ref_v), (ys, us, vs))
    return packed, ry, ru, rv


# ---------------------------------------------------------------------------
# Sparse fetch path: compact ACTIVE macroblocks on device
# ---------------------------------------------------------------------------
#
# At production QPs most P-frame MBs are skipped outright (no residual,
# mv == the spec's P_Skip prediction); fetching their words through a
# tunneled host link wastes ~10-100x bandwidth, and compacting at 4x4
# granularity needs a 1.5M-row scatter that costs ~70 ms/chunk on TPU
# (scatters lower to serial per-row stores). This path compacts at MB
# granularity with row GATHERS only (~4 ms for the whole chunk):
#   bitmap  (F, ceil(nMB/16)) int16 — per-MB ACTIVE bits,
#   counts  (2,) int32 — [active MBs, blocky MBs] in the chunk,
#   meta    (F*nMB, 16) int16 — active MBs' records compacted to the
#           front: [mv 2 | cbDC 4 | crDC 4 | blockflag words 2 | pad 4],
#   payload (F*nMB, 384) int16 — the 24 4x4 blocks (zig-zag) of MBs with
#           any nonzero block ("blocky" ⊆ active), compacted to the front.
# A MB is ACTIVE when it has any nonzero block, any nonzero chroma DC, or
# mv != the P_Skip prediction (skip_mv_grid below — the same spec 8.4.1.1
# rule the entropy writers apply, so inactive MBs are exactly the MBs the
# writer will code as skips; it re-derives their MVs itself and the host
# never sees them). Chroma AC flags test words 1..15 only: word 0 is the
# quantizer's DC slot, which the bitstream carries in the separate 2x2 DC
# block (fetching it would be dead bytes).
BLOCKS_PER_MB = 24  # 16 luma + 4 cbAC + 4 crAC, each 16 zig-zag words


def _flag_words(flags_f):
    """(F, B) bool → (F, ceil(B/16)) int16 packed little-endian bits."""
    f, b = flags_f.shape
    pad = (-b) % 16
    if pad:
        flags_f = jnp.concatenate(
            [flags_f, jnp.zeros((f, pad), flags_f.dtype)], axis=1)
    bits = flags_f.reshape(f, -1, 16).astype(jnp.int32)
    weights = jnp.asarray([1 << i for i in range(16)], jnp.int32)
    words = (bits * weights).sum(axis=-1)
    return (words.astype(jnp.uint16)).astype(jnp.int16)


def skip_mv_grid(mv):
    """Vectorized spec 8.4.1.1 P_Skip MV over an all-inter MV grid.

    mv: (F, nMBy, nMBx, 2) int — the frame's final per-MB MVs (any unit;
    both components). Returns the per-MB P_Skip prediction, identical to
    pframe.skip_mv with an all-valid grid (asserted by tests): border MBs
    and MBs whose left/top neighbor is the zero vector predict (0, 0);
    everything else takes the componentwise median of left, top, and
    top-right (top-left substituted in the last column)."""
    f, nby, nbx, _ = mv.shape
    z2 = jnp.zeros((f, nby, 1, 2), mv.dtype)
    a = jnp.concatenate([z2, mv[:, :, :-1]], axis=2)        # left
    zrow = jnp.zeros((f, 1, nbx, 2), mv.dtype)
    b = jnp.concatenate([zrow, mv[:, :-1]], axis=1)         # top
    # top-right, with top-left substituted in the last column
    top = b
    c = jnp.concatenate([top[:, :, 1:], top[:, :, -2:-1]], axis=2)
    # median of three via min/max (jnp.median sorts — ~3x the cost)
    pred = jnp.maximum(jnp.minimum(a, b),
                       jnp.minimum(jnp.maximum(a, b), c)).astype(mv.dtype)
    xs = jnp.arange(nbx)[None, None, :, None]
    ys = jnp.arange(nby)[None, :, None, None]
    border = (xs == 0) | (ys == 0)
    a_zero = jnp.all(a == 0, axis=-1, keepdims=True)
    b_zero = jnp.all(b == 0, axis=-1, keepdims=True)
    return jnp.where(border | a_zero | b_zero, 0, pred)


def _compact_rows(flags_flat, rows):
    """Gather-based stream compaction: rows[i] for flagged i move to the
    front (stable). Returns (count, compacted) — rows past count are
    whatever the padding gather produced (row 0)."""
    n = flags_flat.shape[0]
    dest = jnp.cumsum(flags_flat.astype(jnp.int32)) - 1
    count = flags_flat.sum(dtype=jnp.int32)
    src = jnp.zeros((n,), jnp.int32).at[
        jnp.where(flags_flat, dest, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return count, rows[src]


def _sparsify_packed(packed, f: int, n_mb: int, n_mbx: int):
    """Compact a dense (F, nMB*MB_WORDS) int16 chunk into the sparse
    fetch tuple (bitmap, counts, meta, payload) — see module comment."""
    arr = packed.reshape(f, n_mb, MB_WORDS)
    mv = arr[..., :2].astype(jnp.int32)
    payload = arr.reshape(f * n_mb, MB_WORDS)[:, MB_META:]
    blocks = payload.reshape(f * n_mb, BLOCKS_PER_MB, 16)
    # luma blocks: all 16 words; chroma AC blocks: words 1.. only
    bnz = jnp.any(blocks != 0, axis=-1)
    cnz = jnp.any(blocks[:, 16:, 1:] != 0, axis=-1)
    blkflags = jnp.concatenate([bnz[:, :16], cnz], axis=1)  # (F*nMB, 24)

    smv = skip_mv_grid(mv.reshape(f, n_mb // n_mbx, n_mbx, 2))
    mv_active = jnp.any(mv != smv.reshape(f, n_mb, 2), axis=-1)
    dc_active = jnp.any(arr[..., 2:10] != 0, axis=-1)
    blocky = jnp.any(blkflags, axis=-1)
    active = (blocky.reshape(f, n_mb) | dc_active | mv_active).reshape(-1)

    bitmap = _flag_words(active.reshape(f, n_mb))
    meta_all = jnp.concatenate([
        arr.reshape(f * n_mb, MB_WORDS)[:, :MB_META],
        _flag_words(blkflags),                     # (F*nMB, 2): 24 bits
        jnp.zeros((f * n_mb, 2), jnp.int16),
    ], axis=1)
    mcount, meta = _compact_rows(active, meta_all)
    bcount, payload_c = _compact_rows(blocky, payload)
    counts = jnp.stack([mcount, bcount])
    return bitmap, counts, meta, payload_c


@functools.partial(jax.jit, static_argnums=(6, 8, 9, 10, 11, 12))
def encode_pchunk_sparse(buf, ref_y, ref_u, ref_v,
                         qp, qpc, sr: int, lam,
                         h: int, w: int, deblock: bool = False,
                         subpel: int = 1, t8: bool = False):
    """Sparse-output variant of encode_pchunk_packed."""
    packed, ry, ru, rv = encode_pchunk_packed.__wrapped__(
        buf, ref_y, ref_u, ref_v, qp, qpc, sr, lam, h, w, deblock, subpel,
        t8)
    f = packed.shape[0]
    n_mb = (h // 16) * (w // 16)
    bitmap, counts, meta, payload = _sparsify_packed(packed, f, n_mb,
                                                     w // 16)
    return bitmap, counts, meta, payload, ry, ru, rv


# ---------------------------------------------------------------------------
# Sparse I-frame fetch (same idea as the P chunks; one frame)
# ---------------------------------------------------------------------------
# meta per MB: luma DC (16) + cbDC (4) + crDC (4) = 24 int16 words; blocks
# are the 24 AC sources (16 luma + 4 cb + 4 cr), 16 zig-zag words each.
IMB_META = 24


@functools.partial(jax.jit, static_argnums=(5,))
def encode_iframe_sparse(y, u, v, qp, qpc, deblock: bool = False):
    """Device intra encode with compacted outputs: returns
    (meta (nMB', IMB_META*?) int16 flat, count, blocks, recon planes)
    where nMB' covers MB rows 1.. (row 0 is PCM, host-side)."""
    from . import frame_ops
    out = frame_ops.encode_iframe.__wrapped__(y, u, v, qp, qpc, deblock)
    luma_dc = out["luma_dc"]            # (R, X, 16)
    r, x = luma_dc.shape[:2]
    blocks = jnp.concatenate([
        out["luma_ac"].reshape(r, x, 16, 16),
        out["cb_ac"].reshape(r, x, 4, 16),
        out["cr_ac"].reshape(r, x, 4, 16),
    ], axis=2)                          # (R, X, 24, 16)
    flags = jnp.any(blocks != 0, axis=-1)
    flat_flags = flags.reshape(-1)
    nblk = flat_flags.shape[0]
    dest = jnp.cumsum(flat_flags.astype(jnp.int32)) - 1
    count = flat_flags.sum(dtype=jnp.int32)
    idx = jnp.where(flat_flags, dest, nblk)
    buffer = jnp.zeros((nblk, 16), jnp.int16).at[idx].set(
        blocks.reshape(nblk, 16).astype(jnp.int16), mode="drop")
    meta = jnp.concatenate([
        jnp.concatenate([luma_dc, out["cb_dc"], out["cr_dc"]],
                        axis=-1).reshape(r, x * IMB_META),
        _flag_words(flags.reshape(r, x * BLOCKS_PER_MB)),
    ], axis=1).astype(jnp.int16)
    return (meta, count.reshape(1), buffer,
            out["recon_y"], out["recon_u"], out["recon_v"])


def unpack_sparse_iframe(meta_h: np.ndarray, blocks_h: np.ndarray,
                         count: int, n_mbx: int) -> dict:
    """Rebuild the dense entropy arrays for write_islice."""
    r = meta_h.shape[0]
    nbits = n_mbx * BLOCKS_PER_MB
    nwords = (nbits + 15) // 16
    meta = meta_h[:, : n_mbx * IMB_META].reshape(r, n_mbx, IMB_META)
    words = meta_h[:, n_mbx * IMB_META: n_mbx * IMB_META + nwords]
    bits = np.unpackbits(
        words.astype(np.uint16).view(np.uint8), bitorder="little",
        axis=1)[:, :nbits]
    flags = bits.astype(bool).reshape(r, n_mbx, BLOCKS_PER_MB)
    blocks = np.zeros((r, n_mbx, BLOCKS_PER_MB, 16), np.int16)
    blocks[flags] = blocks_h[:count]
    return {
        "luma_dc": meta[..., :16],
        "cb_dc": meta[..., 16:20],
        "cr_dc": meta[..., 20:24],
        "luma_ac": blocks[:, :, :16].reshape(r, n_mbx, 16, 16),
        "cb_ac": blocks[:, :, 16:20].reshape(r, n_mbx, 4, 16),
        "cr_ac": blocks[:, :, 20:24].reshape(r, n_mbx, 4, 16),
    }


def fetch_bucket(count: int, cap: int, base: int = 4096) -> int:
    """Round a compacted-row count up to a fetch bucket (bounds the
    number of distinct device slice programs)."""
    k = base
    while k < count:
        k *= 2
    return min(k, cap)


@functools.partial(jax.jit, static_argnums=(4, 5))
def combine_fetch(bitmap, counts, meta, payload, mcap: int, pcap: int):
    """Pack one P chunk's sparse outputs into ONE flat int16 buffer:
    [counts as 4 words | bitmap | meta[:mcap] | payload[:pcap]].

    One buffer → one host fetch → one tunnel round trip, and the encoder
    starts its host-side async copy right after dispatch, so by entropy
    time the bytes are already local (the three separate fetches cost
    ~120 ms/chunk of RTT latency on tunneled deployments). The caps are
    sticky per-encoder and grow when a chunk overflows them; the rare
    overflow tail is fetched separately (split_fetch returns None)."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(counts, jnp.int16).reshape(-1),
        bitmap.reshape(-1),
        meta[:mcap].reshape(-1),
        payload[:pcap].reshape(-1),
    ])


def split_fetch(arr: np.ndarray, f: int, n_mb: int, mcap: int, pcap: int):
    """Host-side inverse of combine_fetch. Returns
    (mcount, bcount, bitmap (f, nW), meta (mcap, 16), payload
    (pcap, 384)); meta/payload rows past the counts are garbage."""
    mcount, bcount = (int(x) for x in
                      np.ascontiguousarray(arr[:4]).view(np.int32))
    nw = (n_mb + 15) // 16
    o = 4
    bitmap = arr[o:o + f * nw].reshape(f, nw)
    o += f * nw
    meta = arr[o:o + mcap * 16].reshape(mcap, 16)
    o += mcap * 16
    payload = arr[o:o + pcap * MB_PAYLOAD].reshape(pcap, MB_PAYLOAD)
    return mcount, bcount, bitmap, meta, payload


def _unpack_bits(words: np.ndarray, nbits: int) -> np.ndarray:
    """(..., W) int16 little-endian bit words → (..., nbits) bool."""
    u8 = np.ascontiguousarray(words).astype(np.uint16).view(np.uint8)
    return np.unpackbits(u8, bitorder="little",
                         axis=-1)[..., :nbits].astype(bool)


def unpack_sparse_chunk(bitmap_h: np.ndarray, meta_h: np.ndarray,
                        payload_h: np.ndarray, mcount: int, bcount: int,
                        n_mby: int, n_mbx: int) -> list[dict]:
    """Host-side: rebuild per-frame entropy dicts from the sparse fetch.

    Each dict carries dense (nMBy, nMBx, ...) arrays plus an ``active``
    bool grid; rows of inactive MBs are zero and MUST be ignored by the
    entropy writer — it derives their P_Skip MVs itself (write_pslice's
    ``active`` handling)."""
    f = bitmap_h.shape[0]
    n_mb = n_mby * n_mbx
    active = _unpack_bits(bitmap_h, n_mb)          # (F, nMB)
    metas = meta_h[:mcount]
    blkflags = _unpack_bits(metas[:, MB_META:MB_META + 2], BLOCKS_PER_MB)
    blocky = blkflags.any(axis=1)
    payloads = payload_h[:bcount]

    # dense per-chunk arrays, scattered from the compact streams
    meta_d = np.zeros((f, n_mb, MB_META), np.int16)
    meta_d[active] = metas[:, :MB_META]
    pay_d = np.zeros((f, n_mb, MB_PAYLOAD), np.int16)
    act_idx = np.nonzero(active.reshape(-1))[0]
    pay_d.reshape(-1, MB_PAYLOAD)[act_idx[blocky]] = payloads

    out = []
    for i in range(f):
        m = meta_d[i]
        blk = pay_d[i]
        d = {
            "active": active[i].reshape(n_mby, n_mbx),
            "mv": m[:, :2].reshape(n_mby, n_mbx, 2).astype(np.int32),
            "cb_dc": m[:, 2:6].reshape(n_mby, n_mbx, 4),
            "cr_dc": m[:, 6:10].reshape(n_mby, n_mbx, 4),
            "luma": blk[:, :256].reshape(n_mby, n_mbx, 16, 16),
            "cb_ac": blk[:, 256:320].reshape(n_mby, n_mbx, 4, 16),
            "cr_ac": blk[:, 320:384].reshape(n_mby, n_mbx, 4, 16),
        }
        t8 = m[:, 10].reshape(n_mby, n_mbx).astype(bool)
        if t8.any():
            d["t8"] = t8
        out.append(d)
    return out


@functools.partial(jax.jit, static_argnums=(6, 8, 9, 10, 11, 12))
def encode_pchunk_packed(buf, ref_y, ref_u, ref_v,
                         qp, qpc, sr: int, lam,
                         h: int, w: int, deblock: bool = False,
                         subpel: int = 1, t8: bool = False):
    """encode_pchunk taking ONE packed uint8 planar buffer
    (N, h*w*3//2) — a single host→device transfer per chunk."""
    n = buf.shape[0]
    hw = h * w
    cw = (h // 2) * (w // 2)
    ys = buf[:, :hw].reshape(n, h, w)
    us = buf[:, hw:hw + cw].reshape(n, h // 2, w // 2)
    vs = buf[:, hw + cw:].reshape(n, h // 2, w // 2)
    return encode_pchunk.__wrapped__(ys, us, vs, ref_y, ref_u, ref_v,
                                     qp, qpc, sr, lam, deblock, subpel, t8)


def pack_frames(batch: list) -> np.ndarray:
    """[(y, u, v) uint8 padded planes] → (N, h*w*3//2) uint8 buffer."""
    return np.stack([
        np.concatenate([y.reshape(-1), u.reshape(-1), v.reshape(-1)])
        for y, u, v in batch])


# ---------------------------------------------------------------------------
# Conditional-replenishment source upload (delta tiles)
# ---------------------------------------------------------------------------
#
# Raw 1080p YUV420 is 3.1 MB/frame; on deployments where the host↔device
# link is the bottleneck (tunneled chips measure ~35 MB/s → a 12 fps hard
# ceiling), uploading every pixel every frame is the wall. Consecutive
# source frames usually share most of their pixels (static background,
# screen content, any fixed camera), so the host uploads only the 16x16
# macroblock tiles that CHANGED since the previous source frame, and the
# device carries the reconstructed source across the GOP — a classic
# conditional-replenishment ingest, bit-exact by construction (tiles are
# copied verbatim, never approximated). Fully-changing content degrades
# gracefully to whole-frame tiles (same bytes as the dense path plus a
# 4-byte index per MB).
#
# Device-side source layout is MB-tiled: luma (nMB, 256) + chroma 2x
# (nMB, 64) uint8, so a frame update is one scatter per plane.
TILE_WORDS = 384  # 256 luma + 64 cb + 64 cr bytes per MB


def tiles_from_planes_host(yp: np.ndarray, up: np.ndarray,
                           vp: np.ndarray) -> np.ndarray:
    """(padded uint8 planes) → (nMB, 384) uint8 MB-tile view (host)."""
    h, w = yp.shape
    mby, mbx = h // 16, w // 16
    yt = yp.reshape(mby, 16, mbx, 16).swapaxes(1, 2).reshape(-1, 256)
    ut = up.reshape(mby, 8, mbx, 8).swapaxes(1, 2).reshape(-1, 64)
    vt = vp.reshape(mby, 8, mbx, 8).swapaxes(1, 2).reshape(-1, 64)
    return np.concatenate([yt, ut, vt], axis=1)


def delta_tiles_host(prev_tiles: np.ndarray,
                     cur_tiles: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Changed-MB delta between consecutive source frames (host side).
    Returns (idx (K,) int32, tiles (K, 384) uint8)."""
    changed = (prev_tiles != cur_tiles).any(axis=1)
    idx = np.nonzero(changed)[0].astype(np.int32)
    return idx, cur_tiles[idx]


def tile_delta(yp: np.ndarray, up: np.ndarray, vp: np.ndarray,
               prev: np.ndarray, full: bool = False):
    """Fused tile gather + changed-MB delta against the carried state.

    ``prev`` ((nMB, 384) uint8) is updated IN PLACE to the current
    frame's tiles. Returns (idx (K,) int32, tiles (K, 384) uint8). Uses
    the native one-sweep engine when available (~1 ms vs ~13 ms for the
    numpy tiles_from_planes_host + delta_tiles_host pair at 1080p);
    falls back to the numpy pair (bit-identical)."""
    from ... import native  # vcp_tpu.native
    h, w = yp.shape
    n_mb = (h // 16) * (w // 16)
    lib = native.get_lib()
    if lib is not None and hasattr(lib, "vcp_tile_delta"):
        import ctypes
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        idx = np.empty(n_mb, np.int32)
        tiles = np.empty((n_mb, TILE_WORDS), np.uint8)
        ya = np.ascontiguousarray(yp, np.uint8)
        ua = np.ascontiguousarray(up, np.uint8)
        va = np.ascontiguousarray(vp, np.uint8)
        k = lib.vcp_tile_delta(
            ya.ctypes.data_as(u8p), ua.ctypes.data_as(u8p),
            va.ctypes.data_as(u8p), h, w, prev.ctypes.data_as(u8p),
            idx.ctypes.data_as(i32p), tiles.ctypes.data_as(u8p),
            1 if full else 0)
        return idx[:k], tiles[:k]
    cur = tiles_from_planes_host(np.asarray(yp, np.uint8),
                                 np.asarray(up, np.uint8),
                                 np.asarray(vp, np.uint8))
    if full:
        idx = np.arange(n_mb, dtype=np.int32)
        tiles = cur
    else:
        idx, tiles = delta_tiles_host(prev, cur)
    prev[:] = cur
    return idx, tiles


def delta_bucket(k: int, n_mb: int) -> int:
    """Round a tile count up to a bucket (bounds distinct jit programs).
    Growth factor 4 from 128 keeps the program count small while wasting
    at most 4x padding on the (already small) delta uploads."""
    b = 128
    while b < k:
        b *= 4
    return min(b, n_mb)


def pad_delta(idx: np.ndarray, tiles: np.ndarray, bucket: int, n_mb: int):
    """Pad (idx, tiles) to the bucket size; padding rows use index n_mb,
    which the device scatter drops (mode='drop')."""
    k = idx.shape[0]
    if k == bucket:
        return idx, tiles
    pidx = np.full(bucket, n_mb, np.int32)
    pidx[:k] = idx
    ptiles = np.zeros((bucket, TILE_WORDS), np.uint8)
    ptiles[:k] = tiles
    return pidx, ptiles


def _apply_tiles(sy, su, sv, idx_f, t):
    """Scatter one frame's delta tiles into the carried MB-tiled source."""
    sy = sy.at[idx_f].set(t[:, :256], mode="drop")
    su = su.at[idx_f].set(t[:, 256:320], mode="drop")
    sv = sv.at[idx_f].set(t[:, 320:384], mode="drop")
    return sy, su, sv


def _tiled_to_planes(sy, su, sv, n_mby: int, n_mbx: int):
    y = sy.reshape(n_mby, n_mbx, 16, 16).transpose(0, 2, 1, 3) \
        .reshape(n_mby * 16, n_mbx * 16)
    u = su.reshape(n_mby, n_mbx, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(n_mby * 8, n_mbx * 8)
    v = sv.reshape(n_mby, n_mbx, 8, 8).transpose(0, 2, 1, 3) \
        .reshape(n_mby * 8, n_mbx * 8)
    return y, u, v


@functools.partial(jax.jit, static_argnums=(3, 4))
def source_tiles(yp, up, vp, h: int, w: int):
    """Full-frame upload → device MB-tiled source (GOP bootstrap)."""
    n_mby, n_mbx = h // 16, w // 16
    sy = yp.reshape(n_mby, 16, n_mbx, 16).transpose(0, 2, 1, 3) \
        .reshape(-1, 256)
    su = up.reshape(n_mby, 8, n_mbx, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    sv = vp.reshape(n_mby, 8, n_mbx, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    return sy, su, sv


@functools.partial(jax.jit, static_argnums=(10, 12, 13, 14, 15, 16))
def encode_pchunk_delta(sy, su, sv, idx, tiles,
                        ref_y, ref_u, ref_v,
                        qp, qpc, sr: int, lam,
                        h: int, w: int, deblock: bool = False,
                        subpel: int = 1, t8: bool = False):
    """encode_pchunk_sparse fed by delta tiles instead of raw frames.

    sy/su/sv: carried MB-tiled source (previous frame, device-resident);
    idx: (N, K) int32 changed-MB indices (n_mb = drop padding);
    tiles: (N, K, 384) uint8 replacement tiles.
    Returns (bitmap, counts, meta, payload, sy', su', sv', recon_y/u/v).
    """
    n_mby, n_mbx = h // 16, w // 16
    n_mb = n_mby * n_mbx
    ref_y, ref_u, ref_v = (a.astype(jnp.int32)
                           for a in (ref_y, ref_u, ref_v))

    def step(carry, xs):
        sy, su, sv, ry, ru, rv = carry
        idx_f, t = xs
        sy, su, sv = _apply_tiles(sy, su, sv, idx_f, t)
        cy, cu, cv = _tiled_to_planes(sy, su, sv, n_mby, n_mbx)
        packed, ry, ru, rv = _pstep(
            cy.astype(jnp.int32), cu.astype(jnp.int32), cv.astype(jnp.int32),
            ry, ru, rv, qp, qpc, sr, lam, subpel=subpel, deblock=deblock,
            t8=t8)
        return (sy, su, sv, ry, ru, rv), packed

    (sy, su, sv, ry, ru, rv), packed = jax.lax.scan(
        step, (sy, su, sv, ref_y, ref_u, ref_v), (idx, tiles))
    f = idx.shape[0]
    bitmap, counts, meta, payload = _sparsify_packed(packed, f, n_mb, n_mbx)
    return bitmap, counts, meta, payload, sy, su, sv, ry, ru, rv


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def encode_iframe_delta(sy, su, sv, idx, tiles, qp, qpc,
                        h: int, w: int, deblock: bool = False):
    """encode_iframe_sparse fed by delta tiles against the carried source
    (IDR at a GOP boundary: the source usually barely changed from the
    last P frame of the previous GOP). Returns the encode_iframe_sparse
    outputs plus the updated source tiles."""
    n_mby, n_mbx = h // 16, w // 16
    sy, su, sv = _apply_tiles(sy, su, sv, idx, tiles)
    y, u, v = _tiled_to_planes(sy, su, sv, n_mby, n_mbx)
    meta, count, buffer, ry, ru, rv = encode_iframe_sparse.__wrapped__(
        y, u, v, qp, qpc, deblock)
    return meta, count, buffer, sy, su, sv, ry, ru, rv


# ---------------------------------------------------------------------------
# Generic word-sparse fetch (B-GOP / RD-I path)
# ---------------------------------------------------------------------------
#
# The quality-preset (effort >= 5) GOP packs MANY per-frame fields (levels,
# mv8 grids, partition/intra masks, i8 modes ...) whose union has no fixed
# MB_WORDS layout, so the structured _sparsify_packed above doesn't apply.
# This is the layout-agnostic equivalent: view the packed int16 buffer as
# 16-word chunks, keep only nonzero chunks (levels are overwhelmingly zero
# at production QPs), and ship [count | chunk bitmap | compacted chunks] in
# ONE buffer. At 1080p effort 6 this turns a 73 MB/GOP dense fetch into
# ~1 MB — on tunneled deployments (~5-70 MB/s, shared) the dense fetch IS
# the quality-shape wall (13.3 s of a 13.5 s 12-frame GOP, profiled
# round 5).
SP_K = 16  # words per sparsity chunk (one 4x4 block)


@functools.partial(jax.jit, static_argnums=(1,))
def sparsify_buf(buf, cap: int):
    """(n,) int16 → (combined, comp). combined (int16 flat) =
    [nonzero-chunk count as 2 words | chunk bitmap | comp[:cap] rows];
    comp stays on device for the rare overflow-tail fetch."""
    n = buf.shape[0]
    pad = (-n) % SP_K
    if pad:
        buf = jnp.concatenate([buf, jnp.zeros((pad,), buf.dtype)])
    chunks = buf.reshape(-1, SP_K)
    flags = jnp.any(chunks != 0, axis=-1)
    count, comp = _compact_rows(flags, chunks)
    bitmap = _flag_words(flags[None, :])[0]
    combined = jnp.concatenate([
        jax.lax.bitcast_convert_type(count.reshape(1), jnp.int16).reshape(-1),
        bitmap,
        comp[:cap].reshape(-1),
    ])
    return combined, comp


def unsparsify_buf(arr: np.ndarray, n: int, cap: int, comp=None):
    """Host inverse of sparsify_buf: rebuild the dense (n,) int16 buffer.
    When the chunk count overflowed ``cap``, the tail rows are fetched
    from the device-resident ``comp``. Returns (dense, count)."""
    count = int(np.ascontiguousarray(arr[:2]).view(np.int32)[0])
    nchunks = (n + SP_K - 1) // SP_K
    nw = (nchunks + 15) // 16
    flags = _unpack_bits(arr[2:2 + nw].reshape(1, nw), nchunks)[0]
    k = min(count, cap)
    rows = arr[2 + nw:2 + nw + k * SP_K].reshape(k, SP_K)
    if count > cap:
        rows = np.concatenate([rows, np.asarray(comp[cap:count])])
    out = np.zeros((nchunks, SP_K), np.int16)
    out[flags] = rows
    return out.reshape(-1)[:n], count


@functools.partial(jax.jit, static_argnums=(5, 6))
def delta_planes(sy, su, sv, idx, tiles, h: int, w: int):
    """Apply one frame's delta tiles to the carried MB-tiled source and
    return (sy', su', sv', y, u, v) — the updated carry plus dense padded
    planes for the per-frame encode entry points (B-GOP upload path)."""
    n_mby, n_mbx = h // 16, w // 16
    sy, su, sv = _apply_tiles(sy, su, sv, idx, tiles)
    y, u, v = _tiled_to_planes(sy, su, sv, n_mby, n_mbx)
    return sy, su, sv, y, u, v


def unpack_frame(packed: np.ndarray, n_mby: int, n_mbx: int) -> dict:
    """Split one frame's packed int16 buffer back into entropy-layer arrays
    (host-side, zero-copy views where possible)."""
    arr = packed.reshape(n_mby, n_mbx, MB_WORDS)
    o = 0

    def take(n):
        nonlocal o
        out = arr[..., o:o + n]
        o += n
        return out

    mv = take(2).astype(np.int32)
    cb_dc = take(4)
    cr_dc = take(4)
    t8 = take(1)[..., 0].astype(bool)
    take(1)                                  # pad word
    luma = take(256).reshape(n_mby, n_mbx, 16, 16)
    cb_ac = take(64).reshape(n_mby, n_mbx, 4, 16)
    cr_ac = take(64).reshape(n_mby, n_mbx, 4, 16)
    out = {"mv": mv, "luma": luma, "cb_dc": cb_dc, "cb_ac": cb_ac,
           "cr_dc": cr_dc, "cr_ac": cr_ac}
    if t8.any():
        out["t8"] = t8
    return out
