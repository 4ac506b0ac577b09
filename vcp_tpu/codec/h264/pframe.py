"""P-frame encode/decode: motion-compensated inter coding.

TPU-first shape: unlike intra, inter prediction reads only the *previous*
frame's reconstruction, so the entire P-frame — motion search, motion
compensation, transform, quantization, reconstruction — is one fully
parallel jitted device step (no wavefront). Entropy (mb_skip_run, mvd,
CBP, CAVLC residuals) and MV median prediction stay on host.

Toolset: P_L0_16x16 partitions, one reference, quarter-pel MVs (6-tap
half-pel + quarter averaging, effort-gated), P_Skip, CBP-gated residuals,
optional in-loop deblocking. Spec refs: 8.4.1.1/8.4.1.3 (MV prediction),
8.4.2.2 (interpolation), 9.2, 7.3.5.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp

from ...ops import transform as tf
from ...utils.bitstream import BitWriter, nal_unit
from . import headers as H
from .cavlc import decode_residual_block, encode_residual_block
from .entropy import CHROMA_BLK_ORDER, NzContext
from .frame_ops import LUMA_BLK_ORDER
from .decoder import unzigzag
from .tables import CBP_INTER_TO_CODE, CBP_TABLE

MB_TYPE_P16x16 = 0


def search_range_for_effort(effort: int) -> int:
    """ffmpeg preset ladder (p1..p7 / ultrafast..placebo) → ME window."""
    return (4, 4, 6, 8, 8, 12, 16, 16, 24, 24)[max(0, min(9, effort))]


def subpel_for_effort(effort: int) -> int:
    """Sub-pel ME level per the ffmpeg subme ladder: 0 = full-pel
    (p1-p4/fast), 1 = half-pel (p5-p6/medium — single-plane gathers,
    near-free on TPU), 2 = quarter-pel (p7+/slow — 8 general MC passes)."""
    return 0 if effort < 5 else (1 if effort < 7 else 2)


def lam_for_qp(qp: int) -> int:
    """MV-rate bias for the SAD cost (~0.8 * Qstep)."""
    return max(1, int(0.5 * 2 ** (qp / 6)))


# ---------------------------------------------------------------------------
# Device step
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(8, 10, 11, 12))
def _encode_pframe_device(y, u, v, ref_y, ref_u, ref_v,
                          qp, qpc, sr: int, lam, deblock: bool = False,
                          subpel: int = 1, t8: bool = False):
    """Single-frame P step. Thin wrapper over gop_ops._pstep (the single
    source of truth for P-frame math). MVs in quarter-pel units."""
    from . import gop_ops
    y, u, v = (a.astype(jnp.int32) for a in (y, u, v))
    ref_y, ref_u, ref_v = (a.astype(jnp.int32) for a in (ref_y, ref_u, ref_v))
    h, w = y.shape
    n_mby, n_mbx = h // 16, w // 16

    packed, recon_y, recon_u, recon_v = gop_ops._pstep(
        y, u, v, ref_y, ref_u, ref_v, qp, qpc, sr, lam, subpel=subpel,
        deblock=deblock, t8=t8)
    arr = packed.reshape(n_mby, n_mbx, gop_ops.MB_WORDS).astype(jnp.int32)
    return {
        "mv": arr[..., :2],
        "cb_dc": arr[..., 2:6],
        "cr_dc": arr[..., 6:10],
        "t8": arr[..., 10].astype(bool),
        "luma": arr[..., 12:268].reshape(n_mby, n_mbx, 16, 16),
        "cb_ac": arr[..., 268:332].reshape(n_mby, n_mbx, 4, 16),
        "cr_ac": arr[..., 332:396].reshape(n_mby, n_mbx, 4, 16),
        "recon_y": recon_y.astype(jnp.uint8),
        "recon_u": recon_u.astype(jnp.uint8),
        "recon_v": recon_v.astype(jnp.uint8),
    }


def encode_pframe(y, u, v, ref_y, ref_u, ref_v, qp, qpc, search_range=8,
                  deblock: bool = False, subpel: int = 1,
                  t8: bool = False, parts: bool = False,
                  intra_mbs: bool = False):
    lam = lam_for_qp(qp)
    if parts:
        return _encode_pframe_device_parts(y, u, v, ref_y, ref_u, ref_v,
                                           qp, qpc, search_range, lam,
                                           deblock, subpel, t8, intra_mbs)
    return _encode_pframe_device(y, u, v, ref_y, ref_u, ref_v,
                                 qp, qpc, search_range, lam, deblock,
                                 subpel, t8)


# extra-bits penalties for choosing a partitioned mb_type over
# P_L0_16x16 (mb_type ue + extra mvd headers + lost P_Skip
# eligibility), in the SAD-lambda currency; tuned on the golden clips
P8X8_BIT_PENALTY = int(os.environ.get("VCP_P8_PENALTY", "40"))
P2PART_BIT_PENALTY = int(os.environ.get("VCP_P2_PENALTY", "20"))
# minimum linf divergence from the 16x16 vector (quarter-pel) for a
# partition to be considered: sub-pel refinement jitters every block by
# 1-2 qpel, and those "splits" never pay for their syntax
P8X8_MIN_SPLIT_Q = int(os.environ.get("VCP_P8_MINSPLIT", "4"))


@functools.partial(jax.jit, static_argnums=(8, 10, 11, 12, 13))
def _encode_pframe_device_parts(y, u, v, ref_y, ref_u, ref_v,
                                qp, qpc, sr: int, lam,
                                deblock: bool = False, subpel: int = 1,
                                t8: bool = False, intra_mbs: bool = False):
    """P step with the x264-medium-style partition decision (quality
    presets): every MB picks 16x16 / 16x8 / 8x16 / P_8x8.

    One full-pel sweep scores ALL granularities (ops.motion.
    full_search_parts); each is sub-pel refined at its own geometry,
    then every MB picks the shape by SAD + lambda*mv-rate with fixed
    bit penalties for the partition syntax overhead. The final MV field
    lives on the 8x8 grid (larger partitions replicate their vector),
    so MC, residual coding and deblocking run once, partition-agnostic.
    Mirrors libx264 medium's partition analysis
    (ref internal/config/config.go:49).
    """
    from ...ops import motion as mops
    from . import gop_ops
    y, u, v = (a.astype(jnp.int32) for a in (y, u, v))
    ref_y, ref_u, ref_v = (a.astype(jnp.int32)
                           for a in (ref_y, ref_u, ref_v))
    h, w = y.shape
    n_mby, n_mbx = h // 16, w // 16

    if gop_ops._use_hier_me(sr):
        mv16f, mv8f, mvhf, mvvf = mops.hier_search_parts(y, ref_y, sr, lam)
    else:
        mv16f, mv8f, mvhf, mvvf = mops.full_search_parts(y, ref_y, sr, lam)
    pad = sr + 6
    margin = pad - 3
    planes = jnp.stack(mops.half_planes(jnp.pad(ref_y, pad, mode="edge")))
    if subpel == 1:
        # fused half-pel refine + MC per geometry: one aligned-window
        # gather each instead of 13 full-frame gathers (the effort-6
        # device wall — see ops.motion.aligned_windows)
        mv16, pred16 = mops.refine_half_mc(y, planes, mv16f, lam, margin,
                                           bs=16)
        mv8, pred8 = mops.refine_half_mc(y, planes, mv8f, lam, margin,
                                         bs=8)
        mvh, predh = mops.refine_half_mc(y, planes, mvhf, lam, margin,
                                         bs=(8, 16))
        mvv, predv = mops.refine_half_mc(y, planes, mvvf, lam, margin,
                                         bs=(16, 8))
        mv16_q = jnp.repeat(jnp.repeat(mv16, 2, 0), 2, 1)
        mvh_q = jnp.repeat(mvh, 2, 1)
        mvv_q = jnp.repeat(mvv, 2, 0)
    else:
        if subpel:
            q = subpel >= 2

            def refine(mvf, bs):
                return mops.refine_subpel(y, planes, mvf, lam, margin,
                                          quarter=q, bs=bs)
            mv16 = refine(mv16f, 16)
            mv8 = refine(mv8f, 8)
            mvh = refine(mvhf, (8, 16))
            mvv = refine(mvvf, (16, 8))
            mc = mops.mc_luma_q
        else:
            mv16, mv8 = mv16f * 4, mv8f * 4
            mvh, mvv = mvhf * 4, mvvf * 4
            mc = mops.mc_luma_q
        # every shape's MC runs on the common 8x8 grid (interpolation is
        # a pure function of (position, mv), so replication is exact)
        mv16_q = jnp.repeat(jnp.repeat(mv16, 2, 0), 2, 1)
        mvh_q = jnp.repeat(mvh, 2, 1)
        mvv_q = jnp.repeat(mvv, 2, 0)
        pred16 = mc(planes, mv16_q, margin, 0, bs=8)
        pred8 = mc(planes, mv8, margin, 0, bs=8)
        predh = mc(planes, mvh_q, margin, 0, bs=8)
        predv = mc(planes, mvv_q, margin, 0, bs=8)

    def sad8_of(pred):
        return jnp.abs(y - pred).reshape(n_mby * 2, 8, n_mbx * 2,
                                         8).sum(axis=(1, 3))

    def rate(vq):
        return (jnp.abs(vq[..., 0]) + jnp.abs(vq[..., 1])) >> 1

    def mb_sum(a):
        return a.reshape(n_mby, 2, n_mbx, 2).sum(axis=(1, 3))

    # rates per partition, spread over the blocks it covers (crude
    # |mv|-based estimate, consistent across shapes)
    cost16 = mb_sum(sad8_of(pred16)) + lam * rate(mv16)
    cost8 = mb_sum(sad8_of(pred8) + lam * rate(mv8 - mv16_q)) \
        + lam * P8X8_BIT_PENALTY
    costh = (sad8_of(predh).reshape(2 * n_mby, n_mbx, 2).sum(-1)
             + lam * rate(mvh - mv16[jnp.arange(2 * n_mby) // 2])
             ).reshape(n_mby, 2, n_mbx).sum(1) \
        + lam * P2PART_BIT_PENALTY
    costv = (sad8_of(predv).reshape(n_mby, 2, 2 * n_mbx).sum(1)
             + lam * rate(mvv - mv16[:, jnp.arange(2 * n_mbx) // 2])
             ).reshape(n_mby, n_mbx, 2).sum(-1) \
        + lam * P2PART_BIT_PENALTY

    # real motion split required per shape, or the "gain" is sub-pel
    # refinement noise that never pays for its syntax
    def split_of(mv_q):
        return jnp.abs(mv_q - mv16_q).max(axis=-1).reshape(
            n_mby, 2, n_mbx, 2).max(axis=(1, 3)) >= P8X8_MIN_SPLIT_Q
    cost8 = jnp.where(split_of(mv8), cost8, 2**30)
    costh = jnp.where(split_of(mvh_q), costh, 2**30)
    costv = jnp.where(split_of(mvv_q), costv, 2**30)

    # SAD preselects the best sub-16x16 shape; the 16x16-vs-sub call is
    # then a true luma RD trial (transform/quant/recon both candidates,
    # SSD + lambda2 * (level-bits + mvd-bits + header-bits)) — the SAD
    # currency alone loses BD-rate on smooth content where splits that
    # lower SAD don't pay for their syntax after quantization.
    sub_costs = jnp.stack([costh, costv, cost8])        # sub type 0..2
    sub_t = jnp.argmin(sub_costs, axis=0).astype(jnp.int32)
    no_sub = sub_costs.min(axis=0) >= 2**30
    st2 = jnp.repeat(jnp.repeat(sub_t, 2, 0), 2, 1)[..., None]
    mv8_sub = jnp.where(st2 == 0, mvh_q,
                        jnp.where(st2 == 1, mvv_q, mv8))
    st_px = jnp.repeat(jnp.repeat(sub_t, 16, 0), 16, 1)[:h, :w]
    pred_sub = jnp.where(st_px == 0, predh,
                         jnp.where(st_px == 1, predv, pred8))

    lam2 = 0.9 * jnp.power(2.0, (qp - 12) / 3.0)

    def luma_trial(pred):
        """Per-MB (SSD, level-bits proxy) of the quantized 4x4 path.

        Approximation (advisor, round 3): the trial prices every
        candidate with the 4x4 transform even when transform8 is
        enabled and the winner may later code 8x8 — consistent across
        candidates, so the RANKING bias is limited to t8-heavy content;
        the final residual still makes its own adaptive 4x4/8x8 choice
        in _residual_recon."""
        zt = tf.quant4(tf.fdct4(tf.to_blocks4(y - pred)), qp, intra=False)
        rec = jnp.clip(
            pred + tf.from_blocks4(tf.idct4(tf.dequant4(zt, qp))), 0, 255)
        d = (y - rec).astype(jnp.float32)
        ssd = (d * d).reshape(n_mby, 16, n_mbx, 16).sum(axis=(1, 3))
        a = jnp.abs(zt.astype(jnp.float32))
        lb = jnp.where(a > 0, 2.0 * jnp.log2(a + 1.0) + 1.7, 0.0)
        lb_mb = lb.reshape(n_mby, 4, n_mbx, 4, 16)
        nzblk = jnp.any(a.reshape(n_mby, 4, n_mbx, 4, 16) > 0,
                        axis=-1).astype(jnp.float32)
        bits = lb_mb.sum(axis=(1, 3, 4)) + 3.0 * nzblk.sum(axis=(1, 3))
        return ssd, bits

    def se_bits(v):
        """se(v) Exp-Golomb length proxy, per component, qpel units."""
        a = jnp.abs(v).astype(jnp.float32)
        return jnp.where(a == 0, 1.0, 2.0 * jnp.log2(2.0 * a + 1.0) + 1.0)

    # approximate median MV predictor for pricing mvd16 (the real median
    # depends on final skip/intra state, host-side; neighbors' candidate
    # 16x16 vectors are a faithful stand-in for rate estimation)
    mvl = jnp.pad(mv16, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    mvt = jnp.pad(mv16, ((1, 0), (0, 0), (0, 0)))[:-1]
    mvtr = jnp.pad(mv16, ((1, 0), (0, 1), (0, 0)))[:-1, 1:]
    mvp = mvl + mvt + mvtr \
        - jnp.maximum(jnp.maximum(mvl, mvt), mvtr) \
        - jnp.minimum(jnp.minimum(mvl, mvt), mvtr)
    mvbits16 = se_bits(mv16 - mvp).sum(-1)
    # sub-shape mvds priced against the 16x16 vector (their predictors
    # track the enclosing motion field); plus the base vector's own cost
    mvb_h = se_bits(mvh - mv16[jnp.arange(2 * n_mby) // 2]) \
        .sum(-1).reshape(n_mby, 2, n_mbx).sum(1)
    mvb_v = se_bits(mvv - mv16[:, jnp.arange(2 * n_mbx) // 2]) \
        .sum(-1).reshape(n_mby, n_mbx, 2).sum(-1)
    mvb_8 = se_bits(mv8 - mv16_q).sum(-1) \
        .reshape(n_mby, 2, n_mbx, 2).sum(axis=(1, 3))
    mvbits_sub = jnp.where(sub_t == 0, mvb_h,
                           jnp.where(sub_t == 1, mvb_v, mvb_8)) + mvbits16
    hdr_sub = jnp.where(sub_t == 2, 9.0, 3.0)   # mb_type + sub_mb_types

    ssd16, lbits16 = luma_trial(pred16)
    ssds, lbitss = luma_trial(pred_sub)
    rd16 = ssd16 + lam2 * (lbits16 + mvbits16 + 1.0)
    rdsub = ssds + lam2 * (lbitss + mvbits_sub + hdr_sub)
    use_sub = (rdsub < rd16) & ~no_sub
    ptype = jnp.where(use_sub, sub_t + 1, 0).astype(jnp.int32)
    pt2 = jnp.repeat(jnp.repeat(ptype, 2, 0), 2, 1)[..., None]
    mv8_final = jnp.where(
        pt2 == 0, mv16_q, jnp.where(
            pt2 == 1, mvh_q, jnp.where(pt2 == 2, mvv_q, mv8)))
    pt_px = jnp.repeat(jnp.repeat(ptype, 16, 0), 16, 1)[:h, :w]
    pred_y = jnp.where(
        pt_px == 0, pred16, jnp.where(
            pt_px == 1, predh, jnp.where(pt_px == 2, predv, pred8)))
    part = ptype

    if jax.default_backend() == "cpu":
        pred_u = mops.mc_chroma_q(ref_u, mv8_final, sr // 2 + 2, 0, bs=8)
        pred_v = mops.mc_chroma_q(ref_v, mv8_final, sr // 2 + 2, 0, bs=8)
    else:
        pred_u, pred_v = mops.mc_chroma_q_pair(ref_u, ref_v, mv8_final,
                                               sr // 2 + 2, 0, bs=8)

    (z_luma, cb_dc, cb_ac, cr_dc, cr_ac,
     recon_y, recon_u, recon_v, nz4, t8g) = gop_ops._residual_recon(
        y, u, v, pred_y, pred_u, pred_v, qp, qpc, t8=t8)

    out = {
        "mv": mv8_final[::2, ::2],             # partition-0 view (compat)
        "mv8": mv8_final, "parts": part,
        "cb_dc": cb_dc.reshape(n_mby, n_mbx, 4),
        "cr_dc": cr_dc.reshape(n_mby, n_mbx, 4),
        "t8": t8g,
        "luma": z_luma.reshape(n_mby, n_mbx, 16, 16),
        "cb_ac": cb_ac.reshape(n_mby, n_mbx, 4, 16),
        "cr_ac": cr_ac.reshape(n_mby, n_mbx, 4, 16),
    }
    intra_grid = jnp.zeros((n_mby, n_mbx), bool)
    if intra_mbs:
        # per-MB intra overlay (x264-medium's dominant gradient tool):
        # inter RD cost in the overlay's currency, then the slope-2
        # wavefront replaces MBs where I16/i8 wins (intra_rd)
        from . import intra_rd as ird
        d = (y - recon_y).astype(jnp.float32)
        issd = (d * d).reshape(n_mby, 16, n_mbx, 16).sum(axis=(1, 3))
        az = jnp.abs(z_luma.reshape(n_mby, n_mbx, 256)
                     .astype(jnp.float32))
        lb = jnp.where(az > 0, 2.0 * jnp.log2(az + 1.0) + 1.7, 0.0) \
            .sum(-1)
        ac_ = jnp.abs(jnp.concatenate(
            [cb_dc.reshape(n_mby, n_mbx, -1),
             cr_dc.reshape(n_mby, n_mbx, -1),
             cb_ac.reshape(n_mby, n_mbx, -1),
             cr_ac.reshape(n_mby, n_mbx, -1)], -1).astype(jnp.float32))
        cb_bits = jnp.where(ac_ > 0, 2.0 * jnp.log2(ac_ + 1.0) + 1.7,
                            0.0).sum(-1)
        mvbits_final = jnp.where(use_sub, mvbits_sub, mvbits16)
        inter_cost = issd + lam2 * (lb + cb_bits + mvbits_final + 4.0)

        # Gate: the sequential wavefront costs ~0.2 s/frame on v5e; an
        # optimistic parallel probe (bits-free SSD of I16 V/H/DC built
        # from inter-recon neighbors + the mode-overhead constant) lower-
        # bounds what intra could achieve. If it beats the inter cost
        # NOWHERE, the wavefront provably finds no win — skip it (one
        # lax.cond; the frame result is identical because the overlay
        # replaces nothing). Content where inter predicts well (static,
        # clean motion) skips; gradients keep the RD tool. VCP_INTRA_GATE
        # =0 forces the wavefront on.
        ymb_p = y.reshape(n_mby, 16, n_mbx, 16).astype(jnp.float32)
        above = jnp.concatenate(
            [jnp.full((1, w), 128, jnp.int32), recon_y[15::16][:-1]]) \
            .reshape(n_mby, n_mbx, 16).astype(jnp.float32)
        left = jnp.concatenate(
            [jnp.full((h, 1), 128, jnp.int32), recon_y[:, 15::16][:, :-1]],
            axis=1).reshape(n_mby, 16, n_mbx).astype(jnp.float32)
        dc = (above.sum(-1) + left.sum(1) + 16.0) // 32.0
        ssd_v = ((ymb_p - above[:, None]) ** 2).sum(axis=(1, 3))
        ssd_h = ((ymb_p - left[..., None]) ** 2).sum(axis=(1, 3))
        ssd_dc = ((ymb_p - dc[:, None, :, None]) ** 2).sum(axis=(1, 3))
        # I16 Plane (spec 8.3.3.4) — the gradient workhorse; without it
        # the probe misses exactly the content the overlay exists for
        tl = jnp.concatenate(
            [jnp.full((n_mby, 1), 128.0, jnp.float32),
             above[:, :-1, 15]], axis=1)               # p[-1,-1] per MB
        a_ext = jnp.concatenate([tl[..., None], above], axis=-1)  # A[i]=p[-1,i-1]
        l_ext = jnp.concatenate(
            [tl[:, None, :], left], axis=1)            # L[j]=p[j-1,-1]
        xs = jnp.arange(1, 9, dtype=jnp.float32)
        hh = (xs * (a_ext[..., 9:17] - a_ext[..., 7::-1])).sum(-1)
        vv = (xs[:, None] * (l_ext[:, 9:17] - l_ext[:, 7::-1])).sum(1)
        a_p = 16.0 * (above[..., 15] + left[:, 15])
        b_p = jnp.floor((5.0 * hh + 32.0) / 64.0)
        c_p = jnp.floor((5.0 * vv + 32.0) / 64.0)
        gy = jnp.arange(16, dtype=jnp.float32) - 7.0
        plane = jnp.clip(jnp.floor(
            (a_p[:, None, :, None] + b_p[:, None, :, None] * gy[None, None,
                                                                None, :]
             + c_p[:, None, :, None] * gy[None, :, None, None] + 16.0)
            / 32.0), 0, 255)
        ssd_p = ((ymb_p - plane) ** 2).sum(axis=(1, 3))
        # margin 0.15: the wavefront's i8 directional modes can beat the
        # best I16 probe SSD by several x on oblique gradients — a 0.6
        # margin skipped frames with real intra wins and cost gradmotion
        # +14 -> +62% BD-rate (measured, round 5). 0.15 keeps every
        # golden-clip stream byte-identical to the ungated encoder while
        # still skipping clearly inter-predicted content.
        margin = float(os.environ.get("VCP_GATE_MARGIN", "0.15"))
        probe = margin * jnp.minimum(
            jnp.minimum(ssd_p, ssd_dc), jnp.minimum(ssd_v, ssd_h)) \
            + lam2 * float(ird.I16_OVERHEAD_BITS)
        gate = jnp.any(probe < inter_cost) | (
            os.environ.get("VCP_INTRA_GATE") == "0")

        ov_sig = (
            ("intra", (n_mby, n_mbx), jnp.bool_),
            ("i8", (n_mby, n_mbx), jnp.bool_),
            ("modes", (n_mby, n_mbx), jnp.int32),
            ("cmodes", (n_mby, n_mbx), jnp.int32),
            ("luma_dc", (n_mby, n_mbx, 16), jnp.int32),
            ("luma_mux", (n_mby, n_mbx, 256), jnp.int32),
            ("i8_modes", (n_mby, n_mbx, 4), jnp.int32),
            ("cb_dc", (n_mby, n_mbx, 4), jnp.int32),
            ("cb_ac", (n_mby, n_mbx, 4, 16), jnp.int32),
            ("cr_dc", (n_mby, n_mbx, 4), jnp.int32),
            ("cr_ac", (n_mby, n_mbx, 4, 16), jnp.int32),
        )

        def _run_overlay(_):
            o = ird.intra_overlay_pass(y, u, v, recon_y, recon_u,
                                       recon_v, inter_cost, qp, qpc)
            return tuple(
                [o[k].astype(dt).reshape(sh) for k, sh, dt in ov_sig]
                + [o["recon_y"].astype(recon_y.dtype),
                   o["recon_u"].astype(recon_u.dtype),
                   o["recon_v"].astype(recon_v.dtype)])

        def _skip_overlay(_):
            return tuple([jnp.zeros(sh, dt) for _k, sh, dt in ov_sig]
                         + [recon_y, recon_u, recon_v])

        res = jax.lax.cond(gate, _run_overlay, _skip_overlay, None)
        ov = {k: v for (k, _sh, _dt), v in zip(ov_sig, res[:len(ov_sig)])}
        ov["recon_y"], ov["recon_u"], ov["recon_v"] = res[len(ov_sig):]
        intra_grid = ov["intra"]
        recon_y, recon_u, recon_v = (ov["recon_y"], ov["recon_u"],
                                     ov["recon_v"])
        ipx = intra_grid[:, :, None]
        out["luma"] = jnp.where(
            ipx[..., None],
            ov["luma_mux"].reshape(n_mby, n_mbx, 16, 16), out["luma"])
        out["cb_dc"] = jnp.where(ipx, ov["cb_dc"], out["cb_dc"])
        out["cr_dc"] = jnp.where(ipx, ov["cr_dc"], out["cr_dc"])
        out["cb_ac"] = jnp.where(ipx[..., None], ov["cb_ac"],
                                 out["cb_ac"])
        out["cr_ac"] = jnp.where(ipx[..., None], ov["cr_ac"],
                                 out["cr_ac"])
        out["t8"] = jnp.where(intra_grid, ov["i8"], t8g)
        out["intra"] = intra_grid
        out["i8"] = ov["i8"]
        out["imodes"] = ov["modes"]
        out["icmodes"] = ov["cmodes"]
        out["luma_dc"] = ov["luma_dc"]
        out["i8_modes"] = ov["i8_modes"]
        t8g = out["t8"]

    if deblock:
        from ...ops import deblock as dbf
        qp_mb = jnp.full((n_mby, n_mbx), qp, jnp.int32)
        recon_y, recon_u, recon_v = dbf.deblock_frame(
            recon_y, recon_u, recon_v, qp_mb, intra_grid, nz4, mv8_final,
            tf.CHROMA_QP_FULL, no_strong=not intra_mbs, qp_scalar=qp,
            t8=t8g if (t8 or intra_mbs) else None)

    out["recon_y"] = recon_y.astype(jnp.uint8)
    out["recon_u"] = recon_u.astype(jnp.uint8)
    out["recon_v"] = recon_v.astype(jnp.uint8)
    return out


# ---------------------------------------------------------------------------
# MV prediction (spec 8.4.1.3; shared by encoder and decoder)
# ---------------------------------------------------------------------------

def _neighbor(mvs, valid, mbx, mby, n_mbx):
    """Returns (mvA, refA, mvB, refB, mvC, refC) with ref=-1 for
    unavailable/intra; C substituted by D when above-right is unavailable."""
    def get(x, y):
        if x < 0 or y < 0 or x >= n_mbx:
            return (0, 0), -1
        if not valid[y, x]:
            return (0, 0), -1
        return (int(mvs[y, x, 0]), int(mvs[y, x, 1])), 0

    a, ra = get(mbx - 1, mby)
    b, rb = get(mbx, mby - 1)
    if mby > 0 and mbx + 1 < n_mbx:
        c, rc = get(mbx + 1, mby - 1)
        c_exists = True
    else:
        c_exists = False
        c, rc = (0, 0), -1
    if not c_exists or rc < 0:
        # substitute D (above-left); note rc<0 also covers intra C
        d, rd = get(mbx - 1, mby - 1)
        if rc < 0:
            c, rc = d, rd
    return a, ra, b, rb, c, rc


def _exists(mbx, mby, n_mbx):
    return 0 <= mbx < n_mbx and mby >= 0


def mv_pred(mvs, valid, mbx, mby, n_mbx):
    """Median MV predictor for a 16x16 partition, full-pel units."""
    a, ra, b, rb, c, rc = _neighbor(mvs, valid, mbx, mby, n_mbx)
    # B and C (post-substitution) unavailable, A available → A.
    b_exists = _exists(mbx, mby - 1, n_mbx) and rb >= 0
    c_avail = rc >= 0
    a_avail = ra >= 0
    if not b_exists and not c_avail and a_avail:
        return a
    # exactly one neighbor references the current picture (refIdx 0)
    refs = [ra, rb, rc]
    hits = [i for i, r in enumerate(refs) if r == 0]
    if len(hits) == 1:
        return (a, b, c)[hits[0]]
    # componentwise median (unavailable → 0)
    xs = sorted((a[0], b[0], c[0]))
    ys = sorted((a[1], b[1], c[1]))
    return (xs[1], ys[1])


def skip_mv(mvs, valid, mbx, mby, n_mbx):
    """P_Skip motion vector (spec 8.4.1.1)."""
    a_in = _exists(mbx - 1, mby, n_mbx)
    b_in = _exists(mbx, mby - 1, n_mbx)
    if not a_in or not b_in:
        return (0, 0)
    a, ra, b, rb, _, _ = _neighbor(mvs, valid, mbx, mby, n_mbx)
    if (ra == 0 and a == (0, 0)) or (rb == 0 and b == (0, 0)):
        return (0, 0)
    # also intra/unavailable neighbors (ref -1) force zero
    if ra < 0 or rb < 0:
        return (0, 0)
    return mv_pred(mvs, valid, mbx, mby, n_mbx)


# ---------------------------------------------------------------------------
# MV prediction on the 8x8 block grid (frames with P_8x8 partitions).
# Spec 8.4.1.3 works in 4x4 units; with every partition >= 8x8 the 8x8
# grid carries the same information. For all-16x16 frames these reduce
# exactly to mv_pred/skip_mv above (the neighbor blocks hit the same MBs).
# ---------------------------------------------------------------------------

def _blk8_before(by, bx, cby, cbx):
    """Is 8x8 block (cby, cbx) decoded before the partition whose
    top-left block is (by, bx)? MB raster order; partitions 0..3 raster
    within an MB."""
    mb = (by >> 1, bx >> 1)
    cmb = (cby >> 1, cbx >> 1)
    if cmb != mb:
        return cmb < mb
    return (2 * (cby & 1) + (cbx & 1)) < (2 * (by & 1) + (bx & 1))


def _neighbor8(mv8, valid8, by, bx, pw, nbx2):
    """(mvA, refA, mvB, refB, mvC, refC) for the partition with top-left
    8x8 block (by, bx), width ``pw`` blocks (2 = 16x16, 1 = 8x8).
    Encoder semantics: not-inter == unavailable (ref -1), matching
    _neighbor above. C is the block above-right of the partition,
    substituted by D (above-left) when not available in decode order."""
    def get(cby, cbx):
        if cbx < 0 or cby < 0 or cbx >= nbx2:
            return (0, 0), -1
        if not valid8[cby, cbx]:
            return (0, 0), -1
        return (int(mv8[cby, cbx, 0]), int(mv8[cby, cbx, 1])), 0

    a, ra = get(by, bx - 1)
    b, rb = get(by - 1, bx)
    c_exists = (by - 1 >= 0 and bx + pw < nbx2
                and _blk8_before(by, bx, by - 1, bx + pw))
    if c_exists:
        c, rc = get(by - 1, bx + pw)
    else:
        c, rc = (0, 0), -1
    if not c_exists or rc < 0:
        d, rd = get(by - 1, bx - 1)
        if rc < 0:
            c, rc = d, rd
    return a, ra, b, rb, c, rc


def mv_pred8(mv8, valid8, by, bx, pw, nbx2, ph=None, part_idx=0):
    """Median MV predictor for a partition on the 8x8 grid, including
    the 16x8/8x16 directional rules (8.4.1.3.1; all-inter single-ref
    encoder semantics, mirroring mvpred.mv_pred on the decoder)."""
    if ph is None:
        ph = pw
    a, ra, b, rb, c, rc = _neighbor8(mv8, valid8, by, bx, pw, nbx2)
    if (pw, ph) == (2, 1):                     # 16x8
        if part_idx == 0 and rb == 0:
            return b
        if part_idx == 1 and ra == 0:
            return a
    elif (pw, ph) == (1, 2):                   # 8x16
        if part_idx == 0 and ra == 0:
            return a
        if part_idx == 1 and rc == 0:
            return c
    b_exists = by - 1 >= 0 and rb >= 0
    c_avail = rc >= 0
    a_avail = ra >= 0
    if not b_exists and not c_avail and a_avail:
        return a
    refs = [ra, rb, rc]
    hits = [i for i, r in enumerate(refs) if r == 0]
    if len(hits) == 1:
        return (a, b, c)[hits[0]]
    xs = sorted((a[0], b[0], c[0]))
    ys = sorted((a[1], b[1], c[1]))
    return (xs[1], ys[1])


def skip_mv8(mv8, valid8, mbx, mby, nbx2):
    """P_Skip MV (spec 8.4.1.1) on the 8x8 grid."""
    by, bx = 2 * mby, 2 * mbx
    if bx - 1 < 0 or by - 1 < 0:
        return (0, 0)
    a, ra, b, rb, _, _ = _neighbor8(mv8, valid8, by, bx, 2, nbx2)
    if (ra == 0 and a == (0, 0)) or (rb == 0 and b == (0, 0)):
        return (0, 0)
    if ra < 0 or rb < 0:
        return (0, 0)
    return mv_pred8(mv8, valid8, by, bx, 2, nbx2)


# ---------------------------------------------------------------------------
# Host entropy: P slice
# ---------------------------------------------------------------------------

def write_pslice(sp: H.SeqParams, pp: H.PicParams, *, frame_num: int,
                 qp: int, data: dict, deblock: bool = False,
                 cabac: bool = False, poc_lsb: int = 0) -> bytes:
    """P slice NAL. C++ engine when available (bit-identical), else Python.
    ``cabac=True`` routes to the CABAC syntax layer."""
    from ... import native
    lib = native.get_lib()
    t8 = data.get("t8")
    has_t8 = t8 is not None and bool(np.asarray(t8).any())
    has_intra = data.get("intra") is not None and bool(np.asarray(
        data["intra"]).any())
    if has_intra:
        # intra-overlay P frames need decoder-semantics MV derivations
        # and the I16/i8-in-P syntax (CABAC-only quality path)
        assert cabac, "intra-in-P requires the CABAC quality path"
        if lib is not None and hasattr(lib, "vcp_write_pslice_cabac_intra"):
            return _write_pslice_cabac_intra_native(
                lib, sp, pp, frame_num=frame_num, qp=qp, data=data,
                deblock=deblock, poc_lsb=poc_lsb)
        from .cabac_syntax import write_pslice_cabac_intra
        return write_pslice_cabac_intra(sp, pp, frame_num=frame_num,
                                        qp=qp, data=data, deblock=deblock,
                                        poc_lsb=poc_lsb)
    if data.get("parts") is not None and bool(np.asarray(
            data["parts"]).any()):
        # partitioned P frames (quality presets)
        if cabac and lib is not None \
                and hasattr(lib, "vcp_write_pslice_cabac_parts"):
            return _write_pslice_cabac_parts_native(
                lib, sp, pp, frame_num=frame_num, qp=qp, data=data,
                deblock=deblock, poc_lsb=poc_lsb)
        if cabac:
            from .cabac_syntax import write_pslice_cabac
            return write_pslice_cabac(sp, pp, frame_num=frame_num, qp=qp,
                                      data=data, deblock=deblock,
                                      poc_lsb=poc_lsb)
        return _write_pslice_py(sp, pp, frame_num=frame_num, qp=qp,
                                data=data, deblock=deblock,
                                poc_lsb=poc_lsb)
    if cabac:
        assert pp.cabac, "pp.cabac must match the slice entropy mode"
        if lib is not None and hasattr(lib, "vcp_write_pslice_cabac_t8") \
                and pp.transform_8x8:
            return _write_pslice_cabac_native(
                lib, sp, pp, frame_num=frame_num, qp=qp, data=data,
                deblock=deblock, poc_lsb=poc_lsb, t8=True)
        if lib is not None and not has_t8 and not pp.transform_8x8:
            return _write_pslice_cabac_native(
                lib, sp, pp, frame_num=frame_num, qp=qp, data=data,
                deblock=deblock, poc_lsb=poc_lsb)
        from .cabac_syntax import write_pslice_cabac
        return write_pslice_cabac(sp, pp, frame_num=frame_num, qp=qp,
                                  data=data, deblock=deblock,
                                  poc_lsb=poc_lsb)
    if lib is not None and not has_t8 and not pp.transform_8x8:
        return _write_pslice_native(lib, sp, pp, frame_num=frame_num,
                                    qp=qp, data=data, deblock=deblock,
                                    poc_lsb=poc_lsb)
    return _write_pslice_py(sp, pp, frame_num=frame_num, qp=qp, data=data,
                            deblock=deblock, poc_lsb=poc_lsb)


def _active_ptr(data):
    """ctypes pointer for the optional sparse-fetch active mask (NULL =
    every MB present in the dense arrays)."""
    import ctypes
    act = data.get("active")
    if act is None:
        return ctypes.POINTER(ctypes.c_uint8)()
    act = np.ascontiguousarray(act, np.uint8)
    data["_active_keepalive"] = act       # keep buffer alive for the call
    return act.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _write_pslice_native(lib, sp, pp, *, frame_num, qp, data,
                         deblock=False, poc_lsb=0) -> bytes:
    import ctypes
    from .entropy import _nal_from_rbsp_native
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    mv = np.asarray(data["mv"])
    mv_xy = np.ascontiguousarray(
        np.stack([mv[..., 1], mv[..., 0]], axis=-1), np.int32)
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma", "cb_dc", "cb_ac", "cr_dc", "cr_ac")]
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    n = lib.vcp_write_pslice(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num, frame_num,
        0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        _active_ptr(data),
        mv_xy.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError("native pslice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_NONIDR, 2)


def _write_pslice_cabac_native(lib, sp, pp, *, frame_num, qp, data,
                               deblock=False, poc_lsb=0,
                               t8: bool = False) -> bytes:
    import ctypes
    from .entropy import _nal_from_rbsp_native
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    mv = np.asarray(data["mv"])
    mv_xy = np.ascontiguousarray(
        np.stack([mv[..., 1], mv[..., 0]], axis=-1), np.int32)
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma", "cb_dc", "cb_ac", "cr_dc", "cr_ac")]
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    common = (n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num,
              frame_num, 0 if deblock else 1,
              sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
              _active_ptr(data))
    tail = tuple(a.ctypes.data_as(i32p) for a in (mv_xy, *arrs)) \
        + (out.ctypes.data_as(u8p), cap)
    if t8:
        t8a = data.get("t8")
        t8a = np.ascontiguousarray(
            t8a if t8a is not None
            else np.zeros((n_mby, n_mbx), bool), np.uint8)
        n = lib.vcp_write_pslice_cabac_t8(
            *common, t8a.ctypes.data_as(u8p), *tail)
    else:
        n = lib.vcp_write_pslice_cabac(*common, *tail)
    if n < 0:
        raise RuntimeError("native cabac pslice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_NONIDR, 2)


def _write_pslice_cabac_intra_native(lib, sp, pp, *, frame_num, qp, data,
                                     deblock=False, poc_lsb=0) -> bytes:
    """Intra-overlay P slice through the C++ writer
    (vcp_write_pslice_cabac_intra) — bit-identical to
    cabac_syntax.write_pslice_cabac_intra (test_native_entropy)."""
    import ctypes
    from .entropy import _nal_from_rbsp_native
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    mv8_xy, parts = _mv8_grid_xy(data, n_mby, n_mbx)
    mv8_xy = np.ascontiguousarray(mv8_xy, np.int32)
    parts = np.ascontiguousarray(parts, np.int32)
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma", "cb_dc", "cb_ac", "cr_dc", "cr_ac")]
    intra = np.ascontiguousarray(data["intra"], np.uint8)
    i8 = np.ascontiguousarray(data["i8"], np.uint8)
    imodes = np.ascontiguousarray(data["imodes"], np.int32)
    icmodes = np.ascontiguousarray(data["icmodes"], np.int32)
    luma_dc = np.ascontiguousarray(data["luma_dc"], np.int32)
    i8_modes = np.ascontiguousarray(data["i8_modes"], np.int32)
    t8a = data.get("t8")
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    if t8a is not None:
        t8a = np.ascontiguousarray(t8a, np.uint8)
        t8p = t8a.ctypes.data_as(u8p)
    else:
        t8p = ctypes.cast(None, u8p)
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    n = lib.vcp_write_pslice_cabac_intra(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num, frame_num,
        0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        t8p, 1 if pp.transform_8x8 else 0,
        intra.ctypes.data_as(u8p), i8.ctypes.data_as(u8p),
        imodes.ctypes.data_as(i32p), icmodes.ctypes.data_as(i32p),
        luma_dc.ctypes.data_as(i32p), i8_modes.ctypes.data_as(i32p),
        mv8_xy.ctypes.data_as(i32p), parts.ctypes.data_as(i32p),
        *[a.ctypes.data_as(i32p) for a in arrs],
        out.ctypes.data_as(u8p), cap)
    if n < 0:
        raise RuntimeError("native cabac intra pslice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_NONIDR, 2)


def _write_pslice_cabac_parts_native(lib, sp, pp, *, frame_num, qp, data,
                                     deblock=False, poc_lsb=0) -> bytes:
    """Partitioned CABAC P slice through the C++ writer (bit-identical
    to cabac_syntax.write_pslice_cabac — pinned by
    tests/test_native_entropy.py)."""
    import ctypes
    from .entropy import _nal_from_rbsp_native
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    mv8_xy, parts = _mv8_grid_xy(data, n_mby, n_mbx)
    mv8_xy = np.ascontiguousarray(mv8_xy, np.int32)
    parts = np.ascontiguousarray(parts, np.int32)
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma", "cb_dc", "cb_ac", "cr_dc", "cr_ac")]
    t8a = data.get("t8")
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    if t8a is not None:
        t8a = np.ascontiguousarray(t8a, np.uint8)
        t8p = t8a.ctypes.data_as(u8p)
    else:
        t8p = ctypes.cast(None, u8p)
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    n = lib.vcp_write_pslice_cabac_parts(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num, frame_num,
        0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        _active_ptr(data), t8p, 1 if pp.transform_8x8 else 0,
        mv8_xy.ctypes.data_as(i32p), parts.ctypes.data_as(i32p),
        *[a.ctypes.data_as(i32p) for a in arrs],
        out.ctypes.data_as(u8p), cap)
    if n < 0:
        raise RuntimeError("native cabac parts pslice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_NONIDR, 2)


def _mv8_grid_xy(data: dict, n_mby: int, n_mbx: int):
    """(mv8_xy (2nMBy, 2nMBx, 2) int grid, ptype (nMBy, nMBx) int) from
    an entropy data dict: uses the 8x8-grid field when the device
    emitted one, else replicates the per-MB field. The partition type
    (0 = 16x16, 1 = 16x8, 2 = 8x16, 3 = P_8x8) is CANONICALIZED from
    the MV field itself — the cheapest mb_type that expresses it —
    since reconstruction is shape-agnostic (MC depends only on the
    per-8x8 vectors) and the decoder rebuilds the same grid either way.
    """
    mv8 = data.get("mv8")
    if mv8 is None:
        mv = np.asarray(data["mv"])
        mv8 = np.repeat(np.repeat(mv, 2, 0), 2, 1)
        ptype = np.zeros((n_mby, n_mbx), np.int32)
    else:
        mv8 = np.asarray(mv8)
        quads = mv8.reshape(n_mby, 2, n_mbx, 2, 2)  # (mby, sy, mbx, sx, 2)
        uniform = (quads == quads[:, :1, :, :1]).all(axis=(1, 3, 4))
        rows_u = (quads[:, :, :, 0] == quads[:, :, :, 1]).all(
            axis=-1).all(axis=1)                    # both rows left==right
        cols_u = (quads[:, 0] == quads[:, 1]).all(
            axis=-1).all(axis=-1)                   # both cols top==bottom
        ptype = np.where(uniform, 0,
                         np.where(rows_u, 1, np.where(cols_u, 2, 3)))
    mv8_xy = np.stack([mv8[..., 1], mv8[..., 0]], axis=-1)
    return mv8_xy, ptype.astype(np.int32)


def _write_pslice_py(sp: H.SeqParams, pp: H.PicParams, *, frame_num: int,
                     qp: int, data: dict, deblock: bool = False,
                     poc_lsb: int = 0) -> bytes:
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    nbx2 = 2 * n_mbx
    bw = BitWriter()
    H.write_slice_header(bw, sp, pp, is_idr=False, frame_num=frame_num,
                         slice_qp=qp, disable_deblocking=not deblock,
                         poc_lsb=poc_lsb)

    luma = data["luma"]            # (nMBy, nMBx, 16, 16)
    cb_dc, cb_ac = data["cb_dc"], data["cb_ac"]
    cr_dc, cr_ac = data["cr_dc"], data["cr_ac"]

    nz_y = NzContext(4 * n_mby, 4 * n_mbx)
    nz_cb = NzContext(2 * n_mby, 2 * n_mbx)
    nz_cr = NzContext(2 * n_mby, 2 * n_mbx)
    t8 = data.get("t8")                     # 8x8-transform flags (or None)
    valid8 = np.ones((2 * n_mby, nbx2), bool)   # all MBs inter here
    # sparse-fetch chunks carry only ACTIVE MBs; the rest are skips whose
    # MV we re-derive here (spec 8.4.1.1 — same rule the device used to
    # classify them, gop_ops.skip_mv_grid)
    active = data.get("active")
    # MV field on the 8x8 block grid, (x, y) order
    mv8_xy, parts = _mv8_grid_xy(data, n_mby, n_mbx)

    # precompute per-MB cbp
    luma_nz = np.any(luma != 0, axis=-1)                 # (nMBy, nMBx, 16)
    quad_nz = luma_nz.reshape(n_mby, n_mbx, 4, 4).any(axis=-1)
    cbp_luma = (quad_nz * np.array([1, 2, 4, 8])).sum(axis=-1)
    any_cac = np.any(cb_ac[..., 1:] != 0, axis=(-1, -2)) | \
        np.any(cr_ac[..., 1:] != 0, axis=(-1, -2))
    any_cdc = np.any(cb_dc != 0, axis=-1) | np.any(cr_dc != 0, axis=-1)
    cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))

    def set_mb_mv(mby, mbx, m):
        mv8_xy[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = m

    skip_run = 0
    for mby in range(n_mby):
        for mbx in range(n_mbx):
            if active is not None and not active[mby, mbx]:
                set_mb_mv(mby, mbx,
                          skip_mv8(mv8_xy, valid8, mbx, mby, nbx2))
                skip_run += 1
                _zero_ctx(nz_y, nz_cb, nz_cr, mbx, mby)
                continue
            cbp = int(cbp_luma[mby, mbx]) | (int(cbp_chroma[mby, mbx]) << 4)
            pt = int(parts[mby, mbx])
            m = (int(mv8_xy[2 * mby, 2 * mbx, 0]),
                 int(mv8_xy[2 * mby, 2 * mbx, 1]))
            if pt == 0:
                smv = skip_mv8(mv8_xy, valid8, mbx, mby, nbx2)
                if cbp == 0 and m == smv:
                    skip_run += 1
                    _zero_ctx(nz_y, nz_cb, nz_cr, mbx, mby)
                    continue
            bw.ue(skip_run)
            skip_run = 0
            by0, bx0 = 2 * mby, 2 * mbx
            if pt == 3:
                bw.ue(3)                    # mb_type P_8x8
                for _ in range(4):
                    bw.ue(0)                # sub_mb_type P_L0_8x8
                for q in range(4):
                    by, bx = by0 + (q >> 1), bx0 + (q & 1)
                    pred = mv_pred8(mv8_xy, valid8, by, bx, 1, nbx2)
                    bw.se(int(mv8_xy[by, bx, 0]) - pred[0])
                    bw.se(int(mv8_xy[by, bx, 1]) - pred[1])
            elif pt in (1, 2):
                bw.ue(pt)                   # P_L0_L0_16x8 / 8x16
                geo = _P_PARTS[pt]
                for i, (dy, dx, pw, ph) in enumerate(geo):
                    by, bx = by0 + dy, bx0 + dx
                    pred = mv_pred8(mv8_xy, valid8, by, bx, pw, nbx2,
                                    ph=ph, part_idx=i)
                    bw.se(int(mv8_xy[by, bx, 0]) - pred[0])
                    bw.se(int(mv8_xy[by, bx, 1]) - pred[1])
            else:
                pred = mv_pred8(mv8_xy, valid8, by0, bx0, 2, nbx2)
                bw.ue(MB_TYPE_P16x16)
                bw.se(m[0] - pred[0])       # mvd_l0 x (mv already 1/4-pel)
                bw.se(m[1] - pred[1])
            bw.ue(CBP_INTER_TO_CODE[cbp])
            t8f = bool(t8[mby, mbx]) if t8 is not None else False
            if (cbp & 15) > 0 and pp.transform_8x8:
                bw.u(1, 1 if t8f else 0)    # transform_size_8x8_flag
            if cbp:
                bw.se(0)                    # mb_qp_delta
            _write_p_residual(bw, mbx, mby, cbp,
                              luma[mby, mbx],
                              (cb_dc[mby, mbx], cr_dc[mby, mbx]),
                              (cb_ac[mby, mbx], cr_ac[mby, mbx]),
                              nz_y, nz_cb, nz_cr, t8=t8f)
    if skip_run:
        bw.ue(skip_run)
    bw.rbsp_trailing_bits()
    return nal_unit(H.NAL_SLICE_NONIDR, bw.to_bytes(), nal_ref_idc=2)


def _zero_ctx(nz_y, nz_cb, nz_cr, mbx, mby):
    nz_y.nz[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 0
    nz_cb.nz[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0
    nz_cr.nz[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0


def _write_p_residual(bw, mbx, mby, cbp, z_luma, chroma_dc, chroma_ac,
                      nz_y, nz_cb, nz_cr, t8: bool = False):
    cbp_luma = cbp & 15
    cbp_chroma = cbp >> 4
    if t8:
        # interleaved CAVLC transport: z_luma rows 4b..4b+4 hold the 8x8
        # block's 64-scan; sub-block k = scan positions 4*i + k
        for b8 in range(4):
            scan64 = np.asarray(z_luma[4 * b8:4 * b8 + 4]).reshape(64)
            subs = scan64.reshape(16, 4).T
            for k in range(4):
                blk = 4 * b8 + k
                oy = int(LUMA_BLK_ORDER[blk, 0])
                ox = int(LUMA_BLK_ORDER[blk, 1])
                by, bx = 4 * mby + oy, 4 * mbx + ox
                if cbp_luma & (1 << b8):
                    total = encode_residual_block(
                        bw, [int(x) for x in subs[k]], nz_y.nc(by, bx))
                else:
                    total = 0
                nz_y.set(by, bx, total)
    else:
        for blk in range(16):
            oy, ox = int(LUMA_BLK_ORDER[blk, 0]), int(LUMA_BLK_ORDER[blk, 1])
            by, bx = 4 * mby + oy, 4 * mbx + ox
            if cbp_luma & (1 << (blk // 4)):
                nc = nz_y.nc(by, bx)
                total = encode_residual_block(
                    bw, [int(x) for x in z_luma[blk]], nc)
            else:
                total = 0
            nz_y.set(by, bx, total)
    if cbp_chroma:
        for c in range(2):
            encode_residual_block(bw, [int(x) for x in chroma_dc[c]], -1)
    for c, nzc in ((0, nz_cb), (1, nz_cr)):
        for blk in range(4):
            oy, ox = int(CHROMA_BLK_ORDER[blk, 0]), int(CHROMA_BLK_ORDER[blk, 1])
            by, bx = 2 * mby + oy, 2 * mbx + ox
            if cbp_chroma == 2:
                total = encode_residual_block(
                    bw, [int(x) for x in chroma_ac[c][blk, 1:]],
                    nzc.nc(by, bx))
            else:
                total = 0
            nzc.set(by, bx, total)


# ---------------------------------------------------------------------------
# Decoder halves (called from decoder.H264Decoder)
# ---------------------------------------------------------------------------

def _tap6_x_np(a):
    a = a.astype(np.int64)
    return (a[:, 0:-5] - 5 * a[:, 1:-4] + 20 * a[:, 2:-3]
            + 20 * a[:, 3:-2] - 5 * a[:, 4:-1] + a[:, 5:])


def _tap6_y_np(a):
    a = a.astype(np.int64)
    return (a[0:-5, :] - 5 * a[1:-4, :] + 20 * a[2:-3, :]
            + 20 * a[3:-2, :] - 5 * a[4:-1, :] + a[5:, :])


def _mc_luma_np(ref_y, y0, x0, mvq_y, mvq_x, ns: int = 16):
    """Quarter-pel luma MC for one ``ns`` x ``ns`` block (spec 8.4.2.2.1),
    numpy mirror of ops.motion.half_planes/mc_luma_q. Coordinates clamp
    to the picture."""
    h, w = ref_y.shape
    iy, ix = mvq_y >> 2, mvq_x >> 2
    fy, fx = mvq_y & 3, mvq_x & 3
    if fy == 0 and fx == 0:
        # full-pel: plain clamped gather, no interpolation planes
        ys = np.clip(np.arange(y0 + iy, y0 + iy + ns), 0, h - 1)
        xs = np.clip(np.arange(x0 + ix, x0 + ix + ns), 0, w - 1)
        return ref_y[np.ix_(ys, xs)].astype(np.int64)
    # fetch a clamped (ns+12)² region: block + one-sample case offsets +
    # filter margins (origin at base-6; planes align at region+3)
    ys = np.clip(np.arange(y0 + iy - 6, y0 + iy + ns + 6), 0, h - 1)
    xs = np.clip(np.arange(x0 + ix - 6, x0 + ix + ns + 6), 0, w - 1)
    a = ref_y[np.ix_(ys, xs)].astype(np.int64)
    b1 = _tap6_x_np(a)
    h1 = _tap6_y_np(a)
    j1 = _tap6_y_np(b1)
    g = a[3:-3, 3:-3]
    b = np.clip((b1 + 16) >> 5, 0, 255)[3:-3, 1:]
    hh = np.clip((h1 + 16) >> 5, 0, 255)[1:, 3:-3]
    j = np.clip((j1 + 512) >> 10, 0, 255)[1:, 1:]
    planes = (g, b, hh, j)
    from ...ops.motion import _QPEL_TABLE
    p1i, o1y, o1x, p2i, o2y, o2x = _QPEL_TABLE[fy * 4 + fx]
    base = 3  # plane coord of the block origin
    p1 = planes[p1i][base + o1y: base + o1y + ns,
                     base + o1x: base + o1x + ns]
    p2 = planes[p2i][base + o2y: base + o2y + ns,
                     base + o2x: base + o2x + ns]
    return (p1 + p2 + 1) >> 1


def _mc_chroma_np(ref_c, c0y, c0x, mvq_y, mvq_x):
    """Chroma 1/8-pel bilinear MC (chroma vector = quarter-luma value)."""
    hc, wc = ref_c.shape
    iy, ix = mvq_y >> 3, mvq_x >> 3
    fy, fx = mvq_y & 7, mvq_x & 7
    if fy == 0 and fx == 0:
        rows = np.clip(np.arange(c0y + iy, c0y + iy + 8), 0, hc - 1)
        cols = np.clip(np.arange(c0x + ix, c0x + ix + 8), 0, wc - 1)
        return ref_c[np.ix_(rows, cols)].astype(np.int64)
    base_r = np.arange(c0y + iy, c0y + iy + 8)
    base_c = np.arange(c0x + ix, c0x + ix + 8)
    # spec 8.4.2.2.2: each sample position is clipped independently from
    # the UNCLIPPED integer position (clip(x)+1 != clip(x+1) when x <= -2)
    rows = np.clip(base_r, 0, hc - 1)
    cols = np.clip(base_c, 0, wc - 1)
    rows1 = np.clip(base_r + 1, 0, hc - 1)
    cols1 = np.clip(base_c + 1, 0, wc - 1)
    a = ref_c[np.ix_(rows, cols)].astype(np.int64)
    b = ref_c[np.ix_(rows, cols1)].astype(np.int64)
    c = ref_c[np.ix_(rows1, cols)].astype(np.int64)
    d = ref_c[np.ix_(rows1, cols1)].astype(np.int64)
    return ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
            + (8 - fx) * fy * c + fx * fy * d + 32) >> 6


def _recon_inter_mb(dec_ctx, mbx, mby, mv, ref, z_luma=None,
                    chroma_dc=None, chroma_ac=None):
    """Shared recon: MC + (optional) residuals, writes into frame planes."""
    y, u, v = dec_ctx["y"], dec_ctx["u"], dec_ctx["v"]
    qp = dec_ctx["qp"]
    qpc = tf.chroma_qp(qp, dec_ctx["pp"].chroma_qp_index_offset)
    ref_y, ref_u, ref_v = ref
    y0, x0 = 16 * mby, 16 * mbx
    c0y, c0x = 8 * mby, 8 * mbx
    mvx, mvy = mv

    pred = _mc_luma_np(ref_y, y0, x0, mvy, mvx)
    if z_luma is not None:
        wq = np.stack([unzigzag(z_luma[blk]) for blk in range(16)])
        res = tf.idct4_np(tf.dequant4_np(wq, qp))
        for blk in range(16):
            oy, ox = int(LUMA_BLK_ORDER[blk, 0]), int(LUMA_BLK_ORDER[blk, 1])
            pred[4 * oy:4 * oy + 4, 4 * ox:4 * ox + 4] += res[blk]
    y[y0:y0 + 16, x0:x0 + 16] = np.clip(pred, 0, 255)

    for ci, (plane, refc) in enumerate(((u, ref_u), (v, ref_v))):
        predc = _mc_chroma_np(refc, c0y, c0x, mvy, mvx)
        if chroma_dc is not None:
            dc2 = chroma_dc[ci].reshape(2, 2)
            dc_rec = tf.dequant_dc2_np(dc2[None], qpc)[0]
            wqc = np.stack([unzigzag(chroma_ac[ci][blk])
                            for blk in range(4)])
            wc = tf.dequant4_np(wqc, qpc)
            for blk in range(4):
                oy, ox = int(CHROMA_BLK_ORDER[blk, 0]), int(CHROMA_BLK_ORDER[blk, 1])
                wc[blk, 0, 0] = dc_rec[oy, ox]
            resc = tf.idct4_np(wc)
            for blk in range(4):
                oy, ox = int(CHROMA_BLK_ORDER[blk, 0]), int(CHROMA_BLK_ORDER[blk, 1])
                predc[4 * oy:4 * oy + 4, 4 * ox:4 * ox + 4] += resc[blk]
        plane[c0y:c0y + 8, c0x:c0x + 8] = np.clip(predc, 0, 255)


def _mv_neighbors_dec(mvs, inter, mbx, mby, n_mbx):
    """Decoder-side neighbor fetch with SPEC availability semantics:
    a neighbor is unavailable only when its position lies outside the
    picture/slice; an INTRA-coded neighbor IS available, contributing
    mv (0,0) with refIdx -1 (spec 8.4.1.3.2). The encoder-side
    mv_pred/skip_mv above conflate the two — correct for this
    framework's all-inter P slices, wrong for foreign streams with
    intra MBs inside P slices."""
    def get(x, y):
        if x < 0 or y < 0 or x >= n_mbx:
            return None
        if not inter[y, x]:
            return ((0, 0), -1)
        return ((int(mvs[y, x, 0]), int(mvs[y, x, 1])), 0)

    a = get(mbx - 1, mby)
    b = get(mbx, mby - 1)
    c = get(mbx + 1, mby - 1) if mby > 0 and mbx + 1 < n_mbx else None
    if c is None:
        c = get(mbx - 1, mby - 1)
    return a, b, c


def mv_pred_dec(mvs, inter, mbx, mby, n_mbx):
    """Spec 8.4.1.3 median MV prediction (decoder semantics)."""
    a, b, c = _mv_neighbors_dec(mvs, inter, mbx, mby, n_mbx)
    if b is None and c is None and a is not None:
        return a[0]
    matches = [n for n in (a, b, c) if n is not None and n[1] == 0]
    if len(matches) == 1:
        return matches[0][0]
    vals = [(n[0] if n is not None else (0, 0)) for n in (a, b, c)]
    med = tuple(sorted(v[k] for v in vals)[1] for k in range(2))
    return med


def skip_mv_dec(mvs, inter, mbx, mby, n_mbx):
    """Spec 8.4.1.1 P_Skip MV (decoder semantics)."""
    a, b, c = _mv_neighbors_dec(mvs, inter, mbx, mby, n_mbx)
    if a is None or b is None:
        return (0, 0)
    if a[1] == 0 and a[0] == (0, 0):
        return (0, 0)
    if b[1] == 0 and b[0] == (0, 0):
        return (0, 0)
    return mv_pred_dec(mvs, inter, mbx, mby, n_mbx)


# -- general decoder-side P parse (8x8-grid state, multi-ref) ------------
# MV prediction lives in .mvpred (spec 8.4.1.3, refIdx-aware, shared
# with the CABAC parser and B slices).

def set_part(ctx, by, bx, pw, ph, ref, mv, lst=0):
    """Record one partition's (refIdx, mv) over its 8x8-block footprint
    and mark the blocks decoded."""
    sfx = "_l0" if lst == 0 else "_l1"
    ctx["mv8" + sfx][by:by + ph, bx:bx + pw] = mv
    ctx["ref8" + sfx][by:by + ph, bx:bx + pw] = ref
    ctx["dec8"][by:by + ph, bx:bx + pw] = True


def read_ref_idx(br, n_active: int) -> int:
    """ref_idx_lX as te(v): single bit inverted when two refs are
    active, ue(v) beyond (9.1.1)."""
    if n_active <= 1:
        return 0
    if n_active == 2:
        return 1 - br.u(1)
    return br.ue()


def decode_pskip(dec, ctx, mbx, mby):
    """Parse-time half of a skipped MB: derive the skip MV (refIdx 0)
    and zero the nC context. Recon is deferred (order-independent)."""
    from . import mvpred
    sp = ctx["sp"]
    mv = mvpred.p_skip_mv(ctx["mv8_l0"], ctx["ref8_l0"], ctx["dec8"],
                          mby, mbx, 2 * sp.mb_width)
    set_part(ctx, 2 * mby, 2 * mbx, 2, 2, 0, mv)
    ctx["mvs"][mby, mbx] = mv
    ctx["mv_valid"][mby, mbx] = True
    ctx["qp_mb"][mby, mbx] = ctx["cur_qp"]
    ctx["nz_y"].nz[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 0
    ctx["nz_cb"].nz[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0
    ctx["nz_cr"].nz[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0


# (pw, ph, part positions) per P mb_type 0..2 on the 8x8 grid
_P_PARTS = {
    0: ((0, 0, 2, 2),),                        # P_L0_16x16
    1: ((0, 0, 2, 1), (1, 0, 2, 1)),           # P_L0_L0_16x8
    2: ((0, 0, 1, 2), (0, 1, 1, 2)),           # P_L0_L0_8x16
}


def decode_inter_mb(dec, ctx, mbx, mby, mb_type):
    """Parse-time half of a P macroblock (any partitioning down to 8x8,
    multi-reference): ref_idx + MVD + residual levels into the per-frame
    defer arrays; recon happens vectorized in inter_recon."""
    from . import mvpred
    from .decoder import DecodeError
    br = ctx["br"]
    sp = ctx["sp"]
    pp = ctx["pp"]
    nbx2 = 2 * sp.mb_width
    st = (ctx["mv8_l0"], ctx["ref8_l0"], ctx["dec8"])
    n0 = ctx.get("n_ref0", 1)
    by0, bx0 = 2 * mby, 2 * mbx
    if mb_type in (3, 4):                     # P_8x8 / P_8x8ref0
        for _ in range(4):
            sub = br.ue()
            if sub != 0:
                raise DecodeError(f"sub_mb_type {sub} (sub-8x8 "
                                  "partitions) unsupported")
        refs = [0] * 4
        if mb_type == 3:
            refs = [read_ref_idx(br, n0) for _ in range(4)]
        for q in range(4):
            by, bx = by0 + (q >> 1), bx0 + (q & 1)
            mvd_x, mvd_y = br.se(), br.se()
            pred = mvpred.mv_pred(*st, by, bx, 1, 1, refs[q], nbx2)
            set_part(ctx, by, bx, 1, 1, refs[q],
                     (pred[0] + mvd_x, pred[1] + mvd_y))
    elif mb_type in _P_PARTS:
        parts = _P_PARTS[mb_type]
        refs = [read_ref_idx(br, n0) for _ in parts]
        for i, (dy, dx, pw, ph) in enumerate(parts):
            mvd_x, mvd_y = br.se(), br.se()
            pred = mvpred.mv_pred(*st, by0 + dy, bx0 + dx, pw, ph,
                                  refs[i], nbx2, part_idx=i)
            set_part(ctx, by0 + dy, bx0 + dx, pw, ph, refs[i],
                     (pred[0] + mvd_x, pred[1] + mvd_y))
    else:
        raise DecodeError(f"P mb_type {mb_type} unsupported")
    ctx["mvs"][mby, mbx] = ctx["mv8_l0"][by0, bx0]
    ctx["mv_valid"][mby, mbx] = True
    code = br.ue()
    cbp = CBP_TABLE[code][1]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    t8 = False
    if cbp_luma and pp.transform_8x8:
        t8 = bool(br.u(1))                    # transform_size_8x8_flag
        if "p_t8" in ctx:
            ctx["p_t8"][mby, mbx] = t8
    if cbp:
        delta = br.se()
        ctx["cur_qp"] = (ctx["cur_qp"] + delta + 52) % 52
    ctx["qp_mb"][mby, mbx] = ctx["cur_qp"]
    parse_inter_residual_cavlc(ctx, mbx, mby, cbp_luma, cbp_chroma, t8)


def parse_inter_residual_cavlc(ctx, mbx, mby, cbp_luma, cbp_chroma, t8):
    """CAVLC residual of one inter MB into the defer arrays (shared by
    P and B slices)."""
    br = ctx["br"]
    z_luma = ctx["p_z_luma"][mby, mbx]
    nz_y = ctx["nz_y"]
    if t8:
        # CAVLC 8x8 transport (spec 8.5.6): four interleaved 4x4 blocks
        # per 8x8; sub-block k carries scan positions 4*i + k. Each is a
        # normal CAVLC block at its 4x4 position (nC context included);
        # the merged 64-scan lands in z_luma rows 4*b8..4*b8+4.
        for b8 in range(4):
            subs = np.zeros((4, 16), np.int64)
            for k in range(4):
                blk = 4 * b8 + k
                oy = int(LUMA_BLK_ORDER[blk, 0])
                ox = int(LUMA_BLK_ORDER[blk, 1])
                by, bx = 4 * mby + oy, 4 * mbx + ox
                total = 0
                if cbp_luma & (1 << b8):
                    coeffs = decode_residual_block(br, nz_y.nc(by, bx), 16)
                    subs[k] = coeffs
                    total = int(np.count_nonzero(coeffs))
                nz_y.nz[by, bx] = total
            scan64 = subs.T.reshape(64)       # scan[4*i + k] = subs[k][i]
            z_luma[4 * b8:4 * b8 + 4] = scan64.reshape(4, 16)
    else:
        for blk in range(16):
            oy, ox = int(LUMA_BLK_ORDER[blk, 0]), int(LUMA_BLK_ORDER[blk, 1])
            by, bx = 4 * mby + oy, 4 * mbx + ox
            total = 0
            if cbp_luma & (1 << (blk // 4)):
                coeffs = decode_residual_block(br, nz_y.nc(by, bx), 16)
                z_luma[blk] = coeffs
                total = int(np.count_nonzero(coeffs))
            nz_y.nz[by, bx] = total
    cdc = ctx["p_cdc"][mby, mbx]
    cac = ctx["p_cac"][mby, mbx]
    if cbp_chroma:
        for c in range(2):
            cdc[c] = decode_residual_block(br, -1, 4)
    for c, nzc in ((0, ctx["nz_cb"]), (1, ctx["nz_cr"])):
        for blk in range(4):
            oy, ox = int(CHROMA_BLK_ORDER[blk, 0]), int(CHROMA_BLK_ORDER[blk, 1])
            by, bx = 2 * mby + oy, 2 * mbx + ox
            total = 0
            if cbp_chroma == 2:
                coeffs = decode_residual_block(br, nzc.nc(by, bx), 15)
                cac[c, blk, 1:] = coeffs
                total = int(np.count_nonzero(coeffs))
            nzc.nz[by, bx] = total


# raster (oy, ox) grid → coding-order block index, for scattering batched
# residuals back into plane layout
_BLK_GRID = np.zeros((4, 4), np.int64)
_BLK_GRID[LUMA_BLK_ORDER[:, 0], LUMA_BLK_ORDER[:, 1]] = np.arange(16)
