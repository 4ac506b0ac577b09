"""B-frame host entropy + decoder halves.

Replaces the reference's ffmpeg/NVENC B-frame coding (libx264 medium
defaults to bframes=3 — ref internal/config/config.go:49): B pictures
between P anchors, one reference per list (L0 = past anchor, L1 =
future anchor), mb types B_L0_16x16 / B_L1_16x16 / B_Bi_16x16 with
explicit MVs, non-reference (nal_ref_idc 0). Stream conventions match
libx264's (Main profile, poc_type 0 with poc = 2*display index,
non-ref frame_num = PrevRefFrameNum + 1, direct_spatial_mv_pred = 1).

Device math lives in gop_ops.encode_bframe; CABAC syntax in
cabac_syntax.write_bslice_cabac / parse_bslice_cabac. MV prediction is
per reference list with spec availability semantics (8.4.1.3: an MB
not using list X is available with refIdxLX -1), shared encoder/decoder
via pframe.mv_pred_dec.
"""

from __future__ import annotations

import numpy as np

from ...ops import transform as tf
from ...utils.bitstream import BitWriter, nal_unit
from . import headers as H
from .cavlc import decode_residual_block
from .entropy import CHROMA_BLK_ORDER, NzContext
from .frame_ops import LUMA_BLK_ORDER
from .pframe import (_mc_luma_np, _mv_neighbors_dec, _write_p_residual,
                     mv_pred_dec)
from .tables import CBP_INTER_TO_CODE, CBP_TABLE

# CAVLC ue(v) mb_type values (Table 7-14): direct=0, L0=1, L1=2, Bi=3
_B_MBTYPE_FROM_MODE = (1, 2, 3)


def direct_spatial(mvs0, mvs1, use0, use1, mbx, mby, n_mbx, col_zero):
    """Spatial-direct motion for one MB (8.4.1.2.2, MB-level).

    Exact for this framework's streams: P anchors carry one MV per MB,
    so the four direct_8x8_inference corner blocks all land in ONE
    colocated MB and share colZeroFlag — the 8x8-partition derivation
    collapses to MB level. Returns (use_l0, use_l1, mv0, mv1) with mv
    None for an unused list; shared by encoder and decoder (and used by
    the decoder for B_Skip reconstruction).

    ``col_zero``: colZeroFlag of the colocated MB in RefPicList1[0]
    (refIdxCol==0 and both |mv| <= 1 quarter-pel).
    """
    a0, b0, c0 = _mv_neighbors_dec(mvs0, use0, mbx, mby, n_mbx)
    a1, b1, c1 = _mv_neighbors_dec(mvs1, use1, mbx, mby, n_mbx)
    r0 = 0 if any(n is not None and n[1] == 0 for n in (a0, b0, c0)) else -1
    r1 = 0 if any(n is not None and n[1] == 0 for n in (a1, b1, c1)) else -1
    if r0 < 0 and r1 < 0:
        # directZeroPredictionFlag: both refs 0, both MVs zero
        return True, True, (0, 0), (0, 0)
    mv0 = mv1 = None
    if r0 >= 0:
        mv0 = (0, 0) if col_zero \
            else mv_pred_dec(mvs0, use0, mbx, mby, n_mbx)
    if r1 >= 0:
        mv1 = (0, 0) if col_zero \
            else mv_pred_dec(mvs1, use1, mbx, mby, n_mbx)
    return r0 >= 0, r1 >= 0, mv0, mv1


def _mode_of(use_l0: bool, use_l1: bool) -> int:
    return 2 if (use_l0 and use_l1) else (1 if use_l1 else 0)


def write_bslice(sp: H.SeqParams, pp: H.PicParams, *, frame_num: int,
                 qp: int, data: dict, deblock: bool = False,
                 cabac: bool = False, poc_lsb: int = 0) -> bytes:
    """B slice NAL. data: mv0/mv1 (nMBy, nMBx, 2) [dy, dx] quarter-pel,
    mode (nMBy, nMBx) with 0=L0 / 1=L1 / 2=Bi, level arrays as for P."""
    if cabac:
        assert pp.cabac, "pp.cabac must match the slice entropy mode"
        from .cabac_syntax import write_bslice_cabac
        return write_bslice_cabac(sp, pp, frame_num=frame_num, qp=qp,
                                  data=data, deblock=deblock,
                                  poc_lsb=poc_lsb)
    return _write_bslice_py(sp, pp, frame_num=frame_num, qp=qp, data=data,
                            deblock=deblock, poc_lsb=poc_lsb)


def _write_bslice_py(sp: H.SeqParams, pp: H.PicParams, *, frame_num: int,
                     qp: int, data: dict, deblock: bool = False,
                     poc_lsb: int = 0) -> bytes:
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    bw = BitWriter()
    H.write_slice_header(bw, sp, pp, is_idr=False, frame_num=frame_num,
                         slice_qp=qp, disable_deblocking=not deblock,
                         slice_type="B", poc_lsb=poc_lsb, is_ref=False)

    mode = np.asarray(data["mode"])
    mvs_xy = []
    for k in ("mv0", "mv1"):
        mv = np.asarray(data[k])
        mvs_xy.append(np.stack([mv[..., 1], mv[..., 0]], axis=-1))
    use = [mode != 1, mode != 0]
    luma = np.asarray(data["luma"])
    cb_dc, cb_ac = np.asarray(data["cb_dc"]), np.asarray(data["cb_ac"])
    cr_dc, cr_ac = np.asarray(data["cr_dc"]), np.asarray(data["cr_ac"])

    nz_y = NzContext(4 * n_mby, 4 * n_mbx)
    nz_cb = NzContext(2 * n_mby, 2 * n_mbx)
    nz_cr = NzContext(2 * n_mby, 2 * n_mbx)

    luma_nz = np.any(luma != 0, axis=-1)
    quad_nz = luma_nz.reshape(n_mby, n_mbx, 4, 4).any(axis=-1)
    cbp_luma = (quad_nz * np.array([1, 2, 4, 8])).sum(axis=-1)
    any_cac = np.any(cb_ac[..., 1:] != 0, axis=(-1, -2)) | \
        np.any(cr_ac[..., 1:] != 0, axis=(-1, -2))
    any_cdc = np.any(cb_dc != 0, axis=-1) | np.any(cr_dc != 0, axis=-1)
    cbp_chroma = np.where(any_cac, 2, np.where(any_cdc, 1, 0))

    col_zero = np.asarray(data["col_zero"]) if "col_zero" in data \
        else np.zeros((n_mby, n_mbx), bool)
    # colZero uniformity over the colocated MB's four 8x8 blocks: with a
    # P_8x8 anchor the spec's per-block direct derivation can diverge
    # inside one MB, so B_Skip is only emitted where it cannot (the
    # MB-level direct_spatial is then exact)
    col_safe = np.asarray(data["col_safe"]) if "col_safe" in data \
        else np.ones((n_mby, n_mbx), bool)
    skip_run = 0
    for mby in range(n_mby):
        for mbx in range(n_mbx):
            md = int(mode[mby, mbx])
            cbp = int(cbp_luma[mby, mbx]) | (int(cbp_chroma[mby, mbx]) << 4)
            if cbp == 0 and col_safe[mby, mbx] \
                    and _skippable(mvs_xy, use, mbx, mby, n_mbx,
                                   bool(col_zero[mby, mbx]), md):
                skip_run += 1
                _zero_nz(nz_y, nz_cb, nz_cr, mbx, mby)
                continue
            bw.ue(skip_run)                 # mb_skip_run
            skip_run = 0
            bw.ue(_B_MBTYPE_FROM_MODE[md])
            for lst in range(2):
                if not use[lst][mby, mbx]:
                    continue
                m = (int(mvs_xy[lst][mby, mbx, 0]),
                     int(mvs_xy[lst][mby, mbx, 1]))
                pred = mv_pred_dec(mvs_xy[lst], use[lst], mbx, mby, n_mbx)
                bw.se(m[0] - pred[0])
                bw.se(m[1] - pred[1])
            bw.ue(CBP_INTER_TO_CODE[cbp])
            if cbp:
                bw.se(0)                    # mb_qp_delta
            _write_p_residual(bw, mbx, mby, cbp,
                              luma[mby, mbx],
                              (cb_dc[mby, mbx], cr_dc[mby, mbx]),
                              (cb_ac[mby, mbx], cr_ac[mby, mbx]),
                              nz_y, nz_cb, nz_cr)
    if skip_run:
        bw.ue(skip_run)
    bw.rbsp_trailing_bits()
    return nal_unit(H.NAL_SLICE_NONIDR, bw.to_bytes(), nal_ref_idc=0)


def _skippable(mvs_xy, use, mbx, mby, n_mbx, col_zero, md) -> bool:
    """A residual-free MB is a B_Skip iff the spatial-direct derivation
    reproduces the device step's mode and MVs exactly (then the coded
    stream and the device recon agree by construction)."""
    u0, u1, dmv0, dmv1 = direct_spatial(
        mvs_xy[0], mvs_xy[1], use[0], use[1], mbx, mby, n_mbx, col_zero)
    if _mode_of(u0, u1) != md:
        return False
    if u0 and tuple(dmv0) != (int(mvs_xy[0][mby, mbx, 0]),
                              int(mvs_xy[0][mby, mbx, 1])):
        return False
    if u1 and tuple(dmv1) != (int(mvs_xy[1][mby, mbx, 0]),
                              int(mvs_xy[1][mby, mbx, 1])):
        return False
    return True


def _zero_nz(nz_y, nz_cb, nz_cr, mbx, mby):
    nz_y.nz[4 * mby:4 * mby + 4, 4 * mbx:4 * mbx + 4] = 0
    nz_cb.nz[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0
    nz_cr.nz[2 * mby:2 * mby + 2, 2 * mbx:2 * mbx + 2] = 0


# ---------------------------------------------------------------------------
# Decoder halves
# ---------------------------------------------------------------------------

def decode_b_skip(ctx, mbx, mby) -> None:
    """Parse-time half of a B_Skip MB: spatial-direct motion, zero
    residual. Recon is deferred to recon_b_frame."""
    sp = ctx["sp"]
    u0, u1, mv0, mv1 = direct_spatial(
        ctx["mvs0"], ctx["mvs1"], ctx["use0"], ctx["use1"],
        mbx, mby, sp.mb_width, bool(ctx["col_zero"][mby, mbx]))
    ctx["b_mode"][mby, mbx] = _mode_of(u0, u1)
    if u0:
        ctx["mvs0"][mby, mbx] = mv0
        ctx["use0"][mby, mbx] = True
    if u1:
        ctx["mvs1"][mby, mbx] = mv1
        ctx["use1"][mby, mbx] = True
    _zero_nz(ctx["nz_y"], ctx["nz_cb"], ctx["nz_cr"], mbx, mby)


def decode_b_mb_cavlc(ctx, mbx, mby, mb_type) -> None:
    """Parse one CAVLC B MB (mb_type 1..3) into the defer arrays."""
    from .decoder import DecodeError
    if mb_type not in (1, 2, 3):
        raise DecodeError(f"B mb_type {mb_type} unsupported")
    br = ctx["br"]
    sp = ctx["sp"]
    mode = {1: 0, 2: 1, 3: 2}[mb_type]
    ctx["b_mode"][mby, mbx] = mode
    for lst in range(2):
        if (mode == 1 and lst == 0) or (mode == 0 and lst == 1):
            continue
        mvd_x, mvd_y = br.se(), br.se()
        mvs, use = ctx[f"mvs{lst}"], ctx[f"use{lst}"]
        pred = mv_pred_dec(mvs, use, mbx, mby, sp.mb_width)
        mvs[mby, mbx] = (pred[0] + mvd_x, pred[1] + mvd_y)
        use[mby, mbx] = True
    code = br.ue()
    cbp = CBP_TABLE[code][1]
    if cbp and br.se():
        raise DecodeError("per-MB qp_delta in B slices unsupported")

    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    z_luma = ctx["p_z_luma"][mby, mbx]
    nz_y = ctx["nz_y"]
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


def _pred_frame_np(ref, mvs, used, h, w):
    """Full-frame luma MC for one list: vectorized full-pel gather with
    per-MB sub-pel fallback (mirrors recon_p_frame)."""
    mvx, mvy = mvs[..., 0], mvs[..., 1]
    dyf = np.repeat(np.repeat(mvy >> 2, 16, 0), 16, 1)
    dxf = np.repeat(np.repeat(mvx >> 2, 16, 0), 16, 1)
    rows = np.clip(np.arange(h)[:, None] + dyf, 0, h - 1)
    cols = np.clip(np.arange(w)[None, :] + dxf, 0, w - 1)
    pred = ref[rows, cols].astype(np.int64)
    for mby, mbx in np.argwhere(used & (((mvx | mvy) & 3) != 0)):
        pred[16 * mby:16 * mby + 16, 16 * mbx:16 * mbx + 16] = \
            _mc_luma_np(ref, 16 * mby, 16 * mbx,
                        int(mvy[mby, mbx]), int(mvx[mby, mbx]))
    return pred


def _pred_chroma_np(refc, mvs, hc, wc):
    mvx, mvy = mvs[..., 0], mvs[..., 1]
    dy8 = np.repeat(np.repeat(mvy >> 3, 8, 0), 8, 1)
    dx8 = np.repeat(np.repeat(mvx >> 3, 8, 0), 8, 1)
    fy8 = np.repeat(np.repeat(mvy & 7, 8, 0), 8, 1)
    fx8 = np.repeat(np.repeat(mvx & 7, 8, 0), 8, 1)
    base_r = np.arange(hc)[:, None] + dy8
    base_c = np.arange(wc)[None, :] + dx8
    r0 = np.clip(base_r, 0, hc - 1)
    r1 = np.clip(base_r + 1, 0, hc - 1)
    c0 = np.clip(base_c, 0, wc - 1)
    c1 = np.clip(base_c + 1, 0, wc - 1)
    a = refc[r0, c0].astype(np.int64)
    b = refc[r0, c1].astype(np.int64)
    cc = refc[r1, c0].astype(np.int64)
    d = refc[r1, c1].astype(np.int64)
    return ((8 - fx8) * (8 - fy8) * a + fx8 * (8 - fy8) * b
            + (8 - fx8) * fy8 * cc + fx8 * fy8 * d + 32) >> 6


def recon_b_frame(ctx, ref0, ref1) -> None:
    """Vectorized reconstruction of a whole B frame: per-list MC, per-MB
    L0/L1/Bi select, batched residual add (all MBs are inter)."""
    from .tables import ZIGZAG_4x4
    zz = np.asarray(ZIGZAG_4x4)

    y, u, v = ctx["y"], ctx["u"], ctx["v"]
    qp = ctx["qp"]
    qpc = tf.chroma_qp(qp, ctx["pp"].chroma_qp_index_offset)
    mode = ctx["b_mode"]
    n_mby, n_mbx = mode.shape
    h, w = y.shape
    hc, wc = u.shape

    p0 = _pred_frame_np(ref0[0], ctx["mvs0"], ctx["use0"], h, w)
    p1 = _pred_frame_np(ref1[0], ctx["mvs1"], ctx["use1"], h, w)
    mode_px = np.repeat(np.repeat(mode, 16, 0), 16, 1)
    pred = np.where(mode_px == 0, p0,
                    np.where(mode_px == 1, p1, (p0 + p1 + 1) >> 1))

    z = ctx["p_z_luma"]
    wq_flat = np.zeros_like(z)
    wq_flat[..., zz] = z
    res = tf.idct4_np(tf.dequant4_np(
        wq_flat.reshape(n_mby, n_mbx, 16, 4, 4), qp))
    from .pframe import _BLK_GRID
    res_plane = res[:, :, _BLK_GRID].transpose(0, 2, 4, 1, 3, 5) \
        .reshape(h, w)
    y[:, :] = np.clip(pred + res_plane, 0, 255)

    mode_c = np.repeat(np.repeat(mode, 8, 0), 8, 1)
    for ci, (plane, r0c, r1c) in enumerate(
            ((u, ref0[1], ref1[1]), (v, ref0[2], ref1[2]))):
        pc0 = _pred_chroma_np(r0c, ctx["mvs0"], hc, wc)
        pc1 = _pred_chroma_np(r1c, ctx["mvs1"], hc, wc)
        predc = np.where(mode_c == 0, pc0,
                         np.where(mode_c == 1, pc1, (pc0 + pc1 + 1) >> 1))
        dc_rec = tf.dequant_dc2_np(
            ctx["p_cdc"][:, :, ci].reshape(n_mby, n_mbx, 2, 2), qpc)
        cac = ctx["p_cac"][:, :, ci]
        wc_flat = np.zeros_like(cac)
        wc_flat[..., zz] = cac
        wcq = tf.dequant4_np(wc_flat.reshape(n_mby, n_mbx, 4, 4, 4), qpc)
        wcq[..., 0, 0] = dc_rec.reshape(n_mby, n_mbx, 4)
        resc = tf.idct4_np(wcq)
        resc_plane = resc.reshape(n_mby, n_mbx, 2, 2, 4, 4) \
            .transpose(0, 2, 4, 1, 3, 5).reshape(hc, wc)
        plane[:, :] = np.clip(predc + resc_plane, 0, 255)
