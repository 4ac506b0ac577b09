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
        from ... import native
        lib = native.get_lib()
        if lib is not None and hasattr(lib, "vcp_write_bslice_cabac"):
            return _write_bslice_cabac_native(
                lib, sp, pp, frame_num=frame_num, qp=qp, data=data,
                deblock=deblock, poc_lsb=poc_lsb)
        from .cabac_syntax import write_bslice_cabac
        return write_bslice_cabac(sp, pp, frame_num=frame_num, qp=qp,
                                  data=data, deblock=deblock,
                                  poc_lsb=poc_lsb)
    return _write_bslice_py(sp, pp, frame_num=frame_num, qp=qp, data=data,
                            deblock=deblock, poc_lsb=poc_lsb)


def _write_bslice_cabac_native(lib, sp, pp, *, frame_num, qp, data,
                               deblock=False, poc_lsb=0) -> bytes:
    """CABAC B slice through the C++ writer (native/cabac.cpp
    vcp_write_bslice_cabac) — bit-identical to
    cabac_syntax.write_bslice_cabac (pinned by test_native_entropy)."""
    import ctypes

    from .entropy import _nal_from_rbsp_native
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    mode = np.ascontiguousarray(data["mode"], np.int32)
    mvs = []
    for k in ("mv0", "mv1"):
        mv = np.asarray(data[k])
        mvs.append(np.ascontiguousarray(
            np.stack([mv[..., 1], mv[..., 0]], axis=-1), np.int32))
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma", "cb_dc", "cb_ac", "cr_dc", "cr_ac")]
    col_zero = np.ascontiguousarray(
        data.get("col_zero", np.zeros((n_mby, n_mbx), bool)), np.uint8)
    col_safe = np.ascontiguousarray(
        data.get("col_safe", np.ones((n_mby, n_mbx), bool)), np.uint8)
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.vcp_write_bslice_cabac(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num, frame_num,
        0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        1 if pp.transform_8x8 else 0,
        mvs[0].ctypes.data_as(i32p), mvs[1].ctypes.data_as(i32p),
        mode.ctypes.data_as(i32p),
        col_zero.ctypes.data_as(u8p), col_safe.ctypes.data_as(u8p),
        *[a.ctypes.data_as(i32p) for a in arrs],
        out.ctypes.data_as(u8p), cap)
    if n < 0:
        raise RuntimeError("native cabac bslice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_NONIDR, 0)


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
            direct_ok = bool(col_safe[mby, mbx]) \
                and _skippable(mvs_xy, use, mbx, mby, n_mbx,
                               bool(col_zero[mby, mbx]), md)
            if cbp == 0 and direct_ok:
                skip_run += 1
                _zero_nz(nz_y, nz_cb, nz_cr, mbx, mby)
                continue
            bw.ue(skip_run)                 # mb_skip_run
            skip_run = 0
            if direct_ok:
                bw.ue(0)                    # B_Direct_16x16: motion is
            else:                           # derived, no ref/mvd syntax
                bw.ue(_B_MBTYPE_FROM_MODE[md])
                for lst in range(2):
                    if not use[lst][mby, mbx]:
                        continue
                    m = (int(mvs_xy[lst][mby, mbx, 0]),
                         int(mvs_xy[lst][mby, mbx, 1]))
                    pred = mv_pred_dec(mvs_xy[lst], use[lst], mbx, mby,
                                       n_mbx)
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

# Table 7-14 two-partition B mb_types 4..21: (vertical split?, mode0,
# mode1) with modes as list-usage masks bit0=L0, bit1=L1
_B_TWO_PART = [
    (False, 1, 1), (True, 1, 1),     # B_L0_L0_16x8 / 8x16
    (False, 2, 2), (True, 2, 2),     # B_L1_L1
    (False, 1, 2), (True, 1, 2),     # B_L0_L1
    (False, 2, 1), (True, 2, 1),     # B_L1_L0
    (False, 1, 3), (True, 1, 3),     # B_L0_Bi
    (False, 2, 3), (True, 2, 3),     # B_L1_Bi
    (False, 3, 1), (True, 3, 1),     # B_Bi_L0
    (False, 3, 2), (True, 3, 2),     # B_Bi_L1
    (False, 3, 3), (True, 3, 3),     # B_Bi_Bi
]
# Table 7-18 B sub_mb_type 0..3 (sub-8x8 shapes 4..12 unsupported):
# list-usage mask; 0 = B_Direct_8x8
_B_SUB_MODE = (0, 1, 2, 3)


def b_direct_mb(ctx, mbx, mby, blocks=(0, 1, 2, 3)):
    """Spatial direct motion (8.4.1.2.2) for the given 8x8 blocks of one
    MB: MB-level refIdx/MV derivation + per-block colZero override from
    the colocated picture (RefPicList1[0], direct_8x8_inference
    granularity). Assigns the blocks' per-list state."""
    from . import mvpred
    from .pframe import set_part
    sp = ctx["sp"]
    nbx2 = 2 * sp.mb_width
    st0 = (ctx["mv8_l0"], ctx["ref8_l0"], ctx["dec8"])
    st1 = (ctx["mv8_l1"], ctx["ref8_l1"], ctx["dec8"])
    ref0, ref1, mv0, mv1, zero = mvpred.direct_spatial_refs(
        st0, st1, mby, mbx, nbx2)
    col = ctx.get("col")
    for q in blocks:
        by, bx = 2 * mby + (q >> 1), 2 * mbx + (q & 1)
        m0, m1 = mv0, mv1
        if not zero and col is not None and col.col_ref0 is not None:
            colzero = (bool(col.col_ref0[by, bx])
                       and abs(int(col.col_mv8[by, bx, 0])) <= 1
                       and abs(int(col.col_mv8[by, bx, 1])) <= 1)
            if colzero:
                if ref0 == 0:
                    m0 = (0, 0)
                if ref1 == 0:
                    m1 = (0, 0)
        if ref0 >= 0:
            set_part(ctx, by, bx, 1, 1, ref0, m0, lst=0)
        if ref1 >= 0:
            set_part(ctx, by, bx, 1, 1, ref1, m1, lst=1)
        ctx["dec8"][by, bx] = True
    ctx["mv_valid"][mby, mbx] = True


def decode_b_skip(ctx, mbx, mby) -> None:
    """Parse-time half of a B_Skip MB: spatial-direct motion, zero
    residual. Recon is deferred (order-independent)."""
    b_direct_mb(ctx, mbx, mby)
    ctx["qp_mb"][mby, mbx] = ctx["cur_qp"]
    _zero_nz(ctx["nz_y"], ctx["nz_cb"], ctx["nz_cr"], mbx, mby)


def decode_b_mb_cavlc(ctx, mbx, mby, mb_type) -> None:
    """Parse one CAVLC B MB (full Table 7-14 incl. B_8x8 with 8x8 subs,
    multi-reference, per-MB qp_delta) into the defer arrays."""
    from . import mvpred
    from .decoder import DecodeError
    from .pframe import parse_inter_residual_cavlc, read_ref_idx, set_part
    br = ctx["br"]
    sp = ctx["sp"]
    pp = ctx["pp"]
    nbx2 = 2 * sp.mb_width
    st = ((ctx["mv8_l0"], ctx["ref8_l0"], ctx["dec8"]),
          (ctx["mv8_l1"], ctx["ref8_l1"], ctx["dec8"]))
    n_act = (ctx.get("n_ref0", 1), ctx.get("n_ref1", 1))
    by0, bx0 = 2 * mby, 2 * mbx
    if mb_type == 0:                          # B_Direct_16x16
        b_direct_mb(ctx, mbx, mby)
        parts = []
    elif mb_type <= 3:                        # 16x16 L0/L1/Bi
        parts = [((by0, bx0, 2, 2, 0), mb_type)]
    elif mb_type <= 21:
        vert, m0, m1 = _B_TWO_PART[mb_type - 4]
        if vert:
            parts = [((by0, bx0, 1, 2, 0), m0), ((by0, bx0 + 1, 1, 2, 1), m1)]
        else:
            parts = [((by0, bx0, 2, 1, 0), m0), ((by0 + 1, bx0, 2, 1, 1), m1)]
    elif mb_type == 22:                       # B_8x8
        subs = []
        for q in range(4):
            s = br.ue()
            if s > 3:
                raise DecodeError(f"B sub_mb_type {s} (sub-8x8) "
                                  "unsupported")
            subs.append(s)
        parts = []
        for q, s in enumerate(subs):
            by, bx = by0 + (q >> 1), bx0 + (q & 1)
            if s == 0:
                b_direct_mb(ctx, mbx, mby, blocks=(q,))
            else:
                parts.append(((by, bx, 1, 1, q), _B_SUB_MODE[s]))
    else:
        raise DecodeError(f"B mb_type {mb_type} unsupported")

    if mb_type != 0:
        # syntax order (7.3.5.1): all ref_idx_l0, all ref_idx_l1, all
        # mvd_l0, all mvd_l1 — prediction/assignment happens per
        # partition in that per-list order
        refs = [[None, None] for _ in parts]
        for lst in range(2):
            for i, ((by, bx, pw, ph, pi), mode) in enumerate(parts):
                if mode & (1 << lst):
                    refs[i][lst] = read_ref_idx(br, n_act[lst])
        for lst in range(2):
            for i, ((by, bx, pw, ph, pi), mode) in enumerate(parts):
                if not mode & (1 << lst):
                    continue
                mvd_x, mvd_y = br.se(), br.se()
                pred = mvpred.mv_pred(*st[lst], by, bx, pw, ph,
                                      refs[i][lst], nbx2, part_idx=pi)
                set_part(ctx, by, bx, pw, ph, refs[i][lst],
                         (pred[0] + mvd_x, pred[1] + mvd_y), lst=lst)
        ctx["mv_valid"][mby, mbx] = True

    code = br.ue()
    cbp = CBP_TABLE[code][1]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    t8 = False
    # transform_size_8x8_flag presence (7.3.5): every partition >= 8x8
    # here by construction; direct MBs qualify via 8x8 inference
    if cbp_luma and pp.transform_8x8:
        t8 = bool(br.u(1))                    # transform_size_8x8_flag
        if "p_t8" in ctx:
            ctx["p_t8"][mby, mbx] = t8
    if cbp:
        delta = br.se()
        ctx["cur_qp"] = (ctx["cur_qp"] + delta + 52) % 52
    ctx["qp_mb"][mby, mbx] = ctx["cur_qp"]
    parse_inter_residual_cavlc(ctx, mbx, mby, cbp_luma, cbp_chroma, t8)
