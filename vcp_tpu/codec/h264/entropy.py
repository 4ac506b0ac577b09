"""Host entropy coding: macroblock-layer CAVLC slice writer (Python).

Semantic reference for the C++ fast path in ``vcp_tpu.native``. Consumes
the device pipeline's zig-zag level arrays (vcp_tpu.codec.h264.frame_ops)
and emits one complete slice NAL per frame.

Syntax per ITU-T H.264 7.3.5 (macroblock_layer), 7.4.5, 9.1-9.2.
"""

from __future__ import annotations

import numpy as np

from ...utils.bitstream import BitWriter, nal_unit
from . import headers as H
from .cavlc import encode_residual_block
from .tables import CBP_INTRA_TO_CODE, CBP_INTER_TO_CODE
from .frame_ops import LUMA_BLK_ORDER

# Chroma 4x4 block raster offsets within the MB (y, x) in 4-pel units.
CHROMA_BLK_ORDER = np.array([(0, 0), (0, 1), (1, 0), (1, 1)], dtype=np.int32)

MB_TYPE_I_PCM = 25


class NzContext:
    """Per-4x4-block TotalCoeff context for nC prediction (spec 9.2.1)."""

    def __init__(self, blocks_h: int, blocks_w: int):
        self.nz = np.full((blocks_h, blocks_w), -1, np.int16)

    def set(self, by: int, bx: int, total: int) -> None:
        self.nz[by, bx] = total

    def nc(self, by: int, bx: int) -> int:
        na = self.nz[by, bx - 1] if bx > 0 else -1
        nb = self.nz[by - 1, bx] if by > 0 else -1
        a_ok, b_ok = na >= 0, nb >= 0
        if a_ok and b_ok:
            return (int(na) + int(nb) + 1) >> 1
        if a_ok:
            return int(na)
        if b_ok:
            return int(nb)
        return 0


def _mb_i16_type(pred_mode: int, cbp_chroma: int, cbp_luma15: bool) -> int:
    return 1 + pred_mode + 4 * cbp_chroma + 12 * (1 if cbp_luma15 else 0)


def _nal_from_rbsp_native(lib, rbsp_buf, rbsp_len: int, nal_type: int,
                          nal_ref_idc: int) -> bytes:
    import ctypes
    out = np.empty(rbsp_len + rbsp_len // 2 + 16, np.uint8)
    n = lib.vcp_escape(
        rbsp_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rbsp_len, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return (b"\x00\x00\x01" + bytes([(nal_ref_idc << 5) | nal_type])
            + out[:n].tobytes())


def write_islice(sp: H.SeqParams, pp: H.PicParams, *, frame_num: int,
                 idr_pic_id: int, qp: int, data: dict,
                 src_y: np.ndarray, src_u: np.ndarray,
                 src_v: np.ndarray, deblock: bool = False,
                 cabac: bool = False, poc_lsb: int = 0) -> bytes:
    """Encode one IDR slice NAL. MB row 0 = I16x16-DC; rows 1.. = I16x16-V.

    Uses the C++ engine when available (bit-identical to the Python path,
    asserted by tests); falls back to Python. ``cabac=True`` routes to
    the CABAC syntax layer (requires pp.cabac; Python host path)."""
    from ... import native
    lib = native.get_lib()
    has_i8 = data.get("i8") is not None and bool(np.any(data["i8"]))
    if cabac:
        assert pp.cabac, "pp.cabac must match the slice entropy mode"
        if lib is not None and has_i8 \
                and hasattr(lib, "vcp_write_islice_cabac_i8"):
            return _write_islice_cabac_i8_native(
                lib, sp, pp, frame_num=frame_num, idr_pic_id=idr_pic_id,
                qp=qp, data=data, deblock=deblock, poc_lsb=poc_lsb)
        if lib is not None and not has_i8:
            return _write_islice_cabac_native(
                lib, sp, pp, frame_num=frame_num, idr_pic_id=idr_pic_id,
                qp=qp, data=data, deblock=deblock, poc_lsb=poc_lsb)
        from .cabac_syntax import write_islice_cabac
        return write_islice_cabac(sp, pp, frame_num=frame_num,
                                  idr_pic_id=idr_pic_id, qp=qp, data=data,
                                  deblock=deblock, poc_lsb=poc_lsb)
    if lib is not None:
        return _write_islice_native(lib, sp, pp, frame_num=frame_num,
                                    idr_pic_id=idr_pic_id, qp=qp, data=data,
                                    src_y=src_y, src_u=src_u, src_v=src_v,
                                    deblock=deblock, poc_lsb=poc_lsb)
    return _write_islice_py(sp, pp, frame_num=frame_num,
                            idr_pic_id=idr_pic_id, qp=qp, data=data,
                            src_y=src_y, src_u=src_u, src_v=src_v,
                            deblock=deblock, poc_lsb=poc_lsb)


def _mode_ptrs(data):
    """(modes_ptr, cmodes_ptr) for the native islice writers — NULLs for
    the legacy row pattern; keeps the arrays alive via the second return."""
    import ctypes
    i32p = ctypes.POINTER(ctypes.c_int32)
    if data.get("modes") is None:
        return (i32p(), i32p()), None
    m = np.ascontiguousarray(data["modes"], np.int32)
    c = np.ascontiguousarray(data["cmodes"], np.int32)
    return (m.ctypes.data_as(i32p), c.ctypes.data_as(i32p)), (m, c)


def _write_islice_cabac_i8_native(lib, sp, pp, *, frame_num, idr_pic_id,
                                  qp, data, deblock=False,
                                  poc_lsb=0) -> bytes:
    """Mixed I16 / I_NxN-i8 IDR slice through the C++ writer
    (vcp_write_islice_cabac_i8) — bit-identical to
    cabac_syntax.write_islice_cabac with "i8" (test_native_entropy)."""
    import ctypes
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    i8 = np.ascontiguousarray(data["i8"], np.uint8)
    # the native writer reads i8 MBs' 4x64 scans from the luma_ac slot
    luma_ac = np.asarray(data["luma_ac"]).reshape(n_mby, n_mbx, 256)
    i8_luma = np.asarray(data["i8_luma"]).reshape(n_mby, n_mbx, 256)
    merged = np.where(i8[..., None].astype(bool), i8_luma, luma_ac)
    arrs = [np.ascontiguousarray(a, np.int32) for a in
            (data["luma_dc"], merged, data["cb_dc"], data["cb_ac"],
             data["cr_dc"], data["cr_ac"], data["modes"], data["cmodes"],
             data["i8_modes"])]
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    n = lib.vcp_write_islice_cabac_i8(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num,
        frame_num, idr_pic_id, 0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        *[a.ctypes.data_as(i32p) for a in arrs[:8]],
        i8.ctypes.data_as(u8p), arrs[8].ctypes.data_as(i32p),
        out.ctypes.data_as(u8p), cap)
    if n < 0:
        raise RuntimeError("native cabac i8 islice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_IDR, 3)


def _write_islice_cabac_native(lib, sp, pp, *, frame_num, idr_pic_id, qp,
                               data, deblock=False, poc_lsb=0) -> bytes:
    import ctypes
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    cap = n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma_dc", "luma_ac", "cb_dc", "cb_ac",
                      "cr_dc", "cr_ac")]
    mode_ptrs, _keep = _mode_ptrs(data)
    n = lib.vcp_write_islice_cabac(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num,
        frame_num, idr_pic_id, 0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs],
        *mode_ptrs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError("native cabac islice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_IDR, 3)


def _write_islice_native(lib, sp, pp, *, frame_num, idr_pic_id, qp, data,
                         src_y, src_u, src_v, deblock=False,
                         poc_lsb=0) -> bytes:
    import ctypes
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    y = np.ascontiguousarray(src_y, np.uint8)
    u = np.ascontiguousarray(src_u, np.uint8)
    v = np.ascontiguousarray(src_v, np.uint8)
    # PCM bytes + coded residual upper bound
    cap = y.size + u.size + v.size + n_mby * n_mbx * 2048 + 4096
    out = np.empty(cap, np.uint8)
    # keep converted arrays alive for the duration of the call
    arrs = [np.ascontiguousarray(data[k], np.int32)
            for k in ("luma_dc", "luma_ac", "cb_dc", "cb_ac",
                      "cr_dc", "cr_ac")]
    mode_ptrs, _keep = _mode_ptrs(data)
    n = lib.vcp_write_islice(
        n_mby, n_mbx, qp, pp.init_qp, sp.log2_max_frame_num,
        frame_num, idr_pic_id, 0 if deblock else 1,
        sp.log2_max_poc_lsb if sp.poc_type == 0 else 0, poc_lsb,
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for a in arrs],
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), y.shape[1],
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), u.shape[1],
        *mode_ptrs,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap)
    if n < 0:
        raise RuntimeError("native islice buffer overflow")
    return _nal_from_rbsp_native(lib, out, int(n), H.NAL_SLICE_IDR, 3)


def _write_islice_py(sp: H.SeqParams, pp: H.PicParams, *, frame_num: int,
                     idr_pic_id: int, qp: int, data: dict,
                     src_y: np.ndarray, src_u: np.ndarray,
                     src_v: np.ndarray, deblock: bool = False,
                     poc_lsb: int = 0) -> bytes:
    n_mby, n_mbx = sp.mb_height, sp.mb_width
    bw = BitWriter()
    H.write_slice_header(bw, sp, pp, is_idr=True, frame_num=frame_num,
                         slice_qp=qp, idr_pic_id=idr_pic_id,
                         disable_deblocking=not deblock, poc_lsb=poc_lsb)

    nz_y = NzContext(4 * n_mby, 4 * n_mbx)
    nz_cb = NzContext(2 * n_mby, 2 * n_mbx)
    nz_cr = NzContext(2 * n_mby, 2 * n_mbx)

    luma_dc = data["luma_dc"]      # (n_mby, n_mbx, 16)
    luma_ac = data["luma_ac"]      # (n_mby, n_mbx, 16, 16)
    cb_dc, cb_ac = data["cb_dc"], data["cb_ac"]
    cr_dc, cr_ac = data["cr_dc"], data["cr_ac"]

    modes = data.get("modes")          # RD intra: per-MB I16 pred mode
    cmodes = data.get("cmodes")        # per-MB intra_chroma_pred_mode
    for mby in range(n_mby):
        # row 0 has no top neighbors: DC luma + DC chroma; rows 1.. Vertical
        pred_mode, chroma_mode = (2, 0) if mby == 0 else (0, 2)
        for mbx in range(n_mbx):
            if modes is not None:
                pred_mode = int(modes[mby, mbx])
                chroma_mode = int(cmodes[mby, mbx])
            _write_i16_mb(
                bw, mbx, mby,
                luma_dc[mby, mbx], luma_ac[mby, mbx],
                (cb_dc[mby, mbx], cr_dc[mby, mbx]),
                (cb_ac[mby, mbx], cr_ac[mby, mbx]),
                nz_y, nz_cb, nz_cr,
                pred_mode=pred_mode, chroma_mode=chroma_mode)
    bw.rbsp_trailing_bits()
    return nal_unit(H.NAL_SLICE_IDR, bw.to_bytes(), nal_ref_idc=3)


def _write_i16_mb(bw, mbx, mby, z_dc, z_ac, chroma_dc, chroma_ac,
                  nz_y, nz_cb, nz_cr, slice_type_p: bool = False,
                  pred_mode: int = 0, chroma_mode: int = 2):
    """Intra_16x16 MB: mb_type, chroma pred mode, qp_delta 0, residual."""
    cbp_luma15 = bool(np.any(z_ac[:, 1:]))
    any_cac = bool(np.any(chroma_ac[0][:, 1:])) or \
        bool(np.any(chroma_ac[1][:, 1:]))
    any_cdc = bool(np.any(chroma_dc[0])) or bool(np.any(chroma_dc[1]))
    cbp_chroma = 2 if any_cac else (1 if any_cdc else 0)

    mb_type = _mb_i16_type(pred_mode=pred_mode, cbp_chroma=cbp_chroma,
                           cbp_luma15=cbp_luma15)
    bw.ue(mb_type + (5 if slice_type_p else 0))
    bw.ue(chroma_mode)             # intra_chroma_pred_mode
    bw.se(0)                       # mb_qp_delta
    _write_i16_residual(bw, mbx, mby, z_dc, z_ac, chroma_dc, chroma_ac,
                        cbp_luma15, cbp_chroma, nz_y, nz_cb, nz_cr)


def _write_i16_residual(bw, mbx, mby, z_dc, z_ac, chroma_dc, chroma_ac,
                        cbp_luma15, cbp_chroma, nz_y, nz_cb, nz_cr):
    # Intra16x16DCLevel: nC from luma blk (0,0)'s neighbors.
    nc = nz_y.nc(4 * mby, 4 * mbx)
    encode_residual_block(bw, [int(v) for v in z_dc], nc)

    # Luma AC (15 coeffs from zig-zag pos 1) in coding order.
    for blk in range(16):
        oy, ox = int(LUMA_BLK_ORDER[blk, 0]), int(LUMA_BLK_ORDER[blk, 1])
        by, bx = 4 * mby + oy, 4 * mbx + ox
        if cbp_luma15:
            nc = nz_y.nc(by, bx)
            total = encode_residual_block(
                bw, [int(v) for v in z_ac[blk, 1:]], nc)
        else:
            total = 0
        nz_y.set(by, bx, total)

    # Chroma DC (both components), then chroma AC.
    if cbp_chroma:
        for c in range(2):
            encode_residual_block(bw, [int(v) for v in chroma_dc[c]], -1)
    for c, nzc in ((0, nz_cb), (1, nz_cr)):
        for blk in range(4):
            oy, ox = int(CHROMA_BLK_ORDER[blk, 0]), int(CHROMA_BLK_ORDER[blk, 1])
            by, bx = 2 * mby + oy, 2 * mbx + ox
            if cbp_chroma == 2:
                nc = nzc.nc(by, bx)
                total = encode_residual_block(
                    bw, [int(v) for v in chroma_ac[c][blk, 1:]], nc)
            else:
                total = 0
            nzc.set(by, bx, total)


__all__ = ["write_islice", "NzContext", "CHROMA_BLK_ORDER",
           "CBP_INTRA_TO_CODE", "CBP_INTER_TO_CODE", "MB_TYPE_I_PCM"]
