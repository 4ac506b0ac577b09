"""ctypes loader for the native entropy engine (with Python fallback).

``get_lib()`` returns the loaded CDLL or None; callers fall back to the
pure-Python entropy coder when unavailable. Set ``VCP_NO_NATIVE=1`` to
force the Python path (used by equivalence tests)."""

from __future__ import annotations

import ctypes
import os
import threading

_lock = threading.Lock()
_lib = None
_tried = False


def _configure(lib) -> None:
    i64, i32 = ctypes.c_int64, ctypes.c_int32
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.vcp_escape.restype = i64
    lib.vcp_escape.argtypes = [u8p, i64, u8p]
    lib.vcp_write_islice.restype = i64
    lib.vcp_write_islice.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
        i32p, i32p, i32p, i32p, i32p, i32p,
        u8p, i32, u8p, u8p, i32, i32p, i32p, u8p, i64]
    lib.vcp_write_pslice.restype = i64
    lib.vcp_write_pslice.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32,
        u8p, i32p, i32p, i32p, i32p, i32p, i32p, u8p, i64]
    lib.vcp_write_islice_cabac.restype = i64
    lib.vcp_write_islice_cabac.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
        i32p, i32p, i32p, i32p, i32p, i32p, i32p, i32p, u8p, i64]
    lib.vcp_write_pslice_cabac.restype = i64
    lib.vcp_write_pslice_cabac.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32,
        u8p, i32p, i32p, i32p, i32p, i32p, i32p, u8p, i64]
    lib.vcp_write_pslice_cabac_t8.restype = i64
    lib.vcp_write_pslice_cabac_t8.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32,
        u8p, u8p, i32p, i32p, i32p, i32p, i32p, i32p, u8p, i64]
    lib.vcp_write_pslice_cabac_parts.restype = i64
    lib.vcp_write_pslice_cabac_parts.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32,
        u8p, u8p, i32,                  # active, t8, transform_8x8
        i32p, i32p,                     # mv8_xy, parts
        i32p, i32p, i32p, i32p, i32p,   # luma + chroma arrays
        u8p, i64]
    lib.vcp_write_islice_cabac_i8.restype = i64
    lib.vcp_write_islice_cabac_i8.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
        i32p, i32p, i32p, i32p, i32p, i32p,     # level arrays
        i32p, i32p,                             # modes, cmodes
        u8p, i32p,                              # i8, i8_modes
        u8p, i64]
    lib.vcp_write_pslice_cabac_intra.restype = i64
    lib.vcp_write_pslice_cabac_intra.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32,
        u8p, i32,                               # t8, transform_8x8
        u8p, u8p, i32p, i32p,                   # intra, i8, imodes, icmodes
        i32p, i32p,                             # luma_dc, i8_modes
        i32p, i32p,                             # mv8_xy, parts
        i32p, i32p, i32p, i32p, i32p,           # luma + chroma arrays
        u8p, i64]
    lib.vcp_write_bslice_cabac.restype = i64
    lib.vcp_write_bslice_cabac.argtypes = [
        i32, i32, i32, i32, i32, i32, i32, i32, i32, i32,
        i32p, i32p, i32p,               # mv0_xy, mv1_xy, mode
        u8p, u8p,                       # col_zero, col_safe
        i32p, i32p, i32p, i32p, i32p,   # luma + chroma arrays
        u8p, i64]
    lib.vcp_deblock_frame.restype = None
    lib.vcp_deblock_frame.argtypes = [
        i32p, i32p, i32p, i32, i32, i32p, i32p, i32p, i32p]
    lib.vcp_tile_delta.restype = i32
    lib.vcp_tile_delta.argtypes = [
        u8p, u8p, u8p, i32, i32, u8p, i32p, u8p, i32]
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.vcp_parse_slice_cabac.restype = i64
    lib.vcp_parse_slice_cabac.argtypes = [
        u8p, i64,                       # payload
        i32, i32, i32, i32, i32,        # kind, qp, init_idc, n_mby, n_mbx
        i32, i32, i32,                  # pps_t8, n_ref0, n_ref1
        u8p, i32p,                      # col_ref0, col_mv8 (nullable)
        i32p, i8p, i32p, i8p,           # mv8/ref8 l0, l1
        u8p, u8p, u8p, i32p, u8p,       # dec8, intra, mv_valid, qp_mb, t8
        i32p, i32p, i32p,               # z_luma, cdc, cac
        i8p, i8p, i8p,                  # cbf grids
        i32p, i32p, i8p, i32p]          # intra queue
    pp = ctypes.POINTER(i32p)
    lib.vcp_recon_inter_frame.restype = i64
    lib.vcp_recon_inter_frame.argtypes = [
        pp, pp, pp, i32,                # list0 planes + count
        pp, pp, pp, i32,                # list1 planes + count (0 for P)
        i32, i32,                       # H, W
        i32p, i8p, i32p, i8p,           # mv8/ref8 l0, l1 (l1 nullable)
        u8p, i32, i32,                  # inter_mb, n_mby, n_mbx
        i32p, i32p, i32p,               # z_luma, cdc, cac
        u8p, i32p, i32,                 # t8, qp_mb, chroma_qp_off
        i32p, i32p, i32p, i32p,         # wt0, wt1, impl_w0, impl_w1
        i32p, i32p, i32p]               # y, u, v
    lib.vcp_deblock_frame_direct.restype = None
    lib.vcp_deblock_frame_direct.argtypes = [
        i32p, i32p, i32p, i32, i32,     # y, u, v, H, W
        u8p, u8p, i32p, u8p,            # intra, nz, qp_mb, t8
        i32, i32p, i32p, i32p, i32p,    # mv_mode, mv0, id0, mv1, id1
        i32, i32, i32p]                 # gh, gw, chroma qp table
    lib.vcp_recon_intra_mbs.restype = i64
    lib.vcp_recon_intra_mbs.argtypes = [
        i32p, i32p, i32p, i32, i32, i32,   # y, u, v, H, W, n_mbx
        i64, i32p, i32p, i8p, i32p,     # count + iq arrays
        i32p, i32p, i32p, i32]          # z_luma, cdc, cac, chroma_off


def get_lib():
    global _lib, _tried
    if os.environ.get("VCP_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            from .build import build
            so = build()
            if so is None:
                return None
            _lib = ctypes.CDLL(so)
            _configure(_lib)
        except Exception as e:  # pragma: no cover
            import sys
            print(f"vcp native load failed: {e}", file=sys.stderr)
            _lib = None
        return _lib
