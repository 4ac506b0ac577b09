"""HEVC CABAC context sets and scan orders (spec 9.3.2, 6.5.3).

Host-side entropy support for the HEVC engine, replacing (in role) the
entropy layer the reference delegated to libx265/hevc_nvenc via ffmpeg
(ref cmd/consumer.go:370-394). The arithmetic core is shared with H.264
(vcp_tpu.codec.cabac).

Context initialization note: all contexts initialize from initValue 154
(the spec's "neutral" 50/50 state, which Table 9-x uses for a large
share of contexts). Per-context spec init values are a pure compression
refinement (contexts adapt within a few bins); the in-repo encoder and
decoder share this table, keeping the closed loop bit-exact. Swapping in
conformance init values later only requires editing INIT_VALUES.
"""

from __future__ import annotations

import functools

from ..cabac import Context

# Number of contexts per syntax element set.
CTX_SETS = {
    "split_cu": 3,          # ctxInc from neighbor depths
    "cu_skip": 3,
    "pred_mode": 1,
    "part_mode": 4,
    "prev_intra": 1,        # prev_intra_luma_pred_flag
    "intra_chroma": 1,      # first bin of intra_chroma_pred_mode
    "rqt_root_cbf": 1,
    "merge_flag": 1,
    "merge_idx": 1,
    "inter_pred_idc": 5,
    "ref_idx": 2,
    "mvp_flag": 1,
    "mvd_gr0": 1,           # abs_mvd_greater0_flag
    "mvd_gr1": 1,           # abs_mvd_greater1_flag
    "split_tr": 3,          # split_transform_flag
    "cbf_luma": 2,          # ctxInc = (trafoDepth == 0)
    "cbf_chroma": 5,        # ctxInc = trafoDepth
    "last_x": 18,           # 15 luma + 3 chroma
    "last_y": 18,
    "csbf": 4,              # coded_sub_block_flag: 2 luma + 2 chroma
    "sig_luma": 27,
    "sig_chroma": 15,
    "gr1_luma": 16,         # coeff_abs_level_greater1: 4 sets x 4
    "gr1_chroma": 8,        # 2 sets x 4
    "gr2_luma": 4,
    "gr2_chroma": 2,
}

# initValue per set; a scalar applies to every context in the set.
INIT_VALUES = {name: 154 for name in CTX_SETS}


class HevcContexts:
    """All adaptive contexts for one slice."""

    def __init__(self, slice_qp: int, init_type: int = 0):
        self.qp = slice_qp
        self.init_type = init_type
        self.c = {}
        for name, n in CTX_SETS.items():
            iv = INIT_VALUES[name]
            ivs = [iv] * n if isinstance(iv, int) else iv
            self.c[name] = [Context.from_init_hevc(v, slice_qp)
                            for v in ivs]

    def __getitem__(self, key):
        name, idx = key
        return self.c[name][idx]


# ---------------------------------------------------------------------------
# Scan orders (spec 6.5.3, up-right diagonal).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def diag_scan(n: int):
    """Up-right diagonal scan for an n x n array: tuple of (x, y) in
    scan-position order, starting at DC."""
    order = []
    for d in range(2 * n - 1):
        y = min(d, n - 1)
        while y >= 0 and d - y < n:
            order.append((d - y, y))
            y -= 1
    return tuple(order)


@functools.lru_cache(maxsize=None)
def scan_pos_of(n: int):
    """Inverse map: dict (x, y) -> scan position."""
    return {xy: i for i, xy in enumerate(diag_scan(n))}


@functools.lru_cache(maxsize=None)
def coeff_scan(log2: int):
    """Full hierarchical coefficient scan for an N x N TB: 4x4 subblocks
    in diagonal order, coefficients within each subblock in diagonal
    order. Tuple of (x, y), scan position 16*sbPos + posInSb."""
    n = 1 << log2
    if n == 4:
        return diag_scan(4)
    order = []
    for sx, sy in diag_scan(n // 4):
        for px, py in diag_scan(4):
            order.append((sx * 4 + px, sy * 4 + py))
    return tuple(order)
