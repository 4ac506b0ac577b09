"""Build the native entropy engine.

Generates ``tables_gen.h`` from the Python VLC tables (single source of
truth — vcp_tpu.codec.h264.tables) and compiles ``entropy.cpp`` with g++
into a cached shared library. No pybind11: plain C ABI via ctypes.
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
BUILD_DIR = os.path.join(_DIR, "_build")


def _vlc(code: str) -> str:
    return "{%d,%d}" % (len(code), int(code, 2) if code else 0)


def generate_tables_header() -> str:
    from ..codec.h264 import tables as T

    lines = [
        "// GENERATED from vcp_tpu/codec/h264/tables.py — do not edit.",
        "#pragma once",
        "#include <cstdint>",
        "struct VLC { uint8_t len; uint16_t bits; };",
    ]

    def ct(name, tab, max_tc):
        rows = []
        for tc in range(max_tc + 1):
            cells = []
            for t1 in range(4):
                code = tab.get((t1, tc))
                cells.append(_vlc(code) if code is not None else "{0,0}")
            rows.append("{" + ",".join(cells) + "}")
        lines.append(f"static const VLC {name}[{max_tc + 1}][4] = "
                     "{" + ",".join(rows) + "};")

    ct("CT_NC0", T.COEFF_TOKEN_NC0, 16)
    ct("CT_NC2", T.COEFF_TOKEN_NC2, 16)
    ct("CT_NC4", T.COEFF_TOKEN_NC4, 16)
    ct("CT_CHROMA", T.COEFF_TOKEN_CHROMA_DC, 4)

    rows = []
    for tc in range(16):
        cells = ["{0,0}"] * 16
        if tc in T.TOTAL_ZEROS_4x4:
            for tz, code in enumerate(T.TOTAL_ZEROS_4x4[tc]):
                cells[tz] = _vlc(code)
        rows.append("{" + ",".join(cells) + "}")
    lines.append("static const VLC TZ_4x4[16][16] = {" + ",".join(rows) + "};")

    rows = []
    for tc in range(4):
        cells = ["{0,0}"] * 4
        if tc in T.TOTAL_ZEROS_CHROMA_DC:
            for tz, code in enumerate(T.TOTAL_ZEROS_CHROMA_DC[tc]):
                cells[tz] = _vlc(code)
        rows.append("{" + ",".join(cells) + "}")
    lines.append("static const VLC TZ_CHROMA[4][4] = {" + ",".join(rows) + "};")

    rows = []
    for zl in range(8):
        cells = ["{0,0}"] * 15
        if zl in T.RUN_BEFORE:
            for run, code in enumerate(T.RUN_BEFORE[zl]):
                cells[run] = _vlc(code)
        rows.append("{" + ",".join(cells) + "}")
    lines.append("static const VLC RUN_BEFORE[8][15] = {" + ",".join(rows) + "};")

    inter = [str(T.CBP_INTER_TO_CODE[c]) for c in range(48)]
    intra = [str(T.CBP_INTRA_TO_CODE[c]) for c in range(48)]
    lines.append("static const uint8_t CBP_INTER_CODE[48] = {"
                 + ",".join(inter) + "};")
    lines.append("static const uint8_t CBP_INTRA_CODE[48] = {"
                 + ",".join(intra) + "};")

    # CABAC context init (m, n) pairs — single source of truth with the
    # Python syntax layer (codec.h264.cabac_tables, spec 9.3.1.1)
    from ..codec.h264.cabac_tables import CTX_INIT_I, CTX_INIT_PB, N_CTX
    lines.append(f"#define VCP_N_CTX {N_CTX}")

    def ctab(name, tab):
        cells = ",".join("{%d,%d}" % (m, n) for m, n in tab)
        lines.append(
            f"static const int8_t {name}[{len(tab)}][2] = {{{cells}}};")

    ctab("CTX_INIT_I", CTX_INIT_I)
    ctab("CTX_INIT_P0", CTX_INIT_PB[0])
    ctab("CTX_INIT_P1", CTX_INIT_PB[1])
    ctab("CTX_INIT_P2", CTX_INIT_PB[2])

    # ---- recon tables (h264recon.cpp): dequant scales, scans, chroma
    # QP map, quarter-pel plane table, intra gather tables — generated
    # from the Python ops so both sides share one source of truth.
    import numpy as np

    from ..ops import transform as tf
    from ..ops import transform8 as t8
    from ..ops.motion import _QPEL_TABLE

    def flat(name, arr, ctype="int32_t"):
        a = np.asarray(arr).reshape(-1)
        lines.append(f"static const {ctype} {name}[{a.size}] = {{"
                     + ",".join(str(int(v)) for v in a) + "};")

    flat("VCP_V4", tf.V_TABLE)              # (6,4,4)
    flat("VCP_V8", t8.V8_TABLE)             # (6,8,8)
    flat("VCP_ZZ4", T.ZIGZAG_4x4)           # 16
    flat("VCP_ZZ8", t8.ZIGZAG_8x8)          # 64
    flat("VCP_CHROMA_QP", tf.CHROMA_QP_FULL)   # 52
    flat("VCP_QPEL", _QPEL_TABLE)           # (16,6)
    from ..codec.h264 import decoder as _dec
    for ns, tabs in ((4, _dec._I4_TABS), (8, _dec._I8_TABS)):
        packed = np.stack([np.stack(tabs[m]) for m in range(3, 9)])
        flat(f"VCP_I{ns}_TABS", packed, "uint8_t")  # (6 modes,3,ns,ns)

    from ..ops import deblock as dbf
    flat("VCP_DB_ALPHA", dbf.ALPHA)         # 52
    flat("VCP_DB_BETA", dbf.BETA)           # 52
    flat("VCP_DB_TC0", dbf.TC0)             # (3, 52)
    return "\n".join(lines) + "\n"


SOURCES = ("entropy.cpp", "cabac.cpp", "deblock.cpp", "tiles.cpp",
           "h264parse.cpp", "h264recon.cpp")


def build(force: bool = False) -> str | None:
    """Compile (if stale) and return the .so path, or None on failure."""
    os.makedirs(BUILD_DIR, exist_ok=True)
    srcs = [os.path.join(_DIR, s) for s in SOURCES]
    header = generate_tables_header()
    hdr_path = os.path.join(BUILD_DIR, "tables_gen.h")

    h = hashlib.sha256(header.encode())
    for src in srcs:
        h.update(open(src, "rb").read())
    key = h.hexdigest()[:16]
    so_path = os.path.join(BUILD_DIR, f"libvcp_entropy_{key}.so")
    if os.path.exists(so_path) and not force:
        return so_path

    with open(hdr_path, "w") as fh:
        fh.write(header)
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
           f"-I{BUILD_DIR}", *srcs, "-o", so_path + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        err = getattr(e, "stderr", b"") or b""
        import sys
        print(f"vcp native build failed: {err.decode()[:2000]}",
              file=sys.stderr)
        return None
    os.replace(so_path + ".tmp", so_path)
    return so_path
