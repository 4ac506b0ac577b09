"""Native C++ entropy engine must be bit-identical to the Python reference."""

import os

import numpy as np
import pytest

from vcp_tpu import native
from vcp_tpu.codec.h264 import entropy, pframe
from vcp_tpu.codec.h264.decoder import H264Decoder
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native entropy lib unavailable")
    return lib


def test_escape_matches_python(lib):
    import ctypes
    from vcp_tpu.utils.bitstream import emulation_prevent
    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(1, 400))
        # bias toward zeros to hit escape sequences often
        data = np.where(rng.random(n) < 0.6, 0,
                        rng.integers(0, 256, n)).astype(np.uint8)
        out = np.empty(2 * n + 16, np.uint8)
        m = lib.vcp_escape(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        assert out[:m].tobytes() == emulation_prevent(data.tobytes())


def _encode_both(qp, gop, n=5, w=64, h=48, cabac=False, t8=False):
    frames = synth_video(w, h, n)

    def run():
        enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                        gop_size=gop, effort=2,
                                        cabac=cabac, transform8=t8))
        if t8:
            return [s[0] for s in enc.encode_gop(frames)]
        return [enc.encode_frame(*f)[0] for f in frames]

    os.environ["VCP_NO_NATIVE"] = "1"
    try:
        py = run()
    finally:
        del os.environ["VCP_NO_NATIVE"]
    nat = run()
    return py, nat


@pytest.mark.parametrize("qp", [18, 30, 44])
def test_islice_bit_identical(lib, qp):
    py, nat = _encode_both(qp=qp, gop=1, n=2)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"I frame {i} differs at qp {qp}"


@pytest.mark.parametrize("qp", [22, 34])
def test_pslice_bit_identical(lib, qp):
    py, nat = _encode_both(qp=qp, gop=5, n=5)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"frame {i} differs at qp {qp}"


@pytest.mark.parametrize("qp", [18, 30, 44])
def test_cabac_islice_bit_identical(lib, qp):
    py, nat = _encode_both(qp=qp, gop=1, n=2, cabac=True)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"CABAC I frame {i} differs at qp {qp}"


@pytest.mark.parametrize("qp", [22, 34])
def test_cabac_pslice_bit_identical(lib, qp):
    py, nat = _encode_both(qp=qp, gop=5, n=5, cabac=True)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"CABAC frame {i} differs at qp {qp}"


@pytest.mark.parametrize("qp", [22, 34])
def test_cabac_pslice_t8_bit_identical(lib, qp):
    """High-profile adaptive-8x8 P slices: native writer vs Python twin."""
    if not hasattr(lib, "vcp_write_pslice_cabac_t8"):
        pytest.skip("native lib lacks t8 support")
    py, nat = _encode_both(qp=qp, gop=6, n=6, cabac=True, t8=True)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"CABAC t8 frame {i} differs at qp {qp}"


def _encode_both_b(qp, n=7, w=64, h=48, effort=2, t8=False, parts=False):
    frames = synth_video(w, h, n)

    def run():
        enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                        gop_size=n, effort=effort,
                                        cabac=True, bframes=2,
                                        transform8=t8, parts=parts))
        return [s[0] for s in enc.encode_gop(frames)]

    os.environ["VCP_NO_NATIVE"] = "1"
    try:
        py = run()
    finally:
        del os.environ["VCP_NO_NATIVE"]
    nat = run()
    return py, nat


@pytest.mark.parametrize("qp", [22, 34])
def test_cabac_bslice_bit_identical(lib, qp):
    """B slices (B_Skip / B_Direct / L0/L1/Bi + two-list mvd): the C++
    writer (vcp_write_bslice_cabac) must be byte-identical to
    cabac_syntax.write_bslice_cabac for the whole B-GOP stream."""
    if not hasattr(lib, "vcp_write_bslice_cabac"):
        pytest.skip("native lib lacks B support")
    py, nat = _encode_both_b(qp=qp)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"CABAC B-GOP frame {i} differs at qp {qp}"


def test_cabac_bslice_bit_identical_quality_shape(lib):
    """The shipping quality shape (t8 + partitioned anchors): B slices
    under a transform-8x8 PPS with P_8x8-anchor col_safe masking."""
    if not hasattr(lib, "vcp_write_bslice_cabac"):
        pytest.skip("native lib lacks B support")
    py, nat = _encode_both_b(qp=28, effort=6, t8=True, parts=True)
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"quality-shape frame {i} differs"


@pytest.mark.parametrize("qp", [24, 34])
def test_cabac_i8_and_intra_p_bit_identical(lib, qp):
    """The i8 IDR writer (vcp_write_islice_cabac_i8) and the intra-
    overlay P writer (vcp_write_pslice_cabac_intra) must be byte-
    identical to their Python twins across a gradient-clip GOP at the
    shipping quality shape (where most MBs go i8/intra)."""
    if not hasattr(lib, "vcp_write_pslice_cabac_intra"):
        pytest.skip("native lib lacks intra-P support")
    import rdbench
    frames = rdbench.load_clip("gradmotion_320x192")[:7]

    def run():
        enc = H264Encoder(EncoderConfig(width=320, height=192, qp=qp,
                                        gop_size=7, effort=6, cabac=True,
                                        bframes=2, transform8=True,
                                        parts=True))
        return [s[0] for s in enc.encode_gop(frames)]

    os.environ["VCP_NO_NATIVE"] = "1"
    try:
        py = run()
    finally:
        del os.environ["VCP_NO_NATIVE"]
    nat = run()
    for i, (a, b) in enumerate(zip(py, nat)):
        assert a == b, f"frame {i} differs at qp {qp}"


def test_native_cabac_stream_decodes(lib):
    enc = H264Encoder(EncoderConfig(width=64, height=48, qp=26, gop_size=4,
                                    cabac=True))
    frames = synth_video(64, 48, 6)
    aus = [enc.encode_frame(*f)[0] for f in frames]
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb() + b"".join(aus))
    assert len(out) == 6
    ry, _, _ = enc.recon_planes
    np.testing.assert_array_equal(out[-1].y, np.asarray(ry))


def test_native_stream_decodes(lib):
    enc = H264Encoder(EncoderConfig(width=64, height=48, qp=26, gop_size=4))
    frames = synth_video(64, 48, 6)
    aus = [enc.encode_frame(*f)[0] for f in frames]
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb() + b"".join(aus))
    assert len(out) == 6
    ry, _, _ = enc.recon_planes
    np.testing.assert_array_equal(out[-1].y, np.asarray(ry))


def test_cabac_parts_pslice_native_matches_python():
    """Partitioned CABAC P slices: the C++ writer
    (vcp_write_pslice_cabac_parts) must emit byte-identical NALs to
    cabac_syntax.write_pslice_cabac across every partition type
    (16x16/16x8/8x16/P_8x8), mixed per MB, with and without t8."""
    import numpy as np

    from vcp_tpu import native
    from vcp_tpu.codec.h264 import headers as H
    from vcp_tpu.codec.h264 import pframe
    from vcp_tpu.codec.h264.cabac_syntax import write_pslice_cabac

    lib = native.get_lib()
    if lib is None or not hasattr(lib, "vcp_write_pslice_cabac_parts"):
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(21)
    n_mby, n_mbx = 6, 7
    for trial in range(3):
        t8flag = trial != 1
        parts = rng.integers(0, 4, (n_mby, n_mbx)).astype(np.int32)
        mv8 = np.zeros((2 * n_mby, 2 * n_mbx, 2), np.int32)
        # per-partition-consistent MVs on the 8x8 grid
        from vcp_tpu.codec.h264.pframe import _P_PARTS
        for mby in range(n_mby):
            for mbx in range(n_mbx):
                pt = int(parts[mby, mbx])
                geos = [(q >> 1, q & 1, 1, 1) for q in range(4)] \
                    if pt == 3 else _P_PARTS[pt]
                for (dy, dx, pw, ph) in geos:
                    mv = rng.integers(-24, 25, 2)
                    mv8[2 * mby + dy:2 * mby + dy + ph,
                        2 * mbx + dx:2 * mbx + dx + pw] = mv
        luma = np.zeros((n_mby, n_mbx, 16, 16), np.int32)
        mask = rng.random((n_mby, n_mbx, 16, 16)) < 0.05
        luma[mask] = rng.integers(-14, 15, int(mask.sum()))
        if t8flag:
            t8 = rng.random((n_mby, n_mbx)) < 0.4
        else:
            t8 = None
        cb_dc = rng.integers(-3, 4, (n_mby, n_mbx, 4)).astype(np.int32)
        cr_dc = rng.integers(-3, 4, (n_mby, n_mbx, 4)).astype(np.int32)
        cb_ac = np.zeros((n_mby, n_mbx, 4, 16), np.int32)
        cr_ac = np.zeros((n_mby, n_mbx, 4, 16), np.int32)
        camask = rng.random(cb_ac.shape) < 0.03
        camask[..., 0] = False
        cb_ac[camask] = rng.integers(-5, 6, int(camask.sum()))
        data = dict(mv=mv8[::2, ::2][:, :, ::-1], mv8=mv8, parts=parts,
                    luma=luma, cb_dc=cb_dc, cb_ac=cb_ac, cr_dc=cr_dc,
                    cr_ac=cr_ac)
        if t8 is not None:
            data["t8"] = t8
        sp = H.SeqParams(width=16 * n_mbx, height=16 * n_mby,
                         profile_idc=100 if t8flag else 77)
        pp = H.PicParams(init_qp=26, cabac=True, transform_8x8=t8flag)
        nal_n = pframe.write_pslice(sp, pp, frame_num=1, qp=30,
                                    data=dict(data), deblock=True,
                                    cabac=True, poc_lsb=2)
        nal_p = write_pslice_cabac(sp, pp, frame_num=1, qp=30,
                                   data=dict(data), deblock=True,
                                   poc_lsb=2)
        assert nal_n == nal_p, f"trial {trial}"
