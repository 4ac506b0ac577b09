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
