"""Native C++ CABAC slice parser == pure-Python parser, bit for bit.

native/h264parse.cpp re-implements the decode half of cabac_syntax.py /
inter_cabac.py for throughput (the decode hot path was 28x slower than
the encoder when the parse ran in Python). These tests pin the two
implementations against each other on real libx264 streams covering
the full foreign-decode surface (I16/I_NxN/I8x8, P partitions, B
direct/bipred, multi-ref, weightp, AQ qp_delta, 8x8 transform), and
assert the native path actually ran (no silent fallback).
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264 import native_parse
from vcp_tpu.codec.h264.decoder import H264Decoder

O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    if O.get_oracle() is None:
        pytest.skip("system libavcodec unavailable")
    return O


def _clip(name, n=10):
    import rdbench
    return rdbench.load_clip(name)[:n]


def _decode_both(monkeypatch, es):
    """Decode es twice: native (parse + recon) forced off, then on
    (counting parser uses)."""
    monkeypatch.setenv("VCP_NATIVE_PARSE", "0")
    monkeypatch.setenv("VCP_NATIVE_RECON", "0")
    frames_py = H264Decoder().decode_annexb(es)

    monkeypatch.setenv("VCP_NATIVE_PARSE", "1")
    monkeypatch.setenv("VCP_NATIVE_RECON", "1")
    calls = {"hit": 0, "miss": 0}
    orig = native_parse.parse_slice_native

    def counting(*a, **kw):
        res = orig(*a, **kw)
        calls["hit" if res is not None else "miss"] += 1
        return res

    monkeypatch.setattr(native_parse, "parse_slice_native", counting)
    frames_nat = H264Decoder().decode_annexb(es)
    return frames_py, frames_nat, calls


@pytest.mark.parametrize("opts,n", [
    ("threads=1", 12),                       # medium defaults: the bar
    ("bframes=0:threads=1", 10),             # P-only with partitions/AQ
    ("bframes=3:ref=3:threads=1:weightp=0", 12),   # B-pyramid
])
def test_native_matches_python(oracle, monkeypatch, opts, n):
    es = oracle.encode_video("libx264", _clip("gradmotion_320x192", n),
                             preset="medium", crf=26, gop=n,
                             opts="x264-params=" + opts)
    frames_py, frames_nat, calls = _decode_both(monkeypatch, es)
    assert calls["hit"] > 0 and calls["miss"] == 0, calls
    assert len(frames_py) == len(frames_nat) == n
    for i, (a, b) in enumerate(zip(frames_py, frames_nat)):
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y),
                                      err_msg=f"frame {i} luma [{opts}]")
        np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u),
                                      err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v),
                                      err_msg=f"frame {i} cr")


def test_own_stream_roundtrip_native(monkeypatch):
    """Our encoder's CABAC output decodes identically through both
    parsers (no oracle needed)."""
    from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
    rng = np.random.default_rng(7)
    h, w = 96, 112
    frames = []
    base = rng.integers(16, 236, (h, w), np.int32)
    for t in range(6):
        y = np.clip(np.roll(base, 2 * t, axis=1)
                    + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 100 + 4 * t, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append((y, u, v))
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=28, gop_size=6,
                                    cabac=True, deblock=True, effort=6,
                                    bframes=2))
    items = enc.encode_gop(frames)
    es = enc.headers_annexb() + b"".join(it[0] for it in items)
    frames_py, frames_nat, calls = _decode_both(monkeypatch, es)
    assert calls["hit"] > 0, calls
    for i, (a, b) in enumerate(zip(frames_py, frames_nat)):
        np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y),
                                      err_msg=f"frame {i}")
        np.testing.assert_array_equal(np.asarray(a.u), np.asarray(b.u))
        np.testing.assert_array_equal(np.asarray(a.v), np.asarray(b.v))
