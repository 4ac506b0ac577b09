"""The quality-preset (B-GOP) tunnel optimizations are bit-exact.

The effort>=5 GOP path ships its entropy inputs with a word-sparse fetch
(gop_ops.sparsify_buf) and its source frames as delta tiles
(encoder upload()); both must be byte-identical to the dense/dumb path —
they move bytes, never change math. Mirrors the speed path's guarantees
(test_gop_ops), on the B-pyramid-less quality shape with t8 + partitions
+ intra-in-P enabled. Reference semantics: the consumer encode boundary
replaces /root/reference/cmd/consumer.go:376-394's exec-ffmpeg."""

import os

import numpy as np
import pytest

from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
from vcp_tpu.codec.h264 import gop_ops


def _synth(w, h, n):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (32 + (xx * 160) // w + (yy * 48) // h).astype(np.int32)
    fr = []
    for t in range(n):
        y = base.copy()
        bx, by = (9 * t) % (w - 32), (5 * t) % (h - 32)
        y[by:by + 32, bx:bx + 32] = 210
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 146, np.uint8)
        u[by // 2:by // 2 + 16, bx // 2:bx // 2 + 16] = 90
        fr.append((np.clip(y, 0, 255).astype(np.uint8), u, v))
    return fr


def _encode(frames, w, h, sparse, delta, monkeypatch):
    monkeypatch.setenv("VCP_SPARSE_B", "1" if sparse else "0")
    monkeypatch.setenv("VCP_DELTA", "1" if delta else "0")
    cfg = EncoderConfig(width=w, height=h, fps_num=30, qp=26,
                        gop_size=len(frames), effort=6)
    cfg.transform8 = True
    cfg.parts = True
    cfg.bframes = 2
    enc = H264Encoder(cfg)
    # two GOPs: the second exercises the cross-GOP delta/sticky-cap carry
    out = enc.encode_gop(frames) + enc.encode_gop(frames[::-1])
    return b"".join(s[0] for s in out)


@pytest.mark.parametrize("sparse,delta",
                         [(True, False), (False, True), (True, True)])
def test_bgop_sparse_delta_bit_exact(monkeypatch, sparse, delta):
    w, h, n = 128, 96, 8
    frames = _synth(w, h, n)
    ref = _encode(frames, w, h, False, False, monkeypatch)
    got = _encode(frames, w, h, sparse, delta, monkeypatch)
    assert got == ref


def test_bgop_sparse_cap_overflow(monkeypatch):
    """A cap far below the chunk count forces the overflow tail fetch and
    the sticky-cap growth path."""
    w, h, n = 128, 96, 6
    frames = [(np.random.default_rng(i).integers(0, 255, (h, w), np.uint8),
               np.random.default_rng(100 + i).integers(0, 255,
                                                       (h // 2, w // 2),
                                                       np.uint8),
               np.full((h // 2, w // 2), 128, np.uint8)) for i in range(n)]
    ref = _encode(frames, w, h, False, False, monkeypatch)

    monkeypatch.setenv("VCP_SPARSE_B", "1")
    monkeypatch.setenv("VCP_DELTA", "0")
    cfg = EncoderConfig(width=w, height=h, fps_num=30, qp=26,
                        gop_size=n, effort=6)
    cfg.transform8 = True
    cfg.parts = True
    cfg.bframes = 2
    enc = H264Encoder(cfg)
    enc._spcaps = {"i": 16, "p": 16, "b": 16}   # force overflow
    out = enc.encode_gop(frames) + enc.encode_gop(frames[::-1])
    assert b"".join(s[0] for s in out) == ref
    assert all(c > 16 for c in enc._spcaps.values())   # caps grew


def test_sparsify_buf_roundtrip():
    rng = np.random.default_rng(7)
    n = 5003   # not a multiple of SP_K
    buf = np.zeros(n, np.int16)
    idx = rng.choice(n, 200, replace=False)
    buf[idx] = rng.integers(-3000, 3000, 200).astype(np.int16)
    comb, comp = gop_ops.sparsify_buf(np.asarray(buf), 64)
    dense, count = gop_ops.unsparsify_buf(np.asarray(comb), n, 64, comp)
    assert count <= (n + gop_ops.SP_K - 1) // gop_ops.SP_K
    np.testing.assert_array_equal(dense, buf)
