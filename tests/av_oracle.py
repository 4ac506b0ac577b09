"""Test-only conformance oracle over the system libavcodec.

Builds tests/oracle/avshim.c lazily (g++ against the system ffmpeg dev
headers) and exposes decode/encode helpers used to validate the
framework's bitstreams against an independent reference implementation.
The product code never touches this; every user skips when the system
libraries are unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "oracle")
_lib = None
_tried = False


def get_oracle():
    """Return the loaded shim CDLL, or None when unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    src = os.path.join(_DIR, "avshim.c")
    try:
        key = hashlib.sha256(open(src, "rb").read()).hexdigest()[:16]
        so = os.path.join(_DIR, f"_avshim_{key}.so")
        if not os.path.exists(so):
            cmd = ["g++", "-O2", "-shared", "-fPIC", src, "-o", so + ".tmp",
                   "-lavformat", "-lavcodec", "-lavutil"]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(so + ".tmp", so)
        lib = ctypes.CDLL(so)
    except Exception:
        return None
    i64, i32, dbl = ctypes.c_int64, ctypes.c_int32, ctypes.c_double
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.av_oracle_decode_video.restype = i64
    lib.av_oracle_decode_video.argtypes = [
        ctypes.c_char_p, u8p, i64, u8p, i64, i32p, i32p]
    lib.av_oracle_encode_video.restype = i64
    lib.av_oracle_encode_video.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, dbl, i32, i32, i32, i32,
        ctypes.c_char_p, u8p, i32, u8p, i64]
    lib.av_oracle_mux_avi.restype = i64
    lib.av_oracle_mux_avi.argtypes = [u8p, i64, i32, i32, i32, u8p, i64]
    lib.av_oracle_encode_aac.restype = i64
    lib.av_oracle_encode_aac.argtypes = [i16p, i64, i32, i32, i32, u8p, i64]
    lib.av_oracle_decode_aac.restype = i64
    lib.av_oracle_decode_aac.argtypes = [u8p, i64, f32p, i64, i32p, i32p]
    _lib = lib
    return _lib


def _u8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def decode_video(codec: str, annexb: bytes, max_frames: int = 256,
                 max_wh=(4096, 2176)):
    """Decode an Annex-B stream; returns list of (y, u, v) uint8 planes."""
    lib = get_oracle()
    assert lib is not None
    data = np.frombuffer(annexb, np.uint8).copy()
    cap = max_frames * max_wh[0] * max_wh[1] * 3 // 2
    out = np.empty(cap, np.uint8)
    w = ctypes.c_int32(0)
    h = ctypes.c_int32(0)
    n = lib.av_oracle_decode_video(codec.encode(), _u8(data), data.size,
                                   _u8(out), cap, ctypes.byref(w),
                                   ctypes.byref(h))
    if n < 0:
        raise RuntimeError(f"oracle {codec} decode failed: {n}")
    w, h = w.value, h.value
    fsz = w * h * 3 // 2
    frames = []
    for i in range(int(n)):
        flat = out[i * fsz:(i + 1) * fsz]
        y = flat[:w * h].reshape(h, w).copy()
        u = flat[w * h:w * h + w * h // 4].reshape(h // 2, w // 2).copy()
        v = flat[w * h + w * h // 4:].reshape(h // 2, w // 2).copy()
        frames.append((y, u, v))
    return frames


def encode_video(codec: str, frames, preset: str = "medium",
                 crf: float = 23.0, fps: int = 30, gop: int = 0,
                 opts: str = "") -> bytes:
    """Encode (y, u, v) uint8 frames with libx264/libx265 → Annex-B.
    ``opts`` is "key=value:key=value" for the encoder's private options
    (e.g. x264-params)."""
    lib = get_oracle()
    assert lib is not None
    h, w = frames[0][0].shape
    stack = np.concatenate([
        np.concatenate([f[0].reshape(-1), f[1].reshape(-1),
                        f[2].reshape(-1)])
        for f in frames]).astype(np.uint8)
    cap = stack.size * 2 + (1 << 20)
    out = np.empty(cap, np.uint8)
    n = lib.av_oracle_encode_video(codec.encode(), preset.encode(),
                                   crf, gop, w, h, fps, opts.encode(),
                                   _u8(stack), len(frames), _u8(out), cap)
    if n < 0:
        raise RuntimeError(f"oracle {codec} encode failed: {n}")
    return out[:n].tobytes()


def mux_avi(annexb: bytes, w: int, h: int, fps: int = 30) -> bytes:
    """Wrap an H.264 Annex-B stream into an AVI container (libavformat),
    to exercise the product's RIFF/AVI ingest against a real muxer."""
    lib = get_oracle()
    assert lib is not None
    data = np.frombuffer(annexb, np.uint8).copy()
    cap = data.size + (1 << 20)
    out = np.empty(cap, np.uint8)
    n = lib.av_oracle_mux_avi(_u8(data), data.size, w, h, fps, _u8(out), cap)
    if n < 0:
        raise RuntimeError(f"oracle avi mux failed: {n}")
    return out[:n].tobytes()


def encode_aac(pcm: np.ndarray, rate: int = 48000,
               bitrate: int = 128000) -> bytes:
    """Encode interleaved (N, C) int16 PCM with ffmpeg's AAC-LC → ADTS."""
    lib = get_oracle()
    assert lib is not None
    pcm = np.ascontiguousarray(pcm, np.int16)
    nsamp, ch = (pcm.shape[0], pcm.shape[1]) if pcm.ndim == 2 \
        else (pcm.shape[0], 1)
    cap = pcm.size * 2 + (1 << 16)
    out = np.empty(cap, np.uint8)
    n = lib.av_oracle_encode_aac(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), nsamp, ch,
        rate, bitrate, _u8(out), cap)
    if n < 0:
        raise RuntimeError(f"oracle aac encode failed: {n}")
    return out[:n].tobytes()


def decode_aac(adts: bytes, max_samples: int = 1 << 24):
    """Decode an ADTS stream → (float32 (N, C) PCM, rate)."""
    lib = get_oracle()
    assert lib is not None
    data = np.frombuffer(adts, np.uint8).copy()
    out = np.empty(max_samples, np.float32)
    ch = ctypes.c_int32(0)
    rate = ctypes.c_int32(0)
    n = lib.av_oracle_decode_aac(
        _u8(data), data.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        ctypes.byref(ch), ctypes.byref(rate))
    if n < 0:
        raise RuntimeError(f"oracle aac decode failed: {n}")
    c = ch.value
    return out[:int(n) * c].reshape(int(n), c).copy(), rate.value
