"""AAC-LC decoder tests: self round-trip against codec.aac's encoder and
cross-validation against the system-ffmpeg AAC codec (oracle)."""

import numpy as np
import pytest

from vcp_tpu.codec.aac import AacEncoder
from vcp_tpu.codec.aac_decode import AacDecoder, decode_adts


def tone(n, rate=48000, f=440.0, amp=9000):
    t = np.arange(n) / rate
    x = (amp * np.sin(2 * np.pi * f * t)
         + 0.35 * amp * np.sin(2 * np.pi * 3.1 * f * t + 0.7))
    return np.round(x).astype(np.int16)


def best_corr(a, b, max_lag=4096):
    """Max normalized cross-correlation of two 1-D signals over lags."""
    n = min(len(a), len(b)) - max_lag
    best = -1.0
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    for lag in range(0, max_lag, 128):
        x = a[lag:lag + n]
        y = b[:n]
        c = np.corrcoef(x, y)[0, 1]
        best = max(best, c)
        x = a[:n]
        y = b[lag:lag + n]
        c = np.corrcoef(x, y)[0, 1]
        best = max(best, c)
    return best


def test_self_roundtrip_mono():
    pcm = tone(48000)
    enc = AacEncoder(rate=48000, channels=1, bitrate=128000)
    adts = enc.adts_stream(pcm.reshape(-1, 1))
    out, rate = decode_adts(adts)
    assert rate == 48000
    assert out.shape[1] == 1
    c = best_corr(out[:, 0], pcm)
    assert c > 0.995, c


def test_self_roundtrip_stereo():
    l = tone(24000, f=440.0)
    r = tone(24000, f=523.25)
    pcm = np.stack([l, r], axis=1)
    enc = AacEncoder(rate=48000, channels=2, bitrate=192000)
    adts = enc.adts_stream(pcm)
    out, rate = decode_adts(adts)
    assert out.shape[1] == 2
    assert best_corr(out[:, 0], l) > 0.99
    assert best_corr(out[:, 1], r) > 0.99


def _oracle():
    import av_oracle
    return av_oracle


def test_oracle_stream_decodes_mono():
    """ffmpeg's AAC encoder (TNS, PNS, short windows, M/S all in play) →
    our decoder must reproduce what ffmpeg's own decoder hears."""
    O = _oracle()
    if O.get_oracle() is None:
        pytest.skip("oracle unavailable")
    rng = np.random.default_rng(0)
    pcm = tone(48000 * 2)
    # add a transient so the encoder switches to short windows
    pcm[24000:24200] = (rng.integers(-20000, 20000, 200)).astype(np.int16)
    adts = O.encode_aac(pcm.reshape(-1, 1), rate=48000, bitrate=160000)
    theirs, trate = O.decode_aac(adts)
    ours, rate = decode_adts(adts)
    assert rate == 48000 and trate == 48000
    t = np.asarray(theirs)[:, 0]
    c = best_corr(ours[:, 0], t)
    assert c > 0.97, c


def test_oracle_stream_decodes_stereo():
    O = _oracle()
    if O.get_oracle() is None:
        pytest.skip("oracle unavailable")
    l = tone(48000, f=440.0)
    r = tone(48000, f=445.0)   # near-identical -> exercises M/S
    pcm = np.stack([l, r], axis=1)
    adts = O.encode_aac(pcm, rate=48000, bitrate=192000)
    theirs, _ = O.decode_aac(adts)
    ours, _ = decode_adts(adts)
    t = np.asarray(theirs)
    c0 = best_corr(ours[:, 0], t[:, 0])
    c1 = best_corr(ours[:, 1], t[:, 1])
    assert c0 > 0.97 and c1 > 0.97, (c0, c1)


def test_reencode_pipeline():
    """AAC-in → decode → re-encode at a different bitrate → the oracle
    (or our own decoder) still hears the same signal: the `-c:a aac
    -b:a N` path over AAC sources (ref config.go:44-48)."""
    pcm = tone(48000)
    enc1 = AacEncoder(rate=48000, channels=1, bitrate=192000)
    adts1 = enc1.adts_stream(pcm.reshape(-1, 1))
    mid, rate = decode_adts(adts1)
    enc2 = AacEncoder(rate=rate, channels=1, bitrate=96000)
    adts2 = enc2.adts_stream(mid)
    out, _ = decode_adts(adts2)
    assert best_corr(out[:, 0], pcm) > 0.99
