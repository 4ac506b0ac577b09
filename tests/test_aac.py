"""AAC-LC encoder: bitstream structure, WAV path, ffmpeg conformance."""

import struct

import numpy as np
import pytest

from vcp_tpu.codec.aac import AacEncoder, mdct_basis, quantize
from vcp_tpu.codec.wav import WavError, is_wav, read_wav


def _tone(rate, secs, freqs=(440.0,), amp=12000, channels=1):
    t = np.arange(int(rate * secs))
    x = sum(np.sin(2 * np.pi * f * t / rate) for f in freqs)
    x = (x / len(freqs) * amp).astype(np.int16)
    if channels == 2:
        x = np.stack([x, np.roll(x, 37)], axis=1)
    return x


def write_wav(path, pcm, rate):
    pcm = np.asarray(pcm, np.int16)
    ch = 1 if pcm.ndim == 1 else pcm.shape[1]
    data = pcm.astype("<i2").tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, rate,
                                   rate * ch * 2, ch * 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    with open(path, "wb") as fh:
        fh.write(hdr + data)


def test_mdct_perfect_reconstruction():
    """Forward MDCT + reference inverse (2/N IMDCT with OLA) must
    reconstruct the signal (TDAC property)."""
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1000, 8192)
    basis = mdct_basis()
    recon = np.zeros(8192 + 2048)
    prev = np.zeros(1024)
    for i in range(0, 8192, 1024):
        blk = np.concatenate([prev, x[i:i + 1024]])
        spec = blk @ basis
        recon[i:i + 2048] += (spec @ basis.T) / 2048.0
        prev = x[i:i + 1024]
    err = recon[1024:7168] - x[0:6144]
    assert np.abs(err).max() < 1e-6 * 1000


def test_quantizer_monotone():
    spec = np.linspace(-1000, 1000, 64)
    q1 = quantize(spec, 120)
    q2 = quantize(spec, 140)
    assert np.all(np.abs(q1) >= np.abs(q2))
    assert np.all(np.sign(q1) == np.sign(spec) * (np.abs(q1) > 0))


def test_adts_framing():
    enc = AacEncoder(rate=48000, channels=1, bitrate=96000)
    adts = enc.adts_stream(_tone(48000, 0.2))
    assert adts[0] == 0xFF and (adts[1] & 0xF0) == 0xF0
    # walk frame lengths
    pos, n = 0, 0
    while pos < len(adts):
        ln = ((adts[pos + 3] & 3) << 11) | (adts[pos + 4] << 3) \
            | (adts[pos + 5] >> 5)
        pos += ln
        n += 1
    assert pos == len(adts)
    assert n == 10                       # 0.2s = 9600 samples -> 10 AUs


def test_wav_roundtrip(tmp_path):
    pcm = _tone(44100, 0.3, channels=2)
    p = str(tmp_path / "t.wav")
    write_wav(p, pcm, 44100)
    assert is_wav(p)
    out, rate = read_wav(p)
    assert rate == 44100
    np.testing.assert_array_equal(out, pcm)
    with pytest.raises(WavError):
        read_wav(__file__)


def test_audio_only_preset_on_wav(tmp_path):
    """The reference's audio-only preset (-vn -c:a aac) must succeed on a
    raw PCM source (VERDICT round 1 item 9)."""
    from vcp_tpu.codec.args import parse_encode_args
    from vcp_tpu.codec.audio import extract_audio
    from vcp_tpu.codec.mp4 import Mp4Demuxer

    src = str(tmp_path / "in.wav")
    write_wav(src, _tone(48000, 0.5), 48000)
    out = str(tmp_path / "out.m4a")
    params = parse_encode_args("-vn -c:a aac -b:a 96k")
    size = extract_audio(src, out, params)
    assert size > 500
    demux = Mp4Demuxer(out)
    t = demux.audio
    assert t is not None and t.codec == "mp4a"
    assert t.sample_rate == 48000
    assert t.sample_count >= 23


def test_ffmpeg_decodes_our_aac():
    """Conformance: ffmpeg's AAC decoder must reproduce the PCM within
    the quantization budget."""
    O = pytest.importorskip("av_oracle")
    if O.get_oracle() is None:
        pytest.skip("system libavcodec unavailable")
    rate = 48000
    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, rate)
    X = np.fft.rfft(x)
    X[6000:] = 0
    x = np.fft.irfft(X, n=rate)
    pcm = (x / np.abs(x).max() * 15000).astype(np.int16)
    enc = AacEncoder(rate=rate, channels=1, bitrate=128000)
    adts = enc.adts_stream(pcm)
    out, orate = O.decode_aac(adts)
    assert orate == rate
    dec = out[:, 0] * 32768.0
    off = 1024                          # one-frame codec delay
    n = min(len(dec) - off, len(pcm))
    err = dec[off:off + n] - pcm[:n]
    snr = 10 * np.log10(np.mean(pcm[:n].astype(float) ** 2)
                        / np.mean(err ** 2))
    assert snr > 35, f"SNR {snr:.1f} dB"
