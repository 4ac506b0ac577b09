"""AAC passthrough tests (container-level; no AAC codec work)."""

import numpy as np
import pytest

from vcp_tpu.codec import mp4 as m
from vcp_tpu.codec.args import parse_encode_args
from vcp_tpu.codec.audio import AudioError, extract_aac_track, extract_audio
from vcp_tpu.codec.h264.encoder import (
    EncoderConfig, encode_file, encode_stream, mux_mp4)

from video_util import synth_video

# A plausible AudioSpecificConfig: AAC-LC, 48 kHz, stereo.
ASC = bytes([0x11, 0x90])


def _fake_aac_frames(n, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, int(rng.integers(80, 300)),
                         dtype=np.uint8).tobytes() for _ in range(n)]


@pytest.fixture(scope="module")
def av_mp4(tmp_path_factory):
    """MP4 with our video + a synthetic AAC track (passthrough fixture)."""
    d = tmp_path_factory.mktemp("audio")
    path = str(d / "av.mp4")
    frames = synth_video(64, 48, 4)
    cfg = EncoderConfig(width=64, height=48, qp=28, gop_size=4, effort=2)
    sps, pps, samples = encode_stream(iter(frames), cfg)
    aac = _fake_aac_frames(6)
    atr = m.AudioTrack(codec="aac", sample_rate=48000, channels=2,
                       timescale=48000, decoder_config=ASC)
    for f in aac:
        atr.samples.append(m.Sample(data=f, duration=1024, is_sync=True))
    mux_mp4(path, sps, pps, samples, 64, 48, 30, 1, audio_track=atr)
    return path, aac


def test_mux_and_demux_audio_track(av_mp4):
    path, aac = av_mp4
    demux = m.Mp4Demuxer(path)
    a = demux.audio
    assert a is not None and a.codec == "mp4a"
    assert a.sample_rate == 48000 and a.channels == 2
    assert a.decoder_config == ASC
    assert a.sample_count == len(aac)
    # byte-exact passthrough of every AAC access unit
    for i, frame in enumerate(aac):
        assert demux.sample(a, i) == frame
    # the file still probes as video-first with both tracks
    r = m.probe(path)
    assert r.has_video and len(r.tracks) == 2


@pytest.mark.slow
def test_transcode_carries_audio(av_mp4, tmp_path):
    path, aac = av_mp4
    out = str(tmp_path / "re.mp4")
    encode_file(path, out,
                parse_encode_args("-c:v libx264 -crf 34 -c:a aac"))
    demux = m.Mp4Demuxer(out)
    a = demux.audio
    assert a is not None and a.sample_count == len(aac)
    assert demux.sample(a, 3) == aac[3]
    assert a.decoder_config == ASC


def test_audio_only_extract(av_mp4, tmp_path):
    path, aac = av_mp4
    out = str(tmp_path / "audio.mp4")
    size = extract_audio(path, out, parse_encode_args("-vn -c:a aac -b:a 192k"))
    assert size > 0
    r = m.probe(out)
    assert not r.has_video and len(r.tracks) == 1
    demux = m.Mp4Demuxer(out)
    assert demux.audio.sample_count == len(aac)


def test_audio_only_without_audio_fails_cleanly(tmp_path):
    from test_mp4 import make_test_mp4
    p = make_test_mp4(tmp_path / "v.mp4")
    with pytest.raises(AudioError):
        extract_audio(p, str(tmp_path / "a.mp4"),
                      parse_encode_args("-vn -c:a aac"))


def test_vn_disables_passthrough(av_mp4, tmp_path):
    path, _ = av_mp4
    assert extract_aac_track(path) is not None
    out = str(tmp_path / "mute.mp4")
    encode_file(path, out, parse_encode_args("-c:v libx264 -crf 34 -an"))
    assert m.Mp4Demuxer(out).audio is None
