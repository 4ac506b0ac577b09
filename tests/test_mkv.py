"""MKV demux + remux-to-MP4 (copy preset for Matroska inputs)."""

import struct

import numpy as np
import pytest

from vcp_tpu.codec import mkv as mkvmod
from vcp_tpu.codec import mp4 as m
from vcp_tpu.codec.copy import stream_copy, UnsupportedContainer
from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, encode_stream
from vcp_tpu.codec.ingest import open_video

from video_util import synth_video


# --- minimal EBML writer (test fixture only) --------------------------------

def _id(eid: int) -> bytes:
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _size(n: int) -> bytes:
    # 4-byte vint size
    return struct.pack(">I", n | 0x10000000)


def _el(eid: int, payload: bytes) -> bytes:
    return _id(eid) + _size(len(payload)) + payload


def _uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def write_test_mkv(path, sps, pps, samples, width, height,
                   frame_dur_ns=33_333_333):
    """samples: list of (length-prefixed bytes, keyframe bool)."""
    avcc = bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
    avcc += struct.pack(">H", len(sps)) + sps
    avcc += bytes([1]) + struct.pack(">H", len(pps)) + pps

    video = _uint(mkvmod.PIXEL_WIDTH, width) + _uint(mkvmod.PIXEL_HEIGHT,
                                                     height)
    entry = (_uint(mkvmod.TRACK_NUMBER, 1)
             + _uint(mkvmod.TRACK_TYPE, 1)
             + _el(mkvmod.CODEC_ID, b"V_MPEG4/ISO/AVC")
             + _uint(mkvmod.DEFAULT_DURATION, frame_dur_ns)
             + _el(mkvmod.CODEC_PRIVATE, avcc)
             + _el(mkvmod.VIDEO, video))
    tracks = _el(mkvmod.TRACKS, _el(mkvmod.TRACK_ENTRY, entry))
    info = _el(mkvmod.INFO, _uint(mkvmod.TIMESTAMP_SCALE, 1_000_000))

    blocks = b""
    for i, (data, key) in enumerate(samples):
        ts_ms = i * frame_dur_ns // 1_000_000
        hdr = bytes([0x81]) + struct.pack(">h", ts_ms) + \
            bytes([0x80 if key else 0x00])
        blocks += _el(mkvmod.SIMPLE_BLOCK, hdr + data)
    cluster = _el(mkvmod.CLUSTER, _uint(mkvmod.CLUSTER_TIMESTAMP, 0) + blocks)

    ebml = _el(mkvmod.EBML_HEADER, b"")
    segment = _el(mkvmod.SEGMENT, info + tracks + cluster)
    with open(str(path), "wb") as fh:
        fh.write(ebml + segment)


@pytest.fixture(scope="module")
def mkv_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("mkv")
    frames = synth_video(64, 48, 5)
    cfg = EncoderConfig(width=64, height=48, qp=26, gop_size=3, effort=2)
    sps, pps, samples = encode_stream(iter(frames), cfg)
    lp = [(m.annexb_to_length_prefixed(au), idr) for au, idr in samples]
    path = d / "clip.mkv"
    write_test_mkv(path, sps, pps, lp, 64, 48)
    return str(path), frames


def test_demux_parses_track_and_samples(mkv_file):
    path, frames = mkv_file
    demux = mkvmod.MkvDemuxer(path)
    t = demux.video
    assert t is not None and t.codec_id == "V_MPEG4/ISO/AVC"
    assert (t.width, t.height) == (64, 48)
    assert len(t.samples) == 5
    assert t.samples[0].keyframe and not t.samples[1].keyframe
    assert t.samples[3].keyframe                # second GOP start
    assert t.samples[1].timestamp_ns == 33_000_000


def test_remux_to_mp4_and_decode(mkv_file, tmp_path):
    path, frames = mkv_file
    out = str(tmp_path / "re.mp4")
    size = mkvmod.remux_to_mp4(path, out)
    assert size > 0
    r = m.probe(out)
    assert r.valid and r.has_video and r.faststart
    assert r.video.sample_count == 5
    vid = open_video(out)
    decoded = list(vid.frames)
    assert len(decoded) == 5
    for i, (y, u, v) in enumerate(decoded):
        assert psnr(y, frames[i][0]) > 30


def test_copy_preset_handles_mkv(mkv_file, tmp_path):
    path, _ = mkv_file
    out = str(tmp_path / "copied.mp4")
    n = stream_copy(path, out)
    assert n > 0 and m.probe(out).has_video


def test_copy_rejects_unknown_and_bad_mkv(tmp_path):
    bad = tmp_path / "x.avi"
    bad.write_bytes(b"RIFF....")
    with pytest.raises(UnsupportedContainer):
        stream_copy(str(bad), str(tmp_path / "o.mp4"))
    fake = tmp_path / "y.mkv"
    fake.write_bytes(b"not ebml at all")
    with pytest.raises(UnsupportedContainer):
        stream_copy(str(fake), str(tmp_path / "o2.mp4"))


def test_ingest_decodes_mkv(mkv_file):
    path, frames = mkv_file
    vid = open_video(path)
    assert (vid.width, vid.height) == (64, 48)
    decoded = list(vid.frames)
    assert len(decoded) == 5
    assert psnr(decoded[2][0], frames[2][0]) > 30


def _audio_track_entry():
    asc = bytes([0x11, 0x90])
    audio = (_el(mkvmod.SAMPLING_FREQUENCY, struct.pack(">f", 48000.0))
             + _uint(mkvmod.CHANNELS, 2))
    return (_uint(mkvmod.TRACK_NUMBER, 2)
            + _uint(mkvmod.TRACK_TYPE, 2)
            + _el(mkvmod.CODEC_ID, b"A_AAC")
            + _el(mkvmod.CODEC_PRIVATE, asc)
            + _el(mkvmod.AUDIO, audio))


def test_remux_carries_aac_audio(tmp_path):
    """MKV with video + A_AAC audio → MP4 with both tracks, audio
    byte-exact."""
    frames = synth_video(64, 48, 3)
    cfg = EncoderConfig(width=64, height=48, qp=28, gop_size=3, effort=2)
    sps, pps, samples = encode_stream(iter(frames), cfg)
    rng = np.random.default_rng(5)
    aac = [rng.integers(0, 256, 150, dtype=np.uint8).tobytes()
           for _ in range(4)]

    # hand-build the mkv with two tracks
    avcc = bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
    avcc += struct.pack(">H", len(sps)) + sps
    avcc += bytes([1]) + struct.pack(">H", len(pps)) + pps
    video = _uint(mkvmod.PIXEL_WIDTH, 64) + _uint(mkvmod.PIXEL_HEIGHT, 48)
    ventry = (_uint(mkvmod.TRACK_NUMBER, 1) + _uint(mkvmod.TRACK_TYPE, 1)
              + _el(mkvmod.CODEC_ID, b"V_MPEG4/ISO/AVC")
              + _uint(mkvmod.DEFAULT_DURATION, 33_333_333)
              + _el(mkvmod.CODEC_PRIVATE, avcc) + _el(mkvmod.VIDEO, video))
    tracks = _el(mkvmod.TRACKS, _el(mkvmod.TRACK_ENTRY, ventry)
                 + _el(mkvmod.TRACK_ENTRY, _audio_track_entry()))
    info = _el(mkvmod.INFO, _uint(mkvmod.TIMESTAMP_SCALE, 1_000_000))
    blocks = b""
    for i, (au, key) in enumerate(samples):
        data = m.annexb_to_length_prefixed(au)
        hdr = bytes([0x81]) + struct.pack(">h", i * 33) + \
            bytes([0x80 if key else 0])
        blocks += _el(mkvmod.SIMPLE_BLOCK, hdr + data)
    for i, frame in enumerate(aac):
        hdr = bytes([0x82]) + struct.pack(">h", i * 21) + bytes([0x80])
        blocks += _el(mkvmod.SIMPLE_BLOCK, hdr + frame)
    cluster = _el(mkvmod.CLUSTER, _uint(mkvmod.CLUSTER_TIMESTAMP, 0) + blocks)
    path = str(tmp_path / "av.mkv")
    with open(path, "wb") as fh:
        fh.write(_el(mkvmod.EBML_HEADER, b"") +
                 _el(mkvmod.SEGMENT, info + tracks + cluster))

    out = str(tmp_path / "av.mp4")
    mkvmod.remux_to_mp4(path, out)
    d = m.Mp4Demuxer(out)
    assert d.video is not None and d.video.sample_count == 3
    a = d.audio
    assert a is not None and a.sample_rate == 48000 and a.channels == 2
    assert a.sample_count == 4
    for i, frame in enumerate(aac):
        assert d.sample(a, i) == frame
