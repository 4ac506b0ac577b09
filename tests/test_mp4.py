"""MP4 mux/probe round-trip tests."""

import struct

import pytest

from vcp_tpu.codec.mp4 import (
    Mp4Writer, Sample, VideoTrack, annexb_to_length_prefixed, probe,
    split_annexb, verify_video_file)

def real_sps_pps(width, height):
    """Genuine SPS/PPS from the encoder's header writer (the deepened
    verify parses them and cross-checks dimensions)."""
    from vcp_tpu.codec.h264 import headers as H
    sp = H.SeqParams(width=width, height=height)
    return H.write_sps(sp)[4:], H.write_pps(H.PicParams())[4:]


def make_test_mp4(path, n_samples=5, faststart=True, width=64, height=48):
    sps, pps = real_sps_pps(width, height)
    w = Mp4Writer()
    tr = VideoTrack(codec="h264", width=width, height=height, timescale=30000,
                    sps=[sps], pps=[pps])
    for i in range(n_samples):
        nal = bytes([0x65 if i == 0 else 0x41]) + bytes(20 + i)
        tr.samples.append(Sample(
            data=struct.pack(">I", len(nal)) + nal,
            duration=1000, is_sync=(i == 0)))
    w.add_track(tr)
    w.write(str(path), faststart=faststart)
    return str(path)


def test_mux_probe_roundtrip(tmp_path):
    p = make_test_mp4(tmp_path / "a.mp4")
    r = probe(p)
    assert r.valid and r.has_video
    v = r.video
    assert v.codec == "avc1"
    assert (v.width, v.height) == (64, 48)
    assert v.sample_count == 5
    assert v.timescale == 30000
    assert r.faststart
    assert abs(r.duration_sec - 5 * 1000 / 30000) < 0.01


def test_faststart_vs_not(tmp_path):
    fast = make_test_mp4(tmp_path / "fast.mp4", faststart=True)
    slow = make_test_mp4(tmp_path / "slow.mp4", faststart=False)
    assert probe(fast).faststart is True
    assert probe(slow).faststart is False
    # both decodable/probable either way
    assert probe(slow).has_video


def test_verify_video_file(tmp_path):
    good = make_test_mp4(tmp_path / "good.mp4")
    ok, reason = verify_video_file(good)
    assert ok, reason

    empty = tmp_path / "empty.mp4"
    empty.write_bytes(b"")
    ok, reason = verify_video_file(str(empty))
    assert not ok and "empty" in reason

    junk = tmp_path / "junk.mp4"
    junk.write_bytes(b"this is not an mp4 at all" * 10)
    ok, reason = verify_video_file(str(junk))
    assert not ok


def test_annexb_split_and_convert():
    nal1, nal2 = b"\x67\x11\x22", b"\x65\x99\x88\x77"
    stream = b"\x00\x00\x00\x01" + nal1 + b"\x00\x00\x01" + nal2
    assert split_annexb(stream) == [nal1, nal2]
    lp = annexb_to_length_prefixed(stream)
    assert lp == (struct.pack(">I", 3) + nal1 + struct.pack(">I", 4) + nal2)


def test_writer_requires_sps():
    w = Mp4Writer()
    tr = VideoTrack(codec="h264", width=16, height=16, timescale=1000)
    tr.samples.append(Sample(data=b"\x00\x00\x00\x01a", duration=100))
    w.add_track(tr)
    with pytest.raises(Exception):
        w.write("/tmp/never.mp4")


def test_verify_checks_codec_config(tmp_path):
    """The deepened verify rejects avc1 tracks whose SPS contradicts the
    container geometry."""
    p = str(tmp_path / "lie.mp4")
    sps, pps = real_sps_pps(128, 128)       # SPS says 128x128
    w = Mp4Writer()
    tr = VideoTrack(codec="h264", width=64, height=48, timescale=30000,
                    sps=[sps], pps=[pps])
    nal = bytes([0x65]) + bytes(20)
    tr.samples.append(Sample(data=struct.pack(">I", len(nal)) + nal,
                             duration=1000))
    w.add_track(tr)
    w.write(p)
    ok, reason = verify_video_file(p)
    assert not ok and "SPS dims" in reason
