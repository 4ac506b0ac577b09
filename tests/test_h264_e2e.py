"""End-to-end H.264 encode through the distributed pipeline:
y4m file → producer → redis → consumer → TPU encoder → MP4 → verify."""

import os

import numpy as np
import pytest

from vcp_tpu.codec import mp4 as mp4mod
from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.y4m import write_y4m, read_y4m
from vcp_tpu.pipeline import executor
from vcp_tpu.pipeline.consumer import Consumer
from vcp_tpu.queue.stream import Stream, Task

from test_pipeline import make_cfg, wait_until
from video_util import synth_video


def make_y4m(path, w=64, h=48, n=4):
    frames = synth_video(w, h, n)
    write_y4m(str(path), frames, fps_num=30)
    return frames


def test_y4m_roundtrip(tmp_path):
    p = tmp_path / "a.y4m"
    frames = make_y4m(p)
    vid = read_y4m(str(p))
    assert vid.num_frames == 4 and (vid.width, vid.height) == (64, 48)
    y, u, v = vid.planes(2)
    np.testing.assert_array_equal(y, frames[2][0])
    np.testing.assert_array_equal(v, frames[2][2])


def test_executor_h264_produces_valid_mp4(tmp_path):
    src = tmp_path / "in.y4m"
    frames = make_y4m(src, n=5)
    out = str(tmp_path / "out.mp4")
    size = executor.execute(str(src), out,
                            "-c:v libx264 -crf 26 -movflags +faststart",
                            timeout=300)
    assert size > 0
    r = mp4mod.probe(out)
    assert r.valid and r.has_video and r.faststart
    v = r.video
    assert v.codec == "avc1" and (v.width, v.height) == (64, 48)
    assert v.sample_count == 5

    # decode the mp4 samples with the in-repo decoder; PSNR sanity
    buf = open(out, "rb").read()
    # extract avcC sps/pps + samples via the demuxer-lite path: use annexb
    # reconstruction from the track (length-prefixed → raw NALs)
    from vcp_tpu.codec.mp4 import find_box, iter_boxes
    import struct
    # pull sps/pps from avcC
    stsd = find_box(buf, [b"moov", b"trak", b"mdia", b"minf", b"stbl",
                          b"stsd"])
    avcc = None
    for btype, ps, pe in iter_boxes(buf, stsd[0] + 8, stsd[1]):
        if btype == b"avc1":
            sub = find_box(buf, [b"avcC"], ps + 78, pe)
            avcc = buf[sub[0]:sub[1]]
    assert avcc is not None
    n_sps = avcc[5] & 0x1F
    off = 6
    nals = []
    for _ in range(n_sps):
        ln = struct.unpack_from(">H", avcc, off)[0]
        nals.append(avcc[off + 2:off + 2 + ln])
        off += 2 + ln
    n_pps = avcc[off]
    off += 1
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", avcc, off)[0]
        nals.append(avcc[off + 2:off + 2 + ln])
        off += 2 + ln
    mdat = find_box(buf, [b"mdat"])
    pos = mdat[0]
    while pos + 4 <= mdat[1]:
        ln = struct.unpack_from(">I", buf, pos)[0]
        nals.append(buf[pos + 4:pos + 4 + ln])
        pos += 4 + ln
    dec = H264Decoder()
    decoded = dec.decode_nals(nals)
    assert len(decoded) == 5
    for i, f in enumerate(decoded):
        assert psnr(f.y, frames[i][0]) > 30


def test_h264_task_through_pipeline(redis_address, tmp_path):
    cfg = make_cfg(redis_address, tmp_path)
    os.makedirs(cfg.producer.shared_directory, exist_ok=True)
    src = os.path.join(cfg.producer.shared_directory, "clip.y4m")
    make_y4m(src, n=3)
    s = Stream(redis_address)
    s.create_consumer_group()
    s.publish(Task(id="enc1", input_path=src, original_name="clip.y4m",
                   output_dir=cfg.producer.output_directory,
                   output_name="clip.mp4",
                   ffmpeg_args="-c:v libx264 -crf 28 -movflags +faststart",
                   verify_output=True))
    c = Consumer(cfg, name="tpu0", concurrency=1)
    c.start()
    try:
        assert wait_until(lambda: c.counters.succeeded >= 1, timeout=120), \
            c.counters.snapshot()
        out = os.path.join(cfg.producer.output_directory, "clip.mp4")
        r = mp4mod.probe(out)
        assert r.valid and r.has_video
        # source deleted, queue drained (ref consumer.go:287-306)
        assert not os.path.exists(src)
        assert s.get_queue_info().length == 0
    finally:
        c.stop()


def test_h265_task_succeeds(redis_address, tmp_path):
    """hevc_nvenc preset tasks encode in-process since round 2
    (ref config.go:47; was ack-and-drop-failure in round 1)."""
    cfg = make_cfg(redis_address, tmp_path)
    os.makedirs(cfg.producer.shared_directory, exist_ok=True)
    src = os.path.join(cfg.producer.shared_directory, "c.y4m")
    make_y4m(src, n=2)
    s = Stream(redis_address)
    s.create_consumer_group()
    s.publish(Task(id="h265task", input_path=src, original_name="c.y4m",
                   output_dir=cfg.producer.output_directory,
                   output_name="c.mp4",
                   ffmpeg_args="-c:v hevc_nvenc -preset p4 -b:v 8M",
                   verify_output=True))
    c = Consumer(cfg, name="tpu1", concurrency=1)
    c.start()
    try:
        assert wait_until(lambda: c.counters.succeeded >= 1, timeout=120)
        assert s.get_queue_info().pending == 0
        out = os.path.join(cfg.producer.output_directory, "c.mp4")
        from vcp_tpu.codec.h265.decoder import decode_mp4
        assert len(list(decode_mp4(out))) == 2
    finally:
        c.stop()
