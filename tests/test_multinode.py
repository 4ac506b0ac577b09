"""BASELINE configs[4] at test scale: 2 producers (mixed presets) x
multiple consumers -j2 with the stats/clean lifecycle.

The reference's multi-node story is N processes against one Redis
(README.md:133-144); localhost multi-instance is the faithful simulation
(SURVEY.md §4)."""

import os

import numpy as np
import pytest

from vcp_tpu.codec import mp4 as m
from vcp_tpu.config import Config
from vcp_tpu.pipeline.clean import run_clean
from vcp_tpu.pipeline.consumer import Consumer
from vcp_tpu.pipeline.producer import Producer
from vcp_tpu.pipeline.stats import run_stats
from vcp_tpu.queue.stream import Stream

from test_mp4 import make_test_mp4
from test_pipeline import wait_until
from video_util import synth_video


@pytest.mark.slow
def test_two_producers_mixed_presets_four_consumers(redis_address, tmp_path):
    shared = str(tmp_path / "shared")
    outdir = str(tmp_path / "encoded")

    def producer_cfg(idx, preset_args):
        cfg = Config()
        cfg.redis.address = redis_address
        cfg.producer.watch_directory = str(tmp_path / f"raw{idx}")
        cfg.producer.shared_directory = shared
        cfg.producer.output_directory = outdir
        cfg.producer.ffmpeg_args = preset_args
        cfg.producer.watch_mode = "all"
        cfg.consumer.file_wait_timeout = 5.0
        # generous: first-compile of the encoder geometry under full-suite
        # CPU contention can exceed two minutes
        cfg.consumer.ffmpeg_timeout = 600.0
        return cfg

    # producer 0: copy preset over mp4 inputs
    cfg0 = producer_cfg(0, "-c copy")
    os.makedirs(cfg0.producer.watch_directory)
    originals = {}
    for i in range(3):
        p = make_test_mp4(os.path.join(cfg0.producer.watch_directory,
                                       f"copy_{i}.mp4"), n_samples=4 + i)
        originals[f"copy_{i}.mp4"] = open(p, "rb").read()

    # producer 1: h264 encode over y4m inputs
    cfg1 = producer_cfg(1, "-c:v libx264 -crf 30 -g 4")
    os.makedirs(cfg1.producer.watch_directory)
    from vcp_tpu.codec.y4m import write_y4m
    for i in range(2):
        write_y4m(os.path.join(cfg1.producer.watch_directory,
                               f"enc_{i}.y4m"), synth_video(48, 48, 4))

    # --mode all publishes existing files at start
    p0 = Producer(cfg0, poll_interval=0.05)
    p1 = Producer(cfg1, poll_interval=0.05)
    consumers = [Consumer(cfg0, name=f"node{k}", concurrency=2)
                 for k in range(4)]
    p0.start()
    p1.start()
    for c in consumers:
        c.start()
    try:
        assert wait_until(
            lambda: sum(c.counters.succeeded for c in consumers) >= 5,
            timeout=600), [c.counters.snapshot() for c in consumers]
        # copy outputs byte-identical
        for name, data in originals.items():
            assert open(os.path.join(outdir, name), "rb").read() == data
        # encoded outputs valid h264 mp4s
        for i in range(2):
            r = m.probe(os.path.join(outdir, f"enc_{i}.mp4"))
            assert r.valid and r.video.codec == "avc1"
        # queue fully drained
        s = Stream(redis_address)
        info = s.get_queue_info()
        assert info.pending == 0 and info.length == 0
        # exactly-once delivery across the group: 5 tasks, 5 successes
        # total, no duplicates. (Spread across consumers is NOT a group
        # guarantee — a fast first reader with a 2x-concurrency buffer
        # can legitimately claim every task, and intermittently does.)
        assert sum(c.counters.succeeded for c in consumers) == 5
        assert sum(c.counters.processed for c in consumers) == 5

        # stats lifecycle: history reflects all 5 tasks + dispatch p50
        lines = []
        assert run_stats(cfg0, out=lines.append) == 0
        text = "\n".join(lines)
        assert "completed : 5" in text
        assert "p50 dispatch:" in text

        # clean lifecycle
        assert run_clean(cfg0, clean_all=True, force=True,
                         out=lambda *_: None) == 0
        lines = []
        run_stats(cfg0, out=lines.append)
        assert "total     : 0" in "\n".join(lines)
    finally:
        for c in consumers:
            c.stop()
        p0.stop()
        p1.stop()
