"""End-to-end pipeline tests: producer → mini-redis → consumer (copy path).

This exercises every distributed mechanism of the reference with zero codec
work (SURVEY.md §7 step 2 / BASELINE.json configs[0]): watch, stability
wait, move to shared storage, XADD, XREADGROUP, in-process copy, verify,
delete-source → history → ACK ordering, and ack-and-drop failure handling.
"""

import os
import time

from vcp_tpu.config import Config
from vcp_tpu.pipeline.consumer import Consumer
from vcp_tpu.pipeline.producer import Producer
from vcp_tpu.queue.history import HistoryManager
from vcp_tpu.queue.stream import DEFAULT_GROUP, Stream, Task

from test_mp4 import make_test_mp4


def make_cfg(redis_address, tmp_path) -> Config:
    cfg = Config()
    cfg.redis.address = redis_address
    cfg.producer.watch_directory = str(tmp_path / "raw")
    cfg.producer.shared_directory = str(tmp_path / "shared")
    cfg.producer.output_directory = str(tmp_path / "encoded")
    cfg.producer.ffmpeg_preset = "copy"
    cfg.consumer.file_wait_timeout = 5.0
    cfg.consumer.ffmpeg_timeout = 30.0
    return cfg


def wait_until(pred, timeout=10.0, interval=0.05):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        if pred():
            return True
        time.sleep(interval)
    return False


def test_copy_end_to_end_bit_identical(redis_address, tmp_path):
    cfg = make_cfg(redis_address, tmp_path)
    os.makedirs(cfg.producer.watch_directory)

    producer = Producer(cfg, poll_interval=0.05,
                        stability_checks=2, stability_interval=0.02)
    consumer = Consumer(cfg, name="c_test", concurrency=2)
    producer.start()
    consumer.start()
    try:
        src = make_test_mp4(tmp_path / "stage.mp4", n_samples=30)
        original = open(src, "rb").read()
        # Drop into the watch dir AFTER the watcher starts (Create event).
        dst = os.path.join(cfg.producer.watch_directory, "movie.mp4")
        os.rename(src, dst)

        out_path = os.path.join(cfg.producer.output_directory, "movie.mp4")
        assert wait_until(lambda: consumer.counters.succeeded >= 1), \
            f"counters={consumer.counters.snapshot()}"
        # byte-identical copy (north star configs[0])
        assert open(out_path, "rb").read() == original
        # shared source deleted on success (ref consumer.go:288)
        assert os.listdir(cfg.producer.shared_directory) == []
        # queue fully drained: XACK+XDEL
        s = Stream(redis_address)
        info = s.get_queue_info()
        assert info.pending == 0 and info.length == 0
        # history populated with completion
        h = HistoryManager(s.client)
        stats = h.get_stats()
        assert stats["completed"] == 1
        rec = stats["records"][0]
        assert rec.consumer == "c_test"
        assert rec.output_size == len(original)
    finally:
        consumer.stop()
        producer.stop()


def test_producer_mode_all_and_dedup(redis_address, tmp_path):
    cfg = make_cfg(redis_address, tmp_path)
    cfg.producer.watch_mode = "all"
    os.makedirs(cfg.producer.watch_directory)
    os.makedirs(cfg.producer.shared_directory)
    make_test_mp4(os.path.join(cfg.producer.watch_directory, "pre.mp4"))
    # name collision in shared storage → dedup rename (ref producer.go:378-383)
    make_test_mp4(os.path.join(cfg.producer.shared_directory, "pre.mp4"))

    producer = Producer(cfg, poll_interval=0.05)
    producer.start()
    try:
        assert producer.published == 1
        shared = os.listdir(cfg.producer.shared_directory)
        assert len(shared) == 2  # original collision + deduped new file
        deduped = [f for f in shared if f != "pre.mp4"]
        assert len(deduped) == 1 and deduped[0].startswith("pre_")
        s = Stream(redis_address)
        s.create_consumer_group()
        [task] = s.read_group(DEFAULT_GROUP, "x", block=0.2)
        assert task.original_name == "pre.mp4"
        assert task.output_name.endswith(".mp4")
        assert task.ffmpeg_args == "-c copy"
    finally:
        producer.stop()


def test_non_video_files_ignored(redis_address, tmp_path):
    cfg = make_cfg(redis_address, tmp_path)
    producer = Producer(cfg, poll_interval=0.05, stability_checks=2,
                        stability_interval=0.02)
    producer.start()
    try:
        with open(os.path.join(cfg.producer.watch_directory, "notes.txt"),
                  "w") as f:
            f.write("hello")
        time.sleep(0.3)
        assert producer.published == 0
    finally:
        producer.stop()


def test_failure_ack_and_drop_missing_input(redis_address, tmp_path):
    """Consumer semantics: any failure → remove partial output, ACK anyway,
    no retry (ref consumer.go:35 + failure branches)."""
    cfg = make_cfg(redis_address, tmp_path)
    cfg.consumer.file_wait_timeout = 0.3
    s = Stream(redis_address)
    s.create_consumer_group()
    s.publish(Task(id="ghost", input_path=str(tmp_path / "missing.mp4"),
                   original_name="missing.mp4",
                   output_dir=str(tmp_path / "enc"),
                   output_name="missing.mp4", ffmpeg_args="-c copy",
                   verify_output=True))
    consumer = Consumer(cfg, name="c_fail", concurrency=1)
    consumer.start()
    try:
        assert wait_until(lambda: consumer.counters.failed >= 1)
        # acked & dropped: nothing pending, nothing left
        info = s.get_queue_info()
        assert info.pending == 0 and info.length == 0
        # history records the failure (rebuild improvement)
        h = HistoryManager(s.client)
        rec = h.get_task_history("ghost")
        assert rec is not None and rec.status == "failed"
        assert "not visible" in rec.error
    finally:
        consumer.stop()


def test_failure_unsupported_container(redis_address, tmp_path):
    cfg = make_cfg(redis_address, tmp_path)
    bad = tmp_path / "weird.mkv"
    bad.write_bytes(b"\x1a\x45\xdf\xa3 fake matroska")
    s = Stream(redis_address)
    s.create_consumer_group()
    s.publish(Task(id="mkvtask", input_path=str(bad),
                   original_name="weird.mkv",
                   output_dir=str(tmp_path / "enc"),
                   output_name="weird.mp4", ffmpeg_args="-c copy",
                   verify_output=True))
    consumer = Consumer(cfg, name="c_mkv", concurrency=1)
    consumer.start()
    try:
        assert wait_until(lambda: consumer.counters.failed >= 1)
        # partial output removed
        assert not os.path.exists(tmp_path / "enc" / "weird.mp4")
        assert s.get_queue_info().pending == 0
    finally:
        consumer.stop()


def test_invalid_task_acked(redis_address, tmp_path):
    cfg = make_cfg(redis_address, tmp_path)
    s = Stream(redis_address)
    s.create_consumer_group()
    s.publish(Task(id="", input_path="", original_name="",
                   output_dir="", output_name="", ffmpeg_args="-c copy"))
    consumer = Consumer(cfg, name="c_inv", concurrency=1)
    consumer.start()
    try:
        assert wait_until(lambda: consumer.counters.failed >= 1)
        assert s.get_queue_info().pending == 0
    finally:
        consumer.stop()


def test_multi_consumer_distribution(redis_address, tmp_path):
    """Several consumers, one stream — the reference's multi-node story is
    N processes against one Redis (README.md:133-144)."""
    cfg = make_cfg(redis_address, tmp_path)
    os.makedirs(cfg.producer.shared_directory, exist_ok=True)
    outdir = tmp_path / "encoded"
    s = Stream(redis_address)
    s.create_consumer_group()
    n_tasks = 8
    for i in range(n_tasks):
        src = make_test_mp4(tmp_path / "shared" / f"in_{i}.mp4",
                            n_samples=3 + i)
        s.publish(Task(id=f"t{i}", input_path=str(src),
                       original_name=f"in_{i}.mp4", output_dir=str(outdir),
                       output_name=f"out_{i}.mp4", ffmpeg_args="-c copy",
                       verify_output=True))
    consumers = [Consumer(cfg, name=f"multi_{k}", concurrency=2)
                 for k in range(3)]
    for c in consumers:
        c.start()
    try:
        assert wait_until(
            lambda: sum(c.counters.succeeded for c in consumers) >= n_tasks,
            timeout=20)
        assert s.get_queue_info().pending == 0
        assert sorted(os.listdir(outdir)) == [f"out_{i}.mp4"
                                              for i in range(n_tasks)]
        # work actually distributed to >1 consumer
        busy = [c for c in consumers if c.counters.succeeded > 0]
        assert len(busy) >= 2
    finally:
        for c in consumers:
            c.stop()
