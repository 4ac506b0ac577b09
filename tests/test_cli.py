"""CLI surface tests: stats/clean/list-presets + encode one-shot."""

import os

import pytest

from vcp_tpu.cli import build_parser, main
from vcp_tpu.config import Config
from vcp_tpu.pipeline.clean import run_clean
from vcp_tpu.pipeline.stats import run_stats
from vcp_tpu.queue.history import HistoryManager
from vcp_tpu.queue.stream import DEFAULT_GROUP, Stream, Task

from test_mp4 import make_test_mp4


def test_parser_has_reference_commands():
    ap = build_parser()
    # vcp producer|consumer|stats|clean (ref cmd/root.go:51-56)
    for cmd in ["producer", "consumer", "stats", "clean",
                "redis-serve", "encode"]:
        assert ap.parse_args([cmd] + (
            ["x", "y"] if cmd == "encode" else [])).command == cmd


def test_list_presets(capsys):
    rc = main(["producer", "--list-presets"])
    assert rc == 0
    out = capsys.readouterr().out
    for name in ["h264-nvenc", "h265-cpu", "copy"]:
        assert name in out
    assert "-c copy" in out


def _cfg(redis_address):
    cfg = Config()
    cfg.redis.address = redis_address
    return cfg


def seed(redis_address, n=3):
    s = Stream(redis_address)
    s.create_consumer_group()
    for i in range(n):
        s.publish(Task(id=f"seed{i}", input_path=f"/s/{i}.mp4",
                       original_name=f"{i}.mp4", output_dir="/o",
                       output_name=f"{i}.mp4", ffmpeg_args="-c copy"))
    h = HistoryManager(s.client)
    h.record_task_start("seed0", "0.mp4", "/s/0.mp4", "cX")
    h.record_task_complete("seed0", "/o/0.mp4", 42)
    return s


def test_stats_default_view(redis_address):
    seed(redis_address)
    lines = []
    rc = run_stats(_cfg(redis_address), out=lines.append)
    assert rc == 0
    text = "\n".join(lines)
    assert "Queue Status" in text and "stream length : 3" in text
    assert "completed : 1" in text
    assert "seed0" in text  # recent tasks table


def test_stats_pending_and_consumer_views(redis_address):
    s = seed(redis_address)
    s.read_group(DEFAULT_GROUP, "workerZ", count=2, block=0.1)
    lines = []
    assert run_stats(_cfg(redis_address), pending=True, out=lines.append) == 0
    text = "\n".join(lines)
    assert "workerZ" in text and "Pending Tasks (2)" in text

    lines = []
    assert run_stats(_cfg(redis_address), consumer=True, out=lines.append) == 0
    text = "\n".join(lines)
    assert "gpu_encoders" in text and "workerZ" in text


def test_stats_task_detail(redis_address):
    seed(redis_address)
    lines = []
    assert run_stats(_cfg(redis_address), task="seed0", out=lines.append) == 0
    text = "\n".join(lines)
    assert "completed" in text and "42" in text
    assert run_stats(_cfg(redis_address), task="nope", out=lines.append) == 1


def test_clean_requires_confirmation(redis_address):
    seed(redis_address)
    lines = []
    rc = run_clean(_cfg(redis_address), clean_all=True, out=lines.append,
                   confirm_input=lambda prompt: "no")
    assert rc == 1
    assert Stream(redis_address).get_queue_info().length == 3


def test_clean_all_force(redis_address):
    seed(redis_address)
    lines = []
    rc = run_clean(_cfg(redis_address), clean_all=True, force=True,
                   out=lines.append)
    assert rc == 0
    s = Stream(redis_address)
    assert s.get_queue_info().length == 0
    assert HistoryManager(s.client).get_task_history("seed0") is None


def test_clean_pending(redis_address):
    s = seed(redis_address)
    s.read_group(DEFAULT_GROUP, "dead", count=3, block=0.1)
    rc = run_clean(_cfg(redis_address), pending=True, force=True,
                   out=lambda *_: None)
    assert rc == 0
    assert s.get_queue_info().pending == 0


def test_clean_consumed_trims(redis_address):
    seed(redis_address, n=5)
    import vcp_tpu.pipeline.clean as clean_mod
    old = clean_mod.TRIM_KEEP
    clean_mod.TRIM_KEEP = 2
    try:
        rc = run_clean(_cfg(redis_address), consumed=True, force=True,
                       out=lambda *_: None)
        assert rc == 0
        assert Stream(redis_address).get_queue_info().length == 2
    finally:
        clean_mod.TRIM_KEEP = old


def test_clean_no_target(redis_address):
    assert run_clean(_cfg(redis_address), out=lambda *_: None) == 1


def test_encode_cli_copy(tmp_path, capsys):
    src = make_test_mp4(tmp_path / "in.mp4")
    out = str(tmp_path / "out.mp4")
    rc = main(["encode", src, out, "-p", "copy"])
    assert rc == 0
    assert open(out, "rb").read() == open(src, "rb").read()
