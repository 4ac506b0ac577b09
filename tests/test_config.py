"""Config + preset resolution tests (ref internal/config/config.go,
cmd/producer.go:236-274)."""

import pytest

from vcp_tpu.config import (
    BUILTIN_PRESETS, Config, load_config, resolve_encode_args)


def test_defaults_without_file():
    cfg = load_config(None)
    assert cfg.redis.address == "localhost:6379"
    assert cfg.consumer.concurrency == 1
    assert cfg.producer.watch_mode == "new"
    assert cfg.producer.ffmpeg_preset == "h264-nvenc"
    assert cfg.redis.stream_max_length == 1000
    assert cfg.redis.publish_rate_limit == 100
    assert cfg.consumer.ffmpeg_timeout == 3600.0
    assert cfg.consumer.file_wait_timeout == 30.0


def test_builtin_preset_table_complete():
    # The 7 builtin presets (ref config.go:44-52).
    assert set(BUILTIN_PRESETS) == {
        "h264-nvenc", "h264-nvenc-hq", "h265-nvenc", "h265-nvenc-hq",
        "h264-cpu", "h265-cpu", "copy"}
    assert BUILTIN_PRESETS["copy"] == "-c copy"
    assert "-crf 23" in BUILTIN_PRESETS["h264-cpu"]


def test_yaml_parse_and_custom_preset_override(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text("""
redis:
  address: "127.0.0.1:7777"
  db: 7
  stream_max_length: 500
  publish_rate_limit: 50
presets:
  4k-nvenc: "-c:v hevc_nvenc -preset p5 -b:v 30M"
  h264-nvenc: "-c:v h264_nvenc -preset p6 -b:v 12M"
producer:
  watch_directory: "/data/raw"
  shared_directory: "/mnt/shared"
  output_directory: "/data/out"
  watch_mode: "all"
consumer:
  concurrency: 4
  ffmpeg_timeout: 120
  verify_output: false
""")
    cfg = load_config(str(p))
    assert cfg.redis.address == "127.0.0.1:7777"
    assert cfg.redis.db == 7
    assert cfg.redis.stream_max_length == 500
    assert cfg.redis.publish_rate_limit == 50
    assert cfg.producer.watch_mode == "all"
    assert cfg.consumer.concurrency == 4
    assert cfg.consumer.ffmpeg_timeout == 120.0
    assert cfg.consumer.verify_output is False
    # custom preset overrides builtin (ref config.go:89-101)
    assert cfg.get_preset("h264-nvenc") == "-c:v h264_nvenc -preset p6 -b:v 12M"
    assert cfg.get_preset("4k-nvenc") == "-c:v hevc_nvenc -preset p5 -b:v 30M"
    # builtins still visible through the merged view
    merged = cfg.get_all_presets()
    assert "h265-cpu" in merged and "4k-nvenc" in merged


def test_resolution_priority_chain():
    cfg = Config()
    cfg.presets = {"mine": "-c:v custom"}
    cfg.producer.ffmpeg_args = "-c:v cfgargs"
    cfg.producer.ffmpeg_preset = "h265-cpu"

    # 1. CLI args beat everything
    args, src = resolve_encode_args(cfg, cli_args="-c:v cliargs",
                                    cli_preset="mine")
    assert args == "-c:v cliargs" and src == "cli:ffmpeg-args"
    # 2. CLI preset beats config
    args, src = resolve_encode_args(cfg, cli_preset="mine")
    assert args == "-c:v custom"
    # 3. config ffmpeg_args beats config preset
    args, src = resolve_encode_args(cfg)
    assert args == "-c:v cfgargs"
    # 4. config preset
    cfg.producer.ffmpeg_args = ""
    args, src = resolve_encode_args(cfg)
    assert args == BUILTIN_PRESETS["h265-cpu"]
    # 5. default
    cfg.producer.ffmpeg_preset = ""
    args, src = resolve_encode_args(cfg)
    assert args == BUILTIN_PRESETS["h264-nvenc"]
    assert src.startswith("default")


def test_unknown_preset_raises():
    with pytest.raises(KeyError):
        resolve_encode_args(Config(), cli_preset="nope")
