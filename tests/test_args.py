"""Encode-args parser tests (preset strings from ref config.go:44-52)."""

import pytest

from vcp_tpu.codec.args import (
    ArgsError, parse_encode_args, parse_size)
from vcp_tpu.config import BUILTIN_PRESETS


def test_parse_size():
    assert parse_size("10M") == 10_000_000
    assert parse_size("128k") == 128_000
    assert parse_size("1.5M") == 1_500_000
    assert parse_size("500") == 500
    with pytest.raises(ArgsError):
        parse_size("abc")


def test_copy_preset():
    p = parse_encode_args(BUILTIN_PRESETS["copy"])
    assert p.is_copy and p.video_codec == "copy" and p.audio_codec == "copy"


def test_h264_nvenc_preset():
    p = parse_encode_args(BUILTIN_PRESETS["h264-nvenc"])
    assert p.video_codec == "h264"
    assert p.effort == 4  # p4
    assert p.bitrate == 10_000_000
    assert p.audio_codec == "aac" and p.audio_bitrate == 128_000
    assert p.faststart
    assert p.rate_mode() == "abr"


def test_h264_nvenc_hq_preset():
    p = parse_encode_args(BUILTIN_PRESETS["h264-nvenc-hq"])
    assert p.effort == 7 and p.tune == "hq"
    assert p.maxrate == 20_000_000 and p.bufsize == 30_000_000


def test_h264_cpu_crf_preset():
    p = parse_encode_args(BUILTIN_PRESETS["h264-cpu"])
    assert p.video_codec == "h264"
    assert p.crf == 23.0 and p.rate_mode() == "crf"
    assert p.effort == 5  # medium


def test_h265_presets():
    assert parse_encode_args(BUILTIN_PRESETS["h265-nvenc"]).video_codec == "h265"
    p = parse_encode_args(BUILTIN_PRESETS["h265-cpu"])
    assert p.video_codec == "h265" and p.crf == 28.0


def test_audio_only():
    # config.yaml custom preset "audio-only" (ref config.yaml:24)
    p = parse_encode_args("-vn -c:a aac -b:a 192k")
    assert p.video_disabled and p.video_codec is None
    assert p.audio_codec == "aac" and p.audio_bitrate == 192_000


def test_4k_preset_and_scale():
    p = parse_encode_args("-c:v hevc_nvenc -preset p5 -b:v 30M -maxrate 40M "
                          "-bufsize 60M -c:a aac -b:a 192k -movflags +faststart")
    assert p.video_codec == "h265" and p.effort == 5 and p.bitrate == 30_000_000
    p = parse_encode_args("-c:v libx264 -s 1280x720")
    assert (p.scale_width, p.scale_height) == (1280, 720)
    p = parse_encode_args("-c:v libx264 -vf scale=640:360")
    assert (p.scale_width, p.scale_height) == (640, 360)


def test_unknown_options_tolerated():
    p = parse_encode_args("-c:v libx264 -weird value -crf 20")
    assert p.crf == 20.0


def test_unsupported_codec_rejected():
    with pytest.raises(ArgsError):
        parse_encode_args("-c:v av1_nvenc")


def test_gop_flag():
    assert parse_encode_args("-c:v libx264 -g 60").gop_size == 60


def test_keep_aspect_scale_args():
    # ffmpeg spelling -vf scale=-2:720 keeps aspect (ADVICE round 1)
    p = parse_encode_args("-c:v libx264 -vf scale=-2:720")
    assert (p.scale_width, p.scale_height) == (-2, 720)
    p = parse_encode_args("-c:v libx264 -vf scale=1280:-1")
    assert (p.scale_width, p.scale_height) == (1280, -1)
    with pytest.raises(ArgsError):
        parse_encode_args("-c:v libx264 -vf scale=0:720")
    with pytest.raises(ArgsError):
        parse_encode_args("-c:v libx264 -vf scale=-3:720")
    with pytest.raises(ArgsError):
        parse_encode_args("-c:v libx264 -vf scale=-2:-2")
    with pytest.raises(ArgsError):
        parse_encode_args("-c:v libx264 -s -1280x720")


def test_resolve_scale():
    from vcp_tpu.codec.h264.encoder import resolve_scale
    assert resolve_scale(0, 0, 1920, 1080) is None
    assert resolve_scale(1280, 720, 1920, 1080) == (720, 1280)
    assert resolve_scale(-2, 720, 1920, 1080) == (720, 1280)
    assert resolve_scale(1280, -2, 1920, 1080) == (720, 1280)
    # odd aspect result rounds to even
    assert resolve_scale(-2, 500, 1920, 1080) == (500, 888)
