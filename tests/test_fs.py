"""Filesystem helper tests (ref cmd/producer.go, cmd/consumer.go)."""

import os

from vcp_tpu.utils import fs


def test_is_video_file():
    assert fs.is_video_file("a/b/movie.MP4")
    assert fs.is_video_file("x.mkv") and fs.is_video_file("x.webm")
    assert not fs.is_video_file("x.txt")
    assert not fs.is_video_file("x.mp3")


def test_generate_output_name():
    # Always .mp4 (ref producer.go:417-425).
    assert fs.generate_output_name("clip.mkv") == "clip.mp4"
    assert fs.generate_output_name("/a/b/clip.mov", prefix="enc_") == "enc_clip.mp4"
    assert fs.generate_output_name("noext") == "noext.mp4"


def test_wait_file_stable(tmp_path):
    p = tmp_path / "f.mp4"
    p.write_bytes(b"x" * 100)
    assert fs.wait_file_stable(str(p), checks=2, interval=0.01, timeout=2)
    assert not fs.wait_file_stable(str(tmp_path / "missing"), checks=2,
                                   interval=0.01, timeout=0.1)


def test_wait_for_file_appears_later(tmp_path):
    import threading
    p = tmp_path / "late.mp4"

    def writer():
        import time
        time.sleep(0.1)
        p.write_bytes(b"data" * 64)

    threading.Thread(target=writer).start()
    assert fs.wait_for_file(str(p), timeout=5, interval=0.02, stable_checks=2)


def test_move_or_copy_and_copy_file(tmp_path):
    src = tmp_path / "src.mp4"
    src.write_bytes(b"hello" * 1000)
    dst = tmp_path / "sub" / "dst.mp4"
    fs.move_or_copy(str(src), str(dst))
    assert not src.exists()
    assert dst.read_bytes() == b"hello" * 1000


def test_format_file_size():
    assert fs.format_file_size(512) == "512B"
    assert fs.format_file_size(2048) == "2.00KB"
    assert fs.format_file_size(5 * 1024 * 1024) == "5.00MB"
    assert fs.format_file_size(3 * 1024 ** 3) == "3.00GB"
