"""H.265/HEVC encoder (in progress).

Covers the reference's ``h265-nvenc[-hq]`` / ``h265-cpu`` / ``4k-nvenc``
presets (ref config.go:47-50, config.yaml:19). The CTU/transform pipeline
lands after the H.264 engine; tasks selecting h265 fail cleanly until then
(consumer ack-and-drop semantics preserved)."""

from __future__ import annotations


def encode_file(input_path: str, output_path: str, params, deadline=None) -> int:
    raise NotImplementedError(
        "h265 engine not yet implemented in this build; use h264 presets")
