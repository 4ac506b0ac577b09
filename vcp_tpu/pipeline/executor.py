"""Task executor: the in-process replacement for the reference's
``runFFmpegWithTimeout`` fork/exec boundary (ref cmd/consumer.go:370-394).

Dispatches the task's ffmpeg-style argument string (parsed by
``vcp_tpu.codec.args``) to the right engine:

* ``-c copy``           → byte-identical stream copy (codec.copy)
* ``-c:v h264_*``       → TPU H.264 encoder (codec.h264)
* ``-c:v hevc_*``       → TPU H.265 encoder (codec.h265)
* ``-vn -c:a aac``      → audio-only extract/encode

Timeouts are cooperative: engines receive a monotonic deadline and abort
between work units (chunks/GOPs), standing in for the reference's
60-minute process kill (consumer.go:262).
"""

from __future__ import annotations

import time

from ..codec import copy as copycodec
from ..codec.args import ArgsError, EncodeParams, parse_encode_args


class EncodeError(RuntimeError):
    pass


def execute(input_path: str, output_path: str, ffmpeg_args: str,
            timeout: float = 3600.0) -> int:
    """Run one task's encode. Returns output size in bytes; raises
    :class:`EncodeError` on any failure (consumer acks-and-drops)."""
    deadline = time.monotonic() + timeout
    try:
        params = parse_encode_args(ffmpeg_args)
    except ArgsError as e:
        raise EncodeError(f"bad encode args: {e}") from e
    try:
        return _dispatch(input_path, output_path, params, deadline)
    except EncodeError:
        raise
    except copycodec.CopyError as e:
        raise EncodeError(str(e)) from e
    except Exception as e:
        raise EncodeError(f"{type(e).__name__}: {e}") from e


def _dispatch(input_path: str, output_path: str, params: EncodeParams,
              deadline: float) -> int:
    if params.is_copy:
        return copycodec.stream_copy(input_path, output_path, deadline)
    if params.video_disabled:
        from ..codec import audio
        return audio.extract_audio(input_path, output_path, params, deadline)
    if params.video_codec == "h264":
        from ..codec.h264 import encoder as h264
        return h264.encode_file(input_path, output_path, params, deadline)
    if params.video_codec == "h265":
        from ..codec.h265 import encoder as h265
        return h265.encode_file(input_path, output_path, params, deadline)
    raise EncodeError(f"no engine for video codec {params.video_codec!r}")
