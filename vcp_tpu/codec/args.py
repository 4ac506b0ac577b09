"""FFmpeg-style argument string → encoder parameters.

The task wire format carries the reference's ffmpeg argument strings
verbatim (presets like ``-c:v h264_nvenc -preset p4 -b:v 10M -c:a aac
-b:a 128k -movflags +faststart``, ref internal/config/config.go:44-52), so
existing configs and the 5-level priority chain carry over unchanged. The
consumer no longer shells out to ffmpeg (ref cmd/consumer.go:370-394);
instead this module parses the string into :class:`EncodeParams` consumed by
the in-process TPU encoder.

Codec name mapping: ``h264_nvenc``/``libx264`` → the h264 engine,
``hevc_nvenc``/``libx265`` → the h265 engine — the *engine* is always the
TPU encoder; nvenc/cpu spellings select speed/quality tiers analogous to
their ffmpeg meanings (p1-p7 / ultrafast..placebo).
"""

from __future__ import annotations

import dataclasses
import shlex


class ArgsError(ValueError):
    pass


def parse_size(s: str) -> int:
    """'10M' → 10_000_000, '128k' → 128_000, '500' → 500."""
    s = s.strip()
    mult = 1
    if s and s[-1] in "kKmMgG":
        mult = {"k": 10**3, "m": 10**6, "g": 10**9}[s[-1].lower()]
        s = s[:-1]
    try:
        return int(float(s) * mult)
    except ValueError as e:
        raise ArgsError(f"bad size: {s!r}") from e


# ffmpeg nvenc p1..p7 and x264-style named presets → a unified 0..9 effort
# scale used by the encoder's mode-decision/search depth.
_PRESET_EFFORT = {
    "p1": 1, "p2": 2, "p3": 3, "p4": 4, "p5": 5, "p6": 6, "p7": 7,
    "ultrafast": 0, "superfast": 1, "veryfast": 2, "faster": 3, "fast": 4,
    "medium": 5, "slow": 6, "slower": 7, "veryslow": 8, "placebo": 9,
}

_VIDEO_CODECS = {
    "h264_nvenc": "h264", "libx264": "h264", "h264": "h264",
    "hevc_nvenc": "h265", "libx265": "h265", "hevc": "h265", "h265": "h265",
    "copy": "copy",
}

_AUDIO_CODECS = {"aac": "aac", "copy": "copy"}


@dataclasses.dataclass
class EncodeParams:
    """Fully-resolved encode configuration for one task."""
    # video
    video_codec: str | None = None      # "h264" | "h265" | "copy" | None(disabled)
    video_disabled: bool = False        # -vn
    effort: int = 4                     # unified 0..9 speed/quality effort
    preset_name: str = ""               # raw preset string for logging
    tune: str = ""
    bitrate: int = 0                    # -b:v, bits/sec (0 = unset)
    maxrate: int = 0
    bufsize: int = 0
    crf: float = -1.0                   # -crf (negative = unset)
    gop_size: int = 0                   # -g (0 = encoder default)
    bframes: int = -1                   # -bf (-1 = encoder default)
    # audio
    audio_codec: str | None = None      # "aac" | "copy" | None
    audio_disabled: bool = False        # -an
    audio_bitrate: int = 0
    # container
    faststart: bool = False             # -movflags +faststart
    # resolution override (-s WxH or -vf scale=)
    scale_width: int = 0
    scale_height: int = 0

    @property
    def is_copy(self) -> bool:
        return self.video_codec == "copy"

    def rate_mode(self) -> str:
        """'crf' | 'abr' | 'cq' (constant quality default)."""
        if self.crf >= 0:
            return "crf"
        if self.bitrate > 0:
            return "abr"
        return "cq"


def parse_encode_args(args: str) -> EncodeParams:
    """Parse an ffmpeg-style argument string into EncodeParams.

    Unknown options are skipped with their value (ffmpeg options are
    ``-opt value`` pairs except for a small flag set), matching the
    reference's pass-through tolerance: it never validated the string, it
    handed it to ffmpeg (ref consumer.go:376-380).
    """
    p = EncodeParams()
    toks = shlex.split(args or "")
    flag_opts = {"-an", "-vn", "-y", "-hide_banner", "-sn", "-dn"}
    i = 0
    while i < len(toks):
        t = toks[i]
        nxt = toks[i + 1] if i + 1 < len(toks) else None

        def need() -> str:
            if nxt is None:
                raise ArgsError(f"option {t} missing value")
            return nxt

        if t in ("-c", "-codec"):
            v = need()
            if v == "copy":
                p.video_codec = "copy"
                p.audio_codec = "copy"
            else:
                p.video_codec = _VIDEO_CODECS.get(v, v)
            i += 2
        elif t in ("-c:v", "-codec:v", "-vcodec"):
            v = need()
            if v not in _VIDEO_CODECS:
                raise ArgsError(f"unsupported video codec: {v}")
            p.video_codec = _VIDEO_CODECS[v]
            i += 2
        elif t in ("-c:a", "-codec:a", "-acodec"):
            v = need()
            if v not in _AUDIO_CODECS:
                raise ArgsError(f"unsupported audio codec: {v}")
            p.audio_codec = _AUDIO_CODECS[v]
            i += 2
        elif t == "-preset":
            v = need()
            p.preset_name = v
            p.effort = _PRESET_EFFORT.get(v, 4)
            i += 2
        elif t == "-tune":
            p.tune = need()
            i += 2
        elif t == "-b:v":
            p.bitrate = parse_size(need())
            i += 2
        elif t == "-maxrate":
            p.maxrate = parse_size(need())
            i += 2
        elif t == "-bufsize":
            p.bufsize = parse_size(need())
            i += 2
        elif t == "-crf":
            p.crf = float(need())
            i += 2
        elif t == "-g":
            p.gop_size = int(need())
            i += 2
        elif t == "-bf":
            p.bframes = int(need())
            i += 2
        elif t == "-b:a":
            p.audio_bitrate = parse_size(need())
            i += 2
        elif t == "-movflags":
            v = need()
            if "faststart" in v:
                p.faststart = True
            i += 2
        elif t == "-s":
            v = need()
            if "x" in v:
                w, h = v.split("x", 1)
                w, h = int(w), int(h)
                if w <= 0 or h <= 0:
                    raise ArgsError(f"-s {v}: dimensions must be positive")
                p.scale_width, p.scale_height = w, h
            i += 2
        elif t == "-vf":
            v = need()
            if v.startswith("scale="):
                parts = v[len("scale="):].split(":")
                if len(parts) >= 2:
                    w, h = int(parts[0]), int(parts[1])
                    # ffmpeg keep-aspect spellings: -1 (exact) and -2
                    # (round to even) are resolved against the source
                    # dims at encode time (encoder.resolve_scale).
                    if (w <= 0 and w not in (-1, -2)) or \
                       (h <= 0 and h not in (-1, -2)) or \
                       (w <= 0 and h <= 0):
                        raise ArgsError(
                            f"-vf {v}: bad scale target ({w}:{h})")
                    p.scale_width, p.scale_height = w, h
            i += 2
        elif t == "-vn":
            p.video_disabled = True
            p.video_codec = None
            i += 1
        elif t == "-an":
            p.audio_disabled = True
            p.audio_codec = None
            i += 1
        elif t in flag_opts:
            i += 1
        else:
            # Unknown "-opt value" pair (or bare token): skip tolerantly.
            if t.startswith("-") and nxt is not None and not nxt.startswith("-"):
                i += 2
            else:
                i += 1
    return p
