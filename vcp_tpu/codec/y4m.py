"""YUV4MPEG2 (.y4m) reader/writer.

Raw-frame interchange format used for encoder input/output testing and for
benchmark inputs (the image has no ffmpeg to decode real videos, and the
encoder's device pipeline consumes planar YUV 4:2:0 anyway). Not part of
the reference (it delegated decode to ffmpeg's ``-i``); this is the
rebuild's raw-frame ingest boundary.
"""

from __future__ import annotations

import dataclasses

import numpy as np

MAGIC = b"YUV4MPEG2"


class Y4mError(ValueError):
    pass


@dataclasses.dataclass
class Y4mVideo:
    width: int
    height: int
    fps_num: int
    fps_den: int
    frames: np.ndarray        # (N, H*3//2, W) uint8 planar 4:2:0 stacked
    # layout: rows [0:H] = Y, [H:H+H//4...] -- we instead keep separate planes
    # via helpers below.

    @property
    def num_frames(self) -> int:
        return self.frames.shape[0]

    def planes(self, i: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Return (Y, U, V) planes of frame i."""
        w, h = self.width, self.height
        flat = self.frames[i].reshape(-1)
        y = flat[: w * h].reshape(h, w)
        u = flat[w * h: w * h + (w // 2) * (h // 2)].reshape(h // 2, w // 2)
        v = flat[w * h + (w // 2) * (h // 2):].reshape(h // 2, w // 2)
        return y, u, v


def read_y4m(path: str, max_frames: int | None = None) -> Y4mVideo:
    with open(path, "rb") as fh:
        header = bytearray()
        while True:
            c = fh.read(1)
            if not c:
                raise Y4mError("truncated y4m header")
            if c == b"\n":
                break
            header += c
        parts = bytes(header).split(b" ")
        if parts[0] != MAGIC:
            raise Y4mError("not a y4m file")
        w = h = 0
        fn, fd = 30, 1
        for p in parts[1:]:
            if not p:
                continue
            tag, val = p[:1], p[1:]
            if tag == b"W":
                w = int(val)
            elif tag == b"H":
                h = int(val)
            elif tag == b"F":
                fn, fd = (int(x) for x in val.split(b":"))
            elif tag == b"C" and not val.startswith(b"420"):
                raise Y4mError(f"only 4:2:0 supported, got {val!r}")
        if w <= 0 or h <= 0:
            raise Y4mError("missing W/H")
        frame_size = w * h + 2 * (w // 2) * (h // 2)
        frames = []
        while max_frames is None or len(frames) < max_frames:
            line = bytearray()
            c = fh.read(1)
            if not c:
                break
            while c != b"\n":
                line += c
                c = fh.read(1)
                if not c:
                    raise Y4mError("truncated FRAME header")
            if not bytes(line).startswith(b"FRAME"):
                raise Y4mError(f"expected FRAME, got {bytes(line)!r}")
            data = fh.read(frame_size)
            if len(data) != frame_size:
                raise Y4mError("truncated frame payload")
            frames.append(np.frombuffer(data, np.uint8))
        if not frames:
            raise Y4mError("no frames")
        return Y4mVideo(w, h, fn, fd, np.stack(frames).reshape(
            len(frames), -1))


def write_y4m(path: str, frames_yuv: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
              fps_num: int = 30, fps_den: int = 1) -> None:
    """frames_yuv: list of (Y[h,w], U[h/2,w/2], V[h/2,w/2]) uint8 planes."""
    y0 = frames_yuv[0][0]
    h, w = y0.shape
    with open(path, "wb") as fh:
        fh.write(b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n"
                 % (w, h, fps_num, fps_den))
        for y, u, v in frames_yuv:
            fh.write(b"FRAME\n")
            fh.write(np.ascontiguousarray(y, np.uint8).tobytes())
            fh.write(np.ascontiguousarray(u, np.uint8).tobytes())
            fh.write(np.ascontiguousarray(v, np.uint8).tobytes())
