"""Rate control: CRF / ABR / CQ modes (SURVEY.md §2.5 "rate control").

Maps the reference presets' rate parameters (``-crf`` on cpu presets,
``-b:v -maxrate -bufsize`` on nvenc presets, ref config.go:44-52) onto a
per-GOP QP controller:

* **crf**: constant QP ≈ CRF (libx264's CRF is calibrated near QP for
  typical content at medium complexity).
* **abr**: proportional control on a log2 scale (rate halves per +6 QP)
  toward ``-b:v``, plus a leaky virtual buffer (VBV-like) sized by
  ``-bufsize`` and drained at ``-maxrate`` that pushes QP up under
  sustained overshoot.
* **cq**: fixed default QP.

QP is a traced argument of the device pipeline, so per-GOP changes cost
no recompilation.
"""

from __future__ import annotations

import math

import numpy as np

from ..args import EncodeParams


def initial_qp(params: EncodeParams, width: int, height: int,
               fps: float) -> int:
    if params.crf >= 0:
        return int(np.clip(round(params.crf), 0, 51))
    if params.bitrate > 0:
        bpp = params.bitrate / max(1.0, width * height * fps)
        qp = 6.0 * math.log2(1.5 / max(bpp, 1e-6))
        return int(np.clip(round(qp), 10, 51))
    return 28


class RateController:
    def __init__(self, params: EncodeParams, width: int, height: int,
                 fps: float):
        self.mode = params.rate_mode()
        self.fps = max(fps, 1e-6)
        self.target_bps = params.bitrate
        self.maxrate = params.maxrate or (params.bitrate * 2)
        self.bufsize = params.bufsize or (params.bitrate * 2)
        self.qp = initial_qp(params, width, height, fps)
        self.buffer_bits = 0.0       # virtual buffer fullness
        self.coded_bits = 0
        self.coded_frames = 0

    def gop_qp(self) -> int:
        return int(np.clip(self.qp, 0, 51))

    def update(self, gop_frames: int, gop_bytes: int) -> None:
        """Adapt QP after each GOP (no-op for crf/cq)."""
        self.coded_bits += 8 * gop_bytes
        self.coded_frames += gop_frames
        if self.mode != "abr" or self.target_bps <= 0 or gop_frames == 0:
            return
        gop_bits = 8 * gop_bytes
        target_gop_bits = self.target_bps * gop_frames / self.fps
        ratio = gop_bits / max(target_gop_bits, 1.0)
        # proportional step on the log2-rate scale, damped, clipped
        delta = 3.0 * math.log2(max(ratio, 1e-3))
        delta = float(np.clip(delta, -4.0, 4.0))
        # virtual buffer: fills with coded bits, drains at maxrate
        self.buffer_bits += gop_bits - self.maxrate * gop_frames / self.fps
        self.buffer_bits = max(0.0, self.buffer_bits)
        if self.bufsize > 0 and self.buffer_bits > 0.5 * self.bufsize:
            delta += 2.0 * self.buffer_bits / self.bufsize
        self.qp = float(np.clip(self.qp + delta, 10, 51))

    @property
    def average_bps(self) -> float:
        if self.coded_frames == 0:
            return 0.0
        return self.coded_bits * self.fps / self.coded_frames
