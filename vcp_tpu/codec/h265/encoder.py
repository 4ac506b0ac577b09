"""H.265/HEVC encoder.

Serves the reference's ``h265-nvenc[-hq]`` / ``h265-cpu`` / ``4k-nvenc``
presets (ref internal/config/config.go:47-50, config.yaml:19) with an
in-process TPU engine instead of exec'ing ffmpeg/libx265 (ref
cmd/consumer.go:370-394).

Architecture (mirrors the H.264 engine, codec.h264.encoder):

* device (jit, frame_ops): CTU intra/inter prediction, 32/16 transforms
  on the MXU, quantization, closed-loop reconstruction (recon stays
  device-resident across the GOP);
* host: CABAC slice syntax (syntax/residual), NAL framing (headers),
  MP4 mux as ``hvc1`` (codec.mp4).

Frames pad to 32-px CTU multiples with an SPS conformance window
cropping back to the true size. Closed loop is bit-exact with the
in-repo validation decoder (codec.h265.decoder).
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from ...utils.bitstream import BitWriter
from ..args import EncodeParams
from ...ops.transform_hevc import chroma_qp
from . import frame_ops, headers, syntax


class EncodeAbort(RuntimeError):
    pass


@dataclasses.dataclass
class HevcEncoderConfig:
    width: int
    height: int
    fps_num: int = 30
    fps_den: int = 1
    qp: int = 32
    gop_size: int = 30
    effort: int = 4
    rd_intra: bool | None = None   # per-CTU RD mode selection over the
                                   # full MODESET (None = auto: quality
                                   # presets, effort >= 5)
    params: EncodeParams | None = None

    def use_rd_intra(self) -> bool:
        if os.environ.get("VCP_HEVC_RDI"):
            return os.environ["VCP_HEVC_RDI"] != "0"
        if self.rd_intra is not None:
            return self.rd_intra
        return self.effort >= 5

    @classmethod
    def from_params(cls, params: EncodeParams, width: int, height: int,
                    fps_num: int, fps_den: int) -> "HevcEncoderConfig":
        cfg = cls(width=width, height=height, fps_num=fps_num,
                  fps_den=fps_den, effort=params.effort)
        if params.gop_size:
            cfg.gop_size = params.gop_size
        else:
            fps = fps_num / max(1, fps_den)
            cfg.gop_size = max(1, int(round(fps)))
        # HEVC runs ~ the same subjective quality one QP-step cheaper
        # than H.264 (the reference presets encode CRF 28 for libx265 vs
        # 23 for libx264, a +5 offset on the same ladder)
        from ..h264.ratecontrol import initial_qp
        cfg.qp = min(51, initial_qp(params, width, height,
                                    fps_num / max(1, fps_den)))
        cfg.params = params
        return cfg


def _pad_plane(p: np.ndarray, mult: int) -> np.ndarray:
    h, w = p.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if not ph and not pw:
        return np.ascontiguousarray(p)
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def search_range_for_effort(effort: int) -> int:
    return {1: 4, 2: 4, 3: 6, 4: 8, 5: 12, 6: 12, 7: 16}.get(
        min(max(effort, 1), 7), 8)


class HevcEncoder:
    """Stateful per-task encoder: feeds frames, emits Annex-B AUs."""

    def __init__(self, cfg: HevcEncoderConfig):
        self.cfg = cfg
        pw = cfg.width + ((-cfg.width) % 32)
        ph = cfg.height + ((-cfg.height) % 32)
        self.hp = headers.HevcParams(
            width=pw, height=ph, qp=cfg.qp, log2_ctu=5,
            conf_win_right=pw - cfg.width,
            conf_win_bottom=ph - cfg.height)
        self.frame_index = 0
        self.poc = 0
        self._recon = None
        self.rc = None
        if cfg.params is not None and cfg.params.rate_mode() == "abr":
            from ..h264.ratecontrol import RateController
            self.rc = RateController(cfg.params, cfg.width, cfg.height,
                                     cfg.fps_num / max(1, cfg.fps_den))

    # -- parameter sets ---------------------------------------------------
    def headers_annexb(self) -> bytes:
        return (headers.write_vps(self.hp) + headers.write_sps(self.hp)
                + headers.write_pps(self.hp))

    def param_sets_raw(self):
        """(vps, sps, pps) NAL payloads incl. 2-byte NAL header (hvcC)."""
        return (headers.write_vps(self.hp)[4:],
                headers.write_sps(self.hp)[4:],
                headers.write_pps(self.hp)[4:])

    def _pad(self, y, u, v):
        yp = _pad_plane(np.asarray(y, np.uint8), 32).astype(np.int32)
        up = _pad_plane(np.asarray(u, np.uint8), 16).astype(np.int32)
        vp = _pad_plane(np.asarray(v, np.uint8), 16).astype(np.int32)
        return yp, up, vp

    def encode_frame(self, y, u, v, force_idr: bool = False):
        """Encode one frame; returns (annexb AU, is_idr)."""
        cfg = self.cfg
        is_idr = (force_idr or self._recon is None
                  or self.frame_index % cfg.gop_size == 0)
        qp = self.rc.gop_qp() if (self.rc and is_idr) else \
            getattr(self, "_gop_qp", cfg.qp)
        if is_idr:
            self._gop_qp = qp
        qpc = chroma_qp(qp)
        yp, up, vp = self._pad(y, u, v)

        if is_idr:
            if cfg.use_rd_intra():
                from . import intra_rd
                out = intra_rd.encode_iframe_rd(yp, up, vp, qp, qpc)
            else:
                out = frame_ops.encode_iframe(yp, up, vp, qp, qpc)
            mv = None
            self.poc = 0
        else:
            sr = search_range_for_effort(cfg.effort)
            lam = max(1, (qp - 12) // 3)
            out = frame_ops.encode_pframe(
                yp, up, vp, *self._recon, qp, qpc, sr, lam)
            mv = np.asarray(out["mv"])
        self._recon = (out["recon_y"], out["recon_u"], out["recon_v"])

        levels_y = np.asarray(out["levels_y"], np.int32)
        levels_u = np.asarray(out["levels_u"], np.int32)
        levels_v = np.asarray(out["levels_v"], np.int32)
        imodes = np.asarray(out["modes"]) if is_idr else None
        payload = syntax.encode_slice_data(qp, is_idr, levels_y,
                                           levels_u, levels_v, mv,
                                           modes=imodes)
        bw = BitWriter()
        headers.write_slice_header(bw, self.hp, is_idr=is_idr,
                                   poc_lsb=self.poc & 0xFF, slice_qp=qp)
        nal_type = headers.NAL_IDR_W_RADL if is_idr else headers.NAL_TRAIL_R
        nal = headers.hevc_nal(nal_type, bw.to_bytes() + payload)
        self.frame_index += 1
        self.poc += 1
        if self.rc:
            self.rc.update(1, len(nal))
        return nal, is_idr

    @property
    def recon_planes(self):
        if self._recon is None:
            return None
        y, u, v = (np.asarray(p) for p in self._recon)
        return (y[: self.cfg.height, : self.cfg.width],
                u[: self.cfg.height // 2, : self.cfg.width // 2],
                v[: self.cfg.height // 2, : self.cfg.width // 2])


def encode_stream(frames, cfg: HevcEncoderConfig,
                  deadline: float | None = None):
    """Iterable of (y, u, v) uint8 planes → (vps, sps, pps, samples)."""
    from ..h264.encoder import _is_scene_cut
    enc = HevcEncoder(cfg)
    samples = []
    prev_y = None
    for f in frames:
        if deadline is not None and time.monotonic() > deadline:
            raise EncodeAbort(f"deadline exceeded at frame {len(samples)}")
        cut = prev_y is not None and _is_scene_cut(prev_y, f[0])
        samples.append(enc.encode_frame(*f, force_idr=cut))
        prev_y = f[0]
    vps, sps, pps = enc.param_sets_raw()
    return vps, sps, pps, samples


def mux_mp4(path: str, vps: bytes, sps: bytes, pps: bytes, samples,
            width: int, height: int, fps_num: int, fps_den: int,
            faststart: bool = True, audio_track=None) -> None:
    from .. import mp4 as mp4mod
    w = mp4mod.Mp4Writer()
    timescale = fps_num * 1000
    dur = fps_den * 1000
    tr = mp4mod.VideoTrack(codec="h265", width=width, height=height,
                           timescale=timescale, vps=[vps], sps=[sps],
                           pps=[pps])
    for au, is_idr in samples:
        tr.samples.append(mp4mod.Sample(
            data=mp4mod.annexb_to_length_prefixed(au),
            duration=dur, is_sync=is_idr))
    w.add_track(tr)
    if audio_track is not None and audio_track.samples:
        w.add_track(audio_track)
    w.write(path, faststart=faststart)


def encode_file(input_path: str, output_path: str, params: EncodeParams,
                deadline: float | None = None) -> int:
    """Encode a video file to HEVC-in-MP4. Returns the output size."""
    import logging as _  # noqa: F401  (parity with h264.encode_file)
    from ...logging import Logger
    from ..ingest import open_video
    from ..h264.encoder import resolve_scale

    log = Logger("h265")
    vid = open_video(input_path)
    w, h = vid.width, vid.height
    tgt = resolve_scale(params.scale_width, params.scale_height, w, h)
    cfg = HevcEncoderConfig.from_params(
        params, width=tgt[1] if tgt else w, height=tgt[0] if tgt else h,
        fps_num=vid.fps_num, fps_den=vid.fps_den)
    t0 = time.monotonic()

    def frames():
        for y, u, v in vid.frames:
            if tgt is not None:
                from ...ops.scale import scale_yuv420
                y, u, v = scale_yuv420(y, u, v, tgt[0], tgt[1])
            yield y, u, v

    vps, sps, pps, samples = encode_stream(frames(), cfg, deadline)

    audio_track = None
    if params.audio_codec in ("aac", "copy") and not params.audio_disabled:
        from ..audio import audio_track_for
        try:
            audio_track = audio_track_for(input_path, params)
        except Exception as e:
            log.warn("audio passthrough failed", error=str(e))
    mux_mp4(output_path, vps, sps, pps, samples, cfg.width, cfg.height,
            cfg.fps_num, cfg.fps_den, faststart=params.faststart,
            audio_track=audio_track)
    dt = time.monotonic() - t0
    size = os.path.getsize(output_path)
    log.info("encode done", frames=len(samples), qp=cfg.qp,
             fps=f"{len(samples) / max(dt, 1e-9):.1f}", size=size)
    return size
