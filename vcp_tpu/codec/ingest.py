"""Input ingestion: raw Y4M, MP4(H.264) or MKV(H.264) → YUV420 frames.

The decode half of SURVEY.md §2.5's demux/decode layer. MP4/MKV inputs
are demuxed natively (codec.mp4.Mp4Demuxer / codec.mkv) and decoded
with the in-repo H.264 decoder, which covers general foreign streams
up to libx264's default output (High profile, CABAC, multi-ref,
partitions, weighted prediction, B-pyramid — see codec.h264.decoder).
Inputs beyond that envelope fail with a precise reason (the consumer
acks-and-drops, matching reference failure semantics,
ref cmd/consumer.go:376-394).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator

import numpy as np


@dataclasses.dataclass
class VideoInput:
    width: int
    height: int
    fps_num: int
    fps_den: int
    num_frames: int
    frames: Iterator  # yields (y, u, v) uint8 planes


class IngestError(ValueError):
    pass


def open_video(path: str, max_frames: int | None = None) -> VideoInput:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".y4m":
        return _open_y4m(path, max_frames)
    if ext in (".mp4", ".mov", ".m4v"):
        return _open_mp4(path, max_frames)
    if ext in (".mkv", ".webm"):
        return _open_mkv(path, max_frames)
    if ext == ".avi":
        return _open_avi(path, max_frames)
    raise IngestError(f"unsupported input container: {ext} "
                      "(supported: .y4m raw, .mp4/.mov/.mkv/.webm/.avi)")


def _open_y4m(path: str, max_frames) -> VideoInput:
    from .y4m import read_y4m
    vid = read_y4m(path, max_frames=max_frames)

    def gen():
        for i in range(vid.num_frames):
            yield vid.planes(i)

    return VideoInput(vid.width, vid.height, vid.fps_num, vid.fps_den,
                      vid.num_frames, gen())


def _open_mp4(path: str, max_frames) -> VideoInput:
    from .mp4 import Mp4Demuxer
    from .h264.decoder import H264Decoder

    demux = Mp4Demuxer(path)
    track = demux.video
    if track is None:
        raise IngestError("no video track in input")
    if track.codec in ("hvc1", "hev1"):
        return _open_mp4_hevc(demux, track, max_frames)
    if track.codec != "avc1":
        raise IngestError(f"unsupported input codec {track.codec!r} "
                          "(h264/avc1 or hevc/hvc1 only)")
    n = track.sample_count
    if max_frames is not None:
        n = min(n, max_frames)
    if track.sample_durations:
        avg = max(1, sum(track.sample_durations[:n]) // max(1, n))
        fps_num, fps_den = track.timescale, avg
    else:
        fps_num, fps_den = 30, 1

    def gen():
        dec = H264Decoder()
        for sps in track.sps:
            dec._decode_nal(sps)
        for pps in track.pps:
            dec._decode_nal(pps)
        for i in range(n):
            for nal in demux.sample_nals(track, i):
                dec._decode_nal(nal)
            for f in dec.drain():
                yield f.y, f.u, f.v
        for f in dec.drain(flush=True):
            yield f.y, f.u, f.v

    return VideoInput(track.width, track.height, fps_num, fps_den, n, gen())


def _open_mp4_hevc(demux, track, max_frames) -> VideoInput:
    """HEVC-in-MP4 ingest via the foreign HEVC decoder (libx265
    medium-defaults intra surface; inter pictures fail with a precise
    reason — the consumer acks-and-drops, matching reference failure
    semantics)."""
    from .h265.foreign import ForeignHevcDecoder, ForeignHevcError

    n = track.sample_count
    if max_frames is not None:
        n = min(n, max_frames)
    if track.sample_durations:
        avg = max(1, sum(track.sample_durations[:n]) // max(1, n))
        fps_num, fps_den = track.timescale, avg
    else:
        fps_num, fps_den = 30, 1

    def gen():
        dec = ForeignHevcDecoder()
        try:
            for nal in track.vps + track.sps + track.pps:
                dec.decode_nal(nal)
            for i in range(n):
                for nal in demux.sample_nals(track, i):
                    out = dec.decode_nal(nal)
                    if out is not None:
                        yield out
        except ForeignHevcError as e:
            raise IngestError(f"hevc: {e}") from e

    return VideoInput(track.width, track.height, fps_num, fps_den, n,
                      gen())


def _open_avi(path: str, max_frames) -> VideoInput:
    """RIFF/AVI ingest (ref cmd/producer.go:485-488 accepts .avi).

    H.264-in-AVI carries Annex-B NALs per video chunk; each chunk feeds
    the in-repo decoder directly.
    """
    from .avi import AviDemuxer, AviError, H264_FOURCCS
    from .h264.decoder import H264Decoder

    try:
        demux = AviDemuxer(path)
    except AviError as e:
        raise IngestError(str(e)) from e
    t = demux.video
    if t is None:
        raise IngestError("avi: no video stream")
    if t.fourcc not in H264_FOURCCS:
        raise IngestError(f"avi: unsupported video fourcc {t.fourcc!r} "
                          "(h264 only)")
    n = len(t.chunks) if max_frames is None else min(len(t.chunks),
                                                     max_frames)

    def gen():
        from .mp4 import split_annexb

        dec = H264Decoder()
        for i in range(n):
            for nal in split_annexb(t.chunks[i]):
                dec._decode_nal(nal)
            for f in dec.drain():
                yield f.y, f.u, f.v
        for f in dec.drain(flush=True):
            yield f.y, f.u, f.v

    return VideoInput(t.width, t.height, t.rate, t.scale, n, gen())


def _open_mkv(path: str, max_frames) -> VideoInput:
    import struct

    from .mkv import MkvDemuxer, MkvError
    from .h264.decoder import H264Decoder

    try:
        demux = MkvDemuxer(path)
    except MkvError as e:
        raise IngestError(str(e)) from e
    t = demux.video
    if t is None or t.codec_id != "V_MPEG4/ISO/AVC":
        raise IngestError("mkv: no h264 video track")
    avcc = t.codec_private
    nal_len = (avcc[4] & 3) + 1
    sps, pps = [], []
    off = 6
    for _ in range(avcc[5] & 0x1F):
        ln = struct.unpack_from(">H", avcc, off)[0]
        sps.append(avcc[off + 2:off + 2 + ln])
        off += 2 + ln
    n_pps = avcc[off]
    off += 1
    for _ in range(n_pps):
        ln = struct.unpack_from(">H", avcc, off)[0]
        pps.append(avcc[off + 2:off + 2 + ln])
        off += 2 + ln

    samples = sorted(t.samples, key=lambda s: s.timestamp_ns)
    n = len(samples) if max_frames is None else min(len(samples), max_frames)
    if t.default_duration_ns:
        fps_num, fps_den = 1_000_000_000, t.default_duration_ns
    else:
        fps_num, fps_den = 30, 1

    def gen():
        dec = H264Decoder()
        for nal in sps + pps:
            dec._decode_nal(nal)
        for i in range(n):
            data = samples[i].data
            pos = 0
            while pos + nal_len <= len(data):
                ln = int.from_bytes(data[pos:pos + nal_len], "big")
                dec._decode_nal(data[pos + nal_len:pos + nal_len + ln])
                pos += nal_len + ln
            for f in dec.drain():
                yield f.y, f.u, f.v
        for f in dec.drain(flush=True):
            yield f.y, f.u, f.v

    return VideoInput(t.width, t.height, fps_num, fps_den, n, gen())
