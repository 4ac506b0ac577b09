"""HEVC engine closed-loop tests: encode -> validation decoder ->
bit-exact recon match + quality floor (codec.h265)."""

import os

import numpy as np
import pytest

import video_util

from vcp_tpu.codec.args import parse_encode_args
from vcp_tpu.codec.h265.decoder import HevcDecoder, decode_mp4
from vcp_tpu.codec.h265.encoder import (HevcEncoder, HevcEncoderConfig,
                                        encode_file)
from vcp_tpu.codec.mp4 import split_annexb


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _roundtrip(frames, w, h, qp=30, gop=8, effort=4):
    cfg = HevcEncoderConfig(width=w, height=h, qp=qp, gop_size=gop,
                            effort=effort)
    enc = HevcEncoder(cfg)
    dec = HevcDecoder()
    for nal in split_annexb(enc.headers_annexb()):
        dec.decode_nal(nal)
    outs = []
    for f in frames:
        au, is_idr = enc.encode_frame(*f)
        for nal in split_annexb(au):
            got = dec.decode_nal(nal)
            if got is not None:
                outs.append(got)
        # closed loop: decoder recon == encoder recon, bit-exact
        ey, eu, ev = enc.recon_planes
        dy, du, dv = outs[-1]
        np.testing.assert_array_equal(dy, ey.astype(np.uint8))
        np.testing.assert_array_equal(du, eu.astype(np.uint8))
        np.testing.assert_array_equal(dv, ev.astype(np.uint8))
    return outs


def test_intra_only_closed_loop():
    w, h = 96, 64
    frames = video_util.synth_video(w, h, 3)
    outs = _roundtrip(frames, w, h, qp=26, gop=1)
    assert len(outs) == 3
    for (sy, su, sv), (dy, du, dv) in zip(frames, outs):
        assert psnr(sy, dy) > 36, psnr(sy, dy)
        assert psnr(su, du) > 38


def test_inter_closed_loop_and_quality():
    w, h = 128, 96
    frames = video_util.synth_video(w, h, 8)
    outs = _roundtrip(frames, w, h, qp=28, gop=8)
    assert len(outs) == 8
    for i, ((sy, _, _), (dy, _, _)) in enumerate(zip(frames, outs)):
        assert psnr(sy, dy) > 33, (i, psnr(sy, dy))


def test_non_ctu_aligned_dims_conformance_window():
    w, h = 100, 70  # pads to 128x96, cropped via conf window
    frames = video_util.synth_video(w, h, 4)
    outs = _roundtrip(frames, w, h, qp=30, gop=4)
    assert outs[0][0].shape == (h, w)
    assert outs[0][1].shape == (h // 2, w // 2)
    for (sy, _, _), (dy, _, _) in zip(frames, outs):
        assert psnr(sy, dy) > 30


def test_quality_improves_with_lower_qp():
    w, h = 96, 64
    frames = video_util.synth_video(w, h, 2)
    lo = _roundtrip(frames, w, h, qp=22, gop=2)
    hi = _roundtrip(frames, w, h, qp=40, gop=2)
    p_lo = psnr(frames[1][0], lo[1][0])
    p_hi = psnr(frames[1][0], hi[1][0])
    assert p_lo > p_hi + 3


def test_encode_file_h265_preset_to_mp4(tmp_path):
    """e2e through the preset path: y4m -> h265 -> mp4 -> decode."""
    w, h = 96, 64
    frames = video_util.synth_video(w, h, 5)
    y4m = str(tmp_path / "in.y4m")
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W96 H64 F25:1 Ip A1:1 C420jpeg\n")
        for (y, u, v) in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    out = str(tmp_path / "out.mp4")
    # the h265-cpu builtin preset args (ref config.go:49)
    p = parse_encode_args("-c:v libx265 -preset medium -crf 28 -c:a aac "
                          "-b:a 128k -movflags +faststart")
    size = encode_file(y4m, out, p)
    assert size > 0 and os.path.getsize(out) == size
    decoded = list(decode_mp4(out))
    assert len(decoded) == 5
    for (sy, _, _), (dy, _, _) in zip(frames, decoded):
        assert psnr(sy, dy) > 30
    # faststart: moov precedes mdat
    buf = open(out, "rb").read()
    assert buf.find(b"moov") < buf.find(b"mdat")


def test_hevc_presets_dispatch(tmp_path):
    """All four previously-failing presets now produce output
    (ref config.go:47-50, config.yaml:19 4k-nvenc)."""
    from vcp_tpu.pipeline import executor
    w, h = 64, 32
    frames = video_util.synth_video(w, h, 2)
    y4m = str(tmp_path / "in.y4m")
    with open(y4m, "wb") as f:
        f.write(b"YUV4MPEG2 W64 H32 F25:1 Ip A1:1 C420jpeg\n")
        for (y, u, v) in frames:
            f.write(b"FRAME\n")
            f.write(y.tobytes() + u.tobytes() + v.tobytes())
    presets = {
        "h265-nvenc": "-c:v hevc_nvenc -preset p4 -b:v 8M -c:a aac "
                      "-b:a 128k -movflags +faststart",
        "h265-nvenc-hq": "-c:v hevc_nvenc -preset p7 -tune hq -b:v 10M "
                         "-c:a aac -b:a 192k -movflags +faststart",
        "h265-cpu": "-c:v libx265 -preset medium -crf 28 -c:a aac "
                    "-b:a 128k -movflags +faststart",
        "4k-nvenc": "-c:v hevc_nvenc -preset p5 -b:v 30M -maxrate 40M "
                    "-bufsize 60M -c:a aac -b:a 192k -movflags +faststart",
    }
    for name, args in presets.items():
        out = str(tmp_path / f"{name}.mp4")
        size = executor.execute(y4m, out, args)
        assert size > 0, name
        assert len(list(decode_mp4(out))) == 2, name


def test_subpel_mvs_conformant_and_used():
    """Quarter-pel HEVC ME: on half-pel panning content the refinement
    must pick fractional MVs, the own decoder must reproduce the device
    recon, and ffmpeg (when available) must agree bit-exactly."""
    import numpy as np
    from vcp_tpu.codec.h265 import syntax
    from vcp_tpu.codec.h265 import decoder as hdec
    from vcp_tpu.codec.h265.encoder import HevcEncoder, HevcEncoderConfig
    from vcp_tpu.utils.bitstream import BitReader, emulation_remove
    from vcp_tpu.codec.h265 import headers as hh

    h, w = 64, 96
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.clip(40 + ((xx * 5 + yy * 3) % 173), 0, 255)
    frames = []
    for t in range(3):
        # 0.5 px/frame pan: odd frames sit mid-way between integer shifts
        if t % 2 == 0:
            y = np.roll(base, t // 2, 1)
        else:
            y = ((np.roll(base, t // 2, 1)
                  + np.roll(base, t // 2 + 1, 1) + 1) // 2)
        u = np.full((h // 2, w // 2), 100, np.uint8)
        v = np.full((h // 2, w // 2), 140, np.uint8)
        frames.append((y.astype(np.uint8), u, v))
    enc = HevcEncoder(HevcEncoderConfig(width=w, height=h, qp=27,
                                        gop_size=3))
    aus = [enc.encode_frame(*f)[0] for f in frames]
    bs = enc.headers_annexb() + b"".join(aus)
    decoded = list(hdec.decode_annexb(bs))
    assert len(decoded) == 3
    # fractional MVs present in the last P slice
    nal = aus[-1]
    body = emulation_remove(nal[6:])   # skip start code + 2-byte header
    br = BitReader(body)
    hh.parse_slice_header(br, enc.hp, hh.NAL_TRAIL_R)
    _, _, _, _, mv = syntax.decode_slice_data(
        body[br.pos // 8:], enc.hp.qp + 0 if False else 27, False,
        h // 32, w // 32)
    assert (np.asarray(mv) % 4 != 0).any(), "no fractional MVs picked"
    import av_oracle as O
    if O.get_oracle() is not None:
        theirs = O.decode_video("hevc", bs)
        for o, t in zip(decoded, theirs):
            np.testing.assert_array_equal(np.asarray(o[0]), t[0])
            np.testing.assert_array_equal(np.asarray(o[1]), t[1])
            np.testing.assert_array_equal(np.asarray(o[2]), t[2])
