"""Measured RD evidence for the round-2 default flips (VERDICT items
3 and 6): CABAC must beat CAVLC by >=8% at equal QP, and the in-loop
deblocking filter must not cost quality at equal QP."""

import numpy as np

from vcp_tpu.codec.h264.decoder import H264Decoder, psnr
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video


def _encode(frames, w, h, qp, cabac, deblock):
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop_size=len(frames), cabac=cabac,
                                    deblock=deblock, effort=4))
    aus = [au for au, _ in enc.encode_gop(frames)]
    size = sum(len(a) for a in aus)
    dec = H264Decoder().decode_annexb(
        enc.headers_annexb() + b"".join(aus))
    ps = float(np.mean([psnr(d.y, f[0]) for d, f in zip(dec, frames)]))
    return size, ps


def test_cabac_saves_at_least_8pct():
    w, h = 128, 96
    frames = synth_video(w, h, 9)
    for qp in (24, 30):
        cavlc, p1 = _encode(frames, w, h, qp, cabac=False, deblock=True)
        cab, p2 = _encode(frames, w, h, qp, cabac=True, deblock=True)
        assert abs(p1 - p2) < 1e-6          # same recon, entropy-only
        saving = 1.0 - cab / cavlc
        assert saving >= 0.08, f"qp{qp}: CABAC saves only {saving:.1%}"


def test_deblock_improves_or_preserves_quality():
    w, h = 128, 96
    frames = synth_video(w, h, 9)
    for qp in (30, 36):
        off_size, off_psnr = _encode(frames, w, h, qp, True, False)
        on_size, on_psnr = _encode(frames, w, h, qp, True, True)
        # measured on these clips: +1.7..1.9 dB PSNR at equal QP with
        # ~equal rate (the filtered picture is a better P reference)
        assert on_psnr >= off_psnr + 0.5, (
            f"qp{qp}: deblock {on_psnr:.2f} vs {off_psnr:.2f} dB")
        assert on_size <= off_size * 1.05
