"""Rate-distortion harness: this encoder vs libx264 *medium*.

The reference's quality north star is parity with its `h264-cpu` preset
(`-c:v libx264 -preset medium -crf 23`, ref internal/config/config.go:49).
This harness measures the real gap: the committed golden clips
(tests/golden/*.npz) are encoded by our encoder over a QP sweep and
compared against committed libx264-medium encodes of the same clips
(generated once via the system-ffmpeg oracle and checked in, so the
comparison runs without ffmpeg). Reports bitrate/PSNR points per clip
and the Bjontegaard-delta rate (BD-rate) of ours vs libx264 medium.

Usage: python rdbench.py [--qps 22,26,30,34,38] [--out RD.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
GOLDEN = os.path.join(ROOT, "tests", "golden")


def load_clip(name: str):
    z = np.load(os.path.join(GOLDEN, f"{name}.npz"))
    n = len([k for k in z.files if k.endswith("_y")])
    return [(z[f"f{i}_y"], z[f"f{i}_u"], z[f"f{i}_v"]) for i in range(n)]


def _luma_quality(dec_y, frames):
    """(PSNR dB, mean SSIM) of decoded luma planes vs the source."""
    from vcp_tpu.quality import ssim
    mses, ssims = [], []
    for dy, f in zip(dec_y, frames):
        a = np.asarray(dy, np.uint8)
        mses.append(np.mean((a.astype(float) - f[0].astype(float)) ** 2))
        ssims.append(ssim(a, f[0]))
    return (10 * np.log10(255.0 ** 2 / np.mean(mses)),
            float(np.mean(ssims)))


def encode_ours(frames, qp: int, cabac: bool = True, bframes: int = 0,
                t8: bool = False, effort: int = 6, parts: bool = False):
    from vcp_tpu.codec.h264.decoder import H264Decoder
    from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

    h, w = frames[0][0].shape
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=qp,
                                    gop_size=len(frames), cabac=cabac,
                                    deblock=True, effort=effort,
                                    bframes=bframes, transform8=t8,
                                    parts=parts))
    aus = [s[0] for s in enc.encode_gop(frames)]
    size = sum(len(a) for a in aus) + len(enc.headers_annexb())
    dec = H264Decoder().decode_annexb(
        enc.headers_annexb() + b"".join(aus))
    ps, ss = _luma_quality([d.y for d in dec], frames)
    return size, ps, ss


def golden_x264_quality(name: str, crf: str, frames):
    """(PSNR dB, SSIM) of the committed libx264-medium encode, via the
    in-repo foreign decoder (bit-exact vs libavcodec —
    tests/test_foreign_inter.py), so SSIM needs no ffmpeg at bench time."""
    from vcp_tpu.codec.h264.decoder import H264Decoder
    es = open(os.path.join(GOLDEN, f"{name}_x264_crf{crf}.264"), "rb").read()
    dec = H264Decoder().decode_annexb(es)
    return _luma_quality([d.y for d in dec], frames)


def ssim_db(s: float) -> float:
    """The usual BD-friendly SSIM axis: -10*log10(1 - SSIM)."""
    return -10.0 * np.log10(max(1e-9, 1.0 - s))


def encode_ours_hevc(frames, qp: int, effort: int = 6):
    from vcp_tpu.codec.h265 import decoder as hdec
    from vcp_tpu.codec.h265.encoder import HevcEncoder, HevcEncoderConfig

    h, w = frames[0][0].shape
    enc = HevcEncoder(HevcEncoderConfig(width=w, height=h, qp=qp,
                                        gop_size=len(frames),
                                        effort=effort))
    aus = [enc.encode_frame(*f)[0] for f in frames]
    bs = enc.headers_annexb() + b"".join(aus)
    dec = list(hdec.decode_annexb(bs))
    ps, ss = _luma_quality([d[0] for d in dec], frames)
    return len(bs), ps, ss


def bd_rate(r1, p1, r2, p2):
    """Bjontegaard delta-rate of curve 2 vs curve 1 (negative = curve 2
    needs fewer bits at equal quality). r*: bitrates, p*: PSNRs."""
    lr1, lr2 = np.log(np.asarray(r1, float)), np.log(np.asarray(r2, float))
    p1, p2 = np.asarray(p1, float), np.asarray(p2, float)
    f1 = np.polyfit(p1, lr1, min(3, len(p1) - 1))
    f2 = np.polyfit(p2, lr2, min(3, len(p2) - 1))
    lo = max(p1.min(), p2.min())
    hi = min(p1.max(), p2.max())
    if hi <= lo:
        return float("nan")
    xs = np.linspace(lo, hi, 64)
    d = np.mean(np.polyval(f2, xs) - np.polyval(f1, xs))
    return (np.exp(d) - 1.0) * 100.0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--qps", default="22,26,30,34,38")
    # default = the SHIPPING quality-preset shape (-bf 2, like
    # EncoderConfig.from_params at effort >= 5). RD.md is generated at
    # these defaults; running with --bframes 0 measures a non-shipping
    # shape ~48 BD-rate points worse on gradmotion (round-5 lesson: a
    # defaults run was briefly mistaken for a regression).
    ap.add_argument("--bframes", type=int, default=2)
    ap.add_argument("--t8", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--parts", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="16x8/8x16/P_8x8 sub-partitions (shipping "
                    "quality-preset default since the RD-cost trial; "
                    "--no-parts for the speed-preset shape)")
    ap.add_argument("--effort", type=int, default=6)
    ap.add_argument("--codec", choices=("h264", "hevc"), default="h264")
    ap.add_argument("--out", default=os.path.join(ROOT, "RD.md"))
    ap.add_argument("--append", action="store_true",
                    help="append to --out instead of overwriting (for "
                    "stacking the h264 and hevc sections in one report)")
    ap.add_argument("--platform", default=None, choices=("cpu",),
                    help="pin jax to CPU (all engine math is integer and "
                    "platform bit-exact; frees the TPU for benches). The "
                    "image's site hook ignores JAX_PLATFORMS, so this "
                    "must go through jax.config before first device use.")
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    qps = [int(q) for q in args.qps.split(",")]

    meta = json.load(open(os.path.join(GOLDEN, "meta.json")))
    fps = 30.0
    report = {}
    refkey = "x264" if args.codec == "h264" else "x265"
    lines = [f"# Rate-distortion: vcp-tpu vs lib{refkey} medium",
             "",
             f"Committed golden clips; lib{refkey}-medium rate/PSNR from "
             "the checked-in encodes (tests/golden/meta.json)"
             + (", SSIM via the in-repo foreign decoder on the committed "
                "bitstreams" if refkey == "x264" else "")
             + ". Luma PSNR/SSIM.",
             ""]
    for name, m in meta.items():
        frames = load_clip(name)
        n = m["n"]
        ours = []
        for qp in qps:
            if args.codec == "hevc":
                size, ps, ss = encode_ours_hevc(frames, qp,
                                                effort=args.effort)
            else:
                size, ps, ss = encode_ours(frames, qp,
                                           bframes=args.bframes,
                                           t8=args.t8, effort=args.effort,
                                           parts=args.parts)
            kbps = size * 8 * fps / n / 1000.0
            ours.append((kbps, ps, ss))
            print(f"{name} qp{qp}: {kbps:.1f} kbps  {ps:.2f} dB  "
                  f"ssim {ss:.4f}", flush=True)
        ref = []
        for crf, v in m[refkey].items():
            kbps = v["bytes"] * 8 * fps / n / 1000.0
            if refkey == "x264":
                # SSIM via the in-repo foreign decoder (the committed
                # .265 goldens use inter frames the foreign HEVC decoder
                # doesn't parse yet, so HEVC stays PSNR-only)
                _, ss = golden_x264_quality(name, crf, frames)
            else:
                ss = None
            ref.append((kbps, v["luma_psnr"], ss))
        bd = bd_rate([r for r, _, _ in ref], [p for _, p, _ in ref],
                     [r for r, _, _ in ours], [p for _, p, _ in ours])
        bd_s = None
        if refkey == "x264":
            bd_s = bd_rate([r for r, _, _ in ref],
                           [ssim_db(s) for _, _, s in ref],
                           [r for r, _, _ in ours],
                           [ssim_db(s) for _, _, s in ours])
        report[name] = {"ours": ours, f"{refkey}_medium": ref,
                        f"bd_rate_vs_{refkey}_pct": round(bd, 1)}
        if bd_s is not None:
            report[name][f"bd_rate_ssim_vs_{refkey}_pct"] = round(bd_s, 1)
        lines += [f"## {name}", "",
                  "| encoder | kbps | luma PSNR (dB) | luma SSIM |",
                  "|---|---|---|---|"]
        for (r, p, s), qp in zip(ours, qps):
            lines.append(f"| ours qp{qp} | {r:.1f} | {p:.2f} | "
                         f"{s:.4f} |" if s is not None else
                         f"| ours qp{qp} | {r:.1f} | {p:.2f} | — |")
        for (r, p, s), crf in zip(ref, m[refkey].keys()):
            cell = f"{s:.4f}" if s is not None else "—"
            lines.append(f"| {refkey}-medium crf{crf} | {r:.1f} | "
                         f"{p:.2f} | {cell} |")
        lines += ["",
                  f"**BD-rate vs lib{refkey} medium: {bd:+.1f}%** (PSNR; "
                  "positive = ours needs that many % more bits at equal "
                  "quality)"
                  + (f" — **SSIM BD-rate: {bd_s:+.1f}%** (quality axis "
                     "-10·log10(1-SSIM))" if bd_s is not None else ""),
                  ""]
    with open(args.out, "a" if args.append else "w") as fh:
        fh.write("\n".join(lines))
    print(json.dumps({k: v[f"bd_rate_vs_{refkey}_pct"]
                      for k, v in report.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
