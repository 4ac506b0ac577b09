"""Quality metric tests (PSNR/SSIM + stream comparator)."""

import numpy as np
import pytest

from vcp_tpu.quality import compare_streams, psnr, ssim

from video_util import synth_video


def test_identity_metrics():
    x = np.random.default_rng(0).integers(0, 256, (64, 64)).astype(np.uint8)
    assert psnr(x, x) == 99.0
    assert ssim(x, x) == pytest.approx(1.0, abs=1e-9)


def test_metrics_degrade_with_noise():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    small = np.clip(x + rng.integers(-2, 3, x.shape), 0, 255).astype(np.uint8)
    big = np.clip(x + rng.integers(-25, 26, x.shape), 0, 255).astype(np.uint8)
    assert psnr(x, small) > psnr(x, big) > 15
    assert 1 > ssim(x, small) > ssim(x, big) > 0


@pytest.mark.slow
def test_compare_streams_encode_ladder(tmp_path):
    from vcp_tpu.codec.y4m import write_y4m
    from vcp_tpu.codec.args import parse_encode_args
    from vcp_tpu.codec.h264.encoder import encode_file
    frames = synth_video(64, 48, 4)
    ref = str(tmp_path / "ref.y4m")
    write_y4m(ref, frames, fps_num=30)
    q = {}
    for crf in (20, 40):
        out = str(tmp_path / f"q{crf}.mp4")
        encode_file(ref, out, parse_encode_args(f"-c:v libx264 -crf {crf} -g 4"))
        q[crf] = compare_streams(ref, out)
        assert q[crf].frames == 4
    assert q[20].psnr_y > q[40].psnr_y
    assert q[20].ssim_y > q[40].ssim_y
    assert q[20].ssim_y > 0.95


def test_compare_streams_size_mismatch(tmp_path):
    from vcp_tpu.codec.y4m import write_y4m
    a = str(tmp_path / "a.y4m")
    b = str(tmp_path / "b.y4m")
    write_y4m(a, synth_video(64, 48, 2))
    write_y4m(b, synth_video(32, 32, 2))
    with pytest.raises(ValueError):
        compare_streams(a, b)


def test_quality_cli(tmp_path, capsys):
    from vcp_tpu.cli import main
    from vcp_tpu.codec.y4m import write_y4m
    frames = synth_video(48, 48, 2)
    a = str(tmp_path / "a.y4m")
    write_y4m(a, frames)
    rc = main(["quality", a, a])
    assert rc == 0
    out = capsys.readouterr().out
    assert "psnr_y=99.00dB" in out and "ssim_y=1.0000" in out


def test_rdbench_golden_ssim_psnr_consistent():
    """rdbench's golden-quality path (foreign decode of the committed
    libx264-medium bitstreams) must reproduce the PSNR recorded in
    tests/golden/meta.json, and its SSIM must be sane/monotone in CRF."""
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import rdbench

    meta = json.load(open(os.path.join(rdbench.GOLDEN, "meta.json")))
    name = "texture_256x160"
    frames = rdbench.load_clip(name)
    ssims = []
    for crf, v in meta[name]["x264"].items():
        ps, ss = rdbench.golden_x264_quality(name, crf, frames)
        assert abs(ps - v["luma_psnr"]) < 0.005, (crf, ps, v["luma_psnr"])
        assert 0.5 < ss < 1.0
        ssims.append(ss)
    assert ssims == sorted(ssims, reverse=True)  # SSIM falls as CRF rises
    assert rdbench.ssim_db(0.99) > rdbench.ssim_db(0.9)
