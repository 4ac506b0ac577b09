"""Rate control tests (CRF/ABR/CQ modes)."""

import numpy as np
import pytest

from vcp_tpu.codec.args import parse_encode_args
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
from vcp_tpu.codec.h264.ratecontrol import RateController, initial_qp

from video_util import synth_video


def test_initial_qp_modes():
    crf = parse_encode_args("-c:v libx264 -crf 23")
    assert initial_qp(crf, 1920, 1080, 30) == 23
    abr_hi = parse_encode_args("-c:v h264_nvenc -b:v 50M")
    abr_lo = parse_encode_args("-c:v h264_nvenc -b:v 500k")
    q_hi = initial_qp(abr_hi, 1920, 1080, 30)
    q_lo = initial_qp(abr_lo, 1920, 1080, 30)
    assert q_hi < q_lo
    cq = parse_encode_args("-c:v libx264")
    assert initial_qp(cq, 640, 480, 30) == 28


def test_abr_qp_moves_toward_target():
    params = parse_encode_args("-c:v h264_nvenc -b:v 1M")
    rc = RateController(params, 640, 480, 30.0)
    q0 = rc.gop_qp()
    # consistently overshooting -> qp must rise
    for _ in range(4):
        rc.update(gop_frames=30, gop_bytes=2 * 125_000)  # 2x target
    assert rc.gop_qp() > q0
    # consistently undershooting -> qp falls back
    q1 = rc.gop_qp()
    for _ in range(6):
        rc.update(gop_frames=30, gop_bytes=125_000 // 4)
    assert rc.gop_qp() < q1


def test_crf_mode_has_no_controller():
    params = parse_encode_args("-c:v libx264 -crf 30")
    cfg = EncoderConfig.from_params(params, 64, 48, 30, 1)
    enc = H264Encoder(cfg)
    assert enc.rc is None and cfg.qp == 30


@pytest.mark.slow
def test_abr_encoder_adapts_across_gops():
    """Encode several GOPs with an aggressive target; QP must move and the
    stream stays decodable."""
    params = parse_encode_args("-c:v h264_nvenc -b:v 30k")  # tiny target
    cfg = EncoderConfig.from_params(params, 64, 48, 30, 1)
    cfg.gop_size = 4
    enc = H264Encoder(cfg)
    assert enc.rc is not None
    frames = synth_video(64, 48, 12)
    qps = []
    samples = []
    for g in range(3):
        qps.append(enc.rc.gop_qp())
        samples += enc.encode_gop(frames[4 * g: 4 * g + 4])
    # rate controller engaged: QP changed across GOPs
    assert len(set(qps)) > 1, qps
    from vcp_tpu.codec.h264.decoder import H264Decoder
    dec = H264Decoder()
    out = dec.decode_annexb(enc.headers_annexb()
                            + b"".join(au for au, _ in samples))
    assert len(out) == 12
