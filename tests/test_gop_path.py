"""The GOP-chunked device path must produce bit-identical streams to the
per-frame path (and still decode exactly)."""

import numpy as np

from vcp_tpu.codec.h264.decoder import H264Decoder
from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder

from video_util import synth_video


def test_gop_path_matches_per_frame():
    w, h, n = 64, 48, 7     # exercises chunk split 4+2 (and 8>remaining)
    frames = synth_video(w, h, n)
    cfg = EncoderConfig(width=w, height=h, qp=27, gop_size=n, effort=2)

    enc1 = H264Encoder(cfg)
    per_frame = [enc1.encode_frame(*f)[0] for f in frames]

    enc2 = H264Encoder(cfg)
    gop = enc2.encode_gop(frames)
    assert [idr for _, idr in gop] == [True] + [False] * (n - 1)
    for i, ((au, _), ref) in enumerate(zip(gop, per_frame)):
        assert au == ref, f"frame {i} differs between GOP and per-frame path"


def test_delta_upload_bit_exact(monkeypatch):
    """Conditional-replenishment uploads (VCP_DELTA=1, the default) must be
    bit-identical to dense whole-frame uploads, including the cross-GOP
    IDR-delta path (GOP 2+ bootstraps from the carried device source)."""
    w, h, n = 64, 48, 7
    frames = synth_video(w, h, n)
    cfg = EncoderConfig(width=w, height=h, qp=27, gop_size=3, effort=2)

    monkeypatch.setenv("VCP_DELTA", "0")
    e0 = H264Encoder(cfg)
    dense = [au for i in range(0, n, 3)
             for au, _ in e0.encode_gop(frames[i:i + 3])]

    monkeypatch.setenv("VCP_DELTA", "1")
    e1 = H264Encoder(cfg)
    delt = [au for i in range(0, n, 3)
            for au, _ in e1.encode_gop(frames[i:i + 3])]
    assert dense == delt


def test_delta_upload_static_content(monkeypatch):
    """All-identical frames → zero changed tiles per frame; the delta path
    must still round-trip exactly (empty scatters, skip-heavy P frames)."""
    w, h, n = 64, 48, 5
    y = np.full((h, w), 120, np.uint8)
    u = np.full((h // 2, w // 2), 100, np.uint8)
    v = np.full((h // 2, w // 2), 140, np.uint8)
    frames = [(y, u, v)] * n
    cfg = EncoderConfig(width=w, height=h, qp=27, gop_size=n, effort=2)
    monkeypatch.setenv("VCP_DELTA", "1")
    enc = H264Encoder(cfg)
    gop = enc.encode_gop(frames)
    dec = H264Decoder()
    stream = enc.headers_annexb() + b"".join(au for au, _ in gop)
    out = dec.decode_annexb(stream)
    assert len(out) == n
    from vcp_tpu.codec.h264.decoder import psnr
    assert psnr(out[-1].y, y) > 40


def test_gop_path_decodes_exactly():
    w, h, n = 64, 48, 6
    frames = synth_video(w, h, n)
    cfg = EncoderConfig(width=w, height=h, qp=30, gop_size=3, effort=2)
    enc = H264Encoder(cfg)
    from vcp_tpu.codec.h264.encoder import encode_stream
    sps, pps, samples = encode_stream(iter(frames), cfg)
    assert len(samples) == n
    assert sum(1 for _, idr in samples if idr) == 2   # two GOPs
    dec = H264Decoder()
    enc2 = H264Encoder(cfg)
    stream = enc2.headers_annexb() + b"".join(au for au, _ in samples)
    out = dec.decode_annexb(stream)
    assert len(out) == n
    # quality sanity on the last frame of each GOP
    from vcp_tpu.codec.h264.decoder import psnr
    for i in (2, 5):
        assert psnr(out[i].y, frames[i][0]) > 28
