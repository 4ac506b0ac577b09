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
