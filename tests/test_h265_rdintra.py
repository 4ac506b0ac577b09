"""HEVC wavefront RD intra (codec.h265.intra_rd.encode_iframe_rd):
closed-loop bit-exactness with the validation decoder, libavcodec
oracle conformance, and evidence the left-dependent modes (planar /
horizontal / negative-angular) are actually selected on content that
needs them — the capability the row-scan path (frame_ops) cannot
express (VERDICT round 3, item 5)."""

import numpy as np

import video_util

from vcp_tpu.codec.h265.decoder import HevcDecoder
from vcp_tpu.codec.h265.encoder import HevcEncoder, HevcEncoderConfig
from vcp_tpu.codec.mp4 import split_annexb


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _gradient_frame(w, h):
    """Smooth diagonal gradient + horizontal banding: planar and the
    horizontal family should win over vertical-only prediction."""
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.clip(30 + (xx * 120) // w + (yy * 90) // h
                + 12 * ((yy // 7) % 2), 0, 255).astype(np.uint8)
    u = np.clip(96 + (xx * 40) // w, 0, 255)[::2, ::2].astype(np.uint8)
    v = np.clip(120 + (yy * 40) // h, 0, 255)[::2, ::2].astype(np.uint8)
    return y, u, v


def _encode_rd(frames, w, h, qp=28):
    cfg = HevcEncoderConfig(width=w, height=h, qp=qp,
                            gop_size=len(frames), rd_intra=True)
    enc = HevcEncoder(cfg)
    aus = [enc.encode_frame(*f)[0] for f in frames]
    return enc, aus


def test_rd_intra_closed_loop_and_modes():
    w, h = 160, 96
    frames = [_gradient_frame(w, h)]
    enc, aus = _encode_rd(frames, w, h, qp=26)

    dec = HevcDecoder()
    for nal in split_annexb(enc.headers_annexb() + aus[0]):
        out = dec.decode_nal(nal)
    dy, du, dv = out
    ey, eu, ev = enc.recon_planes
    np.testing.assert_array_equal(dy, ey.astype(np.uint8))
    np.testing.assert_array_equal(du, eu.astype(np.uint8))
    np.testing.assert_array_equal(dv, ev.astype(np.uint8))
    assert psnr(frames[0][0], dy) > 34

    # the RD decision must reach outside the top-only family somewhere
    # on this content (planar=0, DC=1, or a horizontal/negative mode)
    from vcp_tpu.codec.h265 import headers as hh
    from vcp_tpu.codec.h265 import syntax
    from vcp_tpu.utils.bitstream import BitReader, emulation_remove
    body = emulation_remove(aus[0][6:])
    br = BitReader(body)
    hh.parse_slice_header(br, enc.hp, hh.NAL_IDR_W_RADL)
    _, _, _, (modes, _), _ = syntax.decode_slice_data(
        body[br.pos // 8:], 26, True, h // 32, w // 32)
    assert np.any(modes < 26), modes


def test_rd_intra_beats_row_scan_on_gradients():
    """Same content, same QP: the RD path must not lose to the
    restricted row-scan path (it strictly widens the candidate set)."""
    w, h = 160, 96
    f = _gradient_frame(w, h)
    enc_rd, _ = _encode_rd([f], w, h, qp=30)
    y_rd = enc_rd.recon_planes[0]
    cfg = HevcEncoderConfig(width=w, height=h, qp=30, gop_size=1,
                            rd_intra=False)
    enc_rs = HevcEncoder(cfg)
    enc_rs.encode_frame(*f)
    y_rs = enc_rs.recon_planes[0]
    assert psnr(f[0], y_rd) >= psnr(f[0], y_rs) - 0.05


def test_rd_intra_oracle_conformance():
    """libavcodec must decode the RD-intra stream bit-exactly (the
    stream is plain HEVC — only the encoder-side mode search changed)."""
    import av_oracle as O
    if O.get_oracle() is None:
        import pytest
        pytest.skip("no libavcodec oracle on this host")
    w, h = 128, 64
    frames = [_gradient_frame(w, h), video_util.synth_video(w, h, 1)[0]]
    cfg = HevcEncoderConfig(width=w, height=h, qp=28, gop_size=1,
                            rd_intra=True)
    enc = HevcEncoder(cfg)
    aus = [enc.encode_frame(*f)[0] for f in frames]
    bs = enc.headers_annexb() + b"".join(aus)
    from vcp_tpu.codec.h265.decoder import decode_annexb
    ours = list(decode_annexb(bs))
    theirs = O.decode_video("hevc", bs)
    assert len(ours) == len(theirs) == 2
    for o, t in zip(ours, theirs):
        np.testing.assert_array_equal(np.asarray(o[0]), t[0])
        np.testing.assert_array_equal(np.asarray(o[1]), t[1])
        np.testing.assert_array_equal(np.asarray(o[2]), t[2])
