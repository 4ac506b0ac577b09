"""Foreign High-profile P/B decode: real libx264 streams, bit-exact.

The reference transcodes anything ffmpeg reads
(/root/reference/cmd/consumer.go:376-380); its quality presets are
libx264 medium (internal/config/config.go:49), whose default output is
High profile with CABAC, 3 reference frames, p8x8/i8x8/i4x4 partitions,
8x8 transform, adaptive quant, weighted P prediction (weightp=2 with
reference duplication via ref list modification), 3 B-frames with
B-pyramid and implicit weighted bipred. Round 2 decoded only forced
baseline streams; these tests pin the whole decode surface — every
configuration must reproduce ffmpeg's own reconstruction EXACTLY
(luma and both chroma planes, every frame).
"""

import numpy as np
import pytest

from vcp_tpu.codec.h264.decoder import H264Decoder

O = pytest.importorskip("av_oracle")


@pytest.fixture(scope="module")
def oracle():
    if O.get_oracle() is None:
        pytest.skip("system libavcodec unavailable")
    return O


def _clip(name, n=10):
    import rdbench
    return rdbench.load_clip(name)[:n]


def _fade(frames):
    """Luma fade-out: forces x264's weightp=2 to emit non-identity
    explicit weights + duplicated references."""
    return [(np.clip(y.astype(np.int32) * (10 - t) // 10, 16,
                     235).astype(np.uint8), u, v)
            for t, (y, u, v) in enumerate(frames)]


def _assert_bit_exact(oracle, frames, opts, crf=26):
    es = oracle.encode_video("libx264", frames, preset="medium", crf=crf,
                             gop=len(frames), opts="x264-params=" + opts)
    theirs = oracle.decode_video("h264", es)
    ours = H264Decoder().decode_annexb(es)
    assert len(ours) == len(theirs) == len(frames)
    for i, ((ty, tu, tv), f) in enumerate(zip(theirs, ours)):
        np.testing.assert_array_equal(ty, np.asarray(f.y, np.uint8),
                                      err_msg=f"frame {i} luma [{opts}]")
        np.testing.assert_array_equal(tu, np.asarray(f.u, np.uint8),
                                      err_msg=f"frame {i} cb")
        np.testing.assert_array_equal(tv, np.asarray(f.v, np.uint8),
                                      err_msg=f"frame {i} cr")


# -- P-only ladders ---------------------------------------------------------

@pytest.mark.parametrize("opts", [
    # one feature at a time on top of a minimal P16 base
    "bframes=0:threads=1:weightp=0:partitions=none:ref=1:8x8dct=0:aq-mode=0",
    "bframes=0:threads=1:weightp=0:partitions=none:ref=1:8x8dct=0",  # +AQ
    "bframes=0:threads=1:weightp=0:partitions=none:ref=1:aq-mode=0",  # +8x8
    "bframes=0:threads=1:weightp=0:partitions=none:ref=3:8x8dct=0:aq-mode=0",
    "bframes=0:threads=1:weightp=0:partitions=p8x8:ref=1:8x8dct=0:aq-mode=0",
    # everything medium enables, P only
    "bframes=0:threads=1:weightp=0",
])
def test_cabac_p_features_bit_exact(oracle, opts):
    _assert_bit_exact(oracle, _clip("gradmotion_320x192"), opts)


def test_cavlc_p_full_bit_exact(oracle):
    _assert_bit_exact(oracle, _clip("gradmotion_320x192"),
                      "cabac=0:bframes=0:ref=3:weightp=0:threads=1")


def test_weighted_p_fade_bit_exact(oracle):
    # x264 reports Weighted P-Frames + 4-entry L0 from ref duplication
    _assert_bit_exact(oracle, _fade(_clip("gradmotion_320x192")),
                      "bframes=0:threads=1:partitions=none:8x8dct=0:"
                      "aq-mode=0")


# -- B ladders --------------------------------------------------------------

@pytest.mark.parametrize("opts", [
    "bframes=1:b-pyramid=0:ref=1:threads=1:weightp=0:weightb=0:"
    "partitions=none:8x8dct=0:aq-mode=0",
    # implicit weighted bipred (weightb)
    "bframes=2:b-pyramid=0:ref=1:threads=1:weightp=0:partitions=none:"
    "8x8dct=0:aq-mode=0",
    # B-pyramid: B pictures entering the DPB as references
    "bframes=3:ref=3:threads=1:weightp=0",
])
def test_cabac_b_features_bit_exact(oracle, opts):
    _assert_bit_exact(oracle, _clip("gradmotion_320x192", 12), opts)


def test_cavlc_b_pyramid_bit_exact(oracle):
    _assert_bit_exact(oracle, _clip("gradmotion_320x192", 12),
                      "cabac=0:ref=3:weightp=0:threads=1")


# -- the real bar: untouched medium defaults --------------------------------

@pytest.mark.parametrize("clip", ["gradmotion_320x192", "texture_256x160"])
def test_medium_defaults_bit_exact(oracle, clip):
    _assert_bit_exact(oracle, _clip(clip, 12), "threads=1")


def test_medium_defaults_fade_bit_exact(oracle):
    """weightp=2 + B + pyramid + AQ + 8x8 all at once."""
    _assert_bit_exact(oracle, _fade(_clip("gradmotion_320x192")),
                      "threads=1")


def test_medium_transcode_end_to_end(oracle):
    """Decode a default-settings libx264-medium stream and re-encode it
    with our encoder: the arbitrary-input -> ours transcode path."""
    from vcp_tpu.codec.h264.decoder import psnr
    from vcp_tpu.codec.h264.encoder import EncoderConfig, H264Encoder
    frames = _clip("gradmotion_320x192", 9)
    es = oracle.encode_video("libx264", frames, preset="medium", crf=23,
                             gop=9, opts="x264-params=threads=1")
    decoded = H264Decoder().decode_annexb(es)
    assert len(decoded) == 9
    h, w = decoded[0].y.shape
    enc = H264Encoder(EncoderConfig(width=w, height=h, qp=26, gop_size=9,
                                    cabac=True, deblock=True, effort=5))
    tuples = [(np.asarray(f.y), np.asarray(f.u), np.asarray(f.v))
              for f in decoded]
    items = enc.encode_gop(tuples)
    out = H264Decoder().decode_annexb(
        enc.headers_annexb() + b"".join(it[0] for it in items))
    for i, f in enumerate(out):
        assert psnr(np.asarray(f.y), frames[i][0]) > 30, i
