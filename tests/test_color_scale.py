"""Color conversion + scaling op tests."""

import numpy as np

from vcp_tpu.ops import color, scale


def test_nv12_i420_roundtrip():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (32, 64)).astype(np.uint8)
    u = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    v = rng.integers(0, 256, (16, 32)).astype(np.uint8)
    y2, uv = color.i420_to_nv12(y, u, v)
    y3, u3, v3 = color.nv12_to_i420(y2, uv)
    np.testing.assert_array_equal(np.asarray(u3), u)
    np.testing.assert_array_equal(np.asarray(v3), v)
    np.testing.assert_array_equal(np.asarray(y3), y)


def test_rgb_yuv_rgb_roundtrip_error_bounded():
    """Start from RGB (always in gamut); constant 2x2 blocks so chroma
    subsampling is lossless. Roundtrip error stays small."""
    rng = np.random.default_rng(1)
    rgb_small = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    rgb = np.repeat(np.repeat(rgb_small, 2, axis=0), 2, axis=1)
    y, u, v = (np.asarray(p) for p in color.rgb_to_yuv420(rgb))
    rgb2 = np.asarray(color.yuv420_to_rgb(y, u, v))
    err = np.abs(rgb2.astype(int) - rgb.astype(int))
    assert err.max() <= 6, err.max()
    assert err.mean() <= 2.5, err.mean()


def test_yuv_to_rgb_matches_float_reference():
    rng = np.random.default_rng(5)
    y = rng.integers(16, 236, (16, 16)).astype(np.uint8)
    u = rng.integers(16, 241, (8, 8)).astype(np.uint8)
    v = rng.integers(16, 241, (8, 8)).astype(np.uint8)
    got = np.asarray(color.yuv420_to_rgb(y, u, v)).astype(np.int32)
    # float BT.601 limited-range reference
    yf = (y.astype(np.float64) - 16) * 255.0 / 219.0
    uu = np.repeat(np.repeat(u, 2, 0), 2, 1).astype(np.float64) - 128
    vv = np.repeat(np.repeat(v, 2, 0), 2, 1).astype(np.float64) - 128
    r = yf + 1.596 * vv
    g = yf - 0.391 * uu - 0.813 * vv
    b = yf + 2.018 * uu
    ref = np.clip(np.stack([r, g, b], -1), 0, 255)
    assert np.abs(got - ref).max() <= 2.0


def test_gray_maps_to_neutral_rgb():
    y = np.full((16, 16), 126, np.uint8)
    u = np.full((8, 8), 128, np.uint8)
    v = np.full((8, 8), 128, np.uint8)
    rgb = np.asarray(color.yuv420_to_rgb(y, u, v))
    assert np.all(np.abs(rgb.astype(int) - 128) <= 1)
    assert np.all(rgb[..., 0] == rgb[..., 1])


def test_bilinear_resize_identity_and_shapes():
    rng = np.random.default_rng(2)
    x = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    same = np.asarray(scale.bilinear_resize(x, 48, 64))
    np.testing.assert_array_equal(same, x)
    down = np.asarray(scale.bilinear_resize(x, 24, 32))
    assert down.shape == (24, 32)
    up = np.asarray(scale.bilinear_resize(x, 96, 128))
    assert up.shape == (96, 128)


def test_bilinear_constant_preserved():
    x = np.full((32, 32), 77, np.uint8)
    out = np.asarray(scale.bilinear_resize(x, 17, 23))
    assert np.all(out == 77)


def test_scale_yuv420_even_dims():
    y = np.zeros((48, 64), np.uint8)
    u = np.zeros((24, 32), np.uint8)
    v = np.zeros((24, 32), np.uint8)
    ys, us, vs = scale.scale_yuv420(y, u, v, 33, 45)
    assert ys.shape == (32, 44)  # rounded to even
    assert us.shape == (16, 22)
