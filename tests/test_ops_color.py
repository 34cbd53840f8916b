"""Colorspace conversion tests: round-trips + golden checks vs cv2."""

import jax.numpy as jnp
import numpy as np
import pytest

from enhax.ops import color


@pytest.fixture
def img(rng):
    return jnp.asarray(rng.uniform(0.05, 0.95, size=(2, 8, 8, 3)).astype(np.float32))


def test_grayscale_matches_cv2(rng):
    import cv2
    x = rng.uniform(0, 1, size=(16, 16, 3)).astype(np.float32)
    ours = np.asarray(color.rgb_to_grayscale(jnp.asarray(x)))[..., 0]
    ref = cv2.cvtColor(x, cv2.COLOR_RGB2GRAY)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_hsv_roundtrip(img):
    back = color.hsv_to_rgb(color.rgb_to_hsv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_hsv_matches_cv2(rng):
    import cv2
    x = rng.uniform(0.05, 0.95, size=(16, 16, 3)).astype(np.float32)
    ours = np.asarray(color.rgb_to_hsv(jnp.asarray(x)))
    ref = cv2.cvtColor(x, cv2.COLOR_RGB2HSV)  # H in degrees [0,360)
    np.testing.assert_allclose(ours[..., 0] * 180 / np.pi, ref[..., 0], atol=1e-2)
    np.testing.assert_allclose(ours[..., 1], ref[..., 1], atol=1e-4)
    np.testing.assert_allclose(ours[..., 2], ref[..., 2], atol=1e-6)


def test_hvi_roundtrip(img):
    hvi = color.rgb_to_hvi(img)
    back = color.hvi_to_rgb(hvi)
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=2e-3)


def test_hvi_intensity_is_value(img):
    hvi = color.rgb_to_hvi(img)
    v = jnp.max(img, axis=-1)
    np.testing.assert_allclose(np.asarray(hvi[..., 2]), np.asarray(v), atol=1e-6)


def test_ycbcr_roundtrip(img):
    back = color.ycbcr_to_rgb(color.rgb_to_ycbcr(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=2e-3)


def test_yuv_roundtrip(img):
    back = color.yuv_to_rgb(color.rgb_to_yuv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=2e-2)


def test_lab_roundtrip(img):
    back = color.lab_to_rgb(color.rgb_to_lab(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-3)


def test_lab_matches_cv2(rng):
    import cv2
    x = rng.uniform(0.05, 0.95, size=(16, 16, 3)).astype(np.float32)
    ours = np.asarray(color.rgb_to_lab(jnp.asarray(x)))
    ref = cv2.cvtColor(x, cv2.COLOR_RGB2LAB)
    np.testing.assert_allclose(ours, ref, atol=0.5)  # cv2 uses same D65 path


def test_luv_roundtrip(img):
    back = color.luv_to_rgb(color.rgb_to_luv(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-3)


def test_hls_roundtrip(img):
    back = color.hls_to_rgb(color.rgb_to_hls(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-4)


def test_linear_roundtrip(img):
    back = color.linear_to_rgb(color.rgb_to_linear(img))
    np.testing.assert_allclose(np.asarray(back), np.asarray(img), atol=1e-5)


def test_bgr_swap(img):
    np.testing.assert_array_equal(
        np.asarray(color.bgr_to_rgb(img)), np.asarray(img)[..., ::-1]
    )


def test_sepia_range(img):
    out = color.rgb_to_sepia(img)
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
