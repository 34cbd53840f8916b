"""Layout / resize / photometry / geometry / filtering op tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from enhax.ops import (
    box_filter, fast_guided_filter, get_image_size, guided_filter,
    image_local_variance, make_divisible, pad_to_divisible, pair_downsample,
    resize, scale_gt_mean, sobel_filter, unpad, adjust_gamma,
    normalize_image, denormalize_image, gaussian_filter,
)


def test_make_divisible():
    assert make_divisible(250, 32) == 256
    assert make_divisible(256, 32) == 256
    assert make_divisible(1, 32) == 32


def test_get_image_size():
    x = jnp.zeros((2, 100, 200, 3))
    assert get_image_size(x) == (100, 200)
    assert get_image_size(x, divisible_by=32) == (128, 224)


def test_pad_unpad_roundtrip(rng):
    x = jnp.asarray(rng.uniform(size=(1, 50, 70, 3)).astype(np.float32))
    padded, size = pad_to_divisible(x, 32)
    assert padded.shape == (1, 64, 96, 3)
    back = unpad(padded, size)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_resize_matches_cv2_bilinear(rng):
    import cv2
    x = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    ours = np.asarray(resize(jnp.asarray(x), (12, 16), method="bilinear"))
    ref = cv2.resize(x, (16, 12), interpolation=cv2.INTER_LINEAR)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_resize_short_side():
    x = jnp.zeros((40, 80, 3))
    out = resize(x, 20, side="short")
    assert out.shape == (20, 40, 3)
    out = resize(x, 20, side="long")
    assert out.shape == (10, 20, 3)


def test_pair_downsample_shapes_and_mean(rng):
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 3)).astype(np.float32))
    d1, d2 = pair_downsample(x)
    assert d1.shape == (2, 4, 4, 3) and d2.shape == (2, 4, 4, 3)
    # average of the two equals the 2x2 average pool
    pool = x.reshape(2, 4, 2, 4, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray((d1 + d2) / 2), np.asarray(pool), atol=1e-6)


def test_box_filter_constant_invariant():
    x = jnp.full((1, 16, 16, 3), 0.7)
    out = box_filter(x, radius=2)
    np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-6)


def test_box_filter_matches_naive(rng):
    x = rng.uniform(size=(9, 11, 1)).astype(np.float32)
    r = 2
    out = np.asarray(box_filter(jnp.asarray(x), radius=r))
    # naive truncated-window mean
    ref = np.zeros_like(x)
    for i in range(9):
        for j in range(11):
            win = x[max(0, i - r): i + r + 1, max(0, j - r): j + r + 1]
            ref[i, j] = win.mean(axis=(0, 1))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_guided_filter_identity_guide(rng):
    # with guide == image and small eps, output ~ image (edge-preserving)
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 1)).astype(np.float32))
    out = guided_filter(x, x, radius=2, eps=1e-8)
    assert float(jnp.mean(jnp.abs(out - x))) < 0.05


def test_guided_filter_smooths_constant_guide(rng):
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 1)).astype(np.float32))
    g = jnp.full_like(x, 0.5)
    out = guided_filter(x, g, radius=3, eps=1e-3)
    assert float(jnp.std(out)) < float(jnp.std(x))


def test_fast_guided_filter_shape(rng):
    lr = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    hr = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    out = fast_guided_filter(lr, lr, hr, radius=1)
    assert out.shape == hr.shape


def test_sobel_zero_on_flat():
    x = jnp.full((1, 12, 12, 1), 0.3)
    out = sobel_filter(x)
    assert float(jnp.max(out)) < 1e-2


def test_local_variance_flat_zero():
    x = jnp.full((8, 8, 1), 0.4)
    v = image_local_variance(x, patch_size=3)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


def test_scale_gt_mean():
    img = jnp.full((4, 4, 3), 0.2)
    tgt = jnp.full((4, 4, 3), 0.4)
    out = scale_gt_mean(img, tgt)
    np.testing.assert_allclose(np.asarray(out), 0.4, atol=1e-6)


def test_gamma_and_normalize():
    x = jnp.asarray([[[0.25]]])
    np.testing.assert_allclose(float(adjust_gamma(x, 0.5)[0, 0, 0]), 0.5, atol=1e-6)
    u8 = jnp.asarray([[[128.0]]])
    n = normalize_image(u8)
    np.testing.assert_allclose(float(n[0, 0, 0]), 128 / 255, atol=1e-6)
    np.testing.assert_allclose(float(denormalize_image(n)[0, 0, 0]), 128.0, atol=1e-4)


def test_gaussian_filter_preserves_mean(rng):
    x = jnp.asarray(rng.uniform(size=(1, 16, 16, 1)).astype(np.float32))
    out = gaussian_filter(x, 5, 1.0)
    assert abs(float(jnp.mean(out)) - float(jnp.mean(x))) < 0.01


def test_hsv_extreme_values():
    """HSV roundtrip at degenerate points (black/white/saturated primaries)."""
    from enhax.ops import color as C
    pts = jnp.asarray([[[0, 0, 0], [1, 1, 1], [1, 0, 0], [0, 1, 0],
                        [0, 0, 1], [0.5, 0.5, 0.5]]], jnp.float32)
    back = C.hsv_to_rgb(C.rgb_to_hsv(pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_hvi_extreme_values():
    from enhax.ops import color as C
    pts = jnp.asarray([[[0, 0, 0], [1, 1, 1], [1, 0, 0], [0, 0, 1]]], jnp.float32)
    back = C.hvi_to_rgb(C.rgb_to_hvi(pts))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=5e-3)


def test_draw_palette():
    from enhax.ops.draw import PALETTE, color_for_id
    assert len(PALETTE) >= 30
    assert color_for_id(0) != color_for_id(1)
    assert color_for_id(5) == color_for_id(5 + len(PALETTE) - 2)
