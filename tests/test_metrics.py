"""Metric tests: PSNR vs cv2, SSIM vs an independent numpy implementation."""

import jax.numpy as jnp
import numpy as np
import pytest

from enhax.nn import metrics


def test_psnr_matches_cv2(rng):
    import cv2
    a = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
    b = rng.uniform(0, 255, (32, 32, 3)).astype(np.uint8)
    ours = float(metrics.psnr(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32),
                              data_range=255.0))
    ref = cv2.PSNR(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_psnr_identical_is_large():
    x = jnp.full((8, 8, 3), 0.5)
    assert float(metrics.psnr(x, x)) > 100


def _numpy_ssim(x, y, data_range=1.0, win=11, sigma=1.5, k1=0.01, k2=0.03):
    """Independent scipy-based SSIM (gaussian window, valid padding)."""
    from scipy.ndimage import convolve
    coords = np.arange(win) - win // 2
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    kernel = np.outer(g, g)

    def filt(im):
        out = np.stack([convolve(im[..., c], kernel) for c in range(im.shape[-1])], -1)
        p = win // 2
        return out[p:-p, p:-p]

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mx, my = filt(x), filt(y)
    sxx = filt(x * x) - mx * mx
    syy = filt(y * y) - my * my
    sxy = filt(x * y) - mx * my
    num = (2 * mx * my + c1) * (2 * sxy + c2)
    den = (mx**2 + my**2 + c1) * (sxx + syy + c2)
    return float(np.mean(num / den))


def test_ssim_matches_numpy_reference(rng):
    x = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape).astype(np.float32), 0, 1)
    ours = float(metrics.ssim(jnp.asarray(x)[None], jnp.asarray(y)[None]))
    ref = _numpy_ssim(x, y)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 24, 24, 3)).astype(np.float32))
    np.testing.assert_allclose(float(metrics.ssim(x, x)), 1.0, atol=1e-6)


def test_ms_ssim_identical_is_one(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    np.testing.assert_allclose(float(metrics.ms_ssim(x, x)), 1.0, atol=1e-5)


def test_ms_ssim_ordering(rng):
    x = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    mild = x + 0.02
    strong = jnp.asarray(rng.uniform(0, 1, (1, 192, 192, 3)).astype(np.float32))
    assert float(metrics.ms_ssim(x, mild)) > float(metrics.ms_ssim(x, strong))


def test_mae_mse_rmse(rng):
    x = jnp.zeros((4, 4, 1))
    y = jnp.full((4, 4, 1), 2.0)
    assert float(metrics.mae(x, y)) == 2.0
    assert float(metrics.mse(x, y)) == 4.0
    assert float(metrics.rmse(x, y)) == 2.0


def test_lpips_architecture_and_ordering(rng):
    """LPIPS with random (untrained) weights still orders distances sanely."""
    import jax
    from enhax.nn.metrics import _LPIPSAlexFeatures, lpips
    feat = _LPIPSAlexFeatures()
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    params = feat.init(jax.random.PRNGKey(0), x)
    lins = [np.abs(rng.normal(size=c)).astype(np.float32)
            for c in (64, 192, 384, 256, 256)]
    same = float(lpips(x, x, params, lins))
    near = float(lpips(x, jnp.clip(x + 0.02, 0, 1), params, lins))
    far = float(lpips(x, jnp.asarray(rng.uniform(0, 1, x.shape).astype(np.float32)),
                      params, lins))
    assert same < 1e-9
    assert near < far


def test_miou():
    from enhax.nn.metrics import miou
    pred = jnp.asarray([[[0, 0], [1, 1]]])
    tgt = jnp.asarray([[[0, 1], [1, 1]]])
    # class0: inter 1 union 2 -> .5 ; class1: inter 2 union 3 -> .667
    v = float(miou(pred, tgt, num_classes=2, ignore_index=None))
    np.testing.assert_allclose(v, (0.5 + 2 / 3) / 2, atol=1e-6)


def test_miou_ignore_index():
    from enhax.nn.metrics import miou
    pred = jnp.asarray([[[0, 1]]])
    tgt = jnp.asarray([[[0, 255]]])
    v = float(miou(pred, tgt, num_classes=2))
    np.testing.assert_allclose(v, 1.0, atol=1e-6)  # only class0 counted
