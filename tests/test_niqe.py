"""NIQE metric tests: self-consistent scoring with locally fit params."""

import numpy as np
import pytest

from enhax.nn.niqe import (
    fit_niqe_params, load_niqe_params, make_niqe, niqe, niqe_features,
)


def _natural(rng, h=192, w=192):
    """Smooth 'pristine-like' image: low-pass noise with mild texture."""
    import cv2
    base = rng.uniform(0, 1, (h // 8, w // 8, 3)).astype(np.float32)
    img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    img += 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)
    return np.clip(img, 0, 1)


@pytest.fixture(scope="module")
def params():
    rng = np.random.default_rng(0)
    return fit_niqe_params([_natural(rng) for _ in range(8)])


def test_features_shape(rng):
    f, w = niqe_features(_natural(rng, 192, 288))
    assert f.shape == (2 * 3, 36)
    assert w.shape == (6,)
    assert w.max() == 1.0
    assert np.all(np.isfinite(np.asarray(f)))


def test_too_small_raises(rng):
    with pytest.raises(ValueError, match="too small"):
        niqe_features(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))


def test_distortion_ranks_worse(params, rng):
    clean = _natural(rng)
    noisy = np.clip(clean + 0.25 * rng.standard_normal(clean.shape), 0, 1)
    s_clean = float(niqe(clean, params))
    s_noisy = float(niqe(noisy.astype(np.float32), params))
    assert np.isfinite(s_clean) and np.isfinite(s_noisy)
    assert s_noisy > s_clean  # heavy noise must score worse


def test_batched_and_gray_inputs(params, rng):
    img = _natural(rng)
    s3 = float(niqe(img, params))
    s4 = float(niqe(img[None], params))          # NHWC batch of 1
    assert s3 == pytest.approx(s4, rel=1e-5)


def test_make_niqe_and_registry(params, rng):
    import enhax  # noqa: F401  (populate registries)
    from enhax.constants import METRICS
    img = _natural(rng)
    m = make_niqe(params)
    assert float(m(img)) == pytest.approx(float(niqe(img, params)), rel=1e-6)
    assert float(METRICS.get("niqe")(img, params=params)) == pytest.approx(
        float(niqe(img, params)), rel=1e-6)
    with pytest.raises(ValueError, match="pristine"):
        METRICS.get("niqe")(img)  # no params, no env var


def test_mat_and_npz_loaders(params, tmp_path):
    import scipy.io
    mat = tmp_path / "niqe_modelparameters.mat"
    scipy.io.savemat(str(mat), {"pop_mu": params["mu"][None],
                                "pop_cov": params["cov"]})
    loaded = load_niqe_params(mat)
    np.testing.assert_allclose(loaded["mu"], params["mu"], rtol=1e-6)
    np.testing.assert_allclose(loaded["cov"], params["cov"], rtol=1e-6)

    npz = tmp_path / "fit.npz"
    np.savez(npz, **params)
    import os
    from enhax.constants import METRICS
    rng = np.random.default_rng(1)
    img = _natural(rng)
    os.environ["ENHAX_NIQE_PARAMS"] = str(npz)
    try:
        s = float(METRICS.get("niqe")(img))
    finally:
        del os.environ["ENHAX_NIQE_PARAMS"]
    assert s == pytest.approx(float(niqe(img, params)), rel=1e-5)
