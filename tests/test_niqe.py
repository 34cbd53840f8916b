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


# ---------------------------------------------------------------------------
# Reference-executed parity: the official scoring pipeline vs the
# reference's in-tree BasicSR NIQE with the official pristine params.
# ---------------------------------------------------------------------------

_REF_RESTORMER = "vision/enhance/multitask/restormer"
_REF_NPZ = ("/root/reference/src/mon_extra/" + _REF_RESTORMER
            + "/basicsr/metrics/niqe_pris_params.npz")


def test_fspecial_window_matches_official_npz():
    from enhax.nn.niqe import _fspecial_gaussian_np
    z = np.load(_REF_NPZ)
    np.testing.assert_allclose(_fspecial_gaussian_np(),
                               z["gaussian_window"], atol=1e-12)


def test_official_scoring_matches_reference_executed(rng, monkeypatch):
    """enhax niqe_official == the reference's basicsr.metrics.niqe
    (executed) with the reference's own official niqe_pris_params.npz,
    across distortion levels — grounding the `metric` CLI's NIQE backend
    (reference: project/runml/metric.py builds pyiqa's NIQE, which BasicSR
    tracks; the executable in-tree copy is restormer/basicsr/metrics/
    niqe.py:67-211)."""
    import types

    import torch  # noqa: F401  (first-import must happen outside the stub context)

    from enhax.convert import refload
    from enhax.nn.niqe import niqe_official

    # skip basicsr/utils/__init__.py's heavy import chain; matlab_functions
    # still loads as a real leaf through the stub package's __path__
    bu = types.ModuleType("basicsr.utils")
    bu.__path__ = ["/root/reference/src/mon_extra/" + _REF_RESTORMER
                   + "/basicsr/utils"]
    bu.__package__ = "basicsr.utils"
    ref = refload.load_vendored(_REF_RESTORMER, "basicsr.metrics.niqe",
                                extra_stubs={"basicsr.utils": bu})
    params = load_niqe_params(_REF_NPZ)
    assert params["impl"] == "official"
    assert params["mu"].shape == (36,) and params["cov"].shape == (36, 36)

    # calculate_niqe loads the npz by a cwd-relative path
    monkeypatch.chdir("/root/reference/src/mon_extra/" + _REF_RESTORMER)

    scores_ref, scores_enhax = [], []
    for noise in (0.0, 0.08, 0.25):
        img = _natural(rng, 288, 384)
        img = np.clip(img + noise * rng.standard_normal(img.shape),
                      0, 1).astype(np.float32)
        bgr255 = (img[..., ::-1] * 255.0).astype(np.float32)
        want = np.asarray(ref.calculate_niqe(bgr255, crop_border=0,
                                             convert_to="y")).item()
        got = float(niqe_official(img, params))
        assert abs(got - want) < 5e-3, (noise, got, want)
        scores_ref.append(want)
        scores_enhax.append(got)
    # heavier distortion scores worse under both implementations
    assert scores_ref[0] < scores_ref[-1]
    assert scores_enhax[0] < scores_enhax[-1]
    # crop_border path agrees too
    img = _natural(rng, 320, 416)
    bgr255 = (img[..., ::-1] * 255.0).astype(np.float32)
    want = np.asarray(ref.calculate_niqe(bgr255, crop_border=16,
                                             convert_to="y")).item()
    got = float(niqe_official(img, params, crop_border=16))
    assert abs(got - want) < 5e-3


def test_niqe_dispatch_official_vs_self(rng):
    """niqe() routes official-layout params through the official pipeline."""
    from enhax.nn.niqe import niqe_official
    params = load_niqe_params(_REF_NPZ)
    img = _natural(rng, 192, 192)
    assert float(niqe(img, params)) == pytest.approx(
        float(niqe_official(img, params)), rel=1e-5)
