"""NIQE: Natural Image Quality Evaluator (no-reference), pure JAX.

The reference scores NIQE through pyiqa (``project/runml/metric.py:25-157``
builds ``pyiqa.create_metric("niqe")``); no egress means the pretrained
MATLAB pristine statistics cannot be fetched, so enhax rebuilds the full
algorithm (Mittal et al., "Making a 'Completely Blind' Image Quality
Analyzer", SPL 2013) and exposes:

- :func:`niqe_features` — per-patch 36-dim NSS features + sharpness mask.
- :func:`fit_niqe_params` — fit the pristine multivariate-Gaussian model on
  any local set of high-quality images.
- :func:`load_niqe_params` — load the official ``niqe_modelparameters.mat``
  (keys ``pop_mu``/``pop_cov`` or ``mu_prisparam``/``cov_prisparam``) if the
  user supplies it locally.
- :func:`niqe` / :func:`make_niqe` — score an image against a params dict.

Pipeline notes (kept identical between fitting and scoring, which is what
makes scores self-consistent): reflect-padded Gaussian 7x7 (sigma 7/6) MSCN,
96-px patches at scale 1 / 48-px at scale 2 (half-res via bilinear resize),
patch selection by local sharpness > 0.75 * max as a weight mask (same
selection as the canonical implementation, expressed as weighted moments so
shapes stay static under jit). Scores match MATLAB only when the official
.mat is supplied; params fit with :func:`fit_niqe_params` are exact for
ranking/monitoring within this pipeline.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln

from enhax.constants import METRICS

_GAMMA_GRID = jnp.arange(0.2, 10.001, 0.001)


def _gamma(x):
    return jnp.exp(gammaln(x))


# Moment-ratio lookup tables (precomputed once at trace time).
# GGD:  rho(g) = G(1/g) G(3/g) / G(2/g)^2
_GGD_RHO = _gamma(1.0 / _GAMMA_GRID) * _gamma(3.0 / _GAMMA_GRID) \
    / _gamma(2.0 / _GAMMA_GRID) ** 2
# AGGD: r(a) = G(2/a)^2 / (G(1/a) G(3/a))
_AGGD_R = _gamma(2.0 / _GAMMA_GRID) ** 2 \
    / (_gamma(1.0 / _GAMMA_GRID) * _gamma(3.0 / _GAMMA_GRID))


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0):
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = jnp.outer(g, g)
    return k / k.sum()


def _filter2(img, kernel):
    """2D correlation with reflect padding, SAME output (img: (H, W))."""
    p = kernel.shape[0] // 2
    x = jnp.pad(img, ((p, p), (p, p)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x[None, ..., None], kernel[..., None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]


def _mscn(gray):
    """Mean-subtracted contrast-normalized coefficients + local sigma map."""
    win = _gaussian_window()
    mu = _filter2(gray, win)
    sigma = jnp.sqrt(jnp.maximum(_filter2(gray * gray, win) - mu * mu, 0.0))
    return (gray - mu) / (sigma + 1.0), sigma


def _ggd_fit(x, axis):
    """Generalized-Gaussian fit by moment matching -> (alpha, sigma_sq)."""
    sigma_sq = jnp.mean(x ** 2, axis=axis)
    e_abs = jnp.mean(jnp.abs(x), axis=axis)
    rho = sigma_sq / jnp.maximum(e_abs ** 2, 1e-12)
    idx = jnp.argmin(
        jnp.abs(rho[..., None] - _GGD_RHO), axis=-1)
    return _GAMMA_GRID[idx], sigma_sq


def _aggd_fit(x, axis):
    """Asymmetric GGD fit -> (alpha, mean, left_var, right_var)."""
    neg = (x < 0).astype(x.dtype)
    pos = (x > 0).astype(x.dtype)
    cnt_l = jnp.maximum(jnp.sum(neg, axis=axis), 1.0)
    cnt_r = jnp.maximum(jnp.sum(pos, axis=axis), 1.0)
    left_sq = jnp.sum((x * neg) ** 2, axis=axis) / cnt_l
    right_sq = jnp.sum((x * pos) ** 2, axis=axis) / cnt_r
    l_std = jnp.sqrt(left_sq)
    r_std = jnp.sqrt(right_sq)
    gammahat = l_std / jnp.maximum(r_std, 1e-12)
    rhat = jnp.mean(jnp.abs(x), axis=axis) ** 2 \
        / jnp.maximum(jnp.mean(x ** 2, axis=axis), 1e-12)
    rhatnorm = rhat * (gammahat ** 3 + 1) * (gammahat + 1) \
        / jnp.maximum((gammahat ** 2 + 1) ** 2, 1e-12)
    idx = jnp.argmin(jnp.abs(rhatnorm[..., None] - _AGGD_R), axis=-1)
    alpha = _GAMMA_GRID[idx]
    const = jnp.sqrt(_gamma(1.0 / alpha) / _gamma(3.0 / alpha))
    mean = (r_std - l_std) * (_gamma(2.0 / alpha) / _gamma(1.0 / alpha)) * const
    return alpha, mean, left_sq, right_sq


def _patchify(img, patch: int):
    """(H, W) -> (P, patch, patch); H, W must be multiples of patch."""
    h, w = img.shape
    return img.reshape(h // patch, patch, w // patch, patch) \
        .transpose(0, 2, 1, 3).reshape(-1, patch, patch)


def _scale_features(mscn, patch: int):
    """18 NSS features per patch at one scale -> (P, 18)."""
    feats = list(_ggd_fit(_patchify(mscn, patch), axis=(-2, -1)))
    shifts = ((0, 1), (1, 0), (1, 1), (1, -1))  # H, V, D1, D2 products
    for dy, dx in shifts:
        prod = mscn * jnp.roll(jnp.roll(mscn, -dy, axis=0), -dx, axis=1)
        feats.extend(_aggd_fit(_patchify(prod, patch), axis=(-2, -1)))
    return jnp.stack(feats, axis=-1)


def _to_gray(image):
    image = jnp.asarray(image, jnp.float32)
    if image.ndim == 4:
        image = image[0]
    if image.ndim == 3:
        r, g, b = image[..., 0], image[..., 1], image[..., 2]
        image = 0.299 * r + 0.587 * g + 0.114 * b
    return image * 255.0


def niqe_features(image, patch: int = 96):
    """Per-patch NSS features of one image.

    Args:
        image: (H, W), (H, W, 3) or (1, H, W, 3), values in [0, 1].
        patch: patch size at scale 1 (48 is used at scale 2).
    Returns:
        (features, weights): (P, 36) float array and a (P,) 0/1 sharpness
        selection mask (sharpness > 0.75 * max, as in the canonical NIQE).
    """
    gray = _to_gray(image)
    h = (gray.shape[0] // patch) * patch
    w = (gray.shape[1] // patch) * patch
    if h < patch or w < patch:
        raise ValueError(f"image too small for NIQE patch size {patch}: "
                         f"{gray.shape}")
    gray = gray[:h, :w]

    mscn1, sigma = _mscn(gray)
    f1 = _scale_features(mscn1, patch)

    half = jax.image.resize(gray, (h // 2, w // 2), "linear")
    mscn2, _ = _mscn(half)
    f2 = _scale_features(mscn2, patch // 2)

    sharp = jnp.mean(_patchify(sigma, patch), axis=(-2, -1))
    weights = (sharp > 0.75 * jnp.max(sharp)).astype(jnp.float32)
    return jnp.concatenate([f1, f2], axis=-1), weights


def _weighted_moments(feats, weights):
    n = jnp.maximum(jnp.sum(weights), 1.0)
    mu = jnp.sum(feats * weights[:, None], axis=0) / n
    d = (feats - mu) * weights[:, None]
    cov = d.T @ d / jnp.maximum(n - 1.0, 1.0)
    return mu, cov, n


def fit_niqe_params(images) -> dict:
    """Fit the pristine MVG model on a local set of high-quality images.

    Returns {"mu": (36,), "cov": (36, 36)} suitable for :func:`niqe`.
    """
    all_f, all_w = [], []
    for img in images:
        f, m = niqe_features(img)
        all_f.append(np.asarray(f))
        all_w.append(np.asarray(m))
    feats = np.concatenate(all_f)
    weights = np.concatenate(all_w)
    mu, cov, _ = _weighted_moments(jnp.asarray(feats), jnp.asarray(weights))
    return {"mu": np.asarray(mu), "cov": np.asarray(cov)}


def load_niqe_params(path) -> dict:
    """Load official MATLAB/pyiqa pristine parameters from a local .mat."""
    import scipy.io
    mat = scipy.io.loadmat(str(path))
    for mu_key, cov_key in (("pop_mu", "pop_cov"),
                            ("mu_prisparam", "cov_prisparam")):
        if mu_key in mat:
            return {"mu": np.asarray(mat[mu_key]).reshape(-1),
                    "cov": np.asarray(mat[cov_key])}
    raise KeyError(f"no NIQE params found in {path}; keys: {list(mat)}")


def niqe(image, params: dict) -> jnp.ndarray:
    """NIQE score (lower is better) of one image against pristine params."""
    feats, weights = niqe_features(image)
    mu_d, cov_d, _ = _weighted_moments(feats, weights)
    mu_p = jnp.asarray(params["mu"], jnp.float32)
    cov_p = jnp.asarray(params["cov"], jnp.float32)
    d = mu_p - mu_d
    pinv = jnp.linalg.pinv((cov_p + cov_d) / 2.0)
    return jnp.sqrt(jnp.maximum(d @ pinv @ d, 0.0))


def make_niqe(params: dict):
    """Bind pristine params -> metric callable ``fn(pred, target=None)``."""
    def metric(pred, target=None):
        return niqe(pred, params)
    return metric


@METRICS.register(name="niqe")
def _niqe_metric(pred, target=None, params: dict | None = None):
    """Registry entry; requires pristine params (official .mat or fitted).

    Set ``params=`` explicitly, or point ENHAX_NIQE_PARAMS at a .mat/.npz.
    """
    if params is None:
        import os
        path = os.environ.get("ENHAX_NIQE_PARAMS")
        if not path:
            raise ValueError(
                "NIQE needs pristine MVG parameters: pass params=, or set "
                "ENHAX_NIQE_PARAMS to niqe_modelparameters.mat (official) or "
                "an .npz from enhax.nn.niqe.fit_niqe_params")
        if path.endswith(".npz"):
            with np.load(path) as z:
                params = {"mu": z["mu"], "cov": z["cov"]}
        else:
            params = load_niqe_params(path)
    return niqe(pred, params)
