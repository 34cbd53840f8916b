"""BRISQUE no-reference IQA in pure JAX.

Rebuild of the BRISQUE metric from the reference's pyiqa-backed eval
harness (project/runml/metric.py:81-86 exposes pyiqa's catalog, which
includes brisque): 36 natural-scene-statistics features (18 per scale
over 2 scales) from MSCN coefficients —

  * MSCN: (I - mu) / (sigma + 1), gaussian-weighted local moments
    (7x7 kernel, sigma 7/6), per the original Mittal et al. TIP 2012.
  * GGD fit (alpha, sigma^2) of the MSCN distribution via the moment
    ratio gamma(1/a)gamma(3/a)/gamma(2/a)^2 lookup.
  * AGGD fits (alpha, mean, left/right variance) of the 4 orientation
    pairwise products (H, V, D1, D2).

Scoring uses an RBF-SVR exactly like the released libsvm model:
``brisque_score(features, svm)`` where ``svm`` holds support vectors,
dual coefficients, rho, gamma and the feature scale ranges — loadable
from the official allmodel file parsed into .npz (no weights are
bundled; supply locally like LPIPS/NIQE weights).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from enhax.constants import METRICS


def _gaussian_kernel(size: int = 7, sigma: float = 7.0 / 6.0):
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(r ** 2) / (2 * sigma ** 2))
    g2 = g[:, None] * g[None, :]
    return g2 / jnp.sum(g2)


def _local_moments(x, k):
    """Gaussian-weighted local mean/std with reflect padding; x (H, W)."""
    s = k.shape[0]
    p = s // 2
    xp = jnp.pad(x, p, mode="reflect")
    kern = k[:, :, None, None]
    conv = lambda t: jax.lax.conv_general_dilated(  # noqa: E731
        t[None, :, :, None], kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    mu = conv(xp)
    sigma = jnp.sqrt(jnp.maximum(conv(xp * xp) - mu * mu, 0.0))
    return mu, sigma


# precomputed gamma-ratio lookup for GGD/AGGD alpha in [0.2, 10]
_GAM = np.arange(0.2, 10.001, 0.001)
try:
    from scipy.special import gamma as _gamma_fn
    _R_GGD = (_gamma_fn(1.0 / _GAM) * _gamma_fn(3.0 / _GAM)
              / _gamma_fn(2.0 / _GAM) ** 2)
    _R_AGGD = (_gamma_fn(2.0 / _GAM) ** 2
               / (_gamma_fn(1.0 / _GAM) * _gamma_fn(3.0 / _GAM)))
except Exception:  # pragma: no cover - scipy is in the base image
    _R_GGD = _R_AGGD = None


def _ggd_fit(x):
    """Generalized Gaussian fit (alpha, sigma^2) by moment matching."""
    gam = jnp.asarray(_GAM, jnp.float32)
    r_tab = jnp.asarray(_R_GGD, jnp.float32)
    sigma_sq = jnp.mean(x ** 2)
    e_abs = jnp.mean(jnp.abs(x))
    rho = sigma_sq / jnp.maximum(e_abs ** 2, 1e-12)
    idx = jnp.argmin((r_tab - rho) ** 2)
    return gam[idx], sigma_sq


def _aggd_fit(x):
    """Asymmetric GGD fit: (alpha, mean, l_var, r_var)."""
    gam = jnp.asarray(_GAM, jnp.float32)
    r_tab = jnp.asarray(_R_AGGD, jnp.float32)
    mask_l = x < 0
    mask_r = x > 0
    cnt_l = jnp.maximum(jnp.sum(mask_l), 1)
    cnt_r = jnp.maximum(jnp.sum(mask_r), 1)
    l_std = jnp.sqrt(jnp.sum(jnp.where(mask_l, x * x, 0.0)) / cnt_l)
    r_std = jnp.sqrt(jnp.sum(jnp.where(mask_r, x * x, 0.0)) / cnt_r)
    gamma_hat = l_std / jnp.maximum(r_std, 1e-12)
    e_abs = jnp.mean(jnp.abs(x))
    # canonical BRISQUE/NIQE moment ratio: rhat = m1^2 / m2, matched
    # against r(alpha) = G(2/a)^2/(G(1/a)G(3/a)) directly (the previous
    # m2/m1^2 vs 1/r inversion mis-fit alpha on any asymmetric sample)
    rho = e_abs ** 2 / jnp.maximum(jnp.mean(x ** 2), 1e-12)
    rhat = rho * (gamma_hat ** 3 + 1) * (gamma_hat + 1) \
        / jnp.maximum((gamma_hat ** 2 + 1) ** 2, 1e-12)
    idx = jnp.argmin((r_tab - rhat) ** 2)
    alpha = gam[idx]
    # mean term in the canonical parameterization:
    # (beta_r - beta_l) * G(2/a)/G(1/a), beta = std * sqrt(G(1/a)/G(3/a))
    import scipy.special as _sp
    g1 = jnp.asarray(_sp.gamma(1.0 / _GAM), jnp.float32)[idx]
    g2 = jnp.asarray(_sp.gamma(2.0 / _GAM), jnp.float32)[idx]
    g3 = jnp.asarray(_sp.gamma(3.0 / _GAM), jnp.float32)[idx]
    mean = (r_std - l_std) * (g2 / g1) * jnp.sqrt(g1 / g3)
    return alpha, mean, l_std ** 2, r_std ** 2


def _scale_features(gray):
    k = _gaussian_kernel()
    mu, sigma = _local_moments(gray, k)
    mscn = (gray - mu) / (sigma + 1.0)
    alpha, sig = _ggd_fit(mscn)
    feats = [alpha, sig]
    shifts = ((0, 1), (1, 0), (1, 1), (1, -1))
    for dy, dx in shifts:
        shifted = jnp.roll(mscn, (-dy, -dx), axis=(0, 1))
        prod = mscn * shifted
        a, m, lv, rv = _aggd_fit(prod)
        feats.extend([a, m, lv, rv])
    return jnp.stack(feats)


def brisque_features(image):
    """36 BRISQUE features; image (H, W, C) or (H, W) in [0, 1]."""
    x = jnp.asarray(image, jnp.float32)
    if x.ndim == 3:
        x = (0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2])
    x = x * 255.0
    f1 = _scale_features(x)
    h, w = x.shape
    half = jax.image.resize(x, (h // 2, w // 2), "linear", antialias=True)
    f2 = _scale_features(half)
    return jnp.concatenate([f1, f2])


def brisque_score(features, svm: dict):
    """RBF-SVR score from a parsed libsvm BRISQUE model.

    svm keys: "sv" (N, 36) support vectors, "coef" (N,), "rho" scalar,
    "gamma" scalar, "lo"/"hi" (36,) feature scaling ranges.
    """
    f = (jnp.asarray(features) - svm["lo"]) / (svm["hi"] - svm["lo"])
    f = -1.0 + 2.0 * f  # libsvm [-1, 1] scaling
    d = jnp.sum((svm["sv"] - f[None, :]) ** 2, axis=-1)
    kern = jnp.exp(-svm["gamma"] * d)
    return jnp.sum(svm["coef"] * kern) - svm["rho"]


@METRICS.register(name="brisque")
def brisque(input, svm: dict | None = None, **_):
    """Per-batch mean BRISQUE. Without an svm dict, returns the feature
    norm deviation (a weightless NR proxy, clearly NOT the calibrated
    score — supply the parsed libsvm model for real values)."""
    x = jnp.asarray(input)
    if x.ndim == 3:
        x = x[None]
    feats = jax.vmap(brisque_features)(x)
    if svm is None:
        return jnp.mean(jnp.linalg.norm(feats, axis=-1))
    return jnp.mean(jax.vmap(lambda f: brisque_score(f, svm))(feats))
