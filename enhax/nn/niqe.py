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
- :func:`niqe_official` — the official scoring pipeline, matching the
  reference's in-tree BasicSR implementation (and therefore pyiqa/MATLAB,
  which BasicSR tracks) feature-for-feature: AGGD fits in the
  (alpha, beta_l, beta_r) parameterization, within-block wraparound
  pair products, replicate-pad MSCN, BT.601 studio-swing Y channel,
  2x2-average half-scale. Reference-executed parity against
  ``restormer/basicsr/metrics/niqe.py`` with the reference's own official
  ``niqe_pris_params.npz`` lives in ``tests/test_niqe.py``.

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

    Returns {"mu": (36,), "cov": (36, 36), "impl": "self"} suitable for
    :func:`niqe` (the self-consistent enhax pipeline — fitted and scored
    with identical feature definitions).
    """
    all_f, all_w = [], []
    for img in images:
        f, m = niqe_features(img)
        all_f.append(np.asarray(f))
        all_w.append(np.asarray(m))
    feats = np.concatenate(all_f)
    weights = np.concatenate(all_w)
    mu, cov, _ = _weighted_moments(jnp.asarray(feats), jnp.asarray(weights))
    return {"mu": np.asarray(mu), "cov": np.asarray(cov), "impl": "self"}


def load_niqe_params(path) -> dict:
    """Load official pristine parameters from a local .mat or .npz.

    Accepts the MATLAB release layouts (``pop_mu``/``pop_cov`` or
    ``mu_prisparam``/``cov_prisparam``) and the BasicSR/pyiqa
    ``niqe_pris_params.npz`` layout (``mu_pris_param``/``cov_pris_param``
    + ``gaussian_window``). Official params are tagged ``impl="official"``
    so :func:`niqe` scores them through the official pipeline.
    """
    path = str(path)
    if path.endswith(".npz"):
        with np.load(path) as z:
            if "mu_pris_param" in z:
                return {"mu": np.asarray(z["mu_pris_param"]).reshape(-1),
                        "cov": np.asarray(z["cov_pris_param"]),
                        "gaussian_window": np.asarray(z["gaussian_window"]),
                        "impl": "official"}
            return {"mu": z["mu"], "cov": z["cov"],
                    "impl": str(z["impl"]) if "impl" in z else "self"}
    import scipy.io
    mat = scipy.io.loadmat(path)
    for mu_key, cov_key in (("pop_mu", "pop_cov"),
                            ("mu_prisparam", "cov_prisparam"),
                            ("mu_pris_param", "cov_pris_param")):
        if mu_key in mat:
            out = {"mu": np.asarray(mat[mu_key]).reshape(-1),
                   "cov": np.asarray(mat[cov_key]), "impl": "official"}
            if "gaussian_window" in mat:
                out["gaussian_window"] = np.asarray(mat["gaussian_window"])
            return out
    raise KeyError(f"no NIQE params found in {path}; keys: {list(mat)}")


# ---------------------------------------------------------------------------
# Official scoring pipeline (BasicSR/pyiqa/MATLAB-compatible).
# Reference executable: restormer/basicsr/metrics/niqe.py:10-211 (the
# reference vendors identical copies under nafnet/hinet/retinexformer);
# official pristine stats ship next to it as niqe_pris_params.npz.
# ---------------------------------------------------------------------------

def _fspecial_gaussian_np(size: int = 7, sigma: float = 7.0 / 6.0):
    """MATLAB fspecial('gaussian') in float64 (fallback when params lack
    the window; the official npz ships its own)."""
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    k[k < np.finfo(np.float64).eps * k.max()] = 0.0
    return k / k.sum()


def _aggd_fit_official(x, axis):
    """AGGD fit in the reference's (alpha, beta_l, beta_r) parameterization
    (niqe.py:10-38): beta = std * sqrt(G(1/a)/G(3/a)). A block with no
    negative (or no positive) samples yields NaN exactly like the
    reference's ``np.mean`` over an empty boolean slice; alpha then pins
    to the first grid value, matching ``np.argmin`` over an all-NaN array.
    """
    neg = (x < 0).astype(x.dtype)
    pos = (x > 0).astype(x.dtype)
    left_sq = jnp.sum(x * x * neg, axis=axis) / jnp.sum(neg, axis=axis)
    right_sq = jnp.sum(x * x * pos, axis=axis) / jnp.sum(pos, axis=axis)
    l_std = jnp.sqrt(left_sq)
    r_std = jnp.sqrt(right_sq)
    gammahat = l_std / r_std
    rhat = jnp.mean(jnp.abs(x), axis=axis) ** 2 / jnp.mean(x * x, axis=axis)
    rhatnorm = rhat * (gammahat ** 3 + 1) * (gammahat + 1) \
        / ((gammahat ** 2 + 1) ** 2)
    idx = jnp.argmin((_AGGD_R - rhatnorm[..., None]) ** 2, axis=-1)
    idx = jnp.where(jnp.isnan(rhatnorm), 0, idx)
    alpha = _GAMMA_GRID[idx]
    const = jnp.sqrt(_gamma(1.0 / alpha) / _gamma(3.0 / alpha))
    return alpha, l_std * const, r_std * const


def _official_scale_feats(mscn, patch: int):
    """18 features per block at one scale, reference order and
    parameterization (niqe.py:40-64): AGGD on the raw block ->
    [alpha, (beta_l+beta_r)/2], then for each of the four pair products
    (computed with WITHIN-BLOCK wraparound, as the reference rolls each
    block) -> [alpha, mean, beta_l, beta_r]."""
    blocks = _patchify(mscn, patch)
    a, bl, br = _aggd_fit_official(blocks, axis=(-2, -1))
    feats = [a, (bl + br) / 2.0]
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        pair = blocks * jnp.roll(blocks, (dy, dx), axis=(-2, -1))
        a, bl, br = _aggd_fit_official(pair, axis=(-2, -1))
        mean = (br - bl) * (_gamma(2.0 / a) / _gamma(1.0 / a))
        feats.extend([a, mean, bl, br])
    return jnp.stack(feats, axis=-1)


def _mscn_official(gray, win):
    """Replicate-padded MSCN (the reference convolves mode='nearest');
    sigma uses abs() rather than clamping, as the reference does."""
    p = win.shape[0] // 2
    x = jnp.pad(gray, ((p, p), (p, p)), mode="edge")
    conv = lambda v: jax.lax.conv_general_dilated(
        v[None, ..., None], win[..., None, None],
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, ..., 0]
    mu = conv(x)
    sigma = jnp.sqrt(jnp.abs(conv(x * x) - mu * mu))
    return (gray - mu) / (sigma + 1.0)


def _to_y_channel(image):
    """BT.601 studio-swing Y in [16, 235] from RGB in [0, 1]
    (basicsr/utils/matlab_functions.py:207 bgr2ycbcr, y_only)."""
    r, g, b = image[..., 0], image[..., 1], image[..., 2]
    return 65.481 * r + 128.553 * g + 24.966 * b + 16.0


def niqe_official(image, params: dict, crop_border: int = 0,
                  convert_to: str = "y", block: int = 96) -> float:
    """Official NIQE score, matching the reference's BasicSR pipeline
    (niqe.py:67-211 calculate_niqe) on enhax RGB [0, 1] inputs.

    Feature extraction runs jitted in f32; the MVG statistics and the
    pseudo-inverse finish on host in f64, like the reference.
    """
    image = jnp.asarray(image, jnp.float32)
    if image.ndim == 4:
        image = image[0]
    if image.ndim == 3:
        if convert_to == "y":
            gray = _to_y_channel(image)
        elif convert_to == "gray":
            gray = (0.299 * image[..., 0] + 0.587 * image[..., 1]
                    + 0.114 * image[..., 2]) * 255.0
        else:
            raise ValueError(f"convert_to must be 'y' or 'gray': {convert_to}")
    else:
        gray = image * 255.0
    if crop_border:
        gray = gray[crop_border:-crop_border, crop_border:-crop_border]

    h = (gray.shape[0] // block) * block
    w = (gray.shape[1] // block) * block
    if h < block or w < block:
        raise ValueError(f"image too small for NIQE block size {block}: "
                         f"{gray.shape}")
    gray = gray[:h, :w]

    win = jnp.asarray(params.get("gaussian_window",
                                 _fspecial_gaussian_np()), jnp.float32)
    f1 = _official_scale_feats(_mscn_official(gray, win), block)
    # half scale: the reference downsamples with cv2 INTER_LINEAR at an
    # exact 0.5 factor, which is the 2x2 box average.
    half = (gray[0::2, 0::2] + gray[0::2, 1::2]
            + gray[1::2, 0::2] + gray[1::2, 1::2]) / 4.0
    f2 = _official_scale_feats(_mscn_official(half, win), block // 2)
    feats = np.asarray(jnp.concatenate([f1, f2], axis=-1), np.float64)

    mu_d = np.nanmean(feats, axis=0)
    good = feats[~np.isnan(feats).any(axis=1)]
    cov_d = np.cov(good, rowvar=False)
    mu_p = np.asarray(params["mu"], np.float64).reshape(-1)
    cov_p = np.asarray(params["cov"], np.float64)
    d = mu_p - mu_d
    inv = np.linalg.pinv((cov_p + cov_d) / 2.0)
    return float(np.sqrt(max(d @ inv @ d, 0.0)))


def niqe(image, params: dict):
    """NIQE score (lower is better) of one image against pristine params.

    Dispatches on ``params["impl"]``: official-layout params (loaded via
    :func:`load_niqe_params`) score through :func:`niqe_official`;
    self-fitted params (from :func:`fit_niqe_params`, and untagged dicts
    for backward compatibility) score through the self-consistent enhax
    pipeline.
    """
    if params.get("impl") == "official" or "gaussian_window" in params:
        return jnp.asarray(niqe_official(image, params), jnp.float32)
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
        params = load_niqe_params(path)
    return niqe(pred, params)
