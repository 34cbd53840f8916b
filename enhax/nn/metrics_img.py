"""Extended image metrics in pure JAX (NHWC).

Rebuild of the remainder of reference ``src/mon/nn/metric/image.py:63-83``
(torchmetrics.image wrappers): ERGAS, PSNR-B, RASE, sliding-window RMSE,
SCC, spectral angle mapper, spectral/spatial distortion indices, total
variation, UIQI, and VIF-p. PSNR/SSIM/MS-SSIM/LPIPS live in
``enhax.nn.metrics``; NIQE/BRISQUE/FID have dedicated modules.

torchmetrics is not installed in this image (the reference env ships it;
ours cannot), so parity tests execute independently-written numpy
references of the same published estimators plus scipy/sklearn where they
exist (``tests/test_metrics_wrappers.py``).

``perceptual_path_length`` lives here as an explicit-generator functional
(pass the generator and a weights-bound similarity such as LPIPS);
``memorization_informed_frechet_inception_distance`` is in
``enhax.nn.fid`` next to plain FID.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from enhax.constants import METRICS
from enhax.nn.metrics import _fspecial_gauss_1d, _gaussian_filter_valid, \
    _ssim_components

__all__ = [
    "ergas", "perceptual_path_length", "psnrb", "rase", "rmse_sw", "scc",
    "spectral_angle_mapper", "spatial_distortion_index",
    "spectral_distortion_index", "total_variation", "uiqi", "vif",
]


def _nhwc(x):
    x = jnp.asarray(x).astype(jnp.float32)
    if x.ndim == 3:
        x = x[None]
    return x


@METRICS.register(name="total_variation")
def total_variation(img, reduction: str = "mean"):
    """Anisotropic TV: per-image sum of |dh| + |dw| over all channels
    (torchmetrics TotalVariation), reduced over the batch."""
    x = _nhwc(img)
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    per_image = dh.sum(axis=(1, 2, 3)) + dw.sum(axis=(1, 2, 3))
    if reduction == "sum":
        return per_image.sum()
    if reduction in (None, "none"):
        return per_image
    return per_image.mean()


@METRICS.register(name="spectral_angle_mapper", aliases=["sam"])
def spectral_angle_mapper(preds, target, eps: float = 1e-8):
    """Mean per-pixel spectral angle (radians) between channel vectors."""
    p, t = _nhwc(preds), _nhwc(target)
    dot = jnp.sum(p * t, axis=-1)
    den = jnp.linalg.norm(p, axis=-1) * jnp.linalg.norm(t, axis=-1)
    cos = jnp.clip(dot / jnp.clip(den, eps), -1.0, 1.0)
    return jnp.mean(jnp.arccos(cos))


@METRICS.register(name="ergas",
                  aliases=["error_relative_global_dimensionless_synthesis"])
def ergas(preds, target, ratio: float = 4.0):
    """ERGAS = 100*ratio*sqrt(mean_c(RMSE_c^2 / mean(target_c)^2)) per image,
    meaned over the batch (Wald 2000; torchmetrics default ratio=4)."""
    p, t = _nhwc(preds), _nhwc(target)
    rmse_c2 = jnp.mean((p - t) ** 2, axis=(1, 2))          # (N, C)
    mu_c = jnp.mean(t, axis=(1, 2))                        # (N, C)
    per_image = 100.0 * ratio * jnp.sqrt(
        jnp.mean(rmse_c2 / jnp.clip(mu_c ** 2, 1e-12), axis=1))
    return per_image.mean()


@METRICS.register(name="rase", aliases=["relative_average_spectral_error"])
def rase(preds, target):
    """RASE = 100 / mean(target) * sqrt(mean_c RMSE_c^2) per image."""
    p, t = _nhwc(preds), _nhwc(target)
    rmse_c2 = jnp.mean((p - t) ** 2, axis=(1, 2))
    mu = jnp.mean(t, axis=(1, 2, 3))
    per_image = 100.0 / jnp.clip(mu, 1e-12) * jnp.sqrt(jnp.mean(rmse_c2, axis=1))
    return per_image.mean()


def _sliding_windows(x, win: int):
    """(N, nH, nW, win, win, C) view of non-overlapping-stride-1 windows
    via gather-free slicing (small win only; metric-sized use)."""
    n, h, w, c = x.shape
    # stack shifted slices: output (N, H', W', win*win, C)
    cols = []
    for i in range(win):
        for j in range(win):
            cols.append(x[:, i:i + h - win + 1, j:j + w - win + 1, :])
    return jnp.stack(cols, axis=3)  # (N, H', W', win*win, C)


@METRICS.register(name="rmse_sw",
                  aliases=["root_mean_squared_error_using_sliding_window"])
def rmse_sw(preds, target, window_size: int = 8):
    """Mean over sliding windows of the windowed RMSE."""
    p, t = _nhwc(preds), _nhwc(target)
    se = _sliding_windows((p - t) ** 2, window_size)
    rmse_w = jnp.sqrt(jnp.mean(se, axis=3))  # (N, H', W', C)
    return jnp.mean(rmse_w)


@METRICS.register(name="uiqi", aliases=["universal_image_quality_index"])
def uiqi(preds, target, window_size: int = 11, sigma: float = 1.5,
         eps: float = 1e-12):
    """Wang-Bovik universal image quality index — SSIM with C1=C2=0 over a
    Gaussian window (the torchmetrics construction)."""
    p, t = _nhwc(preds), _nhwc(target)
    ssim_map, _ = _ssim_components(p, t, 1.0, window_size, sigma, (0.0, 0.0))
    return jnp.mean(ssim_map)


_LAPLACIAN = np.array([[-1.0, -1.0, -1.0],
                       [-1.0, 8.0, -1.0],
                       [-1.0, -1.0, -1.0]], np.float32)


def _conv2_same_zero(x, k):
    """2D filter per channel, zero 'same' padding, on (N, H, W, C)."""
    import jax.lax as lax
    kh, kw = k.shape
    c = x.shape[-1]
    kern = jnp.asarray(k)[:, :, None, None] * jnp.eye(c)[None, None]
    return lax.conv_general_dilated(
        x, kern, window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@METRICS.register(name="scc", aliases=["spatial_correlation_coefficient"])
def scc(preds, target, window_size: int = 8):
    """Spatial correlation coefficient: Laplacian high-pass both images,
    then mean windowed Pearson correlation (uniform window, valid)."""
    p = _conv2_same_zero(_nhwc(preds), _LAPLACIAN)
    t = _conv2_same_zero(_nhwc(target), _LAPLACIAN)
    w2 = window_size * window_size
    pw = _sliding_windows(p, window_size)
    tw = _sliding_windows(t, window_size)
    mu_p = pw.mean(axis=3, keepdims=True)
    mu_t = tw.mean(axis=3, keepdims=True)
    cov = jnp.mean((pw - mu_p) * (tw - mu_t), axis=3)
    var_p = jnp.mean((pw - mu_p) ** 2, axis=3)
    var_t = jnp.mean((tw - mu_t) ** 2, axis=3)
    den = jnp.sqrt(var_p * var_t)
    corr = jnp.where(den > 0, cov / jnp.clip(den, 1e-12), 0.0)
    return jnp.mean(corr)


@METRICS.register(name="psnrb",
                  aliases=["peak_signal_noise_ratio_with_blocked_effect"])
def psnrb(preds, target, data_range: float = 1.0, block_size: int = 8):
    """PSNR-B (Yim & Bovik 2011): 10*log10(range^2 / (MSE + BEF)), where the
    blocking effect factor penalizes discontinuities across the prediction's
    block boundaries."""
    p, t = _nhwc(preds), _nhwc(target)
    mse = jnp.mean((p - t) ** 2)

    def _bef(x):
        n, h, w, c = x.shape
        # column pairs (j, j+1): boundary if (j+1) % block == 0
        jmask = (jnp.arange(w - 1) + 1) % block_size == 0
        dcol2 = jnp.mean((x[:, :, 1:, :] - x[:, :, :-1, :]) ** 2, axis=(0, 1, 3))
        imask = (jnp.arange(h - 1) + 1) % block_size == 0
        drow2 = jnp.mean((x[:, 1:, :, :] - x[:, :-1, :, :]) ** 2, axis=(0, 2, 3))
        d_b = (jnp.sum(jnp.where(jmask, dcol2, 0.0))
               + jnp.sum(jnp.where(imask, drow2, 0.0))) \
            / jnp.clip(jmask.sum() + imask.sum(), 1)
        d_bc = (jnp.sum(jnp.where(~jmask, dcol2, 0.0))
                + jnp.sum(jnp.where(~imask, drow2, 0.0))) \
            / jnp.clip((~jmask).sum() + (~imask).sum(), 1)
        eta = jnp.where(d_b > d_bc,
                        jnp.log2(float(block_size))
                        / jnp.log2(float(min(h, w))), 0.0)
        return eta * (d_b - d_bc)

    return 10.0 * jnp.log10(data_range ** 2
                            / jnp.clip(mse + _bef(p), 1e-12))


@METRICS.register(name="vif", aliases=["visual_information_fidelity", "vifp"])
def vif(preds, target, sigma_nsq: float = 2.0):
    """Pixel-domain visual information fidelity (VIF-p, Sheikh & Bovik 2006):
    4 wavelet-free scales, Gaussian windows N = 2^(4-s+1)+1 with sigma N/5,
    GSM gain/noise decomposition per scale. Channel-meaned.

    Note: sigma_nsq=2 assumes [0, 255]-range luminance (the classic
    implementation); pass images scaled accordingly for comparable scores.
    """
    p, t = _nhwc(preds), _nhwc(target)
    eps = 1e-10
    num = 0.0
    den = 0.0
    for scale in range(1, 5):
        n = 2 ** (4 - scale + 1) + 1
        win = _fspecial_gauss_1d(n, n / 5.0)
        if scale > 1:
            p = _gaussian_filter_valid(p, win)[:, ::2, ::2, :]
            t = _gaussian_filter_valid(t, win)[:, ::2, ::2, :]
        mu1 = _gaussian_filter_valid(t, win)
        mu2 = _gaussian_filter_valid(p, win)
        mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        sigma1_sq = _gaussian_filter_valid(t * t, win) - mu1_sq
        sigma2_sq = _gaussian_filter_valid(p * p, win) - mu2_sq
        sigma12 = _gaussian_filter_valid(t * p, win) - mu1_mu2
        sigma1_sq = jnp.maximum(sigma1_sq, 0.0)
        sigma2_sq = jnp.maximum(sigma2_sq, 0.0)
        g = sigma12 / (sigma1_sq + eps)
        sv_sq = sigma2_sq - g * sigma12
        g = jnp.where(sigma1_sq < eps, 0.0, g)
        sv_sq = jnp.where(sigma1_sq < eps, sigma2_sq, sv_sq)
        sigma1_sq = jnp.where(sigma1_sq < eps, 0.0, sigma1_sq)
        sv_sq = jnp.where(sigma2_sq < eps, 0.0, sv_sq)
        g = jnp.where(sigma2_sq < eps, 0.0, g)
        sv_sq = jnp.where(g < 0, sigma2_sq, sv_sq)
        g = jnp.maximum(g, 0.0)
        sv_sq = jnp.maximum(sv_sq, eps)
        num = num + jnp.sum(jnp.log10(1.0 + g * g * sigma1_sq
                                      / (sv_sq + sigma_nsq)))
        den = den + jnp.sum(jnp.log10(1.0 + sigma1_sq / sigma_nsq))
    return num / jnp.clip(den, 1e-12)


@METRICS.register(name="spectral_distortion_index", aliases=["d_lambda"])
def spectral_distortion_index(preds, ms, p: int = 1, window_size: int = 11):
    """D_lambda (Alparone 2008): mean |Q(pred_l, pred_r) - Q(ms_l, ms_r)|^p
    over distinct band pairs, ^(1/p)."""
    pr, m = _nhwc(preds), _nhwc(ms)
    c = pr.shape[-1]
    diffs = []
    for l in range(c):
        for r in range(c):
            if l == r:
                continue
            q_p = uiqi(pr[..., l:l + 1], pr[..., r:r + 1], window_size)
            q_m = uiqi(m[..., l:l + 1], m[..., r:r + 1], window_size)
            diffs.append(jnp.abs(q_p - q_m) ** p)
    return jnp.mean(jnp.stack(diffs)) ** (1.0 / p)


@METRICS.register(name="spatial_distortion_index", aliases=["d_s"])
def spatial_distortion_index(preds, ms, pan, pan_lr=None, q: int = 1,
                             window_size: int = 7):
    """D_s (Alparone 2008): mean_c |Q(pred_c, pan) - Q(ms_c, pan_lr)|^q
    ^(1/q); pan_lr defaults to pan average-pooled to the ms resolution."""
    pr, m = _nhwc(preds), _nhwc(ms)
    pan = _nhwc(pan)
    if pan_lr is None:
        fy = pan.shape[1] // m.shape[1]
        fx = pan.shape[2] // m.shape[2]
        n, h, w, c = pan.shape
        pan_lr = pan[:, : m.shape[1] * fy, : m.shape[2] * fx, :].reshape(
            n, m.shape[1], fy, m.shape[2], fx, c).mean(axis=(2, 4))
    else:
        pan_lr = _nhwc(pan_lr)
    c = pr.shape[-1]
    diffs = []
    for l in range(c):
        q_hi = uiqi(pr[..., l:l + 1], pan, window_size)
        q_lo = uiqi(m[..., l:l + 1], pan_lr, window_size)
        diffs.append(jnp.abs(q_hi - q_lo) ** q)
    return jnp.mean(jnp.stack(diffs)) ** (1.0 / q)


def _slerp(z0, z1, t):
    """Spherical interpolation between latent rows (StyleGAN PPL)."""
    z0n = z0 / jnp.linalg.norm(z0, axis=-1, keepdims=True)
    z1n = z1 / jnp.linalg.norm(z1, axis=-1, keepdims=True)
    omega = jnp.arccos(jnp.clip(jnp.sum(z0n * z1n, axis=-1, keepdims=True),
                                -1.0, 1.0))
    so = jnp.sin(omega)
    # fall back to lerp where the endpoints are (anti)parallel
    safe = jnp.abs(so) > 1e-7
    sl = (jnp.sin((1.0 - t) * omega) / jnp.where(safe, so, 1.0)) * z0 \
        + (jnp.sin(t * omega) / jnp.where(safe, so, 1.0)) * z1
    return jnp.where(safe, sl, (1.0 - t) * z0 + t * z1)


@METRICS.register(name="perceptual_path_length", aliases=["ppl"])
def perceptual_path_length(generator, z_size: int, similarity,
                           num_samples: int = 256, batch_size: int = 64,
                           interpolation: str = "lerp",
                           epsilon: float = 1e-4, sample_mode: str = "full",
                           lower_discard: float | None = 0.01,
                           upper_discard: float | None = 0.99,
                           key=None):
    """Perceptual path length of a generator (StyleGAN metric; reference
    nn/metric/image.py:51,72 wraps torchmetrics PerceptualPathLength).

    Samples latent pairs, perturbs the interpolation coordinate by
    ``epsilon``, and scores ``similarity(img_t, img_t+eps) / epsilon**2``;
    extremes beyond the discard quantiles are dropped (torchmetrics
    semantics). ``generator(z) -> (N, H, W, C)`` images and
    ``similarity(a, b) -> (N,)`` perceptual distances (e.g. a
    weights-bound ``enhax.nn.metrics.lpips``) are passed explicitly —
    this framework has no implicit pretrained downloads.

    Returns ``(mean, std, distances)``.
    """
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    k0, k1, kt = jax.random.split(key, 3)
    z0 = jax.random.normal(k0, (num_samples, z_size))
    z1 = jax.random.normal(k1, (num_samples, z_size))
    if sample_mode == "full":
        t = jax.random.uniform(kt, (num_samples, 1))
    elif sample_mode == "end":
        t = jnp.zeros((num_samples, 1))
    else:
        raise ValueError(f"sample_mode must be full|end, got {sample_mode}")

    interp = _slerp if interpolation == "slerp" else \
        (lambda a, b, tt: a + tt * (b - a))
    if interpolation not in ("lerp", "slerp"):
        raise ValueError(f"interpolation must be lerp|slerp, "
                         f"got {interpolation}")

    dists = []
    for i in range(0, num_samples, batch_size):
        a = interp(z0[i:i + batch_size], z1[i:i + batch_size],
                   t[i:i + batch_size])
        b = interp(z0[i:i + batch_size], z1[i:i + batch_size],
                   t[i:i + batch_size] + epsilon)
        d = jnp.asarray(similarity(generator(a), generator(b)))
        dists.append(d.reshape(-1) / (epsilon ** 2))
    dists = jnp.concatenate(dists)

    kept = dists
    if lower_discard is not None:
        kept = kept[kept >= jnp.quantile(dists, lower_discard)]
    if upper_discard is not None:
        kept = kept[kept <= jnp.quantile(dists, upper_discard)]
    return float(kept.mean()), float(kept.std()), np.asarray(dists)
