"""Restoration / zero-reference loss toolkit in pure JAX (NHWC).

Rebuild of the reference's ``src/mon/nn/loss/`` (base.py + image.py, 1,888
LoC): the complete zero-reference LLIE loss set (spatial consistency,
exposure control, color constancy, illumination TV — image.py:905,:535,:192,
:1357), Charbonnier/PSNR/SSIM/MS-SSIM pixel losses, edge/gradient losses,
depth-weighted smoothness, brightness constancy, texture difference, etc.

Every registered entry is a **constructor**: ``LOSSES.build(name, **params)``
returns a jit-compatible callable ``loss(input, target=None, ...) -> scalar``
closed over static params (the functional analog of the reference's
nn.Module losses). All image tensors are (..., H, W, C) in [0, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from enhax.constants import LOSSES
from enhax.ops.filtering import box_filter
from enhax.ops.layout import image_local_variance

__all__ = [
    "reduce_loss", "l1_loss", "l2_loss", "charbonnier_loss", "smooth_l1_loss",
    "spatial_consistency_loss", "exposure_control_loss", "color_constancy_loss",
    "total_variation_loss", "illumination_smoothness_loss", "psnr_loss",
    "ssim_loss", "ms_ssim_loss", "gradient_loss", "grayscale_loss",
    "brightness_constancy_loss", "channel_consistency_loss",
    "channel_ratio_consistency_loss", "contradict_channel_loss",
    "depth_weighted_smoothness_loss", "edge_aware_loss", "edge_loss",
    "edge_constancy_loss", "edge_charbonnier_loss", "entropy_loss",
    "histogram_loss", "std_loss", "texture_difference_loss", "color_loss",
    "bilateral_smooth_loss",
    "perceptual_loss_builder",
]


def reduce_loss(loss, reduction: str = "mean"):
    """mean/sum/none reduction (reference loss/base.py:60)."""
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def _avg_pool(x, k: int):
    """Non-overlapping kxk average pool on (..., H, W, C)."""
    h, w = x.shape[-3] // k, x.shape[-2] // k
    x = x[..., : h * k, : w * k, :]
    x = x.reshape(*x.shape[:-3], h, k, w, k, x.shape[-1])
    return x.mean(axis=(-4, -2))


def _max_pool_same(x, k: int):
    """kxk max pool, stride 1, SAME padding (reference ContradictChannelLoss)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 3) + (k, k, 1),
        window_strides=(1,) * x.ndim,
        padding="SAME",
    )


# ---------------------------------------------------------------------------
# Pixel losses (reference loss/base.py)
# ---------------------------------------------------------------------------

@LOSSES.register(name="l1_loss", aliases=["mae_loss"])
def l1_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    def fn(input, target, **_):
        return loss_weight * reduce_loss(jnp.abs(input - target), reduction)
    return fn


@LOSSES.register(name="l2_loss", aliases=["mse_loss"])
def l2_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    def fn(input, target, **_):
        return loss_weight * reduce_loss((input - target) ** 2, reduction)
    return fn


@LOSSES.register(name="charbonnier_loss")
def charbonnier_loss(eps: float = 1e-3, loss_weight: float = 1.0, reduction: str = "mean"):
    """sqrt(diff^2 + eps^2) (reference base.py CharbonnierLoss)."""
    def fn(input, target, **_):
        return loss_weight * reduce_loss(
            jnp.sqrt((input - target) ** 2 + eps * eps), reduction)
    return fn


@LOSSES.register(name="smooth_l1_loss", aliases=["smooth_mae_loss"])
def smooth_l1_loss(beta: float = 1.0, loss_weight: float = 1.0, reduction: str = "mean"):
    def fn(input, target, **_):
        d = jnp.abs(input - target)
        l = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
        return loss_weight * reduce_loss(l, reduction)
    return fn


# ---------------------------------------------------------------------------
# Zero-reference LLIE quartet (Zero-DCE; reference image.py:905,:535,:192,:1357)
# ---------------------------------------------------------------------------

# 3x3 neighbor-difference taps: (dy, dx) offsets of the -1 tap relative to center.
_SPA_OFFSETS_4 = {"left": (0, -1), "right": (0, 1), "up": (-1, 0), "down": (1, 0)}
_SPA_OFFSETS_8 = {"upleft": (-1, -1), "upright": (-1, 1),
                  "downleft": (1, -1), "downright": (1, 1)}
# 5x5 two-step taps
_SPA_OFFSETS_16 = {"left2": (0, -2), "right2": (0, 2), "up2": (-2, 0), "down2": (2, 0),
                   "up2left2": (-2, -2), "up2right2": (-2, 2),
                   "down2left2": (2, -2), "down2right2": (2, 2)}
_SPA_OFFSETS_24 = {"up2left1": (-2, -1), "up2right1": (-2, 1),
                   "up1left2": (-1, -2), "up1right2": (-1, 2),
                   "down2left1": (2, -1), "down2right1": (2, 1),
                   "down1left2": (1, -2), "down1right2": (1, 2)}


def _neighbor_diff(pooled, dy: int, dx: int):
    """center - zero-padded neighbor at offset (dy, dx).

    Numerically identical to the reference's F.conv2d with the +1/-1 stencil
    kernels and zero padding (image.py:1176-1201), but expressed as a pad +
    slice so XLA emits one fused elementwise op instead of a conv.
    """
    pad = max(abs(dy), abs(dx))
    p = jnp.pad(pooled, [(0, 0)] * (pooled.ndim - 3) + [(pad, pad), (pad, pad), (0, 0)])
    h, w = pooled.shape[-3], pooled.shape[-2]
    neighbor = p[..., pad + dy : pad + dy + h, pad + dx : pad + dx + w, :]
    return pooled - neighbor


@LOSSES.register(name="spatial_consistency_loss")
def spatial_consistency_loss(
    num_regions: int = 4,
    patch_size: int = 4,
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """L_spa: preserve neighboring-region differences between input & enhanced
    (image.py:905-1275). ``num_regions`` in {4, 8, 16, 24}."""
    if num_regions not in (4, 8, 16, 24):
        raise ValueError(f"num_regions must be one of 4/8/16/24, got {num_regions}")
    offsets = dict(_SPA_OFFSETS_4)
    if num_regions in (8, 16):
        offsets.update(_SPA_OFFSETS_8)
    if num_regions in (16, 24):
        offsets.update(_SPA_OFFSETS_16)
    if num_regions == 24:
        offsets.update(_SPA_OFFSETS_24)
    offs = tuple(offsets.values())

    def fn(input, target, **_):
        org = _avg_pool(jnp.mean(input, axis=-1, keepdims=True), patch_size)
        enh = _avg_pool(jnp.mean(target, axis=-1, keepdims=True), patch_size)
        loss = 0.0
        for dy, dx in offs:
            d = _neighbor_diff(org, dy, dx) - _neighbor_diff(enh, dy, dx)
            loss = loss + d * d
        return loss_weight * reduce_loss(loss, reduction)
    return fn


@LOSSES.register(name="exposure_control_loss")
def exposure_control_loss(
    patch_size: int = 16,
    mean_val: float = 0.6,
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """L_exp: distance of local mean intensity from level E (image.py:535)."""
    def fn(input, target=None, **_):
        x = jnp.mean(input, axis=-1, keepdims=True)
        mean = _avg_pool(x, patch_size)
        return loss_weight * reduce_loss((mean - mean_val) ** 2, reduction)
    return fn


@LOSSES.register(name="exposure_value_control_loss")
def exposure_value_control_loss(
    patch_size: int = 16,
    mean_val: float = 0.6,
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """L_exp variant on sqrt of pooled intensity (image.py:572-603):
    (sqrt(avgpool(mean_c(x))) - E)^2 — used by Zero-MIE's LossHSV on the
    low-res illumination."""
    def fn(input, target=None, **_):
        x = jnp.mean(input, axis=-1, keepdims=True)
        mean = jnp.sqrt(jnp.maximum(_avg_pool(x, patch_size), 0.0))
        return loss_weight * reduce_loss((mean - mean_val) ** 2, reduction)
    return fn


@LOSSES.register(name="edge_aware_depth_consistency_loss")
def edge_aware_depth_consistency_loss(tau: float = 0.1, loss_weight: float = 1.0,
                                      reduction: str = "mean"):
    """Penalize image gradients where depth has strong (sobel) edges
    (image.py:367-400): mask = |sobel(depth)| > tau; mean(mask * |grad(x)|^2)."""
    import numpy as np

    kx = np.array([[1.0, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    ky = np.array([[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)

    def _sobel_zero(x):
        # reference uses F.conv2d(padding=1): ZERO padding, per channel
        xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)])
        h, w = x.shape[-3], x.shape[-2]
        gx = sum(kx[i, j] * xp[..., i:i + h, j:j + w, :]
                 for i in range(3) for j in range(3))
        gy = sum(ky[i, j] * xp[..., i:i + h, j:j + w, :]
                 for i in range(3) for j in range(3))
        return gx, gy

    def fn(input, depth, **_):
        dx, dy = _sobel_zero(depth)
        mask = (jnp.sqrt(dx ** 2 + dy ** 2) > tau).astype(input.dtype)
        gx, gy = _sobel_zero(input)
        return loss_weight * jnp.mean(mask * (gx ** 2 + gy ** 2))
    return fn


@LOSSES.register(name="color_constancy_loss")
def color_constancy_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """L_col: gray-world channel-mean consistency (image.py:192)."""
    def fn(input, target=None, **_):
        mean_rgb = jnp.mean(input, axis=(-3, -2), keepdims=True)
        mr, mg, mb = mean_rgb[..., 0], mean_rgb[..., 1], mean_rgb[..., 2]
        d_rg = (mr - mg) ** 2
        d_rb = (mr - mb) ** 2
        d_gb = (mb - mg) ** 2
        loss = jnp.sqrt(d_rg**2 + d_rb**2 + d_gb**2 + 1e-12)
        return loss_weight * reduce_loss(loss, reduction)
    return fn


@LOSSES.register(name="total_variation_loss", aliases=["tv_loss", "illumination_smoothness_loss"])
def total_variation_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """L_tvA on the curve/illumination map (image.py:1357-1394): squared
    forward differences, each normalized by its element count, x2, / batch."""
    def fn(input, target=None, **_):
        x = input
        b = x.shape[0] if x.ndim == 4 else 1
        h_tv = jnp.sum((x[..., 1:, :, :] - x[..., :-1, :, :]) ** 2)
        w_tv = jnp.sum((x[..., :, 1:, :] - x[..., :, :-1, :]) ** 2)
        count_h = (x.shape[-3] - 1) * x.shape[-2] * x.shape[-1]
        count_w = x.shape[-3] * (x.shape[-2] - 1) * x.shape[-1]
        return loss_weight * 2.0 * (h_tv / count_h + w_tv / count_w) / b
    return fn


illumination_smoothness_loss = total_variation_loss


# ---------------------------------------------------------------------------
# PSNR / SSIM losses
# ---------------------------------------------------------------------------

@LOSSES.register(name="psnr_loss")
def psnr_loss(to_y: bool = False, loss_weight: float = 1.0, reduction: str = "mean"):
    """-PSNR-shaped loss (BasicSR convention; image.py:797-835):
    scale * mean(log(mse)) with scale = 10/ln(10)."""
    scale = 10.0 / jnp.log(10.0)
    coef = jnp.asarray([65.481, 128.553, 24.966])

    def fn(input, target, **_):
        x, y = input, target
        if to_y:
            x = (jnp.sum(x * coef, axis=-1, keepdims=True) + 16.0) / 255.0
            y = (jnp.sum(y * coef, axis=-1, keepdims=True) + 16.0) / 255.0
        mse = jnp.mean((x - y) ** 2, axis=(-3, -2, -1))
        return loss_weight * scale * jnp.mean(jnp.log(mse + 1e-8))
    return fn


@LOSSES.register(name="ssim_loss")
def ssim_loss(
    data_range: float = 1.0,
    window_size: int = 11,
    window_sigma: float = 1.5,
    k: tuple = (0.01, 0.03),
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """1 - SSIM (image.py:835)."""
    from enhax.nn.metrics import ssim as ssim_metric

    def fn(input, target, **_):
        s = ssim_metric(input, target, data_range=data_range,
                        window_size=window_size, sigma=window_sigma, k=k)
        return loss_weight * reduce_loss(1.0 - s, reduction)
    return fn


@LOSSES.register(name="ms_ssim_loss")
def ms_ssim_loss(
    data_range: float = 1.0,
    window_size: int = 11,
    window_sigma: float = 1.5,
    weights: tuple | None = None,
    k: tuple = (0.01, 0.03),
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """1 - MS-SSIM (image.py:870)."""
    from enhax.nn.metrics import ms_ssim as msssim_metric

    def fn(input, target, **_):
        s = msssim_metric(input, target, data_range=data_range,
                          window_size=window_size, sigma=window_sigma,
                          weights=weights, k=k)
        return loss_weight * reduce_loss(1.0 - s, reduction)
    return fn


# ---------------------------------------------------------------------------
# Gradient / edge family
# ---------------------------------------------------------------------------

@LOSSES.register(name="gradient_loss")
def gradient_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """L1 of forward differences (image.py:609)."""
    def fn(input, target=None, **_):
        gx = jnp.abs(input[..., :, :-1, :] - input[..., :, 1:, :])
        gy = jnp.abs(input[..., :-1, :, :] - input[..., 1:, :, :])
        return loss_weight * reduce_loss(jnp.mean(gx) + jnp.mean(gy), reduction)
    return fn


@LOSSES.register(name="grayscale_loss")
def grayscale_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """L1 between channel-mean grays (image.py:634)."""
    def fn(input, target, **_):
        xg = jnp.mean(input, axis=-1, keepdims=True)
        yg = jnp.mean(target, axis=-1, keepdims=True)
        return loss_weight * reduce_loss(jnp.abs(xg - yg), reduction)
    return fn


_GAUSS_1D = (0.05, 0.25, 0.4, 0.25, 0.05)


def _gauss_blur5(x):
    """5x5 separable blur with replicate padding (EdgeLoss.conv_gauss, image.py:418)."""
    k = jnp.asarray(_GAUSS_1D, x.dtype)

    def conv_axis(v, axis):
        pads = [(0, 0)] * v.ndim
        pads[axis] = (2, 2)
        vp = jnp.pad(v, pads, mode="edge")
        out = 0.0
        for i in range(5):
            sl = [slice(None)] * v.ndim
            sl[axis] = slice(i, i + v.shape[axis])
            out = out + k[i] * vp[tuple(sl)]
        return out

    return conv_axis(conv_axis(x, -3), -2)


def _laplacian_pyramid_residual(x):
    """image - blur(upsample(downsample(blur(image)))) (EdgeLoss.laplacian_kernel)."""
    filtered = _gauss_blur5(x)
    down = filtered[..., ::2, ::2, :]
    up = jnp.zeros_like(filtered)
    up = up.at[..., ::2, ::2, :].set(down * 4.0)
    return x - _gauss_blur5(up)


@LOSSES.register(name="edge_loss")
def edge_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """Charbonnier on Laplacian residuals (image.py:404-447)."""
    char = charbonnier_loss(reduction=reduction)

    def fn(input, target, **_):
        return loss_weight * char(_laplacian_pyramid_residual(input),
                                  _laplacian_pyramid_residual(target))
    return fn


@LOSSES.register(name="edge_constancy_loss")
def edge_constancy_loss(eps: float = 1e-3, loss_weight: float = 1.0, reduction: str = "mean"):
    """Charbonnier-style distance of Laplacian edges (image.py:449-484)."""
    def fn(input, target, **_):
        e1 = _laplacian_pyramid_residual(input)
        e2 = _laplacian_pyramid_residual(target)
        return loss_weight * reduce_loss(jnp.sqrt((e1 - e2) ** 2 + eps * eps), reduction)
    return fn


@LOSSES.register(name="edge_charbonnier_loss")
def edge_charbonnier_loss(
    edge_loss_weight: float = 1.0,
    char_loss_weight: float = 1.0,
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """char_w * Charbonnier + edge_w * EdgeLoss (image.py:486-508)."""
    e = edge_loss(reduction=reduction)
    c = charbonnier_loss(reduction=reduction)

    def fn(input, target, **_):
        return loss_weight * (char_loss_weight * c(input, target)
                              + edge_loss_weight * e(input, target))
    return fn


@LOSSES.register(name="edge_aware_loss")
def edge_aware_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """Illumination gradients weighted by exp(-|edge gradients|) (image.py:334)."""
    def fn(input, edge, **_):
        l_dx = input[..., :, 1:, :] - input[..., :, :-1, :]
        l_dy = input[..., 1:, :, :] - input[..., :-1, :, :]
        e_dx = edge[..., :, 1:, :] - edge[..., :, :-1, :]
        e_dy = edge[..., 1:, :, :] - edge[..., :-1, :, :]
        loss = (jnp.mean(jnp.exp(-jnp.abs(e_dx)) * jnp.abs(l_dx))
                + jnp.mean(jnp.exp(-jnp.abs(e_dy)) * jnp.abs(l_dy)))
        return loss_weight * loss
    return fn


@LOSSES.register(name="depth_weighted_smoothness_loss")
def depth_weighted_smoothness_loss(alpha: float = 1.0, loss_weight: float = 1.0,
                                   reduction: str = "mean"):
    """Smoothness of illumination weighted by exp(-alpha|depth grads|) (image.py:291)."""
    def fn(input, depth, **_):
        l_dx = input[..., :, 1:, :] - input[..., :, :-1, :]
        l_dy = input[..., 1:, :, :] - input[..., :-1, :, :]
        d_dx = depth[..., :, 1:, :] - depth[..., :, :-1, :]
        d_dy = depth[..., 1:, :, :] - depth[..., :-1, :, :]
        loss = (jnp.mean(jnp.exp(-alpha * jnp.abs(d_dx)) * jnp.abs(l_dx))
                + jnp.mean(jnp.exp(-alpha * jnp.abs(d_dy)) * jnp.abs(l_dy)))
        return loss_weight * loss
    return fn


# ---------------------------------------------------------------------------
# Channel statistics family
# ---------------------------------------------------------------------------

@LOSSES.register(name="color_loss")
def color_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """|mean(input) - mean(target)| per image (LYT-Net; image.py:220)."""
    def fn(input, target, **_):
        mi = jnp.mean(input, axis=tuple(range(1, input.ndim)))
        mt = jnp.mean(target, axis=tuple(range(1, target.ndim)))
        return loss_weight * jnp.mean(jnp.abs(mi - mt))
    return fn


@LOSSES.register(name="channel_consistency_loss")
def channel_consistency_loss(log_target: bool = True, loss_weight: float = 1.0,
                             reduction: str = "mean"):
    """KL of channel differences R-B, R-G, G-B between input/target (image.py:109).

    Follows torch F.kl_div semantics: input is log-probabilities; with
    log_target the target is too: KL = exp(t) * (t - i), mean-reduced.
    """
    def _kl(i, t):
        if log_target:
            return jnp.mean(jnp.exp(t) * (t - i))
        return jnp.mean(t * (jnp.log(jnp.maximum(t, 1e-12)) - i))

    def fn(input, target, **_):
        d1 = (input[..., 0:1] - input[..., 2:3], target[..., 0:1] - target[..., 2:3])
        d2 = (input[..., 0:1] - input[..., 1:2], target[..., 0:1] - target[..., 1:2])
        d3 = (input[..., 1:2] - input[..., 2:3], target[..., 1:2] - target[..., 2:3])
        return loss_weight * (_kl(*d1) + _kl(*d2) + _kl(*d3))
    return fn


@LOSSES.register(name="channel_ratio_consistency_loss")
def channel_ratio_consistency_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """Consistency of integer channel ratios at 8-bit scale (image.py:160-189)."""
    def fn(input, target, **_):
        i = jnp.floor(input * 255.0)
        t = jnp.floor(target * 255.0)

        def ratio(x, a, b):
            # torch int-division truncates toward zero
            return jnp.trunc(x[..., a] / jnp.maximum(jnp.trunc(x[..., b]), 1.0))

        d_rg = jnp.sum((ratio(i, 0, 1) - ratio(t, 0, 1)) ** 2) / 255.0**2
        d_rb = jnp.sum((ratio(i, 0, 2) - ratio(t, 0, 2)) ** 2) / 255.0**2
        d_gb = jnp.sum((ratio(i, 1, 2) - ratio(t, 1, 2)) ** 2) / 255.0**2
        return loss_weight * jnp.sqrt(d_rg + d_rb + d_gb + 1e-12)
    return fn


@LOSSES.register(name="contradict_channel_loss")
def contradict_channel_loss(kernel_size: int = 35, loss_weight: float = 1.0,
                            reduction: str = "mean"):
    """Dark-channel L1 passed through sigmoid (desnow prior; image.py:242-288)."""
    def fn(input, target, **_):
        p = _max_pool_same(jnp.min(input, axis=-1, keepdims=True), kernel_size)
        t = _max_pool_same(jnp.min(target, axis=-1, keepdims=True), kernel_size)
        l = reduce_loss(jnp.abs(p - t), reduction)
        return loss_weight * jax.nn.sigmoid(l)
    return fn


@LOSSES.register(name="brightness_constancy_loss")
def brightness_constancy_loss(gamma: float = 2.5, ksize: int = 9, eps: float = 1e-3,
                              loss_weight: float = 1.0, reduction: str = "mean"):
    """Charbonnier distance to the target's brightness attention map
    (image.py:85-107; BAM = prior/image.py:243-289: median blur then
    (1 - max(R,G,B))^gamma — shared with the layer library)."""
    def fn(input, target, **_):
        from enhax.nn.layers import brightness_attention_map
        bam = brightness_attention_map(target, gamma=gamma, ksize=ksize)
        return loss_weight * reduce_loss(
            jnp.sqrt((bam - input) ** 2 + eps * eps), reduction)
    return fn


@LOSSES.register(name="entropy_loss")
def entropy_loss(bins: int = 256, loss_weight: float = 1.0, reduction: str = "mean"):
    """Differentiable entropy of the intensity histogram.

    The reference's EntropyLoss (image.py:509) is dead code (iterates over an
    int); this is the standard soft-histogram entropy it intends.
    """
    def fn(input, target=None, **_):
        centers = jnp.linspace(0.0, 1.0, bins)
        x = input.reshape(-1)
        w = jax.nn.softmax(-((x[:, None] - centers[None, :]) ** 2) / (2 * 0.01**2), axis=-1)
        p = jnp.mean(w, axis=0)
        p = p / jnp.sum(p)
        ent = -jnp.sum(p * jnp.log2(p + 1e-12))
        return loss_weight * ent
    return fn


@LOSSES.register(name="histogram_loss")
def histogram_loss(bins: int = 256, sigma: float = 0.01, loss_weight: float = 1.0,
                   reduction: str = "mean"):
    """L1 between soft (Gaussian-kernel) histograms (LYT-Net; image.py:655)."""
    def soft_hist(x):
        edges = jnp.linspace(0.0, 1.0, bins)
        k = jnp.exp(-0.5 * ((x.reshape(-1)[:, None] - edges[None, :]) / sigma) ** 2)
        h = jnp.sum(k, axis=0)
        return h / jnp.maximum(jnp.sum(h), 1e-12)

    def fn(input, target, **_):
        return loss_weight * jnp.mean(jnp.abs(soft_hist(target) - soft_hist(input)))
    return fn


@LOSSES.register(name="std_loss")
def std_loss(loss_weight: float = 1.0, reduction: str = "mean"):
    """L2 between gray image and its 5x5 blur — penalizes local variance
    (image.py:1274-1308, valid region)."""
    def fn(input, target=None, **_):
        g = jnp.mean(input, axis=-1, keepdims=True)
        blur = box_filter(g, radius=2)
        # reference uses valid (unpadded) conv: compare interior only
        center = g[..., 2:-2, 2:-2, :]
        blur = blur[..., 2:-2, 2:-2, :]
        return loss_weight * reduce_loss((center - blur) ** 2, reduction)
    return fn


@LOSSES.register(name="bilateral_smooth_loss")
@LOSSES.register(name="smooth_loss")
def bilateral_smooth_loss(sigma: float = 10.0, loss_weight: float = 1.0,
                          reduction: str = "mean"):
    """Bilateral smoothness over 12 neighbor offsets (ZeroIG SmoothLoss,
    zero_ig.py:56-160): target gradients are L1-penalized with weights
    exp(-||dYCbCr(input)||^2 / (2 sigma^2)), so the illumination may only
    vary where the guide image itself has edges. The reference enumerates
    each offset twice (w1..w24 with identical forward/backward pairs); we
    compute 12 offsets and double — same value.

    Deviation: the reference's ``rgb2yCbCr`` flattens an NCHW tensor with
    ``view(-1, 3)``, mixing pixels across channels (an upstream-repo layout
    bug); enhax applies the same BT.601 studio-swing matrix per pixel.
    """
    offsets = ((1, 0), (0, 1), (1, 1), (1, -1), (2, 0), (0, 2),
               (2, 1), (2, -1), (1, 2), (1, -2), (2, 2), (2, -2))
    mat = jnp.array([[0.257, -0.148, 0.439],
                     [0.564, -0.291, -0.368],
                     [0.098, 0.439, -0.071]], jnp.float32)
    bias = jnp.array([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0], jnp.float32)

    def _shift_pair(x, dy, dx):
        h, w = x.shape[-3], x.shape[-2]
        y0, y1 = max(dy, 0), h + min(dy, 0)
        x0, x1 = max(dx, 0), w + min(dx, 0)
        a = x[..., y0:y1, x0:x1, :]
        b = x[..., y0 - dy:y1 - dy, x0 - dx:x1 - dx, :]
        return a, b

    def fn(input, target, **_):
        guide = input @ mat + bias
        sigma_color = -1.0 / (2 * sigma * sigma)
        total = 0.0
        for dy, dx in offsets:
            ga, gb = _shift_pair(guide, dy, dx)
            w = jnp.exp(jnp.sum((ga - gb) ** 2, axis=-1, keepdims=True)
                        * sigma_color)
            ta, tb = _shift_pair(target, dy, dx)
            grad = jnp.sum(jnp.abs(ta - tb), axis=-1, keepdims=True)
            total = total + 2.0 * jnp.mean(w * grad)
        return loss_weight * total
    return fn


@LOSSES.register(name="texture_difference_loss")
def texture_difference_loss(patch_size: int = 5, constant_c: float = 1e-5,
                            threshold: float = 0.975, loss_weight: float = 1.0,
                            reduction: str = "mean"):
    """Binary local-texture similarity map (ZeroIG; image.py:1311-1355).

    Returns the thresholded similarity map (as the reference does) — model
    code combines it with other terms.
    """
    def fn(input, target, **_):
        # ZeroIG uses luminance with swapped R/B coefficients; replicate.
        def gray(x):
            return (0.144 * x[..., 0] + 0.587 * x[..., 1] + 0.299 * x[..., 2])[..., None]
        s1 = jnp.sqrt(jnp.maximum(image_local_variance(gray(input), patch_size), 0) + 1e-12)
        s2 = jnp.sqrt(jnp.maximum(image_local_variance(gray(target), patch_size), 0) + 1e-12)
        diff = (2 * s1 * s2) / (s1**2 + s2**2 + constant_c)
        return jnp.where(diff > threshold, 1.0, 0.0)
    return fn


# ---------------------------------------------------------------------------
# Perceptual loss (VGG-feature L1). The backbone comes from the model zoo; the
# builder wires any feature extractor ``apply(params, x) -> list[features]``.
# ---------------------------------------------------------------------------

@LOSSES.register(name="perceptual_loss")
def perceptual_loss_builder(
    feature_fn=None,
    preprocess: bool = False,
    loss_weight: float = 1.0,
    reduction: str = "mean",
):
    """Perceptual (feature-space L1) loss (image.py:708-772).

    ``feature_fn(x) -> list[Array]`` extracts deep features; defaults to a
    fixed random-projection pyramid (a weight-free perceptual proxy) when no
    backbone is supplied. Supply a VGG ``feature_fn`` from
    ``enhax.models.classify.vgg`` for reference-parity training.
    """
    if feature_fn is None:
        def feature_fn(x):
            feats = []
            cur = x
            for _ in range(3):
                cur = _avg_pool(cur, 2)
                feats.append(cur)
            return feats

    def fn(input, target, **_):
        if preprocess:
            mean = jnp.asarray([0.485, 0.456, 0.406])
            std = jnp.asarray([0.229, 0.224, 0.225])
            input = (input - mean) / std
            target = (target - mean) / std
        fx = feature_fn(input)
        fy = feature_fn(target)
        loss = functools.reduce(
            lambda acc, p: acc + jnp.mean(jnp.abs(p[0] - p[1])), zip(fx, fy), 0.0
        ) / len(fx)
        return loss_weight * loss
    return fn
