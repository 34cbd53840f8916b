"""Photometric ops: gamma, (de)normalization, GT-mean scaling, noise.

Rebuild of reference ``core/image/photometry.py`` (327 LoC): adjust_gamma,
normalize_image_by_range/mean_std, ``scale_gt_mean`` (photometry.py:297 —
the GT-mean brightness alignment used in LLIE evaluation), noise injection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from enhax.ops.color import rgb_to_grayscale


def adjust_gamma(image, gamma: float = 1.0, gain: float = 1.0):
    """``gain * image ** gamma`` on [0,1] images (photometry.py:40)."""
    return jnp.clip(gain * jnp.power(jnp.maximum(image, 1e-12), gamma), 0.0, 1.0)


def normalize_image_by_range(image, lo=0.0, hi=255.0, new_lo=0.0, new_hi=1.0):
    """Affine range remap (photometry.py:230)."""
    image = image.astype(jnp.float32) if hasattr(image, "astype") else jnp.asarray(image, jnp.float32)
    return (image - lo) / (hi - lo) * (new_hi - new_lo) + new_lo


def normalize_image(image):
    """uint8-range [0,255] -> [0,1] float (photometry.py:284)."""
    return normalize_image_by_range(image, 0.0, 255.0, 0.0, 1.0)


def denormalize_image(image):
    """[0,1] float -> [0,255] (photometry.py:276)."""
    return normalize_image_by_range(image, 0.0, 1.0, 0.0, 255.0)


def normalize_image_mean_std(image, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    """Channel-wise standardization, channels-last (photometry.py:200)."""
    mean = jnp.asarray(mean, dtype=image.dtype)
    std = jnp.asarray(std, dtype=image.dtype)
    return (image - mean) / std


def denormalize_image_mean_std(image, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
    mean = jnp.asarray(mean, dtype=image.dtype)
    std = jnp.asarray(std, dtype=image.dtype)
    return image * std + mean


def scale_gt_mean(image, target):
    """Scale ``image`` so its gray mean matches ``target``'s (photometry.py:297).

    Used in LLIE evaluation ("GT-mean" PSNR/SSIM mode, runml/metric.py:123).
    """
    mean_image = jnp.mean(rgb_to_grayscale(image))
    mean_target = jnp.mean(rgb_to_grayscale(target))
    return jnp.clip(image * (mean_target / jnp.maximum(mean_image, 1e-8)), 0.0, 1.0)


def add_noise(image, key, noise_type: str = "gaussian", std: float = 0.1, p: float = 0.05):
    """Inject synthetic noise (photometry.py:120): gaussian | poisson | salt_pepper | speckle."""
    if noise_type == "gaussian":
        return jnp.clip(image + std * jax.random.normal(key, image.shape, image.dtype), 0, 1)
    if noise_type == "speckle":
        return jnp.clip(image * (1 + std * jax.random.normal(key, image.shape, image.dtype)), 0, 1)
    if noise_type == "poisson":
        lam = jnp.maximum(image, 0) * 255.0
        noisy = jax.random.poisson(key, lam, image.shape).astype(image.dtype) / 255.0
        return jnp.clip(noisy, 0, 1)
    if noise_type in ("salt_pepper", "s&p"):
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, image.shape[:-1] + (1,))
        salt = jax.random.uniform(k2, image.shape[:-1] + (1,)) > 0.5
        out = jnp.where(u < p, jnp.where(salt, 1.0, 0.0), image)
        return out
    raise ValueError(f"unknown noise type {noise_type!r}")
