"""Image layout utilities (NHWC canonical).

Rebuild of reference ``core/image/utils.py:64-946`` (layout predicates,
CHW<->HWC, get_image_size with divisible_by, local mean/variance). enhax is
channels-last everywhere — the TPU-native layout — so the conversion helpers
exist mainly at the torch-weight/IO boundary.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def get_image_size(image, divisible_by: int | None = None) -> tuple[int, int]:
    """(H, W) of an NHWC/HWC array, optionally rounded *up* to a multiple.

    Reference ``get_image_size`` (core/image/utils.py:332) returns the size
    adjusted to ``divisible_by``.
    """
    if hasattr(image, "shape"):
        shape = image.shape
    else:
        shape = tuple(image)
    if len(shape) < 2:
        raise ValueError(f"need at least 2 dims, got {shape}")
    if len(shape) == 2:
        h, w = shape
    else:
        h, w = shape[-3], shape[-2]
    if divisible_by:
        h = make_divisible(h, divisible_by)
        w = make_divisible(w, divisible_by)
    return int(h), int(w)


def make_divisible(x: int, divisor: int) -> int:
    """Round up to the nearest multiple of ``divisor``."""
    return int(np.ceil(x / divisor) * divisor)


def pad_to_divisible(image, divisor: int, mode: str = "reflect"):
    """Pad H/W (at bottom/right) so both are multiples of ``divisor``.

    TPU-friendly replacement for resize-to-multiple: static-shape padding
    keeps the content pixel-exact (reference resizes instead,
    vision/model.py:97-109; restormer pads, my_predict.py:129-156).
    Returns (padded, (orig_h, orig_w)).
    """
    h, w = image.shape[-3], image.shape[-2]
    ph = make_divisible(h, divisor) - h
    pw = make_divisible(w, divisor) - w
    if ph == 0 and pw == 0:
        return image, (h, w)
    pad = [(0, 0)] * (image.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
    return jnp.pad(image, pad, mode=mode), (h, w)


def unpad(image, size: tuple[int, int]):
    """Crop back to (h, w) after ``pad_to_divisible``."""
    h, w = size
    return image[..., :h, :w, :]


def to_4d(image):
    """Ensure NHWC rank-4: HW -> 11HW1? No — HW -> 1HW1, HWC -> 1HWC."""
    x = jnp.asarray(image)
    if x.ndim == 2:
        x = x[None, :, :, None]
    elif x.ndim == 3:
        x = x[None]
    elif x.ndim != 4:
        raise ValueError(f"cannot coerce ndim={x.ndim} to 4d NHWC")
    return x


def to_3d(image):
    """Squeeze a singleton batch dim: 1HWC -> HWC."""
    x = jnp.asarray(image)
    if x.ndim == 4 and x.shape[0] == 1:
        return x[0]
    if x.ndim == 3:
        return x
    raise ValueError(f"cannot coerce shape={x.shape} to 3d HWC")


def chw_to_hwc(image):
    """Torch-layout (…,C,H,W) -> (…,H,W,C). Weight/IO boundary helper."""
    x = jnp.asarray(image)
    return jnp.moveaxis(x, -3, -1)


def hwc_to_chw(image):
    x = jnp.asarray(image)
    return jnp.moveaxis(x, -1, -3)


def image_local_mean(image, patch_size: int = 5):
    """Per-pixel local mean over a square window (reference utils.py:900)."""
    from enhax.ops.filtering import box_filter
    return box_filter(image, radius=patch_size // 2)


def image_local_variance(image, patch_size: int = 5):
    """Per-pixel local variance over a square window (reference utils.py:920)."""
    from enhax.ops.filtering import box_filter
    r = patch_size // 2
    mean = box_filter(image, radius=r)
    mean_sq = box_filter(image * image, radius=r)
    return mean_sq - mean * mean
