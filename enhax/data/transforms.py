"""Host-side datapoint transforms (numpy; albumentations replacement).

Rebuild of reference ``core/transform/albumentation.py`` (CropPatch :30,
NormalizeImageMeanStd :75, ResizeMultipleOf :103) plus the standard flips/
resize/crop used by the training configs. A transform maps a datapoint dict
to a datapoint dict, applying the same spatial op to every image-valued
attribute (albumentations' additional_targets semantics).
"""

from __future__ import annotations

import numpy as np

from enhax.constants import TRANSFORMS

_IMAGE_KEYS = ("image", "ref_image", "depth", "mask", "edge", "segmentation")
# label maps: never interpolate class IDs (blending fabricates classes),
# and cv2.resize rejects int32 inputs outright — force nearest + a
# cv2-supported dtype roundtrip
_LABEL_KEYS = ("mask", "segmentation")


def _resize_one(v: np.ndarray, size_wh: tuple, interp, is_label: bool):
    import cv2
    squeeze = v.ndim == 3 and v.shape[-1] == 1
    if is_label:
        src = v.astype(np.float32) if v.dtype not in (np.uint8, np.float32) \
            else v
        r = cv2.resize(src, size_wh, interpolation=cv2.INTER_NEAREST)
        r = r.astype(v.dtype)
    else:
        r = cv2.resize(v, size_wh, interpolation=interp)
    return r[..., None] if squeeze and r.ndim == 2 else r


def _image_keys(dp: dict) -> list[str]:
    return [k for k in dp
            if (k in _IMAGE_KEYS or k.endswith("_image"))
            and isinstance(dp.get(k), np.ndarray) and dp[k].ndim >= 2]


class Compose:
    def __init__(self, transforms):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, dp: dict) -> dict:
        for t in self.transforms:
            dp = t(dp)
        return dp


@TRANSFORMS.register(name="random_crop", aliases=["crop_patch"])
class RandomCrop:
    """Random patch crop, same window for all image attrs (CropPatch :30)."""

    def __init__(self, size: int | tuple = 256, seed: int | None = None):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.rng = np.random.default_rng(seed)

    def __call__(self, dp: dict) -> dict:
        keys = _image_keys(dp)
        if not keys:
            return dp
        h, w = dp[keys[0]].shape[:2]
        th, tw = min(self.size[0], h), min(self.size[1], w)
        y = int(self.rng.integers(0, h - th + 1))
        x = int(self.rng.integers(0, w - tw + 1))
        for k in keys:
            dp[k] = dp[k][y : y + th, x : x + tw]
        return dp


@TRANSFORMS.register(name="random_flip", aliases=["hflip"])
class RandomFlip:
    def __init__(self, p: float = 0.5, vertical: bool = False, seed: int | None = None):
        self.p = p
        self.vertical = vertical
        self.rng = np.random.default_rng(seed)

    def __call__(self, dp: dict) -> dict:
        keys = _image_keys(dp)
        if self.rng.random() < self.p:
            for k in keys:
                dp[k] = dp[k][:, ::-1].copy()
        if self.vertical and self.rng.random() < self.p:
            for k in keys:
                dp[k] = dp[k][::-1].copy()
        return dp


@TRANSFORMS.register(name="resize")
class Resize:
    def __init__(self, size: int | tuple = 256, interpolation: str = "bilinear"):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.interpolation = interpolation

    def __call__(self, dp: dict) -> dict:
        import cv2
        interp = cv2.INTER_LINEAR if self.interpolation == "bilinear" else cv2.INTER_NEAREST
        for k in _image_keys(dp):
            dp[k] = _resize_one(dp[k], (self.size[1], self.size[0]), interp,
                                k in _LABEL_KEYS)
        return dp


@TRANSFORMS.register(name="resize_multiple_of")
class ResizeMultipleOf:
    """Resize up so H/W are stride multiples (ResizeMultipleOf :103)."""

    def __init__(self, divisor: int = 32, interpolation: str = "bilinear"):
        self.divisor = divisor
        self.interpolation = interpolation

    def __call__(self, dp: dict) -> dict:
        import cv2
        from enhax.ops.layout import make_divisible
        interp = cv2.INTER_LINEAR if self.interpolation == "bilinear" else cv2.INTER_NEAREST
        for k in _image_keys(dp):
            v = dp[k]
            h, w = v.shape[:2]
            th, tw = make_divisible(h, self.divisor), make_divisible(w, self.divisor)
            if (th, tw) != (h, w):
                dp[k] = _resize_one(v, (tw, th), interp, k in _LABEL_KEYS)
        return dp


@TRANSFORMS.register(name="normalize_mean_std")
class NormalizeMeanStd:
    """Channel standardization of 'image' only (NormalizeImageMeanStd :75)."""

    def __init__(self, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, dp: dict) -> dict:
        if isinstance(dp.get("image"), np.ndarray):
            dp["image"] = (dp["image"] - self.mean) / self.std
        return dp


def progressive_patch_schedule(epoch: int, milestones, sizes, batch_sizes):
    """Restormer-style progressive training (reference
    restormer-deraining.yml:27-30): grow the crop size / shrink the batch at
    epoch milestones. Returns (crop_size, batch_size) for the epoch."""
    idx = 0
    for i, m in enumerate(milestones):
        if epoch >= m:
            idx = i
    return sizes[idx], batch_sizes[idx]
