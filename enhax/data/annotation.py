"""Annotations: lazy-loading typed records for datapoint attributes.

Rebuild of reference ``core/data/annotation/`` — ``ImageAnnotation``
(image.py:34-182: path validation, shape probe at construction, lazy ``data``
property, ``meta`` dict), depth/frame/segmentation variants (:185-445),
category labels (category.py) and ``DatapointAttributes`` (base.py; the
ordered attr-name -> annotation-type map that drives collation).
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from enhax.utils.pathlib import Path


class Annotation:
    """Base annotation record."""

    @property
    def data(self):
        raise NotImplementedError

    @property
    def meta(self) -> dict:
        return {}


class ImageAnnotation(Annotation):
    """A lazily-loaded image file record (reference image.py:34-182)."""

    def __init__(self, path, root: Path | None = None, flags: str = "color"):
        self.path = Path(path)
        if not self.path.is_image_file(exist=False):
            raise ValueError(f"not an image path: {path}")
        self.root = Path(root) if root else None
        self.flags = flags
        self._shape: tuple | None = None

    @property
    def name(self) -> str:
        return self.path.name

    @property
    def stem(self) -> str:
        return self.path.stem

    @property
    def shape(self) -> tuple[int, int, int]:
        """(H, W, C), probed without decoding (reference uses PIL)."""
        if self._shape is None:
            from enhax.ops.io import read_image_shape
            self._shape = read_image_shape(self.path)
        return self._shape

    @property
    def data(self) -> np.ndarray:
        """Decode on demand -> HWC float32 RGB in [0,1]."""
        from enhax.ops.io import read_image
        img = read_image(self.path, to_float=True, normalize=True)
        if self.flags == "grayscale" and img.shape[-1] == 3:
            img = img.mean(axis=-1, keepdims=True).astype(np.float32)
        return img

    @property
    def meta(self) -> dict:
        return {
            "name": self.name,
            "stem": self.stem,
            "path": str(self.path),
            "shape": self.shape,
            "hash": self.path.stat().st_size if self.path.exists() else None,
        }


class DepthMapAnnotation(ImageAnnotation):
    """Depth map image with a source tag (reference image.py:185)."""

    def __init__(self, path, source: str = "dav2_vitb_g", **kwargs):
        super().__init__(path, **kwargs)
        self.source = source

    @property
    def data(self) -> np.ndarray:
        from enhax.ops.io import read_image
        img = read_image(self.path, to_float=True, normalize=True)
        if img.shape[-1] == 3:  # stored as color/gray png
            img = img.mean(axis=-1, keepdims=True).astype(np.float32)
        return img


class SemanticSegmentationAnnotation(ImageAnnotation):
    """Label-map image (reference image.py:380)."""

    @property
    def data(self) -> np.ndarray:
        from enhax.ops.io import read_image
        img = read_image(self.path, to_float=False, normalize=False)
        if img.ndim == 3 and img.shape[-1] == 3:
            img = img[..., :1]
        return img.astype(np.int32)


class FrameAnnotation(Annotation):
    """A video frame carried in memory (reference image.py:300)."""

    def __init__(self, frame: np.ndarray, index: int, path=None):
        self._frame = frame
        self.index = index
        self.path = Path(path) if path else None

    @property
    def data(self) -> np.ndarray:
        return self._frame

    @property
    def meta(self) -> dict:
        return {"index": self.index,
                "path": str(self.path) if self.path else None,
                "shape": self._frame.shape}


class CategoryAnnotation(Annotation):
    """A class-id label (reference category.py)."""

    def __init__(self, class_id: int, label: str = "", confidence: float = 1.0):
        self.class_id = int(class_id)
        self.label = label
        self.confidence = confidence

    @property
    def data(self) -> int:
        return self.class_id


class ValueAnnotation(Annotation):
    """A scalar regression target (reference value.py)."""

    def __init__(self, value: float):
        self.value = float(value)

    @property
    def data(self) -> float:
        return self.value


class ClassLabels(list):
    """List of class dicts with id/name lookup (reference classlabel.py)."""

    def id_to_name(self) -> dict:
        return {c["id"]: c["name"] for c in self if "id" in c and "name" in c}

    def names(self) -> list[str]:
        return [c.get("name") for c in self]


class DatapointAttributes(dict):
    """Ordered attr-name -> annotation type (reference annotation/base.py).

    Drives per-attribute stacking: image-typed attrs stack into NHWC float
    batches, categories into int arrays, everything else into lists.
    """

    IMAGE_TYPES = (ImageAnnotation, DepthMapAnnotation, FrameAnnotation,
                   SemanticSegmentationAnnotation)

    def image_attrs(self) -> list[str]:
        return [k for k, t in self.items()
                if isinstance(t, type) and issubclass(t, self.IMAGE_TYPES)]


def collate_datapoints(datapoints: list[dict], attrs: DatapointAttributes | None = None) -> dict:
    """Stack a list of per-item dicts into one batch dict.

    Image-valued entries (HWC float arrays of equal shape) -> (N, H, W, C);
    scalars -> arrays; everything else -> list. ``meta`` stays a list.
    """
    if not datapoints:
        return {}
    keys = datapoints[0].keys()
    batch: dict[str, Any] = {}
    for k in keys:
        vals = [dp[k] for dp in datapoints]
        v0 = vals[0]
        if k == "meta":
            batch[k] = vals
        elif isinstance(v0, np.ndarray) and v0.ndim >= 2:
            if all(v is not None and v.shape == v0.shape for v in vals):
                batch[k] = np.stack(vals)
            else:
                batch[k] = vals
        elif isinstance(v0, (int, float, np.integer, np.floating)):
            batch[k] = np.asarray(vals)
        else:
            batch[k] = vals
    return batch
