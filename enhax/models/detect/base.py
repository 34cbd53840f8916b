"""Detector protocol + a first-party anchor-free detector.

Reference: vision/detect/base.py:30 ``Detector`` ABC (wraps per-framework
models, returns per-frame detection arrays) and yolov8.py:49 (ultralytics
wrapper). enhax keeps the same output contract — (N, 5) [x1,y1,x2,y2,score]
(+ class) numpy per frame — feeding enhax.track.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import DETECTORS, MODELS, Scheme, Task
from enhax.models.base import Model


@dataclasses.dataclass
class Detection:
    """One detection (reference track/base.py:27)."""
    bbox: np.ndarray          # xyxy
    confidence: float
    class_id: int = 0

    @property
    def xyxy(self) -> np.ndarray:
        return np.asarray(self.bbox, float)


class Detector:
    """Protocol: ``detect(image) -> (N, 6) [x1,y1,x2,y2,score,class]``."""

    def detect(self, image: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class CenterNetLite(nn.Module):
    """Tiny anchor-free detector: heatmap + size + offset heads over a
    stride-4 conv trunk (CenterNet formulation)."""
    num_classes: int = 1
    features: int = 32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.features, (3, 3), strides=(2, 2), name="c1")(x))
        y = nn.relu(nn.Conv(self.features * 2, (3, 3), strides=(2, 2), name="c2")(y))
        y = nn.relu(nn.Conv(self.features * 2, (3, 3), name="c3")(y))
        heat = jax.nn.sigmoid(nn.Conv(self.num_classes, (1, 1), name="heat")(y))
        size = jax.nn.relu(nn.Conv(2, (1, 1), name="size")(y))
        offset = nn.Conv(2, (1, 1), name="offset")(y)
        return {"heatmap": heat, "size": size, "offset": offset}


def decode_centernet(outputs: dict, stride: int = 4, score_thresh: float = 0.3,
                     max_dets: int = 100) -> np.ndarray:
    """Heatmap NMS (3x3 max-pool peak test) -> (N, 6) detections (host)."""
    heat = np.asarray(outputs["heatmap"])[0]
    size = np.asarray(outputs["size"])[0]
    offset = np.asarray(outputs["offset"])[0]
    h, w, c = heat.shape
    # local-max suppression
    import scipy.ndimage as ndi
    peaks = (heat == ndi.maximum_filter(heat, size=(3, 3, 1))) & (heat > score_thresh)
    ys, xs, cs = np.nonzero(peaks)
    dets = []
    for y, x, cls in zip(ys, xs, cs):
        score = heat[y, x, cls]
        cy = (y + 0.5 + offset[y, x, 0]) * stride
        cx = (x + 0.5 + offset[y, x, 1]) * stride
        bh = size[y, x, 0] * stride
        bw = size[y, x, 1] * stride
        dets.append([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2,
                     score, cls])
    dets = sorted(dets, key=lambda d: -d[4])[:max_dets]
    return np.asarray(dets, float).reshape(-1, 6)


@MODELS.register(name="centernet_lite", arch="centernet",
                 tasks=(Task.DETECT,), schemes=(Scheme.SUPERVISED,))
def centernet_lite(num_classes: int = 1, features: int = 32, **kwargs) -> Model:
    return Model(
        name="centernet_lite", arch="centernet",
        module=CenterNetLite(num_classes=num_classes, features=features),
        tasks=(Task.DETECT,), schemes=(Scheme.SUPERVISED,),
        required_inputs=("image",),
        out_key="heatmap",
        size_divisor=4,
    )


DETECTORS.register(name="centernet_lite", obj=centernet_lite, replace=True)
