"""YOLOv8-style anchor-free detector (compact).

The reference registers YOLOv8 variants via an ultralytics wrapper
(vision/detect/yolov8.py:49; the vendored repos are absent from its
snapshot, SURVEY §2.7). enhax provides the architecture natively:
CSP-style backbone (C2f blocks), PAN feature pyramid, decoupled
classification/box heads with distribution focal loss (DFL) box regression,
anchor-free decoding over three strides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import DETECTORS, MODELS, Scheme, Task
from enhax.models.base import Model


class ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), use_bias=False,
                    name="conv")(x)
        x = nn.GroupNorm(num_groups=min(8, self.features), name="norm")(x)
        return nn.silu(x)


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (YOLOv8 C2f)."""
    features: int
    n: int = 1

    @nn.compact
    def __call__(self, x):
        c = self.features // 2
        y = ConvBNSiLU(self.features, 1, name="cv1")(x)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for i in range(self.n):
            h = ConvBNSiLU(c, 3, name=f"m{i}_1")(outs[-1])
            h = ConvBNSiLU(c, 3, name=f"m{i}_2")(h)
            outs.append(outs[-1] + h)
        return ConvBNSiLU(self.features, 1, name="cv2")(
            jnp.concatenate(outs, axis=-1))


class YOLOLite(nn.Module):
    num_classes: int = 80
    width: int = 32
    reg_max: int = 8   # DFL bins

    @nn.compact
    def __call__(self, x):
        w = self.width
        # backbone: strides 8, 16, 32
        y = ConvBNSiLU(w, 3, 2, name="stem")(x)            # /2
        y = ConvBNSiLU(w * 2, 3, 2, name="down1")(y)       # /4
        y = C2f(w * 2, 1, name="c2f1")(y)
        p3 = C2f(w * 4, 2, name="c2f2")(ConvBNSiLU(w * 4, 3, 2, name="down2")(y))   # /8
        p4 = C2f(w * 8, 2, name="c2f3")(ConvBNSiLU(w * 8, 3, 2, name="down3")(p3))  # /16
        p5 = C2f(w * 16, 1, name="c2f4")(ConvBNSiLU(w * 16, 3, 2, name="down4")(p4))  # /32

        # PAN neck
        up = lambda v, ref: jax.image.resize(
            v, ref.shape[:-1] + (v.shape[-1],), "nearest")
        n4 = C2f(w * 8, 1, name="neck_up4")(
            jnp.concatenate([up(p5, p4), p4], axis=-1))
        n3 = C2f(w * 4, 1, name="neck_up3")(
            jnp.concatenate([up(n4, p3), p3], axis=-1))
        d4 = C2f(w * 8, 1, name="neck_dn4")(
            jnp.concatenate([ConvBNSiLU(w * 4, 3, 2, name="dn3")(n3), n4], axis=-1))
        d5 = C2f(w * 16, 1, name="neck_dn5")(
            jnp.concatenate([ConvBNSiLU(w * 8, 3, 2, name="dn4")(d4), p5], axis=-1))

        # decoupled heads per level
        outs = {}
        for name, feat, stride in (("p3", n3, 8), ("p4", d4, 16), ("p5", d5, 32)):
            cls = ConvBNSiLU(w * 2, 3, name=f"{name}_cls1")(feat)
            cls = nn.Conv(self.num_classes, (1, 1), name=f"{name}_cls2")(cls)
            box = ConvBNSiLU(w * 2, 3, name=f"{name}_box1")(feat)
            box = nn.Conv(4 * self.reg_max, (1, 1), name=f"{name}_box2")(box)
            outs[f"cls_{name}"] = cls
            outs[f"box_{name}"] = box
        outs["heatmap"] = jax.nn.sigmoid(outs["cls_p3"])  # convenience alias
        return outs


def decode_yolo(outputs: dict, num_classes: int, reg_max: int = 8,
                score_thresh: float = 0.3, iou_thresh: float = 0.5,
                max_dets: int = 100) -> np.ndarray:
    """Anchor-free decode + class-agnostic NMS -> (N, 6) [xyxy, score, cls]."""
    dets = []
    for name, stride in (("p3", 8), ("p4", 16), ("p5", 32)):
        cls = jax.nn.sigmoid(jnp.asarray(outputs[f"cls_{name}"]))[0]
        box = jnp.asarray(outputs[f"box_{name}"])[0]
        h, w, _ = cls.shape
        # DFL expectation per side
        dist = box.reshape(h, w, 4, reg_max)
        bins = jnp.arange(reg_max, dtype=jnp.float32)
        d = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1) * stride
        ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        cx = (xs + 0.5) * stride
        cy = (ys + 0.5) * stride
        x1 = cx - d[..., 0]
        y1 = cy - d[..., 1]
        x2 = cx + d[..., 2]
        y2 = cy + d[..., 3]
        score = jnp.max(cls, axis=-1)
        label = jnp.argmax(cls, axis=-1)
        sel = np.asarray(score) > score_thresh
        if sel.any():
            stacked = np.stack([np.asarray(x1)[sel], np.asarray(y1)[sel],
                                np.asarray(x2)[sel], np.asarray(y2)[sel],
                                np.asarray(score)[sel],
                                np.asarray(label)[sel].astype(float)], axis=-1)
            dets.append(stacked)
    if not dets:
        return np.zeros((0, 6))
    dets = np.concatenate(dets)
    from enhax.native.nms import nms as _nms
    keep = _nms(dets, iou_thresh=iou_thresh, score_thresh=score_thresh,
                max_keep=max_dets)
    return dets[keep].reshape(-1, 6)


@MODELS.register(name="yolo_lite", arch="yolo", aliases=["yolov8_lite"],
                 tasks=(Task.DETECT,), schemes=(Scheme.SUPERVISED,))
def yolo_lite(num_classes: int = 80, width: int = 32, **kwargs) -> Model:
    return Model(
        name="yolo_lite", arch="yolo",
        module=YOLOLite(num_classes=num_classes, width=width),
        tasks=(Task.DETECT,), schemes=(Scheme.SUPERVISED,),
        required_inputs=("image",),
        out_key="heatmap",
        size_divisor=32,
    )


DETECTORS.register(name="yolo_lite", obj=yolo_lite, replace=True)
