"""YOLOv8: the real ultralytics architecture, TPU-native.

Rebuild of the detector the reference actually runs
(vision/detect/yolov8.py:49 wraps ultralytics YOLO; the module layout is
vendored at mon_extra/vision/segment/mobile_sam/MobileSAMv2/ultralytics/
nn/modules/{conv,block,head}.py and models/v8/yolov8.yaml). Faithful
layout so published yolov8{n,s,m,l,x} checkpoints convert:

  backbone: Conv(3,2) x2 -> [C2f, Conv(3,2)] x3 -> C2f -> SPPF   (yaml :15-26)
  head:     PAN — 2x nearest-up + concat + C2f (P4, P3), then two
            strided-conv + concat + C2f (P4, P5)                 (yaml :29-43)
  Detect:   per level cv2 (2xConv3x3 -> 1x1 4*reg_max) and
            cv3 (2xConv3x3 -> 1x1 nc); DFL softmax-expectation over
            reg_max=16 bins; anchors = cell centers + 0.5, xywh decode
            (head.py:22-62, block.py:17-35, tal.py make_anchors/dist2bbox)

Compound scaling (yaml :7-12): depth/width/max_channels per n/s/m/l/x;
channels rounded to /8, repeats ceil(n*depth).

TPU notes: all static shapes; heads emit (B, H*W, no) per level so decode
is one fused elementwise pass; NMS stays host-side (C++ native/nms.cpp) as
in round 1.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import DETECTORS, MODELS, Scheme, Task
from enhax.models.base import Model

# yaml scales: name -> (depth, width, max_channels)
SCALES = {
    "n": (0.33, 0.25, 1024),
    "s": (0.33, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


def _mk_div(x, d=8):
    return int(math.ceil(x / d) * d)


def _width(c, width, max_channels):
    return _mk_div(min(c, max_channels) * width)


def _depth(n, depth):
    return max(round(n * depth), 1)


class ConvBlock(nn.Module):
    """ultralytics Conv (conv.py:25): conv-BN-SiLU, autopad."""
    features: int
    k: int = 1
    s: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.k // 2
        x = nn.Conv(self.features, (self.k, self.k), strides=(self.s, self.s),
                    padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3, momentum=0.97,
                         dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    """block.py:271: two 3x3 Convs, optional residual."""
    features: int
    shortcut: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, 3, dtype=self.dtype, name="cv1")(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype, name="cv2")(y)
        return x + y if self.shortcut and x.shape[-1] == self.features else y


class C2f(nn.Module):
    """block.py:168: split, n bottlenecks chained on the second half."""
    features: int
    n: int = 1
    shortcut: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.features // 2
        y = ConvBlock(2 * c, 1, dtype=self.dtype, name="cv1")(x)
        parts = list(jnp.split(y, 2, axis=-1))
        for i in range(self.n):
            parts.append(Bottleneck(c, self.shortcut, dtype=self.dtype,
                                    name=f"m{i}")(parts[-1]))
        return ConvBlock(self.features, 1, dtype=self.dtype,
                         name="cv2")(jnp.concatenate(parts, axis=-1))


class SPPF(nn.Module):
    """block.py:119: 1x1 -> 3 chained 5x5 maxpools -> concat -> 1x1."""
    features: int
    k: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1] // 2
        y = ConvBlock(c, 1, dtype=self.dtype, name="cv1")(x)

        def pool(v):
            return nn.max_pool(v, (self.k, self.k), strides=(1, 1),
                               padding=((self.k // 2,) * 2, (self.k // 2,) * 2))

        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBlock(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([y, y1, y2, y3], axis=-1))


class DetectHead(nn.Module):
    """head.py:22-62 Detect: decoupled box (DFL) / cls branches."""
    nc: int = 80
    reg_max: int = 16
    ch: Sequence[int] = (64, 128, 256)
    dtype: Any = None

    @nn.compact
    def __call__(self, feats):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], self.nc)
        outs = []
        for i, f in enumerate(feats):
            box = ConvBlock(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(f)
            box = ConvBlock(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(box)
            box = nn.Conv(4 * self.reg_max, (1, 1), dtype=self.dtype,
                          name=f"cv2_{i}_2")(box)
            cls = ConvBlock(c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(f)
            cls = ConvBlock(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(cls)
            cls = nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                          name=f"cv3_{i}_2")(cls)
            outs.append((box, cls))
        return outs


def dfl_expectation(box, reg_max: int):
    """DFL (block.py:17-35): softmax over bins -> expected distance."""
    *lead, four_rm = box.shape
    d = box.reshape(*lead, 4, reg_max)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    return jnp.sum(jax.nn.softmax(d, axis=-1) * bins, axis=-1)


def decode_levels(level_outs, strides=(8, 16, 32), reg_max: int = 16):
    """make_anchors + dist2bbox (ultralytics tal.py): per-level xywh + cls.

    Returns (B, total_anchors, 4 + nc) with xywh in input pixels and raw
    (pre-sigmoid) class logits — identical content to Detect.forward eval.
    """
    rows = []
    for (box, cls), stride in zip(level_outs, strides):
        b, h, w, _ = box.shape
        d = dfl_expectation(box, reg_max)            # (b, h, w, 4) lt/rb
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        ax = xs + 0.5
        ay = ys + 0.5
        x1 = ax - d[..., 0]
        y1 = ay - d[..., 1]
        x2 = ax + d[..., 2]
        y2 = ay + d[..., 3]
        cxy = jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2], axis=-1) * stride
        wh = jnp.stack([x2 - x1, y2 - y1], axis=-1) * stride
        row = jnp.concatenate([cxy, wh, cls], axis=-1)
        rows.append(row.reshape(b, h * w, -1))
    return jnp.concatenate(rows, axis=1)


class YOLOv8Module(nn.Module):
    nc: int = 80
    scale: str = "n"
    reg_max: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d, wsc, mc = SCALES[self.scale]
        W = lambda c: _width(c, wsc, mc)      # noqa: E731
        D = lambda n: _depth(n, d)            # noqa: E731
        cb = lambda c, k, s, name: ConvBlock(c, k, s, dtype=self.dtype,  # noqa: E731
                                             name=name)
        # backbone (yaml :15-26), module names mirror "model.{i}" indices
        y0 = cb(W(64), 3, 2, "m0")(x)
        y1 = cb(W(128), 3, 2, "m1")(y0)
        y2 = C2f(W(128), D(3), True, dtype=self.dtype, name="m2")(y1)
        y3 = cb(W(256), 3, 2, "m3")(y2)
        y4 = C2f(W(256), D(6), True, dtype=self.dtype, name="m4")(y3)   # P3
        y5 = cb(W(512), 3, 2, "m5")(y4)
        y6 = C2f(W(512), D(6), True, dtype=self.dtype, name="m6")(y5)   # P4
        y7 = cb(W(1024), 3, 2, "m7")(y6)
        y8 = C2f(W(1024), D(3), True, dtype=self.dtype, name="m8")(y7)
        y9 = SPPF(W(1024), 5, dtype=self.dtype, name="m9")(y8)          # P5

        up = lambda v: jax.image.resize(  # noqa: E731
            v, (v.shape[0], v.shape[1] * 2, v.shape[2] * 2, v.shape[3]),
            "nearest")
        y12 = C2f(W(512), D(3), False, dtype=self.dtype, name="m12")(
            jnp.concatenate([up(y9), y6], axis=-1))
        y15 = C2f(W(256), D(3), False, dtype=self.dtype, name="m15")(
            jnp.concatenate([up(y12), y4], axis=-1))                    # P3 out
        y16 = cb(W(256), 3, 2, "m16")(y15)
        y18 = C2f(W(512), D(3), False, dtype=self.dtype, name="m18")(
            jnp.concatenate([y16, y12], axis=-1))                       # P4 out
        y19 = cb(W(512), 3, 2, "m19")(y18)
        y21 = C2f(W(1024), D(3), False, dtype=self.dtype, name="m21")(
            jnp.concatenate([y19, y9], axis=-1))                        # P5 out

        ch = (W(256), W(512), W(1024))
        level_outs = DetectHead(self.nc, self.reg_max, ch, dtype=self.dtype,
                                name="m22")([y15, y18, y21])
        preds = decode_levels(level_outs, (8, 16, 32), self.reg_max)
        out = {"preds": preds}
        for i, (box, cls) in enumerate(level_outs):
            out[f"box_p{i + 3}"] = box
            out[f"cls_p{i + 3}"] = cls
        return out


def decode_yolov8(outputs: dict, score_thresh: float = 0.25,
                  iou_thresh: float = 0.7, max_dets: int = 300,
                  agnostic: bool = False) -> np.ndarray:
    """Host-side: sigmoid cls + NMS -> (N, 6) [xyxy, score, cls].

    Class-AWARE by default like ultralytics' non_max_suppression
    (agnostic=False offsets boxes by class index before NMS, so
    overlapping detections of different classes both survive).
    """
    preds = np.asarray(outputs["preds"])[0]  # (A, 4+nc)
    xywh, logits = preds[:, :4], preds[:, 4:]
    scores_all = 1.0 / (1.0 + np.exp(-logits))
    score = scores_all.max(-1)
    label = scores_all.argmax(-1)
    sel = score > score_thresh
    if not sel.any():
        return np.zeros((0, 6))
    xywh, score, label = xywh[sel], score[sel], label[sel]
    x1 = xywh[:, 0] - xywh[:, 2] / 2
    y1 = xywh[:, 1] - xywh[:, 3] / 2
    x2 = xywh[:, 0] + xywh[:, 2] / 2
    y2 = xywh[:, 1] + xywh[:, 3] / 2
    dets = np.stack([x1, y1, x2, y2, score, label.astype(float)], axis=-1)
    from enhax.native.nms import nms as _nms
    if agnostic:
        nms_dets = dets
    else:
        # ultralytics trick: shift each class into its own coordinate
        # region so cross-class boxes never overlap in the NMS
        off = label.astype(np.float64)[:, None] * (
            max(float(np.max(x2)), float(np.max(y2))) + 1.0)
        nms_dets = dets.copy()
        nms_dets[:, :4] = dets[:, :4] + off
    keep = _nms(nms_dets, iou_thresh=iou_thresh, score_thresh=score_thresh,
                max_keep=max_dets)
    return dets[keep].reshape(-1, 6)


def _register(scale: str):
    name = f"yolov8{scale}"

    def builder(nc: int = 80, reg_max: int = 16, **kwargs) -> Model:
        return Model(
            name=name, arch="yolov8",
            module=YOLOv8Module(nc=nc, scale=scale, reg_max=reg_max),
            tasks=(Task.DETECT,), schemes=(Scheme.SUPERVISED,),
            required_inputs=("image",),
            out_key="preds",
            size_divisor=32,
        )

    MODELS.register(name=name, obj=builder, arch="yolov8",
                    tasks=(Task.DETECT,), schemes=(Scheme.SUPERVISED,))
    DETECTORS.register(name=name, obj=builder, replace=True)


for _s in SCALES:
    _register(_s)
