"""EfficientNet B0-B7 and V2 s/m/l (reference vision/classify/efficientnet,
efficientnet.py:68-483): V1 scales the B0 MBConv table by width/depth
coefficients; V2 uses explicit per-size stage tables with FusedMBConv
(3x3 expand + 1x1 project, no SE) in the early stages."""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


class MBConv(nn.Module):
    features: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        c_in = x.shape[-1]
        mid = c_in * self.expand
        y = x
        if self.expand != 1:
            y = nn.silu(bn(name="bn0")(
                nn.Conv(mid, (1, 1), use_bias=False, name="expand")(y)))
        p = (self.kernel - 1) // 2   # torch-symmetric; flax SAME skews at s=2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=((p, p), (p, p)),
                    feature_group_count=mid,
                    use_bias=False, name="dw")(y)
        y = nn.silu(bn(name="bn1")(y))
        s = jnp.mean(y, axis=(-3, -2))
        s = nn.silu(nn.Dense(max(int(c_in * self.se_ratio), 1), name="se1")(s))
        s = jax.nn.sigmoid(nn.Dense(mid, name="se2")(s))
        y = y * s[..., None, None, :]
        y = bn(name="bn2")(nn.Conv(self.features, (1, 1), use_bias=False,
                                   name="project")(y))
        if self.stride == 1 and c_in == self.features:
            y = y + x
        return y


_BASE = [  # expand, channels, layers, stride, kernel
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5), (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5), (6, 192, 4, 2, 5), (6, 320, 1, 1, 3)]


class FusedMBConv(nn.Module):
    """V2 early-stage block: fused 3x3 expand conv, no SE."""
    features: int
    expand: int
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        c_in = x.shape[-1]
        mid = c_in * self.expand
        if self.expand != 1:
            y = nn.silu(bn(name="bn0")(
                nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)),
                        use_bias=False, name="fused")(x)))
            y = bn(name="bn1")(nn.Conv(self.features, (1, 1), use_bias=False,
                                       name="project")(y))
        else:
            y = nn.silu(bn(name="bn0")(
                nn.Conv(self.features, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)),
                        use_bias=False, name="fused")(x)))
        if self.stride == 1 and c_in == self.features:
            y = y + x
        return y


# torchvision V2 stage tables: (expand, channels, layers, stride, fused)
_V2 = {
    "s": (24, [(1, 24, 2, 1, True), (4, 48, 4, 2, True), (4, 64, 4, 2, True),
               (4, 128, 6, 2, False), (6, 160, 9, 1, False),
               (6, 256, 15, 2, False)]),
    "m": (24, [(1, 24, 3, 1, True), (4, 48, 5, 2, True), (4, 80, 5, 2, True),
               (4, 160, 7, 2, False), (6, 176, 14, 1, False),
               (6, 304, 18, 2, False), (6, 512, 5, 1, False)]),
    "l": (32, [(1, 32, 4, 1, True), (4, 64, 7, 2, True), (4, 96, 7, 2, True),
               (4, 192, 10, 2, False), (6, 224, 19, 1, False),
               (6, 384, 25, 2, False), (6, 640, 7, 1, False)]),
}


class EfficientNetV2(nn.Module):
    size: str = "s"
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        stem, stages = _V2[self.size]
        y = nn.silu(bn(name="bn0")(
            nn.Conv(stem, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        for bi, (e, c, n, s_, fused) in enumerate(stages):
            for j in range(n):
                if fused:
                    y = FusedMBConv(c, e, s_ if j == 0 else 1,
                                    name=f"block{bi}_{j}")(y, train=train)
                else:
                    y = MBConv(c, e, 3, s_ if j == 0 else 1,
                               name=f"block{bi}_{j}")(y, train=train)
        y = nn.silu(bn(name="bn_head")(
            nn.Conv(1280, (1, 1), use_bias=False, name="head_conv")(y)))
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="classifier")(y)}


class EfficientNet(nn.Module):
    width: float = 1.0
    depth: float = 1.0
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)

        def rc(c):
            # torchvision _make_divisible incl. the 0.9 floor bump
            # (16*1.2 -> 24, not 16 — the b3 stage-1 width)
            from enhax.models.classify.mobilenet import tv_make_divisible
            return tv_make_divisible(c * self.width, 8)

        def rd(d):
            return int(math.ceil(d * self.depth))

        y = nn.silu(bn(name="bn0")(
            nn.Conv(rc(32), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        for bi, (e, c, n, s, k) in enumerate(_BASE):
            for j in range(rd(n)):
                y = MBConv(rc(c), e, k, s if j == 0 else 1,
                           name=f"block{bi}_{j}")(y, train=train)
        y = nn.silu(bn(name="bn_head")(
            nn.Conv(rc(1280), (1, 1), use_bias=False, name="head_conv")(y)))
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="classifier")(y)}


for _name, (_w, _d) in {"efficientnet_b0": (1.0, 1.0), "efficientnet_b1": (1.0, 1.1),
                        "efficientnet_b2": (1.1, 1.2), "efficientnet_b3": (1.2, 1.4),
                        "efficientnet_b4": (1.4, 1.8), "efficientnet_b5": (1.6, 2.2),
                        "efficientnet_b6": (1.8, 2.6), "efficientnet_b7": (2.0, 3.1)}.items():
    def _builder(num_classes: int = 1000, w=_w, d=_d, nm=_name, **kwargs):
        return make_classifier(nm, "efficientnet",
                               EfficientNet(width=w, depth=d, num_classes=num_classes))
    MODELS.register(name=_name, obj=_builder, arch="efficientnet",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))


for _sz in ("s", "m", "l"):
    def _v2builder(num_classes: int = 1000, sz=_sz, **kwargs):
        return make_classifier(f"efficientnet_v2_{sz}", "efficientnet",
                               EfficientNetV2(size=sz, num_classes=num_classes))
    MODELS.register(name=f"efficientnet_v2_{_sz}", obj=_v2builder,
                    arch="efficientnet",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
