"""MobileNet V2 / V3 (reference vision/classify/mobilenetv2, mobilenetv3)."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


def hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def tv_make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision _make_divisible: round to nearest multiple, never below
    90% of v (differs from ceil-rounding at e.g. v=17 -> 16, not 24)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand: int
    kernel: int = 3
    use_se: bool = False
    act: str = "relu6"

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        act = {"relu": jax.nn.relu, "relu6": jax.nn.relu6,
               "hswish": hswish}[self.act]
        inp = x
        c_in = x.shape[-1]
        y = x
        if self.expand != c_in:
            y = act(bn(name="bn0")(nn.Conv(self.expand, (1, 1), use_bias=False,
                                           name="expand")(y)))
        p = (self.kernel - 1) // 2   # torch-symmetric; flax SAME skews at s=2
        y = nn.Conv(self.expand, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding=((p, p), (p, p)),
                    feature_group_count=self.expand, use_bias=False, name="dw")(y)
        y = act(bn(name="bn1")(y))
        if self.use_se:
            s = jnp.mean(y, axis=(-3, -2))
            # torchvision SqueezeExcitation width: _make_divisible(exp//4, 8)
            s = nn.relu(nn.Dense(tv_make_divisible(self.expand // 4, 8),
                                 name="se1")(s))
            s = jax.nn.hard_sigmoid(nn.Dense(self.expand, name="se2")(s))
            y = y * s[..., None, None, :]
        y = bn(name="bn2")(nn.Conv(self.features, (1, 1), use_bias=False,
                                   name="project")(y))
        if self.stride == 1 and c_in == self.features:
            y = y + inp
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        cfg = [  # t, c, n, s
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        c = int(32 * self.width_mult)
        y = jax.nn.relu6(bn(name="bn0")(
            nn.Conv(c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        for bi, (t, ch, n, s) in enumerate(cfg):
            ch = int(ch * self.width_mult)
            for j in range(n):
                y = InvertedResidual(ch, s if j == 0 else 1, expand=y.shape[-1] * t,
                                     name=f"block{bi}_{j}")(y, train=train)
        y = jax.nn.relu6(bn(name="bn_last")(
            nn.Conv(1280, (1, 1), use_bias=False, name="conv_last")(y)))
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="classifier")(y)}


class MobileNetV3(nn.Module):
    num_classes: int = 1000
    small: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        if self.small:
            cfg = [  # k, exp, c, se, act, s
                (3, 16, 16, True, "relu", 2), (3, 72, 24, False, "relu", 2),
                (3, 88, 24, False, "relu", 1), (5, 96, 40, True, "hswish", 2),
                (5, 240, 40, True, "hswish", 1), (5, 240, 40, True, "hswish", 1),
                (5, 120, 48, True, "hswish", 1), (5, 144, 48, True, "hswish", 1),
                (5, 288, 96, True, "hswish", 2), (5, 576, 96, True, "hswish", 1),
                (5, 576, 96, True, "hswish", 1)]
            last = 576
        else:
            cfg = [
                (3, 16, 16, False, "relu", 1), (3, 64, 24, False, "relu", 2),
                (3, 72, 24, False, "relu", 1), (5, 72, 40, True, "relu", 2),
                (5, 120, 40, True, "relu", 1), (5, 120, 40, True, "relu", 1),
                (3, 240, 80, False, "hswish", 2), (3, 200, 80, False, "hswish", 1),
                (3, 184, 80, False, "hswish", 1), (3, 184, 80, False, "hswish", 1),
                (3, 480, 112, True, "hswish", 1), (3, 672, 112, True, "hswish", 1),
                (5, 672, 160, True, "hswish", 2), (5, 960, 160, True, "hswish", 1),
                (5, 960, 160, True, "hswish", 1)]
            last = 960
        y = hswish(bn(name="bn0")(
            nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        for i, (k, e, c, se, act, s) in enumerate(cfg):
            y = InvertedResidual(c, s, expand=e, kernel=k, use_se=se, act=act,
                                 name=f"block{i}")(y, train=train)
        y = hswish(bn(name="bn_last")(
            nn.Conv(last, (1, 1), use_bias=False, name="conv_last")(y)))
        y = jnp.mean(y, axis=(-3, -2))
        y = hswish(nn.Dense(1280 if not self.small else 1024, name="fc1")(y))
        return {"logits": nn.Dense(self.num_classes, name="classifier")(y)}


@MODELS.register(name="mobilenet_v2", arch="mobilenet",
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def mobilenet_v2(num_classes: int = 1000, width_mult: float = 1.0, **kwargs):
    return make_classifier("mobilenet_v2", "mobilenet",
                           MobileNetV2(num_classes=num_classes, width_mult=width_mult))


@MODELS.register(name="mobilenet_v3_large", arch="mobilenet",
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def mobilenet_v3_large(num_classes: int = 1000, **kwargs):
    return make_classifier("mobilenet_v3_large", "mobilenet",
                           MobileNetV3(num_classes=num_classes, small=False))


@MODELS.register(name="mobilenet_v3_small", arch="mobilenet",
                 tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
def mobilenet_v3_small(num_classes: int = 1000, **kwargs):
    return make_classifier("mobilenet_v3_small", "mobilenet",
                           MobileNetV3(num_classes=num_classes, small=True))
