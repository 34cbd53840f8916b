"""ShuffleNetV2, MNASNet, RegNet, InceptionV3 (compact rebuilds of
reference vision/classify/{shufflenetv2,mnasnet,regnet,inception})."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


def channel_shuffle(x, groups: int = 2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = x.transpose(0, 1, 2, 4, 3)
    return x.reshape(n, h, w, c)


class ShuffleUnit(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        half = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
        else:
            # both branches process full input
            x1 = nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)),
                         feature_group_count=x.shape[-1], use_bias=False,
                         name="b1_dw")(x)
            x1 = bn(name="b1_bn0")(x1)
            x1 = nn.relu(bn(name="b1_bn1")(
                nn.Conv(half, (1, 1), use_bias=False, name="b1_pw")(x1)))
            x2 = x
        y = nn.relu(bn(name="b2_bn0")(
            nn.Conv(half, (1, 1), use_bias=False, name="b2_pw1")(x2)))
        y = nn.Conv(half, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    feature_group_count=half, use_bias=False, name="b2_dw")(y)
        y = bn(name="b2_bn1")(y)
        y = nn.relu(bn(name="b2_bn2")(
            nn.Conv(half, (1, 1), use_bias=False, name="b2_pw2")(y)))
        return channel_shuffle(jnp.concatenate([x1, y], axis=-1))


class ShuffleNetV2(nn.Module):
    stages: Sequence[int] = (4, 8, 4)
    channels: Sequence[int] = (116, 232, 464)
    head: int = 1024
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        y = nn.relu(bn(name="bn0")(
            nn.Conv(24, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for si, (n, c) in enumerate(zip(self.stages, self.channels)):
            y = ShuffleUnit(c, stride=2, name=f"stage{si}_0")(y, train=train)
            for j in range(1, n):
                y = ShuffleUnit(c, stride=1, name=f"stage{si}_{j}")(y, train=train)
        y = nn.relu(bn(name="bn_last")(
            nn.Conv(self.head, (1, 1), use_bias=False, name="conv_last")(y)))
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="fc")(y)}


class MNASNet(nn.Module):
    """MNASNet-B1 (reference mnasnet/mnasnet.py:62)."""
    width: float = 1.0
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        from enhax.models.classify.mobilenet import (
            InvertedResidual, tv_make_divisible,
        )
        bn = partial(nn.BatchNorm, use_running_average=not train)
        # torchvision _get_depths: _round_to_multiple_of(c*alpha, 8)
        w = lambda c: tv_make_divisible(c * self.width, 8)
        y = nn.relu(bn(name="bn0")(
            nn.Conv(w(32), (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        y = nn.Conv(w(32), (3, 3), feature_group_count=w(32), use_bias=False,
                    name="sep_dw")(y)
        y = nn.relu(bn(name="bn1")(y))
        y = bn(name="bn2")(nn.Conv(w(16), (1, 1), use_bias=False, name="sep_pw")(y))
        cfg = [(3, 3, 24, 3, 2), (3, 5, 40, 3, 2), (6, 5, 80, 3, 2),
               (6, 3, 96, 2, 1), (6, 5, 192, 4, 2), (6, 3, 320, 1, 1)]
        for bi, (e, k, c, n, s) in enumerate(cfg):
            for j in range(n):
                y = InvertedResidual(w(c), s if j == 0 else 1,
                                     expand=y.shape[-1] * e, kernel=k,
                                     name=f"block{bi}_{j}")(y, train=train)
        y = nn.relu(bn(name="bn_last")(
            nn.Conv(1280, (1, 1), use_bias=False, name="conv_last")(y)))
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="classifier")(y)}


class RegNetX(nn.Module):
    """RegNet: staged residual bottlenecks with group conv.

    ``se_ratio > 0`` adds the squeeze-excite block of the Y family
    (reference vision/classify/regnet/regnet.py:72-871 registers the
    torchvision X and Y variants); squeeze width is relative to the
    block's input channels as in torchvision.
    """
    widths: Sequence[int] = (80, 240, 560, 1360)
    depths: Sequence[int] = (2, 5, 15, 1)
    group_width: int = 40
    num_classes: int = 1000
    se_ratio: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        y = nn.relu(bn(name="bn0")(
            nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, name="stem")(x)))
        for si, (wd, dp) in enumerate(zip(self.widths, self.depths)):
            groups = max(wd // self.group_width, 1)
            for j in range(dp):
                stride = 2 if j == 0 else 1
                r = y
                z = nn.relu(bn(name=f"s{si}b{j}_bn1")(
                    nn.Conv(wd, (1, 1), use_bias=False, name=f"s{si}b{j}_c1")(y)))
                z = nn.relu(bn(name=f"s{si}b{j}_bn2")(
                    nn.Conv(wd, (3, 3), strides=(stride, stride),
                            padding=((1, 1), (1, 1)),
                            feature_group_count=groups, use_bias=False,
                            name=f"s{si}b{j}_c2")(z)))
                if self.se_ratio > 0:
                    se_ch = max(1, int(round(r.shape[-1] * self.se_ratio)))
                    a = jnp.mean(z, axis=(-3, -2), keepdims=True)
                    a = nn.relu(nn.Conv(se_ch, (1, 1), name=f"s{si}b{j}_se1")(a))
                    a = jax.nn.sigmoid(nn.Conv(wd, (1, 1), name=f"s{si}b{j}_se2")(a))
                    z = z * a
                z = bn(name=f"s{si}b{j}_bn3")(
                    nn.Conv(wd, (1, 1), use_bias=False, name=f"s{si}b{j}_c3")(z))
                if r.shape != z.shape:
                    r = bn(name=f"s{si}b{j}_bnd")(
                        nn.Conv(wd, (1, 1), strides=(stride, stride),
                                use_bias=False, name=f"s{si}b{j}_down")(y))
                y = nn.relu(z + r)
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="fc")(y)}


# torchvision shufflenet_v2 size tables: (stage channels, head width)
for _name, (_ch, _head) in {
    "shufflenet_v2_x0_5": ((48, 96, 192), 1024),
    "shufflenet_v2_x1_0": ((116, 232, 464), 1024),
    "shufflenet_v2_x1_5": ((176, 352, 704), 1024),
    "shufflenet_v2_x2_0": ((244, 488, 976), 2048),
}.items():
    def _snbuilder(num_classes: int = 1000, ch=_ch, head=_head, nm=_name,
                   **kwargs):
        return make_classifier(nm, "shufflenet",
                               ShuffleNetV2(channels=ch, head=head,
                                            num_classes=num_classes))
    MODELS.register(name=_name, obj=_snbuilder, arch="shufflenet",
                    aliases=["shufflenet_v2"] if _name.endswith("x1_0") else (),
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))


for _name, _w in {"mnasnet0_5": 0.5, "mnasnet0_75": 0.75,
                  "mnasnet1_0": 1.0, "mnasnet1_3": 1.3}.items():
    def _mnbuilder(num_classes: int = 1000, w=_w, nm=_name, **kwargs):
        return make_classifier(nm, "mnasnet",
                               MNASNet(width=w, num_classes=num_classes))
    MODELS.register(name=_name, obj=_mnbuilder, arch="mnasnet",
                    aliases=["mnasnet"] if _name == "mnasnet1_0" else (),
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))


# torchvision size tables: (widths, depths, group_width, se_ratio)
for _name, (_w, _d, _g, _se) in {
    "regnet_x_400mf": ((32, 64, 160, 400), (1, 2, 7, 12), 16, 0.0),
    "regnet_x_800mf": ((64, 128, 288, 672), (1, 3, 7, 5), 16, 0.0),
    "regnet_x_1_6gf": ((72, 168, 408, 912), (2, 4, 10, 2), 24, 0.0),
    "regnet_x_3_2gf": ((96, 192, 432, 1008), (2, 6, 15, 2), 48, 0.0),
    "regnet_x_8gf": ((80, 240, 720, 1920), (2, 5, 15, 1), 120, 0.0),
    "regnet_x_16gf": ((256, 512, 896, 2048), (2, 6, 13, 1), 128, 0.0),
    "regnet_x_32gf": ((336, 672, 1344, 2520), (2, 7, 13, 1), 168, 0.0),
    "regnet_y_400mf": ((48, 104, 208, 440), (1, 3, 6, 6), 8, 0.25),
    "regnet_y_800mf": ((64, 144, 320, 784), (1, 3, 8, 2), 16, 0.25),
    "regnet_y_1_6gf": ((48, 120, 336, 888), (2, 6, 17, 2), 24, 0.25),
    "regnet_y_3_2gf": ((72, 216, 576, 1512), (2, 5, 13, 1), 24, 0.25),
    "regnet_y_8gf": ((224, 448, 896, 2016), (2, 4, 10, 1), 56, 0.25),
    "regnet_y_16gf": ((224, 448, 1232, 3024), (2, 6, 17, 2), 112, 0.25),
    "regnet_y_32gf": ((232, 696, 1392, 3712), (2, 5, 12, 1), 232, 0.25),
    "regnet_y_128gf": ((528, 1056, 2904, 7392), (2, 7, 17, 1), 264, 0.25),
}.items():
    def _builder(num_classes: int = 1000, w=_w, d=_d, g=_g, se=_se, nm=_name,
                 **kwargs):
        return make_classifier(nm, "regnet",
                               RegNetX(widths=w, depths=d, group_width=g,
                                       se_ratio=se, num_classes=num_classes))
    MODELS.register(name=_name, obj=_builder, arch="regnet",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
