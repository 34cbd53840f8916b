"""ResNet / ResNeXt / WideResNet family.

Rebuild of reference ``vision/classify/resnet/resnet.py:67-474`` (torchvision
architecture): basic and bottleneck blocks, stem 7x7/2 + maxpool, 4 stages,
global pool + fc. Grouped conv gives ResNeXt; widened bottleneck gives
WideResNet.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Task, Scheme
from enhax.models.classify.base import make_classifier


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        residual = x
        # torch pads 3x3/stride-2 convs symmetrically (p=1); flax SAME pads
        # (0,1) at stride 2 — explicit padding keeps checkpoint parity
        y = nn.Conv(self.features, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), use_bias=False, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = nn.Conv(self.features, (3, 3), use_bias=False, name="conv2")(y)
        y = bn(name="bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        width = int(self.features * (self.width_per_group / 64.0)) * self.groups
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(bn(name="bn1")(y))
        y = nn.Conv(width, (3, 3), strides=(self.strides, self.strides),
                    padding=((1, 1), (1, 1)), feature_group_count=self.groups,
                    use_bias=False, name="conv2")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, name="conv3")(y)
        y = bn(name="bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="downsample_conv")(x)
            residual = bn(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    block: Any = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    num_classes: int = 1000
    groups: int = 1
    width_per_group: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n in enumerate(self.layers):
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                y = self.block(64 * 2**i, strides=stride, groups=self.groups,
                               width_per_group=self.width_per_group,
                               name=f"layer{i + 1}_{j}")(y, train=train)
        y = jnp.mean(y, axis=(-3, -2))
        logits = nn.Dense(self.num_classes, name="fc")(y)
        return {"logits": logits, "features": y}


_CONFIGS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1, 64),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1, 64),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 1, 64),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 1, 64),
    "resnet152": (Bottleneck, (3, 8, 36, 3), 1, 64),
    "resnext50_32x4d": (Bottleneck, (3, 4, 6, 3), 32, 4),
    "resnext101_32x8d": (Bottleneck, (3, 4, 23, 3), 32, 8),
    "wide_resnet50_2": (Bottleneck, (3, 4, 6, 3), 1, 128),
    "wide_resnet101_2": (Bottleneck, (3, 4, 23, 3), 1, 128),
}

for _name, (_blk, _layers, _groups, _wpg) in _CONFIGS.items():
    def _builder(num_classes: int = 1000, blk=_blk, layers=_layers,
                 groups=_groups, wpg=_wpg, nm=_name, **kwargs):
        return make_classifier(
            nm, "resnet",
            ResNet(block=blk, layers=layers, num_classes=num_classes,
                   groups=groups, width_per_group=wpg))
    MODELS.register(name=_name, obj=_builder, arch="resnet",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
