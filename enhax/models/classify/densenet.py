"""DenseNet 121/161/169/201 (reference vision/classify/densenet).

Stem width is 2x growth rate (64 for k=32, 96 for densenet161 k=48),
matching torchvision num_init_features."""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


class DenseLayer(nn.Module):
    growth: int = 32
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        y = nn.relu(bn(name="bn1")(x))
        y = nn.Conv(self.bn_size * self.growth, (1, 1), use_bias=False, name="conv1")(y)
        y = nn.relu(bn(name="bn2")(y))
        y = nn.Conv(self.growth, (3, 3), use_bias=False, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNet(nn.Module):
    layers: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = partial(nn.BatchNorm, use_running_average=not train)
        y = nn.Conv(2 * self.growth, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    name="stem")(x)
        y = nn.relu(bn(name="bn0")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for bi, n in enumerate(self.layers):
            for j in range(n):
                y = DenseLayer(self.growth, name=f"block{bi}_{j}")(y, train=train)
            if bi < len(self.layers) - 1:
                y = nn.relu(bn(name=f"tbn{bi}")(y))
                y = nn.Conv(y.shape[-1] // 2, (1, 1), use_bias=False,
                            name=f"trans{bi}")(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        y = nn.relu(bn(name="bn_final")(y))
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="classifier")(y)}


for _name, (_layers, _growth) in {
        "densenet121": ((6, 12, 24, 16), 32),
        "densenet161": ((6, 12, 36, 24), 48),
        "densenet169": ((6, 12, 32, 32), 32),
        "densenet201": ((6, 12, 48, 32), 32)}.items():
    def _builder(num_classes: int = 1000, layers=_layers, growth=_growth,
                 nm=_name, **kwargs):
        return make_classifier(nm, "densenet",
                               DenseNet(layers=layers, growth=growth,
                                        num_classes=num_classes))
    MODELS.register(name=_name, obj=_builder, arch="densenet",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
