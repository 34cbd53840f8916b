"""ConvNeXt tiny/small/base (reference vision/classify/convnext)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale: float = 1e-6

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim, name="dw")(x)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.Dense(self.dim * 4, name="pw1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pw2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale),
                           (self.dim,))
        return x + gamma * y


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem")(x)
        y = nn.LayerNorm(name="stem_norm")(y)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                y = nn.LayerNorm(name=f"down_norm{i}")(y)
                y = nn.Conv(dim, (2, 2), strides=(2, 2), name=f"down{i}")(y)
            for j in range(depth):
                y = ConvNeXtBlock(dim, name=f"block{i}_{j}")(y)
        y = jnp.mean(y, axis=(-3, -2))
        y = nn.LayerNorm(name="head_norm")(y)
        return {"logits": nn.Dense(self.num_classes, name="head")(y)}


for _name, (_depths, _dims) in {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}.items():
    def _builder(num_classes: int = 1000, depths=_depths, dims=_dims, nm=_name, **kwargs):
        return make_classifier(nm, "convnext",
                               ConvNeXt(depths=depths, dims=dims,
                                        num_classes=num_classes))
    MODELS.register(name=_name, obj=_builder, arch="convnext",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
