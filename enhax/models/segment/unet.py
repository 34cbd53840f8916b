"""UNet segmentation (reference vision/segment/unet/unet.py:115)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.GroupNorm(num_groups=8, name="gn1")(
            nn.Conv(self.features, (3, 3), use_bias=False, name="conv1")(x)))
        x = nn.relu(nn.GroupNorm(num_groups=8, name="gn2")(
            nn.Conv(self.features, (3, 3), use_bias=False, name="conv2")(x)))
        return x


class UNetModule(nn.Module):
    num_classes: int = 21
    base: int = 64
    depth: int = 4

    @nn.compact
    def __call__(self, x):
        skips = []
        y = x
        for i in range(self.depth):
            y = DoubleConv(self.base * 2**i, name=f"enc{i}")(y)
            skips.append(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = DoubleConv(self.base * 2**self.depth, name="bottleneck")(y)
        for i in reversed(range(self.depth)):
            y = nn.ConvTranspose(self.base * 2**i, (2, 2), strides=(2, 2),
                                 name=f"up{i}", transpose_kernel=True)(y)
            y = DoubleConv(self.base * 2**i, name=f"dec{i}")(
                jnp.concatenate([y, skips[i]], axis=-1))
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(y)
        return {"logits": logits, "mask": jnp.argmax(logits, axis=-1)}


def segmentation_loss():
    def fn(outputs, datapoint):
        labels = datapoint["segmentation"]
        if labels.ndim == 4 and labels.shape[-1] == 1:
            labels = labels[..., 0]
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            outputs["logits"], labels.astype(jnp.int32)))
    return fn


@MODELS.register(name="unet", arch="unet",
                 tasks=(Task.SEGMENT,), schemes=(Scheme.SUPERVISED,))
def unet(num_classes: int = 21, base: int = 64, depth: int = 4, **kwargs) -> Model:
    return Model(
        name="unet", arch="unet",
        module=UNetModule(num_classes=num_classes, base=base, depth=depth),
        tasks=(Task.SEGMENT,), schemes=(Scheme.SUPERVISED,),
        loss_fn=segmentation_loss(),
        required_inputs=("image",),
        out_key="logits",
        size_divisor=16,
    )
