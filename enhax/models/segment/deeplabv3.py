"""DeepLabV3 (ResNet backbone + ASPP) — reference vision/segment/deeplabv3."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.classify.resnet import Bottleneck
from enhax.models.segment.unet import segmentation_loss


class ASPP(nn.Module):
    features: int = 256
    rates: tuple = (6, 12, 18)

    @nn.compact
    def __call__(self, x):
        branches = [nn.relu(nn.Conv(self.features, (1, 1), name="b0")(x))]
        for i, r in enumerate(self.rates):
            branches.append(nn.relu(nn.Conv(
                self.features, (3, 3), kernel_dilation=(r, r),
                name=f"b{i + 1}")(x)))
        gp = jnp.mean(x, axis=(-3, -2), keepdims=True)
        gp = nn.relu(nn.Conv(self.features, (1, 1), name="gp")(gp))
        gp = jnp.broadcast_to(gp, x.shape[:-1] + (self.features,))
        y = jnp.concatenate(branches + [gp], axis=-1)
        return nn.relu(nn.Conv(self.features, (1, 1), name="project")(y))


class DeepLabV3Module(nn.Module):
    num_classes: int = 21
    layers: tuple = (3, 4, 6, 3)   # resnet50 backbone

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(64, (7, 7), strides=(2, 2), use_bias=False, name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train, name="bn1")(y))
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n in enumerate(self.layers):
            for j in range(n):
                stride = 2 if (i in (1, 2) and j == 0) else 1  # keep os=16
                y = Bottleneck(64 * 2**i, strides=stride,
                               name=f"layer{i + 1}_{j}")(y, train=train)
        y = ASPP(name="aspp")(y)
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(y)
        logits = jax.image.resize(
            logits, logits.shape[:-3] + x.shape[-3:-1] + (self.num_classes,),
            method="bilinear")
        return {"logits": logits, "mask": jnp.argmax(logits, axis=-1)}


@MODELS.register(name="deeplabv3_resnet50", arch="deeplabv3", aliases=["deeplabv3"],
                 tasks=(Task.SEGMENT,), schemes=(Scheme.SUPERVISED,))
def deeplabv3_resnet50(num_classes: int = 21, **kwargs) -> Model:
    return Model(
        name="deeplabv3_resnet50", arch="deeplabv3",
        module=DeepLabV3Module(num_classes=num_classes),
        tasks=(Task.SEGMENT,), schemes=(Scheme.SUPERVISED,),
        loss_fn=segmentation_loss(),
        required_inputs=("image",),
        out_key="logits",
        size_divisor=16,
    )
