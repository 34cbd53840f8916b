"""UNet segmentation — faithful rebuild of reference
``vision/segment/unet/unet.py:35-199`` (milesial layout, bilinear=True):
conv-BN-ReLU double blocks, maxpool downs, bilinear align_corners=True
upsampling with halved mid channels in the decoder double convs,
center-padded skip concat [skip, up], 1x1 head. Output key ``semantic``
(reference :195) with ``logits``/``mask`` aliases."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.resize import resize_align_corners


class DoubleConv(nn.Module):
    """(conv -> BN -> ReLU) x2 (unet.py:35-57)."""
    features: int
    mid: int | None = None

    @nn.compact
    def __call__(self, x):
        mid = self.mid or self.features
        bn = lambda name: nn.BatchNorm(use_running_average=True,  # noqa: E731
                                       epsilon=1e-5, name=name)
        x = nn.relu(bn("norm1")(nn.Conv(mid, (3, 3), use_bias=False,
                                        name="conv1")(x)))
        x = nn.relu(bn("norm2")(nn.Conv(self.features, (3, 3),
                                        use_bias=False, name="conv2")(x)))
        return x


class UNetModule(nn.Module):
    num_classes: int = 21
    filters: tuple = (64, 128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x):
        f = self.filters
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))  # noqa: E731
        x1 = DoubleConv(f[0], name="inc")(x)
        x2 = DoubleConv(f[1], name="down1")(pool(x1))
        x3 = DoubleConv(f[2], name="down2")(pool(x2))
        x4 = DoubleConv(f[3], name="down3")(pool(x3))
        x5 = DoubleConv(f[4] // 2, name="down4")(pool(x4))

        def up(a, skip):
            a = resize_align_corners(a, (a.shape[-3] * 2, a.shape[-2] * 2))
            dy = skip.shape[-3] - a.shape[-3]
            dx = skip.shape[-2] - a.shape[-2]
            if dy or dx:
                a = jnp.pad(a, ((0, 0), (dy // 2, dy - dy // 2),
                                (dx // 2, dx - dx // 2), (0, 0)))
            return jnp.concatenate([skip, a], axis=-1)

        y = DoubleConv(f[3] // 2, f[4] // 2, name="up1")(up(x5, x4))
        y = DoubleConv(f[2] // 2, f[3] // 2, name="up2")(up(y, x3))
        y = DoubleConv(f[1] // 2, f[2] // 2, name="up3")(up(y, x2))
        y = DoubleConv(f[0], f[1] // 2, name="up4")(up(y, x1))
        logits = nn.Conv(self.num_classes, (1, 1), name="outc")(y)
        return {"semantic": logits, "logits": logits,
                "mask": jnp.argmax(logits, axis=-1)}


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
def unet(num_classes: int = 21, base: int = 64, **kwargs) -> Model:
    filters = tuple(base * 2 ** i for i in range(5))
    return Model(
        name="unet", arch="unet",
        module=UNetModule(num_classes=num_classes, filters=filters),
        tasks=(Task.SEGMENT,), schemes=(Scheme.SUPERVISED,),
        loss_fn=segmentation_loss(),
        required_inputs=("image",),
        out_key="logits",
        size_divisor=16,
    )
