"""LaMa-style inpainting: fast-Fourier-convolution resolution-robust model.

Rebuild of the reference's vendored LaMa (mon_extra/vision/inpaint/lama,
66k LoC of repo -> the architecture essence): a conv encoder, a body of FFC
residual blocks (global spectral branch + local conv branch — enhax.nn.layers
FFConv), and a conv decoder. Input is [image * (1-mask), mask]; output
composited as enhanced = pred * mask + image * (1-mask).

The FFT global branch is the LaMa trick (image-wide receptive field at every
layer) and is TPU-friendly: rfft2 + 1x1 convs are batched matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import FFConv


class FFCResBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = FFConv(self.features, name="ffc1")(x)
        y = nn.relu(y)
        y = FFConv(self.features, name="ffc2")(y)
        return nn.relu(x + y)


class LaMaModule(nn.Module):
    features: int = 64
    n_blocks: int = 6
    n_downs: int = 2

    @nn.compact
    def __call__(self, image, mask):
        # mask: 1 = hole to fill
        x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
        y = nn.relu(nn.Conv(self.features, (7, 7), name="stem")(x))
        c = self.features
        for i in range(self.n_downs):
            c *= 2
            y = nn.relu(nn.Conv(c, (3, 3), strides=(2, 2), name=f"down{i}")(y))
        for i in range(self.n_blocks):
            y = FFCResBlock(c, name=f"ffc{i}")(y)
        for i in range(self.n_downs):
            c //= 2
            y = nn.relu(nn.ConvTranspose(c, (3, 3), strides=(2, 2),
                                         name=f"up{i}", transpose_kernel=True)(y))
        pred = nn.sigmoid(nn.Conv(3, (7, 7), name="out")(y))
        return {"enhanced": pred * mask + image * (1.0 - mask), "pred": pred}


def _inpaint_loss():
    l1 = LOSSES.build("l1_loss")
    per = LOSSES.build("perceptual_loss")

    def fn(outputs, datapoint):
        t = datapoint["ref_image"]
        return l1(outputs["pred"], t) + 0.1 * per(outputs["pred"], t)
    return fn


@MODELS.register(name="lama", arch="lama",
                 tasks=(Task.INPAINT,), schemes=(Scheme.SUPERVISED,))
def lama(features: int = 64, n_blocks: int = 6, **kwargs) -> Model:
    return Model(
        name="lama", arch="lama",
        module=LaMaModule(features=features, n_blocks=n_blocks),
        tasks=(Task.INPAINT,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_inpaint_loss(),
        required_inputs=("image", "mask"),
        size_divisor=8,
    )
