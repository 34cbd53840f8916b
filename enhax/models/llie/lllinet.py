"""LLLiNet: supervised low-light UNet, RGB and HVI variants.

Rebuild of reference ``vision/enhance/llie/lllinet/lllinet.py:32-400``:
a residual double-conv UNet; ``lllinet`` runs on RGB, ``lllinet_hvi``
converts to HVI, enhances there and converts back (lllinet.py:263-400).
Loss: L1 + SSIM supervised mix (lllinet.py:32-95).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.color import hvi_to_rgb, rgb_to_hvi


class ResDoubleConv(nn.Module):
    features: int
    relu_slope: float = 0.2

    @nn.compact
    def __call__(self, x):
        idn = nn.Conv(self.features, (1, 1), name="identity")(x)
        y = nn.leaky_relu(nn.Conv(self.features, (3, 3), name="conv1")(x),
                          self.relu_slope)
        y = nn.leaky_relu(nn.Conv(self.features, (3, 3), name="conv2")(y),
                          self.relu_slope)
        return y + idn


class LLLiNetModule(nn.Module):
    num_channels: int = 32
    depth: int = 4
    use_hvi: bool = False

    @nn.compact
    def __call__(self, x):
        inp = x
        if self.use_hvi:
            x = rgb_to_hvi(x)
        c = self.num_channels
        skips = []
        y = x
        for i in range(self.depth):
            y = ResDoubleConv(c * 2**i, name=f"enc{i}")(y)
            skips.append(y)
            if i < self.depth - 1:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
        for i in reversed(range(self.depth - 1)):
            y = nn.ConvTranspose(c * 2**i, (2, 2), strides=(2, 2),
                                 name=f"up{i}", transpose_kernel=True)(y)
            y = ResDoubleConv(c * 2**i, name=f"dec{i}")(
                jnp.concatenate([y, skips[i]], axis=-1))
        out = nn.Conv(3, (3, 3), name="out")(y)
        if self.use_hvi:
            out = out + x  # residual in HVI
            rgb = hvi_to_rgb(out)
            return {"enhanced": jnp.clip(rgb, 0, 1), "hvi": out}
        return {"enhanced": jax.nn.sigmoid(out)}


def _lllinet_loss():
    l1 = LOSSES.build("l1_loss")
    ssim_l = LOSSES.build("ssim_loss")

    def fn(outputs, datapoint):
        p, t = outputs["enhanced"], datapoint["ref_image"]
        return l1(p, t) + 0.5 * ssim_l(p, t)
    return fn


@MODELS.register(name="lllinet", arch="lllinet",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def lllinet(num_channels: int = 32, depth: int = 4, **kwargs) -> Model:
    return Model(
        name="lllinet", arch="lllinet",
        module=LLLiNetModule(num_channels=num_channels, depth=depth),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_lllinet_loss(),
        required_inputs=("image",),
        size_divisor=2 ** 3,
    )


@MODELS.register(name="lllinet_hvi", arch="lllinet",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def lllinet_hvi(num_channels: int = 32, depth: int = 4, **kwargs) -> Model:
    return Model(
        name="lllinet_hvi", arch="lllinet",
        module=LLLiNetModule(num_channels=num_channels, depth=depth, use_hvi=True),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_lllinet_loss(),
        required_inputs=("image",),
        size_divisor=2 ** 3,
    )
