"""DIINN: dual interactive implicit neural network for arbitrary-scale SR.

Rebuild of the reference's vendored DIINN (mon_extra/vision/sr/diinn): a conv
encoder produces a feature field; a *modulated* implicit decoder queries HR
coordinates, with the content branch modulating the synthesis branch per
pixel (dual interaction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.inr import coordinate_grid
from enhax.ops.resize import resize


class DIINNModule(nn.Module):
    features: int = 64
    depth: int = 4
    scale: int = 4

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), name="enc1")(x)
        for i in range(3):
            z = nn.relu(nn.Conv(self.features, (3, 3), name=f"enc_b{i}a")(y))
            y = y + nn.Conv(self.features, (3, 3), name=f"enc_b{i}b")(z)

        hr_h, hr_w = x.shape[-3] * self.scale, x.shape[-2] * self.scale
        feat = resize(y, (hr_h, hr_w), method="nearest")
        x_up = resize(x, (hr_h, hr_w), method="bilinear")
        coords = jnp.broadcast_to(coordinate_grid(hr_h, hr_w, flatten=False)[None],
                                  (x.shape[0], hr_h, hr_w, 2))
        # synthesis branch driven by coords, modulated by content features
        h = nn.gelu(nn.Dense(self.features, name="syn0")(coords))
        for i in range(self.depth):
            mod = jax.nn.sigmoid(nn.Dense(self.features, name=f"mod{i}")(feat))
            h = nn.gelu(nn.Dense(self.features, name=f"syn{i + 1}")(h * mod))
        out = nn.Dense(3, name="out")(h)
        return {"enhanced": out + x_up}


def _sr_loss():
    l1 = LOSSES.build("l1_loss")

    def fn(outputs, datapoint):
        return l1(outputs["enhanced"], datapoint["ref_image"])
    return fn


@MODELS.register(name="diinn", arch="diinn",
                 tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,))
def diinn(features: int = 64, scale: int = 4, **kwargs) -> Model:
    return Model(
        name="diinn", arch="diinn",
        module=DIINNModule(features=features, scale=scale),
        tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_sr_loss(),
        required_inputs=("image",),
        size_divisor=1,
        scale=scale,
    )
