"""LLUNet++: UNet++ (nested dense skips) for supervised LLIE.

Rebuild of reference ``vision/enhance/llie/llunetpp/llunetpp.py:35-260``:
standard UNet++ topology — double-conv blocks X(i,j) where node (i,j)
receives upsampled X(i+1,j-1) concatenated with all X(i,0..j-1); sigmoid
output from X(0,depth-1). Loss: Charbonnier-style supervised mix
(llunetpp.py:35-95 uses SSIM + Perceptual + L1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


class DoubleConv(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.BatchNorm(use_running_average=True, name="bn1")(
            nn.Conv(self.features, (3, 3), name="conv1")(x)))
        x = nn.relu(nn.BatchNorm(use_running_average=True, name="bn2")(
            nn.Conv(self.features, (3, 3), name="conv2")(x)))
        return x


class LLUnetPPModule(nn.Module):
    filters: tuple = (32, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        f = self.filters
        L = len(f)
        up = lambda v, ref: jax.image.resize(
            v, v.shape[:-3] + (ref.shape[-3], ref.shape[-2], v.shape[-1]),
            method="bilinear")

        # nodes[i][j]
        nodes: dict = {}
        cur = x
        for i in range(L):
            nodes[(i, 0)] = DoubleConv(f[i], name=f"x{i}0")(cur)
            if i < L - 1:
                cur = nn.max_pool(nodes[(i, 0)], (2, 2), strides=(2, 2))
        for j in range(1, L):
            for i in range(L - j):
                skips = [nodes[(i, k)] for k in range(j)]
                upped = up(nodes[(i + 1, j - 1)], skips[0])
                nodes[(i, j)] = DoubleConv(f[i], name=f"x{i}{j}")(
                    jnp.concatenate(skips + [upped], axis=-1))

        out = nn.Conv(3, (1, 1), name="final")(nodes[(0, L - 1)])
        return {"enhanced": jax.nn.sigmoid(out)}


def _llunetpp_loss():
    l1 = LOSSES.build("l1_loss")
    ssim_l = LOSSES.build("ssim_loss")
    per = LOSSES.build("perceptual_loss")

    def fn(outputs, datapoint):
        p, t = outputs["enhanced"], datapoint["ref_image"]
        return l1(p, t) + 0.5 * ssim_l(p, t) + 0.1 * per(p, t)
    return fn


@MODELS.register(name="llunet++_re", arch="llunetpp", aliases=["llunetpp_re", "llunetpp", "llunet++"],
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def llunetpp_re(filters=(32, 64, 128, 256, 512), **kwargs) -> Model:
    return Model(
        name="llunet++_re", arch="llunetpp",
        module=LLUnetPPModule(filters=tuple(filters)),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_llunetpp_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
