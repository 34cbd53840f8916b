"""SRNO: super-resolution neural operator (arbitrary-scale SR).

Rebuild of the reference's vendored SRNO (mon_extra/vision/sr/srno): an
EDSR-style conv encoder lifts the LR image to a latent field; a Galerkin-type
(linear) attention operator refines it; a coordinate-conditioned decoder
queries the field at arbitrary HR coordinates. Linear attention = two
matmuls over (pixels x channels) — ideal MXU work, linear in pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.inr import coordinate_grid
from enhax.ops.resize import resize


class EDSREncoder(nn.Module):
    """Small EDSR trunk (reference nn/modules/encoder/edsr.py)."""
    features: int = 64
    blocks: int = 8

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), name="head")(x)
        skip = y
        for i in range(self.blocks):
            z = nn.relu(nn.Conv(self.features, (3, 3), name=f"b{i}_c1")(y))
            z = nn.Conv(self.features, (3, 3), name=f"b{i}_c2")(z)
            y = y + z
        return nn.Conv(self.features, (3, 3), name="tail")(y) + skip


class GalerkinAttention(nn.Module):
    """Linear (Galerkin) attention: softmax-free, O(N d^2)."""
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        t = x.reshape(n, h * w, c)
        hd = self.dim // self.heads

        def proj(name):
            return nn.Dense(self.dim, name=name)(t).reshape(
                n, h * w, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = proj("q"), proj("k"), proj("v")
        k = nn.LayerNorm(name="k_norm")(k)
        v = nn.LayerNorm(name="v_norm")(v)
        ctx = jnp.einsum("nhpd,nhpe->nhde", k, v,
                         preferred_element_type=jnp.float32) / (h * w)
        out = jnp.einsum("nhpd,nhde->nhpe", q, ctx.astype(q.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(n, h * w, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        return x + out.reshape(n, h, w, self.dim)


class SRNOModule(nn.Module):
    features: int = 64
    heads: int = 8
    operator_layers: int = 2
    scale: int = 4  # default upscale when no target size given

    @nn.compact
    def __call__(self, x):
        feat = EDSREncoder(self.features, name="encoder")(x)
        for i in range(self.operator_layers):
            feat = GalerkinAttention(self.features, self.heads, name=f"op{i}")(feat)
            z = nn.gelu(nn.Dense(self.features * 2, name=f"ffn{i}_1")(feat))
            feat = feat + nn.Dense(self.features, name=f"ffn{i}_2")(z)

        hr_h, hr_w = x.shape[-3] * self.scale, x.shape[-2] * self.scale
        feat_up = resize(feat, (hr_h, hr_w), method="nearest")
        x_up = resize(x, (hr_h, hr_w), method="bilinear")
        coords = coordinate_grid(hr_h, hr_w, flatten=False)[None]
        coords = jnp.broadcast_to(coords, (x.shape[0], hr_h, hr_w, 2))
        # cell size conditioning (arbitrary-scale)
        cell = jnp.full_like(coords, 2.0 / hr_h).at[..., 1].set(2.0 / hr_w)
        q = jnp.concatenate([feat_up, coords, cell], axis=-1)
        y = nn.gelu(nn.Dense(self.features, name="dec1")(q))
        y = nn.gelu(nn.Dense(self.features, name="dec2")(y))
        out = nn.Dense(3, name="dec3")(y)
        return {"enhanced": out + x_up}


def _sr_loss():
    l1 = LOSSES.build("l1_loss")

    def fn(outputs, datapoint):
        return l1(outputs["enhanced"], datapoint["ref_image"])
    return fn


@MODELS.register(name="srno", arch="srno",
                 tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,))
def srno(features: int = 64, scale: int = 4, **kwargs) -> Model:
    return Model(
        name="srno", arch="srno",
        module=SRNOModule(features=features, scale=scale),
        tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_sr_loss(),
        required_inputs=("image",),
        size_divisor=1,
        scale=scale,
    )
