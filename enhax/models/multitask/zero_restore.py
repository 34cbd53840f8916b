"""Zero-Restore: zero-shot restoration via Koschmieder-model perturbation.

Rebuild of reference ``vision/enhance/multitask/zero_restore/`` —
``zero_restore_llie`` (:228), ``zero_restore_dehaze``, ``zero_restore_uie``:
a transmission/atmospheric-light estimator (SK-conv multi-scale trunk) and
the physical inversion enhanced = (I - (1-t)A) / t, trained per image with
a controlled perturbation consistency loss (llie file :275-305).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.resize import resize


class GNConv(nn.Module):
    """conv(reflect) + GroupNorm(8) + ReLU (reference InDoubleConv)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="VALID",
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.GroupNorm(num_groups=8)(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = GNConv(self.features, name="c1")(x)
        return GNConv(self.features, name="c2")(x)


class InConv(nn.Module):
    """Per-channel stride-4 conv, max over RGB (reference InConv :113)."""
    features: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = GNConv(self.features, kernel=7, stride=4, name="conv")
        feats = jnp.stack([conv(x[..., i : i + 1]) for i in range(3)], axis=1)
        y = jnp.max(feats, axis=1)
        return GNConv(self.features, name="convf")(y)


class SKConv(nn.Module):
    """Selective-kernel multi-scale fusion (reference SKConv :141)."""
    features: int = 64
    M: int = 3
    L: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_conv = InConv(self.features, name="in_conv")
        h, w = x.shape[-3] // 4, x.shape[-2] // 4
        feas = []
        for i in range(self.M):
            if i == 0:
                f = in_conv(x)
            else:
                xd = resize(x, (x.shape[-3] // 2**i, x.shape[-2] // 2**i))
                f = resize(in_conv(xd), (h, w))
            feas.append(f)
        feas = jnp.stack(feas, axis=1)                       # (N, M, h, w, C)
        fea_u = jnp.sum(feas, axis=1)
        fea_s = jnp.mean(fea_u, axis=(-3, -2))               # (N, C)
        fea_z = nn.Dense(self.L, name="fc")(fea_s)
        vecs = jnp.stack([nn.Dense(self.features, name=f"fcs{i}")(fea_z)
                          for i in range(self.M)], axis=1)   # (N, M, C)
        attn = jax.nn.softmax(vecs, axis=1)[:, :, None, None, :]
        return jnp.sum(feas * attn, axis=1)


class Estimation(nn.Module):
    """Transmission + atmospheric light (reference Estimation :196)."""
    num_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x_min = SKConv(self.num_channels, name="in_conv")(x)
        up = lambda v: resize(v, (x.shape[-3], x.shape[-2]))
        t = DoubleConv(self.num_channels, name="conv_t1")(x_min)
        t = nn.Conv(1, (3, 3), use_bias=False, name="conv_t2")(up(t))
        trans = jax.nn.sigmoid(t) + 1e-12
        a = GNConv(self.num_channels, name="conv_a1")(x)
        a = a * up(x_min)
        a = DoubleConv(self.num_channels, name="conv_a2")(a)
        a = nn.Conv(1, (3, 3), use_bias=False, name="conv_a3")(a)
        atm = jax.nn.sigmoid(a)
        return trans, atm


class ZeroRestoreModule(nn.Module):
    num_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        trans, atm = Estimation(self.num_channels, name="estimation")(x)
        enhanced = (x - (1.0 - trans) * atm) / trans
        return {"trans": trans, "atm": atm, "enhanced": enhanced}


def _zero_restore_forward_loss(model, variables, datapoint, rngs):
    """Perturbation-consistency loss (reference zero_restore_llie.py:275-305)."""
    image = datapoint["image"]
    out = model.apply(variables, {"image": image}, rngs=rngs)
    p_x = 0.9
    image_x = image * p_x + (1 - p_x) * out["atm"]
    out_x = model.apply(variables, {"image": image_x}, rngs=rngs)
    e, e_x = out["enhanced"], out_x["enhanced"]
    loss_t = jnp.sum((out_x["trans"] - p_x * out["trans"]) ** 2)
    loss_a = jnp.sum((out["atm"] - out_x["atm"]) ** 2)

    def over(v, c):
        return jnp.sum(jnp.maximum(v[..., c], 1.0) - 1.0)

    def under(v, c):
        return -jnp.sum(jnp.minimum(v[..., c], 0.0))

    loss_mx = (over(e, 0) + over(e_x, 0)) + (over(e, 1) + over(e_x, 1)) \
        + 10 * (over(e, 2) + over(e_x, 2))
    loss_mn = (under(e, 0) + under(e_x, 0)) + (under(e, 1) + under(e_x, 1)) \
        + 10 * (under(e, 2) + under(e_x, 2))
    tv = LOSSES.build("total_variation_loss")
    loss = loss_t + loss_a + 0.001 * loss_mx + 0.01 * loss_mn + 0.001 * tv(e)
    return loss, out


def _make(name, task):
    return Model(
        name=name, arch="zero_restore",
        module=ZeroRestoreModule(),
        tasks=(task,), schemes=(Scheme.ZERO_REFERENCE, Scheme.ZERO_SHOT),
        forward_loss_fn=_zero_restore_forward_loss,
        required_inputs=("image",),
        instance_steps=1000, instance_lr=1e-4,
        size_divisor=32,
    )


@MODELS.register(name="zero_restore_llie", arch="zero_restore",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_restore_llie(**kwargs) -> Model:
    return _make("zero_restore_llie", Task.LLIE)


@MODELS.register(name="zero_restore_dehaze", arch="zero_restore",
                 tasks=(Task.DEHAZE,), schemes=(Scheme.ZERO_SHOT,))
def zero_restore_dehaze(**kwargs) -> Model:
    return _make("zero_restore_dehaze", Task.DEHAZE)


@MODELS.register(name="zero_restore_uie", arch="zero_restore",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_restore_uie(**kwargs) -> Model:
    return _make("zero_restore_uie", Task.LLIE)
