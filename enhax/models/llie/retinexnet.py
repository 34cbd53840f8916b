"""RetinexNet: deep Retinex decomposition (BMVC 2018).

Native rebuild of the reference's vendored RetinexNet
(mon_extra/vision/enhance/llie/retinexnet/model.py; EXTRA_MODELS
"retinexnet"):

  * DecomNet (model.py:21-51): 9x9 replicate-padded conv on
    [max_c(x), x], 5 conv+relu, recon -> sigmoid R (3ch) + L (1ch).
  * RelightNet (model.py:54-91): 3 stride-2 convs on [R, L], nearest
    upsample + concat decoder, 1x1 fusion with pad=1 followed by a
    VALID 3x3 output conv (the reference's odd grow-then-shrink pair).
  * enhanced = R_low * I_delta (model.py:199-212).

Losses (model.py:216-234): recon/mutual-recon/equal-R for DecomNet (needs
a paired bright image) and relight + smooth for RelightNet; the smooth
term weights illumination gradients by exp(-10 * reflectance gradients).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


def _rconv(features, k, name, strides=1):
    pad = k // 2 if k != 9 else 4
    return _ReplicateConv(features, k, pad, strides, name=name)


class _ReplicateConv(nn.Module):
    features: int
    k: int
    pad: int
    strides: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        p = self.pad
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
        return nn.Conv(self.features, (self.k, self.k),
                       strides=(self.strides, self.strides), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class DecomNet(nn.Module):
    channel: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mx = jnp.max(x, axis=-1, keepdims=True)
        y = _ReplicateConv(self.channel, 9, 4, name="conv0")(
            jnp.concatenate([mx, x], axis=-1))
        for i in range(5):
            y = nn.relu(_ReplicateConv(self.channel, 3, 1, name=f"c{i}")(y))
        out = _ReplicateConv(4, 3, 1, name="recon")(y)
        r = jax.nn.sigmoid(out[..., 0:3])
        l = jax.nn.sigmoid(out[..., 3:4])
        return r, l


class RelightNet(nn.Module):
    channel: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, illu, refl):
        def near(t, h, w):  # torch F.interpolate default (nearest, floor)
            iy = (jnp.arange(h) * (t.shape[1] / h)).astype(jnp.int32)
            ix = (jnp.arange(w) * (t.shape[2] / w)).astype(jnp.int32)
            return t[:, iy][:, :, ix]

        x = jnp.concatenate([refl, illu], axis=-1)
        out0 = _ReplicateConv(self.channel, 3, 1, name="conv0_1")(x)
        out1 = nn.relu(_ReplicateConv(self.channel, 3, 1, 2, name="conv1_1")(out0))
        out2 = nn.relu(_ReplicateConv(self.channel, 3, 1, 2, name="conv1_2")(out1))
        out3 = nn.relu(_ReplicateConv(self.channel, 3, 1, 2, name="conv1_3")(out2))

        up3 = near(out3, out2.shape[1], out2.shape[2])
        d1 = nn.relu(_ReplicateConv(self.channel, 3, 1, name="deconv1_1")(
            jnp.concatenate([up3, out2], -1)))
        up1 = near(d1, out1.shape[1], out1.shape[2])
        d2 = nn.relu(_ReplicateConv(self.channel, 3, 1, name="deconv1_2")(
            jnp.concatenate([up1, out1], -1)))
        up2 = near(d2, out0.shape[1], out0.shape[2])
        d3 = nn.relu(_ReplicateConv(self.channel, 3, 1, name="deconv1_3")(
            jnp.concatenate([up2, out0], -1)))

        d1_rs = near(d1, refl.shape[1], refl.shape[2])
        d2_rs = near(d2, refl.shape[1], refl.shape[2])
        feats = jnp.concatenate([d1_rs, d2_rs, d3], axis=-1)
        # the reference's fusion 1x1 conv has padding=1 (grows by 2/side)
        # followed by a pad-0 3x3 output conv that shrinks it back
        fus = _ReplicateConv(self.channel, 1, 1, name="fusion")(feats)
        out = nn.Conv(1, (3, 3), padding="VALID", dtype=self.dtype,
                      name="output")(fus)
        return out


class RetinexNetModule(nn.Module):
    channel: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, ref=None):
        decom = DecomNet(self.channel, dtype=self.dtype, name="decom")
        r_low, i_low = decom(x)
        i_delta = RelightNet(self.channel, dtype=self.dtype,
                             name="relight")(i_low, r_low)
        out = {"enhanced": jnp.clip(r_low * i_delta, 0.0, 1.0),
               "reflectance": r_low, "illumination": i_low,
               "illumination_delta": i_delta}
        if ref is not None:
            r_high, i_high = decom(ref)  # shared DecomNet weights
            out["reflectance_high"] = r_high
            out["illumination_high"] = i_high
        return out


def _grad(t, axis):
    """|conv2d(t, 2x2 forward-difference kernel, padding=1)| — the
    reference's gradient (model.py:240-249), including its (H+1, W+1)
    zero-pad boundary rows. kx=[[0,0],[-1,1]]; ky is its transpose."""
    p = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)])
    if axis == 2:   # "x": difference along W at row offset +1
        g = p[:, 1:, 1:, :] - p[:, 1:, :-1, :]
    else:           # "y": difference along H at col offset +1
        g = p[:, 1:, 1:, :] - p[:, :-1, 1:, :]
    return jnp.abs(g)


def _avg_pool3(t):
    """F.avg_pool2d(kernel 3, stride 1, padding 1) with the torch default
    count_include_pad=True (always /9)."""
    s = jax.lax.reduce_window(
        t, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / 9.0


def _smooth(illu, refl):
    """model.py:254-260 smooth: mean over directions of
    |grad I| * exp(-10 * avg_pool3(|grad R_luma|)), R collapsed to
    0.299/0.587/0.114 luma first."""
    r_gray = (0.299 * refl[..., 0] + 0.587 * refl[..., 1]
              + 0.114 * refl[..., 2])[..., None]
    loss = 0.0
    for axis in (2, 1):
        gi = _grad(illu, axis)
        gr = _avg_pool3(_grad(r_gray, axis))
        loss = loss + jnp.mean(gi * jnp.exp(-10.0 * gr))
    return loss


def retinexnet_forward_loss(model, variables, datapoint, rngs):
    x = datapoint["image"]
    ref = datapoint.get("ref_image")
    out = model.module.apply(variables, x, ref)
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))  # noqa: E731
    i_low3 = out["illumination"]
    i_delta3 = out["illumination_delta"]
    r_low = out["reflectance"]
    loss = l1(r_low * i_low3, x) + 0.1 * _smooth(out["illumination"], r_low)
    if ref is not None:
        r_high = out["reflectance_high"]
        i_high3 = out["illumination_high"]
        loss = (loss + l1(r_high * i_high3, ref)
                + 0.001 * l1(r_high * i_low3, x)
                + 0.001 * l1(r_low * i_high3, ref)
                + 0.01 * l1(r_low, jax.lax.stop_gradient(r_high))
                + 0.1 * _smooth(out["illumination_high"], r_high)
                + l1(r_low * i_delta3, ref)
                + 3.0 * _smooth(i_delta3, r_low))
    return loss, out


@MODELS.register(name="retinexnet", arch="retinexnet", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def retinexnet(channel: int = 64, **kwargs) -> Model:
    return Model(
        name="retinexnet", arch="retinexnet",
        module=RetinexNetModule(channel=channel),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=lambda outputs, dp: 0.0,
        forward_loss_fn=retinexnet_forward_loss,
        required_inputs=("image",),
        size_divisor=8,
    )
