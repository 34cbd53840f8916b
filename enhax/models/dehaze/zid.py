"""ZID: zero-shot image dehazing (deep-image-prior style, per image).

Rebuild of reference ``vision/enhance/dehaze/zid/zid.py:191-470``: three
networks fitted per image — a DIP encoder-decoder J-net (clean image), a
DIP mask net (transmission t) and a VAE ambient net (airlight A) — with
I = t*J + (1-t)*A reconstruction, std/DCP regularizers and an atmospheric-
light prior; output y = (I - (1-t)A)/t with guided-filter-refined t.

Deviations: the reference refines t with OpenCV's guidedFilter on the host
per step (zid.py:453-467); enhax uses the in-graph JAX guided filter (same
math, differentiable, no host round-trip). The reference's atmospheric
prior (brightest pixel among darkest dark-channel pixels) is computed once
per image in-graph via a dark-channel-weighted max.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.filtering import guided_filter


class DIPSkipNet(nn.Module):
    """Encoder-decoder with skips (DIP; reference encoder_decoder_skip)."""
    out_channels: int = 3
    channels_down: tuple = (8, 16, 32, 64, 128)
    channels_skip: tuple = (0, 0, 0, 4, 4)
    sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        skips = []
        y = x
        for i, c in enumerate(self.channels_down):
            y = nn.Conv(c, (3, 3), strides=(2, 2), name=f"down{i}")(y)
            y = nn.leaky_relu(nn.BatchNorm(use_running_average=True,
                                           name=f"dbn{i}")(y), 0.2)
            y = nn.Conv(c, (3, 3), name=f"down{i}b")(y)
            y = nn.leaky_relu(nn.BatchNorm(use_running_average=True,
                                           name=f"dbn{i}b")(y), 0.2)
            if self.channels_skip[i] > 0:
                skips.append((i, nn.Conv(self.channels_skip[i], (1, 1),
                                         name=f"skip{i}")(y)))
            else:
                skips.append((i, None))
        for i in reversed(range(len(self.channels_down))):
            # skip[i] lives at H/2^(i+1); process there, then upsample to H/2^i
            lvl_hw = (x.shape[-3] // 2 ** (i + 1), x.shape[-2] // 2 ** (i + 1))
            y = jax.image.resize(y, y.shape[:-3] + lvl_hw + (y.shape[-1],),
                                 method="bilinear")
            s = skips[i][1]
            if s is not None:
                y = jnp.concatenate([y, s], axis=-1)
            y = nn.Conv(self.channels_down[i], (3, 3), name=f"up{i}")(y)
            y = nn.leaky_relu(nn.BatchNorm(use_running_average=True,
                                           name=f"ubn{i}")(y), 0.2)
            out_hw = (x.shape[-3] // 2 ** i, x.shape[-2] // 2 ** i)
            y = jax.image.resize(y, y.shape[:-3] + out_hw + (y.shape[-1],),
                                 method="bilinear")
        y = nn.Conv(self.out_channels, (1, 1), name="out")(y)
        return jax.nn.sigmoid(y) if self.sigmoid else y


class AmbientVAE(nn.Module):
    """Tiny VAE predicting a global 3-channel airlight (zid.py:191-318)."""
    latent: int = 8

    @nn.compact
    def __call__(self, x):
        y = x
        for i, c in enumerate((16, 32, 64)):
            y = nn.relu(nn.Conv(c, (3, 3), strides=(2, 2), name=f"enc{i}")(y))
        y = jnp.mean(y, axis=(-3, -2))
        mu = nn.Dense(self.latent, name="mu")(y)
        logvar = nn.Dense(self.latent, name="logvar")(y)
        z = mu  # deterministic at inference; KL uses mu/logvar
        a = jax.nn.sigmoid(nn.Dense(3, name="dec")(z))
        kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
        return a[:, None, None, :] * jnp.ones_like(x), kl


class ZIDModule(nn.Module):
    clip_t: bool = True

    @nn.compact
    def __call__(self, x):
        image = DIPSkipNet(3, name="image_net")(x)
        mask = DIPSkipNet(1, name="mask_net")(x)
        ambient, kl = AmbientVAE(name="ambient_net")(x)
        t = jnp.clip(mask, 0, 1)
        t = guided_filter(t, x.mean(axis=-1, keepdims=True), radius=50, eps=1e-4)
        t = jnp.clip(t, 0.1 if self.clip_t else 0.0, 1.0)
        a = jnp.clip(ambient, 0, 1)
        y = jnp.clip((x - (1 - t) * a) / t, 0, 1)
        return {"image": image, "mask": mask, "ambient": ambient,
                "enhanced": y, "vae_kl": kl}


def _atmospheric_prior(x):
    """Airlight estimate: intensity of the brightest pixels among the top
    dark-channel percentile (He et al. DCP; reference nn.atmospheric_prior)."""
    dark = jnp.min(x, axis=-1)                     # (N, H, W)
    flat_dark = dark.reshape(x.shape[0], -1)
    thresh = jnp.quantile(flat_dark, 0.999, axis=-1, keepdims=True)
    w = (flat_dark >= thresh).astype(x.dtype)      # top 0.1% haziest
    flat = x.reshape(x.shape[0], -1, 3)
    a = jnp.sum(flat * w[..., None], axis=1) / jnp.maximum(
        jnp.sum(w, axis=1, keepdims=True), 1.0)
    return a[:, None, None, :]


def _zid_forward_loss(model, variables, datapoint, rngs):
    lq = datapoint["image"]
    out = model.apply(variables, {"image": lq}, rngs=rngs)
    image, mask, ambient = out["image"], out["mask"], out["ambient"]
    mse = lambda a, b: jnp.mean((a - b) ** 2)

    loss = mse(mask * image + (1 - mask) * ambient, lq)
    loss += out["vae_kl"]
    # std losses: gray blur-residual variance (reference std_loss usage)
    from enhax.ops.filtering import box_filter
    std = lambda v: jnp.mean((jnp.mean(v, -1, keepdims=True)
                              - box_filter(jnp.mean(v, -1, keepdims=True), 2)) ** 2)
    loss += 0.005 * std(mask) + 0.1 * std(ambient)
    dcp = jnp.min(image, axis=-1)
    loss += mse(dcp, jnp.zeros_like(dcp)) - 0.05
    prior = jax.lax.stop_gradient(_atmospheric_prior(lq))
    loss += mse(ambient, prior * jnp.ones_like(ambient))
    return loss, out


@MODELS.register(name="zid", arch="zid",
                 tasks=(Task.DEHAZE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zid(**kwargs) -> Model:
    return Model(
        name="zid", arch="zid",
        module=ZIDModule(),
        tasks=(Task.DEHAZE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        forward_loss_fn=_zid_forward_loss,
        required_inputs=("image",),
        instance_steps=500, instance_lr=1e-3,
        size_divisor=32,
    )
