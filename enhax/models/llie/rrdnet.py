"""RRDNet: Retinex decomposition per-image zero-shot LLIE.

Rebuild of reference ``vision/enhance/llie/rrdnet/rrdnet.py:42-300``: three
5-conv branches predict illumination (1ch, sigmoid), reflectance (3ch,
sigmoid), noise (3ch, tanh); enhanced = illumination^gamma * ((I - noise) /
illumination). Per-image fit (1000 steps Adam @1e-3) with reconstruction +
gradient-weighted illumination smoothness + reflectance smoothness + noise
losses (rrdnet.py:57-180).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.color import rgb_to_grayscale
from enhax.ops.filtering import gaussian_filter


class _Branch(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        for i, c in enumerate((16, 32, 64, 32)):
            x = nn.relu(nn.Conv(c, (3, 3), name=f"conv{i}")(x))
        return nn.Conv(self.out_channels, (3, 3), name="out")(x)


class RRDNetModule(nn.Module):
    gamma: float = 0.4

    @nn.compact
    def __call__(self, x):
        illumination = nn.sigmoid(_Branch(1, name="illumination_net")(x))
        reflectance = nn.sigmoid(_Branch(3, name="reflectance_net")(x))
        noise = jnp.tanh(_Branch(3, name="noise_net")(x))
        adjust_illu = jnp.power(jnp.maximum(illumination, 1e-4), self.gamma)
        enhanced = adjust_illu * ((x - noise) / jnp.maximum(illumination, 1e-4))
        return {"illumination": illumination, "reflectance": reflectance,
                "noise": noise, "enhanced": jnp.clip(enhanced, 0, 1)}


def _grad_hw(x):
    gh = x[..., 1:, :, :] - x[..., :-1, :, :]
    gw = x[..., :, 1:, :] - x[..., :, :-1, :]
    return gh, gw


def rrdnet_loss(illu_factor: float = 1.0, reflect_factor: float = 1.0,
                noise_factor: float = 5000.0):
    """Reference Loss (rrdnet.py:42-180). Reflectance smoothness follows the
    same gradient-weighted pattern (weights from the input gray gradients)."""

    def fn(outputs, datapoint):
        image = datapoint["image"]
        illu = outputs["illumination"]
        refl = outputs["reflectance"]
        noise = outputs["noise"]

        # reconstruction: L1 norm of (I - (R*L + N))
        recon = jnp.sum(jnp.abs(image - (illu * refl + noise)))

        gray = rgb_to_grayscale(image)
        max_rgb = jnp.max(image, axis=-1, keepdims=True)
        g_gray_h, g_gray_w = _grad_hw(gray)
        g_illu_h, g_illu_w = _grad_hw(illu)
        w_h = 1.0 / (gaussian_filter(g_gray_h, 5, 3.0) + 1e-4)
        w_w = 1.0 / (gaussian_filter(g_gray_w, 5, 3.0) + 1e-4)
        w_h = jnp.asarray(w_h)  # detached conceptually; no grad path to illu
        loss_illu = (jnp.sum(jnp.abs(w_h) * g_illu_h) + jnp.sum(jnp.abs(w_w) * g_illu_w)
                     + jnp.sum(jnp.abs(illu - max_rgb)))

        # reflectance smoothness weighted by reconstruction-target gradients
        target = image / jnp.maximum(illu, 1e-4)
        g_t_h, g_t_w = _grad_hw(rgb_to_grayscale(jnp.clip(target, 0, 1)))
        g_r_h, g_r_w = _grad_hw(refl)
        wr_h = jnp.exp(-10.0 * jnp.abs(g_t_h))
        wr_w = jnp.exp(-10.0 * jnp.abs(g_t_w))
        loss_reflect = (jnp.sum(wr_h * jnp.abs(jnp.mean(g_r_h, -1, keepdims=True)))
                        + jnp.sum(wr_w * jnp.abs(jnp.mean(g_r_w, -1, keepdims=True))))

        loss_noise = jnp.sum(noise ** 2)
        return (recon + illu_factor * loss_illu + reflect_factor * loss_reflect
                + noise_factor * loss_noise)
    return fn


@MODELS.register(name="rrdnet_re", arch="rrdnet", aliases=["rrdnet"],
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE))
def rrdnet_re(gamma: float = 0.4, **kwargs) -> Model:
    return Model(
        name="rrdnet_re", arch="rrdnet",
        module=RRDNetModule(gamma=gamma),
        tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE),
        loss_fn=rrdnet_loss(),
        required_inputs=("image",),
        instance_steps=1000, instance_lr=1e-3,
    )
