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

import numpy as np

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


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
        adjust_illu = jnp.power(illumination, self.gamma)
        enhanced = adjust_illu * ((x - noise) / illumination)
        return {"illumination": illumination, "reflectance": reflectance,
                "noise": noise, "enhanced": jnp.clip(enhanced, 0, 1)}


def _ref_gradient(x):
    """Reference ``Loss.gradient`` (rrdnet.py:148-159): the product of
    |central diff at offset 2| (replicate pad 1) and |central diff at
    offset 4| (replicate pad 2), per axis. NHWC."""
    h, w = x.shape[-3], x.shape[-2]
    g1h = jnp.abs(x[..., 2:, :, :] - x[..., :h - 2, :, :])
    g1w = jnp.abs(x[..., :, 2:, :] - x[..., :, :w - 2, :])
    g1h = jnp.pad(g1h, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    g1w = jnp.pad(g1w, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    g2h = jnp.abs(x[..., 4:, :, :] - x[..., :h - 4, :, :])
    g2w = jnp.abs(x[..., :, 4:, :] - x[..., :, :w - 4, :])
    g2h = jnp.pad(g2h, ((0, 0), (2, 2), (0, 0), (0, 0)), mode="edge")
    g2w = jnp.pad(g2w, ((0, 0), (0, 0), (2, 2), (0, 0)), mode="edge")
    return g1h * g2h, g1w * g2w


def _gauss5_zero(x, sigma: float = 3.0):
    """5x5 Gaussian blur with ZERO padding (reference F.conv2d padding=2,
    cv2.getGaussianKernel(5, 3) separable kernel)."""
    i = np.arange(5) - 2.0
    k = np.exp(-(i ** 2) / (2.0 * sigma ** 2))
    k = jnp.asarray(k / k.sum(), x.dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    y = sum(k[i] * xp[:, i:i + x.shape[1], 2:2 + x.shape[2]] for i in range(5))
    yp = jnp.pad(y, ((0, 0), (0, 0), (2, 2), (0, 0)))
    return sum(k[i] * yp[:, :, i:i + x.shape[2]] for i in range(5))


def rrdnet_loss(illu_factor: float = 1.0, reflect_factor: float = 1.0,
                noise_factor: float = 5000.0):
    """Reference Loss (rrdnet.py:42-180), term for term. Note upstream's
    ``weight.detach()`` statements discard their result, so the weights
    are NOT actually detached — reproduced as-is."""

    def fn(outputs, datapoint):
        image = datapoint["image"]
        illu = outputs["illumination"]
        refl = outputs["reflectance"]
        noise = outputs["noise"]

        # reconstruction: L1 norm of (I - (L*R + N))  (:76-83)
        recon = jnp.sum(jnp.abs(image - (illu * refl + noise)))

        gray = (0.299 * image[..., :1] + 0.587 * image[..., 1:2]
                + 0.114 * image[..., 2:3])
        max_rgb = jnp.max(image, axis=-1, keepdims=True)

        # illumination smoothness (:85-109)
        g_gray_h, g_gray_w = _ref_gradient(gray)
        g_illu_h, g_illu_w = _ref_gradient(illu)
        w_h = 1.0 / (_gauss5_zero(g_gray_h) + 1e-4)
        w_w = 1.0 / (_gauss5_zero(g_gray_w) + 1e-4)
        loss_illu = (jnp.sum(w_h * g_illu_h) + jnp.sum(w_w * g_illu_w)
                     + jnp.sum(jnp.abs(illu - max_rgb)))

        # reflectance smoothness (:111-129)
        g_refl_h, g_refl_w = _ref_gradient(refl)
        weight = 1.0 / (illu * g_gray_h * g_gray_w + 1e-4)
        weight = (weight - weight.min()) / (weight.max() - weight.min())
        ref_reflect = image / illu
        loss_reflect = (jnp.sum(weight * g_refl_h)
                        + jnp.sum(weight * g_refl_w)
                        + jnp.sum(jnp.abs(ref_reflect - refl)))

        # noise (:131-141): L2 NORM of illumination-weighted noise
        loss_noise = jnp.sqrt(jnp.sum((illu * noise) ** 2))

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
