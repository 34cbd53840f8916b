"""Classical total-variation denoising (traditional scheme).

Rebuild of reference ``vision/enhance/denoise/tv_denoise.py``: Chambolle-style
TV-L2 denoising as a fixed-point iteration — parameter-free, jitted, runs as
a ``lax.fori_loop`` on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


def tv_denoise_image(image, weight: float = 0.1, num_iters: int = 50, tau: float = 0.125):
    """Chambolle 2004 dual-projection TV denoising on (..., H, W, C)."""

    def grad(u):
        gx = jnp.concatenate([u[..., :, 1:, :] - u[..., :, :-1, :],
                              jnp.zeros_like(u[..., :, :1, :])], axis=-2)
        gy = jnp.concatenate([u[..., 1:, :, :] - u[..., :-1, :, :],
                              jnp.zeros_like(u[..., :1, :, :])], axis=-3)
        return gx, gy

    def div(px, py):
        dx = jnp.concatenate([px[..., :, :1, :],
                              px[..., :, 1:-1, :] - px[..., :, :-2, :],
                              -px[..., :, -2:-1, :]], axis=-2)
        dy = jnp.concatenate([py[..., :1, :, :],
                              py[..., 1:-1, :, :] - py[..., :-2, :, :],
                              -py[..., -2:-1, :, :]], axis=-3)
        return dx + dy

    def body(_, state):
        # Chambolle dual ascent: g = grad(div(p) - f/lambda);
        # p <- (p + tau*g) / (1 + tau*|g|), with u = f - lambda*div(p).
        px, py = state
        gx, gy = grad(div(px, py) - image / weight)
        norm = jnp.sqrt(gx * gx + gy * gy + 1e-12)
        denom = 1.0 + tau * norm
        px = (px + tau * gx) / denom
        py = (py + tau * gy) / denom
        return px, py

    px = jnp.zeros_like(image)
    py = jnp.zeros_like(image)
    px, py = jax.lax.fori_loop(0, num_iters, body, (px, py))
    return jnp.clip(image - weight * div(px, py), 0.0, 1.0)


class TVDenoise(nn.Module):
    weight: float = 0.1
    num_iters: int = 50

    @nn.compact
    def __call__(self, x):
        return {"enhanced": tv_denoise_image(x, self.weight, self.num_iters)}


@MODELS.register(name="tv_denoise", arch="tv_denoise",
                 tasks=(Task.DENOISE,), schemes=(Scheme.TRADITIONAL,))
def tv_denoise(weight: float = 0.1, num_iters: int = 50, **kwargs) -> Model:
    return Model(
        name="tv_denoise", arch="tv_denoise",
        module=TVDenoise(weight=weight, num_iters=num_iters),
        tasks=(Task.DENOISE,), schemes=(Scheme.TRADITIONAL,),
        required_inputs=("image",),
    )
