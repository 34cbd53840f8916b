"""LLLiNet: UNet++-style supervised LLIE with learnable-ratio IN + SimAM.

Faithful rebuild of reference ``vision/enhance/llie/lllinet/lllinet.py``:

  * ``UNetConvBlock`` (:97-152): conv + LearnableInstanceNorm2d (a
    per-channel learnable blend ``x_norm*r + x*(1-r)``,
    normalization.py:177-219; identity in the stem block) + lrelu +
    parameter-free SimAM attention (attention.py:1156-1181), a second
    conv, concat with a 1x1 shortcut of the input, two more convs, and
    a 1x1 gated residual of the concat.
  * a UNet++-like topology (:232-259) whose inner nodes ALSO receive
    the upsampled previous-column feature of the level below (e.g.
    ``conv2_1`` sees ``[x2_0, up(x3_0), up(x3_1)]``); bilinear
    align_corners=True upsampling; clamp[0,1] head.
  * ``lllinet_hvi`` (:263-392): the same net run in HVI space (learnable
    density_k) with an HVI->RGB head.

Loss (:32-95): supervised mix incl. SSIM/perceptual terms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.color import hvi_to_rgb, rgb_to_hvi
from enhax.ops.resize import resize_align_corners

_FILTERS = (32, 64, 128, 256, 512)


class LearnableInstanceNorm(nn.Module):
    """normalization.py:177-219: blend IN(x) and x with learnable r."""
    features: int
    r_init: float = 0.5
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        r = self.param("r", nn.initializers.constant(self.r_init),
                       (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        xn = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return xn * r + x * (1.0 - r)


def simam(x, e_lambda: float = 1e-4):
    """SimAM attention (attention.py:1156-1181), parameter-free."""
    h, w = x.shape[-3], x.shape[-2]
    n = h * w - 1
    d = (x - jnp.mean(x, axis=(-3, -2), keepdims=True)) ** 2
    v = jnp.sum(d, axis=(-3, -2), keepdims=True) / n
    e_inv = d / (4.0 * (v + e_lambda)) + 0.5
    return x * jax.nn.sigmoid(e_inv)


class UNetConvBlock(nn.Module):
    """lllinet.py:97-152."""
    features: int
    relu_slope: float = 0.2
    use_in: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        lrelu = lambda t: nn.leaky_relu(t, self.relu_slope)  # noqa: E731
        x1 = nn.Conv(cin, (3, 3), name="conv1")(x)
        if self.use_in:
            x1 = LearnableInstanceNorm(cin, name="norm1")(x1)
        x1 = simam(lrelu(x1))
        x2 = nn.Conv(cin, (3, 3), name="conv2")(x1)
        x3 = jnp.concatenate([x2, nn.Conv(cin, (1, 1), name="conv1_3")(x)],
                             axis=-1)
        x3_4 = nn.Conv(self.features, (1, 1), name="conv3_4")(x3)
        x3 = lrelu(nn.Conv(self.features, (3, 3), name="conv3")(x3))
        x4 = lrelu(nn.Conv(self.features, (3, 3), name="conv4")(x3))
        return x4 + x3_4


class LLLiNetModule(nn.Module):
    use_hvi: bool = False
    density_k: float = 0.2
    filters: tuple = _FILTERS  # reference hard-codes (32,64,128,256,512)

    @nn.compact
    def __call__(self, x):
        f = self.filters
        blk = lambda feats, name, use_in=True: UNetConvBlock(  # noqa: E731
            feats, use_in=use_in, name=name)
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))  # noqa: E731
        up = lambda t: resize_align_corners(  # noqa: E731
            t, (t.shape[-3] * 2, t.shape[-2] * 2))
        cat = lambda ts: jnp.concatenate(ts, axis=-1)  # noqa: E731

        inp = x
        kv = None
        if self.use_hvi:
            k = self.param("density_k",
                           nn.initializers.constant(self.density_k), (1,))
            kv = k[0]
            x = rgb_to_hvi(x, density_k=kv)

        x0_0 = blk(f[0], "x00", use_in=False)(x)
        x1_0 = blk(f[1], "x10")(pool(x0_0))
        x2_0 = blk(f[2], "x20")(pool(x1_0))
        x3_0 = blk(f[3], "x30")(pool(x2_0))
        x4_0 = blk(f[4], "x40")(pool(x3_0))

        x3_1 = blk(f[3], "x31")(cat([x3_0, up(x4_0)]))
        x2_1 = blk(f[2], "x21")(cat([x2_0, up(x3_0), up(x3_1)]))
        x1_1 = blk(f[1], "x11")(cat([x1_0, up(x2_0), up(x2_1)]))
        x0_1 = blk(f[0], "x01")(cat([x0_0, up(x1_0), up(x1_1)]))

        x2_2 = blk(f[2], "x22")(cat([x2_0, x2_1, up(x3_1)]))
        x1_2 = blk(f[1], "x12")(cat([x1_0, x1_1, up(x2_1), up(x2_2)]))
        x0_2 = blk(f[0], "x02")(cat([x0_0, x0_1, up(x1_1), up(x1_2)]))

        x1_3 = blk(f[1], "x13")(cat([x1_0, x1_1, x1_2, up(x2_2)]))
        x0_3 = blk(f[0], "x03")(cat([x0_0, x0_1, x0_2, up(x1_2), up(x1_3)]))

        x0_4 = blk(f[0], "x04")(cat([x0_0, x0_1, x0_2, x0_3, up(x1_3)]))
        y = nn.Conv(3, (1, 1), name="final")(x0_4)
        if self.use_hvi:
            y = hvi_to_rgb(y, density_k=kv)
        y = jnp.clip(y, 0.0, 1.0)
        out = {"enhanced": y}
        if self.use_hvi:
            out["hvi"] = rgb_to_hvi(inp, density_k=kv)
        return out


def _lllinet_loss():
    l1 = LOSSES.build("l1_loss")
    ssim_l = LOSSES.build("ssim_loss")

    def fn(outputs, datapoint):
        p, t = outputs["enhanced"], datapoint["ref_image"]
        return l1(p, t) + 0.5 * ssim_l(p, t)
    return fn


@MODELS.register(name="lllinet", arch="lllinet",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def lllinet(filters=_FILTERS, **kwargs) -> Model:
    return Model(
        name="lllinet", arch="lllinet",
        module=LLLiNetModule(filters=tuple(filters)),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_lllinet_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )


@MODELS.register(name="lllinet_hvi", arch="lllinet",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def lllinet_hvi(filters=_FILTERS, **kwargs) -> Model:
    return Model(
        name="lllinet_hvi", arch="lllinet",
        module=LLLiNetModule(use_hvi=True, filters=tuple(filters)),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_lllinet_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
