"""Uformer: U-shaped window-attention transformer for restoration.

Rebuild of the reference's first-party Uformer re-implementation
(vision/enhance/multitask/uformer/uformer.py:701-1203, variants t/s/b and
noshift): LeWin blocks (window MSA + locally-enhanced FFN with a depthwise
conv) in a 4-level UNet with conv down/up-sampling. Shifted windows on odd
blocks (disabled for the ``noshift`` variant).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import WindowAttention, make_shift_attn_mask


class LeFF(nn.Module):
    """Locally-enhanced feed-forward: linear -> dwconv3x3 -> linear.

    ``fast=True`` is the reference's fastleff variant (uformer.py fastleff):
    the depthwise conv is dropped, leaving a plain MLP."""
    dim: int
    mult: int = 4
    fast: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.mult
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y)
        if not self.fast:
            y = nn.Conv(hidden, (3, 3), feature_group_count=hidden,
                        dtype=self.dtype, name="dwconv")(y)
            y = jax.nn.gelu(y)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class LeWinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    mult: int = 4
    fast_leff: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        mask = None
        if self.shift:
            mask = make_shift_attn_mask(h, w, self.window_size, self.shift)
        y = nn.LayerNorm(name="norm1")(x)
        y = WindowAttention(self.dim, self.num_heads, self.window_size,
                            shift=self.shift, dtype=self.dtype, name="attn")(y, mask=mask)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        return x + LeFF(self.dim, self.mult, fast=self.fast_leff,
                        dtype=self.dtype, name="ffn")(y)


class UformerModule(nn.Module):
    dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)  # enc0..3, mid, dec3..0
    num_heads: Sequence[int] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    window_size: int = 8
    use_shift: bool = True
    fast_leff: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x
        d = self.dim
        ws = self.window_size
        y = nn.Conv(d, (3, 3), dtype=self.dtype, name="input_proj")(x)
        y = nn.leaky_relu(y, 0.2)

        def stage(y, dim, heads, depth, name):
            for j in range(depth):
                shift = ws // 2 if (self.use_shift and j % 2 == 1) else 0
                y = LeWinBlock(dim, heads, ws, shift=shift,
                               fast_leff=self.fast_leff, dtype=self.dtype,
                               name=f"{name}_{j}")(y)
            return y

        skips = []
        for lvl in range(4):
            y = stage(y, d * 2**lvl, self.num_heads[lvl], self.depths[lvl],
                      f"enc{lvl}")
            skips.append(y)
            y = nn.Conv(d * 2**(lvl + 1), (4, 4), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"down{lvl}")(y)

        y = stage(y, d * 16, self.num_heads[4], self.depths[4], "mid")

        for i, lvl in enumerate(reversed(range(4))):
            y = nn.ConvTranspose(d * 2**lvl, (2, 2), strides=(2, 2),
                                 dtype=self.dtype, name=f"up{lvl}", transpose_kernel=True)(y)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            y = stage(y, d * 2**(lvl + 1), self.num_heads[5 + i],
                      self.depths[5 + i], f"dec{lvl}")

        out = nn.Conv(3, (3, 3), dtype=self.dtype, name="output_proj")(y)
        return {"enhanced": out + inp}


def _charb_loss():
    c = LOSSES.build("charbonnier_loss")

    def fn(outputs, datapoint):
        return c(outputs["enhanced"], datapoint["ref_image"])
    return fn


def _make_uformer(name, dim, depths, use_shift=True, fast_leff=False):
    return Model(
        name=name, arch="uformer",
        module=UformerModule(dim=dim, depths=depths, use_shift=use_shift,
                             fast_leff=fast_leff),
        tasks=(Task.DENOISE, Task.DEBLUR, Task.DERAIN),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_charb_loss(),
        required_inputs=("image",),
        size_divisor=128,  # 4 downs x window 8
    )


@MODELS.register(name="uformer_re", arch="uformer", aliases=["uformer"],
                 tasks=(Task.DENOISE, Task.DEBLUR), schemes=(Scheme.SUPERVISED,))
def uformer_re(dim: int = 32, **kwargs) -> Model:
    return _make_uformer("uformer_re", dim, (2, 2, 2, 2, 2, 2, 2, 2, 2))


@MODELS.register(name="uformer_t", arch="uformer",
                 tasks=(Task.DENOISE,), schemes=(Scheme.SUPERVISED,))
def uformer_t(**kwargs) -> Model:
    return _make_uformer("uformer_t", 16, (2, 2, 2, 2, 2, 2, 2, 2, 2))


@MODELS.register(name="uformer_s", arch="uformer",
                 tasks=(Task.DENOISE,), schemes=(Scheme.SUPERVISED,))
def uformer_s(**kwargs) -> Model:
    return _make_uformer("uformer_s", 32, (2, 2, 2, 2, 2, 2, 2, 2, 2))


@MODELS.register(name="uformer_b", arch="uformer",
                 tasks=(Task.DENOISE,), schemes=(Scheme.SUPERVISED,))
def uformer_b(**kwargs) -> Model:
    return _make_uformer("uformer_b", 32, (1, 2, 8, 8, 2, 8, 8, 2, 1))


@MODELS.register(name="uformer_noshift", arch="uformer",
                 tasks=(Task.DENOISE,), schemes=(Scheme.SUPERVISED,))
def uformer_noshift(**kwargs) -> Model:
    return _make_uformer("uformer_noshift", 32, (2, 2, 2, 2, 2, 2, 2, 2, 2),
                         use_shift=False)


@MODELS.register(name="uformer_fastleff", arch="uformer",
                 tasks=(Task.DENOISE,), schemes=(Scheme.SUPERVISED,))
def uformer_fastleff(**kwargs) -> Model:
    return _make_uformer("uformer_fastleff", 32, (2, 2, 2, 2, 2, 2, 2, 2, 2),
                         fast_leff=True)
