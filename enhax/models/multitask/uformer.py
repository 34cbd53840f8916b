"""Uformer: U-shaped window-attention transformer for restoration.

Faithful rebuild of the reference's first-party Uformer
(vision/enhance/multitask/uformer/uformer.py:702-1260):

  * LeWin blocks: LayerNorm(eps 1e-5) -> window MSA with relative
    position bias and split q/kv projections (LinearProjection,
    projection.py:88-124) -> LayerNorm -> LeFF (linear-GELU-dwconv3x3-
    GELU-linear, :251-302). Shifted windows on odd blocks; a block whose
    resolution <= window size drops the shift and shrinks the window to
    the resolution (:419-421).
  * 4-level UNet: conv4x4/s2 token downsampling (scale.py:118-135),
    deconv2x2/s2 upsampling (:298-315), skip concat, 3x3 input proj with
    LeakyReLU(0.01) and 3x3 output proj, global residual (:1095-1100).
  * decoder layers of the t/s/b/noshift/fastleff variants carry a
    learned per-window modulator embedding (:426, :556; modulator=True
    in every variant subclass, :1106-1260).
  * fastleff (:91-136) keeps the depthwise conv (DWConv2d ==
    depthwise Conv2d, dsconv.py:227) — computationally identical to
    LeFF, so both flags share one implementation here.

Loss: Charbonnier (multitask default).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import (DWConv3x3, WindowAttention,
                             make_shift_attn_mask)


class LeFF(nn.Module):
    """Locally-enhanced feed-forward: linear -> GELU -> dwconv3x3 ->
    GELU -> linear (uformer.py:251-302; exact GELU)."""
    dim: int
    mult: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.mult
        y = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = DWConv3x3(hidden, dtype=self.dtype, name="dwconv")(y)
        y = jax.nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)


class LeWinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    mult: int = 4
    use_modulator: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        # uformer.py:419-421: shrink window / drop shift at tiny resolutions
        ws, shift = self.window_size, self.shift
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        mask = None
        if shift:
            mask = make_shift_attn_mask(h, w, ws, shift)
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        y = WindowAttention(self.dim, self.num_heads, ws, shift=shift,
                            split_qkv=True, use_modulator=self.use_modulator,
                            dtype=self.dtype, name="attn")(y, mask=mask)
        x = x + y
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        return x + LeFF(self.dim, self.mult, dtype=self.dtype, name="ffn")(y)


class UformerModule(nn.Module):
    dim: int = 32
    depths: Sequence[int] = (2, 2, 2, 2, 2, 2, 2, 2, 2)  # enc0..3, mid, dec3..0
    num_heads: Sequence[int] = (1, 2, 4, 8, 16, 16, 8, 4, 2)
    window_size: int = 8
    use_shift: bool = True
    modulator: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x
        d = self.dim
        ws = self.window_size
        y = nn.Conv(d, (3, 3), dtype=self.dtype, name="input_proj")(x)
        y = nn.leaky_relu(y, 0.01)  # torch LeakyReLU default slope

        def stage(y, dim, heads, depth, name, use_mod=False):
            for j in range(depth):
                shift = ws // 2 if (self.use_shift and j % 2 == 1) else 0
                y = LeWinBlock(dim, heads, ws, shift=shift,
                               use_modulator=use_mod, dtype=self.dtype,
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
                                 dtype=self.dtype, name=f"up{lvl}",
                                 transpose_kernel=True)(y)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            y = stage(y, d * 2**(lvl + 1), self.num_heads[5 + i],
                      self.depths[5 + i], f"dec{lvl}",
                      use_mod=self.modulator)

        out = nn.Conv(3, (3, 3), dtype=self.dtype, name="output_proj")(y)
        return {"enhanced": out + inp}


def _charb_loss():
    c = LOSSES.build("charbonnier_loss")

    def fn(outputs, datapoint):
        return c(outputs["enhanced"], datapoint["ref_image"])
    return fn


def _make_uformer(name, dim, depths, use_shift=True, modulator=True):
    return Model(
        name=name, arch="uformer",
        module=UformerModule(dim=dim, depths=depths, use_shift=use_shift,
                             modulator=modulator),
        tasks=(Task.DENOISE, Task.DEBLUR, Task.DERAIN),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_charb_loss(),
        required_inputs=("image",),
        size_divisor=128,  # 4 downs x window 8
    )


@MODELS.register(name="uformer_re", arch="uformer", aliases=["uformer"],
                 tasks=(Task.DENOISE, Task.DEBLUR), schemes=(Scheme.SUPERVISED,))
def uformer_re(dim: int = 32, modulator: bool = False,
               depths=(2, 2, 2, 2, 2, 2, 2, 2, 2), use_shift: bool = True,
               **kwargs) -> Model:
    return _make_uformer("uformer_re", dim, tuple(depths),
                         use_shift=use_shift, modulator=modulator)


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
    # uformer.py:1180-1203: fastleff variant = depths [1,2,8,8,2,8,8,2,1];
    # FastLeFF is computationally identical to LeFF (see module docstring)
    return _make_uformer("uformer_fastleff", 32, (1, 2, 8, 8, 2, 8, 8, 2, 1))
