"""AdaIR: adaptive all-in-one restoration via frequency mining/modulation.

Native rebuild of the reference's vendored AdaIR
(mon_extra/vision/enhance/multitask/adair/net/model.py:372-475;
EXTRA_MODELS "adair"): a Restormer backbone (reuses enhax's
parity-tested MDTA/GDFN ``RestormerBlock``) with three ``FreModule``
frequency-learning blocks injected after the latent and the level-3/2
decoders (model.py:443-463):

  * fft split (model.py:337-366): a learned per-image rate (sigmoid of
    a 1x1 MLP on GAP) sets a centered low-frequency box of half-size
    ``int(h//128 * rate)`` in the fft-shifted spectrum (norm='forward');
    low/high parts are |ifft| magnitudes.
  * both parts cross-attend with the backbone feature via channel-wise
    cross attention (q from one, kv from the other, model.py:173-213),
    are fused by spatial/channel gates (FreRefine, model.py:269-285),
    and modulate the feature: out*para1 + y*para2 (zeros/ones init).

The dynamic mask is built with arange comparisons so the graph stays
static-shape under jit (the vendored code uses a Python slice loop over
the batch, model.py:345-349).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.multitask.restormer import RestormerBlock
from enhax.nn.layers import (DWConv3x3, conv1x1, pixel_shuffle,
                             pixel_unshuffle)
from enhax.ops.resize import resize


class _ChannelCrossAttention(nn.Module):
    """model.py:173-213 — q from x, kv from y, CxC transposed attn."""
    dim: int
    num_heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, y):
        n, h, w, c = x.shape
        d = self.dtype
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        q = conv1x1(c, use_bias=False, dtype=d, name="q")(x)
        q = DWConv3x3(c, use_bias=False, dtype=d, name="q_dw")(q)
        kv = conv1x1(c * 2, use_bias=False, dtype=d, name="kv")(y)
        kv = DWConv3x3(c * 2, use_bias=False, dtype=d, name="kv_dw")(kv)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(n, h * w, self.num_heads, hd).transpose(
                0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        attn = jax.nn.softmax(
            jnp.einsum("nhcp,nhdp->nhcd", q, k) * temperature, axis=-1)
        out = jnp.einsum("nhcd,nhdp->nhcp", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(n, h, w, c)
        return conv1x1(c, use_bias=False, dtype=d,
                       name="project_out")(out)


class _FreRefine(nn.Module):
    """model.py:269-285 spatial/channel gated fusion."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, low, high):
        d = self.dtype
        mx = jnp.max(high, axis=-1, keepdims=True)
        mean = jnp.mean(high, axis=-1, keepdims=True)
        sw = nn.sigmoid(nn.Conv(1, (7, 7), use_bias=False, dtype=d,
                                name="sg_conv")(
            jnp.concatenate([mx, mean], axis=-1)))
        cg1 = conv1x1(max(self.dim // 16, 1), use_bias=False,
                      dtype=d, name="cg1")
        cg2 = conv1x1(self.dim, use_bias=False, dtype=d, name="cg2")
        mlp = lambda t: cg2(nn.relu(cg1(t)))  # noqa: E731 (shared weights)
        avg = jnp.mean(low, axis=(-3, -2), keepdims=True)
        mxp = jnp.max(low, axis=(-3, -2), keepdims=True)
        cw = nn.sigmoid(mlp(avg) + mlp(mxp))
        return conv1x1(self.dim, dtype=d,
                       name="proj")(low * sw + high * cw)


class _FreModule(nn.Module):
    """model.py:289-366 adaptive frequency learning block."""
    dim: int
    num_heads: int
    n: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, img, y):
        d = self.dtype
        h, w = y.shape[-3], y.shape[-2]
        x = resize(img, (h, w), method="bilinear")
        # fft split (model.py:337-366)
        z = nn.Conv(self.dim, (3, 3), use_bias=False, dtype=d,
                    name="conv1")(x)
        thr = jnp.mean(z, axis=(-3, -2), keepdims=True)
        thr = conv1x1(max(self.dim // 8, 1), use_bias=False,
                      dtype=d, name="rate1")(thr)
        thr = conv1x1(2, use_bias=False, dtype=d,
                      name="rate2")(jax.nn.gelu(thr, approximate=False))
        thr = nn.sigmoid(thr)[:, 0, 0, :]  # (B, 2)
        h_ = ((h // self.n) * thr[:, 0]).astype(jnp.int32)
        w_ = ((w // self.n) * thr[:, 1]).astype(jnp.int32)
        rows = jnp.arange(h)[None, :]
        cols = jnp.arange(w)[None, :]
        rmask = ((rows >= h // 2 - h_[:, None])
                 & (rows < h // 2 + h_[:, None]))
        cmask = ((cols >= w // 2 - w_[:, None])
                 & (cols < w // 2 + w_[:, None]))
        mask = (rmask[:, :, None] & cmask[:, None, :])[..., None]
        mask = mask.astype(z.dtype)
        f = jnp.fft.fft2(z, axes=(-3, -2), norm="forward")
        f = jnp.roll(f, (h // 2, w // 2), axis=(-3, -2))  # shift
        unshift = lambda t: jnp.roll(t, (-(h // 2), -(w // 2)),  # noqa: E731
                                     axis=(-3, -2))
        high = jnp.abs(jnp.fft.ifft2(unshift(f * (1 - mask)), axes=(-3, -2),
                                     norm="forward")).astype(z.dtype)
        low = jnp.abs(jnp.fft.ifft2(unshift(f * mask), axes=(-3, -2),
                                    norm="forward")).astype(z.dtype)

        cca = lambda name: _ChannelCrossAttention(  # noqa: E731
            self.dim, self.num_heads, dtype=d, name=name)
        high_f = cca("cross_l")(high, y)
        low_f = cca("cross_h")(low, y)
        agg = _FreRefine(self.dim, dtype=d, name="refine")(low_f, high_f)
        out = cca("cross_agg")(y, agg)
        para1 = self.param("para1", nn.initializers.zeros, (self.dim,))
        para2 = self.param("para2", nn.initializers.ones, (self.dim,))
        return out * para1 + y * para2


class AdaIRModule(nn.Module):
    dim: int = 48
    num_blocks: Sequence[int] = (4, 6, 6, 8)
    num_refinement: int = 4
    heads: Sequence[int] = (1, 2, 4, 8)
    expansion: float = 2.66
    decoder: bool = True
    fre_n: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inp = x
        d = self.dim
        dt = self.dtype
        y = nn.Conv(d, (3, 3), use_bias=False, dtype=dt, name="embed")(x)
        skips = []
        for lvl in range(3):
            for j in range(self.num_blocks[lvl]):
                y = RestormerBlock(d * 2 ** lvl, self.heads[lvl],
                                   self.expansion, dtype=dt,
                                   name=f"enc{lvl}_{j}")(y)
            skips.append(y)
            y = nn.Conv(d * 2 ** lvl // 2, (3, 3), use_bias=False, dtype=dt,
                        name=f"down{lvl}")(y)
            y = pixel_unshuffle(y, 2)
        for j in range(self.num_blocks[3]):
            y = RestormerBlock(d * 8, self.heads[3], self.expansion,
                               dtype=dt, name=f"latent_{j}")(y)
        if self.decoder:
            y = _FreModule(d * 8, self.heads[2], n=self.fre_n, dtype=dt,
                           name="fre1")(inp, y)
        for lvl in reversed(range(3)):
            y = nn.Conv(d * 2 ** (lvl + 1) * 2, (3, 3), use_bias=False,
                        dtype=dt, name=f"up{lvl}")(y)
            y = pixel_shuffle(y, 2)
            y = jnp.concatenate([y, skips[lvl]], axis=-1)
            if lvl == 0:
                ch = d * 2
            else:
                ch = d * 2 ** lvl
                y = conv1x1(ch, use_bias=False, dtype=dt,
                            name=f"reduce{lvl}")(y)
            for j in range(self.num_blocks[lvl]):
                y = RestormerBlock(ch, self.heads[lvl], self.expansion,
                                   dtype=dt, name=f"dec{lvl}_{j}")(y)
            if self.decoder and lvl > 0:
                y = _FreModule(ch, self.heads[2], n=self.fre_n, dtype=dt,
                               name=f"fre{4 - lvl}")(inp, y)
        for j in range(self.num_refinement):
            y = RestormerBlock(d * 2, self.heads[0], self.expansion,
                               dtype=dt, name=f"refine_{j}")(y)
        out = nn.Conv(3, (3, 3), use_bias=False, dtype=dt, name="output")(y)
        return {"enhanced": out + inp}


def _l1_loss():
    def fn(outputs, datapoint):
        target = datapoint.get("ref_image", datapoint["image"])
        return jnp.mean(jnp.abs(outputs["enhanced"] - target))
    return fn


@MODELS.register(name="adair", arch="adair",
                 tasks=(Task.DENOISE, Task.DERAIN, Task.DEHAZE,
                        Task.DEBLUR, Task.LLIE),
                 schemes=(Scheme.SUPERVISED,))
def adair(dim: int = 48, num_blocks=(4, 6, 6, 8), num_refinement: int = 4,
          heads=(1, 2, 4, 8), expansion: float = 2.66, decoder: bool = True,
          fre_n: int = 128, **kwargs) -> Model:
    return Model(
        name="adair", arch="adair",
        module=AdaIRModule(dim=dim, num_blocks=tuple(num_blocks),
                           num_refinement=num_refinement,
                           heads=tuple(heads), expansion=expansion,
                           decoder=decoder, fre_n=fre_n),
        tasks=(Task.DENOISE, Task.DERAIN, Task.DEHAZE, Task.DEBLUR,
               Task.LLIE),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_l1_loss(),
        required_inputs=("image",),
        size_divisor=8,
    )
