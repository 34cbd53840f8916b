"""Swin Transformer t/s/b (reference vision/classify/swin, v1)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier
from enhax.nn.layers import WindowAttention, make_shift_attn_mask


class SwinBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        mask = None
        if self.shift:
            mask = make_shift_attn_mask(h, w, self.window, self.shift)
        y = nn.LayerNorm(name="norm1")(x)
        y = WindowAttention(self.dim, self.heads, self.window, shift=self.shift,
                            name="attn")(y, mask=mask)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp1")(y)
        y = nn.gelu(y, approximate=False)
        return x + nn.Dense(self.dim, name="mlp2")(y)


class Swin(nn.Module):
    dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 7
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (4, 4), strides=(4, 4), name="embed")(x)
        y = nn.LayerNorm(name="embed_norm")(y)
        for i, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            dim = self.dim * 2**i
            if i > 0:
                # patch merging
                n, h, w, c = y.shape
                # torch PatchMerging concat order [x0,x1,x2,x3] =
                # (dh0dw0, dh1dw0, dh0dw1, dh1dw1): flatten (dw, dh, c)
                y = y.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
                y = y.reshape(n, h // 2, w // 2, 4 * c)
                y = nn.LayerNorm(name=f"merge_norm{i}")(y)
                y = nn.Dense(dim, use_bias=False, name=f"merge{i}")(y)
            for j in range(depth):
                shift = self.window // 2 if j % 2 == 1 else 0
                y = SwinBlock(dim, heads, self.window, shift,
                              name=f"block{i}_{j}")(y)
        y = nn.LayerNorm(name="norm")(y)
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="head")(y)}


for _name, (_dim, _depths) in {
    "swin_t": (96, (2, 2, 6, 2)),
    "swin_s": (96, (2, 2, 18, 2)),
    "swin_b": (128, (2, 2, 18, 2)),
}.items():
    def _builder(num_classes: int = 1000, window: int = 7, dim=_dim,
                 depths=_depths, nm=_name, **kwargs):
        heads = tuple(dim * 2**i // 32 for i in range(4))
        return make_classifier(nm, "swin",
                               Swin(dim=dim, depths=depths, heads=heads,
                                    window=window, num_classes=num_classes),
                               size_divisor=window * 32)
    MODELS.register(name=_name, obj=_builder, arch="swin",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))


class WindowAttentionV2(nn.Module):
    """torchvision ShiftedWindowAttentionV2: cosine attention with a
    learned per-head logit scale (clamped at log(100)), continuous
    position bias from a 2->512->heads MLP over log-scaled relative
    coords (16*sigmoid), and qkv bias on q/v only."""
    dim: int
    heads: int
    window: int
    shift: int = 0

    @nn.compact
    def __call__(self, x, mask=None):
        import numpy as np

        n, h, w, c = x.shape
        ws = self.window
        if self.shift:
            x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
        nh, nw = h // ws, w // ws
        xw = x.reshape(n, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(n * nh * nw, ws * ws, c)

        hd = self.dim // self.heads
        # torchvision keeps the full 3*dim qkv bias PARAM and only
        # zero-initializes the k section (ShiftedWindowAttentionV2.__init__)
        qkv = nn.Dense(self.dim * 3, name="qkv")(xw)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_of(t):
            return t.reshape(t.shape[0], t.shape[1], self.heads,
                             hd).transpose(0, 2, 1, 3)

        q, k, v = heads_of(q), heads_of(k), heads_of(v)
        qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        logit_scale = self.param("logit_scale",
                                 nn.initializers.constant(float(np.log(10.0))),
                                 (self.heads, 1, 1))
        scale = jnp.exp(jnp.minimum(logit_scale, float(np.log(100.0))))
        attn = jnp.einsum("bhqd,bhkd->bhqk", qn, kn) * scale[None]

        # continuous position bias: log-scaled relative coords -> MLP
        rng_ = np.arange(-(ws - 1), ws, dtype=np.float32)
        table = np.stack(np.meshgrid(rng_, rng_, indexing="ij"),
                         axis=-1).reshape(-1, 2)            # ((2ws-1)^2, 2)
        table = table / max(ws - 1, 1) * 8.0
        table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8.0)
        cpb = nn.Dense(512, name="cpb1")(jnp.asarray(table))
        cpb = nn.Dense(self.heads, use_bias=False, name="cpb2")(nn.relu(cpb))
        rel = 16.0 * jax.nn.sigmoid(cpb)
        coords = jnp.stack(jnp.meshgrid(jnp.arange(ws), jnp.arange(ws),
                                        indexing="ij"))
        flat = coords.reshape(2, -1)
        diff = flat[:, :, None] - flat[:, None, :] + (ws - 1)
        idx = diff[0] * (2 * ws - 1) + diff[1]
        attn = attn + rel[idx].transpose(2, 0, 1)[None]

        if self.shift and mask is not None:
            nwins = nh * nw
            attn = attn.reshape(n, nwins, self.heads, ws * ws, ws * ws)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(n * nwins, self.heads, ws * ws, ws * ws)

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(xw.shape[0], ws * ws, self.dim)
        out = nn.Dense(self.dim, name="proj")(out)
        out = out.reshape(n, nh, nw, ws, ws, self.dim).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(n, h, w, self.dim)
        if self.shift:
            out = jnp.roll(out, shift=(self.shift, self.shift), axis=(1, 2))
        return out


class SwinV2Block(SwinBlock):
    """Swin v2 (torchvision SwinTransformerV2): post-norm residuals +
    cosine attention with CPB-MLP relative bias."""

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        mask = None
        if self.shift:
            mask = make_shift_attn_mask(h, w, self.window, self.shift)
        y = WindowAttentionV2(self.dim, self.heads, self.window,
                              shift=self.shift, name="attn")(x, mask=mask)
        x = x + nn.LayerNorm(name="norm1")(y)   # post-norm (v2)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp2")(y)
        return x + nn.LayerNorm(name="norm2")(y)


class SwinV2(Swin):
    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.dim, (4, 4), strides=(4, 4), name="embed")(x)
        y = nn.LayerNorm(name="embed_norm")(y)
        for i, (depth, heads) in enumerate(zip(self.depths, self.heads)):
            dim = self.dim * 2**i
            if i > 0:
                n, h, w, c = y.shape
                # torch PatchMerging concat order [x0,x1,x2,x3] =
                # (dh0dw0, dh1dw0, dh0dw1, dh1dw1): flatten (dw, dh, c)
                y = y.reshape(n, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 4, 2, 5)
                y = y.reshape(n, h // 2, w // 2, 4 * c)
                # PatchMergingV2: reduction Linear first, norm on 2c after
                y = nn.Dense(dim, use_bias=False, name=f"merge{i}")(y)
                y = nn.LayerNorm(name=f"merge_norm{i}")(y)
            for j in range(depth):
                shift = self.window // 2 if j % 2 == 1 else 0
                y = SwinV2Block(dim, heads, self.window, shift,
                                name=f"block{i}_{j}")(y)
        y = nn.LayerNorm(name="norm")(y)
        y = jnp.mean(y, axis=(-3, -2))
        return {"logits": nn.Dense(self.num_classes, name="head")(y)}


for _name, (_dim, _depths) in {"swin_v2_t": (96, (2, 2, 6, 2)),
                               "swin_v2_s": (96, (2, 2, 18, 2)),
                               "swin_v2_b": (128, (2, 2, 18, 2))}.items():
    def _builder_v2(num_classes: int = 1000, window: int = 8, dim=_dim,
                    depths=_depths, nm=_name, **kwargs):
        heads = tuple(dim * 2**i // 32 for i in range(4))
        return make_classifier(nm, "swin",
                               SwinV2(dim=dim, depths=depths, heads=heads,
                                      window=window, num_classes=num_classes),
                               size_divisor=window * 32)
    MODELS.register(name=_name, obj=_builder_v2, arch="swin",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
