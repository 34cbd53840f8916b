"""Hiera trunk + FPN neck: the faithful SAM2 image encoder.

Rebuild of the reference's vendored SAM2 backbone
(mon_extra/vision/segment/sam2/sam2/modeling/backbones/hieradet.py:169
``Hiera``, image_encoder.py:44 ``FpnNeck``, position_encoding.py:16
``PositionEmbeddingSine``): a hierarchical ViT with

  * 7x7/4 overlapped patch embed (backbones/utils.py:66 PatchEmbed),
  * windowed absolute position embedding: a global "background" embedding
    bicubically interpolated to the token grid plus a tiled per-window
    embedding (hieradet.py:219-226, arXiv:2311.05613),
  * MultiScaleBlock (hieradet.py:83): windowed attention with fused qkv,
    q-maxpool 2x2 at the three stage transitions (tokens downsample inside
    attention), linear proj on the residual at dim changes, GELU MLP,
  * global attention at fixed block indices,
  * FPN neck: per-level 1x1 lateral convs to d_model, top-down nearest
    2x upsample fusion on configured levels only, sine position encodings
    per output level (image_encoder.py:102-134).

Released configs (sam2/configs/sam2/sam2_hiera_{t,s,b+,l}.yaml):

  t : embed 96, heads 1, stages (1,2,7,2),  global (5,7,9),   bkg 7x7
  s : embed 96, heads 1, stages (1,2,11,2), global (7,10,13), bkg 7x7
  b+: embed 112, heads 2, stages (2,3,16,3), global (12,16,20), bkg 14x14
  l : embed 144, heads 2, stages (2,6,36,4), global (23,33,43), bkg 7x7
      with window_spec (8,4,16,8)

All use window_spec (8,4,14,7) except large, q_stride (2,2), dim/head
mul 2.0, and an FPN with d_model 256, fpn_top_down_levels (2,3), nearest
interpolation, scalp 1 (lowest-res level dropped).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.ops.resize import resize_bicubic_torch


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws, ws, C), padded (backbones/utils.py:16)."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def window_unpartition(windows, ws: int, pad_hw, hw):
    """Inverse of :func:`window_partition` (backbones/utils.py:40)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // ws // ws)
    x = windows.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


class MultiScaleAttention(nn.Module):
    """hieradet.py:38: fused-qkv attention with optional q max-pooling."""
    dim_out: int
    heads: int
    q_pool: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        hd = self.dim_out // self.heads
        qkv = nn.Dense(self.dim_out * 3, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, hw, nh, hd)
        if self.q_pool:
            # maxpool 2x2 stride 2 on the q token grid (do_pool :24)
            q = q.reshape(b, h, w, self.heads * hd)
            q = nn.max_pool(q, (2, 2), strides=(2, 2))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.heads, hd)
        attn = jnp.einsum("bqnd,bknd->bnqk", q * hd ** -0.5, k)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnqk,bknd->bqnd", attn, v)
        out = out.reshape(b, h, w, self.dim_out)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(out)


class MultiScaleBlock(nn.Module):
    """hieradet.py:83: windowed/global block with stage-transition pooling."""
    dim: int
    dim_out: int
    heads: int
    window: int = 0          # 0 = global attention
    q_pool: bool = False     # stage transition: 2x2 maxpool on q + residual
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.dim != self.dim_out:
            s = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(y)
            if self.q_pool:
                s = nn.max_pool(s, (2, 2), strides=(2, 2))
            shortcut = s
        ws = self.window
        if ws > 0:
            h, w = y.shape[1:3]
            y, pad_hw = window_partition(y, ws)
        y = MultiScaleAttention(self.dim_out, self.heads, q_pool=self.q_pool,
                                dtype=self.dtype, name="attn")(y)
        if self.q_pool:
            # shapes changed inside attention (hieradet.py:149-156)
            ws = ws // 2
            if self.window > 0:
                h, w = shortcut.shape[1:3]
                pad_h = (ws - h % ws) % ws
                pad_w = (ws - w % ws) % ws
                pad_hw = (h + pad_h, w + pad_w)
        if self.window > 0:
            y = window_unpartition(y, ws, pad_hw, (h, w))
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(self.dim_out * self.mlp_ratio), dtype=self.dtype,
                     name="mlp1")(y)
        y = nn.Dense(self.dim_out, dtype=self.dtype,
                     name="mlp2")(nn.gelu(y, approximate=False))
        return x + y


class Hiera(nn.Module):
    """hieradet.py:169: the trunk. Returns per-stage-end features
    (highest to lowest resolution), channels (d, 2d, 4d, 8d)."""
    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    window_pos_bkg: Sequence[int] = (7, 7)
    q_pool: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.embed_dim
        y = nn.Conv(d, (7, 7), strides=(4, 4), padding=((3, 3), (3, 3)),
                    dtype=self.dtype, name="patch_embed")(x)
        b, h, w, _ = y.shape

        # windowed absolute pos embed (hieradet.py:219-226 _get_pos_embed):
        # bicubic-interpolated background + tiled first-stage-window embed
        bkg = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.window_pos_bkg[0], self.window_pos_bkg[1], d))
        win = self.param("pos_embed_window", nn.initializers.zeros,
                         (1, self.window_spec[0], self.window_spec[0], d))
        pos = resize_bicubic_torch(bkg.astype(jnp.float32), (h, w))
        reps = (1, -(-h // win.shape[1]), -(-w // win.shape[2]), 1)
        tiled = jnp.tile(win, reps)[:, :h, :w]
        y = y + (pos + tiled).astype(y.dtype)

        depth = sum(self.stages)
        stage_ends = [sum(self.stages[: i + 1]) - 1
                      for i in range(len(self.stages))]
        q_pool_blocks = [e + 1 for e in stage_ends[:-1]][: self.q_pool]
        dim, heads = d, self.num_heads
        cur_stage = 1
        outputs = []
        for i in range(depth):
            dim_out = dim
            # window size lags the stage by one block (hieradet.py:238-241)
            window = self.window_spec[cur_stage - 1]
            if i in tuple(self.global_att_blocks):
                window = 0
            if i - 1 in stage_ends:
                dim_out = dim * 2
                heads = heads * 2
                cur_stage += 1
            y = MultiScaleBlock(dim, dim_out, heads, window=window,
                                q_pool=i in q_pool_blocks, dtype=self.dtype,
                                name=f"block{i}")(y)
            dim = dim_out
            if i in stage_ends:
                outputs.append(y)
        return outputs


def sine_position_encoding(h: int, w: int, dim: int,
                           temperature: float = 10000.0):
    """position_encoding.py:16 PositionEmbeddingSine (normalize=True,
    scale 2*pi), returned NHWC."""
    num = dim // 2
    scale = 2 * np.pi
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    eps = 1e-6
    y_embed = y_embed / (h + eps) * scale
    x_embed = x_embed / (w + eps) * scale
    dim_t = jnp.arange(num, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num)
    pos_x = x_embed[..., None] / dim_t          # (1 broadcast h, w, num)
    pos_y = y_embed[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])],
                      axis=-1).reshape(1, w, num)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])],
                      axis=-1).reshape(h, 1, num)
    pos_x = jnp.broadcast_to(pos_x, (h, w, num))
    pos_y = jnp.broadcast_to(pos_y, (h, w, num))
    return jnp.concatenate([pos_y, pos_x], axis=-1)[None]  # (1, h, w, dim)


class FpnNeck(nn.Module):
    """image_encoder.py:44: lateral 1x1 convs + top-down nearest fusion on
    ``top_down_levels``; emits (features, sine position encodings) per
    level, highest resolution first."""
    d_model: int = 256
    backbone_channels: Sequence[int] = (768, 384, 192, 96)  # low-res first
    top_down_levels: Sequence[int] = (2, 3)
    interp: str = "nearest"
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        """xs: trunk outputs, HIGH resolution first (level 0..n)."""
        n = len(self.backbone_channels) - 1
        out = [None] * (n + 1)
        pos = [None] * (n + 1)
        prev = None
        for i in range(n, -1, -1):
            x = xs[i]
            lateral = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                              name=f"conv{n - i}")(x)
            if i in tuple(self.top_down_levels) and prev is not None:
                b, ph, pw, c = prev.shape
                if self.interp == "nearest":
                    up = jnp.repeat(jnp.repeat(prev, 2, axis=1), 2, axis=2)
                else:
                    up = jax.image.resize(prev.astype(jnp.float32),
                                          (b, ph * 2, pw * 2, c),
                                          "bilinear").astype(prev.dtype)
                prev = lateral + up
            else:
                prev = lateral
            out[i] = prev
            pos[i] = sine_position_encoding(prev.shape[1], prev.shape[2],
                                            self.d_model)
        return out, pos


class SAM2ImageEncoder(nn.Module):
    """image_encoder.py:14: trunk + neck; scalp drops the lowest-res
    level(s). Returns dict(vision_features, backbone_fpn, vision_pos_enc)."""
    embed_dim: int = 96
    num_heads: int = 1
    stages: Sequence[int] = (1, 2, 7, 2)
    global_att_blocks: Sequence[int] = (5, 7, 9)
    window_spec: Sequence[int] = (8, 4, 14, 7)
    window_pos_bkg: Sequence[int] = (7, 7)
    d_model: int = 256
    scalp: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        feats = Hiera(self.embed_dim, self.num_heads, self.stages,
                      self.global_att_blocks, self.window_spec,
                      self.window_pos_bkg, dtype=self.dtype, name="trunk")(x)
        channels = tuple(self.embed_dim * 2 ** i
                         for i in reversed(range(len(self.stages))))
        feats, pos = FpnNeck(self.d_model, channels, dtype=self.dtype,
                             name="neck")(feats)
        if self.scalp > 0:
            feats = feats[: len(feats) - self.scalp]
            pos = pos[: len(pos) - self.scalp]
        return {"vision_features": feats[-1], "backbone_fpn": feats,
                "vision_pos_enc": pos}


# Released trunk configs (sam2/configs/sam2/sam2_hiera_*.yaml)
HIERA_CONFIGS = {
    "t": dict(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2),
              global_att_blocks=(5, 7, 9), window_pos_bkg=(7, 7)),
    "s": dict(embed_dim=96, num_heads=1, stages=(1, 2, 11, 2),
              global_att_blocks=(7, 10, 13), window_pos_bkg=(7, 7)),
    "b+": dict(embed_dim=112, num_heads=2, stages=(2, 3, 16, 3),
               global_att_blocks=(12, 16, 20), window_pos_bkg=(14, 14)),
    "l": dict(embed_dim=144, num_heads=2, stages=(2, 6, 36, 4),
              global_att_blocks=(23, 33, 43), window_pos_bkg=(7, 7),
              window_spec=(8, 4, 16, 8)),
}
