"""Depth Anything V2 (vits/b/l/g): DINOv2 ViT encoder + DPT head.

Faithful rebuild of the reference's vendored Depth Anything V2
(mon_extra/vision/depth/depth_anything_v2/depth_anything_v2/dpt.py +
dinov2.py + util/blocks.py; first-party per-model configs at
vision/depth/depth_anything_v2/depth_anything_v2.py:72-148):

  * DINOv2 trunk: 14px patches, cls token, LayerScale blocks
    (init_values 1.0); the 37x37 (518px) position embedding is
    bicubically interpolated to other grids with the upstream +0.1
    scale-factor offset (dinov2.py:179-210); intermediate taps pass
    through the SHARED final LayerNorm (get_intermediate_layers,
    norm=True).
  * DPT head (dpt.py:38-151): per-tap 1x1 projections to the per-model
    pyramid widths, resize layers (deconv x4, deconv x2, identity,
    stride-2 conv), 3x3 no-bias scratch convs, four fusion blocks
    (two ResidualConvUnits each, bilinear align_corners=True upsample
    to the NEXT pyramid size, 1x1 out conv), then conv -> upsample to
    14*patches -> conv-ReLU-conv-ReLU head; final relu.

Per-model configs: vits (64, [48,96,192,384]), vitb (128,
[96,192,384,768]), vitl (256, [256,512,1024,1024]).

Inference-oriented (Scheme.INFERENCE), used to precompute the ``depth``
modality for the depth-aware LLIE models (DEPTH_DATA_SOURCES).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.depth.depth_pro import _ViTBlock
from enhax.ops.resize import resize_bicubic_torch


def _resize_ac(x, size):
    """Bilinear align_corners=True (DPT convention)."""
    from enhax.ops.resize import resize_align_corners
    return resize_align_corners(x, size)


class DinoV2(nn.Module):
    """dinov2.py DinoVisionTransformer (no registers, block_chunks=0)."""
    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 14
    pos_grid: int = 37          # 518 / 14
    out_indices: Sequence[int] = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        ph, pw = h // self.patch, w // self.patch
        y = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(x)
        y = y.reshape(b, ph * pw, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pos_grid ** 2 + 1, self.dim))
        if (ph, pw) != (self.pos_grid, self.pos_grid) or ph != pw:
            # dinov2.py:179-210 interpolate_pos_encoding (+0.1 offset)
            n0 = self.pos_grid
            grid = pos[:, 1:].reshape(1, n0, n0, self.dim)
            sf = ((ph + 0.1) / n0, (pw + 0.1) / n0)
            grid = resize_bicubic_torch(grid, (ph, pw), scale_factor=sf)
            pos = jnp.concatenate([pos[:, :1],
                                   grid.reshape(1, ph * pw, self.dim)], 1)
        y = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), y], 1)
        y = y + pos
        norm = nn.LayerNorm(epsilon=1e-6, name="norm")
        taps = []
        for i in range(self.depth):
            y = _ViTBlock(self.dim, self.heads, ls_init=1.0,  # dinov2.py:409 init_values=1.0
              name=f"block{i}")(y)
            if i in tuple(self.out_indices):
                taps.append(y)
        # get_intermediate_layers(norm=True): shared final norm, drop cls
        return [norm(t)[:, 1:].reshape(b, ph, pw, self.dim) for t in taps]


class _RCU(nn.Module):
    """blocks.py:29-79 ResidualConvUnit (no bn)."""
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), name="conv1")(nn.relu(x))
        y = nn.Conv(self.features, (3, 3), name="conv2")(nn.relu(y))
        return x + y


class _FusionBlock(nn.Module):
    """blocks.py:82-151 FeatureFusionBlock (align_corners=True)."""
    features: int

    @nn.compact
    def __call__(self, x, skip=None, size=None):
        if skip is not None:
            x = x + _RCU(self.features, name="rcu1")(skip)
        x = _RCU(self.features, name="rcu2")(x)
        if size is None:
            size = (x.shape[-3] * 2, x.shape[-2] * 2)
        x = _resize_ac(x, size)
        return nn.Conv(self.features, (1, 1), name="out_conv")(x)


class DepthAnythingV2Module(nn.Module):
    dim: int = 384
    depth: int = 12
    heads: int = 6
    patch: int = 14
    pos_grid: int = 37
    out_indices: Sequence[int] = (2, 5, 8, 11)
    features: int = 64
    out_channels: Sequence[int] = (48, 96, 192, 384)

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        ph, pw = h // self.patch, w // self.patch
        taps = DinoV2(self.dim, self.depth, self.heads, self.patch,
                      self.pos_grid, self.out_indices, name="vit")(x)
        oc = tuple(self.out_channels)
        outs = []
        for i, t in enumerate(taps):
            t = nn.Conv(oc[i], (1, 1), name=f"proj{i}")(t)
            if i == 0:
                t = nn.ConvTranspose(oc[0], (4, 4), strides=(4, 4),
                                     padding="SAME", transpose_kernel=True,
                                     name="resize0")(t)
            elif i == 1:
                t = nn.ConvTranspose(oc[1], (2, 2), strides=(2, 2),
                                     padding="SAME", transpose_kernel=True,
                                     name="resize1")(t)
            elif i == 3:
                t = nn.Conv(oc[3], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name="resize3")(t)
            outs.append(t)
        f = self.features
        rn = [nn.Conv(f, (3, 3), use_bias=False, name=f"layer{i + 1}_rn")(t)
              for i, t in enumerate(outs)]
        p4 = _FusionBlock(f, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3])
        p3 = _FusionBlock(f, name="refinenet3")(
            p4, rn[2], size=rn[1].shape[1:3])
        p2 = _FusionBlock(f, name="refinenet2")(
            p3, rn[1], size=rn[0].shape[1:3])
        p1 = _FusionBlock(f, name="refinenet1")(p2, rn[0])
        y = nn.Conv(f // 2, (3, 3), name="output_conv1")(p1)
        y = _resize_ac(y, (ph * self.patch, pw * self.patch))
        y = nn.relu(nn.Conv(32, (3, 3), name="output_conv2a")(y))
        y = nn.relu(nn.Conv(1, (1, 1), name="output_conv2b")(y))
        return {"depth": nn.relu(y)}


_CFGS = {
    # name: (dim, depth, heads, out_indices, features, out_channels)
    "depth_anything_v2_vits": (384, 12, 6, (2, 5, 8, 11), 64,
                               (48, 96, 192, 384)),
    "depth_anything_v2_vitb": (768, 12, 12, (2, 5, 8, 11), 128,
                               (96, 192, 384, 768)),
    "depth_anything_v2_vitl": (1024, 24, 16, (4, 11, 17, 23), 256,
                               (256, 512, 1024, 1024)),
    "depth_anything_v2_vitg": (1536, 40, 24, (9, 19, 29, 39), 384,
                               (1536, 1536, 1536, 1536)),
}

for _name, _cfg in _CFGS.items():
    def _builder(cfg=_cfg, nm=_name, **kwargs):
        dim, depth, heads, idx, feats, oc = cfg
        over = {k: kwargs[k] for k in ("dim", "depth", "heads",
                                       "out_indices", "features",
                                       "out_channels") if k in kwargs}
        mod = DepthAnythingV2Module(
            dim=over.get("dim", dim), depth=over.get("depth", depth),
            heads=over.get("heads", heads),
            out_indices=tuple(over.get("out_indices", idx)),
            features=over.get("features", feats),
            out_channels=tuple(over.get("out_channels", oc)))
        return Model(
            name=nm, arch="depth_anything_v2", module=mod,
            tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,),
            required_inputs=("image",), out_key="depth", size_divisor=14,
        )
    MODELS.register(name=_name, obj=_builder, arch="depth_anything_v2",
                    tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,))
