"""Depth Anything V2 (vits/b/l): DINOv2 ViT encoder + DPT decoder.

Rebuild of reference ``vision/depth/depth_anything_v2/depth_anything_v2.py:
72-148`` (which wraps the vendored repo): a plain ViT trunk producing
intermediate tokens at 4 depths, a DPT-style refinement decoder fusing them
into a relative depth map. Weight layout matches DINOv2 naming for
conversion via enhax.convert.

The model is inference-oriented (Scheme.INFERENCE), used to precompute the
``depth`` modality for the depth-aware LLIE models (DEPTH_DATA_SOURCES).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.classify.vit import TransformerBlock


class DPTFusion(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + skip
        y = nn.relu(nn.Conv(self.features, (3, 3), name="c1")(x))
        y = nn.relu(nn.Conv(self.features, (3, 3), name="c2")(y))
        x = x + y
        return jax.image.resize(
            x, x.shape[:-3] + (x.shape[-3] * 2, x.shape[-2] * 2, x.shape[-1]),
            method="bilinear")


class DepthAnythingV2Module(nn.Module):
    patch: int = 14
    dim: int = 384          # vits
    depth: int = 12
    heads: int = 6
    out_indices: Sequence[int] = (2, 5, 8, 11)
    fusion_features: int = 64

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        ph, pw = h // self.patch, w // self.patch
        y = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(x)
        y = y.reshape(n, ph * pw, self.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, ph * pw, self.dim))
        y = y + pos
        out_indices = tuple(self.out_indices)
        if max(out_indices) >= self.depth:
            # evenly spaced 4 taps for shallow (test/small) configs
            step = max(self.depth // 4, 1)
            out_indices = tuple(min(self.depth - 1, step * (k + 1) - 1)
                                for k in range(4))
        taps = []
        for i in range(self.depth):
            y = TransformerBlock(self.dim, self.heads, self.dim * 4,
                                 name=f"block{i}")(y)
            if i in out_indices:
                taps.append(y.reshape(n, ph, pw, self.dim))
        while len(taps) < 4:
            taps.append(taps[-1])
        # DPT decode: project taps, fuse coarse-to-fine
        f = self.fusion_features
        projs = [nn.Conv(f, (1, 1), name=f"proj{i}")(t) for i, t in enumerate(taps)]
        y = DPTFusion(f, name="fuse3")(projs[3])
        y = DPTFusion(f, name="fuse2")(y, projs[2] if projs[2].shape == y.shape
                                       else jax.image.resize(projs[2], y.shape, "bilinear"))
        y = DPTFusion(f, name="fuse1")(y, jax.image.resize(projs[1], y.shape, "bilinear"))
        y = DPTFusion(f, name="fuse0")(y, jax.image.resize(projs[0], y.shape, "bilinear"))
        y = nn.relu(nn.Conv(f // 2, (3, 3), name="head1")(y))
        y = nn.relu(nn.Conv(32, (3, 3), name="head2")(y))
        d = nn.Conv(1, (1, 1), name="head3")(y)
        d = jax.image.resize(d, (n, h, w, 1), method="bilinear")
        return {"depth": jax.nn.relu(d)}


_CFGS = {
    "depth_anything_v2_vits": (384, 12, 6),
    "depth_anything_v2_vitb": (768, 12, 12),
    "depth_anything_v2_vitl": (1024, 24, 16),
    "depth_anything_v2_vitg": (1536, 40, 24),
}

for _name, (_dim, _depth, _heads) in _CFGS.items():
    def _builder(dim=_dim, depth=_depth, heads=_heads, nm=_name, **kwargs):
        return Model(
            name=nm, arch="depth_anything_v2",
            module=DepthAnythingV2Module(dim=dim, depth=depth, heads=heads),
            tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,),
            required_inputs=("image",),
            out_key="depth",
            size_divisor=14,
        )
    MODELS.register(name=_name, obj=_builder, arch="depth_anything_v2",
                    tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,))


class DepthProModule(DepthAnythingV2Module):
    """Depth Pro (reference vision/depth/depth_pro wrapper): multi-scale ViT —
    the image is encoded at two scales and fused before the DPT decode,
    yielding sharper metric-ish depth. Compact rebuild sharing the DAv2 trunk."""

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        half = jax.image.resize(x, (n, h // 2 * 2 // 2, w // 2 * 2 // 2, 3),
                                "bilinear")
        d_full = DepthAnythingV2Module(
            patch=self.patch, dim=self.dim, depth=self.depth, heads=self.heads,
            out_indices=self.out_indices, fusion_features=self.fusion_features,
            name="trunk_full")(x)["depth"]
        d_half = DepthAnythingV2Module(
            patch=self.patch, dim=self.dim, depth=self.depth, heads=self.heads,
            out_indices=self.out_indices, fusion_features=self.fusion_features,
            name="trunk_half")(half)["depth"]
        d_half = jax.image.resize(d_half, d_full.shape, "bilinear")
        fused = nn.Conv(1, (3, 3), name="fuse")(
            jnp.concatenate([d_full, d_half], axis=-1))
        return {"depth": jax.nn.relu(fused)}


def _depth_pro_builder(dim: int = 384, depth: int = 12, heads: int = 6, **kwargs):
    return Model(
        name="depth_pro", arch="depth_pro",
        module=DepthProModule(dim=dim, depth=depth, heads=heads),
        tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,),
        required_inputs=("image",), out_key="depth", size_divisor=28,
    )


MODELS.register(name="depth_pro", obj=_depth_pro_builder, arch="depth_pro",
                tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,))
