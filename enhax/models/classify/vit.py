"""Vision Transformer b/16, b/32, l/16 (reference vision/classify/vit)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.classify.base import make_classifier


class TransformerBlock(nn.Module):
    """Pre-LN encoder block with a FUSED qkv projection (the torch-side
    ``attn.qkv`` layout of timm/torchvision ViT encoders), so released
    checkpoints convert through the generic matcher without per-head
    reshapes."""
    dim: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = c // self.heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(c * 3, name="qkv")(y)
        q, k, v = jnp.split(
            qkv.reshape(b, n, 3, self.heads, hd).transpose(2, 0, 3, 1, 4),
            3, axis=0)
        q, k, v = q[0], k[0], v[0]                   # (b, heads, n, hd)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(hd), axis=-1)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        x = x + nn.Dense(c, name="proj")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.mlp_dim, name="mlp1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp2")(y)
        return x + y


class ViT(nn.Module):
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_dim: int = 3072
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = x.shape[0]
        y = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="embed")(x)
        y = y.reshape(n, -1, self.dim)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        y = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, self.dim)), y], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, y.shape[1], self.dim))
        y = y + pos
        for i in range(self.depth):
            y = TransformerBlock(self.dim, self.heads, self.mlp_dim,
                                 name=f"block{i}")(y)
        y = nn.LayerNorm(name="norm")(y)
        return {"logits": nn.Dense(self.num_classes, name="head")(y[:, 0])}


for _name, (_p, _d, _dep, _h, _m) in {
    "vit_b_16": (16, 768, 12, 12, 3072),
    "vit_b_32": (32, 768, 12, 12, 3072),
    "vit_l_16": (16, 1024, 24, 16, 4096),
    "vit_l_32": (32, 1024, 24, 16, 4096),
    "vit_h_14": (14, 1280, 32, 16, 5120),
}.items():
    def _builder(num_classes: int = 1000, p=_p, d=_d, dep=_dep, h=_h, m=_m,
                 nm=_name, **kwargs):
        return make_classifier(nm, "vit",
                               ViT(patch=p, dim=d, depth=dep, heads=h, mlp_dim=m,
                                   num_classes=num_classes), size_divisor=p)
    MODELS.register(name=_name, obj=_builder, arch="vit",
                    tasks=(Task.CLASSIFY,), schemes=(Scheme.SUPERVISED,))
