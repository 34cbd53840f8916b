"""MobileSAM: TinyViT-encoder SAM (faithful image encoder).

Native rebuild of the reference's vendored MobileSAM
(mon_extra/vision/segment/mobile_sam/mobile_sam/modeling/tiny_vit_sam.py,
build_sam.py:47-101 "vit_t"): the promptable SAM pipeline with the
TinyViT-5M image encoder —

  * ``PatchEmbed``: two stride-2 Conv-BN stems (4x downsample).
  * stage 0: MBConv blocks (1x1 expand, 3x3 depthwise, 1x1 project with
    zero-init BN gamma, GELU after the residual add).
  * stages 1-3: window attention blocks — LeViT-style attention with a
    trainable per-offset relative bias table, a depthwise "local conv"
    between attention and MLP, pre-norm MLP; PatchMerging between
    stages (1x1 / dw-3x3 / 1x1 Conv-BN, stride 1 for out_dim in
    {320, 448, 576} so stage 3 keeps stage 2's resolution).
  * a SAM neck (1x1 + 3x3 convs with channels-first LayerNorm) to the
    256-dim image embedding; the torch forward hard-codes the 64x64
    grid of img_size=1024 (tiny_vit_sam.py:610) — here it follows the
    input shape.

The prompt encoder / two-way mask decoder are shared with enhax's SAM
(models/segment/sam.py), matching the reference where MobileSAM reuses
SAM's decoder unchanged (build_sam.py:66-90).

vit_t preset: embed_dims (64, 128, 160, 320), depths (2, 2, 6, 2),
heads (2, 4, 5, 10), windows (7, 7, 14, 7).
"""

from __future__ import annotations

import itertools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.segment.sam import SAMMaskDecoder, SAMPromptEncoder

_STRIDE1_DIMS = (320, 448, 576)  # tiny_vit_sam.py:127-129


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="c")(x)
        return nn.BatchNorm(use_running_average=not train, dtype=self.dtype,
                            name="bn")(x)


class _MBConv(nn.Module):
    dim: int
    expand: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        hidden = int(self.dim * self.expand)
        g = lambda t: jax.nn.gelu(t, approximate=False)  # noqa: E731
        y = g(_ConvBN(hidden, 1, dtype=d, name="conv1")(x, train))
        y = g(_ConvBN(hidden, 3, groups=hidden, dtype=d,
                      name="conv2")(y, train))
        y = _ConvBN(self.dim, 1, dtype=d, name="conv3")(y, train)
        return g(y + x)


class _PatchMerging(nn.Module):
    out_dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        g = lambda t: jax.nn.gelu(t, approximate=False)  # noqa: E731
        stride = 1 if self.out_dim in _STRIDE1_DIMS else 2
        y = g(_ConvBN(self.out_dim, 1, dtype=d, name="conv1")(x, train))
        y = g(_ConvBN(self.out_dim, 3, stride=stride, groups=self.out_dim,
                      dtype=d, name="conv2")(y, train))
        return _ConvBN(self.out_dim, 1, dtype=d, name="conv3")(y, train)


def _bias_idxs(resolution: tuple[int, int]) -> tuple[np.ndarray, int]:
    """LeViT relative-offset index table (tiny_vit_sam.py:232-249)."""
    points = list(itertools.product(range(resolution[0]),
                                    range(resolution[1])))
    offsets = {}
    idxs = []
    for p1 in points:
        for p2 in points:
            off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
            if off not in offsets:
                offsets[off] = len(offsets)
            idxs.append(offsets[off])
    n = len(points)
    return np.asarray(idxs, np.int32).reshape(n, n), len(offsets)


class _TinyAttention(nn.Module):
    """tiny_vit_sam.py:211-285 (attn_ratio=1 in TinyViT blocks)."""
    dim: int
    key_dim: int
    heads: int
    resolution: tuple = (7, 7)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        kd, h = self.key_dim, self.heads
        dv = kd  # attn_ratio = 1
        idxs, n_off = _bias_idxs(self.resolution)
        bias_table = self.param("attention_biases", nn.initializers.zeros,
                                (h, n_off))
        ab = bias_table[:, idxs]  # (heads, N, N)
        y = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        qkv = nn.Dense(h * (2 * kd + dv), dtype=d, name="qkv")(y)
        b, n, _ = x.shape
        qkv = qkv.reshape(b, n, h, 2 * kd + dv)
        q, k, v = (qkv[..., :kd], qkv[..., kd:2 * kd], qkv[..., 2 * kd:])
        resh = lambda t: t.transpose(0, 2, 1, 3)  # noqa: E731
        q, k, v = resh(q), resh(k), resh(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) * kd ** -0.5 + ab
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * dv)
        return nn.Dense(self.dim, dtype=d, name="proj")(out)


class _TinyViTBlock(nn.Module):
    dim: int
    heads: int
    window: int = 7
    mlp_ratio: float = 4.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C)
        d = self.dtype
        b, hh, ww, c = x.shape
        win = self.window
        res = x
        if hh == win and ww == win:
            y = _TinyAttention(c, c // self.heads, self.heads, (win, win),
                               dtype=d, name="attn")(x.reshape(b, -1, c))
            y = y.reshape(b, hh, ww, c)
        else:
            pad_b = (win - hh % win) % win
            pad_r = (win - ww % win) % win
            y = jnp.pad(x, [(0, 0), (0, pad_b), (0, pad_r), (0, 0)])
            ph, pw = hh + pad_b, ww + pad_r
            nh, nw = ph // win, pw // win
            y = y.reshape(b, nh, win, nw, win, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b * nh * nw, win * win, c)
            y = _TinyAttention(c, c // self.heads, self.heads, (win, win),
                               dtype=d, name="attn")(y)
            y = y.reshape(b, nh, nw, win, win, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, ph, pw, c)[:, :hh, :ww]
        x = res + y
        x = _ConvBN(c, 3, groups=c, dtype=d, name="local_conv")(x, train)
        y = nn.LayerNorm(epsilon=1e-5, name="mlp_norm")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=d, name="fc1")(y)
        y = nn.Dense(c, dtype=d, name="fc2")(
            jax.nn.gelu(y, approximate=False))
        return x + y


class TinyViT(nn.Module):
    """TinyViT-5M SAM image encoder (tiny_vit_sam.py:462-620)."""
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (2, 4, 5, 10)
    windows: Sequence[int] = (7, 7, 14, 7)
    neck_dim: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        g = lambda t: jax.nn.gelu(t, approximate=False)  # noqa: E731
        dims = list(self.embed_dims)
        y = _ConvBN(dims[0] // 2, 3, stride=2, dtype=d,
                    name="embed_c1")(x, train)
        y = _ConvBN(dims[0], 3, stride=2, dtype=d, name="embed_c2")(g(y),
                                                                    train)
        # stage 0: MBConvs + merge
        for j in range(self.depths[0]):
            y = _MBConv(dims[0], dtype=d, name=f"s0_b{j}")(y, train)
        y = _PatchMerging(dims[1], dtype=d, name="s0_ds")(y, train)
        # stages 1..3
        for s in range(1, len(dims)):
            for j in range(self.depths[s]):
                y = _TinyViTBlock(dims[s], self.heads[s], self.windows[s],
                                  dtype=d, name=f"s{s}_b{j}")(y, train)
            if s < len(dims) - 1:
                y = _PatchMerging(dims[s + 1], dtype=d,
                                  name=f"s{s}_ds")(y, train)
        # SAM neck (channels-first LayerNorm in torch == channel LN here)
        ln = lambda name: nn.LayerNorm(epsilon=1e-6, name=name)  # noqa: E731
        y = nn.Conv(self.neck_dim, (1, 1), use_bias=False, dtype=d,
                    name="neck0")(y)
        y = ln("neck1")(y)
        y = nn.Conv(self.neck_dim, (3, 3), use_bias=False, dtype=d,
                    name="neck2")(y)
        return ln("neck3")(y)


class MobileSAM(nn.Module):
    embed_dims: Sequence[int] = (64, 128, 160, 320)
    depths: Sequence[int] = (2, 2, 6, 2)
    heads: Sequence[int] = (2, 4, 5, 10)
    windows: Sequence[int] = (7, 7, 14, 7)
    dim: int = 256
    num_masks: int = 3

    @nn.compact
    def __call__(self, image, points, labels):
        h, w = image.shape[-3], image.shape[-2]
        embed = TinyViT(self.embed_dims, self.depths, self.heads,
                        self.windows, self.dim, name="image_encoder")(image)
        eh, ew = embed.shape[1:3]
        # points arrive normalized (y, x) (enhax convention); the SAM
        # prompt encoder takes pixel (x, y)
        pts = jnp.stack([points[..., 1] * w, points[..., 0] * h], axis=-1)
        sparse, dense, dense_pe = SAMPromptEncoder(
            self.dim, (h, w), (eh, ew), name="prompt_encoder")(pts, labels)
        masks, iou = SAMMaskDecoder(
            self.dim, num_multimask=self.num_masks,
            name="mask_decoder")(embed, dense_pe, sparse, dense)
        masks = jax.image.resize(masks, masks.shape[:2] + (h, w), "bilinear")
        return {"masks": masks, "iou_predictions": iou,
                "logits": jnp.moveaxis(masks, 1, -1)}


@MODELS.register(name="mobile_sam", arch="sam", aliases=["sam_vit_t", "mobile_sam_vit_t"],
                 tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
def mobile_sam(embed_dims=(64, 128, 160, 320), depths=(2, 2, 6, 2),
               heads=(2, 4, 5, 10), windows=(7, 7, 14, 7), dim: int = 256,
               num_masks: int = 3, **kwargs) -> Model:
    return Model(
        name="mobile_sam", arch="sam",
        module=MobileSAM(embed_dims=tuple(embed_dims), depths=tuple(depths),
                         heads=tuple(heads), windows=tuple(windows),
                         dim=dim, num_masks=num_masks),
        tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,),
        required_inputs=("image", "points", "labels"),
        out_key="masks",
        size_divisor=64,
    )
