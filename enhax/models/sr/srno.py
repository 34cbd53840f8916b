"""SRNO: super-resolution neural operator (arbitrary-scale SR).

Faithful rebuild of the reference's vendored SRNO
(mon_extra/vision/enhance/sr/srno/models/sronet.py:12-95 + galerkin.py +
edsr.py, config train_edsr-sronet.yaml):

  * edsr-baseline encoder: 3x3 head, 16 conv-ReLU-conv residual blocks
    (res_scale 1), 3x3 tail, global skip; mean shifts are commented out
    upstream.
  * LIIF-style local ensemble query (sronet.py:32-81): four nearest-
    neighbor feature taps at (+-rx, +-ry) shifted target coords
    (grid_sample nearest, align_corners=False), relative coordinates
    scaled by the feature grid, diagonal-SWAPPED area weights, and the
    cell size — concatenated to a (64+2)*4+2 query field.
  * two Galerkin attention blocks (galerkin.py:25-60): softmax-free
    k^T v / N with per-head LayerNorm on k/v (torch-std, eps on the
    std), and the quirky residual — the attention output feeds ONLY the
    conv FFN, whose output is added to the block input.
  * 1x1 fc head + bilinear border-padded skip of the input.

Linear attention = two matmuls over (pixels x channels) — ideal MXU
work, linear in pixel count.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


def make_coord(h, w):
    """utils.make_coord (srno/utils.py:193-209): grid-center coords in
    [-1, 1], channel 0 = y (H axis). (h, w, 2)."""
    ry = 1.0 / h
    rx = 1.0 / w
    ys = -1 + ry + 2 * ry * jnp.arange(h)
    xs = -1 + rx + 2 * rx * jnp.arange(w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([gy, gx], axis=-1)


def _unnormalize(c, size):
    # torch grid_sample align_corners=False
    return ((c + 1) * size - 1) / 2


def grid_sample_nearest(img, coord_yx):
    """img (n,h,w,c); coord (n,H,W,2) with channel 0 = y in [-1,1]."""
    h, w = img.shape[1], img.shape[2]
    iy = jnp.clip(jnp.round(_unnormalize(coord_yx[..., 0], h)), 0, h - 1)
    ix = jnp.clip(jnp.round(_unnormalize(coord_yx[..., 1], w)), 0, w - 1)
    idx = (iy * w + ix).astype(jnp.int32)                  # (n,H,W)
    flat = img.reshape(img.shape[0], h * w, -1)
    return jnp.take_along_axis(
        flat, idx.reshape(img.shape[0], -1, 1), axis=1
    ).reshape(img.shape[0], *idx.shape[1:], img.shape[-1])


def grid_sample_bilinear_border(img, coord_yx):
    h, w = img.shape[1], img.shape[2]
    fy = _unnormalize(coord_yx[..., 0], h)
    fx = _unnormalize(coord_yx[..., 1], w)
    y0 = jnp.floor(fy)
    x0 = jnp.floor(fx)
    wy = fy - y0
    wx = fx - x0
    flat = img.reshape(img.shape[0], h * w, -1)

    def tap(yy, xx):
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        idx = (yy * w + xx).astype(jnp.int32)
        return jnp.take_along_axis(
            flat, idx.reshape(img.shape[0], -1, 1), axis=1
        ).reshape(img.shape[0], *idx.shape[1:], img.shape[-1])

    wy_ = wy[..., None]
    wx_ = wx[..., None]
    return (tap(y0, x0) * (1 - wy_) * (1 - wx_)
            + tap(y0, x0 + 1) * (1 - wy_) * wx_
            + tap(y0 + 1, x0) * wy_ * (1 - wx_)
            + tap(y0 + 1, x0 + 1) * wy_ * wx_)


class EDSRBaseline(nn.Module):
    """edsr.py:88-140, no_upsampling (16 resblocks, 64 feats)."""
    features: int = 64
    blocks: int = 16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), name="head")(x)
        skip = y
        for i in range(self.blocks):
            z = nn.relu(nn.Conv(self.features, (3, 3), name=f"b{i}_c1")(y))
            z = nn.Conv(self.features, (3, 3), name=f"b{i}_c2")(z)
            y = y + z
        return nn.Conv(self.features, (3, 3), name="tail")(y) + skip


class _GalerkinLN(nn.Module):
    """galerkin.py:7-21: torch-std (ddof=1) LayerNorm over the head dim,
    eps added to the STD, per-(head, channel) affine."""
    heads: int
    headc: int

    @nn.compact
    def __call__(self, x):  # (n, heads, p, headc)
        weight = self.param("weight", nn.initializers.ones,
                            (self.heads, 1, self.headc))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads, 1, self.headc))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        std = jnp.std(x, axis=-1, keepdims=True, ddof=1)
        return weight * ((x - mean) / (std + 1e-5)) + bias


class SimpleAttn(nn.Module):
    """galerkin.py:25-60 ``simple_attn``."""
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (n, h, w, c)
        n, h, w, c = x.shape
        headc = self.dim // self.heads
        qkv = nn.Conv(3 * self.dim, (1, 1), name="qkv")(x)
        qkv = qkv.reshape(n, h * w, self.heads, 3 * headc).transpose(0, 2, 1, 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        k = _GalerkinLN(self.heads, headc, name="kln")(k)
        v = _GalerkinLN(self.heads, headc, name="vln")(v)
        ctx = jnp.einsum("nhpd,nhpe->nhde", k, v) / (h * w)
        out = jnp.einsum("nhpd,nhde->nhpe", q, ctx)
        ret = out.transpose(0, 2, 1, 3).reshape(n, h, w, c) + x
        # galerkin.py:58-59: ONLY the FFN path joins the output residual
        y = nn.Conv(self.dim, (1, 1), name="o1")(ret)
        y = nn.Conv(self.dim, (1, 1), name="o2")(nn.gelu(y, approximate=False))
        return y + x


class SRNOModule(nn.Module):
    """sronet.py:12-95 at the published width/blocks (256 / 16 heads)."""
    features: int = 64
    width: int = 256
    heads: int = 16
    enc_blocks: int = 16
    scale: int = 4  # default upscale for the dict-datapoint API

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        feat = EDSRBaseline(self.features, self.enc_blocks,
                            name="encoder")(x)
        hr_h, hr_w = h * self.scale, w * self.scale
        coord = jnp.broadcast_to(make_coord(hr_h, hr_w)[None],
                                 (n, hr_h, hr_w, 2))
        cell = jnp.array([2.0 / hr_h, 2.0 / hr_w])

        pos_lr = jnp.broadcast_to(make_coord(h, w)[None], (n, h, w, 2))
        ry = 1.0 / h   # rx in the reference's (H-first) naming
        rx = 1.0 / w
        eps = 1e-6
        rel_coords, feats, areas = [], [], []
        for vy in (-1, 1):
            for vx in (-1, 1):
                c = coord + jnp.array([vy * ry + eps, vx * rx + eps])
                c = jnp.clip(c, -1 + 1e-6, 1 - 1e-6)
                f = grid_sample_nearest(feat, c)
                old = grid_sample_nearest(pos_lr, c)
                rel = (coord - old) * jnp.array([h, w])
                areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)
                rel_coords.append(rel)
                feats.append(f)
        tot = sum(areas)
        areas[0], areas[3] = areas[3], areas[0]
        areas[1], areas[2] = areas[2], areas[1]
        feats = [f * (a / tot)[..., None] for f, a in zip(feats, areas)]
        rel_cell = jnp.broadcast_to(cell * jnp.array([h, w]),
                                    (n, hr_h, hr_w, 2))
        grid = jnp.concatenate(rel_coords + feats + [rel_cell], axis=-1)

        y = nn.Conv(self.width, (1, 1), name="conv00")(grid)
        y = SimpleAttn(self.width, self.heads, name="attn0")(y)
        y = SimpleAttn(self.width, self.heads, name="attn1")(y)
        y = nn.Conv(256, (1, 1), name="fc1")(y)
        y = nn.Conv(3, (1, 1), name="fc2")(nn.gelu(y, approximate=False))
        return {"enhanced": y + grid_sample_bilinear_border(x, coord)}


def _sr_loss():
    l1 = LOSSES.build("l1_loss")

    def fn(outputs, datapoint):
        return l1(outputs["enhanced"], datapoint["ref_image"])
    return fn


@MODELS.register(name="srno", arch="srno",
                 tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,))
def srno(features: int = 64, width: int = 256, heads: int = 16,
         enc_blocks: int = 16, scale: int = 4, **kwargs) -> Model:
    return Model(
        name="srno", arch="srno",
        module=SRNOModule(features=features, width=width, heads=heads,
                          enc_blocks=enc_blocks, scale=scale),
        tasks=(Task.SR,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_sr_loss(),
        required_inputs=("image",),
        size_divisor=1,
        scale=scale,
    )
