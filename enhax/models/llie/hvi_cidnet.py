"""HVI-CIDNet: dual-branch color/intensity transformer in HVI space.

Rebuild of reference ``vision/enhance/llie/hvi_cidnet/hvi_cidnet.py:275-670``:
RGB -> HVI (learnable density_k), separate HV (2ch) and I (1ch) encoder/
decoder pyramids coupled at every level by lightweight cross-attention
(CAB = channel-wise transposed cross attention; IEL gated dconv FFN);
residual in HVI space, back to RGB.

Loss (hvi_cidnet.py:275-312): (L1 + 0.5*SSIM + 50*Edge + 0.01*Perceptual)
on RGB plus the same on HVI, weighted by hvi_weight.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import LayerNorm2d
from enhax.ops.color import hvi_to_rgb, rgb_to_hvi
from enhax.ops.resize import resize_align_corners


class PReLU(nn.Module):
    """torch nn.PReLU() default: ONE shared alpha (num_parameters=1)."""
    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a * x)


class CrossCAB(nn.Module):
    """Cross attention over channels (hvi_cidnet.py:379-415)."""
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, y):
        n, h, w, c = x.shape
        temperature = self.param("temperature", nn.initializers.ones,
                                 (self.num_heads, 1, 1))
        q = nn.Conv(c, (1, 1), use_bias=False, name="q")(x)
        q = nn.Conv(c, (3, 3), feature_group_count=c, use_bias=False, name="q_dw")(q)
        kv = nn.Conv(c * 2, (1, 1), use_bias=False, name="kv")(y)
        kv = nn.Conv(c * 2, (3, 3), feature_group_count=c * 2, use_bias=False,
                     name="kv_dw")(kv)
        k, v = jnp.split(kv, 2, axis=-1)
        hd = c // self.num_heads

        def heads(t):
            return t.reshape(n, h * w, self.num_heads, hd).transpose(0, 2, 3, 1)

        q, k, v = heads(q), heads(k), heads(v)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-6)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-6)
        attn = jnp.einsum("nhcp,nhdp->nhcd", q, k,
                          preferred_element_type=jnp.float32) * temperature
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("nhcd,nhdp->nhcp", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(n, h, w, c)
        return nn.Conv(c, (1, 1), use_bias=False, name="project_out")(out)


class IEL(nn.Module):
    """Intensity enhancement layer: gated tanh-residual dconv FFN (:417-441)."""
    dim: int
    expansion: float = 2.66

    @nn.compact
    def __call__(self, x):
        hidden = int(self.dim * self.expansion)
        y = nn.Conv(hidden * 2, (1, 1), use_bias=False, name="project_in")(x)
        y = nn.Conv(hidden * 2, (3, 3), feature_group_count=hidden * 2,
                    use_bias=False, name="dwconv")(y)
        x1, x2 = jnp.split(y, 2, axis=-1)
        x1 = jnp.tanh(nn.Conv(hidden, (3, 3), feature_group_count=hidden,
                              use_bias=False, name="dwconv1")(x1)) + x1
        x2 = jnp.tanh(nn.Conv(hidden, (3, 3), feature_group_count=hidden,
                              use_bias=False, name="dwconv2")(x2)) + x2
        return nn.Conv(self.dim, (1, 1), use_bias=False, name="project_out")(x1 * x2)


class LCA(nn.Module):
    """HV_LCA / I_LCA (:443-470): cross attention + IEL. ``residual_ffn``
    distinguishes I_LCA (True) from HV_LCA (False)."""
    dim: int
    num_heads: int
    residual_ffn: bool = True

    @nn.compact
    def __call__(self, a, b):
        # ONE LayerNorm shared across all three uses (hvi_cidnet.py:443-470
        # has a single self.norm applied to input1, input2, and post-attn)
        norm = LayerNorm2d(eps=1e-5, name="norm")  # torch LayerNorm default
        a = a + CrossCAB(self.dim, self.num_heads, name="ffn")(norm(a),
                                                               norm(b))
        g = IEL(self.dim, name="gdfn")(norm(a))
        return a + g if self.residual_ffn else g


class DownsampleNorm(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), use_bias=False, name="conv")(x)
        # torch nn.UpsamplingBilinear2d(scale_factor=0.5): align_corners=True
        y = resize_align_corners(y, (y.shape[-3] // 2, y.shape[-2] // 2))
        return PReLU(name="prelu")(y)


class UpsampleNorm(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, skip):
        y = nn.Conv(self.features, (3, 3), use_bias=False, name="conv")(x)
        y = resize_align_corners(y, (skip.shape[-3], skip.shape[-2]))
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="fuse")(
            jnp.concatenate([y, skip], axis=-1))
        return PReLU(name="prelu")(y)


class CIDNetModule(nn.Module):
    channels: tuple = (36, 36, 72, 144)
    heads: tuple = (1, 2, 4, 8)
    density_k: float = 0.2

    @nn.compact
    def __call__(self, x):
        ch1, ch2, ch3, ch4 = self.channels
        _, h2, h3, h4 = self.heads
        k = self.param("density_k", nn.initializers.constant(self.density_k), (1,))

        def conv_rep(feats, name):
            # torch Sequential(ReplicationPad2d(1), Conv2d(pad=0)): EDGE
            # padding, not zeros (hvi_cidnet.py:533-575)
            def apply(t):
                t = jnp.pad(t, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="edge")
                return nn.Conv(feats, (3, 3), padding="VALID",
                               use_bias=False, name=name)(t)
            return apply
        kv = k[0]
        hvi = rgb_to_hvi(x, density_k=kv)
        i = hvi[..., 2:3]

        i_enc0 = conv_rep(ch1, "ie_block0")(i)
        i_enc1 = DownsampleNorm(ch2, name="ie_block1")(i_enc0)
        hv_0 = conv_rep(ch1, "hve_block0")(hvi)
        hv_1 = DownsampleNorm(ch2, name="hve_block1")(hv_0)

        i_enc2 = LCA(ch2, h2, True, name="i_lca1")(i_enc1, hv_1)
        hv_2 = LCA(ch2, h2, False, name="hv_lca1")(hv_1, i_enc1)
        v_jump1, hv_jump1 = i_enc2, hv_2
        i_enc2 = DownsampleNorm(ch3, name="ie_block2")(i_enc2)
        hv_2 = DownsampleNorm(ch3, name="hve_block2")(hv_2)

        i_enc3 = LCA(ch3, h3, True, name="i_lca2")(i_enc2, hv_2)
        hv_3 = LCA(ch3, h3, False, name="hv_lca2")(hv_2, i_enc2)
        v_jump2, hv_jump2 = i_enc3, hv_3
        i_enc3 = DownsampleNorm(ch4, name="ie_block3")(i_enc2)
        hv_3 = DownsampleNorm(ch4, name="hve_block3")(hv_2)

        i_enc4 = LCA(ch4, h4, True, name="i_lca3")(i_enc3, hv_3)
        hv_4 = LCA(ch4, h4, False, name="hv_lca3")(hv_3, i_enc3)

        i_dec4 = LCA(ch4, h4, True, name="i_lca4")(i_enc4, hv_4)
        hv_4 = LCA(ch4, h4, False, name="hv_lca4")(hv_4, i_enc4)

        hv_3 = UpsampleNorm(ch3, name="hvd_block3")(hv_4, hv_jump2)
        i_dec3 = UpsampleNorm(ch3, name="id_block3")(i_dec4, v_jump2)
        i_dec2 = LCA(ch3, h3, True, name="i_lca5")(i_dec3, hv_3)
        hv_2 = LCA(ch3, h3, False, name="hv_lca5")(hv_3, i_dec3)

        hv_2 = UpsampleNorm(ch2, name="hvd_block2")(hv_2, hv_jump1)
        i_dec2 = UpsampleNorm(ch2, name="id_block2")(i_dec3, v_jump1)

        i_dec1 = LCA(ch2, h2, True, name="i_lca6")(i_dec2, hv_2)
        hv_1 = LCA(ch2, h2, False, name="hv_lca6")(hv_2, i_dec2)

        i_dec1 = UpsampleNorm(ch1, name="id_block1")(i_dec1, i_enc0)
        i_dec0 = conv_rep(1, "id_block0")(i_dec1)
        hv_1 = UpsampleNorm(ch1, name="hvd_block1")(hv_1, hv_0)
        hv_0 = conv_rep(2, "hvd_block0")(hv_1)

        output_hvi = jnp.concatenate([hv_0, i_dec0], axis=-1) + hvi
        output_rgb = hvi_to_rgb(output_hvi, density_k=kv)
        return {"enhanced": output_rgb, "hvi": output_hvi}


def cidnet_loss(l1_w: float = 1.0, ssim_w: float = 0.5, edge_w: float = 50.0,
                per_w: float = 0.01, hvi_weight: float = 1.0):
    l1 = LOSSES.build("l1_loss")
    ssim_l = LOSSES.build("ssim_loss")
    edge = LOSSES.build("edge_loss")
    per = LOSSES.build("perceptual_loss")

    def composite(a, b):
        return (l1_w * l1(a, b) + ssim_w * ssim_l(a, b) + edge_w * edge(a, b)
                + per_w * per(a, b))

    def fn(outputs, datapoint):
        pred = outputs["enhanced"]
        target = datapoint["ref_image"]
        loss_rgb = composite(pred, target)
        loss_hvi = composite(rgb_to_hvi(jnp.clip(pred, 0, 1)),
                             rgb_to_hvi(target))
        return loss_rgb + hvi_weight * loss_hvi
    return fn


@MODELS.register(name="hvi_cidnet_re", arch="hvi_cidnet", aliases=["hvi_cidnet"],
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def hvi_cidnet_re(channels=(36, 36, 72, 144), heads=(1, 2, 4, 8),
                  hvi_weight: float = 1.0, **kwargs) -> Model:
    return Model(
        name="hvi_cidnet_re", arch="hvi_cidnet",
        module=CIDNetModule(channels=tuple(channels), heads=tuple(heads)),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=cidnet_loss(hvi_weight=hvi_weight),
        required_inputs=("image",),
        size_divisor=8,
    )
