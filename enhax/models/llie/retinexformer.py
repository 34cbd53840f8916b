"""RetinexFormer: one-stage Retinex-based transformer for LLIE (ICCV 2023).

Native rebuild of the reference's vendored RetinexFormer
(mon_extra/vision/enhance/llie/retinexformer/basicsr/models/archs/
RetinexFormer_arch.py; registered as EXTRA_MODELS "retinexformer",
globals.py:1007). Pipeline per stage:

  illumination estimator (1x1 -> grouped 5x5 -> 1x1 on [img, mean_c])
  -> light-up: x = img * illu_map + img
  -> IGAB U-Net denoiser: illumination-guided channel attention (IG-MSA,
     attention over the channel dim like Restormer's MDTA -> linear in
     pixels) with the illumination feature modulating V.

TPU notes: the channel-transposed attention is (d x d) matmuls at every
resolution — MXU-friendly with no quadratic pixel cost; everything is
static-shaped convs/matmuls, so XLA fuses the whole stage. Published
variants run stage=1, n_feat=40, num_blocks=(1, 2, 2).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.nn.layers import DWConv3x3, conv1x1
from enhax.models.base import Model


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


class IlluminationEstimator(nn.Module):
    """RetinexFormer_arch.py:97-121: prior = per-pixel channel mean."""
    n_mid: int
    n_out: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, img):
        mean_c = jnp.mean(img, axis=-1, keepdims=True)
        x = jnp.concatenate([img, mean_c], axis=-1)  # (..., 4)
        x1 = conv1x1(self.n_mid, dtype=self.dtype, name="conv1")(x)
        # grouped 5x5 with groups = n_fea_in = 4 (not full depthwise)
        illu_fea = nn.Conv(self.n_mid, (5, 5), feature_group_count=4,
                           dtype=self.dtype, name="depth_conv")(x1)
        illu_map = conv1x1(self.n_out, dtype=self.dtype, name="conv2")(illu_fea)
        return illu_fea, illu_map


class IGMSA(nn.Module):
    """Illumination-guided MSA over the channel dim (RetinexFormer_arch.py:124)
    with the positional depthwise branch on v_inp."""
    dim: int
    dim_head: int
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, illu_fea):
        b, h, w, c = x.shape
        n = h * w
        inner = self.dim_head * self.heads
        xf = x.reshape(b, n, c)
        q_inp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(xf)
        k_inp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(xf)
        v_inp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(xf)
        illu = illu_fea.reshape(b, n, inner)

        def heads_t(t):  # (b, n, heads*d) -> (b, heads, d, n)
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 3, 1)

        q, k, v = heads_t(q_inp), heads_t(k_inp), heads_t(v_inp) * heads_t(illu)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
        rescale = self.param("rescale", nn.initializers.ones, (self.heads, 1, 1))
        attn = jnp.einsum("bhdn,bhen->bhde", k, q,
                          preferred_element_type=jnp.float32) * rescale
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)
        out = out.transpose(0, 3, 1, 2).reshape(b, n, inner)
        out_c = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                         name="proj")(out).reshape(b, h, w, c)
        p = v_inp.reshape(b, h, w, inner)
        p = DWConv3x3(inner, use_bias=False, dtype=self.dtype,
                      name="pos1")(p)
        p = _gelu(p)
        p = DWConv3x3(inner, use_bias=False, dtype=self.dtype,
                      name="pos2")(p)
        return out_c + p


class IGFeedForward(nn.Module):
    """1x1 expand -> GELU -> depthwise 3x3 -> GELU -> 1x1 project."""
    dim: int
    mult: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hidden = self.dim * self.mult
        y = conv1x1(hidden, use_bias=False, dtype=self.dtype, name="fc1")(x)
        y = _gelu(y)
        y = DWConv3x3(hidden, use_bias=False, dtype=self.dtype,
                      name="dw")(y)
        y = _gelu(y)
        return conv1x1(self.dim, use_bias=False, dtype=self.dtype,
                       name="fc2")(y)


class IGAB(nn.Module):
    """num_blocks x (IG-MSA + PreNorm FeedForward), both residual."""
    dim: int
    dim_head: int
    heads: int
    num_blocks: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, illu_fea):
        for j in range(self.num_blocks):
            x = IGMSA(self.dim, self.dim_head, self.heads, dtype=self.dtype,
                          name=f"attn{j}")(x, illu_fea) + x
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ffnorm{j}")(x)
            x = IGFeedForward(self.dim, dtype=self.dtype, name=f"ff{j}")(y) + x
        return x


class Denoiser(nn.Module):
    """IGAB U-Net (RetinexFormer_arch.py:238-320), level=2."""
    in_dim: int = 3
    out_dim: int = 3
    dim: int = 31
    level: int = 2
    num_blocks: Sequence[int] = (2, 4, 4)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, illu_fea):
        d = self.dim
        fea = nn.Conv(d, (3, 3), use_bias=False, dtype=self.dtype,
                      name="embedding")(x)
        skips, illus = [], []
        dim_level = d
        for i in range(self.level):
            fea = IGAB(dim_level, d, dim_level // d, self.num_blocks[i],
                       dtype=self.dtype, name=f"enc{i}_igab")(fea, illu_fea)
            skips.append(fea)
            illus.append(illu_fea)
            fea = nn.Conv(dim_level * 2, (4, 4), strides=(2, 2),
                          padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name=f"enc{i}_down")(fea)
            illu_fea = nn.Conv(dim_level * 2, (4, 4), strides=(2, 2),
                               padding=((1, 1), (1, 1)), use_bias=False,
                               dtype=self.dtype, name=f"enc{i}_illu_down")(illu_fea)
            dim_level *= 2

        fea = IGAB(dim_level, d, dim_level // d, self.num_blocks[-1],
                   dtype=self.dtype, name="bottleneck")(fea, illu_fea)

        for i in range(self.level):
            fea = nn.ConvTranspose(dim_level // 2, (2, 2), strides=(2, 2),
                                   transpose_kernel=True, dtype=self.dtype,
                                   name=f"dec{i}_up")(fea)
            fea = jnp.concatenate([fea, skips[self.level - 1 - i]], axis=-1)
            fea = conv1x1(dim_level // 2, use_bias=False,
                          dtype=self.dtype, name=f"dec{i}_fusion")(fea)
            illu_fea = illus[self.level - 1 - i]
            fea = IGAB(dim_level // 2, d, (dim_level // 2) // d,
                       self.num_blocks[self.level - 1 - i], dtype=self.dtype,
                       name=f"dec{i}_igab")(fea, illu_fea)
            dim_level //= 2

        out = nn.Conv(self.out_dim, (3, 3), use_bias=False, dtype=self.dtype,
                      name="mapping")(fea)
        return out + x


class RetinexFormerModule(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    n_feat: int = 40
    stage: int = 1
    num_blocks: Sequence[int] = (1, 2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = x
        for s in range(self.stage):
            illu_fea, illu_map = IlluminationEstimator(
                self.n_feat, dtype=self.dtype, name=f"stage{s}_estimator")(y)
            lit = y * illu_map + y
            y = Denoiser(self.in_channels, self.out_channels, self.n_feat,
                         2, tuple(self.num_blocks), dtype=self.dtype,
                         name=f"stage{s}_denoiser")(lit, illu_fea)
        return {"enhanced": y}


def _l1_loss():
    l1 = LOSSES.build("l1_loss")

    def fn(outputs, datapoint):
        return l1(outputs["enhanced"], datapoint["ref_image"])
    return fn


@MODELS.register(name="retinexformer", arch="retinexformer",
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def retinexformer(n_feat: int = 40, stage: int = 1, num_blocks=(1, 2, 2),
                  **kwargs) -> Model:
    """Published LOL/SDSD/FiveK variants: stage=1, n_feat=40, blocks (1,2,2)."""
    return Model(
        name="retinexformer", arch="retinexformer",
        module=RetinexFormerModule(n_feat=n_feat, stage=stage,
                                   num_blocks=tuple(num_blocks)),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_l1_loss(), required_inputs=("image",), size_divisor=4,
    )
