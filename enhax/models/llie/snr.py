"""SNR-aware low-light enhancement transformer (CVPR 2022).

Native rebuild of the reference's vendored SNR
(mon_extra/vision/enhance/llie/snr/models/archs/low_light_transformer.py;
EXTRA_MODELS "snr", globals.py:1055). Pipeline:

  * SNR map (Video_base_model4_m.py:146-161): dark = luma(x),
    light = luma(box5x5(x)), mask = norm(light / |dark-light|+1e-4)
    clamped to [0,1] — computed IN-GRAPH here (the torch pipeline blurs
    with cv2 on the host; reflect-101 box blur matches cv2.blur).
  * Encoder: 3 strided convs (x4 down) + 5 residual blocks.
  * Long-range branch: features unfolded into 4x4 patches (d=16*nf) and
    run through a 6-layer pre-LN transformer where patches whose mean SNR
    <= 0.5 are masked out of attention (low-SNR queries attend only to
    high-SNR keys).
  * Short-range branch: 6 residual blocks (fea_light).
  * Fusion: fea = unfold_branch*(1-mask) + fea_light*mask, then a
    10-block trunk and pixel-shuffle decoder with encoder skips; +x.

TPU notes: the unfold/fold are pure reshapes; attention is one
(L x L) matmul per layer at L = HW/256 — MXU-friendly; everything is
static-shaped.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import pixel_shuffle

_LUMA = jnp.array([0.299, 0.587, 0.114], jnp.float32)


def box_blur5(x):
    """cv2.blur(img, (5,5)) equivalent: reflect-101 border + 5x5 mean."""
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    c = x.shape[-1]
    k = jnp.ones((5, 5, 1, 1), x.dtype) / 25.0
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def snr_mask(x):
    """Video_base_model4_m.py:146-161."""
    dark = jnp.sum(x * _LUMA, axis=-1, keepdims=True)
    light = jnp.sum(box_blur5(x) * _LUMA, axis=-1, keepdims=True)
    noise = jnp.abs(dark - light)
    mask = light / (noise + 1e-4)
    mask_max = jnp.max(mask.reshape(mask.shape[0], -1), axis=1)
    mask = mask / (mask_max[:, None, None, None] + 1e-4)
    return jnp.clip(mask, 0.0, 1.0)


class ResBlockNoBN(nn.Module):
    """arch_util.py:33-51."""
    nf: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="conv1")(x))
        y = nn.Conv(self.nf, (3, 3), dtype=self.dtype, name="conv2")(y)
        return x + y


class PatchAttention(nn.Module):
    """MultiHeadAttention4 (SubLayers.py:10-65): one shared pre-LN."""
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask):
        b, n, d = x.shape
        residual = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        q = nn.Dense(self.n_head * self.d_k, use_bias=False, dtype=self.dtype,
                     name="w_qs")(y).reshape(b, n, self.n_head, self.d_k)
        k = nn.Dense(self.n_head * self.d_k, use_bias=False, dtype=self.dtype,
                     name="w_ks")(y).reshape(b, n, self.n_head, self.d_k)
        v = nn.Dense(self.n_head * self.d_v, use_bias=False, dtype=self.dtype,
                     name="w_vs")(y).reshape(b, n, self.n_head, self.d_v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q / (self.d_k ** 0.5), k,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            # mask: (b, 1, n) over keys; 0 -> excluded (Modules.py:19)
            attn = jnp.where(mask[:, None, :, :] == 0, -1e9, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, -1)
        out = nn.Dense(d, use_bias=False, dtype=self.dtype, name="fc")(out)
        return out + residual


class PatchFFN(nn.Module):
    """PositionwiseFeedForward4 (SubLayers.py:67-85)."""
    d_inner: int = 2048
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        y = nn.Dense(self.d_inner, dtype=self.dtype, name="w_1")(y)
        y = nn.Dense(x.shape[-1], dtype=self.dtype, name="w_2")(nn.relu(y))
        return y + residual


def _unfold4(x):
    """F.unfold(k=4, s=4) on NHWC -> (b, L, c*16) in torch (c,ky,kx) order."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 4, 4, w // 4, 4, c)
    y = y.transpose(0, 1, 3, 5, 2, 4)  # b, gy, gx, c, ky, kx
    return y.reshape(b, (h // 4) * (w // 4), c * 16)


def _fold4(y, h, w, c):
    b, n, d = y.shape
    z = y.reshape(b, h // 4, w // 4, c, 4, 4)
    z = z.transpose(0, 1, 4, 2, 5, 3)  # b, gy, ky, gx, kx, c
    return z.reshape(b, h, w, c)


class SNRModule(nn.Module):
    nf: int = 64
    front_rbs: int = 5
    back_rbs: int = 10
    light_rbs: int = 6
    n_layers: int = 6
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        lrelu = lambda t: nn.leaky_relu(t, negative_slope=0.1)  # noqa: E731
        mask_full = snr_mask(x)
        f1 = lrelu(nn.Conv(self.nf, (3, 3), dtype=self.dtype,
                           name="conv_first_1")(x))
        f2 = lrelu(nn.Conv(self.nf, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="conv_first_2")(f1))
        f3 = lrelu(nn.Conv(self.nf, (3, 3), strides=(2, 2),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="conv_first_3")(f2))
        fea = f3
        for i in range(self.front_rbs):
            fea = ResBlockNoBN(self.nf, dtype=self.dtype, name=f"feat_{i}")(fea)
        fea_light = fea
        for i in range(self.light_rbs):
            fea_light = ResBlockNoBN(self.nf, dtype=self.dtype,
                                     name=f"light_{i}")(fea_light)

        h, w = fea.shape[1], fea.shape[2]
        # nearest-resize the SNR map to feature resolution (x4 down) with
        # torch F.interpolate semantics: src[floor(i * scale)]
        iy = (jnp.arange(h) * (mask_full.shape[1] / h)).astype(jnp.int32)
        ix = (jnp.arange(w) * (mask_full.shape[2] / w)).astype(jnp.int32)
        mask = mask_full[:, iy][:, :, ix]

        fea_unfold = _unfold4(fea)
        mask_unfold = jnp.mean(_unfold4(mask), axis=-1)  # (b, L)
        mask_unfold = jnp.where(mask_unfold <= 0.5, 0.0, mask_unfold)
        key_mask = mask_unfold[:, None, :]  # (b, 1, L)
        y = fea_unfold
        for i in range(self.n_layers):
            y = PatchAttention(dtype=self.dtype, name=f"tl{i}_attn")(y, key_mask)
            y = PatchFFN(dtype=self.dtype, name=f"tl{i}_ffn")(y)
        fea_long = _fold4(y, h, w, self.nf)

        fea = fea_long * (1.0 - mask) + fea_light * mask

        out = fea
        for i in range(self.back_rbs):
            out = ResBlockNoBN(self.nf, dtype=self.dtype, name=f"trunk_{i}")(out)
        out = jnp.concatenate([out, f3], axis=-1)
        out = lrelu(pixel_shuffle(nn.Conv(self.nf * 4, (3, 3), dtype=self.dtype,
                                          name="upconv1")(out), 2))
        out = jnp.concatenate([out, f2], axis=-1)
        out = lrelu(pixel_shuffle(nn.Conv(256, (3, 3), dtype=self.dtype,
                                          name="upconv2")(out), 2))
        out = jnp.concatenate([out, f1], axis=-1)
        out = lrelu(nn.Conv(64, (3, 3), dtype=self.dtype, name="hrconv")(out))
        out = nn.Conv(3, (3, 3), dtype=self.dtype, name="conv_last")(out)
        return {"enhanced": out + x, "snr_map": mask_full}


def _charbonnier_loss():
    def fn(outputs, datapoint):
        diff = outputs["enhanced"] - datapoint["ref_image"]
        return jnp.mean(jnp.sqrt(diff * diff + 1e-6))
    return fn


@MODELS.register(name="snr", arch="snr", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def snr(nf: int = 64, front_rbs: int = 5, back_rbs: int = 10,
        n_layers: int = 6, **kwargs) -> Model:
    return Model(
        name="snr", arch="snr",
        module=SNRModule(nf=nf, front_rbs=front_rbs, back_rbs=back_rbs,
                         n_layers=n_layers),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_charbonnier_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
