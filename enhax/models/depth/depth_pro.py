"""Depth Pro: sharp monocular metric depth (Apple, 2024) — faithful arch.

Native rebuild of the reference's vendored Depth Pro
(mon_extra/vision/depth/depth_pro/src/depth_pro/; EXTRA_MODELS
"depth_pro"), replacing the previous compact sketch:

  * ``DinoViT`` — a DINOv2/timm-style ViT backbone (patch-embed conv,
    cls token, learned pos-embed, pre-norm blocks with LayerScale,
    GELU MLP) using timm's parameter naming so real
    ``vit_large_patch14_dinov2`` checkpoints convert directly.
  * ``DepthProEncoder`` (network/encoder.py:14-332): a 3-level image
    pyramid is split into overlapping 384-px patches (5x5 @ full res
    with 25% overlap, 3x3 @ half res with 50% overlap, 1x1 @ quarter
    res), batched through the ViT, merged back with overlap cropping
    (padding 3/6 feature px), plus two intermediate-block hook features
    from the full-res patches and a separate global image encoder;
    per-scale projection/upsample heads produce 5 encodings.
  * ``MultiresConvDecoder`` (network/decoder.py): DPT feature fusion
    (pre-act residual blocks, deconv upsample, 1x1 out conv).
  * ``FOVNetwork`` (network/fov.py): a fov encoder on the quarter-res
    image + downsampled decoder features -> field-of-view in degrees;
    inverse depth is scaled by W / f_px (depth_pro.py:241-298).

Default preset (vit_factory.py:50-63): dinov2l16_384 — embed 1024,
patch 16, img 384, hooks at blocks (5, 11), encoder dims
(256, 512, 1024, 1024), decoder 256. All dims are parameterizable so
tests run tiny.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model


class _ViTBlock(nn.Module):
    """timm ViT block with LayerScale (DINOv2 style)."""
    dim: int
    heads: int
    mlp_ratio: float = 4.0
    # timm LayerScale default; Depth Anything V2's DINOv2 overrides to 1.0
    ls_init: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b, n, c = x.shape
        hd = c // self.heads
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        qkv = nn.Dense(c * 3, dtype=d, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, hd)
                            .transpose(2, 0, 3, 1, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * hd ** -0.5, axis=-1)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b, n, c)
        y = nn.Dense(c, dtype=d, name="proj")(y)
        ls1 = self.param("ls1",
                         nn.initializers.constant(self.ls_init), (c,))
        x = x + y * ls1
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=d, name="fc1")(y)
        y = nn.Dense(c, dtype=d, name="fc2")(
            jax.nn.gelu(y, approximate=False))
        ls2 = self.param("ls2",
                         nn.initializers.constant(self.ls_init), (c,))
        return x + y * ls2


class DinoViT(nn.Module):
    """DINOv2-style ViT returning (tokens incl. cls, hook features)."""
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    patch: int = 16
    img_size: int = 384
    hook_ids: Sequence[int] = (5, 11)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b = x.shape[0]
        g = self.img_size // self.patch
        y = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=d,
                    name="patch_embed")(x)
        y = y.reshape(b, g * g, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, self.dim))
        y = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), y],
                            axis=1) + pos
        hooks = {}
        for i in range(self.depth):
            y = _ViTBlock(self.dim, self.heads, dtype=d,
                          name=f"block{i}")(y)
            if i in self.hook_ids:
                hooks[i] = y
        y = nn.LayerNorm(epsilon=1e-6, name="norm")(y)
        return y, [hooks[i] for i in self.hook_ids]


def _split(x, overlap_ratio: float, patch_size: int):
    """encoder.py:170-188 sliding-window split -> stacked on batch."""
    stride = int(patch_size * (1 - overlap_ratio))
    size = x.shape[-2]
    steps = -(-(size - patch_size) // stride) + 1
    out = []
    for j in range(steps):
        for i in range(steps):
            out.append(x[:, j * stride:j * stride + patch_size,
                         i * stride:i * stride + patch_size, :])
    return jnp.concatenate(out, axis=0), steps


def _merge(x, batch_size: int, padding: int):
    """encoder.py:190-217 overlap-cropped mosaic merge; x NHWC."""
    steps = int((x.shape[0] // batch_size) ** 0.5)
    idx = 0
    rows = []
    for j in range(steps):
        row = []
        for i in range(steps):
            o = x[batch_size * idx:batch_size * (idx + 1)]
            if padding:
                if j != 0:
                    o = o[:, padding:, :, :]
                if i != 0:
                    o = o[:, :, padding:, :]
                if j != steps - 1:
                    o = o[:, :-padding, :, :]
                if i != steps - 1:
                    o = o[:, :, :-padding, :]
            row.append(o)
            idx += 1
        rows.append(jnp.concatenate(row, axis=2))
    return jnp.concatenate(rows, axis=1)


def _tokens_to_map(t, g: int):
    """Drop cls token, reshape to (B, g, g, C) (encoder.py:219-231)."""
    b = t.shape[0]
    return t[:, 1:, :].reshape(b, g, g, t.shape[-1])


class _ProjUpsample(nn.Module):
    """1x1 projection + N stride-2 deconvs (encoder.py:60-93)."""
    dim_out: int
    ups: int
    dim_int: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        di = self.dim_int if self.dim_int is not None else self.dim_out
        x = nn.Conv(di, (1, 1), use_bias=False, dtype=d, name="proj")(x)
        for i in range(self.ups):
            x = nn.ConvTranspose(self.dim_out, (2, 2), strides=(2, 2),
                                 use_bias=False, transpose_kernel=True,
                                 dtype=d, name=f"up{i}")(x)
        return x


class DepthProEncoder(nn.Module):
    """encoder.py:14-332."""
    dims_encoder: Sequence[int] = (256, 512, 1024, 1024)
    decoder_features: int = 256
    vit_dim: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    patch: int = 16
    backbone_size: int = 384
    hook_ids: tuple = (5, 11)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b = x.shape[0]
        g = self.backbone_size // self.patch
        patch_vit = DinoViT(self.vit_dim, self.vit_depth, self.vit_heads,
                            self.patch, self.backbone_size,
                            hook_ids=self.hook_ids, dtype=d,
                            name="patch_encoder")
        image_vit = DinoViT(self.vit_dim, self.vit_depth, self.vit_heads,
                            self.patch, self.backbone_size,
                            hook_ids=self.hook_ids, dtype=d,
                            name="image_encoder")

        # torch F.interpolate: plain bilinear, NO antialias
        half = jax.image.resize(x, (b, x.shape[1] // 2, x.shape[2] // 2, 3),
                                "bilinear", antialias=False)
        quarter = jax.image.resize(
            x, (b, x.shape[1] // 4, x.shape[2] // 4, 3), "bilinear",
            antialias=False)
        x0p, s0 = _split(x, 0.25, self.backbone_size)
        x1p, s1 = _split(half, 0.5, self.backbone_size)
        pyramid = jnp.concatenate([x0p, x1p, quarter], axis=0)

        enc, hook_feats = patch_vit(pyramid)
        enc = _tokens_to_map(enc, g)
        n0, n1 = x0p.shape[0], x1p.shape[0]
        # reference paddings 3/6 are g/8 and g/4 at g=24 (encoder.py:279-302)
        lat0 = _merge(_tokens_to_map(hook_feats[0], g)[:n0], b, padding=g // 8)
        lat1 = _merge(_tokens_to_map(hook_feats[1], g)[:n0], b, padding=g // 8)
        x0_f = _merge(enc[:n0], b, padding=g // 8)
        x1_f = _merge(enc[n0:n0 + n1], b, padding=g // 4)
        x2_f = enc[n0 + n1:]

        glob, _ = image_vit(quarter)
        glob = _tokens_to_map(glob, g)

        de = list(self.dims_encoder)
        lat0 = _ProjUpsample(self.decoder_features, 3, dim_int=de[0],
                             dtype=d, name="upsample_latent0")(lat0)
        lat1 = _ProjUpsample(de[0], 2, dtype=d, name="upsample_latent1")(lat1)
        x0_f = _ProjUpsample(de[1], 1, dtype=d, name="upsample0")(x0_f)
        x1_f = _ProjUpsample(de[2], 1, dtype=d, name="upsample1")(x1_f)
        x2_f = _ProjUpsample(de[3], 1, dtype=d, name="upsample2")(x2_f)
        glob = nn.ConvTranspose(de[3], (2, 2), strides=(2, 2),
                                transpose_kernel=True, dtype=d,
                                name="upsample_lowres")(glob)
        glob = nn.Conv(de[3], (1, 1), dtype=d, name="fuse_lowres")(
            jnp.concatenate([x2_f, glob], axis=-1))
        return [lat0, lat1, x0_f, x1_f, glob]


class _FusionResBlock(nn.Module):
    """Pre-act residual block (decoder.py:96-117, 180-204)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                    name="conv2")(nn.relu(y))
        return x + y


class _FeatureFusion(nn.Module):
    """decoder.py:120-177 FeatureFusionBlock2d."""
    features: int
    deconv: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x0, x1=None):
        d = self.dtype
        x = x0
        if x1 is not None:
            x = x + _FusionResBlock(self.features, dtype=d,
                                    name="resnet1")(x1)
        x = _FusionResBlock(self.features, dtype=d, name="resnet2")(x)
        if self.deconv:
            x = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                                 use_bias=False, transpose_kernel=True,
                                 dtype=d, name="deconv")(x)
        return nn.Conv(self.features, (1, 1), dtype=d, name="out_conv")(x)


class MultiresConvDecoder(nn.Module):
    """decoder.py:16-93."""
    dims_encoder: Sequence[int]
    dim_decoder: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, encodings):
        d = self.dtype
        n = len(self.dims_encoder)
        feats = encodings[-1]
        feats = nn.Conv(self.dim_decoder, (3, 3), use_bias=False, dtype=d,
                        name=f"conv{n - 1}")(feats)
        lowres = feats
        feats = _FeatureFusion(self.dim_decoder, deconv=True, dtype=d,
                               name=f"fusion{n - 1}")(feats)
        for i in range(n - 2, -1, -1):
            e = encodings[i]
            if i == 0:
                if self.dims_encoder[0] != self.dim_decoder:
                    e = nn.Conv(self.dim_decoder, (1, 1), use_bias=False,
                                dtype=d, name="conv0")(e)
            else:
                e = nn.Conv(self.dim_decoder, (3, 3), use_bias=False,
                            dtype=d, name=f"conv{i}")(e)
            feats = _FeatureFusion(self.dim_decoder, deconv=(i != 0),
                                   dtype=d, name=f"fusion{i}")(feats, e)
        return feats, lowres


class DepthProModule(nn.Module):
    """Full Depth Pro (depth_pro.py:154-298)."""
    dims_encoder: Sequence[int] = (256, 512, 1024, 1024)
    decoder_features: int = 256
    vit_dim: int = 1024
    vit_depth: int = 24
    vit_heads: int = 16
    patch: int = 16
    backbone_size: int = 384
    hook_ids: tuple = (5, 11)
    use_fov: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b, h, w, _ = x.shape
        img_size = self.backbone_size * 4
        resize = (h != img_size) or (w != img_size)
        xi = x
        if resize:
            xi = jax.image.resize(x, (b, img_size, img_size, 3), "bilinear",
                                  antialias=False)
        xi = xi * 2.0 - 1.0  # Normalize(0.5, 0.5)

        encodings = DepthProEncoder(
            self.dims_encoder, self.decoder_features, self.vit_dim,
            self.vit_depth, self.vit_heads, self.patch, self.backbone_size,
            hook_ids=self.hook_ids, dtype=d, name="encoder")(xi)
        feats, lowres = MultiresConvDecoder(
            [self.decoder_features] + list(self.dims_encoder),
            self.decoder_features, dtype=d, name="decoder")(encodings)

        dd = self.decoder_features
        y = nn.Conv(dd // 2, (3, 3), dtype=d, name="head0")(feats)
        y = nn.ConvTranspose(dd // 2, (2, 2), strides=(2, 2),
                             transpose_kernel=True, dtype=d, name="head1")(y)
        y = nn.relu(nn.Conv(32, (3, 3), dtype=d, name="head2")(y))
        canon = nn.relu(nn.Conv(1, (1, 1), dtype=d, name="head4")(y))

        fov_deg = None
        if self.use_fov:
            fov_vit = DinoViT(self.vit_dim, self.vit_depth, self.vit_heads,
                              self.patch, self.backbone_size,
                              hook_ids=self.hook_ids, dtype=d,
                              name="fov_encoder")
            xq = jax.image.resize(
                xi, (b, img_size // 4, img_size // 4, 3), "bilinear",
                antialias=False)
            tokens, _ = fov_vit(xq)
            emb = nn.Dense(dd // 2, dtype=d, name="fov_proj")(tokens[:, 1:])
            g = self.backbone_size // self.patch
            emb = emb.reshape(b, g, g, dd // 2)
            low = nn.relu(nn.Conv(dd // 2, (3, 3), strides=(2, 2),
                                  padding=((1, 1), (1, 1)), dtype=d,
                                  name="fov_down")(
                jax.lax.stop_gradient(lowres)))
            z = emb + low
            z = nn.relu(nn.Conv(dd // 4, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), dtype=d,
                                name="fov_head0")(z))
            z = nn.relu(nn.Conv(dd // 8, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)), dtype=d,
                                name="fov_head1")(z))
            fov_deg = nn.Conv(1, (z.shape[1], z.shape[2]), padding="VALID",
                              dtype=d, name="fov_head2")(z)
            fov_deg = fov_deg.reshape(b)

        inv = canon
        if self.use_fov:
            f_px = 0.5 * w / jnp.tan(0.5 * jnp.deg2rad(
                fov_deg.astype(jnp.float32)))
            inv = canon * (w / f_px)[:, None, None, None]
        if resize:
            inv = jax.image.resize(inv, (b, h, w, 1), "bilinear",
                                   antialias=False)
        depth = 1.0 / jnp.clip(inv, 1e-4, 1e4)
        out = {"depth": depth, "inverse_depth": inv}
        if fov_deg is not None:
            out["fov_deg"] = fov_deg
        return out


def _depth_pro_full_builder(vit_dim: int = 1024, vit_depth: int = 24,
                            vit_heads: int = 16, backbone_size: int = 384,
                            patch: int = 16,
                            decoder_features: int = 256,
                            dims_encoder=(256, 512, 1024, 1024),
                            hook_ids=(5, 11), use_fov: bool = True,
                            **kwargs):
    return Model(
        name="depth_pro", arch="depth_pro",
        module=DepthProModule(dims_encoder=tuple(dims_encoder),
                              decoder_features=decoder_features,
                              vit_dim=vit_dim, vit_depth=vit_depth,
                              vit_heads=vit_heads, patch=patch,
                              backbone_size=backbone_size,
                              hook_ids=tuple(hook_ids), use_fov=use_fov),
        tasks=(Task.DEPTH,), schemes=(Scheme.INFERENCE,),
        required_inputs=("image",), out_key="depth", size_divisor=1,
    )


MODELS.register(name="depth_pro", obj=_depth_pro_full_builder,
                arch="depth_pro", tasks=(Task.DEPTH,),
                schemes=(Scheme.INFERENCE,), replace=True)
