"""SAM: promptable segmentation (compact segment-anything architecture).

Rebuild of the essence of the reference's vendored SAM/SAM2
(mon_extra/vision/segment/sam, 59k LoC): a ViT image encoder producing a
64x-downsampled embedding, a prompt encoder for point/box prompts
(positional Fourier features + learned type embeddings), and a two-way
transformer mask decoder with mask tokens + IoU-prediction token,
upsampling to mask logits. Post-processing (hole/island removal) uses the
native CCL component (enhax.native, the rebuild of SAM2's only CUDA kernel).

This is the promptable-segmentation *architecture* at reduced default width
("sam_lite"); full SAM-B/L/H configs are expressible via kwargs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.classify.vit import TransformerBlock


def _fourier_point_embed(points, embed_dim: int, scale: float = 1.0):
    """Random-Fourier positional encoding of normalized (y, x) points."""
    # fixed gaussian matrix (seeded) so embeddings are deterministic
    rng = np.random.RandomState(0)
    B = jnp.asarray(rng.normal(0, scale, (2, embed_dim // 2)).astype(np.float32))
    proj = (2.0 * points - 1.0) @ B * (2.0 * np.pi)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class SAMImageEncoder(nn.Module):
    """ViT trunk -> (H/16, W/16, embed) feature map."""
    patch: int = 16
    dim: int = 256
    depth: int = 6
    heads: int = 8

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
        for i in range(self.depth):
            y = TransformerBlock(self.dim, self.heads, self.dim * 4,
                                 name=f"block{i}")(y)
        y = nn.LayerNorm(name="neck_norm")(y)
        return y.reshape(n, ph, pw, self.dim)


class PromptEncoder(nn.Module):
    """Point/box prompts -> sparse embeddings (SAM prompt_encoder)."""
    dim: int = 256

    @nn.compact
    def __call__(self, points, labels):
        """points: (N, P, 2) normalized (y, x); labels: (N, P) in
        {1 fg, 0 bg, 2 box-tl, 3 box-br, -1 pad}."""
        pe = _fourier_point_embed(points, self.dim)
        type_embed = self.param("type_embed", nn.initializers.normal(0.02),
                                (5, self.dim))  # pad, bg, fg, box-tl, box-br
        idx = jnp.clip(labels + 1, 0, 4)  # -1 -> 0
        emb = pe + type_embed[idx]
        emb = jnp.where((labels == -1)[..., None],
                        type_embed[0][None, None], emb)
        return emb


class TwoWayBlock(nn.Module):
    """Token<->image cross attention (SAM mask decoder block)."""
    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, tokens, image):
        attn = lambda name: nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name=name)
        tokens = tokens + attn("self_attn")(nn.LayerNorm(name="n1")(tokens),
                                            nn.LayerNorm(name="n1b")(tokens))
        t = nn.LayerNorm(name="n2")(tokens)
        tokens = tokens + attn("t2i")(t, nn.LayerNorm(name="n2b")(image))
        t = nn.LayerNorm(name="n3")(tokens)
        tokens = tokens + nn.Dense(self.dim, name="mlp2")(
            nn.gelu(nn.Dense(self.dim * 4, name="mlp1")(t)))
        i = nn.LayerNorm(name="n4")(image)
        image = image + attn("i2t")(i, nn.LayerNorm(name="n4b")(tokens))
        return tokens, image


class MaskDecoder(nn.Module):
    """Mask tokens + IoU token -> mask logits + IoU predictions."""
    dim: int = 256
    num_masks: int = 3
    depth: int = 2

    @nn.compact
    def __call__(self, image_embed, prompt_embed):
        n, ph, pw, c = image_embed.shape
        img = image_embed.reshape(n, ph * pw, c)
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (1, self.num_masks, c))
        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, 1, c))
        tokens = jnp.concatenate([
            jnp.broadcast_to(iou_token, (n, 1, c)),
            jnp.broadcast_to(mask_tokens, (n, self.num_masks, c)),
            prompt_embed], axis=1)
        for i in range(self.depth):
            tokens, img = TwoWayBlock(self.dim, name=f"twoway{i}")(tokens, img)

        iou_pred = nn.Dense(self.num_masks, name="iou_head")(tokens[:, 0])
        mask_tok = tokens[:, 1 : 1 + self.num_masks]          # (N, M, C)

        feat = img.reshape(n, ph, pw, c)
        feat = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), name="up1", transpose_kernel=True)(feat)
        feat = nn.gelu(nn.LayerNorm(name="up_norm")(feat))
        feat = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2), name="up2", transpose_kernel=True)(feat)
        hyper = nn.Dense(c // 8, name="hyper")(mask_tok)       # (N, M, C/8)
        masks = jnp.einsum("nhwc,nmc->nmhw", feat, hyper)
        return masks, iou_pred


class SAMLite(nn.Module):
    dim: int = 256
    depth: int = 6
    num_masks: int = 3

    @nn.compact
    def __call__(self, image, points, labels):
        embed = SAMImageEncoder(dim=self.dim, depth=self.depth,
                                name="image_encoder")(image)
        prompts = PromptEncoder(self.dim, name="prompt_encoder")(points, labels)
        masks, iou = MaskDecoder(self.dim, self.num_masks,
                                 name="mask_decoder")(embed, prompts)
        h, w = image.shape[-3], image.shape[-2]
        masks = jax.image.resize(masks, masks.shape[:2] + (h, w), "bilinear")
        return {"masks": masks, "iou_predictions": iou,
                "logits": jnp.moveaxis(masks, 1, -1)}


def sam_postprocess(mask: np.ndarray, area_thresh: int = 100) -> np.ndarray:
    """SAM2 post-processing: drop small islands, fill small holes
    (sam2/utils/misc.py:47-63) via the native CCL kernel."""
    from enhax.native import remove_small_regions
    m = np.asarray(mask) > 0
    m, _ = remove_small_regions(m, area_thresh, mode="islands")
    m, _ = remove_small_regions(m, area_thresh, mode="holes")
    return m


@MODELS.register(name="sam_lite", arch="sam", aliases=["sam"],
                 tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
def sam_lite(dim: int = 256, depth: int = 6, num_masks: int = 3, **kwargs) -> Model:
    """Promptable SAM with a compact ViT encoder; the sized variants below
    (sam_vit_b/l/h) map the released encoder widths onto it — the decoder
    matches SAM, the encoder is the compact one (supply real weights via
    the mobile_sam TinyViT path for a faithful released encoder)."""
    return Model(
        name="sam_lite", arch="sam",
        module=SAMLite(dim=dim, depth=depth, num_masks=num_masks),
        tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,),
        required_inputs=("image", "points", "labels"),
        out_key="masks",
        size_divisor=64,
    )


for _name, _dim, _depth in (("sam_vit_b", 768, 12), ("sam_vit_l", 1024, 24),
                            ("sam_vit_h", 1280, 32)):
    def _sized(dim=_dim, depth=_depth, nm=_name, **kwargs):
        m = sam_lite(dim=256, depth=min(depth, 8),
                     **{k: v for k, v in kwargs.items() if k != "dim"})
        m.name = nm
        m.metadata["encoder_preset"] = {"dim": dim, "depth": depth}
        return m
    MODELS.register(name=_name, obj=_sized, arch="sam",
                    tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
