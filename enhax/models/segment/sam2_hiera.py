"""Faithful SAM2: Hiera encoder + RoPE memory attention + SAM2 heads.

Rebuild of the reference's vendored SAM2 model stack at released
hyperparameters (mon_extra/vision/segment/sam2/sam2/modeling/):

  * image encoder: Hiera trunk + FPN neck (enhax.models.segment.hiera,
    hieradet.py:169 / image_encoder.py:44), high-res levels projected by
    the mask decoder's conv_s0/s1 (sam2_base.py:467-476 forward_image).
  * memory attention (memory_attention.py:17-169): per layer RoPE
    self-attention on frame tokens, RoPE cross-attention into memory
    tokens (spatial memories rotary-encoded with per-frame repeated
    frequencies; object-pointer tokens excluded from RoPE), relu FFN.
    RoPE = 2D axial rotary embedding (position_encoding.py:167-221).
  * memory encoder (memory_encoder.py:17-181): MaskDownSampler (strided
    conv + token LayerNorm + GELU to 1/16), pix_feat 1x1 proj, ConvNeXt
    CXBlock fuser, 1x1 out_proj to mem_dim 64, sine position encoding.
  * SAM2 mask decoder (sam/mask_decoder.py:15-295): SAM's two-way
    transformer plus an object-score token, high-res skip features in the
    upscaling path, 3-layer hypernetwork MLPs, sigmoid IoU head, and an
    object-score MLP head.
  * orchestration (sam2_base.py): no_mem_embed on conditioning frames
    (directly_add_no_mem_embed), maskmem_tpos_enc temporal slot
    embeddings, object pointers (obj_ptr_proj MLP, fixed_no_obj_ptr
    blending, split into mem_dim tokens), sigmoid scale/bias 20/-10 on
    memory masks, best-IoU multimask selection.

TPU design: video propagation is a ``lax.scan`` over frames carrying a
FIXED-SIZE memory: the conditioning frame's memory + a FIFO of the last
``num_maskmem - 1`` frame memories (eval stride 1 == the reference's
frame selection, sam2_base.py:539-566) and a FIFO of object pointers —
static shapes, one compiled step for any clip length.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.segment.hiera import (HIERA_CONFIGS, SAM2ImageEncoder,
                                        sine_position_encoding)
from enhax.models.segment.sam import SAMPromptEncoder, SAMTwoWayBlock, _SAMAttention

NO_OBJ_SCORE = -1024.0  # sam2_base.py:25


# ---------------------------------------------------------------------------
# RoPE (position_encoding.py:167-221)
# ---------------------------------------------------------------------------


def compute_axial_freqs(head_dim: int, end_x: int, end_y: int,
                        theta: float = 10000.0):
    """compute_axial_cis as (cos, sin) pairs, shape (end_x*end_y, head_dim/2)."""
    n = head_dim // 4
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 4)[:n] / head_dim))
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = t // end_x
    ang_x = np.outer(t_x, freqs)
    ang_y = np.outer(t_y, freqs)
    ang = np.concatenate([ang_x, ang_y], axis=-1)  # (L, head_dim/2)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def apply_rotary(x, cos, sin, repeat: int = 1):
    """x: (B, heads, L, head_dim) as interleaved complex pairs."""
    if repeat > 1:
        cos = jnp.tile(cos, (repeat, 1))
        sin = jnp.tile(sin, (repeat, 1))
    xr = x[..., 0::2]
    xi = x[..., 1::2]
    orr = xr * cos - xi * sin
    oi = xr * sin + xi * cos
    return jnp.stack([orr, oi], axis=-1).reshape(x.shape)


class RoPEAttention(nn.Module):
    """sam/transformer.py:289 RoPEAttention (q/k/v/out projections, rotary
    on q and the first ``L_k - num_k_exclude`` keys)."""
    dim: int
    heads: int
    kv_in_dim: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v, feat_hw, num_k_exclude: int = 0,
                 rope_k_repeat: bool = False, key_mask=None):
        hd = self.dim // self.heads
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        qp = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)

        def heads_of(t):
            return t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)

        qp, kp, vp = heads_of(qp), heads_of(kp), heads_of(vp)
        h, w = feat_hw
        cos, sin = compute_axial_freqs(hd, w, h)
        qp = apply_rotary(qp, cos, sin)
        n_rope = lk - num_k_exclude
        if n_rope > 0:
            rep = n_rope // lq if rope_k_repeat else 1
            k_rope = apply_rotary(kp[:, :, :n_rope], cos, sin, repeat=rep)
            kp = jnp.concatenate([k_rope, kp[:, :, n_rope:]], axis=2) \
                if num_k_exclude > 0 else k_rope
        attn = jnp.einsum("bhqd,bhkd->bhqk", qp, kp) / math.sqrt(hd)
        if key_mask is not None:
            # masking == excluding the keys from the softmax: exact
            # variable-length memory on a static token layout
            neg = jnp.finfo(attn.dtype).min / 2
            attn = jnp.where(key_mask[:, None, None, :], attn, neg)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vp)
        out = out.transpose(0, 2, 1, 3).reshape(b, lq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


# ---------------------------------------------------------------------------
# Memory attention (memory_attention.py)
# ---------------------------------------------------------------------------


class SAM2MemoryAttentionLayer(nn.Module):
    """memory_attention.py:18-115 with the released config-t flags:
    pos_enc_at_attn=False, cross-attn keys carry pos, queries don't."""
    dim: int = 256
    mem_dim: int = 64
    ffn_dim: int = 2048

    @nn.compact
    def __call__(self, tgt, memory, memory_pos, feat_hw, num_obj_ptr_tokens,
                 key_mask=None):
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt)
        tgt = tgt + RoPEAttention(self.dim, 1, name="self_attn")(
            y, y, y, feat_hw)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt)
        tgt = tgt + RoPEAttention(self.dim, 1, name="cross_attn_image")(
            y, memory + memory_pos, memory, feat_hw,
            num_k_exclude=num_obj_ptr_tokens, rope_k_repeat=True,
            key_mask=key_mask)
        y = nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt)
        y = nn.Dense(self.ffn_dim, name="linear1")(y)
        y = nn.Dense(self.dim, name="linear2")(nn.relu(y))
        return tgt + y


class SAM2MemoryAttention(nn.Module):
    """memory_attention.py:120-169 (pos_enc_at_input: + 0.1 * curr_pos)."""
    dim: int = 256
    layers: int = 4

    @nn.compact
    def __call__(self, curr, curr_pos, memory, memory_pos, feat_hw,
                 num_obj_ptr_tokens, key_mask=None):
        out = curr + 0.1 * curr_pos
        for i in range(self.layers):
            out = SAM2MemoryAttentionLayer(self.dim, name=f"layer{i}")(
                out, memory, memory_pos, feat_hw, num_obj_ptr_tokens,
                key_mask=key_mask)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(out)


# ---------------------------------------------------------------------------
# Memory encoder (memory_encoder.py)
# ---------------------------------------------------------------------------


class SAM2MemoryEncoder(nn.Module):
    """memory_encoder.py:138-181 at the released config (MaskDownSampler
    k3/s2/p1 x4 to 1/16, 2 CXBlock fuse layers, out_dim 64)."""
    dim: int = 256
    mem_dim: int = 64
    fuse_layers: int = 2
    down_layers: int = 4

    @nn.compact
    def __call__(self, pix_feat, masks):
        """pix_feat: (N, h, w, dim); masks: (N, H, W, 1) ALREADY sigmoided
        + scaled (sam2_base.py:703-710 applies sigmoid*20-10 before)."""
        y = masks
        ch = 1
        for i in range(self.down_layers):
            ch = ch * 4
            y = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"down{i}")(y)
            y = nn.LayerNorm(epsilon=1e-6, name=f"down_norm{i}")(y)
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="down_out")(y)

        x = nn.Dense(self.dim, name="pix_feat_proj")(pix_feat) + y
        for i in range(self.fuse_layers):
            z = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                        padding=((3, 3), (3, 3)), name=f"fuse{i}_dwconv")(x)
            z = nn.LayerNorm(epsilon=1e-6, name=f"fuse{i}_norm")(z)
            z = nn.Dense(self.dim * 4, name=f"fuse{i}_pwconv1")(z)
            z = nn.gelu(z, approximate=False)
            z = nn.Dense(self.dim, name=f"fuse{i}_pwconv2")(z)
            gamma = self.param(f"fuse{i}_gamma",
                               nn.initializers.constant(1e-6), (self.dim,))
            x = x + gamma * z
        x = nn.Dense(self.mem_dim, name="out_proj")(x)
        pos = sine_position_encoding(x.shape[1], x.shape[2], self.mem_dim)
        return x, pos


# ---------------------------------------------------------------------------
# SAM2 mask decoder (sam/mask_decoder.py)
# ---------------------------------------------------------------------------


def _mlp(x, dims, name_prefix, mk, sigmoid=False):
    for i, d in enumerate(dims):
        x = mk(d, f"{name_prefix}_l{i}")(x)
        if i < len(dims) - 1:
            x = nn.relu(x)
    return jax.nn.sigmoid(x) if sigmoid else x


class SAM2MaskDecoder(nn.Module):
    """mask_decoder.py:15-295 at the released flags (high-res features,
    obj scores w/ MLP head, sigmoid IoU, multimask token for obj ptr)."""
    dim: int = 256
    heads: int = 8
    depth: int = 2
    mlp_dim: int = 2048
    num_multimask: int = 3
    iou_hidden: int = 256

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse, dense,
                 high_res_feats, multimask: bool):
        n_tok = self.num_multimask + 1
        c = self.dim
        obj_token = self.param("obj_score_token", nn.initializers.normal(1.0),
                               (1, c))
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_tok, c))
        b = sparse.shape[0]
        tokens = jnp.concatenate([
            jnp.broadcast_to(obj_token[None], (b, 1, c)),
            jnp.broadcast_to(iou_token[None], (b, 1, c)),
            jnp.broadcast_to(mask_tokens[None], (b, n_tok, c)),
            sparse], axis=1)
        src = image_embed + dense
        eh, ew = src.shape[1:3]
        keys = src.reshape(b, eh * ew, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, eh * ew, c),
                                  (b, eh * ew, c))
        queries = tokens
        for i in range(self.depth):
            queries, keys = SAMTwoWayBlock(
                c, self.heads, self.mlp_dim, skip_first_pe=(i == 0),
                name=f"layer{i}")(queries, keys, tokens, key_pe)
        q = queries + tokens
        k = keys + key_pe
        queries = queries + _SAMAttention(c, self.heads, 2,
                                          name="final_t2i")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final")(queries)

        obj_out = queries[:, 0]
        iou_out = queries[:, 1]
        mask_out = queries[:, 2:2 + n_tok]

        feat = keys.reshape(b, eh, ew, c)
        feat_s0, feat_s1 = high_res_feats  # already conv_s0/s1-projected
        feat = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                                padding="SAME", transpose_kernel=True,
                                name="up1")(feat) + feat_s1
        feat = nn.gelu(nn.LayerNorm(epsilon=1e-6, name="up_ln")(feat),
                       approximate=False)
        feat = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                                padding="SAME", transpose_kernel=True,
                                name="up2")(feat) + feat_s0
        feat = nn.gelu(feat, approximate=False)

        mk = lambda d, nm: nn.Dense(d, name=nm)  # noqa: E731
        hypers = [
            _mlp(mask_out[:, i], (c, c, c // 8), f"hyper{i}", mk)
            for i in range(n_tok)]
        hyper = jnp.stack(hypers, axis=1)
        masks = jnp.einsum("nmc,nhwc->nmhw", hyper, feat)
        iou = _mlp(iou_out, (self.iou_hidden, self.iou_hidden, n_tok),
                   "iou", mk, sigmoid=True)  # iou_prediction_use_sigmoid
        obj_score = _mlp(obj_out, (c, c, 1), "obj", mk)  # pred_obj_scores_mlp

        if multimask:
            out_masks = masks[:, 1:]
            out_iou = iou[:, 1:]
            sam_tokens = mask_out[:, 1:]  # use_multimask_token_for_obj_ptr
        else:
            out_masks = masks[:, :1]
            out_iou = iou[:, :1]
            sam_tokens = mask_out[:, :1]
        return out_masks, out_iou, sam_tokens, obj_score


# ---------------------------------------------------------------------------
# Full model (sam2_base.py orchestration)
# ---------------------------------------------------------------------------


class SAM2Hiera(nn.Module):
    """Faithful SAM2 at released hyperparameters; single-frame call is the
    initial-conditioning path (directly_add_no_mem_embed), ``track`` is the
    memory-conditioned step used by the video propagator."""
    variant: str = "t"
    dim: int = 256
    mem_dim: int = 64
    num_maskmem: int = 7
    max_obj_ptrs: int = 16
    mem_layers: int = 4
    image_size: int = 1024   # sam2_hiera_t.yaml image_size; inputs must match
    trunk_overrides: Any = None   # dict: shrink the trunk for CPU tests

    def setup(self):
        cfg = dict(HIERA_CONFIGS[self.variant])
        if self.trunk_overrides:
            cfg.update(self.trunk_overrides)
        self.image_encoder = SAM2ImageEncoder(
            d_model=self.dim, scalp=1, name="image_encoder", **cfg)
        self.memory_attention = SAM2MemoryAttention(
            self.dim, self.mem_layers, name="memory_attention")
        self.memory_encoder = SAM2MemoryEncoder(
            self.dim, self.mem_dim, name="memory_encoder")
        self.prompt_encoder = SAMPromptEncoder(
            self.dim, input_size=(self.image_size, self.image_size),
            embed_size=(self.image_size // 16, self.image_size // 16),
            name="sam_prompt_encoder")
        self.mask_decoder = SAM2MaskDecoder(self.dim, name="sam_mask_decoder")
        # high-res skip projections live on the decoder in the reference
        # checkpoints (sam_mask_decoder.conv_s0/s1)
        self.conv_s0 = nn.Dense(self.dim // 8, name="conv_s0")
        self.conv_s1 = nn.Dense(self.dim // 4, name="conv_s1")
        self.maskmem_tpos_enc = self.param(
            "maskmem_tpos_enc", nn.initializers.normal(0.02),
            (self.num_maskmem, 1, 1, self.mem_dim))
        self.no_mem_embed = self.param(
            "no_mem_embed", nn.initializers.normal(0.02), (1, 1, self.dim))
        self.no_obj_ptr = self.param(
            "no_obj_ptr", nn.initializers.normal(0.02), (1, self.dim))
        self.obj_ptr_mlps = [nn.Dense(self.dim, name=f"obj_ptr_proj_l{i}")
                             for i in range(3)]

    def _obj_ptr_proj(self, t):
        for i, lin in enumerate(self.obj_ptr_mlps):
            t = lin(t) if i == 2 else nn.relu(lin(t))
        return t

    def _encode_image(self, image):
        out = self.image_encoder(image)
        s0, s1, feat = out["backbone_fpn"]
        pos = out["vision_pos_enc"][-1]
        return self.conv_s0(s0), self.conv_s1(s1), feat, pos

    def _sam_heads(self, feat, high_res, points, labels, multimask=True):
        """_forward_sam_heads (sam2_base.py:257-414): points pixel (x, y)."""
        b, h, w = feat.shape[0], feat.shape[1] * 16, feat.shape[2] * 16
        eh, ew = feat.shape[1:3]
        sparse, dense, dense_pe = self.prompt_encoder(points, labels)
        masks, iou, sam_tokens, obj_score = self.mask_decoder(
            feat, dense_pe, sparse, dense, high_res, multimask)
        # hard no-object choice on masks (sam2_base.py:362-369)
        is_obj = obj_score > 0
        masks = jnp.where(is_obj[:, :, None, None], masks, NO_OBJ_SCORE)
        masks_hr = jax.image.resize(masks.astype(jnp.float32),
                                    masks.shape[:2] + (h, w), "bilinear")
        if multimask:
            best = jnp.argmax(iou, axis=-1)
            low = jnp.take_along_axis(masks, best[:, None, None, None],
                                      axis=1)
            high = jnp.take_along_axis(masks_hr, best[:, None, None, None],
                                       axis=1)
            token = jnp.take_along_axis(sam_tokens, best[:, None, None],
                                        axis=1)[:, 0]
        else:
            low, high, token = masks, masks_hr, sam_tokens[:, 0]
        obj_ptr = self._obj_ptr_proj(token)
        lam = is_obj.astype(obj_ptr.dtype)  # fixed_no_obj_ptr
        obj_ptr = lam * obj_ptr + (1 - lam) * self.no_obj_ptr
        return masks, masks_hr, iou, low, high, obj_ptr, obj_score

    def _encode_memory(self, feat, high_res_mask, obj_score):
        """_encode_new_memory (sam2_base.py:677-725): sigmoid*20-10."""
        m = jax.nn.sigmoid(high_res_mask) * 20.0 - 10.0
        mem, mem_pos = self.memory_encoder(feat, jnp.moveaxis(m, 1, -1))
        return mem, mem_pos

    def __call__(self, image, points, labels):
        """Initial conditioning frame. Points normalized (y, x) — the
        enhax SAM convention; converted to pixel (x, y) here."""
        h, w = image.shape[1:3]
        pts = jnp.stack([points[..., 1] * w, points[..., 0] * h], axis=-1)
        s0, s1, feat, _ = self._encode_image(image)
        feat_c = feat + self.no_mem_embed.reshape(1, 1, 1, self.dim)
        masks, masks_hr, iou, low, high, obj_ptr, obj_score = \
            self._sam_heads(feat_c, (s0, s1), pts, labels, multimask=True)
        # memory is encoded from the RAW backbone feature, not the
        # no_mem_embed-conditioned one (_encode_new_memory uses
        # current_vision_feats, sam2_base.py:684-690)
        mem, mem_pos = self._encode_memory(feat, high, obj_score)
        return {"masks": masks_hr, "iou_predictions": iou,
                "low_res_masks": masks, "pred_mask": high[:, 0],
                "obj_ptr": obj_ptr, "object_score_logits": obj_score,
                "memory": mem, "memory_pos": mem_pos}

    def track(self, image, cond_mem, cond_ptr,
              bank, bank_valid, ptrs, ptrs_valid):
        """Memory-conditioned step (sam2_base.py _track_step, stride 1).

        cond_mem: (B, mh, mw, mem_dim) frame-0 memory; bank: FIFO
        (B, num_maskmem-1, mh, mw, mem_dim) earliest..latest with validity
        (B, num_maskmem-1); ptrs: (B, max_obj_ptrs-1, dim) most recent
        first + validity. Returns outputs + updated FIFOs.
        """
        b, h, w = image.shape[0], image.shape[1], image.shape[2]
        s0, s1, feat, feat_pos = self._encode_image(image)
        eh, ew = feat.shape[1:3]
        mh, mw = cond_mem.shape[1:3]
        lmem = mh * mw
        mem_pos_base = sine_position_encoding(mh, mw, self.mem_dim)

        # memory token list: cond frame (t_pos 0) then FIFO (t_pos 1..6)
        n_slots = 1 + bank.shape[1]
        mems = jnp.concatenate([cond_mem[:, None], bank], axis=1)
        tpos = jnp.concatenate(
            [self.maskmem_tpos_enc[self.num_maskmem - 1][None],
             self.maskmem_tpos_enc[self.num_maskmem - 2::-1]], axis=0)
        mem_pos = mem_pos_base[None] + tpos[None, :, None]
        mem_tokens = mems.reshape(b, n_slots * lmem, self.mem_dim)
        mem_pos_tokens = jnp.broadcast_to(
            mem_pos.reshape(1, n_slots, mh * mw, self.mem_dim),
            (b, n_slots, lmem, self.mem_dim)).reshape(
            b, n_slots * lmem, self.mem_dim)
        # empty FIFO slots are EXCLUDED from the cross-attention softmax via
        # a key mask — exact equivalence with the reference, which simply
        # doesn't concatenate absent frames (sam2_base.py memory selection);
        # the static token layout stays scan/jit-friendly
        valid = jnp.concatenate(
            [jnp.ones((b, 1), bool), bank_valid], axis=1)     # (b, n_slots)
        mem_mask = jnp.repeat(valid, lmem, axis=1)

        # object pointers: cond ptr + recent ptrs, split into mem_dim tokens
        n_ptr = 1 + ptrs.shape[1]
        all_ptrs = jnp.concatenate([cond_ptr[:, None], ptrs], axis=1)
        split = self.dim // self.mem_dim
        ptr_tokens = all_ptrs.reshape(b, n_ptr, split, self.mem_dim)
        ptr_tokens = ptr_tokens.reshape(b, n_ptr * split, self.mem_dim)
        ptr_pos = jnp.zeros_like(ptr_tokens)
        num_obj_ptr_tokens = n_ptr * split
        pvalid = jnp.concatenate(
            [jnp.ones((b, 1), bool), ptrs_valid], axis=1)     # (b, n_ptr)
        ptr_mask = jnp.repeat(pvalid, split, axis=1)

        memory = jnp.concatenate([mem_tokens, ptr_tokens], axis=1)
        memory_pos = jnp.concatenate([mem_pos_tokens, ptr_pos], axis=1)
        key_mask = jnp.concatenate([mem_mask, ptr_mask], axis=1)

        curr = feat.reshape(b, eh * ew, self.dim)
        curr_pos = jnp.broadcast_to(
            feat_pos.reshape(1, eh * ew, self.dim), curr.shape)
        cond = self.memory_attention(curr, curr_pos, memory, memory_pos,
                                     (eh, ew), num_obj_ptr_tokens,
                                     key_mask=key_mask)
        feat_m = cond.reshape(b, eh, ew, self.dim)

        empty_pts = jnp.zeros((b, 1, 2), jnp.float32)
        empty_lbl = -jnp.ones((b, 1), jnp.int32)
        masks, masks_hr, iou, low, high, obj_ptr, obj_score = \
            self._sam_heads(feat_m, (s0, s1), empty_pts, empty_lbl,
                            multimask=True)
        # raw backbone feature for memory (sam2_base.py:684-690)
        mem, mem_pos_new = self._encode_memory(feat, high, obj_score)
        return {"masks": masks_hr, "iou_predictions": iou,
                "pred_mask": high[:, 0], "obj_ptr": obj_ptr,
                "object_score_logits": obj_score, "memory": mem}


def init_sam2_video_variables(model: Model, rng, frame, points, labels):
    """Init all params (incl. memory attention/encoder) by tracing both the
    conditioning call and one track step."""
    module: SAM2Hiera = model.module
    h, w = frame.shape[-3], frame.shape[-2]
    mh, mw = h // 16, w // 16
    b = frame.shape[0]
    bank = jnp.zeros((b, module.num_maskmem - 1, mh, mw, module.mem_dim))
    ptrs = jnp.zeros((b, module.max_obj_ptrs - 1, module.dim))
    cond_mem = jnp.zeros((b, mh, mw, module.mem_dim))
    cond_ptr = jnp.zeros((b, module.dim))
    variables = module.init(
        rng, frame, cond_mem, cond_ptr, bank,
        jnp.ones((b, module.num_maskmem - 1), bool), ptrs,
        jnp.ones((b, module.max_obj_ptrs - 1), bool), method=SAM2Hiera.track)
    # conditioning call shares all params with track (same submodules)
    return variables


def make_sam2_video_propagator(model: Model):
    """fn(variables, frames, points, labels) -> (T, H, W) mask logits.

    Frame 0 is the conditioning frame. The FIFO starts EMPTY (all slots
    invalid) and fills as frames arrive; invalid slots are excluded from
    the memory attention by the key mask, so the first num_maskmem-1
    frames attend over exactly the frames that exist — the reference's
    memory selection — on a statically-shaped scan carry.
    """
    module: SAM2Hiera = model.module
    n_fifo = module.num_maskmem - 1
    n_ptr = module.max_obj_ptrs - 1

    def fn(variables, frames, points, labels):
        t, h, w, _ = frames.shape
        out0 = module.apply(variables, frames[0:1], points, labels)
        cond_mem, cond_ptr = out0["memory"], out0["obj_ptr"]
        bank = jnp.zeros((1, n_fifo) + cond_mem.shape[1:], cond_mem.dtype)
        ptrs = jnp.zeros((1, n_ptr, module.dim), cond_ptr.dtype)
        valid = jnp.zeros((1, n_fifo), bool)
        pvalid = jnp.zeros((1, n_ptr), bool)

        def step(carry, frame):
            bank, valid, ptrs, pvalid = carry
            out = module.apply(variables, frame[None], cond_mem,
                               cond_ptr, bank, valid, ptrs, pvalid,
                               method=SAM2Hiera.track)
            bank2 = jnp.concatenate([bank[:, 1:], out["memory"][:, None]], 1)
            valid2 = jnp.concatenate(
                [valid[:, 1:], jnp.ones((1, 1), bool)], 1)
            ptrs2 = jnp.concatenate([out["obj_ptr"][:, None], ptrs[:, :-1]],
                                    1)
            pvalid2 = jnp.concatenate(
                [jnp.ones((1, 1), bool), pvalid[:, :-1]], 1)
            return (bank2, valid2, ptrs2, pvalid2), out["pred_mask"][0]

        if t > 1:
            _, rest = jax.lax.scan(step, (bank, valid, ptrs, pvalid),
                                   frames[1:])
            masks = jnp.concatenate([out0["pred_mask"], rest], axis=0)
        else:
            masks = out0["pred_mask"]
        return masks

    return fn


def _make_sam2(variant: str, name: str, image_size: int = 1024,
               max_obj_ptrs: int = 16, trunk_overrides=None,
               num_maskmem: int = 7, **kwargs) -> Model:
    return Model(
        name=name, arch="sam2",
        module=SAM2Hiera(variant=variant, image_size=image_size,
                         max_obj_ptrs=max_obj_ptrs, num_maskmem=num_maskmem,
                         trunk_overrides=trunk_overrides),
        tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,),
        required_inputs=("image", "points", "labels"),
        out_key="masks",
        size_divisor=32,
        metadata={"video": True},
    )


for _v, _nm in (("t", "sam2_hiera_t"), ("s", "sam2_hiera_s"),
                ("b+", "sam2_hiera_b+"), ("l", "sam2_hiera_l")):
    def _builder(variant=_v, nm=_nm, image_size: int = 1024,
                 max_obj_ptrs: int = 16, trunk_overrides=None,
                 num_maskmem: int = 7, **kwargs):
        return _make_sam2(variant, nm, image_size=image_size,
                          max_obj_ptrs=max_obj_ptrs,
                          trunk_overrides=trunk_overrides,
                          num_maskmem=num_maskmem)
    MODELS.register(name=_nm, obj=_builder, arch="sam2",
                    tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
