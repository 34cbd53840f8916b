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
            nn.gelu(nn.Dense(self.dim * 4, name="mlp1")(t), approximate=False))
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
        feat = nn.gelu(nn.LayerNorm(name="up_norm")(feat), approximate=False)
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


# ---------------------------------------------------------------------------
# Faithful SAM (segment_anything/modeling/*.py) — the released architecture
# ---------------------------------------------------------------------------


class SAMPromptEncoder(nn.Module):
    """prompt_encoder.py:17-176: random-Fourier point PE + learned type
    embeddings; box corners; conv mask path; dense no-mask embedding.
    Points are PIXEL (x, y) coords in the input image frame."""
    dim: int = 256
    input_size: tuple = (1024, 1024)
    embed_size: tuple = (64, 64)
    mask_chans: int = 16

    def _pe(self, coords01, gauss):
        c = 2 * coords01 - 1
        c = (2 * jnp.pi) * (c @ gauss)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)

    @nn.compact
    def __call__(self, points, labels, boxes=None, masks=None):
        gauss = self.param("pe_gauss", nn.initializers.normal(1.0),
                           (2, self.dim // 2))
        pt_emb = [self.param(f"point_embed{i}", nn.initializers.normal(1.0),
                             (1, self.dim)) for i in range(4)]
        not_a_point = self.param("not_a_point", nn.initializers.normal(1.0),
                                 (1, self.dim))
        no_mask = self.param("no_mask", nn.initializers.normal(1.0),
                             (1, self.dim))
        b = points.shape[0]
        labels = jnp.asarray(labels, jnp.int32)
        if boxes is None:
            # prompt_encoder.py:83-89 pad with a (0,0)/-1 sentinel
            points = jnp.concatenate(
                [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), jnp.int32)], axis=1)
        coords = (points + 0.5) / jnp.array(
            [self.input_size[1], self.input_size[0]], points.dtype)
        emb = self._pe(coords, gauss)
        emb = jnp.where((labels == -1)[..., None], not_a_point[None], emb)
        emb = jnp.where((labels == 0)[..., None], emb + pt_emb[0][None], emb)
        emb = jnp.where((labels == 1)[..., None], emb + pt_emb[1][None], emb)
        sparse = emb
        if boxes is not None:
            corners = (boxes.reshape(b, -1, 2, 2) + 0.5) / jnp.array(
                [self.input_size[1], self.input_size[0]], boxes.dtype)
            ce = self._pe(corners, gauss)
            ce = ce.at[:, :, 0].add(pt_emb[2])
            ce = ce.at[:, :, 1].add(pt_emb[3])
            sparse = jnp.concatenate([sparse, ce.reshape(b, -1, self.dim)],
                                     axis=1)
        eh, ew = self.embed_size
        if masks is not None:
            m = nn.Conv(self.mask_chans // 4, (2, 2), strides=(2, 2),
                        name="md_conv1")(masks)
            m = nn.gelu(nn.LayerNorm(name="md_ln1")(m), approximate=False)
            m = nn.Conv(self.mask_chans, (2, 2), strides=(2, 2),
                        name="md_conv2")(m)
            m = nn.gelu(nn.LayerNorm(name="md_ln2")(m), approximate=False)
            dense = nn.Conv(self.dim, (1, 1), name="md_conv3")(m)
        else:
            dense = jnp.broadcast_to(no_mask.reshape(1, 1, 1, self.dim),
                                     (b, eh, ew, self.dim))
        # get_dense_pe (prompt_encoder.py:62-71): pixel-center grid
        gy = (jnp.arange(eh) + 0.5) / eh
        gx = (jnp.arange(ew) + 0.5) / ew
        grid = jnp.stack(jnp.meshgrid(gx, gy), axis=-1)      # (eh, ew, 2) xy
        dense_pe = self._pe(grid, gauss)[None]
        return sparse, dense, dense_pe


class _SAMAttention(nn.Module):
    """transformer.py:185-240: q/k/v/out projections with optional
    channel downsampling."""
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        inner = self.dim // self.downsample
        hd = inner // self.heads

        def heads_of(t):
            return t.reshape(*t.shape[:2], self.heads, hd).transpose(0, 2, 1, 3)

        q = heads_of(nn.Dense(inner, name="q_proj")(q))
        k = heads_of(nn.Dense(inner, name="k_proj")(k))
        v = heads_of(nn.Dense(inner, name="v_proj")(v))
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(hd), axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(out.shape[0], -1, inner)
        return nn.Dense(self.dim, name="out_proj")(out)


class SAMTwoWayBlock(nn.Module):
    """transformer.py:107-182."""
    dim: int
    heads: int
    mlp_dim: int = 2048
    skip_first_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_pe:
            queries = _SAMAttention(self.dim, self.heads,
                                    name="self_attn")(queries, queries,
                                                      queries)
        else:
            q = queries + query_pe
            queries = queries + _SAMAttention(self.dim, self.heads,
                                              name="self_attn")(q, q, queries)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = queries + _SAMAttention(self.dim, self.heads, 2,
                                          name="t2i")(q, k, keys)
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)
        y = nn.Dense(self.mlp_dim, name="lin1")(queries)
        queries = queries + nn.Dense(self.dim, name="lin2")(nn.relu(y))
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)
        q = queries + query_pe
        k = keys + key_pe
        keys = keys + _SAMAttention(self.dim, self.heads, 2,
                                    name="i2t")(k, q, queries)
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class SAMMaskDecoder(nn.Module):
    """mask_decoder.py:17-151 + TwoWayTransformer (transformer.py:14-104)."""
    dim: int = 256
    heads: int = 8
    depth: int = 2
    mlp_dim: int = 2048
    num_multimask: int = 3
    iou_hidden: int = 256

    @nn.compact
    def __call__(self, image_embed, image_pe, sparse, dense,
                 multimask: bool = True):
        n_tok = self.num_multimask + 1
        c = self.dim
        iou_token = self.param("iou_token", nn.initializers.normal(1.0),
                               (1, c))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(1.0),
                                 (n_tok, c))
        b = sparse.shape[0]
        tokens = jnp.concatenate([
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

        iou_out = queries[:, 0]
        mask_out = queries[:, 1:1 + n_tok]
        feat = keys.reshape(b, eh, ew, c)
        feat = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                                padding="SAME", transpose_kernel=True,
                                name="up1")(feat)
        feat = nn.gelu(nn.LayerNorm(epsilon=1e-6, name="up_ln")(feat),
                       approximate=False)
        feat = nn.ConvTranspose(c // 8, (2, 2), strides=(2, 2),
                                padding="SAME", transpose_kernel=True,
                                name="up2")(feat)
        feat = nn.gelu(feat, approximate=False)
        hypers = []
        for i in range(n_tok):
            hy = mask_out[:, i]
            hy = nn.relu(nn.Dense(c, name=f"hyper{i}_l0")(hy))
            hy = nn.relu(nn.Dense(c, name=f"hyper{i}_l1")(hy))
            hy = nn.Dense(c // 8, name=f"hyper{i}_l2")(hy)
            hypers.append(hy)
        hyper = jnp.stack(hypers, axis=1)                    # (B, n_tok, c/8)
        masks = jnp.einsum("nmc,nhwc->nmhw", hyper, feat)
        y = nn.relu(nn.Dense(self.iou_hidden, name="iou_l0")(iou_out))
        y = nn.relu(nn.Dense(self.iou_hidden, name="iou_l1")(y))
        iou = nn.Dense(n_tok, name="iou_l2")(y)
        if multimask:
            return masks[:, 1:], iou[:, 1:]
        return masks[:, :1], iou[:, :1]


class SAMImageEncoderViT(nn.Module):
    """image_encoder.py:15-395 (ViTDet): windowed attention with
    decomposed relative positions, global blocks, LN neck."""
    img_size: int = 1024
    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12
    out_chans: int = 256
    window: int = 14
    global_idx: tuple = (2, 5, 8, 11)

    @nn.compact
    def __call__(self, x):
        n, h, w, _ = x.shape
        y = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), name="patch_embed")(x)
        g = self.img_size // self.patch
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, g, g, self.dim))
        gh, gw = h // self.patch, w // self.patch
        if (gh, gw) != (g, g):
            # checkpoints store a (img_size/patch)^2 grid; interpolate to the
            # actual token grid (standard ViTDet practice) so any
            # size_divisor=16 input works
            pos = jax.image.resize(pos, (1, gh, gw, self.dim), "bilinear")
        y = y + pos
        for i in range(self.depth):
            win = 0 if i in tuple(self.global_idx) else self.window
            y = _SAMViTBlock(self.dim, self.heads, win, g,
                             name=f"block{i}")(y)
        y = nn.Conv(self.out_chans, (1, 1), use_bias=False,
                    name="neck_conv1")(y)
        y = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(y)
        y = nn.Conv(self.out_chans, (3, 3), use_bias=False,
                    name="neck_conv2")(y)
        return nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(y)


class _SAMViTBlock(nn.Module):
    dim: int
    heads: int
    window: int
    grid: int

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.window:
            ws = self.window
            pad_h = (ws - h % ws) % ws
            pad_w = (ws - w % ws) % ws
            yp = jnp.pad(y, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
            hp, wp = h + pad_h, w + pad_w
            yw = yp.reshape(n, hp // ws, ws, wp // ws, ws, c)
            yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
            yw = _SAMRelAttention(self.dim, self.heads, ws, ws,
                                  name="attn")(yw)
            yw = yw.reshape(n, hp // ws, wp // ws, ws, ws, c)
            yw = yw.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp, wp, c)
            y = yw[:, :h, :w]
        else:
            # rel-pos tables parameterized at the CHECKPOINT grid (so
            # released weights always fit) and interpolated to the runtime
            # token grid inside the attention (get_rel_pos semantics)
            y = _SAMRelAttention(self.dim, self.heads, self.grid, self.grid,
                                 name="attn")(y)
        x = shortcut + y
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = nn.Dense(self.dim * 4, name="lin1")(y)
        y = nn.Dense(self.dim, name="lin2")(nn.gelu(y, approximate=False))
        return x + y


class _SAMRelAttention(nn.Module):
    """image_encoder.py:176-241 + add_decomposed_rel_pos (q==k sizes).

    ``size_h/size_w`` shape the PARAMETER tables (the checkpoint grid);
    when the runtime token grid differs (any non-1024 input on a global
    block) the tables are linearly interpolated to 2h-1/2w-1, as the
    reference's get_rel_pos does — instead of silently dropping the
    mismatched leaves at conversion time.
    """
    dim: int
    heads: int
    size_h: int
    size_w: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x.reshape(b, h * w, c))
        qkv = qkv.reshape(b, h * w, 3, self.heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]            # (b, heads, hw, hd)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * hd ** -0.5, k)
        rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                           (2 * self.size_h - 1, hd))
        rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                           (2 * self.size_w - 1, hd))
        if rel_h.shape[0] != 2 * h - 1:
            # antialias=False: F.interpolate(mode="linear") does not widen
            # the kernel when downsampling
            rel_h = jax.image.resize(rel_h, (2 * h - 1, hd), "linear",
                                     antialias=False)
        if rel_w.shape[0] != 2 * w - 1:
            rel_w = jax.image.resize(rel_w, (2 * w - 1, hd), "linear",
                                     antialias=False)
        idx_h = (jnp.arange(h)[:, None] - jnp.arange(h)[None, :]) + (h - 1)
        idx_w = (jnp.arange(w)[:, None] - jnp.arange(w)[None, :]) + (w - 1)
        rq = q.reshape(b, self.heads, h, w, hd)
        bias_h = jnp.einsum("bnhwc,hkc->bnhwk", rq, rel_h[idx_h])
        bias_w = jnp.einsum("bnhwc,wkc->bnhwk", rq, rel_w[idx_w])
        attn = attn.reshape(b, self.heads, h, w, h, w)             + bias_h[..., :, None] + bias_w[..., None, :]
        attn = jax.nn.softmax(attn.reshape(b, self.heads, h * w, h * w), -1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class SAMModule(nn.Module):
    """sam.py:17-107 pipeline.

    Prompt coords in the datapoint are NORMALIZED (y, x) — the enhax
    convention shared by every SAM variant (sam_lite, mobile_sam,
    sam_vit_*), so models swap without changing prompt semantics; the
    conversion to the reference prompt encoder's pixel (x, y) happens
    here."""
    img_size: int = 1024
    enc_dim: int = 768
    enc_depth: int = 12
    enc_heads: int = 12
    enc_window: int = 14
    global_idx: tuple = (2, 5, 8, 11)
    dim: int = 256
    dec_heads: int = 8
    dec_mlp_dim: int = 2048
    num_multimask: int = 3

    @nn.compact
    def __call__(self, image, points, labels):
        h, w = image.shape[1:3]
        embed = SAMImageEncoderViT(
            img_size=self.img_size, dim=self.enc_dim, depth=self.enc_depth,
            heads=self.enc_heads, out_chans=self.dim, window=self.enc_window,
            global_idx=self.global_idx, name="image_encoder")(image)
        eh, ew = embed.shape[1:3]
        # normalized (y, x) datapoint -> pixel (x, y) for the prompt encoder
        pts = jnp.stack([points[..., 1] * w, points[..., 0] * h], axis=-1)
        sparse, dense, dense_pe = SAMPromptEncoder(
            self.dim, (h, w), (eh, ew), name="prompt_encoder")(pts, labels)
        masks, iou = SAMMaskDecoder(
            self.dim, heads=self.dec_heads, mlp_dim=self.dec_mlp_dim,
            num_multimask=self.num_multimask,
            name="mask_decoder")(embed, dense_pe, sparse, dense)
        up = jax.image.resize(masks, masks.shape[:2] + (h, w), "bilinear")
        return {"masks": up, "iou_predictions": iou,
                "low_res_masks": masks}


_SAM_CFGS = {
    "sam_vit_b": (768, 12, 12, (2, 5, 8, 11)),
    "sam_vit_l": (1024, 24, 16, (5, 11, 17, 23)),
    "sam_vit_h": (1280, 32, 16, (7, 15, 23, 31)),
}

for _name, _cfg in _SAM_CFGS.items():
    def _sized(cfg=_cfg, nm=_name, **kwargs):
        dim, depth, heads, gidx = cfg
        mod = SAMModule(
            img_size=kwargs.get("img_size", 1024),
            enc_dim=kwargs.get("enc_dim", dim),
            enc_depth=kwargs.get("enc_depth", depth),
            enc_heads=kwargs.get("enc_heads", heads),
            global_idx=tuple(kwargs.get("global_idx", gidx)))
        return Model(
            name=nm, arch="sam", module=mod,
            tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,),
            required_inputs=("image", "points", "labels"),
            out_key="masks", size_divisor=16,
        )
    MODELS.register(name=_name, obj=_sized, arch="sam",
                    tasks=(Task.SEGMENT,), schemes=(Scheme.INFERENCE,))
