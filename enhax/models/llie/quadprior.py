"""QuadPrior: zero-reference LLIE via a ControlNet diffusion prior.

Native rebuild of the reference's vendored QuadPrior
(mon_extra/vision/enhance/llie/quadprior/; EXTRA_MODELS "quadprior"),
its largest LLIE system — a Stable-Diffusion-v1.5 ControlNet pipeline
(models/cldm_v15.yaml) with four physics-derived priors:

  * ``PriorConv2d`` (ciconv2d.py:86-152): color-invariant features from
    the Gaussian color model — H, log-S, Ww (CIConv W invariant) plus a
    3-ch RGB-order map; the Gaussian derivative filters have a LEARNED
    per-image scale (clamped [-2.5, 2.5]) which makes the torch kernel
    size dynamic; here the kernel lives on a fixed max support with a
    traced truncation mask, which is mathematically identical and keeps
    XLA shapes static.
  * ``ControlNet`` (cldm/cldm.py:52-314): SD UNet encoder copy + zero
    convs, with the hint encoder's first conv swapped to 6 channels for
    the priors (cldm.py:288-290).
  * ``ControlledUnetModel`` (cldm.py:25-49): SD v1.5 UNet (320 ch,
    mult [1,2,4,4], spatial transformers at ds 1/2/4, context 768)
    consuming the control residuals.
  * a skip-connected VAE (my_vae/models.py): the encoder returns
    per-level hidden states; the decoder's upsamplers merge them back in
    (Merge/BigMerge), so the generative decode keeps input detail.
  * DPM-Solver++ sampling (ldm/.../dpm_solver.py; multistep, order 3,
    time_uniform, lower_order_final, predict_x0) — reproduced exactly,
    including the vendored ``model_prev_list[:step_order]`` slicing.

Text conditioning is a fixed empty-prompt CLIP embedding shipped as a
checkpoint tensor (cldm.py:325-327) — here a (77, context_dim) param
filled by the converter. In the released config the conditional and
unconditional branches are IDENTICAL (same control, same empty text,
my_predict.py:66-74), so classifier-free guidance collapses to a single
forward — implemented as one pass (bit-equal to the reference's two).

Diffusion training (v-prediction losses over COCO with the frozen SD
backbone) requires the SD checkpoint; loss_fn=None (inference pipeline,
same stance as the GAN models).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model

_EPS = 1e-4


# ---------------------------------------------------------------------------
# PriorConv2d (ciconv2d.py)
# ---------------------------------------------------------------------------

def _gaussian_basis(std, max_r: int, k: int = 3):
    """gaussian_basis_filters (ciconv2d.py:15-40) on a fixed support with
    traced truncation at ceil(k*std + 0.5)."""
    x = jnp.arange(-max_r, max_r + 1, dtype=jnp.float32)
    filtersize = jnp.ceil(k * std + 0.5)
    keep = (jnp.abs(x) <= filtersize).astype(jnp.float32)
    gx = jnp.exp(-((x / std) ** 2) / 2.0) * keep
    g2 = gx[:, None] * gx[None, :]
    g2 = g2 / jnp.sum(g2)
    d = -x / (std ** 3 * 2.0 * math.pi) * jnp.exp(-((x / std) ** 2) / 2.0) \
        * keep
    dg = d[:, None] * gx[None, :]          # derivative along axis 0
    dg = dg / jnp.sum(jnp.abs(dg))
    dgt = dg.T                             # derivative along axis 1
    # torch meshgrid (default 'ij'): x[0] varies along dim0 -> dgdx is the
    # derivative along dim0 (rows), dgdy along dim1 (cols)
    return jnp.stack([g2, dg, dgt], axis=0)  # (3, K, K)


class PriorConv2d(nn.Module):
    """Quadratic color-invariant priors (ciconv2d.py:86-152); 6-ch out."""
    k: int = 3
    max_scale: float = 2.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x (B, H, W, 3) in [0, 1]
        gcm = self.param("gcm", lambda *_: jnp.asarray(
            [[0.06, 0.63, 0.27], [0.3, 0.04, -0.35], [0.34, -0.6, 0.17]],
            jnp.float32))
        # RGB order map (ciconv2d.py:108-121)
        amax = jnp.argmax(x, axis=-1)
        amin = jnp.argmin(x, axis=-1)
        amax_ = 2 - jnp.argmax(x[..., ::-1], axis=-1)
        amin_ = 2 - jnp.argmin(x[..., ::-1], axis=-1)
        one = lambda idx: jax.nn.one_hot(idx, 3, dtype=x.dtype)  # noqa: E731
        rgb_order = 0.5 * (one(amax) + one(amax_)) \
            - 0.5 * (one(amin) + one(amin_))
        # learned per-image scale
        h = x
        for i, (f, act) in enumerate(((16, True), (16, True), (1, False))):
            h = nn.Conv(f, (3, 3), dtype=self.dtype, name=f"conv{i}")(h)
            if act:
                h = nn.silu(h)
        scale = jnp.clip(jnp.mean(h, axis=(1, 2, 3)),
                         -self.max_scale, self.max_scale)
        # Gaussian color model E, El, Ell
        e = jnp.einsum("bhwc,dc->bhwd", x.astype(jnp.float32), gcm)
        max_r = int(math.ceil(self.k * 2.0 ** self.max_scale + 0.5))

        def per_image(img, s):
            w = _gaussian_basis(2.0 ** s, max_r, self.k)  # (3, K, K)
            out = jax.lax.conv_general_dilated(
                img.transpose(2, 0, 1)[:, None],          # (3, 1, H, W)
                w[:, None],                                # (3, 1, K, K)
                window_strides=(1, 1),
                padding=((max_r, max_r), (max_r, max_r)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return out  # (3 channels E/El/Ell, 3 filters, H, W)

        out = jax.vmap(per_image)(e, scale)
        ch_e, ch_el, ch_ell = out[:, 0], out[:, 1], out[:, 2]
        E, Ex, Ey = ch_e[:, 0], ch_e[:, 1], ch_e[:, 2]
        El = ch_el[:, 0]
        Ell = ch_ell[:, 0]
        H = jnp.arctan(El / (Ell + _EPS))
        S = jnp.log((El ** 2 + Ell ** 2) / (E ** 2 + _EPS) + _EPS)
        Ww = jnp.arctan((Ex / (E + _EPS)) ** 2 + (Ey / (E + _EPS)) ** 2)
        feats = jnp.stack([H, S], axis=-1)
        return jnp.concatenate([feats, rgb_order, Ww[..., None]],
                               axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# SD UNet building blocks (ldm/modules/diffusionmodules/openaimodel.py)
# ---------------------------------------------------------------------------

def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class _ResBlock(nn.Module):
    """openaimodel.py:162-255 (use_scale_shift_norm=False path)."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb):
        d = self.dtype
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="in_gn")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=d, name="in_conv")(nn.silu(h))
        e = nn.Dense(self.out_ch, dtype=d, name="emb_fc")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_gn")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=d,
                    kernel_init=nn.initializers.zeros, name="out_conv")(
            nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=d, name="skip")(x)
        return x + h


class _CrossAttention(nn.Module):
    """attention.py CrossAttention (softmax)."""
    heads: int
    dim_head: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                     name="to_v")(context)
        b, n, _ = q.shape
        m = k.shape[1]
        resh = lambda t, ln: t.reshape(b, ln, self.heads,  # noqa: E731
                                       self.dim_head).transpose(0, 2, 1, 3)
        q, k, v = resh(q, n), resh(k, m), resh(v, m)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k) * self.dim_head ** -0.5,
            axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class _FeedForward(nn.Module):
    """GEGLU feed-forward (attention.py:50-76), mult=4."""
    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = self.dim * 4
        y = nn.Dense(inner * 2, dtype=self.dtype, name="geglu")(x)
        a, gate = jnp.split(y, 2, axis=-1)
        y = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(y)


class _SpatialTransformer(nn.Module):
    """attention.py:278-340 (depth 1, conv proj)."""
    channels: int
    heads: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        d = self.dtype
        dim_head = c // self.heads
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        y = nn.Conv(c, (1, 1), dtype=d, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        # BasicTransformerBlock
        y = y + _CrossAttention(self.heads, dim_head, dtype=d,
                                name="attn1")(
            nn.LayerNorm(name="norm1")(y))
        y = y + _CrossAttention(self.heads, dim_head, dtype=d,
                                name="attn2")(
            nn.LayerNorm(name="norm2")(y), context)
        y = y + _FeedForward(c, dtype=d, name="ff")(
            nn.LayerNorm(name="norm3")(y))
        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=d, kernel_init=nn.initializers.zeros,
                    name="proj_out")(y)
        return x + y


class _ControlledCore(nn.Module):
    """SD-UNet encoder+middle with optional guided-hint injection after
    the first block and per-block taps (shared by UNet and ControlNet)."""
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    num_heads: int = 8
    in_channels: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, emb, context, guided_hint=None):
        d = self.dtype
        mc = self.model_channels
        hs = []
        h = nn.Conv(mc, (3, 3), dtype=d, name="in0")(x)
        if guided_hint is not None:
            h = h + guided_hint
        hs.append(h)
        i = 1
        ch = mc
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res):
                ch = mult * mc
                h = _ResBlock(ch, dtype=d, name=f"ib{i}_res")(h, emb)
                if level < len(self.channel_mult) - 1:
                    h = _SpatialTransformer(ch, self.num_heads, dtype=d,
                                            name=f"ib{i}_t")(h, context)
                hs.append(h)
                i += 1
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), dtype=d,
                            name=f"ib{i}_down")(h)
                hs.append(h)
                i += 1
        h = _ResBlock(ch, dtype=d, name="mid_res1")(h, emb)
        h = _SpatialTransformer(ch, self.num_heads, dtype=d,
                                name="mid_t")(h, context)
        h = _ResBlock(ch, dtype=d, name="mid_res2")(h, emb)
        return h, hs


class QuadControlNet(nn.Module):
    """cldm.py:52-314 + add_prior: priors -> hint stem -> zero-conv taps."""
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    num_heads: int = 8
    hint_base: int = 16
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hint, t, context):
        d = self.dtype
        mc = self.model_channels
        temb = timestep_embedding(t, mc).astype(x.dtype)
        emb = nn.Dense(mc * 4, dtype=d, name="time_fc1")(temb)
        emb = nn.Dense(mc * 4, dtype=d, name="time_fc2")(nn.silu(emb))
        hint = PriorConv2d(dtype=d, name="prior_conv")(hint)
        hb = self.hint_base
        chans = (hb, hb, hb * 2, hb * 2, hb * 6, hb * 6, hb * 16)
        strides = (1, 1, 2, 1, 2, 1, 2)
        g = hint
        for j, (f, s) in enumerate(zip(chans, strides)):
            g = nn.silu(nn.Conv(f, (3, 3), strides=(s, s),
                                padding=((1, 1), (1, 1)), dtype=d,
                                name=f"hint{j}")(g))
        g = nn.Conv(mc, (3, 3), dtype=d, kernel_init=nn.initializers.zeros,
                    name="hint7")(g)
        h_mid, hs = _ControlledCore(mc, self.channel_mult, self.num_res,
                                    self.num_heads, dtype=d,
                                    name="core")(x, emb, context,
                                                 guided_hint=g)
        outs = []
        for j, hh in enumerate(hs):
            outs.append(nn.Conv(hh.shape[-1], (1, 1), dtype=d,
                                kernel_init=nn.initializers.zeros,
                                name=f"zero{j}")(hh))
        outs.append(nn.Conv(h_mid.shape[-1], (1, 1), dtype=d,
                            kernel_init=nn.initializers.zeros,
                            name="mid_out")(h_mid))
        return outs


class ControlledUNet(nn.Module):
    """cldm.py:25-49: SD UNet consuming control residuals."""
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    num_heads: int = 8
    out_channels: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, t, context, control=None):
        # control=None runs the plain SD UNet (no residual taps) with an
        # identical param tree — reused by the SD-inpainting pipeline
        # (enhax/models/inpaint/sd_inpaint.py) on a 9-channel x.
        d = self.dtype
        mc = self.model_channels
        temb = timestep_embedding(t, mc).astype(x.dtype)
        emb = nn.Dense(mc * 4, dtype=d, name="time_fc1")(temb)
        emb = nn.Dense(mc * 4, dtype=d, name="time_fc2")(nn.silu(emb))
        h, hs = _ControlledCore(mc, self.channel_mult, self.num_res,
                                self.num_heads, dtype=d,
                                name="core")(x, emb, context)
        control = list(control) if control is not None else None
        if control is not None:
            h = h + control.pop()
        i = 0
        n_levels = len(self.channel_mult)
        for level in reversed(range(n_levels)):
            ch = self.channel_mult[level] * mc
            for r in range(self.num_res + 1):
                skip = hs.pop()
                if control is not None:
                    skip = skip + control.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = _ResBlock(ch, dtype=d, name=f"ob{i}_res")(h, emb)
                if level < n_levels - 1:
                    h = _SpatialTransformer(ch, self.num_heads, dtype=d,
                                            name=f"ob{i}_t")(h, context)
                if level > 0 and r == self.num_res:
                    b, hh, ww, cc = h.shape
                    h = jax.image.resize(h, (b, hh * 2, ww * 2, cc),
                                         method="nearest")
                    h = nn.Conv(ch, (3, 3), dtype=d, name=f"ob{i}_up")(h)
                i += 1
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_gn")(h)
        return nn.Conv(self.out_channels, (3, 3), dtype=d,
                       kernel_init=nn.initializers.zeros,
                       name="out_conv")(nn.silu(h))


# ---------------------------------------------------------------------------
# Skip-connected VAE (my_vae/models.py)
# ---------------------------------------------------------------------------

class _VAEResBlock(nn.Module):
    """my_vae ResnetBlock (GroupNorm32 eps 1e-6 + swish + conv)."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm1")(x)
        h = nn.Conv(self.out_ch, (3, 3), dtype=d, name="conv1")(nn.silu(h))
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm2")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=d, name="conv2")(nn.silu(h))
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=d, name="nin_shortcut")(x)
        return x + h


class _VAEAttn(nn.Module):
    """my_vae AttnBlock (single-head spatial attention)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        d = self.dtype
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=d, name="q")(y).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), dtype=d, name="k")(y).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), dtype=d, name="v")(y).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", q, k) * c ** -0.5, axis=-1)
        out = jnp.einsum("bnm,bmc->bnc", attn, v).reshape(b, h, w, c)
        return x + nn.Conv(c, (1, 1), dtype=d, name="proj_out")(out)


class VAEEncoder(nn.Module):
    """my_vae Encoder (models.py:495-588): also returns per-level skips."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    z_ch: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        skips = [x]
        h = nn.Conv(self.ch, (3, 3), dtype=d, name="conv_in")(x)
        for level, mult in enumerate(self.ch_mult):
            for b in range(self.num_res):
                h = _VAEResBlock(self.ch * mult, dtype=d,
                                 name=f"down{level}_b{b}")(h)
            if level != len(self.ch_mult) - 1:
                skips.append(h)
                # asymmetric pad (0,1,0,1) + stride-2 VALID conv
                h = jnp.pad(h, [(0, 0), (0, 1), (0, 1), (0, 0)])
                h = nn.Conv(self.ch * mult, (3, 3), strides=(2, 2),
                            padding="VALID", dtype=d,
                            name=f"down{level}_ds")(h)
        h = _VAEResBlock(h.shape[-1], dtype=d, name="mid_block_1")(h)
        h = _VAEAttn(dtype=d, name="mid_attn_1")(h)
        h = _VAEResBlock(h.shape[-1], dtype=d, name="mid_block_2")(h)
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = nn.Conv(2 * self.z_ch, (3, 3), dtype=d,
                    name="conv_out")(nn.silu(h))
        return h, skips


class VAEDecoder(nn.Module):
    """my_vae Decoder (models.py:591-702) with Merge/BigMerge skips."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    out_ch: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, z, skips):
        d = self.dtype
        skips = list(skips)
        block_in = self.ch * self.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), dtype=d, name="conv_in")(z)
        h = _VAEResBlock(block_in, dtype=d, name="mid_block_1")(h)
        h = _VAEAttn(dtype=d, name="mid_attn_1")(h)
        h = _VAEResBlock(block_in, dtype=d, name="mid_block_2")(h)
        for level in reversed(range(len(self.ch_mult))):
            ch = self.ch * self.ch_mult[level]
            for b in range(self.num_res + 1):
                h = _VAEResBlock(ch, dtype=d, name=f"up{level}_b{b}")(h)
            if level != 0:
                b_, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b_, hh * 2, ww * 2, cc),
                                     method="nearest")
                h = nn.Conv(cc, (3, 3), dtype=d, name=f"up{level}_us")(h)
                # Merge with the encoder skip (models.py:85-108)
                h = nn.Conv(cc, (3, 3), dtype=d, name=f"up{level}_merge")(
                    jnp.concatenate([h, skips.pop()], axis=-1))
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        h = nn.Conv(self.out_ch, (3, 3), dtype=d,
                    name="conv_out")(nn.silu(h))
        # BigMerge with the raw input (models.py:68-82, 700-701)
        x_in = skips.pop()
        y = nn.relu(nn.Conv(32, (3, 3), dtype=d, name="big_conv1")(
            jnp.concatenate([h, x_in], axis=-1)))
        y = nn.Conv(self.out_ch, (3, 3), dtype=d,
                    kernel_init=nn.initializers.zeros,
                    name="big_conv2")(y)
        return h + y


# ---------------------------------------------------------------------------
# DPM-Solver++ (multistep, predict_x0) — dpm_solver.py semantics
# ---------------------------------------------------------------------------

def make_noise_schedule(timesteps: int = 1000, linear_start: float = 0.00085,
                        linear_end: float = 0.0120):
    """LDM 'linear' schedule (sqrt-linspace squared) -> alphas_cumprod.
    Computed host-side in f64 (the torch reference accumulates in f64)."""
    import numpy as np
    betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, timesteps,
                        dtype=np.float64) ** 2
    alphas_cumprod = np.cumprod(1.0 - betas)
    log_alphas = 0.5 * np.log(alphas_cumprod)
    t_array = np.linspace(0.0, 1.0, timesteps + 1)[1:]
    return (jnp.asarray(t_array, jnp.float32),
            jnp.asarray(log_alphas, jnp.float32))


def dpm_solver_sample(model_fn, x, t_array, log_alphas, steps: int = 10,
                      order: int = 3):
    """Multistep DPM-Solver++ (predict_x0, time_uniform,
    lower_order_final), mirroring the vendored dpm_solver.py:1049-1082 —
    including its ``model_prev_list[:step_order]`` slicing.

    ``model_fn(x, t_cont)`` must return the NOISE prediction.
    """
    total_n = t_array.shape[0]

    def log_alpha(t):
        return jnp.interp(t, t_array, log_alphas)

    def lam(t):
        la = log_alpha(t)
        return la - 0.5 * jnp.log(1.0 - jnp.exp(2.0 * la))

    def sigma(t):
        return jnp.sqrt(1.0 - jnp.exp(2.0 * log_alpha(t)))

    def alpha(t):
        return jnp.exp(log_alpha(t))

    def x0_fn(x, t):
        noise = model_fn(x, t)
        return (x - sigma(t) * noise) / alpha(t)

    def first_update(x, s, t, m0):
        h = lam(t) - lam(s)
        return sigma(t) / sigma(s) * x - alpha(t) * jnp.expm1(-h) * m0

    def second_update(x, mp, tp, t):
        m1, m0 = mp
        t1, t0 = tp
        h0 = lam(t0) - lam(t1)
        h = lam(t) - lam(t0)
        r0 = h0 / h
        d1_0 = (m0 - m1) / r0
        ph = jnp.expm1(-h)
        return (sigma(t) / sigma(t0) * x - alpha(t) * ph * m0
                - 0.5 * alpha(t) * ph * d1_0)

    def third_update(x, mp, tp, t):
        m2, m1, m0 = mp
        t2, t1, t0 = tp
        h1 = lam(t1) - lam(t2)
        h0 = lam(t0) - lam(t1)
        h = lam(t) - lam(t0)
        r0, r1 = h0 / h, h1 / h
        d1_0 = (m0 - m1) / r0
        d1_1 = (m1 - m2) / r1
        d1 = d1_0 + r0 / (r0 + r1) * (d1_0 - d1_1)
        d2 = (d1_0 - d1_1) / (r0 + r1)
        ph = jnp.expm1(-h)
        return (sigma(t) / sigma(t0) * x - alpha(t) * ph * m0
                + alpha(t) * (ph / h + 1.0) * d1
                - alpha(t) * ((ph + h) / h ** 2 - 0.5) * d2)

    def update(x, mp, tp, t, o):
        if o == 1:
            return first_update(x, tp[-1], t, mp[-1])
        if o == 2:
            return second_update(x, mp, tp, t)
        return third_update(x, mp, tp, t)

    t_T, t_0 = 1.0, 1.0 / total_n
    ts = jnp.linspace(t_T, t_0, steps + 1)
    mp = [x0_fn(x, ts[0])]
    tp = [ts[0]]
    for init_order in range(1, order):
        x = update(x, mp, tp, ts[init_order], init_order)
        mp.append(x0_fn(x, ts[init_order]))
        tp.append(ts[init_order])
    for step in range(order, steps + 1):
        t = ts[step]
        step_order = min(order, steps + 1 - step)
        # vendored quirk: [:step_order], not [-step_order:]
        x = update(x, mp[:step_order], tp[:step_order], t, step_order)
        mp = mp[1:] + [mp[-1]]
        tp = tp[1:] + [t]
        if step < steps:
            mp[-1] = x0_fn(x, t)
    return x


# ---------------------------------------------------------------------------
# Full pipeline
# ---------------------------------------------------------------------------

class QuadPriorModule(nn.Module):
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    num_heads: int = 8
    context_dim: int = 768
    context_len: int = 77
    vae_ch: int = 128
    vae_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4
    hint_base: int = 16
    steps: int = 10
    order: int = 3
    scale_factor: float = 0.18215
    dtype: Any = None

    @nn.compact
    def __call__(self, x, noise=None):
        d = self.dtype
        b, h, w, _ = x.shape
        lh, lw = h // 8, w // 8
        ctx = self.param("cond_txt_empty", nn.initializers.normal(0.02),
                         (self.context_len, self.context_dim))
        ctx = jnp.broadcast_to(ctx[None], (b,) + ctx.shape).astype(x.dtype)

        _, skips = VAEEncoder(self.vae_ch, self.vae_mult, self.num_res,
                              self.z_ch, dtype=d, name="vae_enc")(
            x * 2.0 - 1.0)

        controlnet = QuadControlNet(self.model_channels, self.channel_mult,
                                    self.num_res, self.num_heads,
                                    self.hint_base, dtype=d, name="control")
        unet = ControlledUNet(self.model_channels, self.channel_mult,
                              self.num_res, self.num_heads, self.z_ch,
                              dtype=d, name="unet")
        t_array, log_alphas = make_noise_schedule()
        total_n = t_array.shape[0]

        def eps_fn(xt, t_cont):
            # conditional == unconditional in the released config, so CFG
            # collapses to one forward (see moduledoc)
            t_in = (t_cont - 1.0 / total_n) * 1000.0
            tb = jnp.broadcast_to(t_in, (xt.shape[0],))
            control = controlnet(xt, x, tb, ctx)
            return unet(xt, tb, ctx, control)

        if noise is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(0), (b, lh, lw, self.z_ch), jnp.float32)
        samples = dpm_solver_sample(eps_fn, noise.astype(x.dtype), t_array,
                                    log_alphas, self.steps, self.order)

        z = samples / self.scale_factor
        z = nn.Conv(self.z_ch, (1, 1), dtype=d, name="post_quant_conv")(z)
        out = VAEDecoder(self.vae_ch, self.vae_mult, self.num_res, 3,
                         dtype=d, name="vae_dec")(z, skips)
        enhanced = jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)
        return {"enhanced": enhanced, "latent": samples}


@MODELS.register(name="quadprior", arch="quadprior", tasks=(Task.LLIE,),
                 schemes=(Scheme.ZERO_SHOT,))
def quadprior(model_channels: int = 320, context_dim: int = 768,
              vae_ch: int = 128, num_heads: int = 8, steps: int = 10,
              hint_base: int = 16, **kwargs) -> Model:
    return Model(
        name="quadprior", arch="quadprior",
        module=QuadPriorModule(model_channels=model_channels,
                               context_dim=context_dim, vae_ch=vae_ch,
                               num_heads=num_heads, steps=steps,
                               hint_base=hint_base,
                               **{k: v for k, v in kwargs.items()
                                  if k in ("channel_mult", "num_res",
                                           "vae_mult", "order",
                                           "context_len")}),
        tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,),
        loss_fn=None,  # diffusion training needs the SD checkpoint
        required_inputs=("image",),
        optional_inputs=("noise",),
        size_divisor=64,
    )
