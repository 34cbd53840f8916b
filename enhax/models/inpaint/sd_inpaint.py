"""Stable-Diffusion inpainting: the fill/replace backbone of Inpaint-Anything.

Native rebuild of the pipeline behind the reference's fill/replace modes
(mon_extra/vision/enhance/inpaint/inpaint_anything/stable_diffusion_inpaint.py:
``fill_img_with_sd`` / ``replace_img_with_sd`` drive diffusers'
``StableDiffusionInpaintPipeline``). The SD-inpainting UNet is the SD UNet
with a 9-channel input conv — cat(latent 4, downsampled mask 1,
masked-image latent 4) — so the denoiser is conditioned on the visible
region; everything else (VAE, DPM-Solver++ sampling, CLIP context) is the
standard SD v1.5 stack already built natively for QuadPrior
(enhax/models/llie/quadprior.py). Weights are user-supplied (same
no-egress stance as quadprior); the architecture + pipeline are fully
parity-testable at random init.

Pipeline semantics mirror diffusers' StableDiffusionInpaintPipeline:
  masked_image = image * (mask < 0.5); both encoded by the VAE (mode of
  the diagonal Gaussian); mask nearest-resized to latent resolution; the
  sampler denoises only the 4 latent channels while mask/masked-latent
  stay fixed per step.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.llie.quadprior import (ControlledUNet, VAEEncoder,
                                         _VAEAttn, _VAEResBlock,
                                         dpm_solver_sample,
                                         make_noise_schedule)


class SDVAEDecoder(nn.Module):
    """Standard SD VAE decoder (no QuadPrior Merge/BigMerge skips) —
    ldm my_vae Decoder minus the skip merges (models.py:591-702 core)."""
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    out_ch: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        d = self.dtype
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
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm_out")(h)
        return nn.Conv(self.out_ch, (3, 3), dtype=d,
                       name="conv_out")(nn.silu(h))


class SDInpaintModule(nn.Module):
    """VAE-encode image+mask -> 9ch UNet DPM-Solver++ loop -> VAE decode.

    Inputs: image (B,H,W,3) in [0,1], mask (B,H,W,1) in {0,1} (1 = fill);
    optional noise (B,H/8,W/8,4) and context (B,77,context_dim) — absent
    context falls back to the converted empty-prompt CLIP embedding param
    (cond_txt_empty), as quadprior does.
    """
    model_channels: int = 320
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_res: int = 2
    num_heads: int = 8
    context_dim: int = 768
    context_len: int = 77
    vae_ch: int = 128
    vae_mult: Sequence[int] = (1, 2, 4, 4)
    z_ch: int = 4
    steps: int = 50
    order: int = 2
    scale_factor: float = 0.18215
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask, noise=None, context=None):
        d = self.dtype
        b, h, w, _ = x.shape
        lh, lw = h // 8, w // 8
        if context is None:
            ctx = self.param("cond_txt_empty", nn.initializers.normal(0.02),
                             (self.context_len, self.context_dim))
            ctx = jnp.broadcast_to(ctx[None], (b,) + ctx.shape)
        else:
            ctx = context
        ctx = ctx.astype(x.dtype)

        mask = (mask > 0.5).astype(x.dtype)
        masked = x * (1.0 - mask)

        enc = VAEEncoder(self.vae_ch, self.vae_mult, self.num_res,
                         self.z_ch, dtype=d, name="vae_enc")
        moments, _ = enc(masked * 2.0 - 1.0)
        moments = nn.Conv(2 * self.z_ch, (1, 1), dtype=d,
                          name="quant_conv")(moments)
        # mode of the diagonal Gaussian (diffusers uses sample; mode keeps
        # the pipeline deterministic given `noise`, matching the sampler)
        masked_lat = moments[..., : self.z_ch] * self.scale_factor
        mask_lat = jax.image.resize(mask, (b, lh, lw, 1), method="nearest")

        unet = ControlledUNet(self.model_channels, self.channel_mult,
                              self.num_res, self.num_heads, self.z_ch,
                              dtype=d, name="unet")
        t_array, log_alphas = make_noise_schedule()
        total_n = t_array.shape[0]

        def eps_fn(xt, t_cont):
            t_in = (t_cont - 1.0 / total_n) * 1000.0
            tb = jnp.broadcast_to(t_in, (xt.shape[0],))
            xin = jnp.concatenate(
                [xt, mask_lat.astype(xt.dtype),
                 masked_lat.astype(xt.dtype)], axis=-1)
            return unet(xin, tb, ctx, control=None)

        if noise is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(0), (b, lh, lw, self.z_ch), jnp.float32)
        samples = dpm_solver_sample(eps_fn, noise.astype(x.dtype), t_array,
                                    log_alphas, self.steps, self.order)

        z = samples / self.scale_factor
        z = nn.Conv(self.z_ch, (1, 1), dtype=d, name="post_quant_conv")(z)
        out = SDVAEDecoder(self.vae_ch, self.vae_mult, self.num_res, 3,
                           dtype=d, name="vae_dec")(z)
        filled = jnp.clip((out + 1.0) / 2.0, 0.0, 1.0)
        # paste: only the masked region comes from the diffusion output
        enhanced = x * (1.0 - mask) + filled * mask
        return {"enhanced": enhanced, "filled": filled, "latent": samples}


@MODELS.register(name="sd_inpaint", arch="sd_inpaint",
                 tasks=(Task.INPAINT,), schemes=(Scheme.ZERO_SHOT,))
def sd_inpaint(model_channels: int = 320, context_dim: int = 768,
               vae_ch: int = 128, num_heads: int = 8, steps: int = 50,
               **kwargs) -> Model:
    """SD-inpainting backbone (stable_diffusion_inpaint.py pipelines)."""
    return Model(
        name="sd_inpaint", arch="sd_inpaint",
        module=SDInpaintModule(model_channels=model_channels,
                               context_dim=context_dim, vae_ch=vae_ch,
                               num_heads=num_heads, steps=steps,
                               **{k: v for k, v in kwargs.items()
                                  if k in ("channel_mult", "num_res",
                                           "vae_mult", "order",
                                           "context_len", "z_ch")}),
        tasks=(Task.INPAINT,), schemes=(Scheme.ZERO_SHOT,),
        loss_fn=None,  # diffusion training needs the SD checkpoint
        required_inputs=("image", "mask"),
        optional_inputs=("noise", "context"),
        size_divisor=64,
    )
