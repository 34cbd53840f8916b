"""FourLLIE: Fourier-based low-light enhancement (ACM MM 2023).

Native rebuild of the reference's vendored FourLLIE
(mon_extra/vision/enhance/llie/fourllie/models/archs/FourLLIE.py:7-110,
SFBlock.py; EXTRA_MODELS "fourllie"):

  * stage 1 — amplitude enhancement (FourLLIE.py:59-71): ``AmpNet``
    (AmplitudeNet_skip of spatial+frequency ProcessBlocks, sigmoid) maps
    the image to per-pixel curves; the FFT amplitude is divided by them
    and recombined with the original phase.
  * stage 2 — detail restoration: stride-2 pyramid over
    ``cat(x_amp, x)``, residual trunk, an ``SFNet`` of 5 frequency-only
    ProcessBlocks (rfft2 mag/phase 1x1-conv processing, SFBlock.py:17-42),
    blended with a lightweight trunk via the SNR-style mask
    (gaussian 5x5 sigma 1.5, luma ratio, FourLLIE.py:37-55), then a
    pixel-shuffle decoder with skip concats + global residual.

The mask's nearest 4x downsample (FourLLIE.py:90) is top-left slicing
(torch nearest) — reproduced by strided slicing.

Loss (enhancement_model.py:47-169): Charbonnier(out, gt)
+ 0.01 * sum-MSE(|FFT(out)| curve amplitude, |FFT(gt)|); the 0.1*VGG
term needs pretrained VGG weights and is omitted (supply via the
perceptual loss builder if weights are local).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import pixel_shuffle


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class _SpaBlock(nn.Module):
    nc: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _lrelu(nn.Conv(self.nc, (3, 3), dtype=self.dtype, name="b0")(x))
        y = _lrelu(nn.Conv(self.nc, (3, 3), dtype=self.dtype, name="b2")(y))
        return x + y


class _FreBlock(nn.Module):
    """rfft2 magnitude/phase 1x1-conv processing (SFBlock.py:17-42)."""
    nc: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        y = nn.Conv(self.nc, (1, 1), dtype=self.dtype, name="fpre")(x)
        f = jnp.fft.rfft2(y, axes=(-3, -2))
        mag, pha = jnp.abs(f), jnp.angle(f)
        mag = nn.Conv(self.nc, (1, 1), dtype=self.dtype, name="p1b")(
            _lrelu(nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                           name="p1a")(mag)))
        pha = nn.Conv(self.nc, (1, 1), dtype=self.dtype, name="p2b")(
            _lrelu(nn.Conv(self.nc, (1, 1), dtype=self.dtype,
                           name="p2a")(pha)))
        out = jnp.fft.irfft2(mag * jnp.cos(pha) + 1j * mag * jnp.sin(pha),
                             s=(h, w), axes=(-3, -2))
        return out.astype(x.dtype) + x


class _ProcessBlock(nn.Module):
    nc: int
    spatial: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        xf = _FreBlock(self.nc, dtype=self.dtype,
                       name="frequency_process")(x)
        if self.spatial:
            xs = _SpaBlock(self.nc, dtype=self.dtype,
                           name="spatial_process")(x)
            y = jnp.concatenate([xs, xf], axis=-1)
        else:
            y = xf
        return nn.Conv(self.nc, (1, 1), dtype=self.dtype, name="cat")(y) + x


class _AmplitudeNet(nn.Module):
    """AmplitudeNet_skip (SFBlock.py:119-153)."""
    nc: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        pb = lambda nc, name: _ProcessBlock(nc, dtype=d, name=name)  # noqa: E731
        x = nn.Conv(self.nc, (1, 1), dtype=d, name="conv0_pre")(x)
        x = pb(self.nc, "conv0")(x)
        x1 = pb(self.nc, "conv1")(x)
        x2 = pb(self.nc, "conv2")(x1)
        x3 = pb(self.nc, "conv3")(x2)
        x4 = pb(self.nc * 2, "conv4")(jnp.concatenate([x2, x3], -1))
        x4 = nn.Conv(self.nc, (1, 1), dtype=d, name="conv4_post")(x4)
        x5 = pb(self.nc * 2, "conv5")(jnp.concatenate([x1, x4], -1))
        x5 = nn.Conv(self.nc, (1, 1), dtype=d, name="conv5_post")(x5)
        xo = pb(self.nc * 2, "convout")(jnp.concatenate([x, x5], -1))
        return nn.Conv(3, (1, 1), dtype=d, name="convout_post")(xo)


class _ResBlock(nn.Module):
    nf: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.relu(nn.Conv(self.nf, (3, 3), dtype=self.dtype,
                            name="conv1")(x))
        return x + nn.Conv(self.nf, (3, 3), dtype=self.dtype,
                           name="conv2")(y)


def _gaussian_blur5(x, sigma: float = 1.5):
    """kornia.filters.gaussian_blur2d((5,5),(1.5,1.5)), reflect border."""
    r = jnp.arange(5, dtype=x.dtype) - 2.0
    g = jnp.exp(-(r * r) / (2.0 * sigma * sigma))
    g = g / jnp.sum(g)
    h, w = x.shape[-3], x.shape[-2]
    p = jnp.pad(x, [(0, 0), (2, 2), (2, 2), (0, 0)], mode="reflect")
    # separable: along H then W
    p = sum(g[i] * p[:, i:i + h, :, :] for i in range(5))
    return sum(g[i] * p[:, :, i:i + w, :] for i in range(5))


def snr_mask(x):
    """FourLLIE.py:37-55 luma/noise ratio mask."""
    light = _gaussian_blur5(x)
    luma = lambda t: (0.299 * t[..., 0:1] + 0.587 * t[..., 1:2]  # noqa: E731
                      + 0.114 * t[..., 2:3])
    dark_l, light_l = luma(x), luma(light)
    noise = jnp.abs(dark_l - light_l)
    mask = light_l / (noise + 1e-4)
    mmax = jnp.max(mask.reshape(mask.shape[0], -1), axis=1)
    mask = mask / (mmax[:, None, None, None] + 1e-4)
    return jnp.clip(mask, 0.0, 1.0)


class FourLLIEModule(nn.Module):
    nf: int = 64
    amp_nc: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        h, w = x.shape[-3], x.shape[-2]
        # stage 1: amplitude enhancement (FourLLIE.py:59-71)
        f = jnp.fft.fft2(x, axes=(-3, -2))
        mag, pha = jnp.abs(f), jnp.angle(f)
        curve = nn.sigmoid(_AmplitudeNet(self.amp_nc, dtype=d,
                                         name="amp")(x))
        mag_e = mag / (curve + 1e-8)
        x_center = jnp.real(jnp.fft.ifft2(
            mag_e * jnp.cos(pha) + 1j * mag_e * jnp.sin(pha),
            s=(h, w), axes=(-3, -2))).astype(x.dtype)

        rate = 8
        pad_h = (rate - h % rate) % rate
        pad_w = (rate - w % rate) % rate
        if pad_h or pad_w:
            pads = [(0, 0), (0, pad_h), (0, pad_w), (0, 0)]
            x_center = jnp.pad(x_center, pads, mode="reflect")
            x = jnp.pad(x, pads, mode="reflect")

        conv = lambda f_, s, name: nn.Conv(  # noqa: E731
            f_, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)), dtype=d,
            name=name)
        l1 = _lrelu(conv(self.nf, 1, "conv_first_1")(
            jnp.concatenate([x_center, x], -1)))
        l2 = _lrelu(conv(self.nf, 2, "conv_first_2")(l1))
        l3 = _lrelu(conv(self.nf, 2, "conv_first_3")(l2))

        fea = _ResBlock(self.nf, dtype=d, name="fe_0")(l3)
        fea_light = fea
        for i in range(6):
            fea_light = _ResBlock(self.nf, dtype=d,
                                  name=f"rtl_{i}")(fea_light)

        mask = snr_mask(x_center)[:, ::4, ::4, :]  # torch nearest = top-left

        fea_unfold = fea
        for i in range(1, 6):
            fea_unfold = _ProcessBlock(self.nf, spatial=False, dtype=d,
                                       name=f"sf_conv{i}")(fea_unfold)
        fea_unfold = fea + fea_unfold  # SFNet global skip (SFBlock.py:116)

        fea = fea_unfold * (1.0 - mask) + fea_light * mask

        out = _ResBlock(self.nf, dtype=d, name="rt_0")(fea)
        out = jnp.concatenate([out, l3], -1)
        out = _lrelu(pixel_shuffle(
            nn.Conv(self.nf * 4, (3, 3), dtype=d, name="upconv1")(out), 2))
        out = jnp.concatenate([out, l2], -1)
        out = _lrelu(pixel_shuffle(
            nn.Conv(self.nf * 4, (3, 3), dtype=d, name="upconv2")(out), 2))
        out = jnp.concatenate([out, l1], -1)
        out = _lrelu(nn.Conv(self.nf, (3, 3), dtype=d, name="HRconv")(out))
        out = nn.Conv(3, (3, 3), dtype=d, name="conv_last")(out) + x
        out = out[:, :h, :w, :]
        return {"enhanced": out, "amplitude": mag_e,
                "stage1": x_center[:, :h, :w, :], "mask": mask}


def fourllie_loss(amp_weight: float = 0.01):
    """Charbonnier + amplitude sum-MSE (enhancement_model.py:165-169;
    the VGG term requires local pretrained weights and is omitted)."""
    def fn(outputs, datapoint):
        target = datapoint.get("ref_image", datapoint["image"])
        diff = outputs["enhanced"] - target
        l_pix = jnp.mean(jnp.sqrt(diff * diff + 1e-6))
        real_amp = jnp.abs(jnp.fft.fft2(target, axes=(-3, -2)))
        l_amp = jnp.sum((outputs["amplitude"] - real_amp) ** 2)
        return l_pix + amp_weight * l_amp
    return fn


@MODELS.register(name="fourllie", arch="fourllie", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def fourllie(nf: int = 64, **kwargs) -> Model:
    return Model(
        name="fourllie", arch="fourllie",
        module=FourLLIEModule(nf=nf),
        tasks=(Task.LLIE,),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=fourllie_loss(),
        required_inputs=("image",),
        size_divisor=8,
    )
