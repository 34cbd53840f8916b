"""LaMa inpainting: fast-Fourier-convolution resolution-robust generator.

Faithful rebuild of the reference's vendored LaMa FFCResNetGenerator with
the published ``ffc_resnet_075`` config (mon_extra/vision/enhance/inpaint/
lama/saicinpainting/training/modules/ffc.py:49-369 +
configs/training/generator/ffc_resnet_075.yaml):

  * stem: reflect-pad-3 7x7 conv + BN + ReLU (all-local, ratios 0/0);
  * 3 stride-2 reflect-padded downsamples, the LAST splitting the
    stream 25/75 into local/global (ratio_gout 0.75);
  * 9 FFC residual blocks at 512 (128 local / 384 global): four 3x3
    cross paths l2l/l2g/g2l plus the g2g SpectralTransform — 1x1+BN+ReLU
    bottleneck, FourierUnit (ortho rfft2, re/im interleaved channels,
    1x1 conv + BN + ReLU in the spectrum, irfft2), 1x1 out over
    ``x + fu(x)`` (LFU disabled in the published config);
  * ConvTranspose(k3,s2,p1,op1)+BN+ReLU upsamples, reflect-pad-3 7x7
    head, tanh.

Input is [image * (1-mask), mask]; output composited as
enhanced = pred * mask + image * (1-mask) (the trainer contract).

The FFT global branch is TPU-friendly: rfft2 + 1x1 convs are batched
matmuls on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


def _bn(name):
    return nn.BatchNorm(use_running_average=True, epsilon=1e-5, name=name)


def _reflect_conv(x, features, kernel, stride=1, pad=None, use_bias=False,
                  name=None):
    p = (kernel - 1) // 2 if pad is None else pad
    if p:
        x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding="VALID", use_bias=use_bias, name=name)(x)


class FourierUnit(nn.Module):
    """ffc.py:49-114 (ortho norm, no LFU/SE/pos-enc)."""
    features: int

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        f = jnp.fft.rfft2(x, axes=(1, 2), norm="ortho")   # (n,h,w1,c)
        y = jnp.stack([f.real, f.imag], axis=-1)          # (n,h,w1,c,2)
        y = y.reshape(*y.shape[:3], -1)                   # interleaved re/im
        y = nn.Conv(self.features * 2, (1, 1), use_bias=False,
                    name="conv")(y)
        y = nn.relu(_bn("bn")(y))
        y = y.reshape(*y.shape[:3], self.features, 2)
        y = y[..., 0] + 1j * y[..., 1]
        return jnp.fft.irfft2(y, s=(h, w), axes=(1, 2), norm="ortho")


class SpectralTransform(nn.Module):
    """ffc.py:116-163, enable_lfu=False."""
    features: int

    @nn.compact
    def __call__(self, x):
        half = self.features // 2
        y = nn.Conv(half, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.relu(_bn("bn1")(y))
        fu = FourierUnit(half, name="fu")(y)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       name="conv2")(y + fu)


class FFCBlock(nn.Module):
    """One FFC_BN_ACT at the 0.75 resnet ratio (ffc.py:166-256):
    local/global cross convs + spectral g2g, BN + ReLU per stream."""
    features: int
    ratio: float = 0.75

    @nn.compact
    def __call__(self, xl, xg):
        cg = int(self.features * self.ratio)
        cl = self.features - cg
        out_l = _reflect_conv(xl, cl, 3, name="l2l") \
            + _reflect_conv(xg, cl, 3, name="g2l")
        out_g = _reflect_conv(xl, cg, 3, name="l2g") \
            + SpectralTransform(cg, name="g2g")(xg)
        out_l = nn.relu(_bn("bn_l")(out_l))
        out_g = nn.relu(_bn("bn_g")(out_g))
        return out_l, out_g


class FFCResBlock(nn.Module):
    """ffc.py:258-289: two FFC convs, per-stream identity add."""
    features: int
    ratio: float = 0.75

    @nn.compact
    def __call__(self, xl, xg):
        yl, yg = FFCBlock(self.features, self.ratio, name="c1")(xl, xg)
        yl, yg = FFCBlock(self.features, self.ratio, name="c2")(yl, yg)
        return xl + yl, xg + yg


class LaMaModule(nn.Module):
    """FFCResNetGenerator (ffc.py:305-369) at ffc_resnet_075 defaults."""
    features: int = 64
    n_blocks: int = 9
    n_downs: int = 3
    ratio: float = 0.75

    @nn.compact
    def __call__(self, image, mask):
        # mask: 1 = hole to fill
        x = jnp.concatenate([image * (1.0 - mask), mask], axis=-1)
        y = _reflect_conv(x, self.features, 7, name="stem_conv")
        y = nn.relu(_bn("stem_bn")(y))
        c = self.features
        for i in range(self.n_downs):
            c = min(c * 2, 1024)
            if i == self.n_downs - 1:
                cg = int(c * self.ratio)
                yl = _reflect_conv(y, c - cg, 3, stride=2,
                                   name=f"down{i}_l2l")
                yg = _reflect_conv(y, cg, 3, stride=2, name=f"down{i}_l2g")
                yl = nn.relu(_bn(f"down{i}_bn_l")(yl))
                yg = nn.relu(_bn(f"down{i}_bn_g")(yg))
            else:
                y = _reflect_conv(y, c, 3, stride=2, name=f"down{i}_l2l")
                y = nn.relu(_bn(f"down{i}_bn_l")(y))
        for i in range(self.n_blocks):
            yl, yg = FFCResBlock(c, self.ratio, name=f"block{i}")(yl, yg)
        y = jnp.concatenate([yl, yg], axis=-1)
        for i in range(self.n_downs):
            c = c // 2
            # torch ConvTranspose k3/s2/p1/op1 == flax padding ((1,2),(1,2))
            y = nn.ConvTranspose(c, (3, 3), strides=(2, 2),
                                 padding=((1, 2), (1, 2)),
                                 transpose_kernel=True,
                                 name=f"up{i}_deconv")(y)
            y = nn.relu(_bn(f"up{i}_bn")(y))
        pred = _reflect_conv(y, 3, 7, use_bias=True, name="out_conv")
        pred = jnp.tanh(pred)
        return {"enhanced": pred * mask + image * (1.0 - mask), "pred": pred}


def _inpaint_loss():
    l1 = LOSSES.build("l1_loss")
    per = LOSSES.build("perceptual_loss")

    def fn(outputs, datapoint):
        t = datapoint["ref_image"]
        return l1(outputs["pred"], t) + 0.1 * per(outputs["pred"], t)
    return fn


@MODELS.register(name="lama", arch="lama",
                 tasks=(Task.INPAINT,), schemes=(Scheme.SUPERVISED,))
def lama(features: int = 64, n_blocks: int = 9, **kwargs) -> Model:
    return Model(
        name="lama", arch="lama",
        module=LaMaModule(features=features, n_blocks=n_blocks),
        tasks=(Task.INPAINT,), schemes=(Scheme.SUPERVISED,),
        loss_fn=_inpaint_loss(),
        required_inputs=("image", "mask"),
        size_divisor=8,
    )
