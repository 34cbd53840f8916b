"""HINet: half-instance-normalization two-stage UNet.

Rebuild of reference ``vision/enhance/multitask/hinet/hinet.py:34-400``:
two UNet stages bridged by a supervised attention module (SAM) and
cross-stage feature fusion (CSFF); instance norm on half the channels of
each encoder block (the "HIN" trick). Tasks: deblur/denoise/derain/desnow/
LES, supervised (BASELINE.md config 3).

Loss: PSNR-shaped loss summed over both stage outputs (HINet paper; the
reference sums ``self.loss`` over all outputs, hinet.py:313-321).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import InstanceNorm2d, conv1x1


class HINConvBlock(nn.Module):
    """UNetConvBlock (hinet.py:34-89): 2x conv3x3 LeakyReLU + 1x1 identity,
    instance norm on half the channels, optional downsample + CSFF inputs."""
    features: int
    downsample: bool
    relu_slope: float = 0.2
    use_csff: bool = False
    use_hin: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, enc=None, dec=None):
        identity = conv1x1(self.features, dtype=self.dtype, name="identity")(x)
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv_1")(x)
        if self.use_hin:
            y1, y2 = jnp.split(y, 2, axis=-1)
            y1 = InstanceNorm2d(affine=True, name="norm")(y1)
            y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.leaky_relu(y, self.relu_slope)
        y = nn.leaky_relu(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                                  name="conv_2")(y), self.relu_slope)
        y = y + identity
        if enc is not None and dec is not None:
            y = y + nn.Conv(self.features, (3, 3), dtype=self.dtype, name="csff_enc")(enc) \
                  + nn.Conv(self.features, (3, 3), dtype=self.dtype, name="csff_dec")(dec)
        if self.downsample:
            y_down = nn.Conv(self.features, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                             use_bias=False, dtype=self.dtype, name="down")(y)
            return y_down, y
        return y


class HINUpBlock(nn.Module):
    """UNetUpBlock (hinet.py:91-121): transpose-conv up + concat + conv block."""
    features: int
    relu_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, bridge):
        y = nn.ConvTranspose(self.features, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="up", transpose_kernel=True)(x)
        y = jnp.concatenate([y, bridge], axis=-1)
        return HINConvBlock(self.features, downsample=False,
                            relu_slope=self.relu_slope, name="conv_block")(y)


class SAM(nn.Module):
    """Supervised attention module (hinet.py:123-203)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_img):
        x1 = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        img = nn.Conv(3, (3, 3), dtype=self.dtype, name="conv2")(x) + x_img
        x2 = jax.nn.sigmoid(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                                    name="conv3")(img))
        return x1 * x2 + x, img


class HINetModule(nn.Module):
    """Two-stage HINet (hinet.py:206-400)."""
    num_channels: int = 64
    depth: int = 5
    relu_slope: float = 0.2
    in_pos_left: int = 0
    in_pos_right: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.num_channels
        d = self.depth

        # Stage 1
        x1 = nn.Conv(c, (3, 3), dtype=self.dtype, name="conv_01")(x)
        encs, decs = [], []
        for i in range(d):
            use_hin = self.in_pos_left <= i <= self.in_pos_right
            down = (i + 1) < d
            blk = HINConvBlock((2 ** i) * c, downsample=down, relu_slope=self.relu_slope,
                               use_hin=use_hin, name=f"down1_{i}")
            if down:
                x1, x1_up = blk(x1)
                encs.append(x1_up)
            else:
                x1 = blk(x1)
        for i, j in enumerate(reversed(range(d - 1))):
            bridge = nn.Conv((2 ** j) * c, (3, 3), dtype=self.dtype,
                             name=f"skip1_{i}")(encs[-i - 1])
            x1 = HINUpBlock((2 ** j) * c, self.relu_slope, name=f"up1_{i}")(x1, bridge)
            decs.append(x1)

        sam_feats, y1 = SAM(c, name="sam12")(x1, x)

        # Stage 2
        x2 = nn.Conv(c, (3, 3), dtype=self.dtype, name="conv_02")(x)
        x2 = conv1x1(c, dtype=self.dtype, name="cat12")(
            jnp.concatenate([x2, sam_feats], axis=-1))
        blocks = []
        for i in range(d):
            use_hin = self.in_pos_left <= i <= self.in_pos_right
            down = (i + 1) < d
            blk = HINConvBlock((2 ** i) * c, downsample=down, relu_slope=self.relu_slope,
                               use_csff=down, use_hin=use_hin, name=f"down2_{i}")
            if down:
                x2, x2_up = blk(x2, encs[i], decs[-i - 1])
                blocks.append(x2_up)
            else:
                x2 = blk(x2)
        for i, j in enumerate(reversed(range(d - 1))):
            bridge = nn.Conv((2 ** j) * c, (3, 3), dtype=self.dtype,
                             name=f"skip2_{i}")(blocks[-i - 1])
            x2 = HINUpBlock((2 ** j) * c, self.relu_slope, name=f"up2_{i}")(x2, bridge)

        y2 = nn.Conv(3, (3, 3), dtype=self.dtype, name="last")(x2) + x
        return {"stage1": y1, "enhanced": y2}


def _hinet_loss():
    psnr_l = LOSSES.build("psnr_loss")

    def fn(outputs, datapoint):
        target = datapoint["ref_image"]
        return psnr_l(outputs["enhanced"], target) + psnr_l(outputs["stage1"], target)
    return fn


@MODELS.register(name="hinet_re", arch="hinet", aliases=["hinet"],
                 tasks=(Task.DEBLUR, Task.DENOISE, Task.DERAIN, Task.DESNOW, Task.LES),
                 schemes=(Scheme.SUPERVISED,))
def hinet_re(num_channels: int = 64, depth: int = 5, relu_slope: float = 0.2,
             in_pos_left: int = 0, in_pos_right: int = 4, **kwargs) -> Model:
    return Model(
        name="hinet_re", arch="hinet",
        module=HINetModule(num_channels=num_channels, depth=depth,
                           relu_slope=relu_slope, in_pos_left=in_pos_left,
                           in_pos_right=in_pos_right),
        tasks=(Task.DEBLUR, Task.DENOISE, Task.DERAIN, Task.DESNOW, Task.LES),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_hinet_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
