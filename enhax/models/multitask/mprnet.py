"""MPRNet: multi-stage progressive image restoration.

Rebuild of reference ``vision/enhance/multitask/mprnet/mprnet.py:359`` (a
first-party reimplementation of Zamir et al. 2021): two encoder-decoder
stages + a final original-resolution stage (ORSNet), bridged by supervised
attention (SAM) and cross-stage feature fusion; channel-attention blocks
(CAB) everywhere; multi-patch input splitting in stages 1-2.

Loss: Charbonnier + edge loss over all three stage outputs (MPRNet paper).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


class CAB(nn.Module):
    """Channel attention block: conv-relu-conv + SE gate, residual."""
    features: int
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv2")(y)
        s = jnp.mean(y, axis=(-3, -2), keepdims=True)
        s = nn.relu(nn.Conv(self.features // self.reduction, (1, 1),
                            dtype=self.dtype, name="se1")(s))
        s = jax.nn.sigmoid(nn.Conv(self.features, (1, 1), dtype=self.dtype,
                                   name="se2")(s))
        return x + y * s


class SAMBlock(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_img):
        x1 = nn.Conv(self.features, (3, 3), dtype=self.dtype, name="conv1")(x)
        img = nn.Conv(3, (3, 3), dtype=self.dtype, name="conv2")(x) + x_img
        gate = jax.nn.sigmoid(nn.Conv(self.features, (3, 3), dtype=self.dtype,
                                      name="conv3")(img))
        return x1 * gate + x, img


class EncDec(nn.Module):
    """3-scale encoder-decoder of CABs with additive skips + CSFF inputs."""
    features: int
    n_cab: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x, csff_enc=None, csff_dec=None):
        c = self.features

        def cabs(y, dim, name):
            for j in range(self.n_cab):
                y = CAB(dim, name=f"{name}_{j}")(y)
            return y

        e1 = cabs(x, c, "enc1")
        if csff_enc is not None:
            e1 = e1 + nn.Conv(c, (1, 1), name="csffe1")(csff_enc[0]) \
                    + nn.Conv(c, (1, 1), name="csffd1")(csff_dec[0])
        d1 = nn.Conv(c * 2, (3, 3), strides=(2, 2), dtype=self.dtype, name="down1")(e1)
        e2 = cabs(d1, c * 2, "enc2")
        if csff_enc is not None:
            e2 = e2 + nn.Conv(c * 2, (1, 1), name="csffe2")(csff_enc[1]) \
                    + nn.Conv(c * 2, (1, 1), name="csffd2")(csff_dec[1])
        d2 = nn.Conv(c * 4, (3, 3), strides=(2, 2), dtype=self.dtype, name="down2")(e2)
        e3 = cabs(d2, c * 4, "enc3")

        u2 = nn.ConvTranspose(c * 2, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up2", transpose_kernel=True)(e3)
        dd2 = cabs(u2 + e2, c * 2, "dec2")
        u1 = nn.ConvTranspose(c, (2, 2), strides=(2, 2), dtype=self.dtype,
                              name="up1", transpose_kernel=True)(dd2)
        dd1 = cabs(u1 + e1, c, "dec1")
        return (e1, e2, e3), (dd1, dd2, e3)


class ORSNet(nn.Module):
    """Original-resolution stage: CAB chain at full res with CSFF."""
    features: int
    n_cab: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, enc, dec):
        c = self.features
        y = x + nn.Conv(c, (1, 1), name="csffe")(enc[0]) \
              + nn.Conv(c, (1, 1), name="csffd")(dec[0])
        for j in range(self.n_cab):
            y = CAB(c, name=f"orb_{j}")(y)
        return y


class MPRNetModule(nn.Module):
    features: int = 40
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = self.features
        shallow = lambda name: nn.Sequential([
            nn.Conv(c, (3, 3), dtype=self.dtype),
            CAB(c),
        ], name=name)

        # Stage 1: operate on top/bottom halves
        h = x.shape[-3]
        top, bot = x[..., : h // 2, :, :], x[..., h // 2 :, :, :]
        f_top = shallow("shallow1t")(top)
        f_bot = shallow("shallow1b")(bot)
        ed1 = EncDec(c, name="stage1")
        enc_t, dec_t = ed1(f_top)
        enc_b, dec_b = ed1(f_bot)
        enc1 = [jnp.concatenate([a, b], axis=-3) for a, b in zip(enc_t, enc_b)]
        dec1 = [jnp.concatenate([a, b], axis=-3) for a, b in zip(dec_t, dec_b)]
        sam1_feats, stage1_img = SAMBlock(c, name="sam1")(dec1[0], x)

        # Stage 2: full image + stage-1 features
        f2 = shallow("shallow2")(x)
        f2 = nn.Conv(c, (1, 1), name="concat12")(
            jnp.concatenate([f2, sam1_feats], axis=-1))
        enc2, dec2 = EncDec(c, name="stage2")(f2, enc1, dec1)
        sam2_feats, stage2_img = SAMBlock(c, name="sam2")(dec2[0], x)

        # Stage 3: original-resolution subnetwork
        f3 = shallow("shallow3")(x)
        f3 = nn.Conv(c, (1, 1), name="concat23")(
            jnp.concatenate([f3, sam2_feats], axis=-1))
        y = ORSNet(c, name="orsnet")(f3, enc2, dec2)
        out = nn.Conv(3, (3, 3), dtype=self.dtype, name="tail")(y) + x
        return {"enhanced": out, "stage2": stage2_img, "stage1": stage1_img}


def _mpr_loss():
    char = LOSSES.build("charbonnier_loss")
    edge = LOSSES.build("edge_loss")

    def fn(outputs, datapoint):
        t = datapoint["ref_image"]
        loss = 0.0
        for k in ("enhanced", "stage2", "stage1"):
            loss = loss + char(outputs[k], t) + 0.05 * edge(outputs[k], t)
        return loss
    return fn


@MODELS.register(name="mprnet", arch="mprnet",
                 tasks=(Task.DEBLUR, Task.DENOISE, Task.DERAIN),
                 schemes=(Scheme.SUPERVISED,))
def mprnet(features: int = 40, **kwargs) -> Model:
    return Model(
        name="mprnet", arch="mprnet",
        module=MPRNetModule(features=features),
        tasks=(Task.DEBLUR, Task.DENOISE, Task.DERAIN),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_mpr_loss(),
        required_inputs=("image",),
        size_divisor=8,
    )
