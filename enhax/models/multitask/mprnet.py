"""MPRNet: multi-stage progressive restoration — faithful rebuild.

Reference ``vision/enhance/multitask/mprnet/mprnet.py:51-549``:

  * stage 1 runs a 3-level CAB UNet on FOUR image quadrants, stage 2 on
    two halves (features concatenated back along W then H), stage 3 on
    the full image (multi-patch hierarchy, :487-543).
  * CAB = conv-PReLU-conv + channel attention + skip (:117-161); the
    reference passes ONE shared ``nn.PReLU()`` instance into every CAB,
    so all CAB activations share a single scalar alpha — each flax CAB
    keeps its own (the converter copies the duplicated torch entries,
    which are the same tensor).
  * Down/UpSample: bilinear (align_corners=False) 0.5x/2x + 1x1 conv
    with channel growth ``scale_unetfeats`` per level (:51-114).
  * cross-stage feature fusion (CSFF) 1x1 convs feed stage-1 features
    into the stage-2 encoder (:208-239).
  * SAM supervised-attention bridges between stages (:164-182).
  * stage 3 = ORSNet: three 8-CAB original-resolution blocks with
    upsampled encoder/decoder injections (:278-354).

Loss (:429 + :463-476): EdgeCharbonnier summed over stage1/stage2/
enhanced outputs. Defaults: channels 96, scale_unetfeats 48,
scale_orsnetfeats 32, num_cab 8, reduction 4, no bias.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.nn.layers import conv1x1
from enhax.models.base import Model


def _bilinear(x, scale: float):
    h = int(x.shape[-3] * scale)
    w = int(x.shape[-2] * scale)
    return jax.image.resize(x, x.shape[:-3] + (h, w) + x.shape[-1:],
                            "bilinear", antialias=False)


class CAB(nn.Module):
    """Channel attention block (mprnet.py:117-161)."""
    features: int
    reduction: int = 4
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b = self.use_bias
        y = nn.Conv(self.features, (3, 3), use_bias=b, dtype=d,
                    name="conv1")(x)
        alpha = self.param("prelu", lambda *_: jnp.full((1,), 0.25))
        y = jnp.where(y >= 0, y, alpha * y)
        y = nn.Conv(self.features, (3, 3), use_bias=b, dtype=d,
                    name="conv2")(y)
        s = jnp.mean(y, axis=(-3, -2), keepdims=True)
        s = nn.relu(conv1x1(self.features // self.reduction, use_bias=b, dtype=d, name="ca1")(s))
        s = nn.sigmoid(conv1x1(self.features, use_bias=b, dtype=d,
                               name="ca2")(s))
        return y * s + x


class SAMBlock(nn.Module):
    """Supervised attention module, kernel 1 (mprnet.py:164-182)."""
    features: int
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, x_img):
        d, b = self.dtype, self.use_bias
        x1 = conv1x1(self.features, use_bias=b, dtype=d,
                     name="conv1")(x)
        img = conv1x1(3, use_bias=b, dtype=d,
                      name="conv2")(x) + x_img
        x2 = nn.sigmoid(conv1x1(self.features, use_bias=b, dtype=d,
                                name="conv3")(img))
        return x1 * x2 + x, img


class _Encoder(nn.Module):
    channels: int
    s_unet: int
    reduction: int = 4
    csff: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, enc_outs=None, dec_outs=None):
        d = self.dtype
        c, s = self.channels, self.s_unet
        dims = (c, c + s, c + 2 * s)
        outs = []
        for lvl in range(3):
            for j in range(2):
                x = CAB(dims[lvl], self.reduction, dtype=d,
                        name=f"lvl{lvl + 1}_{j}")(x)
            if self.csff and enc_outs is not None:
                x = x + conv1x1(dims[lvl], use_bias=False, dtype=d,
                                name=f"csff_enc{lvl + 1}")(enc_outs[lvl]) \
                      + conv1x1(dims[lvl], use_bias=False, dtype=d,
                                name=f"csff_dec{lvl + 1}")(dec_outs[lvl])
            outs.append(x)
            if lvl < 2:
                x = conv1x1(dims[lvl + 1], use_bias=False, dtype=d,
                            name=f"down{lvl + 1}{lvl + 2}")(
                    _bilinear(x, 0.5))
        return outs


class _Decoder(nn.Module):
    channels: int
    s_unet: int
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, encs):
        d = self.dtype
        c, s = self.channels, self.s_unet
        dims = (c, c + s, c + 2 * s)
        enc1, enc2, enc3 = encs
        dec3 = enc3
        for j in range(2):
            dec3 = CAB(dims[2], self.reduction, dtype=d,
                       name=f"lvl3_{j}")(dec3)
        skip2 = CAB(dims[1], self.reduction, dtype=d, name="skip_attn2")(enc2)
        x = conv1x1(dims[1], use_bias=False, dtype=d,
                    name="up32")(_bilinear(dec3, 2.0)) + skip2
        dec2 = x
        for j in range(2):
            dec2 = CAB(dims[1], self.reduction, dtype=d,
                       name=f"lvl2_{j}")(dec2)
        skip1 = CAB(dims[0], self.reduction, dtype=d, name="skip_attn1")(enc1)
        x = conv1x1(dims[0], use_bias=False, dtype=d,
                    name="up21")(_bilinear(dec2, 2.0)) + skip1
        dec1 = x
        for j in range(2):
            dec1 = CAB(dims[0], self.reduction, dtype=d,
                       name=f"lvl1_{j}")(dec1)
        return [dec1, dec2, dec3]


class _ORSNet(nn.Module):
    channels: int
    s_ors: int
    s_unet: int
    num_cab: int = 8
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, encs, decs):
        d = self.dtype
        co = self.channels + self.s_ors

        def orb(x, idx):
            y = x
            for j in range(self.num_cab):
                y = CAB(co, self.reduction, dtype=d,
                        name=f"orb{idx}_{j}")(y)
            y = nn.Conv(co, (3, 3), use_bias=False, dtype=d,
                        name=f"orb{idx}_conv")(y)
            return y + x

        def up(t, name):
            cout = t.shape[-1] - self.s_unet
            return conv1x1(cout, use_bias=False, dtype=d,
                           name=name)(_bilinear(t, 2.0))

        c1 = lambda name: conv1x1(co, use_bias=False, dtype=d,  # noqa: E731
                                  name=name)
        x = orb(x, 1)
        x = x + c1("conv_enc1")(encs[0]) + c1("conv_dec1")(decs[0])
        x = orb(x, 2)
        x = x + c1("conv_enc2")(up(encs[1], "up_enc1")) \
              + c1("conv_dec2")(up(decs[1], "up_dec1"))
        x = orb(x, 3)
        e3 = up(up(encs[2], "up_enc2a"), "up_enc2b")
        d3 = up(up(decs[2], "up_dec2a"), "up_dec2b")
        x = x + c1("conv_enc3")(e3) + c1("conv_dec3")(d3)
        return x


class MPRNetModule(nn.Module):
    channels: int = 96
    s_unet: int = 48
    s_ors: int = 32
    num_cab: int = 8
    reduction: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        c = self.channels
        h, w = x.shape[-3], x.shape[-2]

        def make_shallow(idx):
            conv = nn.Conv(c, (3, 3), use_bias=False, dtype=d,
                           name=f"shallow{idx}_conv")
            cab = CAB(c, self.reduction, dtype=d, name=f"shallow{idx}_cab")
            return lambda t: cab(conv(t))

        shallow1 = make_shallow(1)
        shallow2 = make_shallow(2)
        shallow3 = make_shallow(3)

        top, bot = x[:, :h // 2], x[:, h // 2:]
        quads = (top[:, :, :w // 2], top[:, :, w // 2:],
                 bot[:, :, :w // 2], bot[:, :, w // 2:])

        enc1 = _Encoder(c, self.s_unet, self.reduction, dtype=d,
                        name="enc1")
        dec1 = _Decoder(c, self.s_unet, self.reduction, dtype=d,
                        name="dec1")
        feats1 = [enc1(shallow1(q)) for q in quads]
        feat1_top = [jnp.concatenate(kv, axis=2)
                     for kv in zip(feats1[0], feats1[1])]
        feat1_bot = [jnp.concatenate(kv, axis=2)
                     for kv in zip(feats1[2], feats1[3])]
        res1_top = dec1(feat1_top)
        res1_bot = dec1(feat1_bot)
        sam12 = SAMBlock(c, dtype=d, name="sam12")
        top_feats, img1_top = sam12(res1_top[0], top)
        bot_feats, img1_bot = sam12(res1_bot[0], bot)
        stage1_img = jnp.concatenate([img1_top, img1_bot], axis=1)

        cat12 = nn.Conv(c, (3, 3), use_bias=False, dtype=d, name="concat12")
        x2top = cat12(jnp.concatenate([shallow2(top), top_feats], -1))
        x2bot = cat12(jnp.concatenate([shallow2(bot), bot_feats], -1))
        enc2 = _Encoder(c, self.s_unet, self.reduction, csff=True, dtype=d,
                        name="enc2")
        feat2_top = enc2(x2top, feat1_top, res1_top)
        feat2_bot = enc2(x2bot, feat1_bot, res1_bot)
        feat2 = [jnp.concatenate(kv, axis=1)
                 for kv in zip(feat2_top, feat2_bot)]
        res2 = _Decoder(c, self.s_unet, self.reduction, dtype=d,
                        name="dec2")(feat2)
        x3_feats, stage2_img = SAMBlock(c, dtype=d, name="sam23")(res2[0], x)

        x3 = shallow3(x)
        x3 = nn.Conv(c + self.s_ors, (3, 3), use_bias=False, dtype=d,
                     name="concat23")(
            jnp.concatenate([x3, x3_feats], -1))
        x3 = _ORSNet(c, self.s_ors, self.s_unet, self.num_cab,
                     self.reduction, dtype=d, name="ors")(x3, feat2, res2)
        stage3 = nn.Conv(3, (3, 3), use_bias=False, dtype=d,
                         name="tail")(x3)
        return {"enhanced": stage3 + x, "stage1": stage1_img,
                "stage2": stage2_img}


def _mprnet_loss():
    """EdgeCharbonnier summed over all three stage outputs
    (mprnet.py:429, 463-476)."""
    edge_char = LOSSES.build("edge_charbonnier_loss", edge_loss_weight=0.05)

    def fn(outputs, datapoint):
        t = datapoint["ref_image"]
        return (edge_char(outputs["enhanced"], t)
                + edge_char(outputs["stage1"], t)
                + edge_char(outputs["stage2"], t))
    return fn


@MODELS.register(name="mprnet", arch="mprnet",
                 tasks=(Task.DEBLUR, Task.DENOISE, Task.DERAIN, Task.DESNOW),
                 schemes=(Scheme.SUPERVISED,))
def mprnet(channels: int = 96, s_unet: int = 48, s_ors: int = 32,
           num_cab: int = 8, reduction: int = 4, **kwargs) -> Model:
    return Model(
        name="mprnet", arch="mprnet",
        module=MPRNetModule(channels=channels, s_unet=s_unet, s_ors=s_ors,
                            num_cab=num_cab, reduction=reduction),
        tasks=(Task.DEBLUR, Task.DENOISE, Task.DERAIN, Task.DESNOW),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=_mprnet_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
