"""DCC-Net: Deep Color-Consistent low-light enhancement.

Native rebuild of the reference's vendored DCCNet
(mon_extra/vision/enhance/llie/dccnet/src/model.py; EXTRA_MODELS "dccnet").
Three cooperating sub-nets (model.py:5-18):

  * ``g_net`` (model.py:199-262): a 3-level UNet predicting a 1-channel
    gray structure map, ``(tanh+1)/2`` output.
  * ``c_net`` (model.py:146-196): an encoder producing a 128-channel
    1/4-res color feature + a (3, 256)->d_hist softmax color histogram.
  * ``r_net`` (model.py:77-143): a UNet over ``cat(image, gray)`` whose
    skip connections are modulated by the color feature through a pyramid
    color embedding (``pce``/``cma``, model.py:21-74): similarity-gated
    ``x + c*sim`` fusion, with the color feature upsampled nearest-2x
    between levels.

All convs are ``BasicConv`` = conv(no bias) + InstanceNorm(affine=False) +
exact GELU (model.py:265-287); upscaling is ConvTranspose(4, stride 2,
pad 1) (model.py:310-316).

Training loss per the reference adapter (dccnet/my_model.py:29-86):
gray-vs-grayscale(target) L1 / (h*w) + 2 * enhance-vs-input L1 / (h*w*c)
+ 2 * (1 - SSIM(enhance, target)); the color-hist term is commented out
upstream and omitted here too.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import InstanceNorm2d


class _BasicConv(nn.Module):
    features: int
    stride: int = 1
    transpose: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.transpose:
            x = nn.ConvTranspose(self.features, (4, 4), strides=(2, 2),
                                 padding="SAME", transpose_kernel=True,
                                 use_bias=False, dtype=self.dtype,
                                 name="conv")(x)
        else:
            # explicit torch p=1 padding: SAME differs for stride 2
            x = nn.Conv(self.features, (3, 3),
                        strides=(self.stride, self.stride),
                        padding=((1, 1), (1, 1)), use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = InstanceNorm2d(affine=False, dtype=self.dtype)(x)
        return nn.gelu(x, approximate=False)


class _RB(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = _BasicConv(self.features, dtype=self.dtype, name="layer_1")(x)
        y = _BasicConv(self.features, dtype=self.dtype, name="layer_2")(y)
        return y + x


def _encode(x, base, depth, dtype):
    """Encoder stages + middle (model.py:85-98,118-124); shortcut after
    each RB stack. Creates layers in the CALLER's compact scope so g_net
    and r_net each own their params at the top level."""
    shortcuts = []
    for s in range(3):
        ch = base * 2 ** s
        x = _BasicConv(ch, dtype=dtype, name=f"enc{3 * s}")(x)
        for j in range(depth[s]):
            x = _RB(ch, dtype=dtype, name=f"enc{3 * s + 1}_{j}")(x)
        shortcuts.append(x)
        x = _BasicConv(ch * 2, stride=2, dtype=dtype,
                       name=f"enc{3 * s + 2}")(x)
    for j in range(depth[3]):
        x = _RB(base * 8, dtype=dtype, name=f"mid{j}")(x)
    return x, shortcuts


def _decode(x, shortcuts, base, depth, out_ch, dtype):
    """Decoder (model.py:101-116,126-132): up, concat skip, fuse, RBs."""
    for s in range(3):
        ch = base * 2 ** (2 - s)  # 128, 64, 32 after each up
        x = _BasicConv(ch, transpose=True, dtype=dtype,
                       name=f"dec{3 * s}")(x)
        x = jnp.concatenate([x, shortcuts[2 - s]], axis=-1)
        x = _BasicConv(ch, dtype=dtype, name=f"dec{3 * s + 1}")(x)
        for j in range(depth[2 - s]):
            x = _RB(ch, dtype=dtype, name=f"dec{3 * s + 2}_{j}")(x)
    x = nn.Conv(out_ch, (3, 3), dtype=dtype, name="conv_last")(x)
    return (jnp.tanh(x) + 1.0) / 2.0


class _GNet(nn.Module):
    """g_net UNet (model.py:199-262)."""
    base: int = 32
    depth: tuple = (2, 2, 2, 2)
    out_ch: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = _BasicConv(self.base, dtype=self.dtype, name="conv_first")(x)
        x, shortcuts = _encode(x, self.base, self.depth, self.dtype)
        return _decode(x, shortcuts, self.base, self.depth, self.out_ch,
                       self.dtype)


class _CNet(nn.Module):
    """Color encoder + histogram head (model.py:146-196)."""
    base: int = 32
    d_hist: int = 64
    depth: tuple = (2, 2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        bc = self.base
        x = _BasicConv(bc, dtype=self.dtype, name="conv_first")(x)
        for s in range(3):
            ch = bc * 2 ** s
            x = _BasicConv(ch, dtype=self.dtype, name=f"enc{3 * s}")(x)
            for j in range(self.depth[s]):
                x = _RB(ch, dtype=self.dtype, name=f"enc{3 * s + 1}_{j}")(x)
            if s < 2:
                x = _BasicConv(ch * 2, stride=2, dtype=self.dtype,
                               name=f"enc{3 * s + 2}")(x)
        feat = x  # (..., H/4, W/4, 4*base)
        h = _BasicConv(256 * 3, dtype=self.dtype, name="conv_color")(feat)
        h = jnp.mean(h, axis=(-3, -2))  # AdaptiveAvgPool2d(1)
        h = h.reshape(h.shape[:-1] + (3, 256))
        hist = nn.softmax(nn.Dense(self.d_hist, dtype=self.dtype,
                                   name="fc")(h), axis=-1)
        return hist, feat


class _CMA(nn.Module):
    """Color modulation + upsample step (model.py:41-74)."""
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, c, x):
        sim_l1 = 2.0 * nn.sigmoid(
            jnp.sum(-jnp.abs(x - c), axis=-1, keepdims=True))
        sim_cos = jnp.tanh(jnp.sum(x * c, axis=-1, keepdims=True))
        x_color = x + c * (sim_l1 * sim_cos)
        c_up = nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                       name="conv")(c)
        c_up = InstanceNorm2d(affine=False, dtype=self.dtype)(c_up)
        c_up = nn.leaky_relu(c_up, 0.2)
        c_up = jnp.repeat(jnp.repeat(c_up, 2, axis=-3), 2, axis=-2)
        return x_color, c_up


class _RNet(nn.Module):
    """Retouch UNet with pce-modulated skips (model.py:77-143)."""
    base: int = 32
    depth: tuple = (2, 2, 2, 2)
    dtype: Any = None

    @nn.compact
    def __call__(self, img_low, gray, color_feature):
        bc = self.base
        x = jnp.concatenate([img_low, gray], axis=-1)
        x = _BasicConv(bc, dtype=self.dtype, name="conv_first")(x)
        x, shortcuts = _encode(x, bc, self.depth, self.dtype)
        # pce: modulate shortcuts coarsest-first (model.py:31-38)
        c = color_feature
        x3, c = _CMA(bc * 2, dtype=self.dtype, name="cma_3")(c, shortcuts[2])
        x2, c = _CMA(bc, dtype=self.dtype, name="cma_2")(c, shortcuts[1])
        x1, _ = _CMA(bc // 2, dtype=self.dtype, name="cma_1")(c, shortcuts[0])
        return _decode(x, [x1, x2, x3], bc, self.depth, 3, self.dtype)


class DCCNetModule(nn.Module):
    base: int = 32
    d_hist: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        gray = _GNet(base=self.base, out_ch=1, dtype=self.dtype,
                     name="g_net")(x)
        hist, feat = _CNet(base=self.base, d_hist=self.d_hist,
                           dtype=self.dtype, name="c_net")(x)
        enhanced = _RNet(base=self.base, dtype=self.dtype,
                         name="r_net")(x, gray, feat)
        return {"enhanced": enhanced, "gray": gray, "color_hist": hist}


def dccnet_loss(g_weight: float = 1.0, r_weight: float = 2.0,
                ssim_weight: float = 2.0):
    """my_model.py:29-86 (color-hist term commented out upstream)."""
    ssim = LOSSES.build("ssim_loss")

    def fn(outputs, datapoint):
        image = datapoint["image"]
        target = datapoint.get("ref_image", image)
        enhanced = outputs["enhanced"]
        gray = outputs["gray"]
        h, w, c = image.shape[-3], image.shape[-2], image.shape[-1]
        gray_t = (0.299 * target[..., 0:1] + 0.587 * target[..., 1:2]
                  + 0.114 * target[..., 2:3])
        loss_g = jnp.mean(jnp.abs(gray - gray_t)) / (h * w)
        loss_r = jnp.mean(jnp.abs(enhanced - image)) / (h * w * c)
        loss_ssim = ssim(enhanced, target)  # = 1 - SSIM
        return g_weight * loss_g + r_weight * loss_r + ssim_weight * loss_ssim
    return fn


@MODELS.register(name="dccnet", arch="dccnet", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def dccnet(base: int = 32, d_hist: int = 64, **kwargs) -> Model:
    return Model(
        name="dccnet", arch="dccnet",
        module=DCCNetModule(base=base, d_hist=d_hist),
        tasks=(Task.LLIE,),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=dccnet_loss(),
        required_inputs=("image",),
        size_divisor=8,
    )
