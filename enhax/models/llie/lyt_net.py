"""LYT-Net: YUV transformer for low-light enhancement.

Rebuild of reference ``vision/enhance/llie/lyt_net/lyt_net.py:37-395``:
process the Y/Cb/Cr channels separately (Cb/Cr through small UNet denoisers
with an MHSA bottleneck), fuse with a multi-scale enhancement fusion block
(MSEF) and a pooled-MHSA luminance path, sigmoid output.

Loss (lyt_net.py:37-95): smooth-L1 + 0.06*perceptual + 0.05*histogram +
0.5*MS-SSIM + 0.0083*PSNR + 0.25*color.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model


class MHSA(nn.Module):
    """Plain multi-head self attention over flattened pixels (lyt_net.py:193)."""
    embed_size: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        # reference quirk (lyt_net.py:221-223): tokens come from reshaping
        # the CONTIGUOUS NCHW tensor to (B, H*W, C), which mixes channels
        # and pixels; real checkpoints embed this layout, so replicate it
        t = jnp.moveaxis(x, -1, 1).reshape(n, h * w, c)
        hd = self.embed_size // self.num_heads

        def proj(name):
            return nn.Dense(self.embed_size, name=name)(t).reshape(
                n, h * w, self.num_heads, hd).transpose(0, 2, 1, 3)

        q, k, v = proj("query"), proj("key"), proj("value")
        attn = jax.nn.softmax(
            jnp.einsum("nhqd,nhkd->nhqk", q, k,
                       preferred_element_type=jnp.float32) / hd**0.5, axis=-1)
        out = jnp.einsum("nhqk,nhkd->nhqd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(n, h * w, self.embed_size)
        out = nn.Dense(self.embed_size, name="combine")(out)
        return out.reshape(n, h, w, self.embed_size)


class SETanh(nn.Module):
    """SE block with tanh gate (lyt_net.py:147)."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2))
        s = nn.relu(nn.Dense(max(c // self.reduction, 1), name="fc1")(s))
        s = jnp.tanh(nn.Dense(c, name="fc2")(s))
        return x * s[..., None, None, :]


class MSEF(nn.Module):
    """Multi-scale enhancement fusion (lyt_net.py:171)."""
    filters: int

    @nn.compact
    def __call__(self, x):
        xn = nn.LayerNorm(name="norm")(x)
        x1 = nn.Conv(self.filters, (3, 3), feature_group_count=self.filters,
                     name="dw")(xn)
        x2 = SETanh(name="se")(xn)
        return x1 * x2 + x


class ChannelDenoiser(nn.Module):
    """Small stride-2 UNet with MHSA bottleneck (lyt_net.py:235-272)."""
    filters: int

    @nn.compact
    def __call__(self, x):
        act = nn.relu
        x1 = act(nn.Conv(self.filters, (3, 3), name="conv1")(x))
        p1 = ((1, 1), (1, 1))  # torch p=1 (SAME differs at stride 2)
        x2 = act(nn.Conv(self.filters, (3, 3), strides=(2, 2), padding=p1,
                         name="conv2")(x1))
        x3 = act(nn.Conv(self.filters, (3, 3), strides=(2, 2), padding=p1,
                         name="conv3")(x2))
        x4 = act(nn.Conv(self.filters, (3, 3), strides=(2, 2), padding=p1,
                         name="conv4")(x3))
        b = MHSA(self.filters, 4, name="bottleneck")(x4)

        def up(v, ref):
            return jax.image.resize(v, ref.shape, method="nearest")

        y = up(b, x3)
        y = up(y + x3, x2)
        y = up(y + x2, x1)
        y = y + x1
        y = nn.Conv(1, (3, 3), name="res_layer")(y)
        return jnp.tanh(nn.Conv(1, (3, 3), name="output_layer")(y + y))


class LYTNetModule(nn.Module):
    filters: int = 32

    @nn.compact
    def __call__(self, x):
        # YUV-style split (lyt_net.py:381-389)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.14713 * r - 0.28886 * g + 0.436 * b + 0.5
        cr = 0.615 * r - 0.51499 * g - 0.10001 * b + 0.5
        y, cb, cr = y[..., None], cb[..., None], cr[..., None]

        cb = ChannelDenoiser(self.filters // 2, name="denoiser_cb")(cb) + cb
        cr = ChannelDenoiser(self.filters // 2, name="denoiser_cr")(cr) + cr

        act = nn.relu
        y_p = act(nn.Conv(self.filters, (3, 3), name="process_y")(y))
        cb_p = act(nn.Conv(self.filters, (3, 3), name="process_cb")(cb))
        cr_p = act(nn.Conv(self.filters, (3, 3), name="process_cr")(cr))

        ref = jnp.concatenate([cb_p, cr_p], axis=-1)
        lum = y_p
        h, w = lum.shape[-3], lum.shape[-2]
        lum_1 = nn.max_pool(lum, (8, 8), strides=(8, 8))
        lum_1 = MHSA(self.filters, 4, name="lum_mhsa")(lum_1)
        lum_1 = jax.image.resize(lum_1, lum.shape, method="nearest")
        lum = lum + lum_1

        ref = nn.Conv(self.filters, (1, 1), name="ref_conv")(ref)
        shortcut = ref
        ref = ref + 0.2 * nn.Conv(self.filters, (1, 1), name="lum_conv")(lum)
        ref = MSEF(self.filters, name="msef")(ref)
        ref = ref + shortcut

        rec = nn.Conv(self.filters, (3, 3), name="recombine")(
            jnp.concatenate([ref, lum], axis=-1))
        out = nn.Conv(3, (3, 3), name="final_adjustments")(rec)
        return {"enhanced": jax.nn.sigmoid(out)}


def lyt_loss(a1=1.0, a2=0.06, a3=0.05, a4=0.5, a5=0.0083, a6=0.25):
    sl1 = LOSSES.build("smooth_l1_loss")
    per = LOSSES.build("perceptual_loss")
    hist = LOSSES.build("histogram_loss")
    msss = LOSSES.build("ms_ssim_loss")
    psnr_l = LOSSES.build("psnr_loss")
    col = LOSSES.build("color_loss")

    def fn(outputs, datapoint):
        p, t = outputs["enhanced"], datapoint["ref_image"]
        return (a1 * sl1(p, t) + a2 * per(p, t) + a3 * hist(p, t)
                + a4 * msss(p, t) + a5 * psnr_l(p, t) + a6 * col(p, t))
    return fn


@MODELS.register(name="lyt_net_re", arch="lyt_net", aliases=["lyt_net"],
                 tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,))
def lyt_net_re(filters: int = 32, **kwargs) -> Model:
    return Model(
        name="lyt_net_re", arch="lyt_net",
        module=LYTNetModule(filters=filters),
        tasks=(Task.LLIE,), schemes=(Scheme.SUPERVISED,),
        loss_fn=lyt_loss(),
        required_inputs=("image",),
        size_divisor=64,  # pool 8 x three stride-2 downs
    )
