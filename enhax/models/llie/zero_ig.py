"""ZERO-IG: zero-shot illumination-guided joint denoising + enhancement.

Faithful rebuild of reference ``vision/enhance/llie/zero_ig/zero_ig.py``
(CVPR'24):

  * ``Denoise1`` (:270-295): 3->e->e->3 convs, LeakyReLU(0.2);
    ``Denoise2`` (:297-305): the SAME widths on 6-channel [image,
    illumination] stacks (the model passes embed_channels to both).
  * ``Enhance`` (:307-347): in conv + ONE shared Conv+BN+ReLU residual
    block applied ``layers``(=3) times + sigmoid head, clamped to
    [1e-4, 1].
  * forward (:436-506): l2 = clip(I - D1(I)); s2 = Enhance(sg(l2));
    h2 = clip(I / s2) is the USER-FACING enhanced output; the 6-channel
    D2 refines [h2, s2] into [h3, s3]; sub-image passes (pair
    downsample) feed the self-supervised loss.
  * loss (:160-252): adaptive brightness targets, the quirky
    YCbCr SmoothLoss (flat-view conversion, 24 directional bilateral
    weights, :72-157), ZSN2N-style residual/consistency on both stages,
    21x21 erf-kernel blur color term (:508-537), texture-gated local
    mean consistency and local-variance matching (:41-53). The Y
    luminance uses the reference's reversed channel weights as-is.

Per-image fit; reference trains with Adam + grad clip 5 (:556-585).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.geometry import pair_downsample


class DenoiseNet(nn.Module):
    """Denoise1/Denoise2 (zero_ig.py:270-305)."""
    embed_channels: int = 48
    in_out: int = 3

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(nn.Conv(self.embed_channels, (3, 3), name="conv1")(x), 0.2)
        y = nn.leaky_relu(nn.Conv(self.embed_channels, (3, 3), name="conv2")(y), 0.2)
        return nn.Conv(self.in_out, (1, 1), name="conv3")(y)


class Enhance(nn.Module):
    """zero_ig.py:307-347: one shared Conv+BN+ReLU residual block applied
    ``layers`` times."""
    channels: int = 64
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        fea = nn.relu(nn.Conv(self.channels, (3, 3), name="in_conv")(x))
        block_conv = nn.Conv(self.channels, (3, 3), name="block_conv")
        block_bn = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                name="block_bn")
        for _ in range(self.layers):
            fea = fea + nn.relu(block_bn(block_conv(fea)))
        out = jax.nn.sigmoid(nn.Conv(3, (3, 3), name="out_conv")(fea))
        return jnp.clip(out, 1e-4, 1.0)


def _blur21(x):
    """Reference blur (zero_ig.py:508-537): 21x21 kernel from erf-CDF
    differences, sqrt of outer product, reflect padding, depthwise."""
    ks, ns = 21, 1
    interval = (2 * ns + 1.0) / ks
    grid = np.linspace(-ns - interval / 2.0, ns + interval / 2.0, ks + 1)
    from scipy.special import erf  # local: scipy is baked in
    cdf = 0.5 * (1 + erf(grid / np.sqrt(2.0)))
    k1 = np.diff(cdf)
    k2 = np.sqrt(np.outer(k1, k1))
    k2 = (k2 / k2.sum()).astype(np.float32)
    k = jnp.asarray(k2)
    xp = jnp.pad(x, ((0, 0), (10, 10), (10, 10), (0, 0)), mode="reflect")
    # depthwise 21x21
    patches = jax.lax.conv_general_dilated(
        xp.transpose(0, 3, 1, 2).reshape(-1, 1, xp.shape[1], xp.shape[2]),
        k[None, None], (1, 1), "VALID")
    n, c = x.shape[0], x.shape[-1]
    return patches.reshape(n, c, x.shape[1], x.shape[2]).transpose(0, 2, 3, 1)


def _mean5_zero(x):
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "SAME")
    return s / 25.0


def _local_var5(x):
    """calculate_local_variance (zero_ig.py:41-53): windows of the
    zero-padded image vs the zero-padded 5x5 average."""
    d = x - _mean5_zero(x)
    return _mean5_zero(d * d)


def _local_mean5_reflect(x):
    """core.ImageLocalMean(5) (core/image/utils.py:851-861)."""
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "VALID")
    return s / 25.0


def _local_stddev5_reflect(x, eps=1e-9):
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, 5, 5, 1),
                              (1, 1, 1, 1), "VALID") / 25.0
    s2 = jax.lax.reduce_window(xp * xp, 0.0, jax.lax.add, (1, 5, 5, 1),
                               (1, 1, 1, 1), "VALID") / 25.0
    return jnp.sqrt(jnp.maximum(s2 - s * s, 0.0) + eps)


def texture_difference(a, b, constant_c=1e-5, threshold=0.975):
    """mon.nn.TextureDifferenceLoss (loss/image.py:1311-1353): binary
    local-stddev similarity gate; gray uses the reference's reversed
    luminance weights."""
    def gray(t):
        return (0.144 * t[..., 0:1] + 0.587 * t[..., 1:2]
                + 0.299 * t[..., 2:3])
    s1 = _local_stddev5_reflect(gray(a))
    s2 = _local_stddev5_reflect(gray(b))
    diff = 2 * s1 * s2 / (s1 ** 2 + s2 ** 2 + constant_c)
    return jnp.where(diff > threshold, 1.0, 0.0)


def _smooth_loss(inp, target, sigma=10.0):
    """SmoothLoss (zero_ig.py:57-157): 24 directional bilateral weights in
    the reference's flat-view 'YCbCr' space, L1 channel-norm target
    gradients. Works in NCHW to reproduce the view(-1, 3) quirk."""
    x = jnp.moveaxis(inp, -1, 1)       # NCHW
    t = jnp.moveaxis(target, -1, 1)
    n, c, h, w = x.shape
    mat = jnp.asarray([[0.257, -0.148, 0.439],
                       [0.564, -0.291, -0.368],
                       [0.098, 0.439, -0.071]], x.dtype)
    bias = jnp.asarray([16.0 / 255.0, 128.0 / 255.0, 128.0 / 255.0], x.dtype)
    flat = x.reshape(-1, 3)            # groups of 3 along W (upstream quirk)
    y = (flat @ mat + bias).reshape(n, c, h, w)

    sc = -1.0 / (2 * sigma * sigma)
    offs = [((1, None), (None, None)), ((None, -1), (None, None)),
            ((None, None), (1, None)), ((None, None), (None, -1)),
            ((None, -1), (None, -1)), ((1, None), (1, None)),
            ((1, None), (None, -1)), ((None, -1), (1, None)),
            ((2, None), (None, None)), ((None, -2), (None, None)),
            ((None, None), (2, None)), ((None, None), (None, -2)),
            ((None, -2), (None, -1)), ((2, None), (1, None)),
            ((2, None), (None, -1)), ((None, -2), (1, None)),
            ((None, -1), (None, -2)), ((1, None), (2, None)),
            ((1, None), (None, -2)), ((None, -1), (2, None)),
            ((None, -2), (None, -2)), ((2, None), (2, None)),
            ((2, None), (None, -2)), ((None, -2), (2, None))]

    def shift(v, hs, ws):
        return v[:, :, hs[0]:hs[1], ws[0]:ws[1]]

    def opposite(hs, ws):
        def flip(s):
            a, b = s
            if a is None and b is None:
                return s
            if a is not None and b is None:
                return (None, -a)
            return (-b, None)
        return flip(hs), flip(ws)

    total = 0.0
    for hs, ws in offs:
        ohs, ows = opposite(hs, ws)
        wgt = jnp.exp(jnp.sum((shift(y, hs, ws) - shift(y, ohs, ows)) ** 2,
                              axis=1, keepdims=True) * sc)
        grad = jnp.sum(jnp.abs(shift(t, hs, ws) - shift(t, ohs, ows)),
                       axis=1, keepdims=True)
        total = total + jnp.mean(wgt * grad)
    return total


class ZeroIGModule(nn.Module):
    """Training-branch forward (zero_ig.py:436-506); ``enhanced`` is h2
    (the predicting-branch output, :447-457)."""
    num_channels: int = 64
    embed_channels: int = 48

    @nn.compact
    def __call__(self, x):
        eps = 1e-4
        sg = jax.lax.stop_gradient
        image = x + eps
        d1 = DenoiseNet(self.embed_channels, 3, name="denoise1")
        d2 = DenoiseNet(self.embed_channels, 6, name="denoise2")
        enh = Enhance(channels=self.num_channels, name="enhance")

        l11, l12 = pair_downsample(image)
        l_pred1 = l11 - d1(l11)
        l_pred2 = l12 - d1(l12)
        l2 = jnp.clip(image - d1(image), eps, 1.0)
        s2 = enh(sg(l2))
        s21, s22 = pair_downsample(s2)
        h2 = jnp.clip(image / s2, eps, 1.0)
        h11 = jnp.clip(l11 / s21, eps, 1.0)
        h12 = jnp.clip(l12 / s22, eps, 1.0)
        cat1 = jnp.concatenate([h11, s21], -1)
        h3_pred = jnp.clip(sg(cat1) - d2(cat1), eps, 1.0)
        cat2 = jnp.concatenate([h12, s22], -1)
        h4_pred = jnp.clip(sg(cat2) - d2(cat2), eps, 1.0)
        cat5 = jnp.concatenate([h2, s2], -1)
        h5_pred = jnp.clip(sg(cat5) - d2(cat5), eps, 1.0)
        h3, s3 = h5_pred[..., :3], h5_pred[..., 3:]
        h1 = jnp.clip(l2 / s2, 0.0, 1.0)
        return {
            "l_pred1": l_pred1, "l_pred2": l_pred2, "l2": l2, "s2": s2,
            "s21": s21, "s22": s22, "h2": h2, "h11": h11, "h12": h12,
            "h13": h3_pred[..., :3], "s13": h3_pred[..., 3:],
            "h14": h4_pred[..., :3], "s14": h4_pred[..., 3:],
            "h3": h3, "s3": s3, "h3_pred": h3_pred, "h4_pred": h4_pred,
            "h2_blur": _blur21(h1), "h3_blur": _blur21(h3),
            "denoise": h3, "enhanced": h2,
        }


def _zero_ig_forward_loss(model, variables, datapoint, rngs):
    """Reference Loss.forward (zero_ig.py:160-252), term for term."""
    out = model.apply(variables, datapoint, rngs=rngs)
    eps = 1e-9
    image = datapoint["image"] + eps
    sg = jax.lax.stop_gradient
    mse = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731
    l2, s2 = out["l2"], out["s2"]
    h2, h3 = out["h2"], out["h3"]

    # adaptive brightness targets (:205-218); Y weights reversed upstream
    input_y = (sg(l2)[..., 2] * 0.299 + sg(l2)[..., 1] * 0.587
               + sg(l2)[..., 0] * 0.144)
    y_mean = jnp.mean(input_y, axis=(-2, -1))[:, None, None, None]
    factor = jnp.clip(0.5 / (y_mean + eps), 1.0, 25.0)
    adjustment_ratio = jnp.power(0.7, -factor) / factor
    norm_low = jnp.clip(sg(l2) / s2, eps, 0.8)
    enhanced_brightness = jnp.power(sg(l2) * factor, factor)
    clamped_eb = jnp.clip(enhanced_brightness * adjustment_ratio, eps, 1.0)
    clamped_adj = jnp.clip(sg(l2) * factor, eps, 1.0)
    loss = 700.0 * mse(s2, clamped_eb) + 1000.0 * mse(norm_low, clamped_adj)
    loss += 5.0 * _smooth_loss(sg(l2), s2)
    tv_b, tv_h, tv_w, tv_c = s2.shape
    h_tv = jnp.sum((s2[:, 1:] - s2[:, :-1]) ** 2)
    w_tv = jnp.sum((s2[:, :, 1:] - s2[:, :, :-1]) ** 2)
    loss += 1600.0 * 2 * (h_tv / ((tv_h - 1) * tv_w * tv_c)
                          + w_tv / (tv_h * (tv_w - 1) * tv_c)) / tv_b

    # Loss_res_1 (:222-229)
    l11, l12 = pair_downsample(image)
    loss += 1000.0 * (mse(l11, out["l_pred2"]) + mse(l12, out["l_pred1"]))
    den1, den2 = pair_downsample(l2)
    loss += 1000.0 * (mse(out["l_pred1"], den1) + mse(out["l_pred2"], den2))

    # Loss_res_2 (:231-236)
    loss += 1000.0 * mse(out["h3_pred"],
                         sg(jnp.concatenate([out["h12"], out["s22"]], -1)))
    loss += 1000.0 * mse(out["h4_pred"],
                         sg(jnp.concatenate([out["h11"], out["s21"]], -1)))
    h3d1, h3d2 = pair_downsample(h3)
    loss += 1000.0 * (mse(out["h3_pred"][..., :3], h3d1)
                      + mse(out["h4_pred"][..., :3], h3d2))

    # Loss_color (:238) + Loss_ill (:240)
    loss += 10000.0 * mse(sg(out["h2_blur"]), out["h3_blur"])
    loss += 1000.0 * mse(sg(s2), out["s3"])

    # Loss_cons (:242-247): gate reuses h3d1 in BOTH weighted diffs
    gate = texture_difference(h3d1, h3d2)
    lm1 = _local_mean5_reflect(h3d1)
    lm2 = _local_mean5_reflect(h3d2)
    wd1 = (1.0 - gate) * lm1 + h3d1 * gate
    wd2 = (1.0 - gate) * lm2 + h3d1 * gate
    loss += 10000.0 * (mse(h3d1, wd1) + mse(h3d2, wd2))

    # Loss_Var (:249-251)
    loss += 1000.0 * mse(_local_var5(h2), _local_var5(h3 - h2))
    return loss, out


@MODELS.register(name="zero_ig_re", arch="zero_ig", aliases=["zero_ig"],
                 tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zero_ig_re(num_channels: int = 64, embed_channels: int = 48, **kwargs) -> Model:
    return Model(
        name="zero_ig_re", arch="zero_ig",
        module=ZeroIGModule(num_channels=num_channels, embed_channels=embed_channels),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        forward_loss_fn=_zero_ig_forward_loss,
        required_inputs=("image",),
        instance_steps=1000, instance_lr=1e-4,
        size_divisor=2,
    )
