"""ZID: zero-shot image dehazing (deep-image-prior style, per image).

Faithful rebuild of reference ``vision/enhance/dehaze/zid/zid.py``:

  * ``encoder_decoder_skip`` (:79-189): the DIP recursive hourglass —
    per level, a 1x1 skip branch (levels 4/5 only) in parallel with a
    stride-2 double-conv "deeper" branch that recurses then upsamples
    (bilinear align_corners=True); concat -> BN -> 3x3 conv -> 1x1
    conv, all reflection-padded with LeakyReLU(0.01); sigmoid head.
  * ``VariationalAutoEncoder`` (:191-318): 4x conv5/pool encoder to a
    100-d latent (fc over the NCHW-flattened map), decoder = linear +
    4x [bilinear up, conv5, BN, ReLU] to a FULL-RES ambient image;
    KL = 0.5 * SUM(exp(logvar) + mu^2 - 1 - logvar). (The decoder's
    conv1..conv4 blocks are dead weights upstream.)
  * forward (:437-452): J = image_net(I); A = ambient_net(I);
    t = mask_net(I) clipped, refined by a COLOR guided filter
    (cv2.ximgproc.guidedFilter, radius 50, eps 1e-4, :453-467) and
    clipped to [0.1, 1]; enhanced = clip((I - (1-t)A)/t).
  * loss (:412-435): composition MSE (target is the J-net output,
    as upstream), VAE KL, StdLoss(5x5 blur residual, VALID conv) on
    mask/ambient, DCP-to-zero MSE - 0.05, and an MSE pull of A toward
    the DCP atmospheric light (prior/image.py:36-63: channel max over
    the top 1e-4 dark-channel pixels, 15x15 edge-padded erosion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.resize import resize_align_corners


def _reflect_conv(x, features, kernel, stride=1, name=None, parent=None):
    pad = (kernel - 1) // 2
    if pad:
        x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)],
                    mode="reflect")
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding="VALID", name=name)(x)


class DIPSkipNet(nn.Module):
    """encoder_decoder_skip (zid.py:79-189), reflection padding,
    bilinear align_corners=True upsampling."""
    out_channels: int = 3
    channels_down: tuple = (8, 16, 32, 64, 128)
    channels_skip: tuple = (0, 0, 0, 4, 4)
    sigmoid: bool = True

    @nn.compact
    def __call__(self, x):
        cd, cs = self.channels_down, self.channels_skip
        last = len(cd) - 1
        lrelu = lambda t: nn.leaky_relu(t, 0.01)  # noqa: E731
        bn = lambda t, name: nn.BatchNorm(  # noqa: E731
            use_running_average=True, epsilon=1e-5, name=name)(t)

        def level(x, i):
            s = None
            if cs[i]:
                s = _reflect_conv(x, cs[i], 1, name=f"l{i}_skip_conv")
                s = lrelu(bn(s, f"l{i}_skip_bn"))
            d = _reflect_conv(x, cd[i], 3, stride=2, name=f"l{i}_d1")
            d = lrelu(bn(d, f"l{i}_d1_bn"))
            d = _reflect_conv(d, cd[i], 3, name=f"l{i}_d2")
            d = lrelu(bn(d, f"l{i}_d2_bn"))
            if i < last:
                d = level(d, i + 1)
            d = resize_align_corners(d, (d.shape[-3] * 2, d.shape[-2] * 2))
            y = jnp.concatenate([s, d], axis=-1) if s is not None else d
            y = bn(y, f"l{i}_cat_bn")
            y = lrelu(bn(_reflect_conv(y, cd[i], 3, name=f"l{i}_u1"),
                         f"l{i}_u1_bn"))
            y = lrelu(bn(_reflect_conv(y, cd[i], 1, name=f"l{i}_u2"),
                         f"l{i}_u2_bn"))
            return y

        y = level(x, 0)
        y = _reflect_conv(y, self.out_channels, 1, name="out_conv")
        return jax.nn.sigmoid(y) if self.sigmoid else y


class AmbientVAE(nn.Module):
    """VariationalAutoEncoder (zid.py:191-318); ``size`` must match the
    input spatial dims (the latent fcs are size-dependent)."""
    size: tuple = (128, 128)

    @nn.compact
    def __call__(self, x, eps=None):
        y = x
        for i, c in enumerate((16, 32, 64, 128)):
            y = nn.relu(nn.Conv(c, (5, 5), name=f"enc_conv{i + 1}")(y))
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        flat = jnp.moveaxis(y, -1, 1).reshape(y.shape[0], -1)  # NCHW order
        mu = nn.Dense(100, name="fc1")(flat)
        logvar = nn.Dense(100, name="fc2")(flat)
        z = mu if eps is None else mu + jnp.exp(0.5 * logvar) * eps
        h16, w16 = self.size[0] // 16, self.size[1] // 16
        d = nn.Dense(128 * h16 * w16, name="linear0")(z)
        d = jnp.moveaxis(d.reshape(-1, 128, h16, w16), 1, -1)
        for i, c in enumerate((64, 32, 16)):
            d = jax.image.resize(
                d, (d.shape[0], d.shape[1] * 2, d.shape[2] * 2, d.shape[3]),
                "bilinear", antialias=False)
            d = nn.Conv(c, (5, 5), name=f"de_conv{i + 1}")(d)
            d = nn.relu(nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                                     name=f"de_bn{i + 1}")(d))
        d = jax.image.resize(
            d, (d.shape[0], d.shape[1] * 2, d.shape[2] * 2, d.shape[3]),
            "bilinear", antialias=False)
        d = jax.nn.sigmoid(nn.Conv(3, (5, 5), name="de_conv4")(d))
        # zid.py:312-318: KL with SUM reduction
        kl = 0.5 * jnp.sum(jnp.exp(logvar) + mu ** 2 - 1 - logvar)
        return d, kl


def _box_mean(x, radius):
    """Normalized box filter with reflect-101 borders (cv2.boxFilter
    default), the primitive inside OpenCV's guided filter."""
    k = 2 * radius + 1
    xp = jnp.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)),
                 mode="reflect")
    s = jax.lax.reduce_window(xp, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, 1, 1, 1), "VALID")
    return s / (k * k)


def color_guided_filter(guide_rgb, src, radius: int = 50, eps: float = 1e-4):
    """He et al. color guided filter (the algorithm behind
    cv2.ximgproc.guidedFilter with a 3-channel guide, zid.py:453-467)."""
    I = guide_rgb
    p = src
    mean_I = _box_mean(I, radius)                       # (n,h,w,3)
    mean_p = _box_mean(p, radius)                       # (n,h,w,1)
    corr_Ip = _box_mean(I * p, radius)
    cov_Ip = corr_Ip - mean_I * mean_p                  # (n,h,w,3)
    # 3x3 covariance of the guide
    outer = I[..., :, None] * I[..., None, :]           # (n,h,w,3,3)
    mean_II = _box_mean(outer.reshape(*I.shape[:-1], 9),
                        radius).reshape(*I.shape[:-1], 3, 3)
    var_I = mean_II - mean_I[..., :, None] * mean_I[..., None, :]
    A = var_I + eps * jnp.eye(3, dtype=I.dtype)
    a = jnp.linalg.solve(A, cov_Ip[..., None])[..., 0]  # (n,h,w,3)
    b = mean_p[..., 0] - jnp.sum(a * mean_I, axis=-1)   # (n,h,w)
    mean_a = _box_mean(a, radius)
    mean_b = _box_mean(b[..., None], radius)
    return jnp.sum(mean_a * I, axis=-1, keepdims=True) + mean_b


class ZIDModule(nn.Module):
    size: tuple = (128, 128)
    clip_t: bool = True

    @nn.compact
    def __call__(self, x):
        image = DIPSkipNet(3, name="image_net")(x)
        mask = DIPSkipNet(1, name="mask_net")(x)
        ambient, kl = AmbientVAE(self.size, name="ambient_net")(x)
        a = jnp.clip(ambient, 0, 1)
        t = jnp.clip(mask, 0, 1)
        t = color_guided_filter(x, t, radius=50, eps=1e-4)
        t = jnp.clip(t, 0.1 if self.clip_t else 0.0, 1.0)
        y = jnp.clip((x - (1 - t) * a) / t, 0, 1)
        return {"image": image, "mask": mask, "ambient": ambient,
                "enhanced": y, "vae_kl": kl}


def atmospheric_prior(x, kernel_size: int = 15, p: float = 1e-4):
    """DCP airlight (prior/image.py:36-63): per-channel MAX over the top
    ``p`` fraction of dark-channel (15x15 edge-padded erosion) pixels."""
    pad = kernel_size // 2
    dark = jnp.min(x, axis=-1, keepdims=True)
    dark = jnp.pad(dark, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="edge")
    dark = -jax.lax.reduce_window(-dark, -jnp.inf, jax.lax.max,
                                  (1, kernel_size, kernel_size, 1),
                                  (1, 1, 1, 1), "VALID")
    n = x.shape[-3] * x.shape[-2]
    top = max(int(n * p), 1)
    flat_dark = dark.reshape(x.shape[0], -1)
    flat = x.reshape(x.shape[0], -1, 3)
    _, idx = jax.lax.top_k(flat_dark, top)
    sel = jnp.take_along_axis(flat, idx[..., None], axis=1)
    return jnp.max(sel, axis=1)[:, None, None, :]


def _std_loss(v):
    """StdLoss (loss/image.py:1274-1307): MSE between the VALID-conv
    identity and 5x5 box blur of the channel mean."""
    g = jnp.mean(v, axis=-1, keepdims=True)
    center = g[:, 2:-2, 2:-2]
    blur = jax.lax.reduce_window(g, 0.0, jax.lax.add, (1, 5, 5, 1),
                                 (1, 1, 1, 1), "VALID") / 25.0
    return jnp.mean((center - blur) ** 2)


def _zid_forward_loss(model, variables, datapoint, rngs):
    lq = datapoint["image"]
    out = model.apply(variables, {"image": lq}, rngs=rngs)
    image, mask, ambient = out["image"], out["mask"], out["ambient"]
    mse = lambda a, b: jnp.mean((a - b) ** 2)  # noqa: E731

    # zid.py:422: upstream's MSE target is the J-net output itself
    loss = mse(mask * image + (1 - mask) * ambient, image)
    loss += out["vae_kl"]
    loss += 0.005 * _std_loss(mask) + 0.1 * _std_loss(ambient)
    dcp = jnp.min(image, axis=-1)
    loss += mse(dcp, jnp.zeros_like(dcp)) - 0.05
    prior = jax.lax.stop_gradient(atmospheric_prior(lq))
    loss += mse(ambient, prior * jnp.ones_like(ambient))
    return loss, out


@MODELS.register(name="zid", arch="zid",
                 tasks=(Task.DEHAZE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zid(image_size=(128, 128), **kwargs) -> Model:
    return Model(
        name="zid", arch="zid",
        module=ZIDModule(size=tuple(image_size)),
        tasks=(Task.DEHAZE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        forward_loss_fn=_zid_forward_loss,
        required_inputs=("image",),
        instance_steps=500, instance_lr=1e-3,
        size_divisor=32,
    )
