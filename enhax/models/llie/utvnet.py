"""UTVNet: Adaptive Unfolding Total-Variation Network (ICCV 2021).

Native rebuild of the reference's vendored UTVNet
(mon_extra/vision/enhance/llie/utvnet/models/; EXTRA_MODELS "utvnet"):

  * ``noiselevel`` — IRCNN (7 dilated convs 1-2-3-4-3-2-1,
    basicblock.py:36-51) predicting a 24-ch noise map, floored by a
    global Immerkaer-style noise estimate (nli_model.py:28-52: fixed
    3x3 kernel, stride 3, |.| sum scaled by 2*sqrt(pi/2)/eh).
  * ``a`` — an 8-iteration unfolded ADMM TV solver per color channel
    (utv_model.py:29-100): circular forward differences, FFT-domain
    x-update x = ifft(fft(rhs)/(1+rho*eigDtD)), soft shrinkage with the
    per-iteration noise-map channel as threshold; the 8 rho values come
    from HyPaNet (3x 1x1 conv + softplus on the constant 2.0,
    basicblock.py:330-343).
  * ``denoise`` — a UNet over cat(noise level, x - smooth) with
    global-feature FiLM blocks and ADD (not concat) skips
    (ns_model.py:96-213).
  * ``LIGHT`` — IRCNN(3,3,48) light correction, out = x * n
    (lc_model.py:25-32).
  * output = denoise + light(smooth) (network.py:43-59).

The vendored eigDtD construction (utv_model.py:84) only broadcasts for
square inputs; here the standard rectangular form
``|fft([1,-1],H)|^2[:,None] + |fft([1,-1],W)|^2[None,:]`` is used, which
equals the reference exactly on the square crops it runs on.

The vendored repo ships no training code (predict/evaluate only); the
loss here is the paper's supervised L1.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model

_IRCNN_DILATIONS = (1, 2, 3, 4, 3, 2, 1)


class _IRCNN(nn.Module):
    """Dilated conv stack (basicblock.py:36-51)."""
    nc: int
    out_nc: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        n = len(_IRCNN_DILATIONS)
        for i, d in enumerate(_IRCNN_DILATIONS):
            feats = self.out_nc if i == n - 1 else self.nc
            x = nn.Conv(feats, (3, 3), kernel_dilation=(d, d),
                        padding=((d, d), (d, d)), dtype=self.dtype,
                        name=f"conv{i}")(x)
            if i < n - 1:
                x = nn.leaky_relu(x, 0.2)
        return x


class _HyPaNet(nn.Module):
    """1x1-conv MLP -> softplus hyper-parameters (basicblock.py:330-343)."""
    out_nc: int = 8
    channel: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.channel, (1, 1), dtype=self.dtype,
                            name="c0")(x))
        x = nn.relu(nn.Conv(self.channel, (1, 1), dtype=self.dtype,
                            name="c1")(x))
        x = nn.softplus(nn.Conv(self.out_nc, (1, 1), dtype=self.dtype,
                                name="c2")(x))
        return x + 1e-6


def _forward_diff(x):
    """Circular forward differences (utv_model.py:47-54); x (H, W)."""
    return jnp.roll(x, -1, axis=1) - x, jnp.roll(x, -1, axis=0) - x


def _dive(x, y):
    """Divergence (adjoint), utv_model.py:56-63."""
    return (jnp.roll(x, 1, axis=1) - x) + (jnp.roll(y, 1, axis=0) - y)


def _shrink(x, r):
    return jnp.sign(x) * jnp.maximum(jnp.abs(x) - r, 0.0)


def admm_tv(y, lam, rho, iters: int = 8):
    """Unfolded ADMM TV smoothing of one channel (utv_model.py:69-100).

    y (H, W); lam (iters, H, W) per-iteration shrink thresholds;
    rho (iters,) learned penalty weights.
    """
    h, w = y.shape
    d = jnp.array([1.0, -1.0], y.dtype)
    fr = jnp.abs(jnp.fft.fft(d, n=h)) ** 2
    fc = jnp.abs(jnp.fft.fft(d, n=w)) ** 2
    eig = fr[:, None] + fc[None, :]
    x = y
    z = jnp.zeros_like(y)
    v1, v2, y1, y2 = z, z, z, z
    for k in range(iters):
        rk = rho[k]
        rhs = y - rk * _dive(y1 / rk + v1, y2 / rk + v2)
        x = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(rhs) / (1.0 + rk * eig)))
        dx1, dx2 = _forward_diff(x)
        u1 = dx1 + y1 / rk
        u2 = dx2 + y2 / rk
        v1 = _shrink(u1, lam[k] / rk)
        v2 = _shrink(u2, lam[k] / rk)
        y1 = y1 - rk * (v1 - dx1)
        y2 = y2 - rk * (v2 - dx2)
    return x


def global_noise_estimate(x):
    """Per-channel scalar noise level (nli_model.py:28-52); x (B, H, W, C).

    Returns (B, C). Uses the vendored kernel verbatim (incl. its -4
    center) with stride 3, padding 1.
    """
    k = jnp.array([[1.0, -2.0, 1.0], [-2.0, -4.0, -2.0], [1.0, -2.0, 1.0]],
                  x.dtype)
    h, w = x.shape[-3], x.shape[-2]
    eh = 6.0 * (h - 2.0) * (w - 2.0)
    # depthwise fixed conv: (kh, kw, 1, C) identity-per-channel
    c = x.shape[-1]
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, kern, window_strides=(3, 3), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    s = jnp.sum(jnp.abs(out), axis=(-3, -2))  # (B, C)
    return 2.0 * jnp.sqrt(jnp.pi / 2.0) / eh * s


class _GlobalFeature(nn.Module):
    """FiLM-style global feature block (ns_model.py:67-93)."""
    size: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, y2, x):
        y = jnp.mean(x, axis=(-3, -2))
        y1 = nn.leaky_relu(nn.Dense(self.size, dtype=self.dtype,
                                    name="fc1")(y), 0.2)
        y3 = nn.leaky_relu(nn.Dense(self.size, dtype=self.dtype,
                                    name="fc2")(y1), 0.2)
        y1 = y1[..., None, None, :]
        y3 = y3[..., None, None, :]
        return y2 * y1 + y3


def _sconvs(x, feats, name, dtype):
    for i, f in enumerate(feats):
        x = nn.Conv(f, (3, 3), dtype=dtype, name=f"{name}_{i}")(x)
        x = nn.leaky_relu(x, 0.2)
    return x


class _NSUNet(nn.Module):
    """Denoising UNet with add-skips (ns_model.py:96-213)."""
    dtype: Any = None

    @nn.compact
    def __call__(self, x, level):
        d = self.dtype
        pool = lambda t: nn.avg_pool(t, (2, 2), strides=(2, 2))  # noqa: E731
        up = lambda f, name: nn.ConvTranspose(  # noqa: E731
            f, (2, 2), strides=(2, 2), transpose_kernel=True, dtype=d,
            name=name)
        img = jnp.concatenate([level, x], axis=-1)
        inx = _sconvs(img, (32, 32, 32), "inc", d)
        c1 = _sconvs(pool(inx), (64, 64), "conv1", d)
        c2 = _sconvs(pool(c1), (128, 128), "conv2", d)
        c3 = _sconvs(pool(c2), (256, 256), "conv3", d)
        down4 = pool(c3)
        c4 = _sconvs(down4, (256, 256), "conv4", d)
        glo = _GlobalFeature(256, dtype=d, name="glo")(down4, c4)
        cg = _sconvs(glo, (256, 256, 256), "convglo", d)
        cg1 = _sconvs(cg, (256, 256), "convglo1", d)
        g1 = _GlobalFeature(256, dtype=d, name="glo1")(cg, cg1)
        u1 = _sconvs(c3 + up(256, "up1")(g1), (256, 256), "convup1", d)
        u2 = _sconvs(c2 + up(128, "up2")(u1), (128, 128), "convup2", d)
        u3 = _sconvs(c1 + up(64, "up3")(u2), (64, 64), "convup3", d)
        u4 = _sconvs(inx + up(32, "up4")(u3), (32, 32), "convup4", d)
        return nn.Conv(3, (1, 1), dtype=d, name="outc")(u4)


class UTVNetModule(nn.Module):
    admm_iters: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # noise level maps (nli_model.py:54-69)
        lam = global_noise_estimate(x)  # (B, 3)
        n = _IRCNN(32, 24, dtype=self.dtype, name="noiselevel")(x)
        levels = []
        for c in range(3):
            nc = n[..., 8 * c:8 * (c + 1)]
            lc = lam[..., c][..., None, None, None]
            levels.append(jnp.where(nc + lc > 0, nc + lc,
                                    jnp.broadcast_to(lc, nc.shape)))
        level = jnp.concatenate(levels, axis=-1)  # (B, H, W, 24)

        rho = _HyPaNet(self.admm_iters, 1, dtype=self.dtype, name="a_hyp")(
            jnp.full((1, 1, 1, 1), 2.0, jnp.float32)).reshape(-1)

        def smooth_one(img_hw3, lev_hw24):
            chans = []
            for c in range(3):
                lam_k = jnp.moveaxis(lev_hw24[..., 8 * c:8 * (c + 1)],
                                     -1, 0)  # (8, H, W)
                chans.append(admm_tv(img_hw3[..., c], lam_k, rho,
                                     self.admm_iters))
            return jnp.stack(chans, axis=-1)

        smooth = jax.vmap(smooth_one)(x, level)
        denoise = _NSUNet(dtype=self.dtype, name="denoise")(x - smooth,
                                                            level)
        light_n = _IRCNN(48, 3, dtype=self.dtype, name="light")(smooth)
        out = denoise + smooth * light_n
        return {"enhanced": out, "smooth": smooth, "noise_level": level}


def utvnet_loss():
    def fn(outputs, datapoint):
        target = datapoint.get("ref_image", datapoint["image"])
        return jnp.mean(jnp.abs(outputs["enhanced"] - target))
    return fn


@MODELS.register(name="utvnet", arch="utvnet", tasks=(Task.LLIE,),
                 schemes=(Scheme.SUPERVISED,))
def utvnet(**kwargs) -> Model:
    return Model(
        name="utvnet", arch="utvnet",
        module=UTVNetModule(),
        tasks=(Task.LLIE,),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=utvnet_loss(),
        required_inputs=("image",),
        size_divisor=16,
    )
