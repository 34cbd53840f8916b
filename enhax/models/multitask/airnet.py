"""AirNet: All-in-one image restoration with degradation-aware DCN.

Native rebuild of the reference's vendored AirNet
(mon_extra/vision/enhance/multitask/airnet/net/; EXTRA_MODELS "airnet"):

  * ``CBDE`` encoder (encoder.py:5-67, moco.py:109-152): at inference
    only the MoCo query encoder's first ResBlock matters — it yields
    the 64-ch full-res degradation map ``inter`` (the contrastive
    embedding is unused by the restorer at eval).
  * ``DGRN`` restorer (DGRN.py:112-152): head conv, 5 groups x 5
    degradation-guided blocks, global residuals, tail conv. Each DGB
    (DGN.py:60-85) runs two DGMs (modulated deformable conv on the
    feature map with offsets/masks predicted from cat(x, inter),
    deform_conv.py:56-65, plus an SFT FiLM layer) interleaved with
    plain convs.

The CUDA ``mmcv.ops.modulated_deform_conv2d`` is replaced by the pure
JAX gather-based DCNv2 in ``enhax/nn/deform.py``.

MoCo contrastive training (queue + momentum encoder) is replaced at
training time by a plain supervised L1 on the restored image; the
contrastive queue is a training-infrastructure detail that does not
affect the restorer's function.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.nn.layers import conv1x1
from enhax.models.base import Model
from enhax.nn.deform import modulated_deform_conv2d


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class _ResBlock(nn.Module):
    """encoder.py:5-23 (conv-BN-lrelu-conv-BN + 1x1-BN shortcut)."""
    out_feat: int
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train,  # noqa: E731
                                       dtype=d, name=name)
        y = nn.Conv(self.out_feat, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False, dtype=d,
                    name="bb0")(x)
        y = _lrelu(bn("bn0")(y))
        y = nn.Conv(self.out_feat, (3, 3), use_bias=False, dtype=d,
                    name="bb1")(y)
        y = bn("bn1")(y)
        s = nn.Conv(self.out_feat, (1, 1), strides=(self.stride,) * 2,
                    use_bias=False, dtype=d, name="sc")(x)
        s = bn("sc_bn")(s)
        return _lrelu(y + s)


class _DCN(nn.Module):
    """deform_conv.py:11-65 DCN_layer (bias=False in DGM)."""
    features: int
    kernel: int = 3
    dtype: Any = None

    @nn.compact
    def __call__(self, x, inter):
        k = self.kernel
        om = nn.Conv(3 * k * k, (k, k), dtype=self.dtype,
                     name="conv_offset_mask",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(
            jnp.concatenate([x, inter], axis=-1))
        o1, o2, m = jnp.split(om, 3, axis=-1)
        # torch cat((o1, o2)) then mmcv reads interleaved [Δy, Δx] pairs
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = nn.sigmoid(m)
        stdv = 1.0 / (x.shape[-1] * k * k) ** 0.5  # deform_conv.py:44-49
        weight = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-stdv, maxval=stdv),
            (k, k, x.shape[-1], self.features))
        return modulated_deform_conv2d(x, offset, mask, weight)


class _SFT(nn.Module):
    """DGRN.py:35-57 FiLM from the degradation map."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, inter):
        c = lambda name: conv1x1(self.features, use_bias=False,  # noqa: E731
                                 dtype=self.dtype, name=name)
        gamma = c("gamma2")(_lrelu(c("gamma1")(inter)))
        beta = c("beta2")(_lrelu(c("beta1")(inter)))
        return x * gamma + beta


class _DGM(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, inter):
        out = (_DCN(self.features, dtype=self.dtype, name="dcn")(x, inter)
               + _SFT(self.features, dtype=self.dtype, name="sft")(x, inter))
        return x + out


class _DGB(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, inter):
        d = self.dtype
        conv = lambda name: nn.Conv(self.features, (3, 3), dtype=d,  # noqa: E731
                                    name=name)
        out = _lrelu(_DGM(self.features, dtype=d, name="dgm1")(x, inter))
        out = _lrelu(conv("conv1")(out))
        out = _lrelu(_DGM(self.features, dtype=d, name="dgm2")(out, inter))
        return conv("conv2")(out) + x


class _DGG(nn.Module):
    features: int
    n_blocks: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, inter):
        res = x
        for b in range(self.n_blocks):
            res = _DGB(self.features, dtype=self.dtype,
                       name=f"b{b}")(res, inter)
        res = nn.Conv(self.features, (3, 3), dtype=self.dtype,
                      name="conv")(res)
        return res + x


class AirNetModule(nn.Module):
    n_feats: int = 64
    n_groups: int = 5
    n_blocks: int = 5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        inter = _ResBlock(self.n_feats, dtype=d, name="E_pre")(x, train)
        y = nn.Conv(self.n_feats, (3, 3), dtype=d, name="head")(x)
        res = y
        for g in range(self.n_groups):
            res = _DGG(self.n_feats, self.n_blocks, dtype=d,
                       name=f"g{g}")(res, inter)
        res = nn.Conv(self.n_feats, (3, 3), dtype=d, name="body_conv")(res)
        res = res + y
        out = nn.Conv(3, (3, 3), dtype=d, name="tail")(res)
        return {"enhanced": out, "degradation": inter}


def airnet_loss():
    def fn(outputs, datapoint):
        target = datapoint.get("ref_image", datapoint["image"])
        return jnp.mean(jnp.abs(outputs["enhanced"] - target))
    return fn


@MODELS.register(name="airnet", arch="airnet",
                 tasks=(Task.DENOISE, Task.DERAIN, Task.DEHAZE),
                 schemes=(Scheme.SUPERVISED,))
def airnet(n_feats: int = 64, n_groups: int = 5, n_blocks: int = 5,
           **kwargs) -> Model:
    return Model(
        name="airnet", arch="airnet",
        module=AirNetModule(n_feats=n_feats, n_groups=n_groups,
                            n_blocks=n_blocks),
        tasks=(Task.DENOISE, Task.DERAIN, Task.DEHAZE),
        schemes=(Scheme.SUPERVISED,),
        loss_fn=airnet_loss(),
        required_inputs=("image",),
        size_divisor=1,
    )
