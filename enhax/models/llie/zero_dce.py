"""Zero-DCE family: zero-reference deep curve estimation for LLIE.

TPU-native rebuild of the reference's Zero-DCE models
(vision/enhance/llie/zero_dce/):
  * ``zero_dce_re``   — 7x Conv2d U-skip curve estimator, 8 per-iteration
    curves (zero_dce.py:86-191).
  * ``zero_dce++_re`` — depthwise-separable convs, one shared curve applied
    num_iters times, optional low-res estimation (zero_dcepp.py:87-208).
  * ``zero_dce_v``    — curves on the HSV value channel at a fixed down size,
    guided-filter upsample, V replacement (zero_dce_v.py:87-248).

Loss: w_spa*SPA + w_exp*EXP + w_col*COL + w_tva*TV (zero_dce.py:34-79).

TPU design notes: NHWC convs hit the MXU as implicit GEMMs; the iterative
curve application is fused by XLA into a single elementwise kernel over the
conv output (see also enhax.kernels.dce_curve for the explicit Pallas
version used by the tiled engine).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.layers import DSConv
from enhax.ops.color import hsv_to_rgb, rgb_to_hsv
from enhax.ops.filtering import fast_guided_filter_bicubic
from enhax.ops.resize import resize, resize_nearest_torch


def dce_init(key, shape, dtype=jnp.float32):
    """Conv init N(0, 0.02) (reference zero_dce.py:152-157)."""
    return 0.02 * jax.random.normal(key, shape, dtype)


def apply_curves(x, curves, num_iters: int, shared: bool):
    """Iterative quadratic curve: y <- y + r_i * (y^2 - y).

    ``curves`` is (..., H, W, C*num_iters) (per-iter) or (..., H, W, C)
    (shared, Zero-DCE++). Elementwise — XLA fuses the whole loop.
    """
    y = x
    c = x.shape[-1]
    for i in range(num_iters):
        r = curves if shared else curves[..., i * c : (i + 1) * c]
        y = y + r * (y * y - y)
    return y


class DCENet(nn.Module):
    """7-conv U-skip curve estimation network (zero_dce.py:131-141)."""
    num_channels: int = 32
    out_channels: int = 24
    conv_type: str = "conv"  # "conv" | "dsconv"
    dtype: Any = None

    def _conv(self, features, name):
        if self.conv_type == "dsconv":
            return DSConv(features=features, kernel_size=3, dtype=self.dtype,
                          name=name)
        return nn.Conv(features, (3, 3), kernel_init=dce_init,
                       dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x):
        r = nn.relu
        x1 = r(self._conv(self.num_channels, "e_conv1")(x))
        x2 = r(self._conv(self.num_channels, "e_conv2")(x1))
        x3 = r(self._conv(self.num_channels, "e_conv3")(x2))
        x4 = r(self._conv(self.num_channels, "e_conv4")(x3))
        x5 = r(self._conv(self.num_channels, "e_conv5")(jnp.concatenate([x3, x4], -1)))
        x6 = r(self._conv(self.num_channels, "e_conv6")(jnp.concatenate([x2, x5], -1)))
        return jnp.tanh(self._conv(self.out_channels, "e_conv7")(jnp.concatenate([x1, x6], -1)))


class ZeroDCE(nn.Module):
    """Full Zero-DCE forward: curves + iterative application."""
    in_channels: int = 3
    num_channels: int = 32
    num_iters: int = 8
    conv_type: str = "conv"
    shared_curve: bool = False     # True for Zero-DCE++
    scale_factor: float = 1.0      # >1: estimate curves at 1/scale res
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        from enhax.kernels import (fused_curve_apply,
                                   fused_curve_upsample_apply, pallas_enabled)
        out_ch = self.in_channels if self.shared_curve \
            else self.in_channels * self.num_iters
        sf = self.scale_factor
        x_down = x
        if sf != 1.0:
            h = int(x.shape[-3] / sf)
            w = int(x.shape[-2] / sf)
            x_down = resize(x, (h, w), method="bilinear")
        curves_lr = DCENet(self.num_channels, out_ch, self.conv_type,
                           dtype=self.dtype, name="dce")(x_down)
        curves = curves_lr
        if sf != 1.0:
            curves = resize(curves_lr, (x.shape[-3], x.shape[-2]),
                            method="bilinear")
        # platform-gated Pallas fast path (TPU): the curve loop runs
        # VMEM-resident; with a downscaled shared curve the H-axis upsample
        # happens in-tile so the full-res curve tensor never hits HBM. The
        # "adjust" output below still describes the full-res curves — XLA
        # dead-code-eliminates its resize when the caller only consumes
        # "enhanced" (inference/bench), and training losses that need it
        # keep the XLA resize alive.
        fused_up_ok = (self.shared_curve and sf == float(int(sf)) and sf > 1
                       and x.shape[-3] % int(sf) == 0
                       and x.shape[-2] % int(sf) == 0)
        if pallas_enabled() and fused_up_ok:
            y = fused_curve_upsample_apply(x, curves_lr, self.num_iters,
                                           int(sf))
        elif pallas_enabled():
            y = fused_curve_apply(x, curves, self.num_iters, self.shared_curve)
        else:
            y = apply_curves(x, curves, self.num_iters, self.shared_curve)
        return {"adjust": curves, "enhanced": y}


class ZeroDCEV(nn.Module):
    """Zero-DCE-V: curves on the HSV value channel at ``down_size``
    (zero_dce_v.py:172-205): estimate + apply at low res, guided-filter
    upsample, replace V, renormalize by max."""
    num_channels: int = 32
    num_iters: int = 15
    down_size: int = 256
    radius: int = 1
    eps: float = 1e-8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        hsv = rgb_to_hsv(x)
        v = hsv[..., 2:3]
        # zero_dce_v.py:207-209: F.interpolate default = NEAREST
        v_lr = resize_nearest_torch(v, (self.down_size, self.down_size))
        curves = DCENet(self.num_channels, self.num_iters, "conv",
                        dtype=self.dtype, name="dce")(v_lr)
        v_fixed_lr = apply_curves(v_lr, curves, self.num_iters, shared=False)
        v_fixed = jnp.clip(fast_guided_filter_bicubic(
            v_lr, v_fixed_lr, v, radius=self.radius, eps=self.eps), 0.0, 1.0)
        hsv_fixed = jnp.concatenate([hsv[..., :2], v_fixed], axis=-1)
        rgb = hsv_to_rgb(hsv_fixed)
        rgb = rgb / jnp.maximum(jnp.max(rgb), 1e-8)
        return {"adjust": curves, "enhanced": rgb,
                "image_v": v, "image_v_fixed": v_fixed}


def zero_reference_loss(
    spa_weight: float = 1.0,
    exp_patch_size: int = 16,
    exp_mean_val: float = 0.6,
    exp_weight: float = 10.0,
    col_weight: float = 5.0,
    tva_weight: float = 200.0,
    enhanced_key: str = "enhanced",
    adjust_key: str = "adjust",
):
    """The Zero-DCE 4-term loss (zero_dce.py:34-79)."""
    spa = LOSSES.build("spatial_consistency_loss")
    exp = LOSSES.build("exposure_control_loss",
                       patch_size=exp_patch_size, mean_val=exp_mean_val)
    col = LOSSES.build("color_constancy_loss")
    tva = LOSSES.build("total_variation_loss")

    def fn(outputs, datapoint):
        image = datapoint["image"]
        enhanced = outputs[enhanced_key]
        adjust = outputs[adjust_key]
        return (spa_weight * spa(enhanced, image)
                + exp_weight * exp(enhanced)
                + col_weight * col(enhanced)
                + tva_weight * tva(adjust))
    return fn


@MODELS.register(name="zero_dce_re", arch="zero_dce", aliases=["zero_dce"],
                 tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zero_dce_re(in_channels: int = 3, num_channels: int = 32, num_iters: int = 8,
                dtype=None, **kwargs) -> Model:
    return Model(
        name="zero_dce_re", arch="zero_dce",
        module=ZeroDCE(in_channels=in_channels, num_channels=num_channels,
                       num_iters=num_iters, conv_type="conv", dtype=dtype),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=zero_reference_loss(),
        required_inputs=("image",),
    )


@MODELS.register(name="zero_dce++_re", arch="zero_dce", aliases=["zero_dcepp_re", "zero_dce++", "zero_dcepp"],
                 tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def zero_dcepp_re(in_channels: int = 3, num_channels: int = 32, num_iters: int = 8,
                  scale_factor: float = 1.0, dtype=None, **kwargs) -> Model:
    return Model(
        name="zero_dce++_re", arch="zero_dce",
        module=ZeroDCE(in_channels=in_channels, num_channels=num_channels,
                       num_iters=num_iters, conv_type="dsconv",
                       shared_curve=True, scale_factor=scale_factor, dtype=dtype),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=zero_reference_loss(),
        required_inputs=("image",),
    )


@MODELS.register(name="zero_dce_v", arch="zero_dce",
                 tasks=(Task.LLIE,),
                 schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE, Scheme.INSTANCE))
def zero_dce_v(num_channels: int = 32, num_iters: int = 15, down_size: int = 256,
               **kwargs) -> Model:
    return Model(
        name="zero_dce_v", arch="zero_dce",
        module=ZeroDCEV(num_channels=num_channels, num_iters=num_iters,
                        down_size=down_size),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE, Scheme.INSTANCE),
        loss_fn=zero_reference_loss(exp_mean_val=0.8),  # zero_dce_v.py:42
        required_inputs=("image",),
        instance_steps=100, instance_lr=1e-4,
    )
