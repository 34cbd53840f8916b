"""Zero-Restore: zero-shot restoration via Koschmieder-model perturbation.

Faithful rebuild of reference ``vision/enhance/multitask/zero_restore/``
(zero_restore_llie.py / zero_restore_dehaze.py / zero_restore_uie.py):

  * shared: reflect-padded GN(8)+ReLU convs; an InConv that runs ONE
    shared 7x7/stride-4 conv per RGB channel and reduces across channels
    (max for LLIE :128-138, min = dark channel for dehaze/uie :86-96);
    a 3-branch selective-kernel trunk (SKConv, scales 1 / 1/2 / 1/4 with
    align_corners=True resizes, shared InConv, softmax channel
    attention); enhanced = (I - (1 - t) * A) / t.
  * LLIE (:196-224): spatial atmospheric map — conv_a1 (3x3 InDoubleConv)
    * up4(x_min) -> DoubleConv -> 1ch conv -> sigmoid; 1ch transmission.
  * dehaze / uie: downsampling conv_a1 (9x9/s4 + 3x3, dehaze :159-181) *
    x_min -> maxpool(15,7) -> DoubleConv -> global avg pool -> 3-way
    dense (no bias) -> sigmoid: a per-image RGB atmospheric VECTOR; the
    uie transmission has 3 channels (watermodel, uie :162-181).
  * losses (llie :275-305, dehaze/uie :251-262): perturbation
    consistency (p=0.9) on t and A, out-of-range penalties (LLIE weights
    blue x10; dehaze/uie unweighted + 1000x color constancy), 0.001 TV.

Per-image fit: 1000 epochs Adam 1e-3 wd 1e-2 (10000 for dehaze/uie).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.ops.resize import resize_align_corners


class GNConv(nn.Module):
    """conv(reflect, no bias) + GroupNorm(8) + ReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        x = jnp.pad(x, [(0, 0), (pad, pad), (pad, pad), (0, 0)], mode="reflect")
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=8, epsilon=1e-5, name="gn")(x)
        return nn.relu(x)


class DoubleConv(nn.Module):
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = GNConv(self.features, name="c1")(x)
        return GNConv(self.features, name="c2")(x)


class InDoubleConvDown(nn.Module):
    """dehaze/uie InDoubleConv (dehaze :59-66): 9x9/s4 + 3x3 GN convs."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = GNConv(self.features, kernel=9, stride=4, name="c1")(x)
        return GNConv(self.features, name="c2")(x)


class InConv(nn.Module):
    """Shared per-channel stride-4 conv, channel reduce (llie :113-138:
    max; dehaze/uie :86-96: min)."""
    features: int = 64
    reduce: str = "max"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        conv = GNConv(self.features, kernel=7, stride=4, name="conv")
        feats = jnp.stack([conv(x[..., i: i + 1]) for i in range(3)], axis=1)
        red = jnp.max if self.reduce == "max" else jnp.min
        y = red(feats, axis=1)
        return GNConv(self.features, name="convf")(y)


class SKConv(nn.Module):
    """Selective-kernel multi-scale fusion (llie :141-193); scale resizes
    are bilinear align_corners=True."""
    features: int = 64
    M: int = 3
    L: int = 32
    reduce: str = "max"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_conv = InConv(self.features, reduce=self.reduce, name="in_conv")
        h, w = x.shape[-3] // 4, x.shape[-2] // 4
        feas = []
        for i in range(self.M):
            if i == 0:
                f = in_conv(x)
            else:
                xd = resize_align_corners(
                    x, (x.shape[-3] // 2**i, x.shape[-2] // 2**i))
                f = resize_align_corners(in_conv(xd), (h, w))
            feas.append(f)
        feas = jnp.stack(feas, axis=1)                       # (N, M, h, w, C)
        fea_u = jnp.sum(feas, axis=1)
        fea_s = jnp.mean(fea_u, axis=(-3, -2))               # (N, C)
        fea_z = nn.Dense(self.L, name="fc")(fea_s)
        vecs = jnp.stack([nn.Dense(self.features, name=f"fcs{i}")(fea_z)
                          for i in range(self.M)], axis=1)   # (N, M, C)
        attn = jax.nn.softmax(vecs, axis=1)[:, :, None, None, :]
        return jnp.sum(feas * attn, axis=1)


class Estimation(nn.Module):
    """LLIE transmission + spatial atmospheric map (llie :196-224)."""
    num_channels: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x_min = SKConv(self.num_channels, name="in_conv")(x)
        up = lambda v: resize_align_corners(v, (x.shape[-3], x.shape[-2]))  # noqa: E731
        t = DoubleConv(self.num_channels, name="conv_t1")(x_min)
        t = _reflect_conv(self.num_channels, 1, "conv_t2")(up(t))
        trans = jax.nn.sigmoid(t) + 1e-12
        a = GNConv(self.num_channels, name="conv_a1")(x)
        a = a * up(x_min)
        a = DoubleConv(self.num_channels, name="conv_a2")(a)
        a = _reflect_conv(self.num_channels, 1, "conv_a3")(a)
        atm = jax.nn.sigmoid(a)
        return trans, atm


class _ReflectConv(nn.Module):
    """Plain 3x3 reflect-padded conv, no bias (reference conv_t2/conv_a3)."""
    features: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)], mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID",
                       use_bias=False, name="conv")(x)


def _reflect_conv(cin, cout, name):
    del cin
    return _ReflectConv(cout, name=name)


class EstimationGlobal(nn.Module):
    """dehaze/uie estimation: global RGB atmospheric vector (dehaze
    :159-181). ``trans_channels`` = 1 (dehaze) or 3 (uie watermodel)."""
    num_channels: int = 64
    trans_channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x_min = SKConv(self.num_channels, reduce="min", name="in_conv")(x)
        up = lambda v: resize_align_corners(v, (x.shape[-3], x.shape[-2]))  # noqa: E731
        t = DoubleConv(self.num_channels, name="conv_t1")(x_min)
        t = _reflect_conv(self.num_channels, self.trans_channels,
                          "conv_t2")(up(t))
        trans = jax.nn.sigmoid(t) + 1e-12
        a = InDoubleConvDown(self.num_channels, name="conv_a1")(x)
        a = a * x_min
        a = nn.max_pool(a, (15, 15), strides=(7, 7))
        a = DoubleConv(self.num_channels, name="conv_a2")(a)
        a = jnp.mean(a, axis=(-3, -2))                       # (N, C)
        atm = jax.nn.sigmoid(nn.Dense(3, use_bias=False, name="dense")(a))
        return trans, atm[:, None, None, :]                  # (N,1,1,3)


class ZeroRestoreModule(nn.Module):
    num_channels: int = 64
    variant: str = "llie"  # llie | dehaze | uie
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.variant == "llie":
            trans, atm = Estimation(self.num_channels, name="estimation")(x)
        else:
            trans, atm = EstimationGlobal(
                self.num_channels,
                trans_channels=3 if self.variant == "uie" else 1,
                name="estimation")(x)
        enhanced = (x - (1.0 - trans) * atm) / trans
        return {"trans": trans * jnp.ones_like(x),
                "atm": atm * jnp.ones_like(x), "enhanced": enhanced}


def _zero_restore_forward_loss(weighted: bool):
    """llie :275-305 (weighted=True: blue-channel x10 range penalties) vs
    dehaze/uie :251-262 (unweighted + 1000x color constancy)."""

    def fwd_loss(model, variables, datapoint, rngs):
        image = datapoint["image"]
        out = model.apply(variables, {"image": image}, rngs=rngs)
        p_x = 0.9
        image_x = image * p_x + (1 - p_x) * out["atm"]
        out_x = model.apply(variables, {"image": image_x}, rngs=rngs)
        e, e_x = out["enhanced"], out_x["enhanced"]
        loss_t = jnp.sum((out_x["trans"] - p_x * out["trans"]) ** 2)
        loss_a = jnp.sum((out["atm"] - out_x["atm"]) ** 2)

        def over(v, c):
            return jnp.sum(jnp.maximum(v[..., c], 1.0) - 1.0)

        def under(v, c):
            return -jnp.sum(jnp.minimum(v[..., c], 0.0))

        tv = LOSSES.build("total_variation_loss")
        if weighted:
            loss_mx = (over(e, 0) + over(e_x, 0)) + (over(e, 1) + over(e_x, 1)) \
                + 10 * (over(e, 2) + over(e_x, 2))
            loss_mn = (under(e, 0) + under(e_x, 0)) + (under(e, 1) + under(e_x, 1)) \
                + 10 * (under(e, 2) + under(e_x, 2))
            # llie :294-302: the (b,1,h,w) channel slices broadcast against
            # FULL-shape ones/zeros, tripling every mx/mn sum — kept as-is
            loss = loss_t + loss_a + 0.003 * loss_mx + 0.03 * loss_mn \
                + 0.001 * tv(e)
        else:
            col = LOSSES.build("color_constancy_loss")
            loss_mx = sum(over(e, c) + over(e_x, c) for c in range(3))
            loss_mn = sum(under(e, c) + under(e_x, c) for c in range(3))
            loss = loss_t + loss_a + 0.001 * loss_mx + 0.001 * loss_mn \
                + 0.001 * tv(e) + 1000.0 * col(e)
        return loss, out
    return fwd_loss


def _make(name, task, variant, steps):
    return Model(
        name=name, arch="zero_restore",
        module=ZeroRestoreModule(variant=variant),
        tasks=(task,), schemes=(Scheme.ZERO_REFERENCE, Scheme.ZERO_SHOT),
        forward_loss_fn=_zero_restore_forward_loss(variant == "llie"),
        required_inputs=("image",),
        instance_steps=steps, instance_lr=1e-3,
        size_divisor=32,
    )


@MODELS.register(name="zero_restore_llie", arch="zero_restore",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_restore_llie(**kwargs) -> Model:
    return _make("zero_restore_llie", Task.LLIE, "llie", 1000)


@MODELS.register(name="zero_restore_dehaze", arch="zero_restore",
                 tasks=(Task.DEHAZE,), schemes=(Scheme.ZERO_SHOT,))
def zero_restore_dehaze(**kwargs) -> Model:
    return _make("zero_restore_dehaze", Task.DEHAZE, "dehaze", 10000)


@MODELS.register(name="zero_restore_uie", arch="zero_restore",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_restore_uie(**kwargs) -> Model:
    return _make("zero_restore_uie", Task.LLIE, "uie", 10000)
