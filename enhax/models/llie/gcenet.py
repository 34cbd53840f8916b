"""GCENet: guided curve estimation with depth/edge priors.

TPU-native rebuild of reference ``vision/enhance/llie/gcenet/gcenet.py``:
  * ``gcenet``          — DSConv U-skip curve net over [image, depth, edge],
    brightness-attention-weighted curve loop, guided-filter output
    (gcenet.py:339-503).
  * ``gcenet_zsn2n``    — adds the ZSN2N pair-downsample residual/consistency
    self-supervision (gcenet.py:505-536).
  * ``gcenet_instance`` — per-image test-time optimization, 300 Adam steps
    (gcenet.py:539-596) — run as a scanned inner loop by the infer engine.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.models.llie.zero_dce import zero_reference_loss
from enhax.nn.layers import DSConv, boundary_aware_prior, brightness_attention_map
from enhax.ops.color import rgb_to_grayscale
from enhax.ops.filtering import guided_filter
from enhax.ops.geometry import pair_downsample


class GCEConvBlock(nn.Module):
    """DSConv + LeakyReLU(0.2) (last layer: tanh) — reference gcenet.py:174-203."""
    features: int
    is_last: bool = False
    relu_slope: float = 0.2
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = DSConv(features=self.features, kernel_size=3, dtype=self.dtype)(x)
        if self.is_last:
            return jnp.tanh(x)
        return nn.leaky_relu(x, negative_slope=self.relu_slope)


class GCENetModule(nn.Module):
    """EnhanceNet + BAM curve loop + guided filter (gcenet.py:206-503)."""
    num_channels: int = 32
    num_iters: int = 15
    dba_eps: float = 0.05
    gf_radius: int = 3
    gf_eps: float = 1e-4
    bam_gamma: float = 2.6
    bam_ksize: int = 9
    use_depth: bool = True
    use_edge: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, image, depth=None):
        x = image
        gray = rgb_to_grayscale(image)
        if depth is not None and depth.shape[-1] == 3:
            depth = rgb_to_grayscale(depth)
        edge = None
        if self.use_depth:
            d = depth if depth is not None else gray
            x = jnp.concatenate([x, d], axis=-1)
        if self.use_edge:
            src = depth if depth is not None else gray
            edge = boundary_aware_prior(src, eps=self.dba_eps, normalized=False)
            x = jnp.concatenate([x, edge], axis=-1)

        c = self.num_channels
        x1 = GCEConvBlock(c, name="e_conv1")(x)
        x2 = GCEConvBlock(c, name="e_conv2")(x1)
        x3 = GCEConvBlock(c, name="e_conv3")(x2)
        x4 = GCEConvBlock(c, name="e_conv4")(x3)
        x5 = GCEConvBlock(c, name="e_conv5")(jnp.concatenate([x3, x4], -1))
        x6 = GCEConvBlock(c, name="e_conv6")(jnp.concatenate([x2, x5], -1))
        adjust = GCEConvBlock(3, is_last=True, name="e_conv7")(
            jnp.concatenate([x1, x6], -1))

        # curve loop with brightness attention (gcenet.py:467-486)
        y = image
        if self.bam_gamma in (None, 0.0):
            for _ in range(self.num_iters):
                y = y + adjust * (y * y - y)
            bam = None
        else:
            bam = brightness_attention_map(image, self.bam_gamma, self.bam_ksize)
            for _ in range(self.num_iters):
                bright = y * (1.0 - bam)
                dark = y * bam
                y = bright + dark + adjust * (dark * dark - dark)

        enhanced = guided_filter(y, image, radius=self.gf_radius, eps=self.gf_eps)
        return {"adjust": adjust, "enhanced": enhanced, "edge": edge, "bam": bam}


def _gce_loss():
    """GCENet Loss (gcenet.py:40-95): zero-reference quartet with
    weight_tva=1600 on the adjust map, spa num_regions=4."""
    return zero_reference_loss(spa_weight=1.0, exp_weight=10.0,
                               col_weight=5.0, tva_weight=1600.0)


def _make_gcenet(num_channels, num_iters, use_depth, use_edge, **kwargs):
    return GCENetModule(
        num_channels=num_channels, num_iters=num_iters,
        dba_eps=kwargs.get("dba_eps", 0.05),
        gf_radius=kwargs.get("gf_radius", 3), gf_eps=kwargs.get("gf_eps", 1e-4),
        bam_gamma=kwargs.get("bam_gamma", 2.6), bam_ksize=kwargs.get("bam_ksize", 9),
        use_depth=use_depth, use_edge=use_edge)


@MODELS.register(name="gcenet", arch="gcenet",
                 tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def gcenet(num_channels: int = 32, num_iters: int = 15, use_depth: bool = True,
           use_edge: bool = True, **kwargs) -> Model:
    inputs = ("image", "depth") if use_depth else ("image",)
    return Model(
        name="gcenet", arch="gcenet",
        module=_make_gcenet(num_channels, num_iters, use_depth, use_edge, **kwargs),
        tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE),
        loss_fn=_gce_loss(), required_inputs=inputs,
    )


def _zsn2n_forward_loss(model, variables, datapoint, rngs):
    """Pair-downsample residual + consistency + enhancement loss
    (reference gcenet.py:510-536)."""
    image = datapoint["image"]
    has_depth = "depth" in model.required_inputs
    depth = datapoint.get("depth") if has_depth else None

    def fwd(img, dep):
        dp = {"image": img}
        if has_depth:
            dp["depth"] = dep
        return model.apply(variables, dp, training=True, rngs=rngs)

    image1, image2 = pair_downsample(image)
    depth1 = depth2 = None
    if depth is not None:
        depth1, depth2 = pair_downsample(depth)
    out1 = fwd(image1, depth1)
    out2 = fwd(image2, depth2)
    outputs = fwd(image, depth)
    e1, e2 = out1["enhanced"], out2["enhanced"]
    e_1, e_2 = pair_downsample(outputs["enhanced"])
    mse = lambda a, b: jnp.mean((a - b) ** 2)
    loss_res = 0.5 * (mse(image1, e2) + mse(image2, e1))
    loss_con = 0.5 * (mse(e_1, e1) + mse(e_2, e2))
    loss_enh = _gce_loss()(outputs, datapoint)
    return 0.5 * (loss_res + loss_con) + 0.5 * loss_enh, outputs


@MODELS.register(name="gcenet_zsn2n", arch="gcenet",
                 tasks=(Task.LLIE,), schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE))
def gcenet_zsn2n(num_channels: int = 32, num_iters: int = 15, use_depth: bool = True,
                 use_edge: bool = True, **kwargs) -> Model:
    m = gcenet(num_channels=num_channels, num_iters=num_iters,
               use_depth=use_depth, use_edge=use_edge, **kwargs)
    m.name = "gcenet_zsn2n"
    m.forward_loss_fn = _zsn2n_forward_loss
    return m


@MODELS.register(name="gcenet_instance", arch="gcenet",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE))
def gcenet_instance(num_channels: int = 32, num_iters: int = 15, use_depth: bool = True,
                    use_edge: bool = True, **kwargs) -> Model:
    m = gcenet(num_channels=num_channels, num_iters=num_iters,
               use_depth=use_depth, use_edge=use_edge, **kwargs)
    m.name = "gcenet_instance"
    m.schemes = (Scheme.ZERO_REFERENCE, Scheme.INSTANCE)
    m.instance_steps = 300
    m.instance_lr = 5e-5
    m.instance_weight_decay = 1e-5
    return m
