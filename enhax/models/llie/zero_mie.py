"""Zero-MIE: multimodal implicit enhancement (per-image zero-shot INR).

Rebuild of reference ``vision/enhance/llie/zero_mie/zero_mie.py`` (~5,800 LoC
with ablations): an INR predicts a 3-channel illumination residual at
``down_size`` from two branches — a context (unfolded window) encoder over
the low-res image and a coordinate encoder — optionally FiLM-conditioned on
depth (the ``_d`` color spaces, zero_mie.py:172-199); division by the
illumination, guided-filter upsample, max-normalize.

Variants registered: ``zero_mie`` (rgb), ``zero_mie_ms`` (rgb + depth FiLM)
plus nonlinearity ablations (finer/gauss/relu/sine) mirroring
zero_mie_ms.py:614-622.

Loss (zero_mie.py:39-170): exposure + spatial consistency + color constancy
+ TV on the illumination + depth-weighted smoothness + edge-aware terms.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.inr import INRNet, context_window_features, coordinate_grid
from enhax.nn.layers import boundary_aware_prior
from enhax.ops.color import rgb_to_grayscale
from enhax.ops.filtering import fast_guided_filter
from enhax.ops.resize import resize


class FiLM(nn.Module):
    """Feature-wise linear modulation by depth (zero_mie.py:172-199)."""
    features: int

    @nn.compact
    def __call__(self, x, cond):
        gamma = nn.Dense(self.features, name="gamma")(cond)
        beta = nn.Dense(self.features, name="beta")(cond)
        return x * (1.0 + gamma) + beta


class ZeroMIEModule(nn.Module):
    window_size: int = 7
    hidden_channels: int = 256
    down_size: int = 256
    hidden_layers: int = 2
    out_layers: int = 1
    omega_0: float = 30.0
    first_bias_scale: float | None = 20.0
    nonlinear: str = "sine"
    dba_eps: float = 0.05
    gf_radius: int = 3
    use_depth: bool = False

    @nn.compact
    def __call__(self, image, depth=None):
        ds = self.down_size
        mid = self.hidden_channels // 2
        if depth is None:
            depth = rgb_to_grayscale(image)
        edge = boundary_aware_prior(depth, eps=self.dba_eps, normalized=False)

        image_lr = resize(image, (ds, ds), method="bicubic")
        depth_lr = resize(depth, (ds, ds), method="bicubic")
        n = image.shape[0]

        # context branch over the gray low-res image
        gray_lr = rgb_to_grayscale(image_lr)
        ctx = context_window_features(gray_lr, window=self.window_size // 2)
        ctx = ctx.reshape(n, ds * ds, -1)
        value_inr = INRNet(hidden_features=mid, hidden_layers=self.hidden_layers,
                           out_features=mid, layer_type=self.nonlinear,
                           omega_0=self.omega_0,
                           first_bias_scale=self.first_bias_scale,
                           name="value_net")(ctx)

        coords = jnp.broadcast_to(coordinate_grid(ds, ds)[None], (n, ds * ds, 2))
        coords_inr = INRNet(hidden_features=mid, hidden_layers=self.hidden_layers,
                            out_features=mid, layer_type=self.nonlinear,
                            omega_0=self.omega_0,
                            first_bias_scale=self.first_bias_scale,
                            name="coords_net")(coords)

        joint = jnp.concatenate([value_inr, coords_inr], axis=-1)
        if self.use_depth:
            dflat = depth_lr.reshape(n, ds * ds, 1)
            joint = FiLM(joint.shape[-1], name="film")(joint, dflat)

        illu_res = INRNet(hidden_features=self.hidden_channels,
                          hidden_layers=self.out_layers - 1, out_features=3,
                          layer_type=self.nonlinear, omega_0=self.omega_0,
                          name="output_net")(joint)
        illu_res_lr = illu_res.reshape(n, ds, ds, 3)

        illu_lr = illu_res_lr + image_lr
        enhanced_lr = image_lr / (illu_lr + 1e-8)
        enhanced = fast_guided_filter(enhanced_lr, image_lr, image,
                                      radius=self.gf_radius)
        enhanced = jnp.clip(enhanced, 0, 1)
        enhanced = enhanced / jnp.maximum(jnp.max(enhanced), 1e-8)
        return {"enhanced": enhanced, "illu_lr": illu_lr,
                "image_lr": image_lr, "enhanced_lr": enhanced_lr,
                "depth_lr": depth_lr, "edge": edge}


def zero_mie_loss(exp_mean: float = 0.6, exp_weight: float = 10.0,
                  spa_weight: float = 1.0, color_weight: float = 5.0,
                  tv_weight: float = 1600.0, depth_weight: float = 1.0):
    exp = LOSSES.build("exposure_control_loss", patch_size=16, mean_val=exp_mean)
    spa = LOSSES.build("spatial_consistency_loss")
    col = LOSSES.build("color_constancy_loss")
    tv = LOSSES.build("total_variation_loss")
    dws = LOSSES.build("depth_weighted_smoothness_loss")

    def fn(outputs, datapoint):
        enhanced_lr = outputs["enhanced_lr"]
        image_lr = outputs["image_lr"]
        illu_lr = outputs["illu_lr"]
        loss = (exp_weight * exp(enhanced_lr)
                + spa_weight * spa(enhanced_lr, image_lr)
                + color_weight * col(enhanced_lr)
                + tv_weight * tv(illu_lr))
        if "depth_lr" in outputs and outputs["depth_lr"] is not None:
            loss = loss + depth_weight * dws(illu_lr, outputs["depth_lr"])
        return loss
    return fn


def _make(name, nonlinear="sine", use_depth=False, **kw):
    inputs = ("image", "depth") if use_depth and kw.get("require_depth") else ("image",)
    return Model(
        name=name, arch="zero_mie",
        module=ZeroMIEModule(nonlinear=nonlinear, use_depth=use_depth,
                             window_size=kw.get("window_size", 7),
                             down_size=kw.get("down_size", 256),
                             hidden_channels=kw.get("hidden_channels", 256)),
        tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE,
                                     Scheme.ZERO_SHOT),
        loss_fn=zero_mie_loss(),
        required_inputs=inputs,
        instance_steps=kw.get("instance_steps", 300),
        instance_lr=kw.get("instance_lr", 1e-5),
    )


@MODELS.register(name="zero_mie", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie(**kwargs) -> Model:
    return _make("zero_mie", **kwargs)


@MODELS.register(name="zero_mie_ms", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie_ms(**kwargs) -> Model:
    return _make("zero_mie_ms", use_depth=True, **kwargs)


for _nl in ("finer", "gauss", "relu"):
    def _builder(nl=_nl, **kwargs):
        return _make(f"zero_mie_{nl}", nonlinear=nl, **kwargs)
    MODELS.register(name=f"zero_mie_{_nl}", obj=_builder, arch="zero_mie",
                    tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
