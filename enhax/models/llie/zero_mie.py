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
from enhax.nn.inr import _LAYER_TYPES, FINERLayer, SineLayer
from enhax.nn.layers import boundary_aware_prior
from enhax.ops.color import hsv_to_rgb, rgb_to_grayscale, rgb_to_hsv
from enhax.ops.filtering import fast_guided_filter_bicubic
from enhax.ops.resize import resize_bicubic_torch


class FiLM(nn.Module):
    """Feature-wise linear modulation by depth (zero_mie.py:172-199)."""
    features: int

    @nn.compact
    def __call__(self, x, cond):
        # reference zero_mie.py:195: x * scale + shift (no identity offset)
        scale = nn.Dense(self.features, name="fc_scale")(cond)
        shift = nn.Dense(self.features, name="fc_shift")(cond)
        return x * scale + shift


class CrossAttentionLayer(nn.Module):
    """zero_mie.py:201-214: MultiheadAttention(query=value, key=edge,
    value=depth). Defined by the reference but commented out at its use
    sites (:533-534); exposed behind ``use_cross_attn`` for the ablation."""
    dim: int
    num_heads: int = 4

    @nn.compact
    def __call__(self, query, key, value):
        return nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            out_features=self.dim, name="attn")(query, key, value)


class ZeroMIEModule(nn.Module):
    """Faithful MLP_{RGB,RGB_D,HSV,HSV_D} switch (zero_mie.py:257-556).

    ``color_space``:
      rgb    — context INR over channel 0 of the low-res RGB; 3-ch residual.
      rgb_d  — separate value/depth/edge context encoders (mid = hidden/4),
               concat order [value, depth, edge, coords] (:299-301).
      hsv    — INR on the HSV value channel; 1-ch residual replaces V
               (:444-461), then HSV->RGB.
      hsv_d  — hsv + depth/edge encoders, concat order
               [value, edge, depth, coords] (:535).
    """
    color_space: str = "rgb"
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
    use_film: bool = False        # FiLM(value, depth) — ref :532 (commented)
    use_cross_attn: bool = False  # CrossAttention — ref :533-534 (commented)

    def _inr_stack(self, x, mid, n_layers, name):
        """ContextImplicitFeatureEncoder/CoordinatesEncoder net
        (inr.py:752-885): first sine layer + ``hidden_layers`` more sine
        layers (NO trailing linear)."""
        cls = _LAYER_TYPES[self.nonlinear]
        for i in range(n_layers + 1):
            kw = {}
            if cls in (SineLayer, FINERLayer):
                kw = dict(is_first=(i == 0), omega_0=self.omega_0)
                if cls is FINERLayer:
                    kw["first_bias_scale"] = self.first_bias_scale
            x = cls(mid, name=f"{name}_net{i}", **kw)(x)
        return x

    def _encoder(self, x, n, name):
        """ContextImplicitFeatureEncoder (inr.py:752-828): bicubic
        downsample, reflection-padded context windows on channel 0,
        sine INR. Returns (x_lr, features (n, ds, ds, mid))."""
        ds = self.down_size
        mid = self.hidden_channels // (4 if self.color_space.endswith("_d") else 2)
        x_lr = resize_bicubic_torch(x, (ds, ds))
        w2 = self.window_size // 2
        k = self.window_size
        xp = jnp.pad(x_lr[..., 0:1], ((0, 0), (w2, w2), (w2, w2), (0, 0)),
                     mode="reflect")
        ctx = jnp.stack([xp[:, dy:dy + ds, dx:dx + ds, 0]
                         for dy in range(k) for dx in range(k)], axis=-1)
        return x_lr, self._inr_stack(ctx, mid, self.hidden_layers, name)

    @nn.compact
    def __call__(self, image, depth=None):
        cs = self.color_space
        ds = self.down_size
        n = image.shape[0]
        multimodal = cs.endswith("_d")
        mid = self.hidden_channels // (4 if multimodal else 2)
        if depth is None:
            depth = rgb_to_grayscale(image)
        edge = boundary_aware_prior(depth, eps=self.dba_eps, normalized=False)

        if cs.startswith("hsv"):
            image_hsv = rgb_to_hsv(image)
            base = image_hsv[..., 2:3]  # V = max(R,G,B)
            out_ch = 1
        else:
            base = image
            out_ch = 3

        base_lr, value_inr = self._encoder(base, n, "value_net")
        depth_lr = resize_bicubic_torch(depth, (ds, ds))
        edge_lr = resize_bicubic_torch(edge, (ds, ds))

        # get_coords (inr.py:43-53): [0,1]^2, channel 0 varies along W
        lin = jnp.linspace(0.0, 1.0, ds)
        cx, cy = jnp.meshgrid(lin, lin)
        coords = jnp.broadcast_to(jnp.stack([cx, cy], -1)[None],
                                  (n, ds, ds, 2))
        coords_inr = self._inr_stack(coords, mid, self.hidden_layers,
                                     "coords_net")

        if multimodal:
            _, depth_inr = self._encoder(depth, n, "depth_net")
            _, edge_inr = self._encoder(edge, n, "edge_net")
            if self.use_film:
                value_inr = FiLM(mid, name="film")(value_inr,
                                                   depth_lr)
            if self.use_cross_attn:
                value_inr = CrossAttentionLayer(mid, name="cross_attn")(
                    value_inr, edge_inr, depth_inr)
            if cs == "hsv_d":   # :535 order
                feats = [value_inr, edge_inr, depth_inr, coords_inr]
            else:               # rgb_d, :380 order
                feats = [value_inr, depth_inr, edge_inr, coords_inr]
        else:
            feats = [value_inr, coords_inr]

        joint = jnp.concatenate(feats, axis=-1)
        # ContextImplicitDecoder (inr.py:886-925): out_layers sine layers
        # (in->in) + a sigmoid-linear head (INRLayer is_last)
        y = joint
        cls = _LAYER_TYPES[self.nonlinear]
        for i in range(self.out_layers):
            kw = (dict(is_first=False, omega_0=self.omega_0)
                  if cls in (SineLayer, FINERLayer) else {})
            y = cls(joint.shape[-1], name=f"output_net_net{i}", **kw)(y)
        y = jax.nn.sigmoid(nn.Dense(out_ch,
                                    name=f"output_net_net{self.out_layers}")(y))
        # zero_mie.py:305/389/462/544: .view(1, C, ds, ds) of a (ds,ds,C)
        # tensor — a raw reinterpretation, NOT a transpose; replicated
        illu_res_lr = jnp.moveaxis(
            y.reshape(n, -1).reshape(n, out_ch, ds, ds), 1, -1)

        illu_lr = illu_res_lr + base_lr
        enhanced_lr = base_lr / (illu_lr + 1e-8)
        enhanced_base = fast_guided_filter_bicubic(
            base_lr, enhanced_lr, base, radius=self.gf_radius)
        enhanced_base = jnp.clip(enhanced_base, 0, 1)
        if cs.startswith("hsv"):
            # replace_v_component (:240-244) + hsv_to_rgb
            enhanced = hsv_to_rgb(jnp.concatenate(
                [image_hsv[..., 0:2], enhanced_base], axis=-1))
        else:
            enhanced = enhanced_base
        enhanced = enhanced / jnp.max(enhanced)
        return {"enhanced": enhanced, "illu_lr": illu_lr,
                "image_lr": base_lr, "enhanced_lr": enhanced_lr,
                "depth_lr": depth_lr, "edge_lr": edge_lr, "edge": edge}


def zero_mie_loss(exp_mean: float = 0.6, exp_weight: float = 10.0,
                  spa_weight: float = 1.0, color_weight: float = 5.0,
                  tv_weight: float = 1600.0, depth_weight: float = 1.0,
                  edge_weight: float = 1.0):
    """Reference Loss (zero_mie.py:39-99) on the FULL-RES image/enhanced
    pair (spa with 8 regions). NOTE: upstream's depth term calls
    ``nn.MultiscaleDepthConsistencyLoss`` which does not exist in mon.nn
    (AttributeError with the real runtime) — the depth term is therefore
    dead upstream and omitted; the edge-aware term is real."""
    exp = LOSSES.build("exposure_control_loss", patch_size=16, mean_val=exp_mean)
    spa = LOSSES.build("spatial_consistency_loss", num_regions=8)
    col = LOSSES.build("color_constancy_loss")
    tv = LOSSES.build("total_variation_loss")
    edc = LOSSES.build("edge_aware_depth_consistency_loss")

    def fn(outputs, datapoint):
        image = datapoint["image"]
        enhanced = outputs["enhanced"]
        loss = (exp_weight * exp(enhanced)
                + spa_weight * spa(enhanced, image)
                + color_weight * col(enhanced)
                + tv_weight * tv(outputs["illu_lr"])
                + edge_weight * edc(outputs["enhanced_lr"],
                                    outputs["depth_lr"]))
        return loss
    return fn


def zero_mie_hsv_loss(exp_mean: float = 0.6, exp_weight: float = 8.0,
                      spa_weight: float = 1.0, tv_weight: float = 20.0,
                      spar_weight: float = 5.0, color_weight: float = 5.0,
                      depth_weight: float = 1.0, edge_weight: float = 1.0):
    """Reference LossHSV (zero_mie.py:101-170): exposure-value on the
    low-res illumination (E = 1 - exp_mean, :646), squared spatial
    consistency, TV on illumination, sparsity = mean(enhanced), color
    constancy, edge-aware term on (enhanced_lr, depth_lr). The upstream
    depth term (MultiscaleDepthConsistencyLoss) is absent from mon.nn
    and omitted."""
    exp = LOSSES.build("exposure_value_control_loss", patch_size=16,
                       mean_val=1.0 - exp_mean)
    tv = LOSSES.build("total_variation_loss")
    col = LOSSES.build("color_constancy_loss")
    edc = LOSSES.build("edge_aware_depth_consistency_loss")

    def fn(outputs, datapoint):
        illu_lr = outputs["illu_lr"]
        image_lr = outputs["image_lr"]
        enhanced = outputs["enhanced"]
        loss = (exp_weight * exp(illu_lr)
                + spa_weight * jnp.mean(jnp.abs((illu_lr - image_lr) ** 2))
                + tv_weight * tv(illu_lr)
                + spar_weight * jnp.mean(enhanced)
                + color_weight * col(enhanced)
                + edge_weight * edc(outputs["enhanced_lr"],
                                    outputs["depth_lr"]))
        return loss
    return fn


def _make(name, nonlinear="sine", color_space="rgb", **kw):
    hsv = color_space.startswith("hsv")
    return Model(
        name=name, arch="zero_mie",
        module=ZeroMIEModule(color_space=color_space, nonlinear=nonlinear,
                             window_size=kw.get("window_size", 7),
                             down_size=kw.get("down_size", 256),
                             hidden_channels=kw.get("hidden_channels", 256),
                             use_film=kw.get("use_film", False),
                             use_cross_attn=kw.get("use_cross_attn", False)),
        tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE,
                                     Scheme.ZERO_SHOT),
        loss_fn=zero_mie_hsv_loss() if hsv else zero_mie_loss(),
        required_inputs=("image",),
        instance_steps=kw.get("instance_steps", 300),
        instance_lr=kw.get("instance_lr", 1e-5),
    )


@MODELS.register(name="zero_mie", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie(**kwargs) -> Model:
    return _make("zero_mie", color_space="rgb", **kwargs)


@MODELS.register(name="zero_mie_ms", arch="zero_mie", aliases=["zero_mie_rgb_d"],
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie_ms(**kwargs) -> Model:
    """Multimodal rgb_d variant (value/depth/edge encoders, :325-401)."""
    return _make("zero_mie_ms", color_space="rgb_d", **kwargs)


@MODELS.register(name="zero_mie_hsv", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie_hsv(**kwargs) -> Model:
    """HSV value-channel variant with LossHSV (:399-474, :646)."""
    return _make("zero_mie_hsv", color_space="hsv", **kwargs)


@MODELS.register(name="zero_mie_hsv_d", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie_hsv_d(**kwargs) -> Model:
    """Multimodal HSV variant (:477-556)."""
    return _make("zero_mie_hsv_d", color_space="hsv_d", **kwargs)


for _nl in ("finer", "gauss", "relu"):
    def _builder(nl=_nl, **kwargs):
        return _make(f"zero_mie_{nl}", nonlinear=nl, **kwargs)
    MODELS.register(name=f"zero_mie_{_nl}", obj=_builder, arch="zero_mie",
                    tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))


# zero_mie_ms loss ablations (zero_mie_ms.py:614-622): eight stacked
# registrations of the same class — the config per NAME zeroes one loss
# term (use_ff already defaults off upstream, so wo_ff == the base ms)
_MS_ABLATIONS = {
    "zero_mie_ms_wo_color": {"color_weight": 0.0},
    "zero_mie_ms_wo_depth": {"depth_weight": 0.0},
    "zero_mie_ms_wo_edge": {"edge_weight": 0.0},
    "zero_mie_ms_wo_exp": {"exp_weight": 0.0},
    "zero_mie_ms_wo_ff": {},
    "zero_mie_ms_wo_spa": {"spa_weight": 0.0},
    "zero_mie_ms_wo_spar": {"spar_weight": 0.0},
    "zero_mie_ms_wo_tv": {"tv_weight": 0.0},
}

for _aname, _loss_kw in _MS_ABLATIONS.items():
    def _ab_builder(nm=_aname, lkw=_loss_kw, **kwargs):
        m = _make(nm, color_space="hsv_d", **kwargs)
        keep = {k: v for k, v in lkw.items()
                if k in ("exp_weight", "spa_weight", "tv_weight",
                         "spar_weight", "color_weight", "depth_weight",
                         "edge_weight")}
        m.loss_fn = zero_mie_hsv_loss(**keep)
        return m
    MODELS.register(name=_aname, obj=_ab_builder, arch="zero_mie",
                    tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
