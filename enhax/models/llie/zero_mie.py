"""Zero-MIE: multimodal implicit enhancement (per-image zero-shot INR).

Rebuild of reference ``vision/enhance/llie/zero_mie/zero_mie.py`` (~5,800 LoC
with ablations): an INR predicts a 3-channel illumination residual at
``down_size`` from two branches — a context (unfolded window) encoder over
the low-res image and a coordinate encoder — optionally FiLM-conditioned on
depth (the ``_d`` color spaces, zero_mie.py:172-199); division by the
illumination, guided-filter upsample, max-normalize.

Variants registered: ``zero_mie`` (single-scale rgb) + hsv/hsv_d/rgb_d color
spaces and nonlinearity ablations; ``zero_mie_ms`` + its 8 ``_wo_*``
ablations are the separate MULTI-SCALE architecture from zero_mie_ms.py
(one value-encoder per window size, concatenated INR features, depth-gamma
illumination branch, coords-only Fourier features, no /max normalization)
— see ``ZeroMIEMSModule``.

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
from enhax.ops.filtering import bilateral_blur, fast_guided_filter_bicubic
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


class ZeroMIEMSModule(nn.Module):
    """Faithful ZeroMIE_MS MLP_{RGB,RGB_D,HSV,HSV_D} (zero_mie_ms.py:234-607).

    Structural differences from the single-scale ``ZeroMIEModule``:
      * ``window_size`` is a LIST — one context value-encoder per scale, all
        INR features concatenated before the decoder (zero_mie_ms.py:380-390).
      * mid channels are always ``hidden_channels // 2`` (the single-scale
        ``_d`` variants use //4); decoder input = mid*(num_scales+1) or
        mid*(num_scales+3) for the ``_d`` color spaces (:360-361).
      * ``_d`` concat order is [*values, depth, edge, coords] for BOTH rgb_d
        and hsv_d (:389/:579); depth/edge encoders use window_size[-1]
        (:367-368/:555-556).
      * depth-gamma illumination branch (:394-396): the enhanced image is
        computed from ``illu_lr2 = image_lr + illu_res_lr * (1 + depth_gamma
        * (1 - depth_lr/depth_lr.max()))`` while the LOSS still sees the
        unmodulated ``illu_lr``.
      * NO final ``/ max(enhanced)`` normalization (commented upstream :400).
      * optional Gaussian Fourier features on the coords encoder only
        (inr.py:856-860); B is a buffer upstream -> stop_gradient here.
      * optional kornia-style bilateral denoise of enhanced_lr (:397-398).
    """
    color_space: str = "hsv"
    window_size: tuple = (3, 5, 7)
    hidden_channels: int = 256
    down_size: int = 256
    hidden_layers: int = 2
    out_layers: int = 1
    omega_0: float = 30.0
    first_bias_scale: float | None = None
    nonlinear: str = "sine"
    use_ff: bool = False
    ff_gaussian_scale: float = 10.0
    dba_eps: float = 0.05
    depth_gamma: float = 0.7
    gf_radius: int = 3
    use_denoise: bool = False
    denoise_ksize: tuple = (3, 3)
    denoise_color: float = 0.5
    denoise_space: tuple = (1.5, 1.5)

    def _inr_stack(self, x, mid, name):
        """hidden_layers+1 INR layers (inr.py:787-791), no trailing linear."""
        cls = _LAYER_TYPES[self.nonlinear]
        for i in range(self.hidden_layers + 1):
            kw = {}
            if cls in (SineLayer, FINERLayer):
                kw = dict(is_first=(i == 0), omega_0=self.omega_0)
                if cls is FINERLayer:
                    kw["first_bias_scale"] = self.first_bias_scale
            x = cls(mid, name=f"{name}_net{i}", **kw)(x)
        return x

    def _encoder(self, x, mid, k, name):
        """ContextImplicitFeatureEncoder (inr.py:752-828) at window k:
        bicubic downsample, reflection-padded context windows on channel 0,
        INR stack. Returns (x_lr, features (n, ds, ds, mid))."""
        ds = self.down_size
        x_lr = resize_bicubic_torch(x, (ds, ds))
        w2 = k // 2
        xp = jnp.pad(x_lr[..., 0:1], ((0, 0), (w2, w2), (w2, w2), (0, 0)),
                     mode="reflect")
        ctx = jnp.stack([xp[:, dy:dy + ds, dx:dx + ds, 0]
                         for dy in range(k) for dx in range(k)], axis=-1)
        return x_lr, self._inr_stack(ctx, mid, name)

    @nn.compact
    def __call__(self, image, depth=None):
        cs = self.color_space
        ds = self.down_size
        n = image.shape[0]
        multimodal = cs.endswith("_d")
        mid = self.hidden_channels // 2  # always //2 (zero_mie_ms.py:360)
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

        # One value-encoder per scale, all on the same input (:288-291)
        base_lr = None
        value_inrs = []
        for i, k in enumerate(self.window_size):
            x_lr, inr = self._encoder(base, mid, int(k), f"value_net{i}")
            if i == 0:
                base_lr = x_lr  # image_lr = image_lrs[0] (:299/:392)
            value_inrs.append(inr)

        # Coordinates encoder, optionally Fourier-featured (inr.py:856-882)
        lin = jnp.linspace(0.0, 1.0, ds)
        cx, cy = jnp.meshgrid(lin, lin)
        coords = jnp.broadcast_to(jnp.stack([cx, cy], -1)[None],
                                  (n, ds, ds, 2))
        if self.use_ff:
            scale = self.ff_gaussian_scale
            B = self.param("B", lambda key, shape: (
                jax.random.normal(key, shape) * scale), (mid, 2))
            proj = 2.0 * jnp.pi * coords @ jax.lax.stop_gradient(B).T
            coords = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        coords_inr = self._inr_stack(coords, mid, "coords_net")

        depth_lr = resize_bicubic_torch(depth, (ds, ds))
        edge_lr = resize_bicubic_torch(edge, (ds, ds))
        if multimodal:
            k_last = int(self.window_size[-1])
            depth_lr, depth_inr = self._encoder(depth, mid, k_last,
                                                "depth_net")
            edge_lr, edge_inr = self._encoder(edge, mid, k_last, "edge_net")
            # [*values, depth, edge, coords] for BOTH _d spaces (:389/:579)
            feats = value_inrs + [depth_inr, edge_inr, coords_inr]
        else:
            feats = value_inrs + [coords_inr]

        joint = jnp.concatenate(feats, axis=-1)
        y = joint
        cls = _LAYER_TYPES[self.nonlinear]
        for i in range(self.out_layers):
            kw = (dict(is_first=False, omega_0=self.omega_0)
                  if cls in (SineLayer, FINERLayer) else {})
            y = cls(joint.shape[-1], name=f"output_net_net{i}", **kw)(y)
        y = jax.nn.sigmoid(nn.Dense(out_ch,
                                    name=f"output_net_net{self.out_layers}")(y))
        # .view(1, C, ds, ds) of a (ds, ds, C) tensor — raw reinterpretation
        illu_res_lr = jnp.moveaxis(
            y.reshape(n, -1).reshape(n, out_ch, ds, ds), 1, -1)

        illu_lr = base_lr + illu_res_lr
        # Depth-gamma modulation (:394-396): brighten far (low-depth) regions
        illu_res_lr2 = illu_res_lr * (
            1.0 + self.depth_gamma * (1.0 - depth_lr / jnp.max(depth_lr)))
        illu_lr2 = base_lr + illu_res_lr2
        enhanced_lr = base_lr / (illu_lr2 + 1e-8)
        if self.use_denoise:
            enhanced_lr = bilateral_blur(
                enhanced_lr, tuple(int(v) for v in self.denoise_ksize),
                self.denoise_color, tuple(self.denoise_space))
        enhanced_base = fast_guided_filter_bicubic(
            base_lr, enhanced_lr, base, radius=self.gf_radius)
        enhanced_base = jnp.clip(enhanced_base, 0, 1)
        if cs.startswith("hsv"):
            enhanced = hsv_to_rgb(jnp.concatenate(
                [image_hsv[..., 0:2], enhanced_base], axis=-1))
        else:
            enhanced = enhanced_base
        # NO /max normalization (zero_mie_ms.py:400, commented upstream)
        return {"enhanced": enhanced, "illu_lr": illu_lr,
                "illu_lr2": illu_lr2, "illu_res_lr": illu_res_lr,
                "illu_res_lr2": illu_res_lr2, "image_lr": base_lr,
                "enhanced_lr": enhanced_lr, "depth_lr": depth_lr,
                "edge_lr": edge_lr, "edge": edge, "depth": depth}


def zero_mie_ms_loss(exp_mean: float = 0.7, exp_weight: float = 10.0,
                     spa_weight: float = 1.0, color_weight: float = 5.0,
                     tv_weight: float = 20.0, depth_weight: float = 1.0,
                     edge_weight: float = 1.0, **_):
    """ZeroMIE_MS Loss (zero_mie_ms.py:38-102) for the rgb color spaces:
    exposure/spatial/color on the enhanced image, TV + depth-weighted
    smoothness + edge-aware terms on the unmodulated low-res illumination
    (forward_loss passes illu_lr, not illu_lr2 — :786)."""
    exp = LOSSES.build("exposure_control_loss", patch_size=16,
                       mean_val=exp_mean)
    spa = LOSSES.build("spatial_consistency_loss", num_regions=8)
    col = LOSSES.build("color_constancy_loss")
    tv = LOSSES.build("total_variation_loss")
    dws = LOSSES.build("depth_weighted_smoothness_loss")
    ea = LOSSES.build("edge_aware_loss")

    def fn(outputs, datapoint):
        enhanced = outputs["enhanced"]
        illu_lr = outputs["illu_lr"]
        return (exp_weight * exp(enhanced)
                + spa_weight * spa(enhanced, datapoint["image"])
                + color_weight * col(enhanced)
                + tv_weight * tv(illu_lr)
                + depth_weight * dws(illu_lr, outputs["depth_lr"])
                + edge_weight * ea(illu_lr, outputs["edge_lr"]))
    return fn


def zero_mie_ms_hsv_loss(exp_mean: float = 0.7, exp_weight: float = 10.0,
                         spa_weight: float = 1.0, tv_weight: float = 20.0,
                         spar_weight: float = 5.0, color_weight: float = 5.0,
                         depth_weight: float = 1.0, edge_weight: float = 1.0,
                         **_):
    """ZeroMIE_MS LossHSV (zero_mie_ms.py:105-173): exposure-value on the
    low-res illumination with E = 1 - exp_mean (:703), squared spatial
    consistency vs image_lr, TV + sparsity + color constancy, plus the live
    depth-weighted-smoothness and edge-aware terms (both exist upstream for
    the MS model, unlike single-scale zero_mie's dead depth loss)."""
    exp = LOSSES.build("exposure_value_control_loss", patch_size=16,
                       mean_val=1.0 - exp_mean)
    tv = LOSSES.build("total_variation_loss")
    col = LOSSES.build("color_constancy_loss")
    dws = LOSSES.build("depth_weighted_smoothness_loss")
    ea = LOSSES.build("edge_aware_loss")

    def fn(outputs, datapoint):
        illu_lr = outputs["illu_lr"]
        image_lr = outputs["image_lr"]
        enhanced = outputs["enhanced"]
        return (exp_weight * exp(illu_lr)
                + spa_weight * jnp.mean(jnp.abs((illu_lr - image_lr) ** 2))
                + tv_weight * tv(illu_lr)
                + spar_weight * jnp.mean(enhanced)
                + color_weight * col(enhanced)
                + depth_weight * dws(illu_lr, outputs["depth_lr"])
                + edge_weight * ea(illu_lr, outputs["edge_lr"]))
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


@MODELS.register(name="zero_mie_rgb_d", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie_rgb_d(**kwargs) -> Model:
    """Single-scale multimodal rgb_d variant (zero_mie.py:325-401)."""
    return _make("zero_mie_rgb_d", color_space="rgb_d", **kwargs)


def _make_ms(name, **kw):
    """Build the multi-scale ZeroMIE_MS (zero_mie_ms.py:623-729) — defaults
    color_space='hsv', window_size=[3,5,7], and mirrors the model-level loss
    kwargs (loss_hsv/exp_mean=0.7/exp_weight=10/..., :652-661)."""
    color_space = kw.pop("color_space", "hsv")
    loss_hsv = kw.pop("loss_hsv", True)
    loss_kw = {k: kw.pop(k) for k in ("exp_mean", "exp_weight", "spa_weight",
                                      "tv_weight", "spar_weight",
                                      "depth_weight", "edge_weight",
                                      "color_weight") if k in kw}
    module = ZeroMIEMSModule(
        color_space=color_space,
        window_size=tuple(int(w) for w in kw.pop("window_size", (3, 5, 7))),
        hidden_channels=kw.pop("hidden_channels", 256),
        down_size=kw.pop("down_size", 256),
        hidden_layers=kw.pop("hidden_layers", 2),
        out_layers=kw.pop("out_layers", 1),
        omega_0=kw.pop("omega_0", 30.0),
        first_bias_scale=kw.pop("first_bias_scale", None),
        nonlinear=kw.pop("nonlinear", "sine"),
        use_ff=kw.pop("use_ff", False),
        ff_gaussian_scale=kw.pop("ff_gaussian_scale", 10.0),
        dba_eps=kw.pop("edge_threshold", 0.05),
        depth_gamma=kw.pop("depth_gamma", 0.7),
        gf_radius=kw.pop("gf_radius", 3),
        use_denoise=kw.pop("use_denoise", False),
        denoise_ksize=tuple(kw.pop("denoise_ksize", (3, 3))),
        denoise_color=kw.pop("denoise_color", 0.5),
        denoise_space=tuple(kw.pop("denoise_space", (1.5, 1.5))),
    )
    if loss_hsv and "hsv" in color_space:
        loss_fn = zero_mie_ms_hsv_loss(**loss_kw)
    else:
        loss_fn = zero_mie_ms_loss(**loss_kw)
    return Model(
        name=name, arch="zero_mie", module=module,
        tasks=(Task.LLIE,), schemes=(Scheme.ZERO_REFERENCE, Scheme.INSTANCE,
                                     Scheme.ZERO_SHOT),
        loss_fn=loss_fn, required_inputs=("image",),
        optional_inputs=("depth",),
        # ZeroMIE_MS.infer defaults (zero_mie_ms.py:799-806): 10 epochs
        instance_steps=kw.pop("instance_steps", 10),
        instance_lr=kw.pop("instance_lr", 1e-5),
        instance_weight_decay=kw.pop("instance_weight_decay", 3e-4),
    )


@MODELS.register(name="zero_mie_ms", arch="zero_mie",
                 tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
def zero_mie_ms(**kwargs) -> Model:
    """Multi-scale ZeroMIE_MS (zero_mie_ms.py:622-729): one value-encoder
    per window size, concatenated INR features, depth-gamma illumination."""
    return _make_ms("zero_mie_ms", **kwargs)


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


# zero_mie_ms ablations (zero_mie_ms.py:614-622): eight stacked
# registrations of the SAME ZeroMIE_MS class — upstream the per-name CONFIG
# zeroes one knob (loss weight / depth_gamma / use_ff); the builders are
# identical and the ablation values live in configs/zero_mie_ms_wo_*.py,
# mirroring config/zero_mie_ms_wo_*.py.
for _aname in ("zero_mie_ms_wo_color", "zero_mie_ms_wo_depth",
               "zero_mie_ms_wo_edge", "zero_mie_ms_wo_exp",
               "zero_mie_ms_wo_ff", "zero_mie_ms_wo_spa",
               "zero_mie_ms_wo_spar", "zero_mie_ms_wo_tv"):
    def _ab_builder(nm=_aname, **kwargs):
        return _make_ms(nm, **kwargs)
    MODELS.register(name=_aname, obj=_ab_builder, arch="zero_mie",
                    tasks=(Task.LLIE,), schemes=(Scheme.ZERO_SHOT,))
