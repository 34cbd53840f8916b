"""CoLIE: context-based low-light enhancement via neural implicit
representations (per-image zero-shot).

Rebuild of reference ``vision/enhance/llie/colie/colie.py:30-280`` (+
``colie_hvi.py:39,282``): two SIREN branches — a patch (context window)
branch over unfolded V-channel neighborhoods and a spatial branch over
(y, x) coords — concatenated into an output SIREN head that predicts an
illumination *residual* at ``down_size``; V / illumination division, guided
upsample, V replacement.

Loss (colie.py:39-77): alpha*|illu - v|^2 + beta*TV(illu) +
gamma*ExposureValue(illu, L) + delta*mean(v_fixed).

TPU design: the whole 100-step per-image fit is one jitted lax.scan (see
infer engine); the SIREN MLP over 256^2 pixels is a dense (65536, C) matmul
chain — pure MXU work.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from enhax.constants import LOSSES, MODELS, Scheme, Task
from enhax.models.base import Model
from enhax.nn.inr import SineLayer
from enhax.nn.layers import boundary_aware_prior
from enhax.ops.color import hsv_to_rgb, hvi_to_rgb, rgb_to_hsv, rgb_to_hvi
from enhax.ops.filtering import fast_guided_filter_bicubic
from enhax.ops.resize import resize_bicubic_torch, resize_nearest_torch


class SirenStack(nn.Module):
    dims: tuple
    is_first: bool = True
    omega_0: float = 30.0
    final_linear: bool = False

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            last = i == len(self.dims) - 1
            if last and self.final_linear:
                from enhax.nn.inr import siren_init
                x = nn.Dense(d, kernel_init=siren_init(False, self.omega_0),
                             name=f"lin{i}")(x)
            else:
                x = SineLayer(d, is_first=(i == 0 and self.is_first),
                              omega_0=self.omega_0, name=f"sine{i}")(x)
        return x


class CoLIEModule(nn.Module):
    """CoLIE forward at fixed ``down_size`` (colie.py:235-265)."""
    window_size: int = 7
    down_size: int = 256
    hidden_dim: int = 256
    add_layer: int = 2
    num_layers: int = 4
    gf_radius: int = 1
    gf_eps: float = 1e-8
    use_hvi: bool = False    # colie_hvi: fit intensity in HVI space
    use_depth: bool = False  # colie_hvid: + depth/edge patch branches

    @nn.compact
    def __call__(self, x, depth=None):
        ds = self.down_size
        if self.use_hvi:
            # colie_hvi.py:152-196: I channel of HVI, NEAREST downsample
            k = self.param("density_k",
                           nn.initializers.constant(0.2), (1,))[0]
            hvi = rgb_to_hvi(x, density_k=k)
            v = jax.lax.stop_gradient(hvi)[..., 2:3]   # image_i detached
            v_lr = resize_nearest_torch(v, (ds, ds))
        else:
            hsv = rgb_to_hsv(x)
            v = hsv[..., 2:3]
            v_lr = resize_bicubic_torch(v, (ds, ds))

        # get_patches (colie.py:268-280): reflection-padded unfold
        w2 = self.window_size // 2
        kk = self.window_size

        def patches_of(t):
            tp = jnp.pad(t, ((0, 0), (w2, w2), (w2, w2), (0, 0)),
                         mode="reflect")
            p = jnp.stack([tp[:, dy:dy + ds, dx:dx + ds, 0]
                           for dy in range(kk) for dx in range(kk)], axis=-1)
            return p.reshape(x.shape[0], ds * ds, -1)

        patches = patches_of(v_lr)
        # get_coords (colie.py:282-291): [0,1]^2, channel 0 = x (width)
        lin = jnp.linspace(0.0, 1.0, ds)
        cx, cy = jnp.meshgrid(lin, lin)   # default 'xy' like numpy
        coords = jnp.stack([cx, cy], axis=-1).reshape(1, ds * ds, 2)
        coords = jnp.broadcast_to(coords, (x.shape[0], ds * ds, 2))

        mid = max(self.add_layer - 2, 0)
        tail = self.hidden_dim // (4 if self.use_depth else 2)
        dims = (self.hidden_dim,) * (1 + mid) + (tail,)
        patch_feat = SirenStack(dims, name="patch_net")(patches)
        spatial_feat = SirenStack(dims, name="spatial_net")(coords)
        feats = [patch_feat, spatial_feat]
        if self.use_depth:
            # colie_hvi.py:412-441: depth/edge patch branches; concat
            # order [patch, edge, depth, spatial]
            if depth is None:
                depth = (0.299 * x[..., 0:1] + 0.587 * x[..., 1:2]
                         + 0.114 * x[..., 2:3])
            edge = boundary_aware_prior(depth, eps=0.05, normalized=False)
            depth_lr = resize_nearest_torch(depth, (ds, ds))
            edge_lr = resize_nearest_torch(edge, (ds, ds))
            d_feat = SirenStack(dims, name="patch_d_net")(patches_of(depth_lr))
            e_feat = SirenStack(dims, name="patch_e_net")(patches_of(edge_lr))
            feats = [patch_feat, e_feat, d_feat, spatial_feat]
        joint = jnp.concatenate(feats, axis=-1)
        out_dims = tuple(self.hidden_dim for _ in range(self.add_layer, self.num_layers - 1)) + (1,)
        illu_res = SirenStack(out_dims, is_first=False, final_linear=True,
                              name="output_net")(joint)
        illu_res_lr = illu_res.reshape(x.shape[0], ds, ds, 1)

        illu_lr = illu_res_lr + v_lr
        v_fixed_lr = v_lr / (illu_lr + 1e-4)
        v_fixed = fast_guided_filter_bicubic(v_lr, v_fixed_lr, v,
                                             radius=self.gf_radius,
                                             eps=self.gf_eps)
        v_fixed = jnp.clip(v_fixed, 0.0, 1.0)
        if self.use_hvi:
            hvi_fixed = jnp.concatenate([hvi[..., :2], v_fixed], axis=-1)
            rgb = hvi_to_rgb(hvi_fixed, density_k=k)
        else:
            hsv_fixed = jnp.concatenate([hsv[..., :2], v_fixed], axis=-1)
            rgb = hsv_to_rgb(hsv_fixed)
        rgb = rgb / jnp.max(rgb)
        return {"enhanced": rgb, "illu_lr": illu_lr, "image_v_lr": v_lr,
                "image_v_fixed_lr": v_fixed_lr}


def colie_loss(L: float = 0.3, alpha: float = 1.0, beta: float = 20.0,
               gamma: float = 8.0, delta: float = 5.0):
    exp = LOSSES.build("exposure_control_loss", patch_size=16, mean_val=L)
    tv = LOSSES.build("total_variation_loss")

    def fn(outputs, datapoint):
        illu = outputs["illu_lr"]
        v_lr = outputs["image_v_lr"]
        v_fixed = outputs["image_v_fixed_lr"]
        # ExposureValueControlLoss: |mean((sqrt(pool(mean)) - L)^2)| — the
        # sqrt variant (reference image.py:572-607)
        pooled = jnp.sqrt(jnp.maximum(
            jnp.mean(_avg_pool16(jnp.mean(illu, axis=-1, keepdims=True)), axis=-1,
                     keepdims=True), 0.0))
        loss_exp = jnp.abs(jnp.mean((pooled - L) ** 2))
        loss_spa = jnp.mean(jnp.abs((illu - v_lr) ** 2))
        loss_tv = tv(illu)
        loss_sparsity = jnp.mean(v_fixed)
        return alpha * loss_spa + beta * loss_tv + gamma * loss_exp + delta * loss_sparsity
    return fn


def _avg_pool16(x):
    k = 16
    h, w = x.shape[-3] // k, x.shape[-2] // k
    x = x[..., : h * k, : w * k, :]
    return x.reshape(*x.shape[:-3], h, k, w, k, x.shape[-1]).mean(axis=(-4, -2))


def _make_colie(name, use_hvi=False, use_depth=False, **kw):
    return Model(
        name=name, arch="colie",
        module=CoLIEModule(
            window_size=kw.get("window_size", 7),
            down_size=kw.get("down_size", 256),
            hidden_dim=kw.get("hidden_dim", 256),
            add_layer=kw.get("add_layer", 2),
            num_layers=kw.get("num_layers", 4),
            use_hvi=use_hvi,
            use_depth=use_depth),
        tasks=(Task.LLIE,),
        schemes=(Scheme.UNSUPERVISED, Scheme.ZERO_REFERENCE, Scheme.INSTANCE),
        loss_fn=colie_loss(L=kw.get("L", 0.3), alpha=kw.get("alpha", 1.0),
                           beta=kw.get("beta", 20.0), gamma=kw.get("gamma", 8.0),
                           delta=kw.get("delta", 5.0)),
        required_inputs=("image",),
        instance_steps=kw.get("instance_steps", 100),
        instance_lr=kw.get("instance_lr", 1e-5),
        instance_weight_decay=kw.get("instance_weight_decay", 3e-4),
    )


@MODELS.register(name="colie_re", arch="colie", aliases=["colie"],
                 tasks=(Task.LLIE,), schemes=(Scheme.INSTANCE,))
def colie_re(**kwargs) -> Model:
    return _make_colie("colie_re", **kwargs)


@MODELS.register(name="colie_hvi", arch="colie",
                 tasks=(Task.LLIE,), schemes=(Scheme.INSTANCE,))
def colie_hvi(**kwargs) -> Model:
    return _make_colie("colie_hvi", use_hvi=True, **kwargs)


@MODELS.register(name="colie_hvid", arch="colie",
                 tasks=(Task.LLIE,), schemes=(Scheme.INSTANCE,))
def colie_hvid(**kwargs) -> Model:
    m = _make_colie("colie_hvid", use_hvi=True, use_depth=True, **kwargs)
    m.optional_inputs = ("depth",)  # depth used when present (colie_hvi.py:412)
    return m
