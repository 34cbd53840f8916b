"""Implicit neural representation (INR) stack.

Rebuild of reference ``src/mon/nn/modules/inr.py:60-886`` (918 LoC): the
per-image-optimization layer family — SIREN sine layers, WIRE complex Gabor,
GAUSS, FINER, PEMLP positional encoding — plus coordinate grids and the
context encoder used by CoLIE / Zero-MIE.

TPU design: an INR fit is thousands of tiny matmuls; enhax runs the whole
inner optimization as one ``lax.scan`` inside a single jit (see
models/llie/colie.py), and these layers keep everything batched (B, N, C) so
a fleet of images can be fitted with one vmap.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def siren_init(is_first: bool, omega_0: float):
    """SIREN weight init (reference inr.py:312-341): U(-1/in, 1/in) for the
    first layer, U(-sqrt(6/in)/omega, +) otherwise."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        if is_first:
            bound = 1.0 / fan_in
        else:
            bound = math.sqrt(6.0 / fan_in) / omega_0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SineLayer(nn.Module):
    """sin(omega_0 * Wx+b) (SIREN; reference inr.py:293)."""
    features: int
    is_first: bool = False
    omega_0: float = 30.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=siren_init(self.is_first, self.omega_0))(x)
        return jnp.sin(self.omega_0 * y)


class FINERLayer(nn.Module):
    """sin(omega_0 * (|y|+1) * y) variable-periodic activation (inr.py:100)."""
    features: int
    is_first: bool = False
    omega_0: float = 30.0
    first_bias_scale: float | None = None
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        bias_init = nn.initializers.zeros
        if self.is_first and self.first_bias_scale is not None:
            s = self.first_bias_scale
            bias_init = nn.initializers.uniform(scale=2 * s)  # [0, 2s] -> shift
            def bias_init(key, shape, dtype=jnp.float32, _s=s):  # noqa: F811
                return jax.random.uniform(key, shape, dtype, -_s, _s)
        y = nn.Dense(self.features, use_bias=self.use_bias,
                     kernel_init=siren_init(self.is_first, self.omega_0),
                     bias_init=bias_init)(x)
        scale = jax.lax.stop_gradient(jnp.abs(y)) + 1.0
        return jnp.sin(self.omega_0 * scale * y)


class GaussLayer(nn.Module):
    """exp(-(scale * y)^2) Gaussian activation (inr.py:169)."""
    features: int
    scale: float = 10.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias)(x)
        return jnp.exp(-((self.scale * y) ** 2))


class GaborLayer(nn.Module):
    """Real-valued WIRE Gabor layer: cos(omega*y) * exp(-(scale*y)^2).

    The reference's ComplexGaborLayer (inr.py:60) uses cfloat weights; on TPU
    complex dtypes fall off the fast path, so enhax uses the real Gabor
    formulation (equivalent expressive family, see WIRE paper §3.2) with
    doubled features carrying the quadrature component.
    """
    features: int
    is_first: bool = False
    omega_0: float = 10.0
    sigma_0: float = 40.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.features, use_bias=self.use_bias)(x)
        return jnp.cos(self.omega_0 * y) * jnp.exp(-((self.sigma_0 * y) ** 2))


class ReLULayer(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.relu(nn.Dense(self.features, use_bias=self.use_bias)(x))


class SigmoidLayer(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return jax.nn.sigmoid(nn.Dense(self.features, use_bias=self.use_bias)(x))


class TanhLayer(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(nn.Dense(self.features, use_bias=self.use_bias)(x))


def positional_encoding(x, n_freqs: int = 10, logscale: bool = True):
    """[x, sin(2^k x), cos(2^k x)...] Fourier features (inr.py:201-226)."""
    if logscale:
        freqs = 2.0 ** jnp.arange(n_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(f * x))
        outs.append(jnp.cos(f * x))
    return jnp.concatenate(outs, axis=-1)


_LAYER_TYPES = {
    "sine": SineLayer, "siren": SineLayer,
    "finer": FINERLayer,
    "gauss": GaussLayer,
    "gabor": GaborLayer, "wire": GaborLayer,
    "relu": ReLULayer,
    "sigmoid": SigmoidLayer,
    "tanh": TanhLayer,
}


class INRNet(nn.Module):
    """Generic INR MLP (reference INRLayer/SIREN/WIRE/GAUSS/FINER/PEMLP
    wrappers, inr.py:379-750): ``layer_type`` selects the nonlinearity;
    the final layer is a plain Dense.

    Input: (..., in_features) coordinates; output (..., out_features).
    PEMLP = layer_type="relu" with use_pe=True.
    """
    hidden_features: int = 256
    hidden_layers: int = 2
    out_features: int = 3
    layer_type: str = "sine"
    omega_0: float = 30.0
    scale: float = 10.0
    first_bias_scale: float | None = None
    use_pe: bool = False
    n_freqs: int = 10
    final_activation: str | None = None

    @nn.compact
    def __call__(self, x):
        if self.use_pe:
            x = positional_encoding(x, self.n_freqs)
        layer_cls = _LAYER_TYPES[self.layer_type]

        def make(i, is_first):
            kw = {"features": self.hidden_features}
            if layer_cls in (SineLayer, FINERLayer):
                kw.update(is_first=is_first, omega_0=self.omega_0)
                if layer_cls is FINERLayer:
                    kw.update(first_bias_scale=self.first_bias_scale)
            elif layer_cls is GaussLayer:
                kw.update(scale=self.scale)
            elif layer_cls is GaborLayer:
                kw.update(is_first=is_first, omega_0=self.omega_0, sigma_0=self.scale)
            return layer_cls(**kw, name=f"layer{i}")

        x = make(0, True)(x)
        for i in range(self.hidden_layers):
            x = make(i + 1, False)(x)
        kernel_init = (siren_init(False, self.omega_0)
                       if layer_cls in (SineLayer, FINERLayer)
                       else nn.initializers.lecun_normal())
        x = nn.Dense(self.out_features, kernel_init=kernel_init, name="out")(x)
        if self.final_activation == "sigmoid":
            x = jax.nn.sigmoid(x)
        elif self.final_activation == "tanh":
            x = jnp.tanh(x)
        return x


def coordinate_grid(h: int, w: int, flatten: bool = True):
    """Normalized [-1, 1] (y, x) coordinate grid, (H*W, 2) or (H, W, 2)."""
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)
    return grid.reshape(-1, 2) if flatten else grid


def context_window_features(image_gray, window: int = 1):
    """Unfolded local patches around each pixel as INR context features.

    Rebuild of the reference's ContextImplicitFeatureEncoder (inr.py:752-828;
    CoLIE's context branch): each pixel gets its (2w+1)^2 neighborhood
    (replicate-padded), flattened. (..., H, W, 1) -> (..., H, W, (2w+1)^2).
    """
    k = 2 * window + 1
    pads = [(0, 0)] * (image_gray.ndim - 3) + [(window, window), (window, window), (0, 0)]
    p = jnp.pad(image_gray, pads, mode="edge")
    h, w = image_gray.shape[-3], image_gray.shape[-2]
    feats = []
    for dy in range(k):
        for dx in range(k):
            feats.append(p[..., dy : dy + h, dx : dx + w, 0])
    return jnp.stack(feats, axis=-1)
