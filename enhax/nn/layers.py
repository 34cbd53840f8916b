"""Layer library (flax.linen, NHWC).

Rebuild of reference ``src/mon/nn/modules/`` (6,727 LoC): conv variants
(conv/base.py, dsconv.py depthwise-separable, bsconv.py blueprint-separable,
ffconv.py fast-Fourier conv), attention blocks (attention.py:11-39 — SE,
CBAM, ECA, SimAM, window attention), norms (normalization.py:55
AdaptiveBatchNorm), priors (prior/image.py:221 BoundaryAwarePrior) and the
LayeredFeatureAggregation MoE (moe.py:26).

TPU notes: channels-last everywhere; convs use lax.conv via linen.Conv which
XLA tiles onto the MXU; attention is windowed (static shapes) so it fuses.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class PWConv(nn.Module):
    """1x1 conv with an nn.Dense param layout and a switchable lowering.

    Default impl is the channel matmul (identical math, init, and params to
    ``nn.Dense``): XLA's TPU conv op runs small-channel 1x1 convs at ~1 TF/s
    / 60 GB/s (measured on v5e at C=32) while the same contraction as a dot
    runs ~5x faster (docs/PERF.md round-3 probes). ``ENHAX_PW_IMPL=conv``
    re-expresses it as a (1,1) ``lax.conv`` for on-device A/B probing —
    params stay "kernel" (C_in, C_out) + "bias" (C_out,) in both impls, so
    checkpoint name maps and conversions are impl-independent.
    """
    features: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import os
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,)) if self.use_bias else None
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        k = kernel.astype(dt)
        xc = x.astype(dt)
        if os.environ.get("ENHAX_PW_IMPL", "dot") == "conv":
            out = jax.lax.conv_general_dilated(
                xc, k[None, None], window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            out = jnp.dot(xc, k)
        if bias is not None:
            out = out + bias.astype(out.dtype)
        return out


def conv1x1(features: int, use_bias: bool = True, dtype: Any = None,
            name: str | None = None) -> PWConv:
    """1x1 conv lowered to a channel matmul (see :class:`PWConv`).

    The checkpoint converter's shape fitter maps torch (C_out, C_in, 1, 1)
    conv weights onto the "kernel" (C_in, C_out) param transparently, so
    name maps are unchanged.
    """
    return PWConv(features, use_bias=use_bias, dtype=dtype, name=name)


def dwconv3x3_shift(x, kernel):
    """Depthwise 3x3 SAME conv as nine statically-shifted multiply-adds.

    The single home of the shifted-adds lowering (used by DWConv3x3, the
    fused NAFBlock XLA path, and the probe script). ``kernel`` is the
    nn.Conv depthwise layout (3, 3, 1, C); zero padding, stride 1.
    """
    h, w = x.shape[-3], x.shape[-2]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            t = xp[:, dy:dy + h, dx:dx + w, :] * kernel[dy, dx, 0]
            out = t if out is None else out + t
    return out


class DWConv3x3(nn.Module):
    """Depthwise 3x3 SAME conv with a channel-count-dependent lowering.

    XLA's TPU conv op leaves *small-channel* depthwise convs far off memory
    speed (round-3 probes measured ~10x at C=32; docs/PERF.md) — grouped
    convs can't use the MXU. At small C the conv is therefore expressed as
    nine statically-shifted multiply-adds that fuse into one elementwise
    pass. At large C the tables turn: the shifted-adds path materializes a
    padded copy and nine strided reads of a huge tensor, while the conv op
    amortizes its overhead — so ``impl="auto"`` (the default) picks shifted
    adds only up to a measured channel threshold and XLA's grouped conv
    above it (override with ENHAX_DW_IMPL=shift|conv for probing).

    Param layout matches ``nn.Conv(feature_group_count=C)`` in BOTH impls:
    kernel (3, 3, 1, C) + optional bias (C,), so checkpoint name-maps,
    conversions, and parity tests are impl-independent.
    """
    features: int
    use_bias: bool = True
    dtype: Any = None
    impl: str = "auto"   # "auto" | "shift" | "conv"

    # crossover measured on v5e (run/probe_lowering.py): shifted adds win
    # decisively at C<=64, the grouped conv op from ~128 up
    SHIFT_MAX_C: int = 64

    @nn.compact
    def __call__(self, x):
        import os
        c = self.features
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, 1, c))
        # promote like nn.Conv/PWConv: f32 params + bf16 activations run
        # in f32 unless dtype says otherwise (not silently in bf16)
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        k = kernel.astype(dt)
        xc = x.astype(dt)
        impl = os.environ.get("ENHAX_DW_IMPL", self.impl)
        if impl == "auto":
            impl = "shift" if c <= self.SHIFT_MAX_C else "conv"
        if impl == "conv":
            out = jax.lax.conv_general_dilated(
                xc, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)
        else:
            out = dwconv3x3_shift(xc, k)
        if self.use_bias:
            out = out + self.param("bias", nn.initializers.zeros,
                                   (c,)).astype(out.dtype)
        return out


class ConvBlock(nn.Module):
    """Conv -> (norm) -> (act). The reference's conv/base.py workhorse."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    norm: str | None = None          # None | "bn" | "ln" | "in"
    act: Callable | None = nn.relu
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), use_bias=self.use_bias,
                    dtype=self.dtype)(x)
        if self.norm == "bn":
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        elif self.norm == "ln":
            x = nn.LayerNorm(dtype=self.dtype)(x)
        elif self.norm == "in":
            x = InstanceNorm2d(dtype=self.dtype)(x)
        if self.act is not None:
            x = self.act(x)
        return x


class DSConv(nn.Module):
    """Depthwise-separable conv (reference dsconv.py, used by Zero-DCE++)."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(in_ch, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides), feature_group_count=in_ch,
                    use_bias=self.use_bias, dtype=self.dtype, name="depthwise")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, name="pointwise")(x)
        return x


class BSConv(nn.Module):
    """Blueprint-separable conv (reference bsconv.py): pointwise then depthwise."""
    features: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype, name="pointwise")(x)
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    feature_group_count=self.features,
                    use_bias=self.use_bias, dtype=self.dtype, name="depthwise")(x)
        return x


class FFConv(nn.Module):
    """Fast-Fourier conv (reference ffconv.py): local branch + spectral branch.

    The spectral branch convolves in rfft2 space (1x1 conv over stacked
    real/imag), giving a global receptive field in one op — MXU-friendly
    because it is all matmuls over the channel dim.
    """
    features: int
    ratio_spectral: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c_spec = int(self.features * self.ratio_spectral)
        c_local = self.features - c_spec
        local = nn.Conv(c_local, (3, 3), dtype=self.dtype, name="local")(x)
        # spectral branch
        f = jnp.fft.rfft2(x.astype(jnp.float32), axes=(-3, -2))
        f = jnp.concatenate([f.real, f.imag], axis=-1)
        f = nn.Conv(2 * c_spec, (1, 1), dtype=jnp.float32, name="spectral")(f)
        f = nn.relu(f)
        re, im = jnp.split(f, 2, axis=-1)
        spec = jnp.fft.irfft2(jax.lax.complex(re, im), s=x.shape[-3:-1], axes=(-3, -2))
        return jnp.concatenate([local, spec.astype(local.dtype)], axis=-1)


class InstanceNorm2d(nn.Module):
    """Per-sample, per-channel spatial normalization (torch InstanceNorm2d).

    affine=True by default, matching HINet's usage (hinet.py uses
    InstanceNorm2d(affine=True)).
    """
    eps: float = 1e-5
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
        var = jnp.var(x, axis=(-3, -2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
            bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
            y = y * scale + bias
        return y


class AdaptiveBatchNorm(nn.Module):
    """a*x + b*BN(x) with learnable scalars (reference normalization.py:55)."""
    eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        a = self.param("a", nn.initializers.ones, (1,))
        b = self.param("b", nn.initializers.zeros, (1,))
        bn = nn.BatchNorm(use_running_average=not train, epsilon=self.eps,
                          dtype=self.dtype)(x)
        return a * x + b * bn


class LayerNorm2d(nn.Module):
    """Channel LayerNorm for NHWC feature maps (NAFNet/Restormer style)."""
    eps: float = 1e-6
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        y = y * scale
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        return y


# ---------------------------------------------------------------------------
# Attention blocks (reference nn/modules/attention.py)
# ---------------------------------------------------------------------------

class SqueezeExcite(nn.Module):
    """SE channel attention."""
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(-3, -2))
        s = nn.Dense(max(c // self.reduction, 1))(s)
        s = nn.relu(s)
        s = nn.Dense(c)(s)
        s = jax.nn.sigmoid(s)
        return x * s[..., None, None, :]


class ECA(nn.Module):
    """Efficient channel attention: 1D conv over channel descriptor."""
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(-3, -2))          # (N, C)
        s = nn.Conv(1, (self.kernel_size,), padding="SAME")(s[..., None])[..., 0]
        s = jax.nn.sigmoid(s)
        return x * s[..., None, None, :]


class CBAM(nn.Module):
    """Convolutional block attention: channel then spatial gates."""
    reduction: int = 16
    spatial_kernel: int = 7

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.reduction, 1)
        mlp = nn.Sequential([nn.Dense(hidden), nn.relu, nn.Dense(c)])
        avg = mlp(jnp.mean(x, axis=(-3, -2)))
        mx = mlp(jnp.max(x, axis=(-3, -2)))
        x = x * jax.nn.sigmoid(avg + mx)[..., None, None, :]
        savg = jnp.mean(x, axis=-1, keepdims=True)
        smax = jnp.max(x, axis=-1, keepdims=True)
        gate = nn.Conv(1, (self.spatial_kernel, self.spatial_kernel))(
            jnp.concatenate([savg, smax], axis=-1))
        return x * jax.nn.sigmoid(gate)


class SimAM(nn.Module):
    """Parameter-free attention (SimAM): energy-based neuron weighting."""
    e_lambda: float = 1e-4

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        n = h * w - 1
        d = (x - jnp.mean(x, axis=(-3, -2), keepdims=True)) ** 2
        v = jnp.sum(d, axis=(-3, -2), keepdims=True) / n
        e_inv = d / (4 * (v + self.e_lambda)) + 0.5
        return x * jax.nn.sigmoid(e_inv)


class WindowAttention(nn.Module):
    """Multi-head self-attention within non-overlapping windows (Swin/Uformer).

    Input (N, H, W, C) with H, W divisible by window_size. Relative position
    bias included. Optionally shifted (Swin-style) via jnp.roll.
    """
    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    qkv_bias: bool = True
    split_qkv: bool = False     # Uformer LinearProjection: separate q / kv
    use_modulator: bool = False  # Uformer decoder per-window pos embedding
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        n, h, w, c = x.shape
        ws = self.window_size
        if self.shift:
            x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
        # partition windows: (N * nH * nW, ws*ws, C)
        nh, nw = h // ws, w // ws
        xw = x.reshape(n, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(n * nh * nw, ws * ws, c)

        if self.use_modulator:
            # uformer.py:426/556: learned per-window-token embedding added
            # before W-MSA (decoder layers of the t/s/b variants)
            mod = self.param("modulator", nn.initializers.normal(0.02),
                             (ws * ws, self.dim))
            xw = xw + mod[None]

        head_dim = self.dim // self.num_heads
        if self.split_qkv:
            q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="to_q")(xw)
            kv = nn.Dense(self.dim * 2, use_bias=self.qkv_bias,
                          dtype=self.dtype, name="to_kv")(xw)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias,
                           dtype=self.dtype, name="qkv")(xw)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (head_dim ** -0.5), k,
                          preferred_element_type=jnp.float32)

        # relative position bias
        rel = self.param(
            "rel_pos_bias", nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads))
        coords = jnp.stack(jnp.meshgrid(jnp.arange(ws), jnp.arange(ws), indexing="ij"))
        flat = coords.reshape(2, -1)
        diff = flat[:, :, None] - flat[:, None, :] + (ws - 1)
        idx = diff[0] * (2 * ws - 1) + diff[1]
        attn = attn + rel[idx].transpose(2, 0, 1)[None]

        if self.shift and mask is not None:
            nwins = nh * nw
            attn = attn.reshape(n, nwins, self.num_heads, ws * ws, ws * ws)
            attn = attn + mask[None, :, None]
            attn = attn.reshape(n * nwins, self.num_heads, ws * ws, ws * ws)

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(xw.shape[0], ws * ws, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)

        # merge windows
        out = out.reshape(n, nh, nw, ws, ws, self.dim).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(n, h, w, self.dim)
        if self.shift:
            out = jnp.roll(out, shift=(self.shift, self.shift), axis=(1, 2))
        return out


def make_shift_attn_mask(h: int, w: int, window_size: int, shift: int):
    """Attention mask for shifted windows (host-side constant)."""
    import numpy as np
    img_mask = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
        for wsl in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    nh, nw = h // window_size, w // window_size
    mw = img_mask.reshape(nh, window_size, nw, window_size).transpose(0, 2, 1, 3)
    mw = mw.reshape(nh * nw, window_size * window_size)
    diff = mw[:, :, None] - mw[:, None, :]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


# ---------------------------------------------------------------------------
# Priors & MoE
# ---------------------------------------------------------------------------

def median_blur(x, ksize: int):
    """kornia-style median blur: reflect padding, per-channel window
    median."""
    p = ksize // 2
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 3) + [(p, p), (p, p), (0, 0)],
                 mode="reflect")
    h, w = x.shape[-3], x.shape[-2]
    patches = jnp.stack([xp[..., dy:dy + h, dx:dx + w, :]
                         for dy in range(ksize) for dx in range(ksize)],
                        axis=-1)
    return jnp.median(patches, axis=-1)


def brightness_attention_map(image, gamma: float = 2.5, ksize: int | None = 9):
    """BAM prior (reference prior/image.py:243-289): optional median
    denoise, then (1 - V_hsv)^gamma where V = max(R,G,B)."""
    x = median_blur(image, ksize) if ksize else image
    v = jnp.max(x, axis=-1, keepdims=True)
    return jnp.power(1.0 - v, gamma)


def boundary_aware_prior(image, eps: float = 0.05, normalized: bool = True):
    """Thresholded Sobel edge prior (reference prior/image.py:182-236):
    kornia-style sobel magnitude (replicate padding, eps inside the
    sqrt), normalized by its global max, then thresholded."""
    kx = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    if normalized:
        kx = kx / 8.0
    ky = kx.T
    xp = jnp.pad(image, [(0, 0)] * (image.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                 mode="edge")
    h, w = image.shape[-3], image.shape[-2]
    gx = sum(kx[i, j] * xp[..., i:i + h, j:j + w, :]
             for i in range(3) for j in range(3))
    gy = sum(ky[i, j] * xp[..., i:i + h, j:j + w, :]
             for i in range(3) for j in range(3))
    g = jnp.sqrt(gx * gx + gy * gy + 1e-6)
    g = g / jnp.max(g)
    return (g > eps).astype(image.dtype)


class LayeredFeatureAggregation(nn.Module):
    """Layered Feature Aggregation MoE (reference moe.py:26-77).

    With ``size`` set: bilinear-resize every expert to that size and
    project each through its own 1x1 conv (``linears.{i}``); without it the
    inputs must already share shape. Gating is DATA-DEPENDENT: a 1x1 conv
    over the concatenated experts predicts per-pixel logits, softmaxed over
    channels, and channel i weights expert i's whole map — the reference's
    ``r[i] * w[:, i]`` broadcast (which upstream only supports at batch 1;
    here it batches naturally). Param names mirror the torch modules so
    checkpoints convert (``linears.{i}`` -> ``proj{i}``, ``conv`` ->
    ``gate``).
    """
    features: int
    size: tuple | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        n = len(feats)
        outs = []
        for i, f in enumerate(feats):
            if self.size is not None:
                hw = (self.size, self.size) if isinstance(self.size, int) \
                    else tuple(self.size)
                if f.shape[-3:-1] != hw:
                    # nn.Upsample(mode="bilinear", align_corners=False)
                    # == jax.image.resize half-pixel "linear"
                    f = jax.image.resize(
                        f, f.shape[:-3] + hw + f.shape[-1:], method="linear")
                f = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                            name=f"proj{i}")(f)
            outs.append(f)
        o_s = jnp.concatenate(outs, axis=-1)
        logits = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                         name="gate")(o_s)
        w = jax.nn.softmax(logits, axis=-1)
        return sum(outs[i] * w[..., i:i + 1] for i in range(n))


# ---------------------------------------------------------------------------
# Pixel shuffle / unshuffle (SR + Restormer up/down)
# ---------------------------------------------------------------------------

def pixel_shuffle(x, factor: int):
    """(N,H,W,C*r^2) -> (N,H*r,W*r,C).

    Channel grouping follows torch.pixel_shuffle ((C_out, r, r) order) so
    converted checkpoints keep sub-pixel phase alignment.
    """
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h, w, c // (r * r), r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c // (r * r))


def pixel_unshuffle(x, factor: int):
    """(N,H,W,C) -> (N,H/r,W/r,C*r^2) (torch channel order)."""
    n, h, w, c = x.shape
    r = factor
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(n, h // r, w // r, c * r * r)
