"""Modulated deformable convolution (DCNv2) in pure JAX.

TPU-native replacement for mmcv's CUDA ``modulated_deform_conv2d``
(used by the reference's AirNet, airnet/net/deform_conv.py:7,65):
per output pixel and kernel tap, the input is sampled at
``p + p_k + Δp_k`` with bilinear interpolation (zeros outside), scaled
by a sigmoid modulation mask, and reduced with the conv weight.

Layout: channels-last. ``offset`` follows mmcv's interleaved channel
order [Δy_0, Δx_0, Δy_1, Δx_1, ...] over kernel taps in row-major
(ky, kw) order; ``mask`` has one channel per tap.

Implementation: K=kh*kw full-map bilinear gathers (4 gathers each via
``jnp.take`` composition), fused mask multiply, and a per-tap
(C→Cout) einsum that XLA maps onto the MXU. Fully differentiable —
unlike the CUDA op, no custom backward is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear_sample(x, py, px):
    """Sample x (B,H,W,C) at float coords (B,H,W); zeros outside."""
    h, w = x.shape[-3], x.shape[-2]
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))[..., None]
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        flat = x.reshape(x.shape[0], h * w, x.shape[-1])
        idx = (yc * w + xc).reshape(x.shape[0], -1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.where(valid, g.reshape(py.shape + (x.shape[-1],)), 0.0)

    return ((1 - wy) * (1 - wx) * tap(y0i, x0i)
            + (1 - wy) * wx * tap(y0i, x0i + 1)
            + wy * (1 - wx) * tap(y0i + 1, x0i)
            + wy * wx * tap(y0i + 1, x0i + 1))


def modulated_deform_conv2d(x, offset, mask, weight, bias=None):
    """DCNv2 forward; stride 1, padding (kh//2, kw//2) (AirNet's config).

    Args:
        x: (B, H, W, C) input.
        offset: (B, H, W, 2*kh*kw), mmcv interleaved [Δy, Δx] per tap.
        mask: (B, H, W, kh*kw) modulation (already sigmoided).
        weight: (kh, kw, C, Cout).
        bias: optional (Cout,).
    """
    kh, kw = weight.shape[:2]
    h, w = x.shape[-3], x.shape[-2]
    ys = jnp.arange(h, dtype=x.dtype)[:, None]
    xs = jnp.arange(w, dtype=x.dtype)[None, :]
    out = 0.0
    for j in range(kh * kw):
        ky, kx = j // kw, j % kw
        py = ys + (ky - kh // 2) + offset[..., 2 * j]
        px = xs + (kx - kw // 2) + offset[..., 2 * j + 1]
        samp = _bilinear_sample(x, py, px) * mask[..., j:j + 1]
        out = out + jnp.einsum("bhwc,co->bhwo", samp, weight[ky, kx])
    if bias is not None:
        out = out + bias
    return out
