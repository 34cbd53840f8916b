"""Fused Zero-DCE curve-application kernels (Pallas TPU).

The curve loop ``y <- y + r_i * (y^2 - y)`` (reference zero_dce.py:186-187)
is elementwise but *iterative*: naively each iteration re-reads y and the
i-th curve slice from HBM. The fused kernels keep y in VMEM for all
iterations so HBM traffic is exactly: read image once, read curves once,
write output once.

``fused_curve_upsample_apply`` additionally consumes curves at 1/s
resolution (Zero-DCE++ scale_factor path, zero_dcepp.py:187-199) and
performs the bilinear upsample *inside* the tile, so the full-resolution
curve tensor never exists in HBM (saves H*W*C*iters*4 bytes of traffic and
memory — the thing that OOM'd full-res Zero-DCE++ at 1080p batch 4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 64
_TILE_W = 512


def _curve_kernel(x_ref, r_ref, o_ref, *, num_iters: int, shared: bool):
    x = x_ref[...]
    y = x
    c = x.shape[-1]
    for i in range(num_iters):
        r = r_ref[...] if shared else r_ref[..., i * c : (i + 1) * c]
        y = y + r * (y * y - y)
    o_ref[...] = y


def fused_curve_apply(image, curves, num_iters: int = 8, shared: bool = False,
                      interpret: bool = False):
    """y = iterate(y + r_i*(y^2-y)) with y held in VMEM across iterations.

    image: (N, H, W, C); curves: (N, H, W, C*num_iters) or (N, H, W, C).

    VMEM layout note: NHWC with C=3 would pad the lane dim 3 -> 128 (42x
    VMEM waste — observed 256 MB for a 1.5 MB tile). The kernel therefore
    flattens (W, C) into the lane dim: tiles are (th, W*C), where W*C is a
    multiple of 128 for typical widths. The curve math is elementwise, and
    for per-iteration curves the slice index i*c stays aligned because the
    flattened layout keeps each pixel's channels contiguous.
    """
    n, h, w, c = image.shape
    rc = curves.shape[-1]
    x2 = image.reshape(n, h, w * c)
    if shared:
        r2 = curves.reshape(n, h, w * rc)
    else:
        # (N,H,W,iters*C) -> (N,H,iters,W*C): per-iter planes contiguous
        r2 = curves.reshape(n, h, w, num_iters, c).transpose(0, 1, 3, 2, 4)
        r2 = r2.reshape(n, h, num_iters * w * c)

    th = min(_TILE_H, h)
    grid = (n, pl.cdiv(h, th))

    def kernel(x_ref, r_ref, o_ref):
        x = x_ref[...]
        y = x
        wc = x.shape[-1]
        for i in range(num_iters):
            r = r_ref[...] if shared else r_ref[..., i * wc : (i + 1) * wc]
            y = y + r * (y * y - y)
        o_ref[...] = y

    rlane = w * rc if shared else num_iters * w * c
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, image.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, w * c), lambda ni, i: (ni, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, rlane), lambda ni, i: (ni, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w * c), lambda ni, i: (ni, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, r2)
    return out.reshape(n, h, w, c)


def _curve_upsample_kernel(x_ref, r_ref, o_ref, *, num_iters: int, scale: int):
    """x tile (1, th, tw, C); r tile (1, th/s, tw/s, C) -> upsample + apply.

    The bilinear upsample is gather-free (Mosaic supports only 2D gathers):
    for each of the s output phases the weights are static, and neighbor
    values come from edge-clamped static shifts; phases are interleaved with
    a stack + merge-reshape (merged dims stay above the tiled last-two).
    """
    x = x_ref[...]
    r_lr = r_ref[...]

    def axis_interp(v, axis):
        # edge-clamped neighbors via static slices
        def shift(v, d):
            sl_main = [slice(None)] * v.ndim
            sl_edge = [slice(None)] * v.ndim
            if d > 0:   # next neighbor
                sl_main[axis] = slice(1, None)
                sl_edge[axis] = slice(-1, None)
                return jnp.concatenate([v[tuple(sl_main)], v[tuple(sl_edge)]], axis)
            sl_main[axis] = slice(None, -1)
            sl_edge[axis] = slice(None, 1)
            return jnp.concatenate([v[tuple(sl_edge)], v[tuple(sl_main)]], axis)

        v_next = shift(v, +1)
        v_prev = shift(v, -1)
        phases = []
        for p in range(scale):
            u = (p + 0.5) / scale - 0.5  # static python float
            b = v_next if u >= 0 else v_prev
            a = abs(u)
            phases.append(v * (1.0 - a) + b * a)
        st = jnp.stack(phases, axis=axis + 1)   # (..., in_len, s, ...)
        shape = list(v.shape)
        shape[axis] = v.shape[axis] * scale
        return st.reshape(shape)

    r = axis_interp(r_lr, axis=1)
    r = axis_interp(r, axis=2)
    r = r.astype(x.dtype)

    y = x
    for _ in range(num_iters):
        y = y + r * (y * y - y)
    o_ref[...] = y


def fused_curve_upsample_apply(image, curves_lr, num_iters: int = 8,
                               scale: int = 4, interpret: bool = False):
    """Zero-DCE++ fast path: shared curve at 1/scale res, upsampled in-tile.

    image: (N, H, W, C); curves_lr: (N, H/scale, W/scale, C). H, W must be
    multiples of scale (engine pads to the stride multiple anyway).
    """
    n, h, w, c = image.shape
    th = min(_TILE_H, h)
    tw = min(_TILE_W, w)
    # tiles must align to the scale grid
    th = max(th - th % scale, scale)
    tw = max(tw - tw % scale, scale)
    grid = (n, pl.cdiv(h, th), pl.cdiv(w, tw))

    kernel = functools.partial(_curve_upsample_kernel, num_iters=num_iters,
                               scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(image.shape, image.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, th, tw, c), lambda ni, i, j: (ni, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th // scale, tw // scale, c),
                         lambda ni, i, j: (ni, i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, tw, c), lambda ni, i, j: (ni, i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(image, curves_lr)
