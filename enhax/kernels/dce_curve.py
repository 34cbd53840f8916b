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


def fused_curve_upsample_apply(image, curves_lr, num_iters: int = 8,
                               scale: int = 4, interpret: bool = False):
    """Zero-DCE++ fast path: shared curve at 1/scale res, H-upsampled in-tile.

    image: (N, H, W, C); curves_lr: (N, H/scale, W/scale, C). H, W must be
    multiples of scale (the engine pads to the divisor anyway).

    Layout (the validated fused_curve_apply recipe): (W, C) flattened into
    the lane dim; the image rows additionally factored (H/s, s) so the
    per-phase interpolated curve rows stack straight onto the phase sublane
    axis — no reshapes inside the kernel (Mosaic-safe).

    The W-axis half of the separable bilinear runs in XLA first (it only
    materializes an H/s-height tensor, 1/s of the full-res curve). The
    H-axis half happens in-tile from three edge-clamped row views
    (prev/cur/next), so the full-resolution curve tensor never exists in
    HBM. HBM traffic: image + output + 3*(1/s) curve planes ~ 2.75 planes
    at s=4, vs ~4 for the XLA resize-then-apply graph.
    """
    n, h, w, c = image.shape
    s = int(scale)
    if h % s or w % s:
        raise ValueError(f"H, W must be multiples of scale={s}; got {h}x{w}")
    hl = h // s

    # separable bilinear, W axis (materializes only (n, hl, w, c))
    r_w = jax.image.resize(curves_lr, (n, hl, w, curves_lr.shape[-1]),
                           method="bilinear")
    r0 = r_w.reshape(n, hl, w * c)
    r_prev = jnp.concatenate([r0[:, :1], r0[:, :-1]], axis=1)
    r_next = jnp.concatenate([r0[:, 1:], r0[:, -1:]], axis=1)
    # rows factored into (H/s, s) so each LR row owns its s output phases
    x4 = image.reshape(n, hl, s, w * c)

    thq = max(min(_TILE_H, hl) // 1, 1)
    thq = min(thq, 64)
    # keep a tile (x + out + 3r, double-buffered) comfortably inside VMEM
    while thq > 1 and thq * (2 * s + 3) * w * c * 4 * 2 > 12 * 2**20:
        thq //= 2
    grid = (n, pl.cdiv(hl, thq))

    def kernel(x_ref, r0_ref, rp_ref, rn_ref, o_ref):
        # per-phase processing on (1, thq, w*c) slabs — measured fastest of
        # three layouts on v5e (sublane phase-stack 0.66x, lane-concat 0.40x
        # of XLA; this one 0.61x: Mosaic relayouts dominate either way)
        r_cur = r0_ref[...]                  # (1, thq, w*c)
        for p in range(s):
            u = (p + 0.5) / s - 0.5          # static phase offset
            nb = rn_ref[...] if u >= 0 else rp_ref[...]
            a = abs(u)
            r = (r_cur * (1.0 - a) + nb * a).astype(x_ref.dtype)
            y = x_ref[:, :, p, :]
            for _ in range(num_iters):
                y = y + r * (y * y - y)
            o_ref[:, :, p, :] = y

    lr_spec = pl.BlockSpec((1, thq, w * c), lambda ni, i: (ni, i, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x4.shape, image.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, thq, s, w * c), lambda ni, i: (ni, i, 0, 0),
                         memory_space=pltpu.VMEM),
            lr_spec, lr_spec, lr_spec,
        ],
        out_specs=pl.BlockSpec((1, thq, s, w * c), lambda ni, i: (ni, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x4, r0, r_prev, r_next)
    return out.reshape(n, h, w, c)
