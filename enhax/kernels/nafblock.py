"""Tile-resident Pallas kernels for the NAFNet block.

The r2 bench showed heavy restorers at 5-20% MFU: XLA runs each of the
~10 ops per NAFBlock as a separate HBM round-trip, and its TPU conv op
handles small channel counts badly (docs/PERF.md round-3 probes: 1x1 conv
C=32 at 0.96 TF/s vs 174 TF/s matmul peak; dw3x3 at ~7 ms full-res).
These kernels keep one row-tile's activation chain in VMEM across the
block (SURVEY.md §5.7 / r2 VERDICT #1):

  K1: LayerNorm -> 1x1 (c->2c) -> depthwise 3x3 -> SimpleGate      [halo 1]
  box: border-truncated window mean for TLC, H-pass + W-pass        [2 kernels]
  K2: SCA (pooled 1x1, *) -> 1x1 -> +x*beta -> LayerNorm -> 1x1
      (c->2c) -> SimpleGate -> 1x1 -> +*gamma                       [no halo]

Layout: NHWC with channels in lanes; row tiles sized so every buffer sits
in VMEM (f32 compute, input-dtype I/O). The NAFBlock's reference math is
`enhax.models.multitask.nafnet.NAFBlock`; equality is asserted by
tests/test_kernels_nafblock.py (interpret mode on CPU, compiled on TPU).

Reference being replaced: the per-op XLA path of NAFNet_arch.py:20-60 and
TLC's AvgPool2d local statistics (local_arch.py:20-55).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _rows_per_tile(w: int, c: int, dtype_bytes: int = 4) -> int:
    """Row tile so K1's buffers (~4 row-sized f32 arrays at 2c lanes,
    lane-padded to 128) stay within ~10 MB of VMEM."""
    lane_c = max(2 * c, 128)
    row_bytes = w * lane_c * dtype_bytes
    th = max(int((10 * 2 ** 20) // (4 * row_bytes)), 1)
    return int(min(th, 64))


def _layer_norm(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _shift_w(x, dw):
    """Shift along the W axis (axis -2) with zero fill (SAME conv pad)."""
    if dw == 0:
        return x
    zeros = jnp.zeros_like(x[:, :1])
    if dw > 0:     # neighbor at w-1 -> shift right
        return jnp.concatenate([zeros, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zeros], axis=1)


def _k1_kernel(x_ref, xprev_ref, xnext_ref, ln_s, ln_b, w1, b1, dww, dwb,
               g_out, *, tile_h, w, c, n_tiles):
    """LN1 -> 1x1 -> dw3x3 -> gate for one (batch, row-tile) grid cell.

    Halo rows arrive as two single-row blocks whose index maps point at
    the last row of the previous tile / first row of the next (clamped);
    at the image edges they are masked to zero (SAME conv padding).
    Mosaic cannot DMA-slice a <128-lane minor dim manually, so everything
    uses standard blocked specs."""
    i = pl.program_id(1)
    f32 = jnp.float32
    prev = jnp.where(i > 0, xprev_ref[0].astype(f32), 0.0)
    nxt = jnp.where(i < n_tiles - 1, xnext_ref[0].astype(f32), 0.0)
    xb = jnp.concatenate([prev, x_ref[0].astype(f32), nxt], axis=0)
    y = _layer_norm(xb, ln_s[0].astype(jnp.float32),
                    ln_b[0].astype(jnp.float32))
    y = jnp.dot(y.reshape(-1, c), w1[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    y = (y + b1[0].astype(jnp.float32)).reshape(tile_h + 2, w, 2 * c)
    dwwf = dww[:].astype(jnp.float32)                   # (3, 3, 2c)
    acc = jnp.zeros((tile_h, w, 2 * c), jnp.float32)
    for dh in (0, 1, 2):
        row = y[dh:dh + tile_h]
        for dx in (-1, 0, 1):
            # kernel tap (dh, dx+1) multiplies input at offset (dh-1, dx):
            # shift +1 brings in[w-1] to out[w]
            acc = acc + _shift_w(row, -dx) * dwwf[dh, dx + 1]
    acc = acc + dwb[0].astype(jnp.float32)
    g = acc[..., :c] * acc[..., c:]
    g_out[0] = g.astype(g_out.dtype)


def _k2_kernel(x_ref, g_ref, pool_ref, sca_w, sca_b, w3, b3, beta,
               ln2_s, ln2_b, w4, b4, w5, b5, gamma, out_ref, *,
               tile_h, w, c, pooled_spatial):
    """SCA apply + 1x1 + residual + LN2 + gated FFN for one row tile."""
    f32 = jnp.float32
    x = x_ref[0].astype(f32)
    g = g_ref[0].astype(f32)
    pool = pool_ref[0].astype(f32)
    att = jnp.dot(pool.reshape(-1, c), sca_w[:].astype(f32),
                  preferred_element_type=f32) + sca_b[0].astype(f32)
    if pooled_spatial:
        att = att.reshape(tile_h, w, c)
    else:
        att = att.reshape(1, 1, c)
    y = g * att
    y = jnp.dot(y.reshape(-1, c), w3[:].astype(f32),
                preferred_element_type=f32) + b3[0].astype(f32)
    x1 = x + y.reshape(tile_h, w, c) * beta[0].astype(f32)
    y = _layer_norm(x1, ln2_s[0].astype(f32), ln2_b[0].astype(f32))
    y = jnp.dot(y.reshape(-1, c), w4[:].astype(f32),
                preferred_element_type=f32) + b4[0].astype(f32)
    y = y.reshape(tile_h, w, 2 * c)
    y = y[..., :c] * y[..., c:]
    y = jnp.dot(y.reshape(-1, c), w5[:].astype(f32),
                preferred_element_type=f32) + b5[0].astype(f32)
    out = x1 + y.reshape(tile_h, w, c) * gamma[0].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _cumsum(x, axis: int, n: int):
    """Hillis-Steele inclusive scan via log2(n) shift-adds; Mosaic has no
    cumsum lowering, but static concat/slice steps in VMEM are cheap."""
    d = 1
    while d < n:
        pad_shape = list(x.shape)
        pad_shape[axis] = d
        zeros = jnp.zeros(pad_shape, x.dtype)
        shifted = jax.lax.slice_in_dim(x, 0, n - d, axis=axis)
        x = x + jnp.concatenate([zeros, shifted], axis=axis)
        d *= 2
    return x


def _box_h_kernel(x_ref, o_ref, *, r, h):
    """Border-truncated window SUM along H (full-H block)."""
    x = x_ref[0].astype(jnp.float32)                    # (H, wt, C)
    if r >= h - 1:  # window always spans the full axis (deep NAFNet stages)
        total = jnp.sum(x, axis=0, keepdims=True)
        o_ref[0] = jnp.broadcast_to(total, x.shape).astype(o_ref.dtype)
        return
    cs = _cumsum(x, 0, h)
    hi = jnp.concatenate(
        [cs[r:], jnp.broadcast_to(cs[-1:], (r,) + cs.shape[1:])], axis=0)
    lo = jnp.concatenate(
        [jnp.zeros((r + 1,) + cs.shape[1:], cs.dtype), cs[:-(r + 1)]],
        axis=0)
    o_ref[0] = (hi - lo).astype(o_ref.dtype)


def _box_w_kernel(x_ref, cnt_ref, o_ref, *, r, w):
    """Border-truncated window SUM along W, then divide by window count."""
    x = x_ref[0].astype(jnp.float32)                    # (th, W, C)
    if r >= w - 1:
        total = jnp.sum(x, axis=1, keepdims=True)
        o_ref[0] = (jnp.broadcast_to(total, x.shape)
                    / cnt_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
        return
    cs = _cumsum(x, 1, w)
    hi = jnp.concatenate(
        [cs[:, r:], jnp.broadcast_to(cs[:, -1:],
                                     cs.shape[:1] + (r,) + cs.shape[2:])],
        axis=1)
    lo = jnp.concatenate(
        [jnp.zeros(cs.shape[:1] + (r + 1,) + cs.shape[2:], cs.dtype),
         cs[:, :-(r + 1)]], axis=1)
    o_ref[0] = ((hi - lo) / cnt_ref[0].astype(jnp.float32)).astype(
        o_ref.dtype)


def _vec2(a):
    """1D param -> (1, n) for a TPU-friendly 2D VMEM block."""
    return jnp.asarray(a).reshape(1, -1)


@functools.lru_cache(maxsize=None)
def _window_count(h: int, w: int, r: int):
    def axis_count(n):
        i = np.arange(n)
        return np.minimum(i + r, n - 1) - np.maximum(i - r - 1, -1)
    # numpy (not jnp): this is lru_cached, and a jnp array created inside a
    # jit trace would leak a tracer into later traces
    cnt = np.outer(axis_count(h), axis_count(w)).astype(np.float32)
    return cnt[None, :, :, None]


def box_mean_pallas(x, radius: int, interpret: bool = False):
    """Border-truncated window mean == ops.filtering.box_filter, as two
    full-axis Pallas passes (cumsum in VMEM instead of XLA's log-N
    full-tensor passes)."""
    b, h, w, c = x.shape
    r = int(radius)
    # Mosaic: the block's second-to-last dim (W here) must be a multiple
    # of 8 or the full axis; keep the full-H column strip near ~1 MB
    wt = max(8 * (1024 * 1024 // max(h * c * 4 * 8, 1)), 8)
    wt = min(wt, w)
    while wt > 8 and w % wt:
        wt -= 8
    if w % wt:
        wt = w
    colsum = pl.pallas_call(
        functools.partial(_box_h_kernel, r=r, h=h),
        grid=(b, w // wt),
        in_specs=[pl.BlockSpec((1, h, wt, c), lambda bi, wi: (bi, 0, wi, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, wt, c), lambda bi, wi: (bi, 0, wi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
        interpret=interpret,
    )(x)
    th = max(min(512 * 1024 // max(w * c * 4, 1), h), 1)
    while h % th:
        th -= 1
    cnt = _window_count(h, w, r)
    out = pl.pallas_call(
        functools.partial(_box_w_kernel, r=r, w=w),
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, w, 1), lambda bi, hi: (0, hi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bi, hi: (bi, hi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(colsum, cnt)
    return out


def nafblock_fast(x, p: dict, tlc_window: int | None,
                  interpret: bool = False):
    """One NAFBlock forward through the fused kernels.

    ``p``: the block's converted flax params —
    norm1/{scale,bias}, conv1/{kernel,bias} (Dense (c,2c)),
    conv2/{kernel,bias} (dw conv (3,3,1,2c)), sca, conv3, norm2, conv4,
    conv5, beta, gamma. Matches NAFBlock.__call__ exactly.
    """
    b, h, w, c = x.shape
    tile_h = _rows_per_tile(w, c)
    while h % tile_h:
        tile_h -= 1
    n_tiles = h // tile_h

    dww = jnp.asarray(p["conv2"]["kernel"]).reshape(3, 3, 2 * c)
    # halo index maps in ROW units (block height 1): last row of the
    # previous tile / first row of the next, clamped at the edges (the
    # kernel zero-masks the clamped copies)
    prev_spec = pl.BlockSpec(
        (1, 1, w, c),
        lambda bi, i: (bi, jnp.maximum(i * tile_h - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    next_spec = pl.BlockSpec(
        (1, 1, w, c),
        lambda bi, i: (bi, jnp.minimum((i + 1) * tile_h, h - 1), 0, 0),
        memory_space=pltpu.VMEM)
    g = pl.pallas_call(
        functools.partial(_k1_kernel, tile_h=tile_h, w=w, c=c,
                          n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda bi, i: (bi, i, 0, 0),
                         memory_space=pltpu.VMEM),          # x tile
            prev_spec, next_spec,
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),          # ln scale
            pl.BlockSpec((1, c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),          # ln bias
            pl.BlockSpec((c, 2 * c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),          # w1
            pl.BlockSpec((1, 2 * c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),          # b1
            pl.BlockSpec((3, 3, 2 * c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),          # dw w
            pl.BlockSpec((1, 2 * c), lambda bi, i: (0, 0),
                         memory_space=pltpu.VMEM),          # dw b
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c),
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, x, x, _vec2(p["norm1"]["scale"]), _vec2(p["norm1"]["bias"]),
      jnp.asarray(p["conv1"]["kernel"]), _vec2(p["conv1"]["bias"]),
      dww, _vec2(p["conv2"]["bias"]))

    if tlc_window is None:
        pooled = jnp.mean(g, axis=(1, 2), keepdims=True)
        pooled_spatial = False
        pool_spec = pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        pooled = box_mean_pallas(g, tlc_window // 2, interpret=interpret)
        pooled_spatial = True
        pool_spec = pl.BlockSpec((1, tile_h, w, c),
                                 lambda bi, i: (bi, i, 0, 0),
                                 memory_space=pltpu.VMEM)

    blk = lambda: pl.BlockSpec((1, tile_h, w, c),   # noqa: E731
                               lambda bi, i: (bi, i, 0, 0),
                               memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda bi, i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda bi, i: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_k2_kernel, tile_h=tile_h, w=w, c=c,
                          pooled_spatial=pooled_spatial),
        grid=(b, n_tiles),
        in_specs=[
            blk(), blk(), pool_spec,
            mat(c, c), vec(c),                  # sca
            mat(c, c), vec(c),                  # conv3
            vec(c),                             # beta
            vec(c), vec(c),                     # norm2
            mat(c, 2 * c), vec(2 * c),          # conv4
            mat(c, c), vec(c),                  # conv5
            vec(c),                             # gamma
        ],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, g, pooled,
      jnp.asarray(p["sca"]["kernel"]), _vec2(p["sca"]["bias"]),
      jnp.asarray(p["conv3"]["kernel"]), _vec2(p["conv3"]["bias"]),
      _vec2(p["beta"]),
      _vec2(p["norm2"]["scale"]), _vec2(p["norm2"]["bias"]),
      jnp.asarray(p["conv4"]["kernel"]), _vec2(p["conv4"]["bias"]),
      jnp.asarray(p["conv5"]["kernel"]), _vec2(p["conv5"]["bias"]),
      _vec2(p["gamma"]))
    return out


def nafnet_fast_apply(variables, x, width: int = 32,
                      enc_blk_nums=(2, 2, 4, 8), middle_blk_num: int = 12,
                      dec_blk_nums=(2, 2, 2, 2), tlc_window: int | None = None,
                      interpret: bool = False):
    """Full NAFNet forward with fused NAFBlock kernels; the macro
    structure (intro/down/up/ending convs, pixel shuffle, skips) stays in
    XLA. Numerically equal to NAFNetModule.apply (tests assert it)."""
    from enhax.nn.layers import pixel_shuffle

    params = variables["params"] if "params" in variables else variables

    def conv(name, y, stride=1):
        p = params[name]
        k = jnp.asarray(p["kernel"])
        out = jax.lax.conv_general_dilated(
            y, k.astype(y.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "bias" in p:
            out = out + jnp.asarray(p["bias"]).astype(y.dtype)
        return out

    def dense(name, y):
        p = params[name]
        out = y @ jnp.asarray(p["kernel"]).astype(y.dtype)
        if "bias" in p:
            out = out + jnp.asarray(p["bias"]).astype(y.dtype)
        return out

    inp = x
    y = conv("intro", x)
    skips = []
    c = width
    for i, n in enumerate(enc_blk_nums):
        for j in range(n):
            y = nafblock_fast(y, params[f"enc{i}_{j}"], tlc_window,
                              interpret=interpret)
        skips.append(y)
        p = params[f"down{i}"]
        y = jax.lax.conv_general_dilated(
            y, jnp.asarray(p["kernel"]).astype(y.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.asarray(p["bias"]).astype(y.dtype)
        c *= 2
    for j in range(middle_blk_num):
        y = nafblock_fast(y, params[f"mid_{j}"], tlc_window,
                          interpret=interpret)
    for i, n in enumerate(dec_blk_nums):
        y = dense(f"up{i}", y)
        y = pixel_shuffle(y, 2)
        c //= 2
        y = y + skips[-(i + 1)]
        for j in range(n):
            y = nafblock_fast(y, params[f"dec{i}_{j}"], tlc_window,
                              interpret=interpret)
    out = conv("ending", y)
    return {"enhanced": out + inp}
