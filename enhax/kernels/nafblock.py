"""Tile-resident Pallas kernels for the NAFNet block.

The r2 bench showed heavy restorers at 5-20% MFU: XLA runs each of the
~10 ops per NAFBlock as a separate HBM round-trip, and its TPU conv op
handles small channel counts badly (docs/PERF.md round-3 probes: 1x1 conv
C=32 at 0.96 TF/s vs 174 TF/s matmul peak; dw3x3 at ~7 ms full-res).
These kernels keep one row-tile's activation chain in VMEM across the
block (SURVEY.md §5.7 / r2 VERDICT #1):

  K1: LayerNorm -> 1x1 (c->2c) -> depthwise 3x3 -> SimpleGate      [halo 1]
  box: TLC local mean via enhax.kernels.box carry-cumsum kernels
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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _rows_per_tile(w: int, c: int, n_bufs: int = 7,
                   budget_mb: int = 72) -> int:
    """Row tile sized against the raised Mosaic VMEM limit (the r2 value
    budgeted only 7 MB and produced 2-row tiles at stage-0 shapes — 368
    sequential grid steps of pure dispatch overhead).

    ``n_bufs`` counts live row-sized f32 buffers including double-buffered
    I/O blocks; every buffer is lane-padded to a multiple of 128."""
    lane_c = ((2 * c + 127) // 128) * 128
    row_bytes = w * lane_c * 4
    th = max(int((budget_mb * 2 ** 20) // (n_bufs * row_bytes)), 1)
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
    cdt = w1.dtype  # matmul operand dtype: params' dtype (bf16 on the MXU
    # native path, f32 in the f32 parity tests); accumulation is always f32
    prev = xprev_ref[0].astype(f32)
    nxt = xnext_ref[0].astype(f32)
    xb = jnp.concatenate([prev, x_ref[0].astype(f32), nxt], axis=0)
    y = _layer_norm(xb, ln_s[0].astype(jnp.float32),
                    ln_b[0].astype(jnp.float32))
    y = jnp.dot(y.astype(cdt).reshape(-1, c), w1[:],
                preferred_element_type=jnp.float32)
    y = (y + b1[0].astype(jnp.float32)).reshape(tile_h + 2, w, 2 * c)
    # The dwconv's SAME zero padding zeros its INPUT rows beyond the image,
    # i.e. AFTER LN + 1x1 — zeroing the raw x halo instead would feed the
    # taps LN(0)@W1+b1 and corrupt the first/last image rows. The halo
    # index maps clamp at the edges, so the rows exist; mask them here.
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0)
    edge = ((i == 0) & (row == 0)) | ((i == n_tiles - 1) & (row == tile_h + 1))
    y = jnp.where(edge, 0.0, y)
    dwwf = dww[:].astype(jnp.float32)                   # (3, 3, 2c)
    # W (sublane) shifts HOISTED out of the tap loop: materialize each dx
    # plane once over all tile_h+2 rows, then the nine taps read contiguous
    # row-offset views. Per-tap shifted slices cost a Mosaic shifted copy
    # each — measured at 57% of the Restormer L1 block time before the
    # hoist (run/probe_restormer_ablate.py, run/probe_dw_hoist.py: 1.28x).
    acc = jnp.zeros((tile_h, w, 2 * c), jnp.float32)
    for dx in (-1, 0, 1):
        # kernel tap (dh, dx+1) multiplies input at offset (dh-1, dx):
        # shift +1 brings in[w-1] to out[w]
        plane = _shift_w(y, -dx)
        for dh in (0, 1, 2):
            acc = acc + plane[dh:dh + tile_h] * dwwf[dh, dx + 1]
    acc = acc + dwb[0].astype(jnp.float32)
    g = acc[..., :c] * acc[..., c:]
    g_out[0] = g.astype(g_out.dtype)


def _k2_kernel(x_ref, g_ref, pool_ref, sca_w, sca_b, w3, b3, beta,
               ln2_s, ln2_b, w4, b4, w5, b5, gamma, out_ref, *,
               tile_h, w, c, pooled_spatial):
    """SCA apply + 1x1 + residual + LN2 + gated FFN for one row tile."""
    f32 = jnp.float32
    cdt = w3.dtype  # see _k1_kernel: operands in param dtype, f32 accum
    x = x_ref[0].astype(f32)
    g = g_ref[0].astype(f32)
    pool = pool_ref[0]
    att = jnp.dot(pool.astype(cdt).reshape(-1, c), sca_w[:],
                  preferred_element_type=f32) + sca_b[0].astype(f32)
    if pooled_spatial:
        att = att.reshape(tile_h, w, c)
    else:
        att = att.reshape(1, 1, c)
    y = g * att
    y = jnp.dot(y.astype(cdt).reshape(-1, c), w3[:],
                preferred_element_type=f32) + b3[0].astype(f32)
    x1 = x + y.reshape(tile_h, w, c) * beta[0].astype(f32)
    y = _layer_norm(x1, ln2_s[0].astype(f32), ln2_b[0].astype(f32))
    y = jnp.dot(y.astype(cdt).reshape(-1, c), w4[:],
                preferred_element_type=f32) + b4[0].astype(f32)
    y = y.reshape(tile_h, w, 2 * c)
    y = y[..., :c] * y[..., c:]
    y = jnp.dot(y.astype(cdt).reshape(-1, c), w5[:],
                preferred_element_type=f32) + b5[0].astype(f32)
    out = x1 + y.reshape(tile_h, w, c) * gamma[0].astype(f32)
    out_ref[0] = out.astype(out_ref.dtype)


def _vec2(a):
    """1D param -> (1, n) for a TPU-friendly 2D VMEM block."""
    return jnp.asarray(a).reshape(1, -1)


def k1_apply(x, p: dict, interpret: bool = False):
    """K1 alone: LN1 -> 1x1 -> dw3x3 -> SimpleGate, returns g."""
    b, h, w, c = x.shape
    tile_h = _rows_per_tile(w, c, n_bufs=7)
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(x, x, x, _vec2(p["norm1"]["scale"]), _vec2(p["norm1"]["bias"]),
      jnp.asarray(p["conv1"]["kernel"]), _vec2(p["conv1"]["bias"]),
      dww, _vec2(p["conv2"]["bias"]))
    return g


def k2_apply(x, g, pooled, p: dict, pooled_spatial: bool,
             interpret: bool = False):
    """K2 alone: SCA apply -> 1x1 -> residual -> LN2 -> gated FFN."""
    b, h, w, c = x.shape
    tile_h = _rows_per_tile(w, c, n_bufs=10)
    while h % tile_h:
        tile_h -= 1
    n_tiles = h // tile_h
    if pooled_spatial:
        pool_spec = pl.BlockSpec((1, tile_h, w, c),
                                 lambda bi, i: (bi, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        pool_spec = pl.BlockSpec((1, 1, 1, c), lambda bi, i: (bi, 0, 0, 0),
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=110 * 2**20),
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


def nafblock_fast(x, p: dict, tlc_window: int | None,
                  interpret: bool = False):
    """One NAFBlock forward through the fused kernels: K1, then the TLC
    local mean (MXU banded-matmul box) or global mean, then K2.

    ``p``: the block's converted flax params —
    norm1/{scale,bias}, conv1/{kernel,bias} (Dense (c,2c)),
    conv2/{kernel,bias} (dw conv (3,3,1,2c)), sca, conv3, norm2, conv4,
    conv5, beta, gamma. Matches NAFBlock.__call__ exactly.
    """
    from enhax.kernels.box import box_mean_fast

    g = k1_apply(x, p, interpret=interpret)
    if tlc_window is None:
        pooled = jnp.mean(g, axis=(1, 2), keepdims=True)
        pooled_spatial = False
    else:
        pooled = box_mean_fast(g, tlc_window // 2, interpret=interpret)
        pooled_spatial = True
    return k2_apply(x, g, pooled, p, pooled_spatial, interpret=interpret)


def nafblock_xla(x, p: dict, tlc_window: int | None):
    """NAFBlock.__call__ in plain jnp (1x1s as Dense matmuls, grouped lax
    dw conv, banded-matmul box for TLC). The on-device probes
    (run/probe_nafblock.py) show XLA beats the row-tile Pallas kernels at
    the deep stages (C >= 128, small spatial: full-lane matmuls fuse well,
    while the Pallas grid pays fixed dispatch per tile) — the hybrid
    nafnet_fast_apply uses this above ``fused_max_c``."""
    from enhax.kernels.box import box_mean_fast

    f32 = jnp.float32
    c = x.shape[-1]

    def ln(y, q):
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mean) ** 2, axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + LN_EPS)
        return y * q["scale"].astype(f32) + q["bias"].astype(f32)

    def dense(y, q):
        k = jnp.asarray(q["kernel"])
        out = jnp.dot(y.astype(k.dtype), k, preferred_element_type=f32)
        return out + q["bias"].astype(f32)

    xf = x.astype(f32)
    y = ln(xf, p["norm1"])
    y = dense(y, p["conv1"])
    # dw 3x3 with the same channel-dependent lowering as nn.layers.DWConv3x3:
    # shifted adds win only at small C (probes at C=32); at the 2c >= 256
    # channels this XLA path actually runs at (the hybrid routes C <= 64 to
    # the Pallas blocks), the padded copy + nine strided reads LOSE to the
    # grouped conv op — the same crossover that regressed Restormer
    # (docs/PERF.md round-3 follow-up).
    from enhax.nn.layers import DWConv3x3, dwconv3x3_shift
    k2w = jnp.asarray(p["conv2"]["kernel"]).astype(f32)  # (3, 3, 1, 2c)
    if y.shape[-1] <= DWConv3x3.SHIFT_MAX_C:
        y = dwconv3x3_shift(y, k2w)
    else:
        y = jax.lax.conv_general_dilated(
            y, k2w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=y.shape[-1])
    y = y + p["conv2"]["bias"].astype(f32)
    y = y[..., :c] * y[..., c:]
    if tlc_window is None:
        pooled = jnp.mean(y, axis=(1, 2), keepdims=True)
    else:
        pooled = box_mean_fast(y, tlc_window // 2)
    att = dense(pooled, p["sca"])
    y = y * att
    y = dense(y, p["conv3"])
    x1 = xf + y * p["beta"].astype(f32)

    y = ln(x1, p["norm2"])
    y = dense(y, p["conv4"])
    y = y[..., :c] * y[..., c:]
    y = dense(y, p["conv5"])
    out = x1 + y * p["gamma"].astype(f32)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nafblock_fused(x, p: dict, tlc_window: int | None = None,
                   interpret: bool = False):
    """Differentiable fused NAFBlock: Pallas forward, XLA backward.

    The Pallas row-tile kernels (K1/K2 + banded-matmul TLC box) have no
    native transpose; the backward rematerializes through
    ``nafblock_xla`` — the mathematically identical block math with the
    conv1x1/dwconv lowerings (so the bwd graph also runs matmul-shaped
    on the MXU). This closes r3's "kernels define no VJP, training
    forgoes them" gap (PERF.md): the fast path is now usable under
    ``jax.grad``, at remat cost (one extra forward in the bwd), the
    standard trade for fused inference kernels.
    """
    return nafblock_fast(x, p, tlc_window, interpret=interpret)


def _nafblock_fused_fwd(x, p, tlc_window, interpret):
    return nafblock_fast(x, p, tlc_window, interpret=interpret), (x, p)


def _nafblock_fused_bwd(tlc_window, interpret, res, ct):
    x, p = res
    _, vjp = jax.vjp(lambda xx, pp: nafblock_xla(xx, pp, tlc_window), x, p)
    return vjp(ct)


nafblock_fused.defvjp(_nafblock_fused_fwd, _nafblock_fused_bwd)


def nafnet_fast_apply(variables, x, width: int = 32,
                      enc_blk_nums=(2, 2, 4, 8), middle_blk_num: int = 12,
                      dec_blk_nums=(2, 2, 2, 2), tlc_window: int | None = None,
                      fused_max_c: int = 64, interpret: bool = False):
    """Full NAFNet forward, hybrid per stage: fused Pallas NAFBlocks where
    XLA's small-channel conv op underperforms (C <= ``fused_max_c``; probes
    in run/probe_nafblock.py: 1.4x at stage-0 C=32), plain-XLA block math
    at the deep stages (full-lane matmuls, where the Pallas grid's fixed
    dispatch loses). The macro structure (intro/down/up/ending convs,
    pixel shuffle, skips) stays in XLA. Numerically equal to
    NAFNetModule.apply (tests assert it)."""
    from enhax.nn.layers import pixel_shuffle

    params = variables["params"] if "params" in variables else variables

    def block(y, p):
        if y.shape[-1] <= fused_max_c:
            # custom-vjp wrapper: Pallas fwd, XLA bwd — the fast apply is
            # differentiable end to end (usable as a training forward)
            return nafblock_fused(y, p, tlc_window, interpret)
        return nafblock_xla(y, p, tlc_window)

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
    for i, n in enumerate(enc_blk_nums):
        for j in range(n):
            y = block(y, params[f"enc{i}_{j}"])
        skips.append(y)
        p = params[f"down{i}"]
        y = jax.lax.conv_general_dilated(
            y, jnp.asarray(p["kernel"]).astype(y.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + jnp.asarray(p["bias"]).astype(y.dtype)
    for j in range(middle_blk_num):
        y = block(y, params[f"mid_{j}"])
    for i, n in enumerate(dec_blk_nums):
        y = dense(f"up{i}", y)
        y = pixel_shuffle(y, 2)
        y = y + skips[-(i + 1)]
        for j in range(n):
            y = block(y, params[f"dec{i}_{j}"])
    out = conv("ending", y)
    return {"enhanced": out + inp}
