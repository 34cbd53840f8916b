"""Fused Pallas RestormerBlock: MDTA + GDFN in two kernels + tiny glue.

The serving probe (run/probe_restormer_ops.py, corrected for the relay's
~29 ms per-call RPC) shows each RestormerBlock pays ~15 XLA ops of
HBM-scale traffic — LN, qkv 1x1, dwconv, attention einsums, projection,
LN2, GDFN in/dw/gate/out — touching the (B, H, W, C..5.3C) activations
~60 channel-widths per block, while the information flow needs only:

    read x -> write qkv -> read x,v -> write out        (~8 channel-widths)

This module fuses the block the NAFBlock way (enhax/kernels/nafblock.py:
row-tiled grid, halo rows via clamped index maps, shifted-adds dwconv,
f32 accumulation):

  R1: LN1 -> qkv 1x1 -> dw3x3, emitting qkv PLUS the per-head raw gram
      q^T k and per-channel sum-of-squares, accumulated across row tiles.
      MDTA's pixel-axis l2 normalization FACTORIZES out of the gram:
      (q/||q_c||)^T (k/||k_d||) = (q^T k)[c,d] / (||q_c|| ||k_d||), so the
      C x C attention logits come out of the same pass that computes qkv —
      no second read of the (B,H,W,3C) tensor, no head-transposes.
  glue (XLA, C x C-sized): logits / norms * temperature -> softmax.
  R2: attn @ v -> project_out -> +x -> LN2 -> GDFN (1x1 -> dw3x3 ->
      gelu-gate -> 1x1) -> +residual, one pass with halo recompute.

Reference: restormer_arch.py TransformerBlock (Attention + FeedForward);
flax twin: enhax/models/multitask/restormer.py (MDTA/GDFN/RestormerBlock).
Parity: tests/test_kernels_restormer.py (interpret-mode vs the flax
module, f32).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5


def _rows_per_tile(w: int, c_widest: int, n_bufs: int = 8,
                   budget_mb: int = 72) -> int:
    """Row tile sized against the Mosaic VMEM budget (see nafblock.py)."""
    lane_c = ((c_widest + 127) // 128) * 128
    row_bytes = w * lane_c * 4
    th = max(int((budget_mb * 2 ** 20) // (n_bufs * row_bytes)), 1)
    return int(min(th, 64))


def _gelu_erf(x):
    """Exact (erf-based) gelu, matching torch F.gelu / jax.nn.gelu
    approximate=False. Mosaic has no erf/erfc primitive, so erf is the
    Abramowitz-Stegun 7.1.26 rational approximation (|err| <= 1.5e-7,
    i.e. f32-eps-exact)."""
    z = x * 0.7071067811865476
    a = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = jnp.sign(z) * (1.0 - poly * jnp.exp(-a * a))
    return 0.5 * x * (1.0 + erf)


def _layer_norm(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + LN_EPS) * scale + bias


def _shift_w(x, dw):
    """Shift along W (axis -2) with zero fill (SAME conv padding)."""
    if dw == 0:
        return x
    zeros = jnp.zeros_like(x[:, :1])
    if dw > 0:
        return jnp.concatenate([zeros, x[:, :-1]], axis=1)
    return jnp.concatenate([x[:, 1:], zeros], axis=1)


def _dw3x3_valid(y, dwwf, tile_h, mask_rows):
    """Shifted-adds depthwise 3x3 over a (tile_h+2, w, C) halo'd tensor.

    ``mask_rows`` zeroes the dw INPUT rows that lie beyond the image
    (SAME zero padding applies after the pointwise producer — zeroing raw
    x instead would feed the taps LN(0)@W, see nafblock._k1_kernel).

    Tap schedule: the W (sublane) shift is HOISTED — each dx plane is
    materialized once and the nine taps read contiguous row-offset views
    of it. A per-tap (dh, dx) slice of a W-padded tensor carries a
    sublane offset, which Mosaic lowers to a shifted copy per tap; the
    component-ablation probe measured those nine copies at 57% of the
    L1-dec block time, and hoisting them 3x fewer is a 1.28x whole-block
    win (run/probe_restormer_ablate.py, run/probe_dw_hoist.py)."""
    y = jnp.where(mask_rows, 0.0, y)
    zcol = jnp.zeros_like(y[:, :1])
    planes = (jnp.concatenate([zcol, y[:, :-1]], axis=1),  # input col w-1
              y,
              jnp.concatenate([y[:, 1:], zcol], axis=1))   # input col w+1
    acc = None
    for dx in (0, 1, 2):
        # tap (dh, dx) multiplies input at offset (dh-1, dx-1)
        pp = planes[dx]
        for dh in (0, 1, 2):
            t = pp[dh:dh + tile_h] * dwwf[dh, dx]
            acc = t if acc is None else acc + t
    return acc


def _dw9_inputs(t, tile_h):
    """im2col for a fused (1x1 -> dw3x3): nine tap views of the 1x1 INPUT.

    ``t``: (tile_h+2, w, c). Returns (tile_h, w, 9c) with lane blocks
    ordered (dh, dx)-major to match ``_fold_dw_into_pointwise``. With a
    bias-free pointwise producer W and per-channel dw taps k[dh,dx,o],

        dw3x3(t @ W)[., o] = concat_taps(t) @ [W[i,o] * k[dh,dx,o]]

    exactly, so the nine-tap accumulation rides the MXU as one matmul
    with K = 9c instead of nine VPU FMA passes over the (wider) output."""
    zcol = jnp.zeros_like(t[:, :1])
    planes = (jnp.concatenate([zcol, t[:, :-1]], axis=1),  # input col w-1
              t,
              jnp.concatenate([t[:, 1:], zcol], axis=1))   # input col w+1
    return jnp.concatenate(
        [planes[dx][dh:dh + tile_h] for dh in (0, 1, 2) for dx in (0, 1, 2)],
        axis=-1)


def _fold_dw_into_pointwise(w_pt, dwk):
    """(c_in, c_out) pointwise @ (3, 3, c_out) dw taps -> (9*c_in, c_out).

    Row block (dh*3+dx)*c_in + i carries W[i, o] * k[dh, dx, o]; pairs
    with ``_dw9_inputs``'s lane order."""
    c_in, c_out = w_pt.shape
    w9 = w_pt[None, None] * dwk[:, :, None, :]          # (3, 3, c_in, c_out)
    return w9.reshape(9 * c_in, c_out)


def _edge_mask(i, tile_h, n_tiles):
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2, 1, 1), 0)
    return ((i == 0) & (row == 0)) | \
        ((i == n_tiles - 1) & (row == tile_h + 1))


def _r1_kernel(x_ref, xprev_ref, xnext_ref, ln_s, ln_b, wqkv, dwk,
               v_out, gram_out, qss_out, kss_out, *, tile_h, w, c, heads,
               n_tiles, dw_mxu=False):
    """LN1 -> qkv 1x1 -> dw3x3; accumulate per-head gram + channel norms.

    Only V leaves the kernel: q and k are fully consumed by the gram and
    norm accumulators here, so writing them back (and re-reading them in
    R2) would be 4 channel-widths of pure waste per block.

    ``dw_mxu``: the dw3x3 is folded into the qkv matmul (``wqkv`` then
    carries the (9c, 3c) tap-scaled weights from
    ``_fold_dw_into_pointwise``; ``dwk`` is ignored) — nine MXU K-blocks
    instead of nine VPU FMA passes over the 3c-wide output."""
    i = pl.program_id(1)
    f32 = jnp.float32
    # VPU work stays f32: an on-chip A/B measured bf16 in-kernel
    # elementwise 1.6x SLOWER (Mosaic packs/unpacks bf16 around f32 ALUs),
    # so only the MXU operands keep the param dtype (bf16 at serving)
    cdt = wqkv.dtype
    hd = c // heads
    prev = xprev_ref[0].astype(f32)
    nxt = xnext_ref[0].astype(f32)
    xb = jnp.concatenate([prev, x_ref[0].astype(f32), nxt], axis=0)
    y = _layer_norm(xb, ln_s[0].astype(f32), ln_b[0].astype(f32))
    if dw_mxu:
        # SAME zero padding applies after the (bias-free) pointwise, so
        # zeroing the out-of-image LN rows pre-matmul is exact
        y = jnp.where(_edge_mask(i, tile_h, n_tiles), 0.0, y)
        t9 = _dw9_inputs(y.astype(cdt), tile_h)
        qkv = jnp.dot(t9.reshape(-1, 9 * c), wqkv[:],
                      preferred_element_type=f32).reshape(tile_h, w, 3 * c)
    else:
        y = jnp.dot(y.astype(cdt).reshape(-1, c), wqkv[:],
                    preferred_element_type=f32).reshape(tile_h + 2, w, 3 * c)
        qkv = _dw3x3_valid(y, dwk[:].astype(f32), tile_h,
                           _edge_mask(i, tile_h, n_tiles))
    v_out[0] = qkv[..., 2 * c:].astype(v_out.dtype)

    flat = qkv.reshape(-1, 3 * c)
    q = flat[:, :c]
    k = flat[:, c:2 * c]
    # per-head raw gram q^T k, accumulated across row tiles (the pixel-axis
    # normalization divides out in the glue)
    grams = []
    for hh in range(heads):
        qh = q[:, hh * hd:(hh + 1) * hd]
        kh = k[:, hh * hd:(hh + 1) * hd]
        grams.append(jax.lax.dot_general(
            qh.astype(cdt), kh.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=f32))
    gram = jnp.concatenate(grams, axis=0)          # (heads*hd, hd)
    # q/k channel sum-of-squares as TWO (1, c) outputs: a stacked (2, c)
    # write trips Mosaic's "offset mismatch on non-concat dimension" on
    # the lane-offset copies jnp.stack produces
    qss = jnp.sum(q * q, axis=0).reshape(1, c)
    kss = jnp.sum(k * k, axis=0).reshape(1, c)

    @pl.when(i == 0)
    def _init():
        gram_out[0] = gram
        qss_out[0] = qss
        kss_out[0] = kss

    @pl.when(i > 0)
    def _accum():
        gram_out[0] = gram_out[0] + gram
        qss_out[0] = qss_out[0] + qss
        kss_out[0] = kss_out[0] + kss


def _r2_kernel(x_ref, xprev_ref, xnext_ref, v_ref, vprev_ref,
               vnext_ref, attn_ref, wproj, ln2_s, ln2_b, win, dwk2,
               wout, out_ref, *, tile_h, w, c, heads, hidden, n_tiles,
               dw_mxu=False):
    """attn@v -> proj -> +x -> LN2 -> GDFN -> +residual for one row tile.

    The GDFN dwconv needs halo rows of x1 = x + proj(attn@v), so the
    attention-apply and projection run over tile_h+2 rows (halo recompute,
    same trade as nafblock's K1)."""
    i = pl.program_id(1)
    f32 = jnp.float32
    cdt = wproj.dtype  # see _r1_kernel: VPU in f32, MXU operands in cdt
    hd = c // heads
    xb = jnp.concatenate([xprev_ref[0], x_ref[0], xnext_ref[0]],
                         axis=0).astype(f32)
    vb = jnp.concatenate([vprev_ref[0], v_ref[0], vnext_ref[0]],
                         axis=0)
    attn = attn_ref[0]                             # (heads*hd, hd)
    vflat = vb.reshape(-1, c)
    outs = []
    for hh in range(heads):
        vh = vflat[:, hh * hd:(hh + 1) * hd]
        ah = attn[hh * hd:(hh + 1) * hd]           # (hd_c, hd_d)
        # out[p, c] = sum_d attn[c, d] * v[p, d]
        outs.append(jax.lax.dot_general(
            vh.astype(cdt), ah.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=f32))
    att_out = jnp.concatenate(outs, axis=1)        # (P2, c)
    proj = jnp.dot(att_out.astype(cdt), wproj[:],
                   preferred_element_type=f32)
    x1 = xb + proj.reshape(tile_h + 2, w, c)

    y = _layer_norm(x1, ln2_s[0].astype(f32), ln2_b[0].astype(f32))
    if dw_mxu:
        # see _r1_kernel: taps folded into ``win`` (9c, 2*hidden)
        y = jnp.where(_edge_mask(i, tile_h, n_tiles), 0.0, y)
        t9 = _dw9_inputs(y.astype(cdt), tile_h)
        y = jnp.dot(t9.reshape(-1, 9 * c), win[:],
                    preferred_element_type=f32).reshape(tile_h, w,
                                                        2 * hidden)
    else:
        y = jnp.dot(y.astype(cdt).reshape(-1, c), win[:],
                    preferred_element_type=f32).reshape(tile_h + 2, w,
                                                        2 * hidden)
        y = _dw3x3_valid(y, dwk2[:].astype(f32), tile_h,
                         _edge_mask(i, tile_h, n_tiles))
    g = _gelu_erf(y[..., :hidden]) * y[..., hidden:]
    out = jnp.dot(g.astype(cdt).reshape(-1, hidden), wout[:],
                  preferred_element_type=f32).reshape(tile_h, w, c)
    out_ref[0] = (x1[1:tile_h + 1] + out).astype(out_ref.dtype)


def _vec2(a):
    return jnp.asarray(a).reshape(1, -1)


def _halo_specs(tile_h, h, w, c):
    prev = pl.BlockSpec((1, 1, w, c),
                        lambda bi, i: (bi, jnp.maximum(i * tile_h - 1, 0),
                                       0, 0),
                        memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, 1, w, c),
                       lambda bi, i: (bi, jnp.minimum((i + 1) * tile_h,
                                                      h - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    return prev, nxt


def restormer_block_fast(x, p: dict, heads: int, expansion: float = 2.66,
                         interpret: bool = False, tile_h: int | None = None,
                         dw_mxu: bool = False):
    """One RestormerBlock through the fused kernels (R1 -> glue -> R2).

    ``p``: the block's flax params — norm1/{scale,bias},
    attn/{temperature, qkv/kernel (C,3C), qkv_dw/kernel (3,3,1,3C),
    project_out/kernel (C,C)}, norm2, ffn/{project_in/kernel (C,2h),
    dwconv/kernel (3,3,1,2h), project_out/kernel (h,C)}. Matches
    RestormerBlock.__call__ exactly (no biases, plain residuals).

    ``dw_mxu``: fold both dw3x3s into their producing 1x1 matmuls
    (9x the pointwise FLOPs, riding the MXU, instead of nine VPU FMA
    passes over the wider dw output; exact because the producers are
    bias-free). A/B on chip: run/probe_dw_mxu.py.
    """
    b, h, w, c = x.shape
    hd = c // heads
    hidden = int(c * expansion)
    widest = max(3 * c, 2 * hidden, 9 * c if dw_mxu else 0)
    if tile_h is None:
        tile_h = _rows_per_tile(w, widest, n_bufs=8)
    while h % tile_h:
        tile_h -= 1
    n_tiles = h // tile_h

    blk = lambda cc: pl.BlockSpec((1, tile_h, w, cc),   # noqa: E731
                                  lambda bi, i: (bi, i, 0, 0),
                                  memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((1, n), lambda bi, i: (0, 0),  # noqa: E731
                                 memory_space=pltpu.VMEM)
    mat = lambda m, n: pl.BlockSpec((m, n), lambda bi, i: (0, 0),  # noqa: E731
                                    memory_space=pltpu.VMEM)
    prev_x, next_x = _halo_specs(tile_h, h, w, c)

    pa = p["attn"]
    f32 = jnp.float32
    wqkv = jnp.asarray(pa["qkv"]["kernel"])
    dwk1 = jnp.asarray(pa["qkv_dw"]["kernel"]).reshape(3, 3, 3 * c)
    if dw_mxu:
        wqkv = _fold_dw_into_pointwise(
            wqkv.astype(f32), dwk1.astype(f32)).astype(wqkv.dtype)
    v, gram, qss, kss = pl.pallas_call(
        functools.partial(_r1_kernel, tile_h=tile_h, w=w, c=c, heads=heads,
                          n_tiles=n_tiles, dw_mxu=dw_mxu),
        grid=(b, n_tiles),
        in_specs=[
            blk(c), prev_x, next_x,
            vec(c), vec(c),                       # norm1
            mat(9 * c if dw_mxu else c, 3 * c),   # qkv (tap-folded if mxu)
            pl.BlockSpec((3, 3, 3 * c), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # qkv_dw
        ],
        out_specs=[
            blk(c),
            pl.BlockSpec((1, heads * hd, hd), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
            jax.ShapeDtypeStruct((b, heads * hd, hd), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # row tiles of one batch element must run in order: gram and
            # sumsq accumulate into the same output block
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(x, x, x, _vec2(p["norm1"]["scale"]), _vec2(p["norm1"]["bias"]),
      wqkv, dwk1)

    # glue: logits = gram / (||q_c|| ||k_d||) * temperature -> softmax.
    # norms are over the pixel axis, so they factor out of the gram —
    # max(.,1e-6) matches the flax MDTA's clamp.
    gram = gram.reshape(b, heads, hd, hd)
    qn = jnp.maximum(jnp.sqrt(qss).reshape(b, heads, hd, 1), 1e-6)
    kn = jnp.maximum(jnp.sqrt(kss).reshape(b, heads, 1, hd), 1e-6)
    temp = jnp.asarray(pa["temperature"],
                       jnp.float32).reshape(1, heads, 1, 1)
    attn = jax.nn.softmax(gram / (qn * kn) * temp, axis=-1)
    attn = attn.reshape(b, heads * hd, hd).astype(x.dtype)

    win = jnp.asarray(p["ffn"]["project_in"]["kernel"])
    dwk2 = jnp.asarray(p["ffn"]["dwconv"]["kernel"]).reshape(3, 3, 2 * hidden)
    if dw_mxu:
        win = _fold_dw_into_pointwise(
            win.astype(f32), dwk2.astype(f32)).astype(win.dtype)
    out = pl.pallas_call(
        functools.partial(_r2_kernel, tile_h=tile_h, w=w, c=c, heads=heads,
                          hidden=hidden, n_tiles=n_tiles, dw_mxu=dw_mxu),
        grid=(b, n_tiles),
        in_specs=[
            blk(c), prev_x, next_x,
            blk(c), prev_x, next_x,
            pl.BlockSpec((1, heads * hd, hd), lambda bi, i: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            mat(c, c),                            # project_out
            vec(c), vec(c),                       # norm2
            mat(9 * c if dw_mxu else c, 2 * hidden),  # ffn in (tap-folded)
            pl.BlockSpec((3, 3, 2 * hidden), lambda bi, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),  # ffn dw
            mat(hidden, c),                       # ffn out
        ],
        out_specs=blk(c),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2**20),
        interpret=interpret,
    )(x, x, x, v, v, v, attn,
      jnp.asarray(pa["project_out"]["kernel"]),
      _vec2(p["norm2"]["scale"]), _vec2(p["norm2"]["bias"]),
      win, dwk2,
      jnp.asarray(p["ffn"]["project_out"]["kernel"]))
    return out


def restormer_fast_apply(variables, x, dim: int = 48,
                         num_blocks=(4, 6, 6, 8), num_refinement: int = 4,
                         heads=(1, 2, 4, 8), expansion: float = 2.66,
                         fused_min_hw: int = 32, interpret: bool = False):
    """Full Restormer forward with fused blocks at the large-spatial levels.

    Mirrors RestormerModule.__call__ (enhax/models/multitask/restormer.py)
    parameter-for-parameter; resampling convs and levels with spatial
    extent below ``fused_min_hw`` stay in XLA. On-chip at 256² serving
    chunks the fused path wins at EVERY level (min_hw=32: 5.23 MP/s vs
    4.97 at 64 and 2.52 flax, run/probe_restormer_fused.py), so the
    default fuses the 32×32 latent too.
    """
    params = variables["params"] if "params" in variables else variables

    def conv3x3(y, p, stride=1):
        k = jnp.asarray(p["kernel"])
        out = jax.lax.conv_general_dilated(
            y, k.astype(y.dtype), (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if "bias" in p:
            out = out + jnp.asarray(p["bias"]).astype(out.dtype)
        return out

    def block(y, name, n_heads):
        if min(y.shape[1], y.shape[2]) >= fused_min_hw:
            return restormer_block_fast(y, params[name], n_heads,
                                        expansion, interpret=interpret)
        # XLA fallback at small spatial: the flax module applied per-block
        from enhax.models.multitask.restormer import RestormerBlock
        mod = RestormerBlock(y.shape[-1], n_heads, expansion)
        return mod.apply({"params": params[name]}, y)

    from enhax.nn.layers import pixel_shuffle, pixel_unshuffle

    inp = x
    d = dim
    y = conv3x3(x, params["embed"])
    skips = []
    for lvl in range(3):
        for j in range(num_blocks[lvl]):
            y = block(y, f"enc{lvl}_{j}", heads[lvl])
        skips.append(y)
        y = conv3x3(y, params[f"down{lvl}"])
        y = pixel_unshuffle(y, 2)
    for j in range(num_blocks[3]):
        y = block(y, f"latent_{j}", heads[3])
    for lvl in reversed(range(3)):
        y = conv3x3(y, params[f"up{lvl}"])
        y = pixel_shuffle(y, 2)
        y = jnp.concatenate([y, skips[lvl]], axis=-1)
        if lvl != 0:
            k = jnp.asarray(params[f"reduce{lvl}"]["kernel"])
            y = jnp.dot(y, k.astype(y.dtype))
        for j in range(num_blocks[lvl]):
            y = block(y, f"dec{lvl}_{j}", heads[lvl])
    for j in range(num_refinement):
        y = block(y, f"refine_{j}", heads[0])
    out = conv3x3(y, params["output"])
    return {"enhanced": out + inp}
