"""A/B an MXU-reduction LayerNorm inside the fused RestormerBlock.

The post-hoist ablation (run/probe_restormer_ablate.py) prices the two
LayerNorms at 17.8% of the L1-dec block (1.44 ms of 8.12): VPU lane
reductions (mean/var over C lanes) + a ~5-op elementwise normalize.
This probe swaps _layer_norm for a variant that

  - computes sum(x) and sum(x^2) as (P,C)@(C,1) matmuls (MXU does the
    lane reduction; x^2 costs one VPU mul), and
  - normalizes in 3 elementwise ops:
    (x * rstd - mean * rstd) * scale + bias  with (P,1) row broadcasts.

Same math reassociated (one-pass variance at f32), so parity vs base is
checked at 2e-5 on the block output before timing.

Usage: python run/probe_ln_mxu.py [--hw 256] [--c 96]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def ln_mxu(x, scale, bias, eps):
    import jax
    import jax.numpy as jnp
    r, w, c = x.shape
    xf = x.reshape(-1, c)
    ones = jnp.ones((c, 1), jnp.float32)
    s1 = jax.lax.dot_general(xf, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(xf * xf, ones, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mean = s1 / c
    var = s2 / c - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    out = (xf * rstd - mean * rstd) * scale.reshape(1, c) \
        + bias.reshape(1, c)
    return out.reshape(r, w, c)


def main(argv):
    hw = int(argv[argv.index("--hw") + 1]) if "--hw" in argv else 256
    c = int(argv[argv.index("--c") + 1]) if "--c" in argv else 96
    heads = 1
    b = 15
    iters = 10

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import enhax.kernels.restormer_block as rb
    from enhax.models.multitask.restormer import RestormerBlock

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, c)), jnp.bfloat16)
    mod = RestormerBlock(c, heads)
    var = mod.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, hw, hw, c), jnp.float32))
    var = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, var)
    p = var["params"]

    def chained(fn, n):
        def body(_, y):
            return fn(y)
        return jax.jit(lambda y: jax.lax.fori_loop(0, n, body, y))

    def time_variant(name, patch):
        orig = rb._layer_norm
        if patch is not None:
            rb._layer_norm = patch
        try:
            f = jax.jit(lambda y: rb.restormer_block_fast(
                y, p, heads).astype(y.dtype))
            out = np.asarray(f(x), np.float32)
            loop = chained(lambda y: rb.restormer_block_fast(
                y, p, heads).astype(y.dtype), iters)
            # block_until_ready is a no-op through the axon relay; a
            # host-materialized scalar is the only real fence
            float(jnp.sum(loop(x)))
            t0 = time.perf_counter()
            float(jnp.sum(loop(x)))
            dt = time.perf_counter() - t0
        finally:
            rb._layer_norm = orig
        ms = dt / iters * 1e3
        print(json.dumps({"variant": name, "ms_per_block": round(ms, 2)}),
              flush=True)
        return out, ms

    base_out, base_ms = time_variant("base", None)
    mxu_out, mxu_ms = time_variant(
        "ln_mxu", lambda xx, s, bb: ln_mxu(xx, s, bb, rb.LN_EPS))
    diff = float(np.max(np.abs(base_out - mxu_out)))
    print(json.dumps({"max_abs_diff": diff,
                      "speedup": round(base_ms / mxu_ms, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
