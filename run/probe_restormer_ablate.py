"""Component-ablation timing of the fused RestormerBlock's VPU work.

PERF.md round 5 locates the remaining Restormer serving gap "in-kernel
VPU elementwise" — dw3x3 shifted-adds, two LayerNorms, the gelu gate.
This probe measures WHICH of those dominates on the dominant serving
shape (L1 dec/refine: 15x256^2, C=96, heads=1 — 8 of the 38 blocks and
~54% of the fused block-time budget per run/probe_restormer_fused.py)
by monkeypatching the kernel module's helpers and re-tracing:

    base      full fused block (reference timing)
    no_gelu   gelu(a)*b -> a*b             (gelu tanh cost)
    no_dw     9-tap dw3x3 -> 1-tap scale   (8 shifted MACs + W-pad cost)
    fast_ln   two-pass LN -> one-pass E[x^2]-E[x]^2
    no_ln     LN -> x*scale+bias           (both LN reductions)
    no_all    all three ablations          (VPU floor: matmuls + glue)

Timing: fori_loop-chained (10 iters) with float(.sum()) sync, minus the
~29 ms axon relay RPC (memory: axon gotchas). Each variant re-jits so
the patched globals are re-traced. Ablated variants compute WRONG math —
this is a cost probe, not a parity check.

Usage: python run/probe_restormer_ablate.py [--hw 256] [--c 96]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv):
    hw = int(argv[argv.index("--hw") + 1]) if "--hw" in argv else 256
    c = int(argv[argv.index("--c") + 1]) if "--c" in argv else 96
    heads = int(argv[argv.index("--heads") + 1]) if "--heads" in argv else 1
    b = int(argv[argv.index("--b") + 1]) if "--b" in argv else 15
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
    var = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, c),
                                                    jnp.float32))
    var = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, var)
    p = var["params"]

    orig_ln = rb._layer_norm
    orig_dw = rb._dw3x3_valid
    orig_gelu = jax.nn.gelu

    def fast_ln(xx, scale, bias):
        mean = jnp.mean(xx, axis=-1, keepdims=True)
        msq = jnp.mean(xx * xx, axis=-1, keepdims=True)
        return (xx - mean) * jax.lax.rsqrt(msq - mean * mean + rb.LN_EPS) \
            * scale + bias

    def no_ln(xx, scale, bias):
        return xx * scale + bias

    def no_dw(y, dwwf, tile_h, mask_rows):
        return y[1:1 + tile_h] * dwwf[1, 1]

    def no_gelu(v):
        return v

    VARIANTS = [
        ("base", {}),
        ("no_gelu", {"gelu": no_gelu}),
        ("no_dw", {"dw": no_dw}),
        ("fast_ln", {"ln": fast_ln}),
        ("no_ln", {"ln": no_ln}),
        ("no_all", {"gelu": no_gelu, "dw": no_dw, "ln": no_ln}),
    ]

    def timed():
        @jax.jit
        def loop(t):
            return jax.lax.fori_loop(
                0, iters,
                lambda i, y: rb.restormer_block_fast(y, p, heads), t)
        _ = float(loop(x).sum())
        t0 = time.perf_counter()
        _ = float(loop(x).sum())
        return (time.perf_counter() - t0 - 0.029) / iters

    base_ms = None
    for tag, patches in VARIANTS:
        rb._layer_norm = patches.get("ln", orig_ln)
        rb._dw3x3_valid = patches.get("dw", orig_dw)
        jax.nn.gelu = patches.get("gelu", orig_gelu)
        try:
            ms = timed() * 1e3
        finally:
            rb._layer_norm = orig_ln
            rb._dw3x3_valid = orig_dw
            jax.nn.gelu = orig_gelu
        row = {"variant": tag, "ms_per_block": round(ms, 2)}
        if base_ms is None:
            base_ms = ms
        else:
            row["saved_ms"] = round(base_ms - ms, 2)
            row["saved_pct"] = round(100 * (base_ms - ms) / base_ms, 1)
        print(json.dumps(row), flush=True)
        import gc
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main(sys.argv[1:])
