"""A/B the dw3x3 tap schedule inside the fused RestormerBlock.

probe_restormer_ablate.py measured the 9-tap dw3x3 at 57% of the
L1-dec block time. Hypothesis: each tap's (dh, dx) slice of the padded
tensor carries a W-(sublane-)offset, so Mosaic materializes ~9 shifted
copies. Hoisting the W shift — 3 materialized dx planes, then 9
row-offset FMAs (h slices are contiguous-row views) — should cut the
shift traffic 3x.

Times base vs hoisted on the dominant serving shape and prints the
on-chip max|Δ| between the two full-block outputs (must be ~0: same
math, same f32 accumulation order up to tap reordering).

Usage: python run/probe_dw_hoist.py [--hw 256] [--c 96]
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

    def dw_hoisted(y, dwwf, tile_h, mask_rows):
        w = y.shape[1]
        y = jnp.where(mask_rows, 0.0, y)
        zcol = jnp.zeros_like(y[:, :1])
        # three dx planes materialized ONCE each (dx=1 is y itself);
        # tap (dh, dx) then reads a contiguous row-offset view
        planes = (jnp.concatenate([zcol, y[:, :-1]], axis=1),  # dx=0
                  y,                                            # dx=1
                  jnp.concatenate([y[:, 1:], zcol], axis=1))    # dx=2
        acc = None
        for dx in (0, 1, 2):
            pp = planes[dx]
            for dh in (0, 1, 2):
                t = pp[dh:dh + tile_h] * dwwf[dh, dx]
                acc = t if acc is None else acc + t
        return acc

    orig = rb._dw3x3_valid

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

    out_base = rb.restormer_block_fast(x, p, heads)
    t_base = timed() * 1e3
    rb._dw3x3_valid = dw_hoisted
    try:
        out_hoist = rb.restormer_block_fast(x, p, heads)
        delta = float(jnp.max(jnp.abs(out_base.astype(jnp.float32) -
                                      out_hoist.astype(jnp.float32))))
        t_hoist = timed() * 1e3
    finally:
        rb._dw3x3_valid = orig
    print(json.dumps({"base_ms": round(t_base, 2),
                      "hoisted_ms": round(t_hoist, 2),
                      "speedup": round(t_base / t_hoist, 2),
                      "max_abs_delta": delta}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
