"""A/B restormer_block_fast tile_h on the dominant level (C=96, 256²).

The auto _rows_per_tile picks 16 rows at C=96/w=256 (72 MB budget / 8
bufs), paying 2/16 = 12.5% halo recompute. Larger tiles amortize the halo
but grow the (th+2, w, 2*hidden) VMEM temporaries — measure where the
knee is on the real chip. fori_loop-chained, RPC netted out (memory:
axon-tpu-bench-gotchas).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv=()):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enhax.kernels.restormer_block import restormer_block_fast
    from enhax.models.multitask.restormer import RestormerBlock

    iters = 10
    hw = int(argv[argv.index("--hw") + 1]) if "--hw" in argv else 256
    c = int(argv[argv.index("--c") + 1]) if "--c" in argv else 96
    b, heads = 15, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, c)), jnp.bfloat16)
    mod = RestormerBlock(c, heads)
    var = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, c),
                                                    jnp.float32))
    p = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        var["params"])

    def timed(fn):
        @jax.jit
        def loop(t):
            return jax.lax.fori_loop(0, iters, lambda i, y: fn(y), t)
        _ = float(loop(x).sum())
        t0 = time.perf_counter()
        _ = float(loop(x).sum())
        return (time.perf_counter() - t0 - 0.029) / iters

    ths = [None, 8, 16, 32, 64] if hw == 256 else \
        [None, 8, 12, 16, 24, 32]
    for th in ths:
        try:
            t = timed(lambda y, tt=th: restormer_block_fast(
                y, p, heads, tile_h=tt))
            print(json.dumps({"tile_h": th, "ms": round(t * 1e3, 2)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tile_h": th,
                              "error": f"{type(e).__name__}: {str(e)[:140]}"}),
                  flush=True)
        import gc
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main(sys.argv[1:])
