"""A/B the fused Pallas Restormer forward vs flax/XLA on the live chip.

Times the full serving-shape forward (chunk x 256^2, bf16) three ways:
  1. flax module.apply          (the current serving path)
  2. restormer_fast_apply       (fused Pallas blocks, hybrid threshold)
  3. fused with fused_min_hw sweep (which levels benefit)

Sync via float(x.sum()) (axon relay: block_until_ready does not
serialize). Usage: python run/probe_restormer_fused.py [--chunk 15]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def block_bench(argv):
    """--blocks: time ONE fused block per level shape, chained inside a
    fori_loop so the ~30 ms relay RPC amortizes (memory: axon gotchas)."""
    import time

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enhax.kernels.restormer_block import restormer_block_fast
    from enhax.models.multitask.restormer import RestormerBlock

    iters = 10
    rng = np.random.default_rng(0)
    # (tag, B, HW, C, heads, blocks-in-model)
    LEVELS = [("L1_enc", 15, 256, 48, 1, 4),
              ("L1_dec_ref", 15, 256, 96, 1, 8),
              ("L2", 15, 128, 96, 2, 12),
              ("L3", 15, 64, 192, 4, 12),
              ("L4", 15, 32, 384, 8, 8)]
    total = {"fused": 0.0, "flax": 0.0}
    for tag, b, hw, c, heads, blocks in LEVELS:
        x = jnp.asarray(rng.uniform(-1, 1, (b, hw, hw, c)), jnp.bfloat16)
        mod = RestormerBlock(c, heads)
        var = mod.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, hw, hw, c), jnp.float32))
        var = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, var)
        p = var["params"]

        def timed(fn, xx):
            @jax.jit
            def loop(t):
                return jax.lax.fori_loop(0, iters, lambda i, y: fn(y), t)
            _ = float(loop(xx).sum())
            t0 = time.perf_counter()
            _ = float(loop(xx).sum())
            return (time.perf_counter() - t0 - 0.029) / iters

        t_fused = timed(lambda y: restormer_block_fast(y, p, heads), x)
        t_flax = timed(lambda y: mod.apply({"params": p}, y), x)
        row = {"level": tag, "shape": [b, hw, hw, c], "heads": heads,
               "blocks": blocks,
               "fused_ms_per_block": round(t_fused * 1e3, 2),
               "flax_ms_per_block": round(t_flax * 1e3, 2),
               "speedup": round(t_flax / t_fused, 2),
               "fused_level_ms": round(t_fused * blocks * 1e3, 1),
               "flax_level_ms": round(t_flax * blocks * 1e3, 1)}
        total["fused"] += t_fused * blocks
        total["flax"] += t_flax * blocks
        print(json.dumps(row), flush=True)
        import gc
        jax.clear_caches()
        gc.collect()
    print(json.dumps({"sum_fused_ms": round(total["fused"] * 1e3, 1),
                      "sum_flax_ms": round(total["flax"] * 1e3, 1)}),
          flush=True)


def main(argv):
    if "--blocks" in argv:
        return block_bench(argv)
    chunk = int(argv[argv.index("--chunk") + 1]) if "--chunk" in argv else 15
    smoke = "--smoke" in argv

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enhax.kernels.restormer_block import restormer_fast_apply
    from enhax.models.base import build_model

    rng = np.random.default_rng(0)
    if smoke:
        kw = dict(dim=8, num_blocks=(1, 1, 1, 1), num_refinement=1,
                  heads=(1, 1, 2, 2))
        chunk, hw = 2, 64
    else:
        kw = dict(dim=48, num_blocks=(4, 6, 6, 8), num_refinement=4,
                  heads=(1, 2, 4, 8))
        hw = 256
    model = build_model("restormer", **kw)
    x = jnp.asarray(rng.uniform(0, 0.4, (chunk, hw, hw, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), {"image": x[:1]})
    cast = lambda a: a.astype(jnp.bfloat16) \
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
    v = jax.tree_util.tree_map(cast, v)
    x = x.astype(jnp.bfloat16)

    def timed(fn):
        s = float(fn(v, x).sum())
        assert np.isfinite(s), s
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(fn(v, x).sum())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    flax_fwd = jax.jit(lambda vv, t: model.module.apply(vv, t)["enhanced"])
    t_flax = timed(flax_fwd)
    print(json.dumps({"impl": "flax_xla", "chunk": chunk,
                      "ms": round(t_flax * 1e3, 1),
                      "mp_per_s": round(chunk * hw * hw / 1e6 / t_flax, 2)}),
          flush=True)

    for min_hw in ([1] if smoke else [32, 64, 128]):
        try:
            fused = jax.jit(lambda vv, t, m=min_hw: restormer_fast_apply(
                vv, t, fused_min_hw=m, **kw)["enhanced"])
            t_f = timed(fused)
            row = {"impl": f"fused_min_hw={min_hw}", "chunk": chunk,
                   "ms": round(t_f * 1e3, 1),
                   "mp_per_s": round(chunk * hw * hw / 1e6 / t_f, 2),
                   "speedup_vs_flax": round(t_flax / t_f, 2)}
        except Exception as e:  # noqa: BLE001
            row = {"impl": f"fused_min_hw={min_hw}",
                   "error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(json.dumps(row), flush=True)
        import gc
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main(sys.argv[1:])
