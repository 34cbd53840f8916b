"""End-to-end split of the Restormer serving path: blocks vs everything else.

PERF.md r5 shows fused blocks alone sum to ~110 ms per 0.98 MP dispatch
(8.9 MP/s), but the measured 1080p row is 5.76 MP/s at 1.06x tile
redundancy — a ~31%% residual. This probe splits that residual on the
REAL serving dispatch shape (chunk of 8 bf16 384^2 tiles):

    full       restormer_fast_apply, full model
    noblocks   every RestormerBlock replaced by identity
               -> embed/down/up/reduce/output convs + pixel (un)shuffle
    tiled      tiled_apply_frames end-to-end on 4x1080p (bench row shape)

Timing: fori_loop-chained x5 with device sync, minus relay RPC floor.

Usage: python run/probe_restormer_e2e.py [--tile 384] [--chunk 8]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def timeit(step, x, iters=6):
    """fori_loop-chain ``step`` (shape-preserving) and sync via a scalar
    pull — block_until_ready is a no-op through the axon relay (memory:
    axon gotchas), so only a host-materialized float is a real fence."""
    import jax
    import jax.numpy as jnp

    loop = jax.jit(lambda y: jax.lax.fori_loop(
        0, iters, lambda _, yy: step(yy).astype(yy.dtype), y))
    float(jnp.sum(loop(x)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(loop(x)))
    dt = time.perf_counter() - t0
    return dt / iters


def main(argv):
    tile = int(argv[argv.index("--tile") + 1]) if "--tile" in argv else 384
    chunk = int(argv[argv.index("--chunk") + 1]) if "--chunk" in argv else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import enhax.kernels.restormer_block as rb
    from enhax.models.base import build_model

    model = build_model("restormer")
    rng = np.random.default_rng(0)
    xt = jnp.asarray(rng.uniform(0, 0.4, (chunk, tile, tile, 3)),
                     jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0),
                   {"image": jnp.zeros((1, tile, tile, 3), jnp.float32)})
    v = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, v)

    t_full = timeit(
        lambda img: rb.restormer_fast_apply(v, img)["enhanced"], xt)
    mp = chunk * tile * tile / 1e6
    print(json.dumps({"variant": "full_chunk", "ms": round(t_full * 1e3, 2),
                      "mp_per_s": round(mp / t_full, 2)}), flush=True)

    # blocks -> identity (cost probe, wrong math)
    orig_fast = rb.restormer_block_fast
    rb.restormer_block_fast = lambda y, p, heads, expansion=2.66, **kw: y
    import enhax.models.multitask.restormer as rm
    orig_blk = rm.RestormerBlock.__call__
    rm.RestormerBlock.__call__ = lambda self, y: y
    try:
        t_noblk = timeit(
            lambda img: rb.restormer_fast_apply(v, img)["enhanced"], xt)
    finally:
        rb.restormer_block_fast = orig_fast
        rm.RestormerBlock.__call__ = orig_blk
    print(json.dumps({"variant": "noblocks_chunk",
                      "ms": round(t_noblk * 1e3, 2),
                      "pct_of_full": round(100 * t_noblk / t_full, 1)}),
          flush=True)

    # end-to-end tiled (bench row shape)
    from enhax.infer.tiling import tiled_apply_frames
    x = jnp.asarray(rng.uniform(0, 0.4, (4, 1088, 1920, 3)), jnp.bfloat16)
    t_tiled = timeit(
        lambda img: tiled_apply_frames(
            lambda t: model.apply(v, {"image": t})["enhanced"],
            img, tile=(tile, tile), overlap=32, chunk=chunk),
        x, iters=3)
    mp4 = 4 * 1088 * 1920 / 1e6
    print(json.dumps({"variant": "tiled_e2e", "ms": round(t_tiled * 1e3, 2),
                      "mp_per_s": round(mp4 / t_tiled, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
