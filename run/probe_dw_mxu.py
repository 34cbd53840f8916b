"""A/B the tap-folded MXU dwconv against the VPU shifted-adds dw3x3.

The dw roofline probe (run/probe_dw_roofline.py) plus the in-block
ablation price the dw3x3 FMA passes at ~1.9 T FMA/s (~50% VPU peak) and
~46% of the dominant block time. Folding the nine taps into the
producing 1x1 matmul (exact — the producers are bias-free; see
_fold_dw_into_pointwise) replaces that VPU work with 9x the pointwise
MXU FLOPs at K = 9c, which the back-of-envelope says LOSES at c >= 48
(MXU extra ~2-12 ms/block vs ~2-4 ms of VPU dw). This probe settles it
on chip at the serving shapes: if the estimate holds, the negative
result is the record; if Mosaic's matmul pipelining hides the extra
FLOPs behind the existing VPU work, dw_mxu wins despite the count.

Timing: fori_loop x10 chained, float(sum) sync (axon relay), both
variants interleaved in ONE process; RPC floor (~29 ms) NOT netted —
only the A/B delta matters.

Usage: python run/probe_dw_mxu.py

Result (v5litepod-1, 2026-08-20): the estimate holds — dw_mxu LOSES at
every serving level: enc0 0.88x, dec0 0.74x, L2 0.85x. The 9x pointwise
MXU FLOPs cost more than the ~50%-of-peak VPU FMA passes they replace;
v5e's MXU:VPU ratio (~50:1 f32-effective) is below the ~110:1 a c>=48
fold would need. Kept behind dw_mxu=False with interpret parity tests —
the negative result is the record.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import enhax.kernels.restormer_block as rb
    from enhax.models.multitask.restormer import RestormerBlock

    iters = 10
    for hw, c, heads, tag in ((256, 48, 1, "enc0"), (256, 96, 1, "dec0"),
                              (128, 96, 2, "L2")):
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (15, hw, hw, c)), jnp.bfloat16)
        mod = RestormerBlock(c, heads)
        var = mod.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, hw, hw, c), jnp.float32))
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            var)["params"]

        res = {}
        for rep in range(2):
            for dw_mxu in (False, True):
                @jax.jit
                def loop(t, m=dw_mxu):
                    return jax.lax.fori_loop(
                        0, iters,
                        lambda _, y: rb.restormer_block_fast(
                            y, p, heads, dw_mxu=m).astype(y.dtype), t)

                float(loop(x).astype(jnp.float32).sum())
                t0 = time.perf_counter()
                float(loop(x).astype(jnp.float32).sum())
                ms = (time.perf_counter() - t0) / iters * 1e3
                res.setdefault(dw_mxu, []).append(ms)
        base, mxu = min(res[False]), min(res[True])
        print(json.dumps({
            "level": tag, "c": c, "vpu_dw_ms": round(base, 3),
            "mxu_dw_ms": round(mxu, 3),
            "speedup": round(base / mxu, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
