"""On-device probes for the fused NAFBlock kernels (r2 VERDICT #1).

Times each candidate at the nafnet_tlc_sidd bench shape by chaining the
op N times inside ONE jit dispatch (lax.fori_loop with a data dependency)
so device time dominates the ~29 ms axon RPC floor; syncs via a host
fetch of one element (block_until_ready does not serialize on the relay
— see memory/axon-tpu-bench-gotchas).

Usage: python run/probe_nafblock.py [block|box|model] [f32|bf16]
Run ONE probe per process (OOM poisoning; single-TPU-client rule).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

B, H, W, C = 2, 736, 1280, 32
TLC = 256


def chain_time(fn, x, iters=12, label=""):
    loop = jax.jit(lambda v: jax.lax.fori_loop(0, iters, lambda i, a: fn(a),
                                               v))
    r = loop(x)
    float(jnp.sum(r.astype(jnp.float32)[0, 0, 0]))   # compile + hard sync
    t0 = time.perf_counter()
    r = loop(x)
    float(jnp.sum(r.astype(jnp.float32)[0, 0, 0]))
    dt = time.perf_counter() - t0
    ms = (dt * 1e3 - 29.0) / iters                   # subtract RPC floor
    print(f"{label:34s} {ms:8.2f} ms/iter")
    return ms


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "block"
    dt = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") \
        else jnp.float32
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())

    if which == "box":
        from enhax.kernels.box import box_mean_fast
        from enhax.ops.filtering import box_filter
        x = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32)
                        ).astype(dt)
        got = box_mean_fast(x, TLC // 2)
        ref = box_filter(x.astype(jnp.float32), TLC // 2).astype(dt)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"box parity on-device max|d|: {err:.2e}")
        chain_time(lambda v: box_mean_fast(v, TLC // 2), x,
                   label=f"box_mean_fast r{TLC // 2} {dt.__name__}")
        chain_time(lambda v: box_filter(v, TLC // 2).astype(v.dtype), x,
                   label=f"xla box_filter r{TLC // 2} {dt.__name__}")
        return

    if which == "block":
        from enhax.kernels.nafblock import k1_apply, nafblock_fast
        from enhax.models.multitask.nafnet import NAFBlock
        x32 = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)).astype(np.float32))
        x = x32.astype(dt)
        blk = NAFBlock(C, tlc_window=None, dtype=None)
        v = blk.init(jax.random.PRNGKey(0), x32)
        p = jax.tree_util.tree_map(lambda a: a.astype(dt), v["params"])
        blk_t = NAFBlock(C, tlc_window=TLC, dtype=None)

        # correctness at this width/shape (vs f32 std path)
        ref = NAFBlock(C, tlc_window=None).apply({"params": v["params"]}, x32)
        got = nafblock_fast(x, p, None).astype(jnp.float32)
        print(f"global parity max|d|: "
              f"{float(jnp.max(jnp.abs(got - ref))):.2e}")

        chain_time(lambda a: blk.apply({"params": p}, a), x,
                   label=f"std global {dt.__name__}")
        chain_time(lambda a: nafblock_fast(a, p, None), x,
                   label=f"fast global {dt.__name__}")
        chain_time(lambda a: k1_apply(a, p), x,
                   label=f"fast K1 only {dt.__name__}")
        chain_time(lambda a: blk_t.apply({"params": p}, a), x,
                   label=f"std tlc{TLC} {dt.__name__}")
        chain_time(lambda a: nafblock_fast(a, p, TLC), x,
                   label=f"fast tlc{TLC} {dt.__name__}")
        return

    if which == "model":
        from enhax.kernels.nafblock import nafnet_fast_apply
        from enhax.models.base import build_model
        m = build_model("nafnet_local", tlc_window=TLC)
        x32 = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), {"image": x32})  # tile-size init
        v = jax.tree_util.tree_map(lambda a: a.astype(dt), v)
        xb = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
                         ).astype(dt)
        mp = B * H * W / 1e6
        ms_std = chain_time(lambda a: m.apply(v, {"image": a})["enhanced"],
                            xb, iters=6, label=f"std model tlc {dt.__name__}")
        ms_fast = chain_time(
            lambda a: nafnet_fast_apply(v, a, tlc_window=TLC)["enhanced"],
            xb, iters=6, label=f"fast model tlc {dt.__name__}")
        print(f"std  {mp / ms_std * 1e3:7.2f} MP/s")
        print(f"fast {mp / ms_fast * 1e3:7.2f} MP/s   "
              f"speedup {ms_std / ms_fast:.2f}x")
        return

    raise SystemExit(f"unknown probe {which}")


if __name__ == "__main__":
    main()
