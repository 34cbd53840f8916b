"""Chip speed-of-light calibration: what does THIS chip actually deliver?

The per-op Restormer probe found a ~1.5 ms floor on every op regardless
of tensor size (an 11 MB dwconv at L4 costs the same as a 94 MB one at
L1) — that is not bandwidth, it is per-op overhead. Before optimizing
against the v5e datasheet (819 GB/s HBM, 197 TF/s bf16), measure the
tunneled chip's real envelope with the same fori_loop timing harness the
op probe uses:

  1. elementwise x+1 at 8/64/256/512 MB      -> effective HBM GB/s
  2. bf16 matmul at 2048^2..8192^2           -> effective MXU TF/s
  3. (8,128) tiny add                        -> per-iteration floor (ms)

If (3) is ~1.5 ms, the op probe's absolute numbers carry iters x 1.5 ms
of harness/dispatch overhead and the REAL fusion target is the bandwidth
line from (1); if (1) lands far under 819 GB/s, the roofline ceilings in
docs/PERF.md must be restated against the measured envelope.

Usage: python run/probe_chip_sol.py [--iters 30] [--smoke]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv):
    iters = int(argv[argv.index("--iters") + 1]) if "--iters" in argv else 30
    smoke = "--smoke" in argv

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def timed(fn, *args):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                scaled = tuple(x * (1.0 + 1e-6 * i) if j == 0 else x
                               for j, x in enumerate(a))
                return acc + fn(*scaled).astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        _ = float(loop(*args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(loop(*args))
            ts.append((time.perf_counter() - t0) / iters)
        return float(np.median(ts))

    rng = np.random.default_rng(0)

    # 0. per-iteration floor: an op so small its bandwidth time is ~0
    tiny = jnp.asarray(rng.uniform(-1, 1, (8, 128)), jnp.bfloat16)
    t_floor = timed(lambda t: t + 1.0, tiny)
    print(json.dumps({"probe": "loop_floor", "shape": [8, 128],
                      "ms_per_iter": round(t_floor * 1e3, 4)}), flush=True)

    # 1. elementwise bandwidth: read + write (+ the harness's perturb pass)
    sizes_mb = [8, 64, 256] if smoke else [8, 64, 256, 512]
    for mb in sizes_mb:
        n = mb * 2**20 // 2  # bf16 elements
        x = jnp.asarray(rng.uniform(-1, 1, (n // 128, 128)), jnp.bfloat16)
        t = timed(lambda t: t + 1.0, x)
        # traffic per iter: perturb (r+w) + add (r+w) + partial sum read
        bytes_per_iter = 4 * mb * 2**20
        print(json.dumps({
            "probe": "elementwise_bw", "mb": mb,
            "ms_per_iter": round(t * 1e3, 3),
            "eff_gb_s": round(bytes_per_iter / max(t, 1e-9) / 1e9, 1),
            "net_of_floor_gb_s": round(
                bytes_per_iter / max(t - t_floor, 1e-9) / 1e9, 1)}),
            flush=True)

    # 2. MXU rate: square bf16 matmuls
    dims = [1024, 2048] if smoke else [2048, 4096, 8192]
    for d in dims:
        a = jnp.asarray(rng.uniform(-1, 1, (d, d)), jnp.bfloat16)
        b = jnp.asarray(rng.uniform(-1, 1, (d, d)), jnp.bfloat16)
        t = timed(lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
                  .astype(jnp.bfloat16), a, b)
        fl = 2.0 * d**3
        print(json.dumps({
            "probe": "mxu_bf16", "dim": d,
            "ms_per_iter": round(t * 1e3, 3),
            "eff_tflop_s": round(fl / max(t, 1e-9) / 1e12, 1),
            "net_of_floor_tflop_s": round(
                fl / max(t - t_floor, 1e-9) / 1e12, 1)}), flush=True)

    # 3. f32 matmul for the f32 peak
    d = 1024 if smoke else 4096
    a = jnp.asarray(rng.uniform(-1, 1, (d, d)), jnp.float32)
    b = jnp.asarray(rng.uniform(-1, 1, (d, d)), jnp.float32)
    t = timed(lambda x, y: jnp.dot(x, y), a, b)
    print(json.dumps({"probe": "mxu_f32", "dim": d,
                      "ms_per_iter": round(t * 1e3, 3),
                      "eff_tflop_s": round(2.0 * d**3 / max(t, 1e-9) / 1e12, 1)}),
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
