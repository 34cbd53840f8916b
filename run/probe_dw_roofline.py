"""Is the hoisted dw3x3 at the VPU roofline? Time it in isolation.

The post-hoist ablation keeps dw3x3 at 45.8% of the L1-dec fused block
(3.72 ms for the two dw convs at 3C=288 and 2h=512 lanes). Before
spending more on tap scheduling, measure a dw-ONLY Pallas kernel at the
same shapes against the v5e VPU ceiling (~1024 lanes x 4 ALUs x 940 MHz
~= 3.85 T f32 FMA/s; the 9-tap dw needs 9 FMA + 2 sublane-shifted plane
copies + 1 mask select per element).

Variants:
  dw_base    the production _dw3x3_valid (2 shifted copies + 9 muls+adds)
  dw_nomask  drop the edge-row where() (prices the mask)
  dw_fma     tap loop written as acc += plane*scalar in FMA order
             (mul and add adjacent, no temporaries)

Usage: python run/probe_dw_roofline.py [--c 288] [--hw 256] [--b 15]
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv):
    hw = int(argv[argv.index("--hw") + 1]) if "--hw" in argv else 256
    cs = [int(x) for x in (argv[argv.index("--c") + 1].split(",")
                           if "--c" in argv else ["288", "512"])]
    b = int(argv[argv.index("--b") + 1]) if "--b" in argv else 15
    iters = 20

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import enhax.kernels.restormer_block as rb

    def dw_kernel(x_ref, xp_ref, xn_ref, k_ref, o_ref, *, tile_h, variant,
                  n_tiles):
        i = pl.program_id(1)
        f32 = jnp.float32
        xb = jnp.concatenate([xp_ref[0].astype(f32), x_ref[0].astype(f32),
                              xn_ref[0].astype(f32)], axis=0)
        kf = k_ref[:].astype(f32)
        mask = rb._edge_mask(i, tile_h, n_tiles)
        if variant == "dw_base":
            out = rb._dw3x3_valid(xb, kf, tile_h, mask)
        elif variant == "dw_nomask":
            zcol = jnp.zeros_like(xb[:, :1])
            planes = (jnp.concatenate([zcol, xb[:, :-1]], axis=1), xb,
                      jnp.concatenate([xb[:, 1:], zcol], axis=1))
            out = None
            for dx in (0, 1, 2):
                pp = planes[dx]
                for dh in (0, 1, 2):
                    t = pp[dh:dh + tile_h] * kf[dh, dx]
                    out = t if out is None else out + t
        else:  # dw_fma
            xb = jnp.where(mask, 0.0, xb)
            zcol = jnp.zeros_like(xb[:, :1])
            planes = (jnp.concatenate([zcol, xb[:, :-1]], axis=1), xb,
                      jnp.concatenate([xb[:, 1:], zcol], axis=1))
            out = planes[0][0:tile_h] * kf[0, 0]
            for dx in (0, 1, 2):
                pp = planes[dx]
                for dh in (0, 1, 2):
                    if dx == 0 and dh == 0:
                        continue
                    out = out + pp[dh:dh + tile_h] * kf[dh, dx]
        o_ref[0] = out.astype(o_ref.dtype)

    for c in cs:
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (b, hw, hw, c)), jnp.bfloat16)
        k = jnp.asarray(np.random.default_rng(1).uniform(
            -1, 1, (3, 3, c)), jnp.bfloat16)
        tile_h = rb._rows_per_tile(hw, c, n_bufs=6)
        while hw % tile_h:
            tile_h -= 1
        n_tiles = hw // tile_h
        blk = lambda cc: pl.BlockSpec((1, tile_h, hw, cc),  # noqa: E731
                                      lambda bi, i: (bi, i, 0, 0),
                                      memory_space=pltpu.VMEM)
        prev, nxt = rb._halo_specs(tile_h, hw, hw, c)

        for variant in ("dw_base", "dw_nomask", "dw_fma"):
            fn = pl.pallas_call(
                functools.partial(dw_kernel, tile_h=tile_h, variant=variant,
                                  n_tiles=n_tiles),
                grid=(b, n_tiles),
                in_specs=[blk(c), prev, nxt,
                          pl.BlockSpec((3, 3, c), lambda bi, i: (0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=blk(c),
                out_shape=jax.ShapeDtypeStruct((b, hw, hw, c), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "parallel"),
                    vmem_limit_bytes=110 * 2**20),
            )
            loop = jax.jit(lambda y, kk=k, f=fn: jax.lax.fori_loop(
                0, iters,
                lambda _, yy: f(yy, yy, yy, kk).astype(yy.dtype), y))
            float(jnp.sum(loop(x)))
            t0 = time.perf_counter()
            float(jnp.sum(loop(x)))
            ms = (time.perf_counter() - t0) / iters * 1e3
            lanes = ((c + 127) // 128) * 128
            fma = b * hw * hw * lanes * 9
            print(json.dumps({
                "c": c, "variant": variant, "ms": round(ms, 3),
                "tfma_per_s": round(fma / (ms / 1e3) / 1e12, 2),
                "pct_vpu_peak": round(100 * fma / (ms / 1e3) / 3.85e12, 1),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
