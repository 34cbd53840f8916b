"""A/B Restormer 1080p serving across tile sizes on the live chip.

The serving row (bench_all.py restormer_1080p_tiled256_bf16_mf) fixes
tile=256/overlap=32 — the reference's my_predict.py default. But the tile
grid sets both the overlap redundancy (computed px / frame px) and the
dispatch count of the lax.map chunk stream:

    tile 256, overlap 32: 45 tiles/frame, redundancy 1.41
    tile 384, overlap 32: 15 tiles/frame, redundancy 1.06
    tile 512, overlap 32: 12 tiles/frame, redundancy 1.51 (1088 pads badly)

Larger tiles also fill the MXU better (more pixel rows per matmul) and
shrink the sequential blend loop. This probe times the REAL
tiled_apply_frames serving call at several (tile, chunk) points so the
bench row can adopt the best one with evidence.

Usage: python run/probe_restormer_tiles.py [--frames 4] [--smoke]
           [--points "384,32,12;384,32,18;384,32,24"]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main(argv):
    smoke = "--smoke" in argv
    frames = int(argv[argv.index("--frames") + 1]) if "--frames" in argv else 4

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from enhax.infer.tiling import tiled_apply_frames
    from enhax.models.base import build_model

    rng = np.random.default_rng(0)
    if smoke:
        model = build_model("restormer", dim=8, num_blocks=(1, 1, 1, 1),
                            num_refinement=1, heads=(1, 1, 2, 2))
        h, w = 192, 192
        points = [(64, 16, 4)]
        frames = 2
    else:
        model = build_model("restormer")
        h, w = 1088, 1920
        # (tile, overlap, chunk): chunk scaled so chunk*tile^2 stays ~flat
        points = [(256, 32, 16), (384, 32, 8), (448, 32, 6), (512, 32, 4)]
    if "--points" in argv:
        # 3-tuple tile,overlap,chunk (square) or 4-tuple th,tw,overlap,chunk
        # (rectangular — full-height strips kill the vertical overlap
        # redundancy entirely: 1088x512 strips cover 1080p at 1.07x
        # computed px vs the 384^2 grid's 1.27x)
        points = [tuple(int(v) for v in p.split(","))
                  for p in argv[argv.index("--points") + 1].split(";")]

    x = jnp.asarray(rng.uniform(0, 0.4, (frames, h, w, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), {"image": x[:1, :points[0][0], :points[0][0]]})
    cast = lambda a: a.astype(jnp.bfloat16) \
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
    v = jax.tree_util.tree_map(cast, v)
    x = x.astype(jnp.bfloat16)

    for point in points:
        if len(point) == 4:
            th, tw, overlap, chunk = point
        else:
            (th, overlap, chunk), tw = point, point[0]
        tile = (th, tw)
        try:
            fn = jax.jit(lambda vv, img, t=tile, o=overlap, c=chunk:
                         tiled_apply_frames(
                             lambda tt: model.apply(vv, {"image": tt})["enhanced"],
                             img, tile=t, overlap=o, chunk=c))
            s = float(fn(v, x).sum())
            assert np.isfinite(s)
            t0 = time.perf_counter()
            runs = 1 if smoke else 3
            for _ in range(runs):
                s = float(fn(v, x).sum())
            dt = (time.perf_counter() - t0) / runs
            mps = frames * h * w / 1e6 / dt
            row = {"tile": tile, "overlap": overlap, "chunk": chunk,
                   "sec_per_call": round(dt, 3),
                   "mp_per_s": round(mps, 2)}
        except Exception as e:  # noqa: BLE001
            row = {"tile": tile, "overlap": overlap, "chunk": chunk,
                   "error": f"{type(e).__name__}: {str(e)[:120]}"}
        print(json.dumps(row), flush=True)
        import gc
        jax.clear_caches()
        gc.collect()


if __name__ == "__main__":
    main(sys.argv[1:])
