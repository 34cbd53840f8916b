"""Secondary benchmarks: BASELINE.md configs 1-4 on one TPU chip.

Prints one JSON line per config (bench.py remains the single-line headline
for the driver). Configs (BASELINE.md:23-27):

  1. zero_dce      — 256x256 single-image enhance (CPU-reference config,
                     run here on TPU at batch 64)
  2. zero_dce++    — handled by bench.py (headline)
  3a. hinet        — GoPro-shaped 1280x736, batch 4
  3b. nafnet TLC   — SIDD denoising at 1280x736, batch 4, TLC local stats
  4. restormer     — 1080p deraining via overlap-tiled 256-tiles (the
                     reference tests Restormer tiled, my_predict.py:157-167)

Timing: hard host sync per run (axon relay; see bench.py notes).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _timeit(f, *args, runs=5):
    s = float(f(*args).sum())
    assert np.isfinite(s)
    t0 = time.perf_counter()
    for _ in range(runs):
        s = float(f(*args).sum())
    return (time.perf_counter() - t0) / runs


def main(only: str | None = None):
    import os

    # ENHAX_BENCH_SMOKE=1: CPU dry-run of every bench code path (tiny
    # shapes/models, 1 rep, artifact NOT written) so a broken row is caught
    # BEFORE burning a healthy tunnel window on the self-armed sweep.
    smoke = os.environ.get("ENHAX_BENCH_SMOKE") == "1"
    from bench_probe import ensure_tpu, error_row
    if not smoke:
        err = ensure_tpu()
        if err is not None:
            print(error_row("bench_all", "megapixels/sec/chip", err))
            return
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from enhax.infer.tiling import tiled_apply_batched
    from enhax.models.base import build_model

    rng = np.random.default_rng(0)
    results = []

    SMOKE_KW = {  # tiny architectures for the CPU dry-run
        "restormer": {"dim": 8, "num_blocks": (1, 1, 1, 1),
                      "num_refinement": 1, "heads": (1, 1, 2, 2)},
        "zero_dce_re": {"num_channels": 8},
        "zero_dce++_re": {"num_channels": 8},
        "hinet_re": {"num_channels": 8, "depth": 2},
        "nafnet_local": {"width": 8, "middle_blk_num": 1,
                         "enc_blk_nums": (1, 1), "dec_blk_nums": (1, 1),
                         "tlc_window": 24},
    }

    def run(metric, model_name, batch, h, w, runs=5, tile=None, bf16=False,
            chunk=8, **kw):
        if only is not None and metric != only:
            return
        if smoke:
            kw = {**kw, **SMOKE_KW.get(model_name, {})}
            batch, h, w, runs = min(batch, 2), 192, 192, 1
            if tile:
                tile, chunk = (64, 16), 4
        # tile: (size, overlap) square, or (th, tw, overlap) rectangular
        # (full-height strips — r5 serving grid, zero vertical overlap)
        if tile and len(tile) == 2:
            tile = (tile[0], tile[0], tile[1])
        try:
            model = build_model(model_name, **kw)
            x = jnp.asarray(rng.uniform(0, 0.4, (batch, h, w, 3)).astype(np.float32))
            # init at tile size when tiling — a full-res untiled forward
            # just to create params OOMs (this was the restormer failure)
            init_x = x[:, :min(tile[0], h), :min(tile[1], w)] if tile else x
            v = model.init(jax.random.PRNGKey(0), {"image": init_x})
            if bf16:
                # inference in bfloat16: halves HBM traffic and doubles MXU
                # rate; flax modules with dtype=None follow input/param dtype
                cast = lambda a: a.astype(jnp.bfloat16) \
                    if hasattr(a, "dtype") and a.dtype == jnp.float32 else a
                v = jax.tree_util.tree_map(cast, v)
                x = x.astype(jnp.bfloat16)
            if tile and batch > 1:
                # multi-frame tile pipelining: all frames' tiles through one
                # chunked dispatch (r4; VERDICT r3 #2)
                from enhax.infer.tiling import tiled_apply_frames
                fn = jax.jit(lambda vv, img: tiled_apply_frames(
                    lambda t: model.apply(vv, {"image": t})["enhanced"],
                    img, tile=(tile[0], tile[1]), overlap=tile[2],
                    chunk=chunk))
                f = lambda: fn(v, x)  # noqa: E731
            elif tile:
                # tiles batched through one model call (tiled_apply_batched)
                # — unrolled per-tile calls OOM'd the 16 GB chip at 1080p
                fn = jax.jit(lambda vv, img: tiled_apply_batched(
                    lambda t: model.apply(vv, {"image": t})["enhanced"],
                    img, tile=(tile[0], tile[1]), overlap=tile[2],
                    chunk=chunk))
                f = lambda: fn(v, x)  # noqa: E731
            else:
                fwd = jax.jit(lambda vv, d: model.apply(vv, d)["enhanced"])
                f = lambda: fwd(v, {"image": x})  # noqa: E731
            dt = _timeit(lambda: f(), runs=runs)
            mps = batch * h * w / 1e6 / dt
            row = {"metric": metric, "value": round(mps, 2),
                   "unit": "megapixels/sec/chip",
                   "vs_baseline": round(mps / 100.0, 3)}
        except Exception as e:  # noqa: BLE001
            row = {"metric": metric, "value": None,
                   "unit": "megapixels/sec/chip",
                   "error": f"{type(e).__name__}: {str(e)[:120]}"}
        results.append(row)
        print(json.dumps(row), flush=True)
        # free compiled executables + buffers between configs: Restormer's
        # 1080p tiling needs most of the 16 GB and OOMs on a fragmented heap
        import gc
        jax.clear_caches()
        gc.collect()

    # restormer first: its 1080p tiling needs the full unfragmented heap.
    # tile 384 is the measured best serving grid for the fused kernels
    # (run/probe_restormer_tiles.py: 384 -> 1.06x overlap redundancy vs
    # 1.41x at the reference my_predict.py default of 256; 448/512 regress
    # as the row-tile halo share grows). 256 rows kept for methodology
    # parity with the reference default.
    run("restormer_1080p_tiled384_bf16_mf", "restormer", 4, 1088, 1920,
        runs=3, tile=(384, 32), chunk=8, bf16=True)
    run("restormer_1080p_tiled256_bf16_mf", "restormer", 4, 1088, 1920,
        runs=3, tile=(256, 32), chunk=16, bf16=True)
    run("restormer_1080p_tiled256_bf16", "restormer", 1, 1088, 1920,
        runs=3, tile=(256, 32), chunk=16, bf16=True)
    run("restormer_1080p_tiled256", "restormer", 1, 1088, 1920,
        runs=3, tile=(256, 32), chunk=4)
    run("zero_dce_256_batch128", "zero_dce_re", 128, 256, 256)
    # r01/r02 headline methodology (f32 frames, hard host sync per chunk)
    # kept for cross-round comparability; bench.py now measures the
    # streaming u8/bf16 serving pipeline
    run("zero_dcepp_1080p_f32_synced", "zero_dce++_re", 48, 1088, 1920,
        scale_factor=8.0)
    run("hinet_gopro_1280x736", "hinet_re", 2, 736, 1280)
    run("hinet_gopro_1280x736_bf16", "hinet_re", 2, 736, 1280, bf16=True)
    run("nafnet_tlc_sidd_1280x736", "nafnet_local", 2, 736, 1280)
    run("nafnet_tlc_sidd_1280x736_bf16", "nafnet_local", 2, 736, 1280,
        bf16=True)

    if smoke:
        bad = [r["metric"] for r in results if r.get("error")]
        print(json.dumps({"smoke": "bench_all", "rows": len(results),
                          "failed": bad}))
        raise SystemExit(1 if bad else 0)  # never write the artifact
    if only is None:
        with open("/root/repo/BENCH_ALL.json", "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    import sys
    if "--only" in sys.argv:
        main(only=sys.argv[sys.argv.index("--only") + 1])
    else:
        main()
